"""HTML demo sink: render extracted documents the way the reference client
does (LocalApplication.createHtml, LocalApplication.java:158-216).

Kept as a demo sink only -- the engine's correctness contract is the span
table, not the HTML (SURVEY.md S7). Parity points:

- one ``<p>`` block per extracted span, ``<img src=media_ref>`` for media
  spans followed by the extracted text (LocalApplication.java:186-201);
- ``\\n`` -> ``<br/>`` in span text (M4, LocalApplication.java:191);
- duplicates appear once per occurrence (M5) -- multiplicity is already
  row-preserved in the span table;
- ordering is the engine's offset order, deliberately stronger than the
  reference's HashMap-iteration order (LocalApplication.java:182).
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

_HEADER = "<html>\n<body>\n"
_FOOTER = "</body>\n</html>\n"


def render_doc(doc_id: str, spans: list[dict]) -> str:
    blocks = []
    for s in sorted(spans, key=lambda x: x["order"]):
        text = _html.escape(s["text"]).replace("\n", "<br/>")
        if s["media_ref"]:
            blocks.append(f'<p><img src="{_html.escape(s["media_ref"])}"><br/>{text}</p>')
        else:
            blocks.append(f"<p>{text}</p>")
    return f'<div id="{_html.escape(doc_id)}">\n' + "\n".join(blocks) + "\n</div>"


def render_batch(batch: pa.Table) -> pa.Table:
    docs = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.string()),
            "html": pa.array([render_doc(d, s) for d, s in zip(docs, spans)], pa.string()),
        }
    )


def render_html(ds):
    """(doc_id, spans) Dataset -> (doc_id, html) Dataset."""
    return ds.map_batches(render_batch, batch_format="pyarrow")


def write_html_file(ds, path: str) -> int:
    """Small-result sink: stream doc fragments into one HTML file, returning
    the block count (the reference's buffered-append loop analogue,
    LocalApplication.java:220-227)."""
    n = 0
    with open(path, "w") as f:
        f.write(_HEADER)
        for batch in render_html(ds).iter_batches(batch_size=256, batch_format="pyarrow"):
            for frag in batch.column("html").to_pylist():
                f.write(frag + "\n")
                n += 1
        f.write(_FOOTER)
    return n
