"""Adapters from the driver's flat testdata tables to the engine's span shape.

``/root/testdata/sf*/documents.parquet`` is flat (doc_id:int64, text, lang,
source, n_chars) -- not span-shaped (FIXTURES.md F6). Two adapters:

- ``flat_as_spans``: each row -> one document with a single text span
  (offset=0). Extraction on plain text is the identity, which makes the
  full explode -> extract -> reassemble round trip exactly SQL-checkable
  against DuckDB (queries ``extract_flat_identity``).
- ``interleaved_from_documents``: deterministically synthesizes the
  input_hint interleaved shape FROM the testdata docs: the doc's text is
  wrapped in the HTML boilerplate template, plus image/pdf media spans whose
  refs (and ~5% broken refs) are pure functions of doc_id. The matching
  media store is generated from the same seed. This is the flagship/bench
  corpus -- derived from driver data, no external inputs.
"""

from __future__ import annotations

import pyarrow as pa

from .. import corpus

DEFAULT_N_IMG = 500
DEFAULT_N_PDF = 250


def doc_id_str(i: int) -> str:
    return f"doc-{i:010d}"


def flat_as_spans_batch(batch: pa.Table) -> pa.Table:
    ids = [doc_id_str(i) for i in batch.column("doc_id").to_pylist()]
    spans = [
        [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]
        for t in batch.column("text").to_pylist()
    ]
    return pa.table({"doc_id": ids, "spans": spans}, schema=corpus.DOC_SCHEMA)


def flat_as_spans(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(flat_as_spans_batch, batch_format="pyarrow")


def make_interleave_fn(seed: int = 42, n_img: int = DEFAULT_N_IMG, n_pdf: int = DEFAULT_N_PDF,
                       replicate: int = 1):
    """Batch fn: flat docs -> interleaved span docs, deterministic per doc_id.

    No random.Random anywhere: the span structure and refs are plain doc_id
    arithmetic, the page boilerplate is md5 arithmetic (corpus.html_page_det)
    and the offsets cheap modular arithmetic -- so the whole wrapped corpus,
    and hence the flagship extraction OUTPUT over it, is a closed-form
    function of the testdata documents table that DuckDB replays exactly
    (__ray_entry__._interleaved_sql). Offsets only define within-doc order
    (generation order: text, images, pdf -- increments are strictly
    positive), so they need determinism, not SQL replay.

    ``replicate`` stamps R copies of each doc under distinct doc_ids (same
    spans) to scale the bench corpus without external data.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids, out_spans = [], []
        for i, text in zip(ids, texts):
            tag = f"{seed}:wrap:{i}"
            sentences = [s.strip() + "." for s in text.split(".") if s.strip()][:3] or [text[:200]]
            spans = []
            offset = 1
            spans.append(
                {"kind": "text", "text": corpus.html_page_det(tag, sentences),
                 "media_ref": "", "offset": offset}
            )
            for k in range(1 + i % 2):
                offset += 1 + (i * 13 + k * 7) % 40
                broken = (i + k) % 20 == 0  # ~5% broken refs
                ref = (
                    f"mem://img/missing-{i:06d}"
                    if broken
                    else corpus.media_ref_img((i * 7 + k * 3) % n_img)
                )
                spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": offset})
            if i % 2 == 0:
                offset += 1 + (i * 17 + 5) % 40
                broken = i % 40 == 10
                ref = (
                    f"mem://pdf/missing-{i:06d}" if broken else corpus.media_ref_pdf((i * 11) % n_pdf)
                )
                spans.append({"kind": "pdf", "text": "", "media_ref": ref, "offset": offset})
            for r in range(replicate):
                out_ids.append(doc_id_str(i) if r == 0 else f"{doc_id_str(i)}-r{r:03d}")
                out_spans.append(spans)
        return pa.table({"doc_id": out_ids, "spans": out_spans}, schema=corpus.DOC_SCHEMA)

    return _fn


def interleaved_from_documents(
    sf_dir: str, seed: int = 42, n_img: int = DEFAULT_N_IMG, n_pdf: int = DEFAULT_N_PDF,
    replicate: int = 1,
):
    """(interleaved Dataset, media store Table) derived from testdata docs."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    wrapped = ds.map_batches(
        make_interleave_fn(seed=seed, n_img=n_img, n_pdf=n_pdf, replicate=replicate),
        batch_format="pyarrow",
    )
    store = corpus.build_media_store(n_img=n_img, n_pdf=n_pdf, seed=seed)
    return wrapped, store
