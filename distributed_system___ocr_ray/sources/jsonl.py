"""JSONL source for span-shaped documents.

Alternative wire format for the input_hint schema: one JSON object per line::

    {"doc_id": "...", "spans": [{"kind": "...", "text": "...",
                                 "media_ref": "...", "offset": 0}, ...]}

``ray.data.read_json`` handles sharded *.jsonl directories; the normalizer
map enforces the canonical Arrow schema (missing span fields default, extra
fields drop), so downstream stages see exactly ``corpus.DOC_SCHEMA``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..corpus import DOC_SCHEMA


def normalize_batch(batch: pa.Table) -> pa.Table:
    ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    spans_out = []
    for spans in batch.column("spans").to_pylist():
        spans_out.append(
            [
                {
                    "kind": str(s.get("kind", "text")),
                    "text": str(s.get("text") or ""),
                    "media_ref": str(s.get("media_ref") or ""),
                    "offset": int(s.get("offset") or 0),
                }
                for s in (spans or [])
            ]
        )
    return pa.table({"doc_id": ids, "spans": spans_out}, schema=DOC_SCHEMA)


def read_documents_jsonl(paths):
    """JSONL file(s)/dir -> canonical documents Dataset."""
    import ray.data as rd

    return rd.read_json(paths).map_batches(normalize_batch, batch_format="pyarrow")


def write_documents_jsonl(table: pa.Table, path: str) -> int:
    """Driver-side writer for small fixtures/interchange."""
    n = 0
    with open(path, "w") as f:
        for doc_id, spans in zip(table.column("doc_id").to_pylist(), table.column("spans").to_pylist()):
            f.write(json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")
            n += 1
    return n
