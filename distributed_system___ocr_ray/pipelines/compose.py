"""Composed training-data pipeline: extract -> embed -> near-dup.

The full flow a 100 TB training-data pipeline runs over interleaved
documents: main-content extraction (the flagship engine), then a document
embedding, then embedding-cosine near-dup -- wired as ONE streaming Dataset
plan (no stage materializes the corpus; only the tiny pair result reaches
the driver).

The embedder is deterministic feature hashing (token -> md5-prefix bucket ->
l2-normalized counts) -- model-shaped plumbing (vectorized batch kernel,
fixed dim) without a model dependency; swap ``HashEmbedder`` for a real
encoder actor at will (same signature). The md5-prefix bucket (same kernel
as functions/dedup.md5_u64) keeps the whole composed pipeline SQL-replayable
(__ray_entry__._extract_embed_neardup_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.dedup import md5_u64

EMBED_DIM = 64


class HashEmbedder:
    """Actor-pool stage: extracted doc spans -> one embedding per doc.

    Stateless math, but kept as a callable class so a real model swap
    (load-once in ``__init__``) changes nothing structurally.
    """

    def __init__(self, dim: int = EMBED_DIM) -> None:
        self.dim = dim

    def _embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in text.lower().split():
            v[md5_u64(tok.encode("utf-8")) % self.dim] += 1.0
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        embs = []
        for spans in spans_col:
            text = "\n".join(s["text"] for s in spans)
            embs.append(self._embed_one(text))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "embedding": pa.array([e.tolist() for e in embs], pa.list_(pa.float32())),
            }
        )


def extract_embed_neardup(
    docs, media, *, threshold: float = 0.995, num_partitions: int = 32, dim: int = EMBED_DIM
):
    """(documents, media) -> near-dup doc pairs over EXTRACTED content.

    extract (flagship plan) -> HashEmbedder -> hyperplane-LSH cosine pairs.
    Duplicated source documents collide even when their raw payloads differ
    (e.g. same content behind different media refs), because the comparison
    runs on extraction output -- the point of deduplicating post-extraction.
    """
    from ..pipelines import analytics
    from ..pipelines.extract import extract_dataset

    extracted = extract_dataset(docs, media, num_partitions=num_partitions)
    embedded = extracted.map_batches(
        HashEmbedder, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 8),
    )
    return analytics.embedding_neardup_pairs(
        embedded, id_col="doc_id", emb_col="embedding", threshold=threshold, dim=dim
    )
