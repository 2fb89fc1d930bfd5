"""Inverted index as a Lance-style artifact: build once, lookup many.

The index-build/index-serve split is the shape a retrieval stack takes at
100 TB: the posting table is built in one distributed pass + one sort
(the documented all-to-all, amortized over every subsequent lookup), is
committed as a versioned Lance-style table CLUSTERED BY TERM, and each
lookup then prunes fragments from the manifest's zone maps alone — a
point lookup touches O(1) fragments, not the whole index (the
`sources/lance_like` zone-map machinery on a string column).

Reference analogue: the manager's summary-file keyed routing
(Manager.java:280-320) — results addressed by key, served without
scanning the corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")  # the shared tokenizer (tfidf/BM25/SQL)


def build_postings(
    ds, table_dir: str, id_col: str = "doc_id", text_col: str = "text",
    rows_per_fragment: int = 100_000,
) -> dict:
    """documents -> term-sorted posting table ((term, doc_id) distinct per
    doc) committed as a Lance-style table. The ``sort("term")`` is the one
    all-to-all of the build; it is what makes every fragment's term range
    narrow and therefore every lookup's zone-map prune sharp. Returns the
    committed manifest."""
    from ..sources import lance_like

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        ids = np.repeat(batch[id_col].to_numpy(), lens)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t] or [np.array([], object)]
        )
        out = pd.DataFrame({"term": flat.astype(str), id_col: ids})
        return out.drop_duplicates()  # per-doc distinct (docs never span batches)

    postings = ds.map_batches(explode, batch_format="pandas").sort("term")
    return lance_like.write_dataset(
        postings, table_dir, rows_per_fragment=rows_per_fragment
    )


def lookup_terms(
    table_dir: str, terms: list[str], id_col: str = "doc_id",
    require_pruning: bool = False,
):
    """Posting lookup for ``terms``: fragments are pruned per term from the
    manifest zone maps (union of the per-term survivor sets, each a
    ``(term, ==, t)`` predicate), then the exact IN-filter runs on the
    survivors and doc counts aggregate per term. Returns a Dataset of
    (term, n_docs).

    ``require_pruning=True`` raises unless the union of survivor fragments
    is a strict subset of the index — the effectiveness guard the driver
    query uses so its green CORRECTNESS row certifies the zone maps did
    real work, not just that the filter is correct."""
    import pyarrow.compute as pc

    from ..sources import lance_like
    from .relational import tiny_final_groupby

    import os

    # read the manifest ONCE and prune per term against that snapshot —
    # per-term pruned_fragment_paths calls would re-parse the manifest K
    # times and could even pin different versions across terms if a commit
    # races the lookup (review finding, round 3)
    man = lance_like.read_manifest(table_dir)
    total = len(man["fragments"])
    kept: dict[str, None] = {}  # ordered de-dup of survivor paths
    for t in terms:
        for frag in man["fragments"]:
            if lance_like._fragment_may_match(frag, [("term", "==", t)]):
                kept[os.path.join(table_dir, frag["path"])] = None
    if require_pruning and not (0 < len(kept) < total):
        raise AssertionError(
            f"zone-map pruning ineffective: {len(kept)}/{total} index fragments kept"
        )
    import ray.data as rd

    term_set = pa.array(sorted(set(terms)))

    def exact(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("term"), value_set=term_set))
        return pa.table(
            {
                "term": b.column("term"),
                "n_docs": pa.array([1] * b.num_rows, pa.int64()),
            }
        )

    if not kept:
        src = rd.from_arrow(
            pa.table({"term": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())})
        )
        return src
    ds = rd.read_parquet(list(kept))
    return tiny_final_groupby(
        ds.map_batches(exact, batch_format="pyarrow"),
        ["term"], [("n_docs", "sum")], ["term", "n_docs"],
    )


def build_ivf_centroids(
    ds, table_dir: str, n_centroids: int = 16, sample_size: int = 2048,
    seed: int = 7, iters: int = 5, emb_col: str = "embedding",
) -> dict:
    """Persist IVF coarse centroids as a versioned Lance-style table
    (VERDICT r4 #8): the build-once/lookup-many split ``build_postings``
    gives the sparse side, applied to the dense side. One bounded sample
    (``ds.take(sample_size)``, the same bounded driver read ``ivf_topk``
    used per call) + the deterministic seeded Lloyd fit, committed as
    rows ``(centroid_id, embedding, n_centroids, sample_size, seed,
    iters)`` -- the param columns let ``ivf_topk`` validate a loaded
    index matches the requested geometry instead of silently probing a
    differently-built one. Returns the committed manifest."""
    from ..functions import similarity as sk
    from ..sources import lance_like

    sample = np.stack([r[emb_col] for r in ds.take(sample_size)])
    cents = sk.seeded_centroids(sample, n_centroids, iters=iters, seed=seed)
    n = len(cents)
    tbl = pa.table({
        "centroid_id": pa.array(np.arange(n, dtype=np.int32)),
        "embedding": pa.array([[float(v) for v in c] for c in cents],
                              pa.list_(pa.float64())),
        "n_centroids": pa.array([n_centroids] * n, pa.int32()),
        "sample_size": pa.array([sample_size] * n, pa.int32()),
        "seed": pa.array([seed] * n, pa.int32()),
        "iters": pa.array([iters] * n, pa.int32()),
    })
    return lance_like.write_table(tbl, table_dir)


def load_ivf_centroids(table_dir: str) -> tuple[np.ndarray, dict]:
    """Load a persisted centroid table -> (centroid matrix, params)."""
    from ..sources import lance_like

    tbl = lance_like.read_arrow(table_dir).sort_by("centroid_id")
    cents = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    first = tbl.slice(0, 1).to_pylist()[0]
    params = {k: int(first[k]) for k in
              ("n_centroids", "sample_size", "seed", "iters")}
    return cents, params
