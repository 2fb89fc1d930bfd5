"""Dataset-level analytics pipelines: dedup, similarity search, text stats.

Each function takes/returns ``ray.data.Dataset`` and composes the vectorized
kernels in ``functions/`` with the minimal set of wide operations -- partial
work inside ``map_batches`` first, small ``groupby`` after (SURVEY.md
"Aggregation at scale"). Nothing materializes the input; shuffled payloads
are hashes/signatures/ids, never document text.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import dedup as dk
from ..functions import similarity as sk
from ..functions import textstats as ts

# ---------------------------------------------------------------- text stats


def token_count_by_key(ds, key: str = "lang", text_col: str = "text", bounded_key: bool = True):
    """Partial token counts per batch -> final merge. SQL-checkable.

    ``bounded_key=True`` (default, right for enum-like keys such as lang)
    finishes with a single-block Arrow merge (skips the sort-shuffle
    barrier); pass ``bounded_key=False`` for high-cardinality keys (e.g.
    per-doc counts) to keep the distributed groupby -- the single-block
    final must hold n_keys x n_partial_blocks rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = ts.token_counts(batch[text_col])
        counts[key] = batch[key].values
        return counts.groupby(key, as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    if not bounded_key:
        from ray.data.aggregate import Sum

        return partials.groupby(key).aggregate(
            Sum("n_ws_tokens", alias_name="n_ws_tokens"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
    from .relational import tiny_final_groupby

    return tiny_final_groupby(
        partials,
        [key],
        [("n_ws_tokens", "sum"), ("n_bpe_tokens", "sum")],
        [key, "n_ws_tokens", "n_bpe_tokens"],
    )


def quality_scores(ds, id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = ts.quality_features(batch[text_col])
        out.insert(0, id_col, batch[id_col].values)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def quality_by_lang(ds, lang_col: str = "lang", text_col: str = "text"):
    """Per-language quality aggregate over COMPUTED features: each batch
    derives quality ppm (functions/textstats) and pre-aggregates per lang,
    the bounded-key final merges in one block (SQL-checkable end-to-end)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        f = ts.quality_features(batch[text_col])
        f[lang_col] = batch[lang_col].values
        return f.groupby(lang_col, as_index=False).agg(
            n_docs=("quality_ppm", "size"), sum_quality_ppm=("quality_ppm", "sum")
        )

    from .relational import tiny_final_groupby

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [lang_col],
        [("n_docs", "sum"), ("sum_quality_ppm", "sum")],
        [lang_col, "n_docs", "sum_quality_ppm"],
    )


def language_id(ds, id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: batch[id_col].values, "pred_lang": ts.lang_id(batch[text_col]).values})

    return ds.map_batches(fn, batch_format="pandas")


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: batch[id_col].values, "fingerprint": ts.fingerprint64(batch[text_col]).values}
        )

    return ds.map_batches(fn, batch_format="pandas")


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc Gopher-style repetition signals (top-token share, duplicate-
    bigram share) -- the standard repetitive-boilerplate quality filter.
    Pure map-side (``textstats.repetition_features`` explodes each batch to
    flat token/bigram frames and C-groupbys them); no shuffle."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = ts.repetition_features(batch[id_col].to_numpy(), batch[text_col])
        return out.rename(columns={"doc_id": id_col})

    return ds.map_batches(fn, batch_format="pandas")


# -------------------------------------------------------------------- dedup


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicate groups: (keeper id, copy count) per distinct content.

    Shuffle payload is the 64-char hash + id -- the text never moves.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = dk.sha256_hex(batch.column(text_col).to_pylist())
        return pa.table({"text_hash": pa.array(hashes), id_col: batch.column(id_col)})

    from ray.data.aggregate import Count, Min

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min(id_col, alias_name="keeper_doc_id"), Count(alias_name="n_copies"))
    )
    return out.select_columns(["keeper_doc_id", "n_copies"])


def media_dedup_groups(store_ds, ref_col: str = "media_ref",
                       payload_col: str = "payload"):
    """Exact MEDIA dedup groups: (keeper ref, ref count) per distinct
    payload -- the image/PDF-side twin of ``exact_dedup_groups``, the
    standard first pass over a web corpus's media store (CDN mirrors,
    re-hosted logos/figures resolve to one stored copy).

    Scale shape: payloads hash MAP-SIDE (md5 at C speed); only the
    32-char digest + ref cross the shuffle -- a multi-MB image never
    moves. Group domain = distinct payloads (bounded by store size).

    Returns (keeper_ref, n_refs): keeper = lexicographically smallest
    ref of each content group."""
    import hashlib

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(p or b"").hexdigest()
                  for p in batch.column(payload_col).to_pylist()]
        return pa.table({"payload_hash": pa.array(hashes),
                         ref_col: batch.column(ref_col)})

    from ray.data.aggregate import Count, Min

    out = (
        store_ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("payload_hash")
        .aggregate(Min(ref_col, alias_name="keeper_ref"),
                   Count(alias_name="n_refs"))
    )
    return out.select_columns(["keeper_ref", "n_refs"])


def dangling_ref_audit(exploded_ds, store_refs):
    """Pre-run media-ref integrity audit: which span references will MISS
    the media store (and become download-error sentinels) before any
    extraction compute is spent -- the reference's urlCounters bookkeeping
    (Manager.java:50,216) turned into a data-quality gate.

    ``store_refs``: iterable/set of resolvable refs (or an ObjectRef to
    one). The store's REF SET is the broadcast small side (refs only --
    bytes per entry, never payloads); span refs test membership map-side,
    then ONE grouped exchange on (kind, media_ref, dangling) dedups the
    ref domain and a tiny per-kind final folds 2-3 rows.

    Returns per media kind: (kind, n_refs, n_distinct_refs, n_dangling,
    n_dangling_distinct), kind ascending."""
    import ray

    from .relational import tiny_final_groupby

    handle = store_refs if isinstance(store_refs, ray.ObjectRef) else ray.put(
        frozenset(store_refs))

    class Flag:
        def __init__(self) -> None:
            self.refs = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(pc.equal(batch.column("kind"), "text"))
            kinds = batch.column("kind").filter(mask)
            refs = batch.column("media_ref").filter(mask)
            dang = [r not in self.refs for r in refs.to_pylist()]
            return pa.table({
                "kind": kinds, "media_ref": refs,
                "dangling": pa.array(dang, pa.bool_()),
                "n": pa.array([1] * len(dang), pa.int64()),
            })

    from ray.data.aggregate import Sum

    per_ref = (
        exploded_ds.map_batches(Flag, batch_format="pyarrow",
                                concurrency=(1, 4))
        .groupby(["kind", "media_ref", "dangling"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_kind_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("kind", as_index=False).apply(
            lambda d: pd.Series({
                "n_refs": d["n"].sum(),
                "n_distinct_refs": len(d),
                "n_dangling": d.loc[d["dangling"], "n"].sum(),
                "n_dangling_distinct": int(d["dangling"].sum()),
            }), include_groups=False)
        return g

    out = tiny_final_groupby(
        per_ref.map_batches(per_kind_partial, batch_format="pandas"),
        ["kind"],
        [("n_refs", "sum"), ("n_distinct_refs", "sum"),
         ("n_dangling", "sum"), ("n_dangling_distinct", "sum")],
        ["kind", "n_refs", "n_distinct_refs", "n_dangling",
         "n_dangling_distinct"],
    )
    df = out.to_pandas().sort_values("kind").reset_index(drop=True)
    for c in df.columns[1:]:
        df[c] = df[c].astype(np.int64)
    return df


def orphan_media_audit(exploded_ds, store_ds,
                       ref_col: str = "media_ref", kind_col: str = "kind"):
    """Inverse of ``dangling_ref_audit``: store payloads NO span ever
    references -- the GC-candidate list of a media store (re-crawls and
    upstream filters strand payloads; this sizes the reclaim before a
    rewrite).

    Scale shape: everything is bounded by the STORE's ref domain. Span
    refs are first semi-filtered map-side against the broadcast store ref
    set (so the referenced-distinct exchange is <= store size even when
    the corpus references 10^12 spans), dedupped in one grouped exchange,
    collected under the bounded-driver convention, and the store then
    streams once flagging membership.

    Returns per store kind: (kind, n_store, n_referenced, n_orphans)."""
    import ray
    from ray.data.aggregate import Count

    from .relational import collect_bounded, tiny_final_groupby

    if not isinstance(store_ds, pa.Table):
        raise TypeError("store_ds must be the media store Arrow table "
                        "(the bounded broadcast side)")
    store_refs = frozenset(store_ds.column(ref_col).to_pylist())
    handle = ray.put(store_refs)

    class InStore:
        def __init__(self) -> None:
            self.refs = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            refs = [r for r in batch.column(ref_col).to_pylist()
                    if r in self.refs]
            return pa.table({ref_col: pa.array(refs, pa.string())})

    referenced = (
        exploded_ds.map_batches(InStore, batch_format="pyarrow",
                                concurrency=(1, 4))
        .groupby(ref_col)
        .aggregate(Count(alias_name="n"))
    )
    ref_set = set(collect_bounded(
        referenced, what="orphan_media_audit referenced-ref set",
        alternative="grouped anti-join keyed on media_ref")[ref_col])

    kinds = store_ds.column(kind_col).to_pylist()
    refs = store_ds.column(ref_col).to_pylist()
    rows: dict[str, list[int]] = {}
    for k, r in zip(kinds, refs):
        agg = rows.setdefault(k, [0, 0])
        agg[0] += 1
        agg[1] += r in ref_set
    out = pd.DataFrame(
        [(k, n, nr, n - nr) for k, (n, nr) in sorted(rows.items())],
        columns=["kind", "n_store", "n_referenced", "n_orphans"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep exactly one row (min id) per distinct content; returns full rows.
    hash-partition + per-group first (groupby moves full rows here -- use
    ``exact_dedup_groups`` + a semi-join when rows are wide)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "text_hash", pa.array(dk.sha256_hex(batch.column(text_col).to_pylist()))
        )

    def first_by_id(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(first_by_id, batch_format="pandas")
        .drop_columns(["text_hash"])
    )


def dedup_keep_best(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup that keeps the BEST-quality representative per content
    group (max quality_ppm, then min id — not first-by-id): the curation
    policy that matters when duplicates differ in upstream cleaning.

    Shuffle payload is (hash, id, quality) — quality is computed MAP-SIDE
    before the exchange and the text never moves. Per-batch partial argmax
    first (each batch contributes at most one candidate per group), so the
    shuffle is group-domain-sized — and it exchanges on an int32 hash
    bucket of the 64-char hex hash, not the string itself (the native
    string sort-shuffle is the 5x-slower exchange bucketed_grouped_sum
    measured; review finding, round 3) — then the same argmax merges per
    group inside each bucket. Returns (keeper id, its quality, copy count)
    per distinct content."""
    from .relational import hash_bucket_column

    def hash_quality(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col]).to_pandas()
        df["text_hash"] = dk.sha256_hex(batch.column(text_col).to_pylist())
        df["quality_ppm"] = (
            ts.quality_features(batch.column(text_col).to_pandas())["quality_ppm"]
            .to_numpy(np.int64)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def argmax_frame(df: pd.DataFrame) -> pd.DataFrame:
        # max quality, tie -> min id: sort then first per group
        g = df.sort_values(
            ["text_hash", "quality_ppm", id_col], ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("text_hash", sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cand = argmax_frame(df[["text_hash", id_col, "quality_ppm"]])
        n = df.groupby("text_hash", sort=False).size().rename("n_copies").reset_index()
        return pa.Table.from_pandas(cand.merge(n, on="text_hash"), preserve_index=False)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        best = argmax_frame(group)[["text_hash", id_col, "quality_ppm"]]
        tot = group.groupby("text_hash", sort=False)["n_copies"].sum().reset_index()
        out = best.merge(tot, on="text_hash")
        return pd.DataFrame(
            {
                "keeper_doc_id": out[id_col].astype("int64"),
                "quality_ppm": out["quality_ppm"].astype("int64"),
                "n_copies": out["n_copies"].astype("int64"),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "text_hash", 64)

    return (
        ds.map_batches(hash_quality, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def _concat_column(tables: list[pa.Table], col: str) -> pa.Array:
    """Column across collected blocks, skipping the schema-less empties an
    all-filtered block produces (a bare empty table has no columns at all,
    so a naive concat_tables raises on 'different schemas')."""
    good = [t for t in tables if col in t.column_names]
    if not good:
        return pa.array([], pa.string())
    return pa.concat_tables(good).column(col).combine_chunks()


def exact_dedup_semifilter(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    broadcast_keepers_bytes: int = 256 << 20,
    join_buckets: int | None = None,
):
    """Keep-first exact dedup whose FULL ROWS never enter a shuffle on the
    broadcast path -- the groups + semi-join shape ``exact_dedup``'s
    docstring promises for wide rows (VERDICT r2 "what's wrong" #6).

    Two passes over ``ds`` (pass a re-readable source -- a parquet/Lance
    read -- or a cheap upstream; a computed upstream re-executes, which is
    when single-pass ``exact_dedup`` wins instead):

    1. keepers: the ``exact_dedup_groups`` plan -- hash-only shuffle ->
       ``min(id)`` per distinct content. Only (64-char hash, id) pairs move.
    2. semi-filter the original rows on ``id_col``:
       - keeper-id table under ``broadcast_keepers_bytes``: ``ray.put``
         ONCE, every task filters map-side with ``pc.is_in`` -- dropped
         rows die where they were read and survivors flow straight to the
         consumer with ZERO all-to-all on full rows;
       - past the cap (~1e9+ keepers at 100 TB): bucketed hash semi-join on
         ``id_col`` -- full rows move once, the same volume as
         ``exact_dedup``'s groupby, never worse.

    Output rows/columns are identical to ``exact_dedup`` (order aside).
    """
    keepers = (
        exact_dedup_groups(ds, id_col=id_col, text_col=text_col)
        .select_columns(["keeper_doc_id"])
        .materialize()  # tiny (one id per distinct content); sized then reused
    )

    if keepers.size_bytes() <= broadcast_keepers_bytes:
        import ray

        ids = _concat_column(ray.get(keepers.to_arrow_refs()), "keeper_doc_id")
        handle = [ray.put(ids)]

        class SemiFilter:
            def __init__(self) -> None:
                self.ids = ray.get(handle[0])

            def __call__(self, batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(pc.is_in(batch.column(id_col), value_set=self.ids))

        return ds.map_batches(SemiFilter, batch_format="pyarrow", concurrency=(1, 8))

    from .relational import bucketed_hash_join, derive_buckets

    buckets = join_buckets if join_buckets is not None else derive_buckets(keepers.count())
    joined = bucketed_hash_join(
        ds, keepers, id_col, "keeper_doc_id", buckets=buckets, how="inner"
    )
    return joined.drop_columns(["keeper_doc_id"])


def novel_docs(
    new_ds,
    corpus_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    broadcast_hashes_bytes: int = 256 << 20,
    join_buckets: int | None = None,
):
    """Incremental-ingest dedup: keep the rows of ``new_ds`` whose content
    does NOT already exist in ``corpus_ds`` (exact text match via sha256).
    This is the daily-batch operator of a continuously-growing corpus: the
    committed corpus is the reference side, the fresh crawl is filtered
    against it.

    Scale shape mirrors ``exact_dedup_semifilter``: the corpus side reduces
    to DISTINCT hashes (hash-only shuffle; text never moves). Under
    ``broadcast_hashes_bytes`` the hash set is ``ray.put`` once and new rows
    are filtered map-side (zero shuffle on the new side); past the cap it
    falls back to a bucketed LEFT join on the hash with a null-test
    anti-filter (both sides move hash+id once, full new rows move once)."""
    corpus_hashes = _distinct_content_hashes(corpus_ds, text_col)

    def with_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__hash", pa.array(dk.sha256_hex(batch.column(text_col).to_pylist()))
        )

    if corpus_hashes.size_bytes() <= broadcast_hashes_bytes:
        import ray

        hs = _concat_column(ray.get(corpus_hashes.to_arrow_refs()), "corpus_hash")
        handle = [ray.put(hs)]

        class NoveltyFilter:
            def __init__(self) -> None:
                self.hashes = ray.get(handle[0])

            def __call__(self, batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                batch = with_hash(batch)
                mask = pc.invert(pc.is_in(batch.column("__hash"), value_set=self.hashes))
                return batch.filter(mask).drop_columns(["__hash"])

        return new_ds.map_batches(NoveltyFilter, batch_format="pyarrow", concurrency=(1, 8))

    from .relational import bucketed_hash_join, derive_buckets

    hashed_new = new_ds.map_batches(with_hash, batch_format="pyarrow")
    buckets = (
        join_buckets if join_buckets is not None else derive_buckets(corpus_hashes.count())
    )
    joined = bucketed_hash_join(
        hashed_new, corpus_hashes, "__hash", "corpus_hash", buckets=buckets, how="left"
    )

    def keep_novel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_null(batch.column("corpus_hash"))
        return batch.filter(mask).drop_columns(["corpus_hash", "__hash"])

    return joined.map_batches(keep_novel, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
    coarse_buckets: int | None = None,
):
    """Near-duplicate pairs via MinHash+LSH (shingle -> minhash -> band ->
    bucket groupby -> signature-verified pairs). Returns (doc_a, doc_b,
    est_jaccard) with est_jaccard >= threshold.

    ``coarse_buckets`` is the pair-stage fan-out: each group holds ~1/B of
    all band rows (one row = id + 8B band key + ``num_perm*8`` B signature).
    When None it is derived from the input row count so per-group memory
    stays ~25 MB flat as the corpus grows (a fixed B would make group size
    linear in corpus size); pass an explicit value when the input Dataset is
    expensive to count."""
    hasher_seed = 7
    if coarse_buckets is None:
        # ds.count() is metadata-cheap for parquet reads; target ~50k band
        # rows (~27 MB at 512 B signatures) per coarse group
        n_rows = ds.count()
        coarse_buckets = max(128, (n_rows * bands) // 50_000 + 1)

    def signatures(batch: pa.Table) -> pa.Table:
        # TASK function, not an actor pool: the hasher is ~2 us to build and
        # module-cached per worker (dk.minhasher_cached) -- the pool bought
        # nothing, and its first-actor scheduling was the stage twice
        # observed wedging in long sessions (see minhasher_cached docstring)
        mh = dk.minhasher_cached(num_perm=num_perm, seed=hasher_seed)
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_id, out_band, out_bh, out_sig, out_bucket = [], [], [], [], []
        memo: dict[str, int] = {}  # per-batch distinct-shingle digests
        for i, t in enumerate(texts):
            sig = mh.signature(t, k=shingle_k, memo=memo)
            sig_bytes = sig.tobytes()
            for band, bh in enumerate(mh.band_hashes(sig, bands)):
                out_id.append(ids[i])
                out_band.append(band)
                out_bh.append(bh)
                out_sig.append(sig_bytes)
                # coarse shuffle key: complete (band, band_hash) buckets
                # land together, but one group holds many buckets
                out_bucket.append((bh * 1315423911 + band) % coarse_buckets)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
                "bucket": pa.array(out_bucket, pa.int32()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one group = one coarse bucket holding MANY complete (band,
        # band_hash) buckets; vectorized run detection finds the rare
        # multi-member buckets so Python touches only actual candidates
        # (a per-(band,band_hash) map_groups would make ~n_docs x bands
        # near-singleton UDF calls -- measured 14 s vs 2 s on 5k docs)
        group = group.sort_by([("band", "ascending"), ("band_hash", "ascending")])
        band = group.column("band").to_numpy()
        bh = group.column("band_hash").to_numpy()
        change = np.concatenate(([True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])))
        starts = np.flatnonzero(change)
        ends = np.concatenate((starts[1:], [len(band)]))
        ids = group.column(id_col).to_pylist()
        sig_col = group.column("sig").to_pylist()
        id_type = group.schema.field(id_col).type
        rows_a, rows_b, rows_j = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            # group_pairs sorts its input, so hand it (doc_id, row_pos)
            # tuples: the cap's representative is then the MIN DOC ID
            # regardless of within-group row order (sorting bare row
            # positions would silently make the capped output depend on
            # block arrival order -- and diverge from the SQL oracle)
            members = [(ids[i], i) for i in range(s, e)]
            sigs = {i: np.frombuffer(sig_col[i], dtype=np.uint64) for i in range(s, e)}
            for (_, a), (_, b) in dk.group_pairs(members):
                ej = dk.est_jaccard(sigs[a], sigs[b])
                if ej >= threshold:
                    x, y = sorted((ids[a], ids[b]))
                    rows_a.append(x); rows_b.append(y); rows_j.append(round(ej, 6))
        # explicitly typed (an empty untyped pa.array is null-typed, which
        # breaks Ray's block-size estimation and downstream schema union)
        return pa.table(
            {"doc_a": pa.array(rows_a, id_type), "doc_b": pa.array(rows_b, id_type),
             "est_jaccard": pa.array(rows_j, pa.float64())}
        )

    pairs = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair can match in several bands: reduce to one row per pair
    from ray.data.aggregate import Max

    return (
        pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """Near-dup pairs via 64-bit SimHash, 16-bit band blocking."""

    def sims(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_id, out_band, out_key, out_sh = [], [], [], []
        memo: dict[str, int] = {}  # per-batch distinct-token digests
        for i, t in enumerate(texts):
            sh = dk.simhash64(t, memo=memo)
            for band in range(4):
                out_id.append(ids[i])
                out_band.append(band)
                out_key.append((sh >> (band * 16)) & 0xFFFF)
                out_sh.append(sh - (1 << 63))  # store as signed int64
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(out_sh, pa.int64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized all-pairs hamming within the bucket (one XOR + popcount
        # over the upper triangle, not per-pair 1-element numpy calls)
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sh = group["simhash"].to_numpy()[order].astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        n = len(ids)
        cap = dk._MAX_GROUP_SIZE
        if n <= cap:
            iu, ju = np.triu_indices(n, k=1)
        else:  # skew guard: pair against the representative (min id) only
            iu = np.zeros(n - 1, dtype=np.int64)
            ju = np.arange(1, n, dtype=np.int64)
        d = dk.hamming64(sh[iu], sh[ju])
        keep = d <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[iu[keep]], "doc_b": ids[ju[keep]], "hamming": d[keep]}
        ).astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})

    pairs = (
        ds.map_batches(sims, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


def embedding_neardup_pairs(
    ds, id_col: str = "vec_id", emb_col: str = "embedding", threshold: float = 0.95,
    n_planes: int = 10, n_tables: int = 4, seed: int = 7, dim: int | None = None,
):
    """Embedding-cosine near-dup via seeded hyperplane LSH.

    ``n_tables`` independent hash tables (each ``n_planes`` sign bits): a pair
    at cosine c collides in >=1 table with prob 1-(1-(1-acos(c)/pi)^p)^T --
    ~0.999 for c=0.998 at p=10, T=4. Each vector emits T (table, bucket)
    rows; candidate pairs are cosine-verified in the bucket group and
    deduped across tables with a final tiny groupby.
    """
    if dim is None:
        dim = len(ds.take(1)[0][emb_col])
    all_planes = [dk.make_planes(dim, n_planes=n_planes, seed=seed + 101 * t) for t in range(n_tables)]

    def bucketize(batch: pa.Table) -> pa.Table:
        raw = sk.to_matrix(batch.column(emb_col))  # one conversion per batch
        x = sk.normalize(raw)
        id_list = batch.column(id_col).to_pylist()
        bytes_once = [v.tobytes() for v in raw.astype(np.float32)]
        tables, buckets, out_ids, vec_bytes = [], [], [], []
        for t, planes in enumerate(all_planes):
            b = dk.hyperplane_bucket(x, planes)
            tables.extend([t] * len(b))
            buckets.extend(b.tolist())
            out_ids.extend(id_list)
            vec_bytes.extend(bytes_once)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "table": pa.array(tables, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                "vec": pa.array(vec_bytes, pa.binary()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        vecs = np.stack([np.frombuffer(v, dtype=np.float32).astype(np.float64) for v in group["vec"]])
        rows = dk.pairwise_cosine_pairs(ids, vecs, threshold)
        id_dtype = group[id_col].dtype  # int64 or object(str): keep it typed
        return pd.DataFrame(
            {
                "vec_a": pd.Series([r[0] for r in rows], dtype=id_dtype),
                "vec_b": pd.Series([r[1] for r in rows], dtype=id_dtype),
                "cos_sim": pd.Series([round(r[2], 6) for r in rows], dtype="float64"),
            }
        )

    from ray.data.aggregate import Max

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(Max("cos_sim", alias_name="cos_sim"))


class ExactPairScaleExceeded(RuntimeError):
    """Exact all-pairs generator refused at corpus scale; use MinHash."""


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_block_docs: int = 1024,
    join_buckets: int | None = None,
    broadcast_sets_bytes: int = 256 << 20,
    max_corpus_docs: int | None = 5_000_000,
):
    """Exact n-gram Jaccard near-dup pairs with GUARANTEED recall via prefix
    filtering (the AllPairs/PPJoin lemma, Bayardo et al. WWW'07): under any
    global canonical order of shingles, two sets with J(a,b) >= t must share
    at least one shingle among each set's first ``n - ceil(t*n) + 1``
    shingles. The canonical order here is **ascending document frequency**
    (ties by hash) -- the lemma holds for any total order, but DF-ascending
    puts each doc's RAREST shingles in its prefix, which is what makes
    AllPairs practical: a common shingle (huge df) almost never appears in a
    prefix, so the candidate mass collapses to docs sharing rare shingles.
    (Measured on sf0.1's small-vocabulary corpus: hash-ordered prefixes
    produced ~600k spurious candidates and 281 s; DF-ordered runs in
    seconds.)

    Plan: shingle sets (hashes) -> explode (hash, doc) -> distributed df
    count -> join df back -> per-doc-partition vectorized prefix selection
    -> coarse-bucketed candidate pairing (run detection inside a bounded
    number of groups, no per-block UDF calls) -> dedupe -> exact
    verification. Verification is adaptive: while the sets table fits
    ``broadcast_sets_bytes`` it is ray.put once and looked up locally in
    every verify task (zero extra shuffles; measured 2-4x the whole-query
    wall at sf0.1); past the cap, candidates join back to their sets via
    bucketed hash joins whose fan-out derives from the CANDIDATE count.
    Shuffle payloads are 16-byte rows (plus, on the join path, one set copy
    per candidate side); the text never moves.

    ``max_block_docs`` is the skew guard: a block larger than this pairs
    members against the representative only (recall guarantee holds only
    below the cap).

    ``max_corpus_docs`` is the SCALE guard (the loud-raise convention of
    ``collect_bounded``): even with DF-ordered prefixes and the length
    filter, candidate mass grows ~sum(df^2) -- measured 10x scaling
    exponent 1.29 vs MinHash's 0.47 on the same corpus -- so past the cap
    this EXACT family raises :class:`ExactPairScaleExceeded` naming
    ``minhash_lsh_pairs`` as the substitution instead of launching a run
    that cannot finish at 100 TB. Pass ``None`` to opt into the exact
    audit regardless of size.

    Returns (doc_a, doc_b, jaccard_ppm) -- the ratio as integer ppm so the
    DuckDB oracle (same float64 division, then floor) compares exactly."""
    if max_corpus_docs is not None:
        n_docs = ds.count()  # parquet reads answer from metadata
        if n_docs > max_corpus_docs:
            raise ExactPairScaleExceeded(
                f"ngram_jaccard_pairs: corpus has {n_docs} docs > cap "
                f"{max_corpus_docs}; exact AllPairs candidate mass grows "
                "~sum(df^2) (measured 10x exponent 1.29) -- use "
                "minhash_lsh_pairs (measured 0.47) for near-dup pairs at "
                "scale, or pass max_corpus_docs=None to force the exact "
                "audit"
            )

    def shingle_sets(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        memo: dict[str, int] = {}  # per-batch distinct-shingle digests
        sets = [np.sort(np.unique(dk.shingle_hashes(t, k=shingle_k, memo=memo))) for t in texts]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shingles": pa.array([s.tobytes() for s in sets], pa.binary()),
            }
        )

    def explode_hashes(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs, ds_ = [], []
        for i, raw in zip(ids, batch.column("shingles").to_pylist()):
            s = np.frombuffer(raw, dtype=np.uint64).view(np.int64)  # bit reinterpret
            hs.append(s)
            ds_.append(np.full(s.size, i, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.array([], dtype=np.int64)
        d = np.concatenate(ds_) if ds_ else np.array([], dtype=np.int64)
        return pa.table({"h": pa.array(h, pa.int64()), id_col: pa.array(d, pa.int64())})

    def prefix_partition(group: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per doc-partition: sort by (doc, df, h) -- the
        # global DF-ascending canonical order -- and keep each doc's first
        # n - ceil(t*n) + 1 rows (its prefix). Each kept row also carries
        # the doc's total set size n for the downstream LENGTH filter.
        g = group.sort_values([id_col, "df", "h"], kind="mergesort")
        ids = g[id_col].to_numpy()
        new = np.concatenate(([True], ids[1:] != ids[:-1]))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(ids)))
        p = counts - np.ceil(threshold * counts).astype(np.int64) + 1
        rank = np.arange(len(ids)) - np.repeat(starts, counts)
        keep = rank < np.repeat(p, counts)
        return pd.DataFrame({"block": g["h"].to_numpy()[keep], id_col: ids[keep],
                             "n": np.repeat(counts, counts)[keep]})

    def bucket_cands(group: pa.Table) -> pa.Table:
        # one coarse bucket = many complete blocks; vectorized run detection
        # + per-run numpy pair emission (no per-block UDF calls -- a
        # map_groups per distinct shingle would make ~n_distinct tiny calls).
        # The AllPairs LENGTH filter applies right here, before any pair
        # leaves the bucket: J(a,b) >= t forces |a|/|b| >= t (I <= min,
        # U >= max), so size-mismatched candidates are dropped pre-shuffle
        # -- the standard Bayardo'07 prune, and the cheap brake on the
        # sum(df^2) candidate growth the 10x sweep measured (exponent 1.29).
        empty = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]).empty_table()
        if group.num_rows == 0 or "block" not in group.column_names:
            return empty
        g = group.sort_by([("block", "ascending")])
        blk = g.column("block").to_numpy()
        ids = g.column(id_col).to_numpy()
        ns = g.column("n").to_numpy()
        change = np.concatenate(([True], blk[1:] != blk[:-1]))
        starts = np.flatnonzero(change)
        ends = np.concatenate((starts[1:], [len(blk)]))
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            order = np.argsort(ids[s:e], kind="stable")
            members = ids[s:e][order]
            sizes = ns[s:e][order]
            if n > max_block_docs:  # skew guard: representative pairing
                a, b = np.full(n - 1, members[0]), members[1:]
                na, nb = np.full(n - 1, sizes[0]), sizes[1:]
            else:
                iu, ju = np.triu_indices(n, k=1)
                a, b = members[iu], members[ju]
                na, nb = sizes[iu], sizes[ju]
            out_a.append(a)
            out_b.append(b)
            out_na.append(na)
            out_nb.append(nb)
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        na = np.concatenate(out_na).astype(np.float64)
        nb = np.concatenate(out_nb).astype(np.float64)
        # recall-safe margin: never drop a boundary pair to float rounding
        keep = np.minimum(na, nb) >= (threshold - 1e-9) * np.maximum(na, nb)
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
            }
        )

    _VERIFY_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard_ppm", pa.int64())]
    )

    def _pair_ppm(ra: bytes, rb: bytes):
        """Exact Jaccard of two PRE-SORTED uint64 set blobs, as int ppm, or
        None below threshold. searchsorted membership count: ~10x cheaper
        than np.intersect1d, which re-sorts per pair."""
        sa = np.frombuffer(ra, dtype=np.uint64)
        sb = np.frombuffer(rb, dtype=np.uint64)
        if sb.size < sa.size:
            sa, sb = sb, sa
        if sa.size < (threshold - 1e-9) * sb.size:
            return None  # length filter: J <= min/max < t, skip searchsorted
        pos = np.searchsorted(sb, sa)
        pos[pos == sb.size] = sb.size - 1
        inter = int(np.count_nonzero(sb[pos] == sa))
        union = sa.size + sb.size - inter
        j = inter / union if union else 1.0
        return int(np.floor(j * 1e6 + 0.5)) if j >= threshold else None

    def _verify_rows(pairs_iter) -> pa.Table:
        """(doc_a, doc_b, blob_a, blob_b) stream -> typed verified-pair
        table; the ONE verify implementation both the join path and the
        broadcast path call, so they cannot drift."""
        out_a, out_b, out_ppm = [], [], []
        for a, b, ra, rb in pairs_iter:
            ppm = _pair_ppm(ra, rb)
            if ppm is not None:
                out_a.append(a)
                out_b.append(b)
                out_ppm.append(ppm)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_ppm": pa.array(out_ppm, pa.int64()),
            }
        )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return _VERIFY_SCHEMA.empty_table()
        return _verify_rows(
            zip(
                batch.column("doc_a").to_pylist(),
                batch.column("doc_b").to_pylist(),
                batch.column("a_sh").to_pylist(),
                batch.column("b_sh").to_pylist(),
            )
        )

    from ray.data.aggregate import Count, Max

    from .relational import bucketed_hash_join

    sets = ds.map_batches(shingle_sets, batch_format="pyarrow").materialize()
    n_docs = sets.count()
    doc_parts = max(16, n_docs // 250_000 + 1)
    coarse = max(64, n_docs // 500 + 1)

    # materialized: consumed twice (df count + join left side) -- lazy would
    # re-run the explode pass over every shingle row for each consumer
    exploded = sets.map_batches(explode_hashes, batch_format="pyarrow").materialize()
    from .relational import derive_buckets

    if join_buckets is None:
        # the exploded (hash, doc) table is the largest join side (one row
        # per shingle instance, 16 B): size its fan-out from its row count;
        # the candidate-verification joins carry whole shingle SETS (KB per
        # row), so they bucket by doc count at a smaller rows-per-bucket
        jb_explode = derive_buckets(exploded.count())
        jb_sets = derive_buckets(n_docs, rows_per_bucket=50_000)
    else:
        jb_explode = jb_sets = join_buckets
    # distributed document-frequency count (8-byte hash rows shuffle)
    df_tbl = exploded.groupby("h").aggregate(Count(alias_name="df")).map_batches(
        lambda t: pa.table({"h2": t.column("h"), "df": t.column("df")}),
        batch_format="pyarrow",
    )
    with_df = bucketed_hash_join(exploded, df_tbl, "h", "h2", buckets=jb_explode).drop_columns(
        ["h2"]
    )

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column(id_col).to_numpy() % doc_parts).astype(np.int32)
        return batch.append_column("__dbk", pa.array(b, pa.int32()))

    prefix = (
        with_df.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("__dbk")
        .map_groups(prefix_partition, batch_format="pandas")
    )

    def add_block_bucket(batch: pa.Table) -> pa.Table:
        blk = batch.column("block").to_numpy()
        cb = ((blk * np.int64(1315423911)) % np.int64(coarse)).astype(np.int32)
        return batch.append_column("__cbk", pa.array(cb, pa.int32()))

    from .relational import grouped_pair_fold

    cands = (
        grouped_pair_fold(
            prefix.map_batches(add_block_bucket, batch_format="pyarrow")
            .groupby("__cbk")
            .map_groups(bucket_cands, batch_format="pyarrow"),
            # a pair can share many prefix blocks: dedupe to one row per
            # pair -- the derived-pair-key fold, NOT Ray's 2-col sort
            # aggregate (see grouped_pair_fold's measurement)
            ["doc_a", "doc_b"],
            {"_n": ("doc_a", "size")},
        )
        .drop_columns(["_n"])
    )
    sets_a = sets.map_batches(
        lambda t: pa.table({"a_id": t.column(id_col), "a_sh": t.column("shingles")}),
        batch_format="pyarrow",
    )
    sets_b = sets.map_batches(
        lambda t: pa.table({"b_id": t.column(id_col), "b_sh": t.column("shingles")}),
        batch_format="pyarrow",
    )
    # --- verification: broadcast fast path vs bucketed-join scale path ---
    # The verify input is (candidate pair x both shingle sets): shipping the
    # KB-sized sets through two join shuffles dominates the pipeline wall
    # when the sets table itself is small. Below ``broadcast_sets_bytes``
    # (default 256 MB -- a bounded, deliberate driver collect, NOT the
    # whole-corpus anti-pattern) the sets dict is ray.put ONCE and every
    # verify task looks both sides up locally: zero extra shuffles. Past the
    # cap, the bucketed joins remain the scale path, with fan-out derived
    # from the CANDIDATE count (the actual workload), not the doc count.
    if sets.size_bytes() <= broadcast_sets_bytes:
        import ray

        tbl = pa.concat_tables(ray.get(sets.to_arrow_refs()))
        lookup = dict(
            zip(tbl.column(id_col).to_pylist(), tbl.column("shingles").to_pylist())
        )
        handle = [ray.put(lookup)]

        class VerifyBroadcast:
            def __init__(self) -> None:
                self.sets = ray.get(handle[0])

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "doc_a" not in batch.column_names:
                    return _VERIFY_SCHEMA.empty_table()
                return _verify_rows(
                    (a, b, self.sets[a], self.sets[b])
                    for a, b in zip(
                        batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist(),
                    )
                )

        # cands is already pair-deduped; one verified row per pair
        return cands.map_batches(VerifyBroadcast, batch_format="pyarrow", concurrency=(1, 8))

    cands = cands.materialize()
    # an explicit join_buckets is honored verbatim; otherwise derive the
    # verify fan-out from the candidate count
    jb_cands = (
        join_buckets
        if join_buckets is not None
        else max(jb_sets, derive_buckets(cands.count(), rows_per_bucket=20_000))
    )
    with_a = bucketed_hash_join(cands, sets_a, "doc_a", "a_id", buckets=jb_cands).drop_columns(
        ["a_id"]
    )
    with_ab = bucketed_hash_join(with_a, sets_b, "doc_b", "b_id", buckets=jb_cands).drop_columns(
        ["b_id"]
    )
    pairs = with_ab.map_batches(verify, batch_format="pyarrow")
    return grouped_pair_fold(
        pairs, ["doc_a", "doc_b"], {"jaccard_ppm": ("jaccard_ppm", "max")}
    )


# --------------------------------------------------------------- similarity


def ann_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Brute-force cosine top-k: per-batch partial top-k (numpy matmul vs
    broadcast query matrix) -> exact merge over tiny partials."""
    import ray

    handle = [ray.put(np.asarray(queries, dtype=np.float64))]
    partials = ds.map_batches(
        sk.BatchTopK,
        fn_constructor_kwargs={"queries_handle": handle, "k": k, "id_col": id_col, "emb_col": emb_col},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sk.final_topk_group(g, k, id_col), batch_format="pandas"
    )


def rnn_pairs(ds, k: int = 5, id_col: str = "vec_id",
              emb_col: str = "embedding", max_bytes: int = 256 << 20):
    """Reciprocal nearest neighbors: pairs (a, b) where b is in a's cosine
    top-k AND a is in b's -- the symmetric filter behind translation-pair
    mining and near-dup confirmation (a one-way neighbor is often just a
    hub vector; mutuality is the cheap fix). Tie-break (sim desc, id asc)
    shared with the SQL replay.

    Scale shape: the reference matrix is the documented bounded driver
    collect (same contract as the ngram verify broadcast: loud raise past
    ``max_bytes`` pointing at the cluster-bucketed shape --
    ``semdedup_keepers``'s per-cluster kernel -- for larger tables); knn
    is one blocked matmul per batch against the broadcast; the mutual
    filter is ONE pair-domain exchange (canonical (min, max) key,
    groupby-count, keep count == 2 -- each direction contributes at most
    once). Returns (vec_id_a, vec_id_b) with a < b.
    """
    import pyarrow.compute as pc
    import ray

    ids_list, vecs = [], []
    nbytes = 0
    for t in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pyarrow"):
        ids_list.append(t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
        m = sk.to_matrix(t.column(emb_col))
        nbytes += m.nbytes
        if nbytes > max_bytes:
            raise ValueError(
                "rnn_pairs: reference matrix exceeds max_bytes; use the "
                "cluster-bucketed shape (see semdedup_keepers) past this size"
            )
        vecs.append(m)
    ref_ids = np.concatenate(ids_list)
    if ref_ids.size and int(ref_ids.max()) >= (1 << 31):
        raise ValueError("rnn_pairs: ids must fit 31 bits for the pair key")
    ref = sk.normalize(np.concatenate(vecs).astype(np.float64))
    order = np.argsort(ref_ids, kind="stable")
    ref_ids, ref = ref_ids[order], ref[order]
    ids_h, ref_h = ray.put(ref_ids), ray.put(ref)

    def knn(batch: pa.Table) -> pa.Table:
        rid, R = ray.get(ids_h), ray.get(ref_h)
        x = sk.normalize(sk.to_matrix(batch.column(emb_col)).astype(np.float64))
        bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = x @ R.T
        pos = np.clip(np.searchsorted(rid, bids), 0, len(rid) - 1)
        hit = rid[pos] == bids
        sims[np.arange(len(bids))[hit], pos[hit]] = -np.inf  # exclude self
        # stable argsort on -sims breaks ties by column index, and R is
        # sorted by id -- exactly the (sim desc, id asc) SQL tie-break
        top = np.argsort(-sims, axis=1, kind="stable")[:, :min(k, sims.shape[1])]
        return pa.table(
            {
                "src": pa.array(np.repeat(bids, top.shape[1]), pa.int64()),
                "nbr": pa.array(rid[top.ravel()], pa.int64()),
            }
        )

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        n = batch.column("nbr").to_numpy(zero_copy_only=False)
        key = (np.minimum(s, n) << 32) | np.maximum(s, n)
        return pa.table({"key": pa.array(key, pa.int64())})

    counted = (
        ds.map_batches(knn, batch_format="pyarrow", batch_size=1024)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("key")
        .count()
    )

    def decode(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("count()"), 2))
        key = b.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id_a": pa.array(key >> 32, pa.int64()),
                "vec_id_b": pa.array(key & 0xFFFFFFFF, pa.int64()),
            }
        )

    return counted.map_batches(decode, batch_format="pyarrow")


def ivf_topk(
    ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16, n_probe: int = 4,
    id_col: str = "vec_id", emb_col: str = "embedding", sample_size: int = 2048, seed: int = 7,
    centroids=None,
):
    """IVF-style ANN: probe only the n_probe nearest centroid lists.

    ``centroids``: ``None`` fits coarse centroids per call (one bounded
    sample + seeded Lloyd -- a per-query scan plan); a PATH loads the
    centroid table persisted by ``index.build_ivf_centroids`` (the real
    build-once/lookup-many index shape: repeated query sets skip
    re-clustering; VERDICT r4 #8), validating the stored params match
    ``n_centroids``/``seed`` so a stale or differently-built index raises
    instead of silently probing wrong lists; a ready ``np.ndarray`` is
    used as-is."""
    import ray

    if centroids is None:
        sample = np.stack([r[emb_col] for r in ds.take(sample_size)])
        cents = sk.seeded_centroids(sample, n_centroids, seed=seed)
    elif isinstance(centroids, str):
        from .index import load_ivf_centroids

        cents, params = load_ivf_centroids(centroids)
        if params["n_centroids"] != n_centroids or params["seed"] != seed:
            raise ValueError(
                f"persisted IVF index {centroids!r} was built with "
                f"{params}, caller requested n_centroids={n_centroids} "
                f"seed={seed}; rebuild with index.build_ivf_centroids"
            )
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    q = sk.normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_set = sorted({int(c) for row in probed for c in row})
    handle = [ray.put(np.asarray(queries, dtype=np.float64))]
    assigned = ds.map_batches(
        sk.CentroidAssign,
        fn_constructor_kwargs={"centroids_handle": [ray.put(cents)], "emb_col": emb_col},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    candidates = assigned.filter(expr=f"centroid in {probe_set}")
    partials = candidates.map_batches(
        sk.BatchTopK,
        fn_constructor_kwargs={"queries_handle": handle, "k": k, "id_col": id_col, "emb_col": emb_col},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sk.final_topk_group(g, k, id_col), batch_format="pandas"
    )


# ------------------------------------------------------- duplicate clusters


def dedup_clusters(
    pairs, *, id_a: str = "doc_a", id_b: str = "doc_b", max_iters: int = 50,
    buckets: int | None = None, collect_cap_edges: int = 4_000_000,
):
    """Connected components over a near-duplicate pair graph via iterative
    min-label propagation with pointer jumping: each round a node's label
    becomes the min of {its label, neighbors' labels, its label's label}.
    The label-of-label hop halves path lengths each round, so convergence is
    O(log diameter), not O(diameter). The loop runs to a FIXED POINT (zero
    label changes); ``max_iters`` is a safety valve that raises rather than
    silently returning split components. Under ``collect_cap_edges`` the
    edge list instead collects to the driver for a path-compressed
    union-find with identical min-id labels (see the inline note: path
    diameters made the join rounds pay 42 s against sub-second edge sets);
    past the cap all steps are Dataset ops -- edges and labels shuffle by
    node id; only the scalar change-count per round reaches the driver.

    Returns (doc_id, cluster_id) with cluster_id = min doc id in the
    component.
    """
    from ray.data.aggregate import Min

    _EMPTY = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    _EDGE = pa.schema([("node", pa.int64()), ("nbr", pa.int64())])

    def to_edges(batch: pa.Table) -> pa.Table:
        # schema-less empty blocks (all pair groups empty) have no columns;
        # the int64 fallback type never mixes with real edges because a
        # schema-less pairs dataset is empty overall (early return below)
        if id_a not in batch.column_names:
            return _EDGE.empty_table()
        a = batch.column(id_a)
        b = batch.column(id_b)
        return pa.table(
            {
                "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "nbr": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # empty graph: typed empty result, no join/groupby machinery touched
        import ray.data as rd

        return rd.from_arrow(_EMPTY.empty_table())
    if n_edges <= collect_cap_edges:
        # near-dup edge sets are dup-rate-bounded, but their DIAMETER is
        # not: crawl-stitch paths made the O(log diameter) join rounds
        # below cost 42 s against a sub-second edge pass. Under the cap
        # the edges collect to the driver for a path-compressed
        # union-find with min-root union -- VALUE-identical labels
        # (cluster_id = min member id, roots can only move toward the
        # minimum) -- the adaptive small-side convention: bounded,
        # deliberate, loud. Past the cap the pointer-jumping path below
        # runs unchanged.
        import ray.data as rd

        df = edges.to_pandas()
        a = df["node"].to_numpy()  # type-preserving: int64 OR string ids
        b = df["nbr"].to_numpy()
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        par = np.arange(len(ids), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while par[root] != root:
                root = par[root]
            while par[x] != root:  # path compression
                par[x], x = root, par[x]
            return root

        ai, bi = inv[: len(a)], inv[len(a):]
        for x, y in zip(ai, bi):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                par[max(rx, ry)] = min(rx, ry)
        roots = np.array([find(int(i)) for i in range(len(ids))], np.int64)
        # type-preserving: int ids stay int64, string ids (entity names)
        # stay string; np.unique sorts ascending so min root index == min id
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids),
            "cluster_id": pa.array(ids[roots]),
        }))
    if buckets is None:
        # size the join fan-out so one bucket's edges stay ~100k rows
        buckets = max(4, min(512, n_edges // 100_000 + 4))
    # labels: node -> current component label (init: itself)
    labels = (
        edges.groupby("node").aggregate(Min("nbr", alias_name="_"))
        .map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("node")}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    converged = False
    for _ in range(max_iters):
        from .relational import bucketed_hash_join

        # neighbor labels: edges joined with labels on nbr
        nbr_labels = bucketed_hash_join(
            edges,
            labels.map_batches(
                lambda t: pa.table({"nbr": t.column("node"), "nbr_label": t.column("label")}),
                batch_format="pyarrow",
            ),
            "nbr", "nbr", buckets=buckets,
        ).map_batches(
            lambda t: pa.table({"node": t.column("node"), "cand": t.column("nbr_label")}),
            batch_format="pyarrow",
        )
        # pointer jumping: label-of-label (labels joined with itself)
        jump = bucketed_hash_join(
            labels.map_batches(
                lambda t: pa.table({"node": t.column("node"), "lbl": t.column("label")}),
                batch_format="pyarrow",
            ),
            labels.map_batches(
                lambda t: pa.table({"lbl2": t.column("node"), "parent": t.column("label")}),
                batch_format="pyarrow",
            ),
            "lbl", "lbl2", buckets=buckets,
        ).map_batches(
            lambda t: pa.table({"node": t.column("node"), "cand": t.column("parent")}),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"), "cand": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = (
            own.union(nbr_labels).union(jump)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        # convergence: did any label shrink this round?
        joined = bucketed_hash_join(
            labels.map_batches(
                lambda t: pa.table({"node": t.column("node"), "old": t.column("label")}),
                batch_format="pyarrow",
            ),
            new_labels.map_batches(
                lambda t: pa.table({"n2": t.column("node"), "new": t.column("label")}),
                batch_format="pyarrow",
            ),
            "node", "n2", buckets=buckets,
        )
        changed = joined.map_batches(
            lambda t: pa.table(
                {"c": pa.array([int((np.asarray(t.column("old")) != np.asarray(t.column("new"))).sum())], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iters} rounds; "
            "raise max_iters (components deeper than 2^max_iters hops)"
        )
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"), "cluster_id": t.column("label")}),
        batch_format="pyarrow",
    )


def top_tokens(ds, text_col: str = "text", k: int = 20):
    """Exact corpus-wide heavy hitters: top-k whitespace tokens by total
    count (ties broken by token asc). Per-batch vectorized token counting
    (one pandas value_counts per batch -> one row per distinct token per
    batch) -> distributed groupby(token) sum (token cardinality is
    unbounded: the shuffle moves (token, count) partials, never text) ->
    global top-k via sort + limit on the count table."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(ts._WS_TOKEN).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    from .relational import bucketed_grouped_sum

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "token", "n"
    )

    # per-block partial top-k then a single tiny merge: the global sort
    # would shuffle EVERY distinct token to produce 20 rows
    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "token"], ascending=[False, True]).head(k)

    return (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
    )


def bm25_topk(
    ds,
    queries: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 full-text retrieval: top-k documents per query over a fixed
    (broadcast) query set -- the batch-friendly framing of search scoring,
    same shape as ``ann_topk``'s broadcast query matrix.

    Plan (ONE pass over the corpus text -- the 100 TB shape):

    1. ``map_batches`` projects each document to a COMPACT stats row
       (doc_id, dl, one count per distinct query term): ~(m+2) ints per
       doc; the text never leaves the first stage. The projection is
       materialized because two consumers need it (corpus stats + scoring)
       and re-deriving it would re-read AND re-tokenize the corpus.
       Scale note: the projection is ~8*(m+2) bytes/doc -- at 10^12 docs
       that is tens of TB in the object store (spillable, partitioned);
       if storage is tighter than compute, drop the materialize() and let
       both consumers re-run the projection from the pruned source read.
    2. A partial/final aggregate over the projection yields N, sum(dl) and
       df per term -- one tiny row per block reaches the driver.
    3. idf/avgdl constants are closure-broadcast; a second pass over the
       small projection computes integer-ppm BM25 (per-TERM ppm floor,
       then integer sum -- order-independent, hence exactly replayable by
       the DuckDB oracle, where a float SUM() would be order-sensitive in
       the last ulp) and keeps a per-batch partial top-k per query.
    4. Tiny final merge per query (score desc, doc_id asc tie-break).

    Uses the Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))`` (always positive).
    Tokens are ``[a-z0-9]+`` runs of the lowercased text on both sides.
    Returns (query_id, doc_id, score_ppm), only docs matching >=1 term.
    """
    import re

    terms = sorted({w for q in queries for w in re.findall(r"[a-z0-9]+", q.lower())})
    term_sets = [
        {terms.index(w) for w in re.findall(r"[a-z0-9]+", q.lower())} for q in queries
    ]
    m = len(terms)
    if m == 0:  # no query yields a token: typed empty, not a stack() crash
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("query_id", pa.int64()), (id_col, pa.int64()), ("score_ppm", pa.int64())]
            ).empty_table()
        )
    cnt_cols = [f"c{j}" for j in range(m)]
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def stats(batch: pa.Table) -> pa.Table:
        # one compiled-findall pass + Counter per doc. Measured AGAINST the
        # "vectorized" alternative (pandas str.count with boundary
        # lookarounds, one pass per term): Counter wins 4.6x on the
        # testdata corpus (0.08 s vs 0.37 s / 5k docs) because findall
        # tokenizes once while str.count re-scans the text per term --
        # the per-doc Python loop is the fast shape here, not a smell.
        import re as _re
        from collections import Counter

        word = _re.compile(r"[a-z0-9]+")
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        dl = np.empty(len(ids), np.int64)
        cnt = np.zeros((len(ids), m), np.int64)
        term_ix = {t: j for j, t in enumerate(terms)}
        for r, t in enumerate(texts):
            words = word.findall(t.lower())
            dl[r] = len(words)
            if not words:
                continue
            c = Counter(words)
            for tm, j in term_ix.items():
                v = c.get(tm)
                if v:
                    cnt[r, j] = v
        cols = {id_col: batch.column(id_col), "dl": pa.array(dl)}
        for j, c_ in enumerate(cnt_cols):
            cols[c_] = pa.array(cnt[:, j])
        return pa.table(cols)

    proj = ds.map_batches(stats, batch_format="pyarrow").materialize()

    # corpus stats: one partial row per block, merged on the driver
    def partial_stats(batch: pa.Table) -> pa.Table:
        row = {"n": [batch.num_rows], "sdl": [int(np.sum(batch.column("dl").to_numpy()))]}
        for c_ in cnt_cols:
            row[f"df_{c_}"] = [int(np.count_nonzero(batch.column(c_).to_numpy()))]
        return pa.table(row)

    agg = proj.map_batches(partial_stats, batch_format="pyarrow").to_pandas()
    # an empty input Dataset produces zero partial rows (and no columns)
    n_docs = int(agg["n"].sum()) if "n" in agg.columns else 0
    if n_docs == 0:  # empty corpus: typed empty result, no 0/0 estimator
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("query_id", pa.int64()), (id_col, pa.int64()), ("score_ppm", pa.int64())]
            ).empty_table()
        )
    sum_dl = int(agg["sdl"].sum())
    df = np.array([int(agg[f"df_{c_}"].sum()) for c_ in cnt_cols], dtype=np.int64)
    avgdl = sum_dl / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score_batch(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy().astype(np.float64)
        ids = batch.column(id_col).to_numpy()
        tf = np.stack([batch.column(c_).to_numpy() for c_ in cnt_cols], axis=1).astype(
            np.float64
        )
        denom = tf + k1 * (one_minus_b + b * (dl / avgdl))[:, None]
        ts_ = idf[None, :] * (tf * k1p1) / denom
        ppm = np.floor(ts_ * 1000000.0 + 0.5).astype(np.int64)
        ppm[tf == 0] = 0
        out_q, out_id, out_s = [], [], []
        for qi, jset in enumerate(term_sets):
            js = sorted(jset)
            score = ppm[:, js].sum(axis=1)
            hit = (tf[:, js] > 0).any(axis=1)
            # partial top-k inside the batch: score desc, doc_id asc
            hi = np.flatnonzero(hit)
            order = hi[np.lexsort((ids[hi], -score[hi]))][:k]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(score[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else []),
                id_col: pa.array(
                    np.concatenate(out_id) if out_id else [], batch.schema.field(id_col).type
                ),
                "score_ppm": pa.array(np.concatenate(out_s) if out_s else []),
            }
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score_ppm", id_col], ascending=[False, True]).head(k)

    return (
        proj.map_batches(score_batch, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


# --------------------------------------------------------------- quantiles


def tfidf_keywords(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_idf_bytes: int = 256 << 20,
):
    """Per-document keyword extraction: top-``k`` terms by tf-idf
    (``tf * ln((N+1)/(df+1))``, integer ppm; ties broken term-ascending).

    Two passes, both explode-vectorized (flat (doc, term) frames + C
    groupbys, the ``repetition_features`` discipline):

    1. document frequencies -- per-batch (term, n_docs_in_batch) partials
       (documents never span batches, so batch partials sum to exact df)
       -> ``groupby(term)`` -> the vocab-sized df table, collected and
       broadcast as an idf dict. N (total docs) rides the same pass as a
       sentinel term ``""`` (unmatched by the ``[a-z0-9]+`` tokenizer, so
       collision-free) -- a separate ``ds.count()`` would execute the
       whole upstream a third time (review finding, round 3). The dict is Zipf-bounded in practice;
       ``broadcast_idf_bytes`` guards the collect and raises loudly past
       it (the past-the-cap shape is a bucketed term join of the flat tf
       frame against the df table -- deliberately a separate build, not a
       silent fallback, because it changes the shuffle profile).
    2. per-batch (doc, term, tf) -> idf gather -> per-doc top-k entirely
       batch-local (a doc's terms live in its batch): sort + groupby head.

    Returns (id, term, score_ppm), <= k rows per document."""
    import math
    import re

    import ray
    from ray.data.aggregate import Sum

    word = re.compile(r"[a-z0-9]+")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        ids = np.repeat(batch[id_col].to_numpy(), lens)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t] or [np.array([], object)]
        )
        return pd.DataFrame({id_col: ids, "term": flat})

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat = explode(batch)
        per_doc = flat.drop_duplicates([id_col, "term"])
        out = per_doc.groupby("term", sort=False).size().rename("df").reset_index()
        # sentinel row: term "" carries this batch's doc count, so N sums
        # through the same shuffle instead of a third pass over ds
        return pd.concat(
            [out, pd.DataFrame({"term": [""], "df": [len(batch)]})], ignore_index=True
        )

    from .relational import bucketed_grouped_sum

    df_table = bucketed_grouped_sum(
        ds.map_batches(df_partial, batch_format="pandas"), "term", "df"
    ).materialize()
    if df_table.size_bytes() > broadcast_idf_bytes:
        raise ValueError(
            f"idf table is {df_table.size_bytes()} B > broadcast cap "
            f"{broadcast_idf_bytes}; use the bucketed term-join variant for "
            "vocabularies this large"
        )
    dft = df_table.to_pandas()
    n_docs = int(dft.loc[dft["term"] == "", "df"].sum())
    idf = {
        t: math.log((n_docs + 1.0) / (d + 1.0))
        for t, d in zip(dft["term"], dft["df"])
        if t != ""
    }
    handle = [ray.put(idf)]

    class Score:
        def __init__(self) -> None:
            self.idf = ray.get(handle[0])

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            flat = explode(batch)
            if not len(flat):
                return pd.DataFrame(
                    {id_col: pd.Series([], dtype="int64"), "term": [], "score_ppm": pd.Series([], dtype="int64")}
                )
            tf = (
                flat.groupby([id_col, "term"], sort=False).size().rename("tf").reset_index()
            )
            iv = tf["term"].map(self.idf).to_numpy(dtype=np.float64)
            tf["score_ppm"] = np.floor(
                tf["tf"].to_numpy(dtype=np.float64) * iv * 1e6 + 0.5
            ).astype("int64")
            top = (
                tf.sort_values(
                    [id_col, "score_ppm", "term"], ascending=[True, False, True]
                )
                .groupby(id_col, sort=False)
                .head(k)
            )
            return top[[id_col, "term", "score_ppm"]].reset_index(drop=True)

    return ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))


def exact_quantile(ds, col: str, q: float = 0.5, bins: int = 4096, pull_limit: int = 100_000):
    """EXACT distributed quantile without a global sort: iterative histogram
    bisection. Each round is one bounded pass -- a fixed-width ``bins``-bucket
    histogram over the current value range, computed as per-batch numpy
    bincounts summed through a tiny aggregate -- after which the target rank
    lands in ONE bucket whose population shrinks ~``bins``x per round
    (log_bins(n) rounds: 3 passes reach 10^11 rows). When the candidate
    range holds <= ``pull_limit`` values, they are collected and the k-th
    smallest is read off directly. Only histogram vectors (bins * 8 B) and
    the final small bucket ever reach the driver.

    Rank convention: k = ceil(q * n) among ascending values (matches the
    ``row_number() = CEIL(q*n)`` SQL oracle). Returns the value as float.
    """
    import math

    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(col), Max(col), Count())
    lo, hi, n = float(stats[f"min({col})"]), float(stats[f"max({col})"]), int(stats["count()"])
    if n == 0:
        raise ValueError("exact_quantile on empty dataset")
    if hi == lo:
        return lo  # constant column
    k = max(1, math.ceil(q * n))  # 1-indexed rank among ascending
    return _quantile_from_stats(ds, col, k, lo, hi, n, bins, pull_limit)


def exact_quantiles(ds, col: str, qs, bins: int = 4096, pull_limit: int = 100_000):
    """Multi-target ``exact_quantile``: identical rank convention and
    bisection, but ONE shared Min/Max/Count pass and -- when the column
    fits ``pull_limit`` -- ONE shared bounded collect serving every rank.
    Motivation (measured): rfm_segments needs 9 boundaries over a
    customer-bounded table; 9 independent calls cost 18 dataset
    executions whose ~0.25 s per-execution constant dominates at ANY
    input size. Past ``pull_limit`` each target runs its own bisection
    (targets diverge into different buckets after round 1), still
    sharing the stats pass -- the at-scale passes are the histograms,
    which were always per-target work. Returns {q: value}."""
    import math

    from ray.data.aggregate import Count, Max, Min

    qs = list(qs)
    stats = ds.aggregate(Min(col), Max(col), Count())
    lo, hi, n = float(stats[f"min({col})"]), float(stats[f"max({col})"]), int(stats["count()"])
    if n == 0:
        raise ValueError("exact_quantiles on empty dataset")
    if hi == lo:
        return {q: lo for q in qs}
    ranks = {q: max(1, math.ceil(q * n)) for q in qs}
    if n <= pull_limit:
        vals = np.sort(np.concatenate(
            [b.column(col).to_numpy(zero_copy_only=False)
             for b in ds.select_columns([col]).iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.float64)]
        ))
        return {q: float(vals[k - 1]) for q, k in ranks.items()}
    return {
        q: _quantile_from_stats(ds, col, k, lo, hi, n, bins, pull_limit)
        for q, k in ranks.items()
    }


def _quantile_from_stats(ds, col, k, lo, hi, n, bins, pull_limit):
    """Bisection core shared by exact_quantile / exact_quantiles: narrow
    to the bucket holding ascending rank ``k``, then read it off the
    collected (<= pull_limit) remainder."""
    cur = ds
    n_within = n
    while n_within > pull_limit and hi > lo:
        width = (hi - lo) / bins

        def partial_hist(batch: pa.Table, lo_=lo, width_=width) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            b = np.clip(((v - lo_) / width_).astype(np.int64), 0, bins - 1)
            counts = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(counts)
            return pa.table(
                {"bin": pa.array(nz, pa.int64()), "cnt": pa.array(counts[nz], pa.int64())}
            )

        from .relational import tiny_final_groupby

        hist = tiny_final_groupby(
            cur.map_batches(partial_hist, batch_format="pyarrow"),
            ["bin"], [("cnt", "sum")], ["bin", "cnt"],
        ).to_pandas().sort_values("bin")
        cum = hist["cnt"].cumsum().to_numpy()
        idx = int(np.searchsorted(cum, k))
        b = int(hist["bin"].iloc[idx])
        k -= int(cum[idx - 1]) if idx > 0 else 0
        n_within = int(hist["cnt"].iloc[idx])
        # narrow EXCLUSIVELY with the same bin formula the histogram used --
        # a separate >=/<= range filter can disagree with floor((v-lo)/width)
        # in the last float ulp at a bucket boundary and drop a counted value
        def in_bin(batch: pa.Table, lo_=lo, width_=width, b_=b) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            vb = np.clip(((v - lo_) / width_).astype(np.int64), 0, bins - 1)
            return batch.filter(pa.array(vb == b_))

        cur = cur.map_batches(in_bin, batch_format="pyarrow")
        # the next round's histogram spans the selected bucket (approximate
        # float bounds are fine: its bin formula re-clips into [0, bins))
        lo, hi = lo + b * width, min(lo + (b + 1) * width, hi)

    vals = np.concatenate(
        [b.column(col).to_numpy(zero_copy_only=False)
         for b in cur.select_columns([col]).iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.float64)]
    )
    return float(np.partition(vals, k - 1)[k - 1])


def weighted_quantile_cents(ds, col: str, weight_col: str, q: float = 0.5,
                            bins: int = 4096, pull_limit: int = 100_000):
    """EXACT weighted quantile (no global sort): the smallest value whose
    cumulative weight -- ascending by value, ties inclusive -- reaches
    ``ceil(q * total_weight)``; e.g. the quantity-weighted median price,
    where a row counting 50 units pulls the median 50x harder than a
    single-unit row. Same iterative histogram bisection as
    ``exact_quantile``, but bucket populations are WEIGHT sums (exact
    int64 via np.add.at, never float bincount) and the target rank is a
    weight rank.

    Values are floored to integer cents first, so bin assignment is pure
    integer arithmetic -- the histogram and the narrowing filter share one
    exact formula (no float-ulp boundary risk), and a width-1 bin IS the
    answer regardless of its population: convergence never depends on
    ``pull_limit`` even under extreme value skew. Returns integer cents.
    """
    import math

    from .relational import tiny_final_groupby

    def _cents_np(batch: pa.Table) -> np.ndarray:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def stats(batch: pa.Table) -> pa.Table:
        c = _cents_np(batch)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (w < 0).any():
            raise ValueError("weighted_quantile_cents: negative weight")
        return pa.table({"lo": [int(c.min())], "hi": [int(c.max())],
                         "w": [int(w.sum())]})

    mm = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    total_w = int(mm["w"].sum())
    if total_w <= 0:
        raise ValueError("weighted_quantile_cents: zero total weight")
    k = max(1, math.ceil(q * total_w))
    cur = ds
    while True:
        width = max(1, (hi - lo + bins) // bins)

        def part(batch: pa.Table, lo_=lo, width_=width) -> pa.Table:
            c = _cents_np(batch)
            w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = np.clip((c - lo_) // width_, 0, bins - 1)
            cnt = np.bincount(b, minlength=bins)
            ws = np.zeros(bins, np.int64)
            np.add.at(ws, b, w)
            nz = np.flatnonzero(cnt)
            return pa.table({"bin": pa.array(nz, pa.int64()),
                             "cnt": pa.array(cnt[nz], pa.int64()),
                             "wsum": pa.array(ws[nz], pa.int64())})

        hist = tiny_final_groupby(
            cur.map_batches(part, batch_format="pyarrow"),
            ["bin"], [("cnt", "sum"), ("wsum", "sum")], ["bin", "cnt", "wsum"],
        ).to_pandas().sort_values("bin")
        cumw = hist["wsum"].cumsum().to_numpy()
        idx = int(np.searchsorted(cumw, k))
        b = int(hist["bin"].iloc[idx])
        k -= int(cumw[idx - 1]) if idx > 0 else 0
        rows_in = int(hist["cnt"].iloc[idx])
        new_lo = lo + b * width
        if width == 1:
            return new_lo  # single-value bin: its value is the answer
        if rows_in <= pull_limit:
            def in_bin(batch: pa.Table, lo_=lo, width_=width, b_=b) -> pa.Table:
                c = _cents_np(batch)
                vb = np.clip((c - lo_) // width_, 0, bins - 1)
                return batch.filter(pa.array(vb == b_))

            small = cur.map_batches(in_bin, batch_format="pyarrow")
            cs, wsl = [], []
            for t in small.select_columns([col, weight_col]).iter_batches(
                    batch_format="pyarrow"):
                cs.append(_cents_np(t))
                wsl.append(t.column(weight_col).to_numpy(
                    zero_copy_only=False).astype(np.int64))
            c = np.concatenate(cs)
            w = np.concatenate(wsl)
            order = np.argsort(c, kind="stable")
            c, w = c[order], w[order]
            return int(c[int(np.searchsorted(np.cumsum(w), k))])

        def in_bin2(batch: pa.Table, lo_=lo, width_=width, b_=b) -> pa.Table:
            c = _cents_np(batch)
            vb = np.clip((c - lo_) // width_, 0, bins - 1)
            return batch.filter(pa.array(vb == b_))

        cur = cur.map_batches(in_bin2, batch_format="pyarrow")
        lo, hi = new_lo, min(new_lo + width - 1, hi)


def grouped_quantile(ds_factory, key: str, col: str, q: float = 0.5, keys=None):
    """Exact per-group quantile for a BOUNDED key set (enum-like keys:
    event types, languages, segments): one ``exact_quantile`` run -- the
    histogram-bisection kernel, no global sort -- per key over the
    key-filtered dataset.

    ``ds_factory`` is a zero-arg callable returning a fresh Dataset (each
    key's run re-reads; with k keys that is k bounded passes -- the right
    trade for k <= ~20. An unbounded-key grouped quantile needs per-key
    sketches instead; that variant is deliberately not hidden behind the
    same name). ``keys`` defaults to the distinct key values (small
    aggregate). Returns a pandas DataFrame (key, q_value) -- tiny by
    construction."""
    import pyarrow.compute as pc

    if keys is None:
        from ray.data.aggregate import Count

        kt = ds_factory().groupby(key).aggregate(Count(alias_name="__n")).to_pandas()
        keys = sorted(kt[key].tolist())

    rows = []
    for k in keys:
        def only_k(batch: pa.Table, k=k) -> pa.Table:
            return batch.filter(pc.equal(batch.column(key), k))

        filtered = ds_factory().map_batches(only_k, batch_format="pyarrow")
        rows.append({key: k, "q_value": exact_quantile(filtered, col, q=q)})
    return pd.DataFrame(rows)


def robust_outliers(
    ds_factory, key: str = "lang", col: str = "n_chars", id_col: str = "doc_id",
    k_mad: int = 3,
):
    """Per-group robust outlier flags via median/MAD — the quality-filter
    primitive that survives heavy-tailed length/score distributions where
    mean/std thresholds don't (one 10 MB doc drags a z-score cutoff; it
    cannot drag a median).

    Exact in TWO executions total (the first cut ran 2 + 2k Dataset
    executions through the ``grouped_quantile`` kernel — 28 s of pure
    per-execution constants at sf0.1; bench finding, round 3): pass 1
    shuffles per-batch ``(key, value) -> count`` partials (pre-aggregated,
    so the shuffle is value-domain-sized, not row-sized) and the driver
    folds the per-key value histograms into exact ceil-rank medians AND
    MADs (the dev histogram is a re-key of the value histogram by
    ``|v - med|`` — no second data pass); pass 2 flags map-side.
    ``max_hist_rows`` guards the driver fold: integer-ish domains (lengths,
    cents, ppm scores) stay small at any corpus size; a genuinely unbounded
    domain should use the ``grouped_quantile`` bisection kernel instead —
    that trade is the caller's, so the guard raises loudly.

    All-integer compare (``dev > k_mad * mad``; med/mad are actual data
    values by the ceil-rank convention), so the SQL window replay is
    exact. Returns only flagged rows: (id, key, dev, cutoff)."""
    import math

    from ray.data.aggregate import Sum

    max_hist_rows = 2_000_000

    def val_counts(batch: pa.Table) -> pa.Table:
        df = batch.select([key, col]).to_pandas()
        vc = df.groupby([key, col], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(vc, preserve_index=False)

    hist = (
        ds_factory()
        .map_batches(val_counts, batch_format="pyarrow")
        .groupby([key, col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(hist) > max_hist_rows:
        raise ValueError(
            f"value histogram has {len(hist)} rows > {max_hist_rows}; use "
            "grouped_quantile's histogram bisection for unbounded domains"
        )

    def rank_value(vals: np.ndarray, counts: np.ndarray) -> int:
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(counts[order])
        k = max(1, math.ceil(0.5 * cum[-1]))  # exact_quantile's ceil-rank
        return int(vals[order][np.searchsorted(cum, k)])

    med: dict = {}
    mad: dict = {}
    for k, grp in hist.groupby(key, sort=False):
        vals = grp[col].to_numpy(np.int64)
        counts = grp["n"].to_numpy(np.int64)
        m = rank_value(vals, counts)
        med[k] = m
        devs = np.abs(vals - m)  # dev histogram = re-keyed value histogram
        mad[k] = rank_value(devs, counts)

    def flag(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_pylist()
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.fromiter((med[k] for k in ks), dtype=np.int64, count=len(ks))
        dev = np.abs(x - m)
        cutoff = np.fromiter((k_mad * mad[k] for k in ks), dtype=np.int64, count=len(ks))
        t = pa.table(
            {
                id_col: batch.column(id_col),
                key: batch.column(key),
                "dev": pa.array(dev, pa.int64()),
                "cutoff": pa.array(cutoff, pa.int64()),
            }
        )
        return t.filter(pa.array(dev > cutoff))

    return ds_factory().map_batches(flag, batch_format="pyarrow")


def grouped_quantile_sketch(
    ds, key: str, col: str, q: float = 0.5, bins: int = 256,
    lo: float | None = None, hi: float | None = None,
):
    """Approximate grouped quantile for UNBOUNDED key sets (per-user, per-
    domain): one fixed-width histogram per key, built from per-batch
    pre-aggregated (key, bin, count) partials -- the shuffle moves tiny
    count rows, never values, and works for any key cardinality (the
    bounded-key ``grouped_quantile`` is exact but runs one pass per key).

    The estimate is the LOWER EDGE of the first bin whose cumulative count
    reaches ``ceil(q * n)`` -- deliberately interpolation-free so the
    estimator is a deterministic function of (lo, hi, bins, counts) and a
    SQL oracle replays it bit-for-bit (same float64 ops). Error is bounded
    by one bin width ((hi-lo)/bins).

    ``lo``/``hi`` default to a global min/max pass; pass them explicitly to
    skip it (and to keep a stable binning across incremental runs)."""
    from ray.data.aggregate import Max, Min, Sum

    if lo is None or hi is None:
        g = ds.aggregate(Min(col), Max(col))
        lo = float(g[f"min({col})"]) if lo is None else lo
        hi = float(g[f"max({col})"]) if hi is None else hi
    width = (hi - lo) / bins if hi > lo else 1.0

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.clip(
            np.floor((batch[col].to_numpy(dtype=np.float64) - lo) / width).astype(np.int64),
            0, bins - 1,
        )
        out = pd.DataFrame({key: batch[key].values, "bin": b})
        return out.groupby([key, "bin"], sort=False).size().rename("cnt").reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        # one group = ALL partials of one key (<= bins rows after merge)
        g = group.groupby("bin", as_index=False)["cnt"].sum().sort_values("bin")
        n = int(g["cnt"].sum())
        target = int(np.ceil(q * n))
        cum = g["cnt"].cumsum().to_numpy()
        b = int(g["bin"].to_numpy()[np.searchsorted(cum, target)])
        return pd.DataFrame({key: [group[key].iloc[0]], "q_value": [lo + b * width]})

    return partials.groupby(key).map_groups(pick, batch_format="pandas")


# ---------------------------------------------------------------- sampling


def profile_table(ds, columns: list[str], buckets: int = 64):
    """Data-profiling pass -- per column: row count, null count, EXACT
    distinct count -- the first thing run against any new table. The
    naive shape is one COUNT(DISTINCT) shuffle PER column; here ALL
    columns share ONE token-domain exchange: each batch collapses every
    column to its distinct non-null values, tokenizes them (full-md5 of
    the value's string form -- the repo's exact-dedup convention, 128-bit
    so collision-free in practice), and ships (col, token) pairs; buckets
    dedup across batches and emit per-column partial distinct counts; a
    tiny bounded final (one row per column) folds counts and nulls.

    Returns (col, n_rows, n_nulls, n_distinct), one row per column.
    """
    import hashlib

    from .relational import hash_bucket_column, tiny_final_groupby

    cols = list(columns)

    def counts_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "n": pa.array([n] * len(cols), pa.int64()),
                "nulls": pa.array(
                    [batch.column(c).null_count for c in cols], pa.int64()
                ),
            }
        )

    def token_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_c, out_t = [], []
        for c in cols:
            v = batch.column(c).drop_null()
            uniq = pc.unique(v.combine_chunks())
            toks = [hashlib.md5(str(x).encode()).hexdigest()
                    for x in uniq.to_pylist()]
            out_c.extend([c] * len(toks))
            out_t.extend(toks)
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "tok": pa.array(out_t, pa.string())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "tok", buckets)

    def bucket_distinct(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["col", "tok"]).groupby("col").size()
        return pd.DataFrame({"col": d.index.to_numpy(),
                             "nd": d.to_numpy(np.int64)})

    stats = tiny_final_groupby(
        ds.map_batches(counts_partial, batch_format="pyarrow"),
        ["col"], [("n", "sum"), ("nulls", "sum")], ["col", "n_rows", "n_nulls"],
    ).to_pandas().set_index("col")
    distinct = (
        ds.map_batches(token_partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
        .to_pandas().groupby("col")["nd"].sum()
    )
    out = stats.loc[cols].reset_index()
    out["n_distinct"] = [int(distinct.get(c, 0)) for c in cols]
    return out


def pps_systematic_sample(ds, id_col: str = "doc_id",
                          weight_col: str = "n_chars", k: int = 500,
                          buckets: int | None = None):
    """Systematic probability-proportional-to-size (PPS) sampling: draw
    EXACTLY ``k`` rows with inclusion probability proportional to
    ``weight_col`` -- e.g. sample documents proportional to their length so
    the sample's token mass mirrors the corpus. Row i (in id order, with
    global cumulative weight ``cum_i``) is drawn ``n_hits`` times, where
    ``n_hits = floor(cum_i*k/W) - floor((cum_i - w_i)*k/W)`` -- how many
    skip boundaries its weight interval spans. Boundaries advance exactly
    k times as cum runs 0 -> W, so SUM(n_hits) == k exactly (a row heavier
    than W/k is a certainty unit hit multiple times), zero-weight rows can
    never be drawn, and the whole draw is integer arithmetic end-to-end --
    replayable verbatim in ANSI SQL (no RNG, no float ulp risk).

    Scale shape: a distributed prefix sum, the ``_range_offsets``
    discipline over the id domain -- pass 1 reduces per-id-bin weight sums
    to exclusive global offsets (KB-sized, broadcast once via ray.put);
    pass 2 is ONE range exchange where each bin sorts locally by id and
    applies offset + local cumsum. No global sort, no driver collect of
    data rows. Returns (id_col, weight_col, n_hits) for the drawn rows.
    """
    import ray

    from .relational import derive_buckets, tiny_final_groupby

    if k < 1:
        raise ValueError("pps_systematic_sample: k must be >= 1")

    def _cols(batch: pa.Table):
        i = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return i, w

    def mm(batch: pa.Table) -> pa.Table:
        i, w = _cols(batch)
        if (w < 0).any():
            raise ValueError("pps_systematic_sample: negative weight")
        return pa.table({"lo": [int(i.min())], "hi": [int(i.max())],
                         "w": [int(w.sum())], "n": [len(i)]})

    st = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = int(st["lo"].min()), int(st["hi"].max())
    total_w, n = int(st["w"].sum()), int(st["n"].sum())
    if total_w <= 0:
        raise ValueError("pps_systematic_sample: zero total weight")
    if total_w > (2**62) // k:
        raise ValueError("pps_systematic_sample: k x total weight overflows "
                         "int64; reduce k or rescale weights")
    if buckets is None:
        buckets = derive_buckets(n)
    width = max(1, (hi - lo + buckets) // buckets)

    def bin_w(batch: pa.Table) -> pa.Table:
        i, w = _cols(batch)
        b = (i - lo) // width
        ws = np.zeros(buckets, np.int64)
        np.add.at(ws, b, w)
        nz = np.flatnonzero(ws)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "wsum": pa.array(ws[nz], pa.int64())})

    hist = tiny_final_groupby(
        ds.map_batches(bin_w, batch_format="pyarrow"),
        ["bin"], [("wsum", "sum")], ["bin", "wsum"],
    ).to_pandas()
    offsets = np.zeros(buckets, dtype=np.int64)
    offsets[hist["bin"].to_numpy()] = hist["wsum"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    handle = ray.put(offsets)

    def add_bin(batch: pa.Table) -> pa.Table:
        i, w = _cols(batch)
        b = (i - lo) // width
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                weight_col: pa.array(w, pa.int64()),
                "__bucket": pa.array(b.astype(np.int32), pa.int32()),
            }
        )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)
        i = group[id_col].to_numpy(np.int64)
        w = group[weight_col].to_numpy(np.int64)
        order = np.argsort(i, kind="stable")
        i, w = i[order], w[order]
        cw = offs[int((i[0] - lo) // width)] + np.cumsum(w)
        hits = (cw * k) // total_w - ((cw - w) * k) // total_w
        sel = hits > 0
        return pd.DataFrame({id_col: i[sel], weight_col: w[sel],
                             "n_hits": hits[sel]})

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pick, batch_format="pandas")
    )


def _md5_hex8(values) -> list[str]:
    import hashlib

    return [hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8] for v in values]


def deterministic_sample(ds, id_col: str = "doc_id", rate: float = 0.25):
    """Deterministic content-addressed sampling: keep rows whose
    ``md5(str(id))`` 8-hex prefix falls below the rate threshold. Unlike
    ``ds.random_sample`` this is reproducible across runs/cluster sizes and
    SQL-checkable (DuckDB's md5 of the same string matches byte-for-byte);
    randomness never enters the data path (SURVEY.md #7.3)."""
    threshold = format(int(rate * 0xFFFFFFFF), "08x")

    def fn(batch: pa.Table) -> pa.Table:
        hx = _md5_hex8(batch.column(id_col).to_pylist())
        mask = pa.array([h < threshold for h in hx])
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(
    ds,
    key: str = "lang",
    fractions: dict[str, float] | None = None,
    default: float = 0.0,
    id_col: str = "doc_id",
):
    """Per-stratum deterministic sampling: each ``key`` value gets its own
    md5-threshold rate (e.g. keep 50% of 'en', 10% of everything else).
    Entirely map-side -- the fractions dict is a per-task constant, no
    shuffle, no broadcast needed -- and SQL-checkable via the same CASE'd
    threshold compare."""
    fractions = fractions or {}
    thresholds = {k: format(int(v * 0xFFFFFFFF), "08x") for k, v in fractions.items()}
    t_default = format(int(default * 0xFFFFFFFF), "08x")

    def fn(batch: pa.Table) -> pa.Table:
        hx = _md5_hex8(batch.column(id_col).to_pylist())
        keys = batch.column(key).to_pylist()
        mask = pa.array([h < thresholds.get(k, t_default) for h, k in zip(hx, keys)])
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def train_val_test_split(ds, id_col: str = "doc_id", val: float = 0.1, test: float = 0.1):
    """Deterministic dataset split column ('train'|'val'|'test') from the
    same md5 prefix: stable under resharding, repeatable, leakage-free
    (a document's split never depends on which worker saw it)."""
    t_val = format(int(val * 0xFFFFFFFF), "08x")
    t_test = format(int((val + test) * 0xFFFFFFFF), "08x")

    def fn(batch: pa.Table) -> pa.Table:
        hx = _md5_hex8(batch.column(id_col).to_pylist())
        split = ["val" if h < t_val else ("test" if h < t_test else "train") for h in hx]
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def quantize_embeddings(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q = floor(v/scale + 0.5)`` -- the standard 4x shrink for ANN index
    storage (dequantize as ``q * scale``). Map-side numpy over the stacked
    batch matrix; output is ``(id, q_embedding list<int8>, scale float64)``.
    floor(x+0.5) rather than round() on BOTH sides (numpy and the SQL
    replay) because banker's rounding differs between the two."""

    def fn(batch: pa.Table) -> pa.Table:
        V = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        maxabs = np.abs(V).max(axis=1)
        scale = np.where(maxabs > 0, maxabs / 127.0, 1.0)
        q = np.floor(V / scale[:, None] + 0.5).astype(np.int8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "q_embedding": pa.array(list(q), pa.list_(pa.int8())),
                "scale": pa.array(scale, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ----------------------------------------------------- corpus hygiene (r3)


def redact_pii_docs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """PII-scrubbed corpus: URLs, emails, phone numbers replaced with
    placeholder tokens (``functions.scrub.redact_pii``). Pure map-side --
    one vectorized regex replace per pattern, no shuffle -- and byte-exact
    SQL-replayable (pattern strings + replace order shared with the
    oracle)."""
    from ..functions import scrub

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: batch[id_col].values, "clean_text": scrub.redact_pii(batch[text_col]).values}
        )

    return ds.map_batches(fn, batch_format="pandas")


def contamination_flags(
    ds,
    eval_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_eval_shingles: int = 100_000,
):
    """Benchmark decontamination: for every corpus doc, count how many
    eval-set probes it contains.

    Each eval document contributes ONE probe: the first-``k``-token shingle
    of its whitespace-normalized lowercased text (docs with < k tokens
    contribute none). A corpus doc's ``n_hits`` is the number of DISTINCT
    probes appearing in its normalized text as a plain substring -- the
    standard n-gram-overlap contamination test (GPT-3 appendix C style) with
    the probe set deliberately small and explicit.

    Scale shape: the eval side is collected driver-side (BOUNDED by
    ``max_eval_shingles`` -- raises loudly past it; eval sets are small by
    definition) and broadcast via ``ray.put`` ONCE; the corpus side is a
    single map-side pass, one vectorized substring scan per probe. No
    shuffle anywhere."""
    import ray

    from ..functions import scrub

    def eval_probe(batch: pd.DataFrame) -> pd.DataFrame:
        norm = scrub.normalize_for_contamination(batch[text_col])
        sh = scrub.leading_shingle(norm, k=k)
        return pd.DataFrame({"shingle": sh.dropna().values})

    probe_tables = ray.get(
        eval_ds.map_batches(eval_probe, batch_format="pandas").to_arrow_refs()
    )
    shingles = sorted(set(_concat_column(probe_tables, "shingle").to_pylist()))
    if len(shingles) > max_eval_shingles:
        raise ValueError(
            f"eval probe set has {len(shingles)} shingles > cap {max_eval_shingles}; "
            "raise max_eval_shingles explicitly if the eval set is really this big"
        )
    handle = [ray.put(shingles)]

    class Contam:
        def __init__(self) -> None:
            self.shingles = ray.get(handle[0])

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            norm = scrub.normalize_for_contamination(batch[text_col])
            return pd.DataFrame(
                {
                    id_col: batch[id_col].values,
                    "n_hits": scrub.contamination_hits(norm, self.shingles).values,
                }
            )

    return ds.map_batches(Contam, batch_format="pandas", concurrency=(1, 8))


# ------------------------------------------------------ sequence packing


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 1024,
    ranges: int | None = None,
):
    """Assign each document to a training-sequence pack: streaming greedy
    packing in global ``id_col`` order, where a doc joins the pack its
    starting token offset falls in (``pack_id = cum_tokens_before //
    seq_len``). Deterministic, order-stable, and exactly SQL-replayable
    with one window function.

    This is the distributed PREFIX-SUM pattern (two passes, no global
    sort):

    1. slim projection ``(id, n_tokens)`` -- whitespace token counts, the
       ``textstats`` kernel;
    2. range-partition by ``id`` (boundaries = linspace over [min, max];
       fan-out derived from row count). Per-range token SUMS come back to
       the driver -- R tiny rows -- and an exclusive scan turns them into
       per-range starting offsets, broadcast back;
    3. ``groupby(range).map_groups``: each range sorts its own rows by id
       (bounded by the range size -- that is the documented partitioning
       assumption) and emits ``offset[range] + local running sum``.

    Ids denser than linspace assumes (heavy skew) only imbalance the ranges,
    never break correctness -- the in-range sort and the offsets are exact
    regardless."""
    from ..functions import textstats as ts
    from .relational import derive_buckets

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        n = ts.token_counts(batch[text_col])["n_ws_tokens"]
        return pd.DataFrame({id_col: batch[id_col].values, "n_tokens": n.values})

    s = ds.map_batches(slim, batch_format="pandas").materialize()  # slim: 2 ints/row

    from ray.data.aggregate import Max, Min

    stats = s.aggregate(Min(id_col), Max(id_col))
    lo, hi = stats[f"min({id_col})"], stats[f"max({id_col})"]
    n_ranges = ranges if ranges is not None else derive_buckets(s.count())
    width = max(1, (int(hi) - int(lo) + n_ranges) // n_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rng = ((ids - int(lo)) // width).astype(np.int32)
        return batch.append_column("__range", pa.array(rng, pa.int32()))

    tagged = s.map_batches(tag, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Sum

    range_sums = tagged.groupby("__range").aggregate(Sum("n_tokens")).to_pandas()
    range_sums = range_sums.sort_values("__range").reset_index(drop=True)
    cums = range_sums["sum(n_tokens)"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(range_sums["__range"].astype(int), cums.astype(int)))

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        start = offsets[int(g["__range"].iloc[0])]
        cum_before = start + g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame(
            {
                id_col: g[id_col].values,
                "n_tokens": g["n_tokens"].values,
                "pack_id": (cum_before // seq_len).astype(np.int64).values,
            }
        )

    return tagged.groupby("__range").map_groups(scan, batch_format="pandas")


def _prefix_take(s, budget: int, id_col: str, weight_col: str, ranges: int | None = None):
    """Greedy prefix under a weight budget in ascending ``id_col`` order:
    keep each row whose running ``weight_col`` sum (including the row
    itself) stays <= ``budget``. Weights are nonnegative, so the running
    sum is monotone and ``cum <= budget`` IS prefix-stop semantics — the
    SQL ``WHERE SUM(w) OVER (ORDER BY id) <= budget``.

    Distributed prefix-sum (the ``pack_sequences`` pattern): range-partition
    by id -> per-range sums -> driver exclusive scan -> per-range ordered
    cumsum filter. Only R tiny rows reach the driver; each range sorts only
    its own rows (the documented partitioning assumption)."""
    from ray.data.aggregate import Max, Min, Sum

    from .relational import derive_buckets

    n = s.count()
    if n == 0:
        return s
    stats = s.aggregate(Min(id_col), Max(id_col))
    lo, hi = int(stats[f"min({id_col})"]), int(stats[f"max({id_col})"])
    n_ranges = ranges if ranges is not None else derive_buckets(n)
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rng = ((ids - lo) // width).astype(np.int32)
        return batch.append_column("__range", pa.array(rng, pa.int32()))

    tagged = s.map_batches(tag, batch_format="pyarrow").materialize()
    range_sums = tagged.groupby("__range").aggregate(Sum(weight_col)).to_pandas()
    range_sums = range_sums.sort_values("__range").reset_index(drop=True)
    cums = range_sums[f"sum({weight_col})"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(range_sums["__range"].astype(int), cums.astype(int)))

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        cum = offsets[int(g["__range"].iloc[0])] + g[weight_col].cumsum()
        return g[cum <= budget].drop(columns="__range")

    return tagged.groupby("__range").map_groups(scan, batch_format="pandas")


def budget_select(
    ds,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bins: int = 4096,
):
    """Token-budget corpus selection: keep the BEST documents by quality
    score until a global token budget fills — the greedy prefix of
    ``(quality_ppm DESC, doc_id ASC)`` order whose running whitespace-token
    sum stays <= ``token_budget``. The LLM-data "data selection under a
    token budget" op (choose the highest-quality N-token subcorpus).

    No global sort. ``quality_ppm`` is an INTEGER in [0, 1e6], so the
    threshold quality level falls out of two bounded passes (the weighted
    variant of ``exact_quantile``'s histogram bisection over a finite
    integer domain):

    1. 4096-bin token-weighted histogram over quality_ppm (per-batch
       bincount partials -> tiny merge) -> the one bin where the
       descending cumulative token sum crosses the budget;
    2. exact per-value token sums INSIDE that bin (<= ceil(1e6/4096) = 245
       distinct values — bounded, safe for the single-block final) -> the
       exact threshold value t and the budget remainder R for its ties.

    Docs with quality_ppm > t are a pure map-side filter (nothing moves);
    the tie group at t is resolved exactly with the distributed prefix-sum
    (``_prefix_take``, doc_id order, budget R). Zero-token docs follow the
    same prefix semantics as the SQL window oracle: kept above/at the
    threshold crossing, dropped after it (the running sum is monotone).
    Only histogram vectors and per-range sums ever reach the driver.
    """
    DOM = 1_000_001  # quality_ppm domain size: integer ppm in [0, 1e6]

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        f = ts.quality_features(batch[text_col])
        return pd.DataFrame(
            {
                id_col: batch[id_col].values,
                "n_tokens": f["n_ws_tokens"].values,
                "quality_ppm": f["quality_ppm"].values,
            }
        )

    s = ds.map_batches(slim, batch_format="pandas").materialize()  # slim: 3 ints/row

    from .relational import tiny_final_groupby

    def hist1(batch: pa.Table) -> pa.Table:
        q = batch.column("quality_ppm").to_numpy(zero_copy_only=False)
        w = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        b = (q * bins // DOM).astype(np.int64)
        # float64 bincount sums are exact far past any per-batch token count
        tok = np.bincount(b, weights=w, minlength=bins).astype(np.int64)
        nz = np.flatnonzero(tok)
        return pa.table({"bin": pa.array(nz, pa.int64()), "tok": pa.array(tok[nz], pa.int64())})

    hist = (
        tiny_final_groupby(
            s.map_batches(hist1, batch_format="pyarrow"), ["bin"], [("tok", "sum")], ["bin", "tok"]
        )
        .to_pandas()
        .sort_values("bin", ascending=False)  # descending quality
    )
    if int(hist["tok"].sum()) <= token_budget:
        return s  # whole corpus fits the budget
    cum = hist["tok"].cumsum().to_numpy()
    idx = int(np.searchsorted(cum, token_budget, side="right"))  # first bin where cum > budget
    bstar = int(hist["bin"].iloc[idx])
    spent_above_bin = int(cum[idx - 1]) if idx > 0 else 0

    def hist2(batch: pa.Table, b_=bstar) -> pa.Table:
        q = batch.column("quality_ppm").to_numpy(zero_copy_only=False)
        w = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        m = (q * bins // DOM) == b_
        if not m.any():
            return pa.table({"q": pa.array([], pa.int64()), "tok": pa.array([], pa.int64())})
        qt = pa.table({"q": pa.array(q[m], pa.int64()), "tok": pa.array(w[m], pa.int64())})
        g = qt.group_by(["q"]).aggregate([("tok", "sum")])
        return g.select(["q", "tok_sum"]).rename_columns(["q", "tok"])

    vals = (
        tiny_final_groupby(
            s.map_batches(hist2, batch_format="pyarrow"), ["q"], [("tok", "sum")], ["q", "tok"]
        )
        .to_pandas()
        .sort_values("q", ascending=False)
    )
    vcum = spent_above_bin + vals["tok"].cumsum().to_numpy()
    vidx = int(np.searchsorted(vcum, token_budget, side="right"))  # value where cum > budget
    t = int(vals["q"].iloc[vidx])
    remainder = token_budget - (int(vcum[vidx - 1]) if vidx > 0 else spent_above_bin)

    def above(batch: pa.Table, t_=t) -> pa.Table:
        q = batch.column("quality_ppm").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(q > t_))

    def at(batch: pa.Table, t_=t) -> pa.Table:
        q = batch.column("quality_ppm").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(q == t_))

    high = s.map_batches(above, batch_format="pyarrow")
    tie_kept = _prefix_take(s.map_batches(at, batch_format="pyarrow"), remainder, id_col, "n_tokens")
    return high.union(tie_kept)


def mixture_sample(
    ds,
    shares: dict[str, int],
    target_docs: int,
    key: str = "source",
    id_col: str = "doc_id",
):
    """Data mixing to TARGET proportions: sample each source so the output
    approximates ``target_docs`` documents distributed per the ``shares``
    map (integer ppm, e.g. {'web': 500000, 'code': 300000, 'books':
    200000}). The standard LLM-pretraining "data mixture" op — unlike
    ``stratified_sample`` (fixed per-stratum rates), the keep-rates here
    are SELF-CALIBRATING: derived from the observed per-source counts so
    the realized mix tracks the target even as source sizes drift.

    Two passes, both cheap: (1) per-source counts — bounded key domain,
    per-batch Arrow partials through the tiny merge; (2) pure map-side
    deterministic filter ``md5_u64(str(id)) % 1e6 < rate_ppm[source]``
    with integer rates ``min(1e6, 1e6 * (target*share//1e6) // count)``
    (a source cannot over-sample past its population; unlisted sources get
    rate 0). No shuffle of data rows; reproducible across runs and cluster
    sizes; exactly SQL-replayable with a counts CTE and the same md5
    arithmetic."""
    from .relational import tiny_final_groupby

    def cnt(batch: pa.Table) -> pa.Table:
        g = batch.select([key]).group_by([key]).aggregate([(key, "count")])
        return g.select([key, f"{key}_count"]).rename_columns([key, "n"])

    counts = (
        tiny_final_groupby(
            ds.map_batches(cnt, batch_format="pyarrow"), [key], [("n", "sum")], [key, "n"]
        )
        .to_pandas()
        .set_index(key)["n"]
        .to_dict()
    )
    rates = {}
    for src, n in counts.items():
        want = target_docs * shares.get(src, 0) // 1_000_000
        rates[src] = min(1_000_000, 1_000_000 * want // int(n)) if n else 0

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ks = batch.column(key).to_pylist()
        mask = [
            dk.md5_u64(str(i).encode("utf-8")) % 1_000_000 < rates.get(k, 0)
            for i, k in zip(ids, ks)
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def cms_token_counts(
    ds,
    candidates: list[str] | None = None,
    k: int = 20,
    depth: int = 4,
    width: int = 8192,
    text_col: str = "text",
    merge_group: int = 64,
):
    """Approximate token frequencies from a Count-Min sketch — the
    UNBOUNDED-vocabulary complement to the exact ``top_tokens`` path.
    Exact heavy hitters shuffle one (token, count) partial per distinct
    token (billions of keys at corpus scale); the sketch is a constant
    depth x width x 8 B (256 KB) per batch no matter the vocabulary, merged
    by addition.

    Build: per-batch token ``value_counts`` -> per-batch CMS -> TREE merge
    (repartition into ~``merge_group``-sketch blocks, merge each block to
    one sketch, repeat — log_group(batches) bounded rounds, so no task ever
    holds more than ``merge_group`` sketches) -> driver point-queries.

    ``candidates``: tokens to estimate (deterministic, SQL-replayable —
    every counter and every min-over-rows estimate is md5 arithmetic).
    ``candidates=None`` mines per-batch partial top-4k heavy-hitter
    candidates instead (approximate discovery: a global heavy hitter is in
    some batch's local top list unless pathologically uniform — the
    standard CMS + candidate-set construction; pytest-held, not oracled,
    because batch boundaries are not SQL-expressible). Returns a pyarrow
    Table (token, n_cms) — estimates are always >= true counts."""
    from ..functions.sketches import CountMinSketch

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(ts._WS_TOKEN).explode().dropna()
        vc = toks.value_counts()
        cms = CountMinSketch(depth, width).add_counts(
            vc.index.astype(str).tolist(), vc.to_numpy(np.int64)
        )
        return pd.DataFrame({"sketch": [cms.to_bytes()]})

    def merge_block(batch: pd.DataFrame) -> pd.DataFrame:
        m = CountMinSketch.from_bytes(batch["sketch"].iloc[0])
        for b in batch["sketch"].iloc[1:]:
            m.merge(CountMinSketch.from_bytes(b))
        return pd.DataFrame({"sketch": [m.to_bytes()]})

    merged = ds.map_batches(partial, batch_format="pandas").materialize()
    while merged.count() > 1:
        # ceil division: floor would pack up to 2*merge_group-1 sketches
        # into one task (127//64 == 1), breaking the documented per-task
        # memory bound (review finding, round 3)
        blocks = (merged.count() + merge_group - 1) // merge_group
        merged = (
            merged.repartition(blocks)
            .map_batches(merge_block, batch_format="pandas", batch_size=None)
            .materialize()
        )
    cms = CountMinSketch.from_bytes(merged.take_all()[0]["sketch"])

    if candidates is None:
        # discovery mode: per-batch local top-(4k) candidate mining
        def mine(batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].fillna("").str.findall(ts._WS_TOKEN).explode().dropna()
            vc = toks.value_counts().head(4 * k)
            return pd.DataFrame({"token": vc.index.astype(str)})

        cand_rows = ds.map_batches(mine, batch_format="pandas").take_all()
        candidates = sorted({r["token"] for r in cand_rows})

    import pyarrow.compute as pc

    est = cms.estimate(list(candidates))
    out = pa.table(
        {"token": pa.array(list(candidates), pa.string()), "n_cms": pa.array(est, pa.int64())}
    )
    out = out.take(
        pc.sort_indices(out, sort_keys=[("n_cms", "descending"), ("token", "ascending")])
    )
    return out.slice(0, k) if len(candidates) > k else out


def epoch_shuffle(ds, epoch: int = 0, id_col: str = "doc_id", ranges: int | None = None):
    """Deterministic global shuffle for training epochs: every row gets a
    dense position 0..n-1 in ascending ``md5_u64('epoch{e}:' || id)`` order
    (ties by id). Each ``epoch`` value yields an independent permutation;
    the same (epoch, corpus) always yields the SAME permutation regardless
    of cluster size, block layout or retry history — the property
    ``Dataset.random_shuffle`` cannot give (its output depends on seed AND
    physical block structure), and the one a resumable multi-epoch
    training-data pipeline needs (re-running epoch 3 after a crash must
    reproduce epoch 3's order exactly).

    No global sort barrier: md5 keys are UNIFORM over [0, 2^64), so
    FIXED-WIDTH key ranges are balanced by construction (no histogram /
    boundary-sampling pass, unlike sorting arbitrary columns) -> per-range
    counts to the driver (R tiny rows) -> exclusive scan -> each range
    sorts only its own rows and emits ``offset + local index`` (the
    prefix-sum pattern). Returns (id, pos)."""
    from ray.data.aggregate import Count

    from .relational import derive_buckets

    prefix = f"epoch{epoch}:"

    def key_of(batch: pa.Table, n_ranges: int) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = np.array(
            [dk.md5_u64(f"{prefix}{i}".encode("utf-8")) for i in ids], dtype=np.uint64
        )
        width = (1 << 64) // n_ranges
        rng = np.minimum(keys // width, n_ranges - 1).astype(np.int32)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__key": pa.array(keys, pa.uint64()),
                "__range": pa.array(rng, pa.int32()),
            }
        )

    n_ranges = ranges if ranges is not None else derive_buckets(ds.count())
    keyed = ds.map_batches(
        lambda b, n=n_ranges: key_of(b, n), batch_format="pyarrow"
    ).materialize()
    counts = keyed.groupby("__range").aggregate(Count(alias_name="n")).to_pandas()
    counts = counts.sort_values("__range").reset_index(drop=True)
    cums = counts["n"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(counts["__range"].astype(int), cums.astype(int)))

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__key", id_col])
        start = offsets[int(g["__range"].iloc[0])]
        return pd.DataFrame(
            {
                id_col: g[id_col].values,
                "pos": start + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed.groupby("__range").map_groups(rank, batch_format="pandas")


def sample_n(ds, n: int, id_col: str = "doc_id"):
    """Deterministic EXACT-size sample: the ``min(n, count)`` rows with the
    smallest ``md5_u64('samplen:' || id)`` (ties broken by id). Rate-based
    sampling (``deterministic_sample``) yields a binomial-sized result;
    eval/calibration subsets usually need an exact row count that is stable
    across runs, cluster sizes and block layouts — this is that op, and it
    composes with appends (a grown corpus keeps a stable prefix bias-free:
    each row's key never changes, only the global cutoff moves).

    Per-batch partial top-n over the md5 key -> single tiny merge (at most
    n x blocks candidate rows, the grouped-top-k pattern) — never a global
    sort."""

    def keyed_topn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = np.array(
            [dk.md5_u64(f"samplen:{i}".encode("utf-8")) for i in ids], dtype=np.uint64
        )
        if len(keys) > n:
            take = np.argpartition(keys, n - 1)[:n]
            batch, keys = batch.take(pa.array(take)), keys[take]
        return batch.append_column("__key", pa.array(keys, pa.uint64()))

    def final_topn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            batch, sort_keys=[("__key", "ascending"), (id_col, "ascending")]
        )
        return batch.take(order.slice(0, n)).drop_columns(["__key"])

    return (
        ds.map_batches(keyed_topn, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topn, batch_format="pyarrow", batch_size=None)
    )


def line_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 8,
    *,
    broadcast_dups_bytes: int = 256 << 20,
    join_buckets: int | None = None,
):
    """C4-style corpus-level line dedup: a line occurring more than once in
    the WHOLE corpus is kept only at its globally first occurrence
    (smallest ``(doc_id, line_index)``); every other occurrence is removed
    from its document's text. Lines shorter than ``min_line_chars`` are
    exempt (kept verbatim — the C4 boilerplate rule targets repeated
    sentences/menus, not whitespace or bullets). Returns (id, text) with
    rewritten text for EVERY input doc — a doc whose every line was a
    non-first duplicate comes back with text ''.

    Scale shape (two passes over ``ds``; pass a re-readable source):

    1. line stats: explode lines inside ``map_batches`` -> (md5_u64(line),
       pack = doc_id * 2^32 + idx) — 16 B per line is ALL that shuffles,
       never text -> ``groupby(hash)``: count + min(pack) -> the dup table
       (hash, min_pack) holds only lines seen twice+.
    2. rewrite map-side: dup table under ``broadcast_dups_bytes`` is
       ``ray.put`` once and each actor keeps {hash: min_pack}; a line
       survives iff it is short, unseen in the dup table, or IS the global
       first occurrence. Past the cap: explode -> bucketed left join on
       the line hash -> filter -> per-doc reassembly (sort by idx,
       join '\\n') — full lines move once, same volume class as
       ``exact_dedup``'s row shuffle.

    A short line's content can never collide with a dup-table entry (the
    dup table only holds lines >= ``min_line_chars``, and equal content
    implies equal length), so eligibility needs no flag in the lookups.
    Packing assumes doc_id < 2^31 and < 2^32 lines/doc (asserted).
    Per-batch line hashing memoizes distinct lines (duplicate-heavy
    corpora hash each repeated line once per batch)."""
    import ray
    from ray.data.aggregate import Count, Min

    P = 1 << 32

    def _i64(h: int) -> int:
        # signed-int64 bit view of the md5 uint64: Ray's sort shuffle keys
        # stay a native Arrow int64 (uint64 keys fall back to a pickled
        # extension type on some block shapes); equality is preserved
        return h - (1 << 64) if h >= (1 << 63) else h

    def line_partials(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        memo: dict[str, int] = {}
        hs, packs = [], []
        for d, t in zip(ids, texts):
            assert 0 <= d < P // 2, "line_dedup packing assumes doc_id < 2^31"
            for j, ln in enumerate((t or "").split("\n")):
                if len(ln) >= min_line_chars:
                    hs.append(_i64(dk.md5_u64_hashed(ln, memo)))
                    packs.append(d * P + j)
        return pa.table({"h": pa.array(hs, pa.int64()), "pack": pa.array(packs, pa.int64())})

    def only_dups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column("n"), 1)).select(["h", "mp"])

    dups = (
        ds.map_batches(line_partials, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="n"), Min("pack", alias_name="mp"))
        .map_batches(only_dups, batch_format="pyarrow")
        .materialize()  # (hash, first-occurrence pack): 16 B per DUPLICATED line
    )

    if dups.size_bytes() <= broadcast_dups_bytes:
        tabs = ray.get(dups.to_arrow_refs())
        hs = _concat_column(tabs, "h").to_numpy(zero_copy_only=False)
        mps = _concat_column(tabs, "mp").to_numpy(zero_copy_only=False)
        handle = [ray.put((hs, mps))]

        class LineRewrite:
            def __init__(self) -> None:
                h, m = ray.get(handle[0])
                self.first = dict(zip(h.tolist(), m.tolist()))

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column(id_col).to_pylist()
                texts = batch.column(text_col).to_pylist()
                memo: dict[str, int] = {}
                out = []
                for d, t in zip(ids, texts):
                    kept = []
                    for j, ln in enumerate((t or "").split("\n")):
                        if len(ln) < min_line_chars:
                            kept.append(ln)
                            continue
                        mp = self.first.get(_i64(dk.md5_u64_hashed(ln, memo)))
                        if mp is None or mp == d * P + j:
                            kept.append(ln)
                    out.append("\n".join(kept))
                return pa.table(
                    {id_col: batch.column(id_col), text_col: pa.array(out, pa.string())}
                )

        return ds.map_batches(LineRewrite, batch_format="pyarrow", concurrency=(1, 8))

    # scale path: explode every line (plus one always-kept sentinel per doc
    # so fully-deduped docs still come back, as text='') -> bucketed left
    # join on the line hash -> keep first occurrences -> per-doc reassembly
    from .relational import bucketed_hash_join, derive_buckets

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        memo: dict[str, int] = {}
        od, oi, ol, oh, oreal = [], [], [], [], []
        for d, t in zip(ids, texts):
            assert 0 <= d < P // 2, "line_dedup packing assumes doc_id < 2^31"
            for j, ln in enumerate((t or "").split("\n")):
                od.append(d)
                oi.append(j)
                ol.append(ln)
                oh.append(
                    _i64(dk.md5_u64_hashed(ln, memo)) if len(ln) >= min_line_chars else 0
                )
                oreal.append(True)
            od.append(d)  # sentinel: sorts last, never joined, never rendered
            oi.append(P // 2)
            ol.append("")
            oh.append(0)
            oreal.append(False)
        return pa.table(
            {
                id_col: pa.array(od, pa.int64()),
                "i": pa.array(oi, pa.int64()),
                "line": pa.array(ol, pa.string()),
                "h": pa.array(oh, pa.int64()),
                "real": pa.array(oreal, pa.bool_()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    buckets = join_buckets if join_buckets is not None else derive_buckets(dups.count())
    dups2 = dups.map_batches(
        lambda b: b.rename_columns(["h2", "mp"]), batch_format="pyarrow"
    )
    joined = bucketed_hash_join(exploded, dups2, "h", "h2", buckets=buckets, how="left")

    def reassemble(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("i")
        real = g[g["real"]]
        # nullable Int64 (never float64): packs reach 2^63 and would lose
        # exactness through a NaN-bearing float column
        mp = real["mp"].astype("Int64")
        pack = real[id_col].astype("Int64") * P + real["i"].astype("Int64")
        keep = (mp.isna() | (mp == pack).fillna(False)).to_numpy(dtype=bool)
        # short lines carry h=0 which is never in the dup table (its lines
        # are all >= min_line_chars), so mp is NaN for them: kept
        return pd.DataFrame(
            {
                id_col: [int(g[id_col].iloc[0])],
                text_col: ["\n".join(real.loc[keep, "line"])],
            }
        )

    return joined.groupby(id_col).map_groups(reassemble, batch_format="pandas")


def _distinct_content_hashes(corpus_ds, text_col: str, out_col: str = "corpus_hash"):
    """Corpus side of the novelty filters: DISTINCT sha256 content hashes.
    Hash-only shuffle — 64 chars per distinct content, text never moves."""
    from ray.data.aggregate import Count

    def hash_only(batch: pa.Table) -> pa.Table:
        return pa.table({out_col: pa.array(dk.sha256_hex(batch.column(text_col).to_pylist()))})

    return (
        corpus_ds.map_batches(hash_only, batch_format="pyarrow")
        .groupby(out_col)
        .aggregate(Count(alias_name="__n"))
        .select_columns([out_col])
        .materialize()
    )


def _broadcast_bloom(corpus_hashes, m_bits: int, merge_group: int = 64):
    """Per-block partial Bloom filters over the distinct corpus hashes ->
    bitwise-OR tree merge (bounded ``merge_group`` sketches per task, the
    CMS merge shape) -> ONE ``ray.put`` broadcast. Returns the wrapped
    ObjectRef (list so map_batches kwargs don't auto-deref). Shared by
    ``novel_docs_bloom`` and ``bloom_fp_audit``."""
    import ray

    from ..functions.bloom import BloomFilter

    def partial_bloom(batch: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits).add_many(batch.column("corpus_hash").to_pylist())
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    def merge_blooms(batch: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter.from_bytes(batch["bloom"].iloc[0])
        for b in batch["bloom"].iloc[1:]:
            f.merge(BloomFilter.from_bytes(b))
        return pd.DataFrame({"bloom": [f.to_bytes()]})

    blooms = corpus_hashes.map_batches(partial_bloom, batch_format="pyarrow").materialize()
    while blooms.count() > 1:
        blooms = (
            # ceil division keeps the per-task bound at merge_group sketches
            blooms.repartition((blooms.count() + merge_group - 1) // merge_group)
            .map_batches(merge_blooms, batch_format="pandas", batch_size=None)
            .materialize()
        )
    return [ray.put(blooms.take_all()[0]["bloom"])]


def novel_docs_bloom(
    new_ds,
    corpus_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bits_per_key: int = 16,
    merge_group: int = 64,
    join_buckets: int | None = None,
):
    """EXACT novelty filter (same output as ``novel_docs``) whose broadcast
    is a Bloom filter instead of the raw hash set — ~35x smaller (16 bits
    vs ~70 B per distinct content), which moves the broadcast ceiling from
    ~3.5M to ~128M corpus keys per GB.

    Bloom misses are DEFINITELY novel and pass map-side with zero further
    work (the common case for a fresh crawl against a clean corpus). Bloom
    hits are duplicate-OR-false-positive candidates — a small set (true
    dups + ~0.05% FP at 16 bits/key) that re-verifies exactly via the
    bucketed left join against the real hash table. Correctness never
    depends on the FP rate; only the re-verification volume does.

    Build: per-block partial Bloom over the distinct corpus hashes (fixed
    m from the corpus count) -> bitwise-OR tree merge (bounded
    ``merge_group`` rounds, same shape as the CMS merge) -> one broadcast.
    Past ~1e9 distinct keys, shard the corpus by hash prefix and run this
    per shard (the bloom itself stays a single ray.put here)."""
    import ray

    from ..functions.bloom import BloomFilter
    from .relational import bucketed_hash_join, derive_buckets

    corpus_hashes = _distinct_content_hashes(corpus_ds, text_col)
    n_keys = corpus_hashes.count()
    m_bits = BloomFilter.for_keys(max(n_keys, 1), bits_per_key).m
    handle = _broadcast_bloom(corpus_hashes, m_bits, merge_group)

    def with_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__hash", pa.array(dk.sha256_hex(batch.column(text_col).to_pylist()))
        )

    class BloomSplit:
        def __init__(self) -> None:
            self.bloom = BloomFilter.from_bytes(ray.get(handle[0]))

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = with_hash(batch)
            hit = self.bloom.contains_many(batch.column("__hash").to_pylist())
            return batch.append_column("__hit", pa.array(hit, pa.bool_()))

    tagged = new_ds.map_batches(
        BloomSplit, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()  # split once, consume twice (definite + candidates)

    def keep_misses(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(batch.column("__hit"))).drop_columns(
            ["__hash", "__hit"]
        )

    def keep_hits(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("__hit")).drop_columns(["__hit"])

    definite = tagged.map_batches(keep_misses, batch_format="pyarrow")
    candidates = tagged.map_batches(keep_hits, batch_format="pyarrow")

    buckets = join_buckets if join_buckets is not None else derive_buckets(n_keys)
    joined = bucketed_hash_join(
        candidates, corpus_hashes, "__hash", "corpus_hash", buckets=buckets, how="left"
    )

    def keep_verified_novel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_null(batch.column("corpus_hash"))
        return batch.filter(mask).drop_columns(["corpus_hash", "__hash"])

    return definite.union(joined.map_batches(keep_verified_novel, batch_format="pyarrow"))


def chunk_documents(ds, chunk_tokens: int = 64, overlap: int = 16, id_col: str = "doc_id", text_col: str = "text"):
    """Sliding-window document chunking for embedding / retrieval indexing:
    each doc becomes ceil(n_tokens / stride) chunks of ``chunk_tokens``
    whitespace tokens starting every ``stride = chunk_tokens - overlap``
    tokens (the final chunk may be shorter; zero-token docs produce zero
    chunks). Chunk text is the space-join of its tokens — deterministic
    and identical to the SQL list_slice replay.

    Pure map-side fan-out (one batch in, ~n/stride rows out); no state, no
    shuffle — the embed/index stages downstream are where actor pools
    attach. chunk_id is per-doc dense, so (doc_id, chunk_id) is a stable
    global key for incremental re-embedding."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.findall(ts._WS_TOKEN)
        od, oc, ot, on = [], [], [], []
        for d, tk in zip(batch[id_col].values, toks.values):
            n = len(tk)
            for k in range(0, (n + stride - 1) // stride):
                s = k * stride
                e = min(s + chunk_tokens, n)
                od.append(d)
                oc.append(k)
                ot.append(" ".join(tk[s:e]))
                on.append(e - s)
        return pd.DataFrame(
            {
                id_col: np.array(od, dtype=np.int64),
                "chunk_id": np.array(oc, dtype=np.int64),
                text_col: ot,
                "n_tokens": np.array(on, dtype=np.int64),
            }
        )

    return ds.map_batches(explode, batch_format="pandas")


def novel_docs_minhash(
    new_ds,
    corpus_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    coarse_buckets: int | None = None,
):
    """FUZZY incremental-ingest dedup: keep the rows of ``new_ds`` that do
    not NEAR-duplicate any committed document (MinHash-LSH estimated
    Jaccard >= ``threshold``). ``novel_docs`` drops only byte-identical
    re-crawls; this drops the boilerplate-reflowed / trivially-edited
    re-crawls that survive exact hashing — the other half of a real
    ingest gate.

    Plan: encode the side into the id (sid = 2*id for corpus, 2*id+1 for
    new — similarity is text-only, so the encoding is free), union, and
    run the UNCHANGED ``minhash_lsh_pairs`` plan over the union. Cross-side
    pairs (odd+even sid) mark matched new docs; the matched-id set (at most
    |new|, usually the small dup fraction) broadcasts for a map-side
    anti-filter — swap in the bucketed anti-join (``ngram_dedup_keepers``
    shape) if a pathological corpus ever makes it large. New-vs-new
    near-dups are deliberately NOT dropped here: in-batch dedup is
    ``minhash_dup_clusters``'s job.

    Exactly SQL-replayable: the oracle reruns the full minhash replay over
    the side-encoded union (same permutation literals, banding, skew cap)
    and anti-joins the cross-side matches."""
    import pyarrow.compute as pc
    import ray

    def enc(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "__sid": pa.array(ids * 2 + side, pa.int64()),
                    text_col: batch.column(text_col),
                }
            )

        return fn

    uni = corpus_ds.map_batches(enc(0), batch_format="pyarrow").union(
        new_ds.map_batches(enc(1), batch_format="pyarrow")
    )
    pairs = minhash_lsh_pairs(
        uni,
        id_col="__sid",
        text_col=text_col,
        threshold=threshold,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        coarse_buckets=coarse_buckets,
    )

    def matched_new(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        cross = (a % 2) != (b % 2)
        sid = np.where(a % 2 == 1, a, b)[cross]
        return pa.table({"matched_id": pa.array(sid // 2, pa.int64())})

    matched = pairs.map_batches(matched_new, batch_format="pyarrow").materialize()
    ids = _concat_column(ray.get(matched.to_arrow_refs()), "matched_id")
    handle = [ray.put(ids)]

    class AntiFilter:
        def __init__(self) -> None:
            self.ids = ray.get(handle[0])

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch.column(id_col), value_set=self.ids))
            )

    return new_ds.map_batches(AntiFilter, batch_format="pyarrow", concurrency=(1, 8))


def sample_n_per_group(ds, n: int, group_col: str = "lang", id_col: str = "doc_id"):
    """Balanced exact-size sampling: the min(n, group size) rows with the
    smallest ``md5_u64('samplen:' || id)`` keys WITHIN each group — the
    'n eval docs per language/source' op, deterministic and append-stable
    like ``sample_n``. For BOUNDED group domains (langs, sources): the
    per-batch partial keeps at most n x groups candidate rows, and the
    single-block final merge holds n x groups x blocks rows — use a
    per-group ``sample_n`` loop for unbounded domains."""

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        keys = [
            dk.md5_u64(f"samplen:{i}".encode("utf-8")) for i in batch[id_col].tolist()
        ]
        out = batch.assign(__key=np.array(keys, dtype=np.uint64))
        return (
            out.sort_values(["__key", id_col]).groupby(group_col, sort=False).head(n)
        )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["__key", id_col])
            .groupby(group_col, sort=False)
            .head(n)
            .drop(columns="__key")
        )

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def zscore_by_group(ds, key: str = "lang", id_col: str = "doc_id", text_col: str = "text"):
    """Per-group z-score normalization of the quality signal — the feature
    scaling step before mixing quality scores ACROSS languages (a raw
    quality_ppm threshold keeps different fractions of different
    languages; normalizing per group makes one threshold comparable).

    Two passes over a slim projection: (1) per-group (n, sum, sum-of-
    squares) of the INTEGER ppm scores — exact at ANY scale: the per-batch
    sum-of-squares (≤ rows × 1e12, safe for any block size) is split into
    base-1e9 limbs (s2_hi, s2_lo) before the distributed merge, because a
    single int64 total would wrap past ~9.2e6 max-quality rows PER GROUP
    (trivially exceeded at corpus scale); the limbs are recombined as a
    Python arbitrary-precision int on the tiny bounded-keys driver table —
    broadcast as a per-task constant; (2) map-side
    ``z_ppm = floor((q - mean)/std * 1e6 + 0.5)`` in float64, the SAME
    IEEE ops the SQL oracle runs (mean/var from exact integer sums, so no
    float-summation-order divergence). Degenerate groups (std == 0) get
    z_ppm = 0."""
    import math

    from .relational import tiny_final_groupby

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        f = ts.quality_features(batch[text_col])
        q = f["quality_ppm"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: batch[id_col].values,
                key: batch[key].values,
                "q": q,
            }
        )

    s = ds.map_batches(slim, batch_format="pandas").materialize()

    _LIMB = 10**9

    def partial_stats(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key)["q"]
        s2 = g.apply(lambda v: int((v.to_numpy(np.int64) ** 2).sum()))
        agg = pd.DataFrame(
            {
                "n": g.size(),
                "sm": g.sum(),
                "s2_hi": s2 // _LIMB,
                "s2_lo": s2 % _LIMB,
            }
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    stats = (
        tiny_final_groupby(
            s.map_batches(partial_stats, batch_format="pyarrow"),
            [key],
            [("n", "sum"), ("sm", "sum"), ("s2_hi", "sum"), ("s2_lo", "sum")],
            [key, "n", "sm", "s2_hi", "s2_lo"],
        )
        .to_pandas()
        .set_index(key)
    )
    consts = {
        k: (int(r["n"]), int(r["sm"]), int(r["s2_hi"]) * _LIMB + int(r["s2_lo"]))
        for k, r in stats.iterrows()
    }

    def zmap(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_pylist()
        q = batch.column("q").to_numpy(zero_copy_only=False).astype(np.float64)
        z = np.zeros(len(ks), dtype=np.int64)
        for i, k in enumerate(ks):
            n, sm, s2 = consts[k]
            mean = sm / n
            var = s2 / n - mean * mean
            if var > 0:
                z[i] = math.floor((q[i] - mean) / math.sqrt(var) * 1e6 + 0.5)
        return pa.table(
            {
                id_col: batch.column(id_col),
                key: batch.column(key),
                "z_ppm": pa.array(z, pa.int64()),
            }
        )

    return s.map_batches(zmap, batch_format="pyarrow")


def funnel_counts(events_ds, steps: list[str], user_col: str = "user_id", ts_col: str = "ts", type_col: str = "event_type", buckets: int | None = None):
    """Event-funnel analysis: how many users complete step 1, then step 2
    STRICTLY AFTER their first step-1 event, then step 3 after that, ...
    (first-touch semantics: each stage anchors at the MIN qualifying
    timestamp). Returns one row per stage: (step, event_type, users).

    Scale shape (the sessionize pattern): events are pre-filtered to the
    funnel's types and hash-bucketed by user — each bucket computes every
    stage for its own users with VECTORIZED pandas merges (per-user min,
    join previous anchor, filter ts > anchor, min again; no per-user
    Python loop) — then per-bucket stage counts merge in one tiny
    aggregate. Only (user, ts, type) triples of matching events ever
    shuffle, once."""
    import pyarrow.compute as pc

    from .relational import derive_buckets, tiny_final_groupby

    nb = buckets if buckets is not None else derive_buckets(events_ds.count())

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(type_col), value_set=pa.array(steps))
        b = batch.filter(m).select([user_col, ts_col, type_col])
        u = b.column(user_col).to_numpy(zero_copy_only=False)
        return b.append_column("__b", pa.array((u % nb).astype(np.int32), pa.int32()))

    def bucket_stages(group: pd.DataFrame) -> pd.DataFrame:
        counts = []
        anchor = None  # per-user DataFrame (user, __t)
        for step in steps:
            ev = group[group[type_col] == step][[user_col, ts_col]]
            if anchor is not None:
                ev = ev.merge(anchor, on=user_col)
                ev = ev[ev[ts_col] > ev["__t"]][[user_col, ts_col]]
            anchor = (
                ev.groupby(user_col, sort=False)[ts_col].min().rename("__t").reset_index()
            )
            counts.append(len(anchor))
        return pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype=np.int64),
                "event_type": steps,
                "users": np.array(counts, dtype=np.int64),
            }
        )

    partials = (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_stages, batch_format="pandas")
    )
    return tiny_final_groupby(
        partials, ["step", "event_type"], [("users", "sum")], ["step", "event_type", "users"]
    )


def domain_counts(ds, text_col: str = "text", k: int = 20):
    """Provenance stats: extract http(s) URLs from document text
    (``scrub.URL_PATTERN`` — the exact pattern the PII redactor and its
    oracle share), reduce each to its lowercase hostname (scheme stripped,
    path and port cut), and count per domain. The crawl-curation step that
    decides per-domain keep/block lists.

    Unbounded key domain: per-batch (domain, n) partials shuffle (never
    text), distributed groupby sum, then global top-k via per-block
    partial top-k + one tiny merge (the ``top_tokens`` plan)."""
    import re as _re

    from ray.data.aggregate import Sum

    from ..functions import scrub

    rx = _re.compile(scrub.URL_PATTERN)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        urls = batch[text_col].fillna("").str.findall(rx).explode().dropna()
        if not len(urls):
            return pd.DataFrame(
                {"domain": pd.Series([], dtype=str), "n": pd.Series([], dtype=np.int64)}
            )
        host = (
            urls.str.replace(r"^https?://", "", regex=True)
            .str.split("/").str[0]
            .str.split(":").str[0]
            .str.lower()
        )
        vc = host.value_counts()
        return pd.DataFrame({"domain": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    from .relational import bucketed_grouped_sum

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "domain", "n"
    )

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "domain"], ascending=[False, True]).head(k)

    return (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
    )


def grouped_distinct_count(
    ds, key: str, val: str, out_col: str = "n_distinct", partitions: int | None = None
):
    """Exact COUNT(DISTINCT val) per group (the exact twin of the HLL
    approx path): per-batch (key, val) dedup first — the shuffle moves
    distinct PAIRS, never rows — then one more per-group dedup+count after
    the exchange. Bounded-key output merges through the tiny final."""
    from .relational import tiny_final_groupby

    def pair_dedup(batch: pa.Table) -> pa.Table:
        df = batch.select([key, val]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(pair_dedup, batch_format="pyarrow")

    # pair-dedup per batch is NOT globally distinct yet: bucket by VAL so
    # identical pairs always co-locate (and a hot key's distinct values
    # spread across buckets instead of melting one task), dedup per bucket,
    # then per-key bucket counts are disjoint and sum exactly
    from .relational import derive_buckets, hash_bucket_column

    if partitions is None:
        # sized from the input row count (upper bound on distinct pairs);
        # pass explicitly when ds is a computed upstream (count re-executes)
        partitions = derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, val, partitions)

    def bucket_count(group: pd.DataFrame) -> pd.DataFrame:
        df = group[[key, val]].drop_duplicates()
        return df.groupby(key, sort=False)[val].nunique().rename(out_col).reset_index()

    partials = (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_count, batch_format="pandas")
    )
    return tiny_final_groupby(partials, [key], [(out_col, "sum")], [key, out_col])


def latest_record_per_key(
    ds, key: str, ts_col: str, payload_cols: list[str], partitions: int | None = None
):
    """Per-key argmax record (e.g. each user's LATEST event): per-batch
    partial argmax — each batch forwards at most one row per key — then a
    key-bucketed exchange where the same argmax merges. Ties on the
    timestamp break to the largest payload tuple (deterministic, matching
    the SQL row_number ORDER BY ... DESC replay). The shuffle moves one
    slim row per (batch, key), never the corpus. ``partitions`` defaults
    to ``derive_buckets(ds.count())``; pass explicitly on computed
    upstreams (count re-executes the plan)."""
    from .relational import derive_buckets, hash_bucket_column

    if partitions is None:
        partitions = derive_buckets(ds.count())

    cols = [key, ts_col, *payload_cols]

    def argmax_frame(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values([key, ts_col, *payload_cols], ascending=False, kind="mergesort")
        return g.groupby(key, sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        return pa.Table.from_pandas(argmax_frame(df), preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key, partitions)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return argmax_frame(group[cols])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str]):
    """Long-to-wide pivot with a FIXED column vocabulary (``col_values`` —
    pivots with unbounded column sets are a schema smell at scale): counts
    per (row_key, col_value) shuffle once (pre-aggregated, key-domain-
    sized), then the single final block reshapes to one row per row_key
    with one int64 column per value (absent combinations are 0). Column
    names are ``n_{value}``, shared verbatim with the SQL conditional-
    aggregation oracle."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([row_key, col_key]).to_pandas()
        g = df.groupby([row_key, col_key], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [row_key, col_key], [("n", "sum")], [row_key, col_key, "n"],
    )

    def reshape(batch: pd.DataFrame) -> pd.DataFrame:
        wide = (
            batch.pivot_table(
                index=row_key, columns=col_key, values="n",
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=col_values, fill_value=0)
            .astype("int64")
        )
        wide.columns = [f"n_{c}" for c in wide.columns]
        return wide.reset_index()

    return fine.map_batches(reshape, batch_format="pandas", batch_size=None)


def rollup_counts(ds, keys: list[str], sentinel: str = "ALL"):
    """OLAP ROLLUP over bounded-domain keys: counts at every prefix level
    ((k1, k2), (k1), ()) in ONE pass — the finest-level counts shuffle once
    (pre-aggregated per batch, key-domain-sized), and every coarser level
    is a driver-free fold of the finest level inside the single final
    block (coarse counts are sums of fine counts; no second pass over
    data). Rolled-up columns carry ``sentinel``, matching the SQL
    ``COALESCE(col, 'ALL') ... GROUP BY ROLLUP`` replay."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        g = df.groupby(keys, sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys, [("n", "sum")], [*keys, "n"],
    )

    def add_levels(batch: pd.DataFrame) -> pd.DataFrame:
        levels = [batch]
        for i in range(len(keys) - 1, -1, -1):
            lvl = (
                batch.groupby(keys[:i], sort=False)["n"].sum().reset_index()
                if i
                else pd.DataFrame({"n": [batch["n"].sum()]})
            )
            for k in keys[i:]:
                lvl[k] = sentinel
            levels.append(lvl[[*keys, "n"]])
        out = pd.concat(levels, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    return fine.map_batches(add_levels, batch_format="pandas", batch_size=None)


def cube_counts(ds, keys: list[str], sentinel: str = "ALL"):
    """OLAP CUBE over bounded-domain keys: counts at EVERY subset of
    ``keys`` (2^k grouping sets) in ONE pass. Same plan as
    ``rollup_counts`` -- the finest level shuffles once (per-batch
    pre-aggregated, key-domain-sized) and every other grouping set is a
    fold of the finest level inside the single final block; a naive CUBE
    is 2^k scans or a 2^k-times-inflated exchange, this is neither.
    Grouped-away columns carry ``sentinel``, matching the
    ``COALESCE(col, 'ALL') ... GROUP BY CUBE`` SQL replay. Bounded keys
    only (the final block holds the product domain)."""
    from itertools import combinations

    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        g = df.groupby(keys, sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys, [("n", "sum")], [*keys, "n"],
    )

    def add_sets(batch: pd.DataFrame) -> pd.DataFrame:
        levels = [batch]
        for r in range(len(keys) - 1, -1, -1):
            for kept in combinations(keys, r):
                lvl = (
                    batch.groupby(list(kept), sort=False)["n"].sum().reset_index()
                    if kept
                    else pd.DataFrame({"n": [batch["n"].sum()]})
                )
                for k in keys:
                    if k not in kept:
                        lvl[k] = sentinel
                levels.append(lvl[[*keys, "n"]])
        out = pd.concat(levels, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    return fine.map_batches(add_sets, batch_format="pandas", batch_size=None)


def collocations(
    ds,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
    broadcast_unigram_bytes: int = 256 << 20,
):
    """Top-``k`` bigram collocations by PMI — the corpus-analytics step
    behind phrase mining / tokenizer-merge candidates. Scored as
    ``score_ppm = floor(1e6 * n_xy * N / (n_x * n_y))`` (same ordering as
    PMI for fixed N, log-free so the integer arithmetic is EXACT and the
    SQL oracle replays it with HUGEINT division, no float divergence).

    One shuffle for all three count families: per-batch partials emit
    unigrams (no space), bigrams (``"x y"``), and an ``""`` sentinel row
    carrying the token total N through the same ``groupby(term)`` — the
    tfidf discipline. The merged vocab-sized table is materialized once:
    unigram counts broadcast (Zipf-bounded, byte-capped with a loud error
    past ``broadcast_unigram_bytes`` — the at-scale alternative is a
    bucketed join of bigrams against unigrams on both x and y), bigram
    rows score map-side with Python arbitrary-precision ints
    (1e6 * n_xy * N overflows int64 at corpus scale; the min_count filter
    shrinks the scored set first), then global top-k via per-block partial
    top-k + one tiny merge."""
    import re as _re

    import ray
    from ray.data.aggregate import Sum

    word = _re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t] or [np.array([], object)]
        )
        frames = [pd.DataFrame({"term": [""], "n": [int(lens.sum())]})]
        if len(flat):
            uni = pd.Series(flat).value_counts()
            frames.append(
                pd.DataFrame({"term": uni.index.astype(str), "n": uni.to_numpy(np.int64)})
            )
        if len(flat) > 1:
            # bigram = consecutive tokens within one doc: mask out the
            # boundary positions (last token of each doc)
            ends = np.cumsum(lens[lens > 0]) - 1
            valid = np.ones(len(flat) - 1, dtype=bool)
            valid[ends[ends < len(flat) - 1]] = False
            if valid.any():
                x = pd.Series(flat[:-1][valid])
                y = pd.Series(flat[1:][valid])
                bg = (x + " " + y).value_counts()
                frames.append(
                    pd.DataFrame({"term": bg.index.astype(str), "n": bg.to_numpy(np.int64)})
                )
        return pd.concat(frames, ignore_index=True)

    from .relational import bucketed_grouped_sum

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "term", "n"
    ).materialize()

    def is_unigram(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pandas()
        return batch.filter(pa.array(~terms.str.contains(" ").to_numpy()))

    uni_ds = counts.map_batches(is_unigram, batch_format="pyarrow").materialize()
    if uni_ds.size_bytes() > broadcast_unigram_bytes:
        raise ValueError(
            f"unigram table is {uni_ds.size_bytes()} B > broadcast cap "
            f"{broadcast_unigram_bytes}; use a bucketed bigram-unigram join "
            "for vocabularies this large"
        )
    uni_df = uni_ds.to_pandas()
    n_total = int(uni_df.loc[uni_df["term"] == "", "n"].sum())
    n_x = dict(zip(uni_df["term"], uni_df["n"].astype(int)))
    handle = [ray.put(n_x)]

    class ScoreBigrams:
        def __init__(self) -> None:
            self.n_x = ray.get(handle[0])

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = batch["term"].str.contains(" ") & (batch["n"] >= min_count)
            b = batch[m]
            scores = []
            for term, nxy in zip(b["term"], b["n"]):
                xw, yw = term.split(" ")
                # Python ints: 1e6 * n_xy * N exceeds int64 at corpus scale
                scores.append(
                    (10**6 * int(nxy) * n_total) // (self.n_x[xw] * self.n_x[yw])
                )
            return pd.DataFrame(
                {
                    "bigram": b["term"].to_numpy(),
                    "n_xy": b["n"].to_numpy(np.int64),
                    "score_ppm": pd.Series(scores, dtype="int64").to_numpy(),
                }
            )

    scored = counts.map_batches(ScoreBigrams, concurrency=(1, 8), batch_format="pandas")

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["score_ppm", "bigram"], ascending=[False, True]
        ).head(k)

    return (
        scored.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
    )


def retention_cohorts(
    events_ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_secs: int = 604800,
    buckets: int | None = None,
):
    """Cohort retention matrix: users are cohorted by their FIRST active
    week (epoch // week_secs) and counted once per (cohort_week,
    week_offset) they were active in — the standard retention triangle.

    One shuffle total: slim (user, week) pairs (batch-deduped) hash-bucket
    by user, so each user's full history lands in exactly one group; the
    group computes cohorts and offsets vectorized (per-user min via
    groupby, merge, dedupe) and emits partial (cohort, offset, users)
    counts that sum in the tiny merge (the week x offset domain is
    calendar-bounded). Timestamps reduce to integer week indexes
    map-side — exact parity with the SQL epoch arithmetic."""
    from .relational import derive_buckets, tiny_final_groupby

    nb = buckets if buckets is not None else derive_buckets(events_ds.count())

    def prep(batch: pa.Table) -> pa.Table:
        df = batch.select([user_col, ts_col]).to_pandas()
        week = (df[ts_col].astype("datetime64[us]").astype(np.int64) // 10**6) // week_secs
        slim = pd.DataFrame({user_col: df[user_col].values, "week": week.values})
        slim = slim.drop_duplicates()
        slim["__b"] = (slim[user_col] % nb).astype(np.int32)
        return pa.Table.from_pandas(slim, preserve_index=False)

    def bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates([user_col, "week"])
        cohort = g.groupby(user_col, sort=False)["week"].min().rename("cohort")
        m = g.merge(cohort, left_on=user_col, right_index=True)
        m["week_offset"] = m["week"] - m["cohort"]
        out = (
            m.groupby(["cohort", "week_offset"], sort=False)
            .size()
            .rename("users")
            .reset_index()
            .rename(columns={"cohort": "cohort_week"})
        )
        out["users"] = out["users"].astype(np.int64)
        return out

    partials = (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    return tiny_final_groupby(
        partials,
        ["cohort_week", "week_offset"],
        [("users", "sum")],
        ["cohort_week", "week_offset", "users"],
    )


def sample_by_weight(ds, weight_ppm_col: str, id_col: str = "doc_id"):
    """Importance sampling with PER-ROW keep probabilities: keep a row iff
    ``md5_u64('samplew:' || id) % 1e6 < weight_ppm`` — e.g. sample
    proportionally to a quality score so curation keeps more of the good
    tail without a hard threshold. Deterministic (same corpus -> same
    sample at any cluster size), map-side only, and SQL-checkable with the
    same md5 roll; unlike ``deterministic_sample``/``stratified_sample``
    the rate comes from DATA, not config."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_ppm_col).to_numpy(zero_copy_only=False)
        rolls = np.array(
            [dk.md5_u64(f"samplew:{i}".encode("utf-8")) % 1_000_000 for i in ids],
            dtype=np.int64,
        )
        return batch.filter(pa.array(rolls < w))

    return ds.map_batches(fn, batch_format="pyarrow")


def value_histogram(ds, col: str, bins: int = 32):
    """Exact fixed-width value histogram: (bin, lo, hi, n) over the global
    [min, max] range — the distribution table behind data-quality
    dashboards and bin-width choices for the quantile/selection kernels.
    Two bounded passes: a (min, max, count) aggregate, then per-batch
    numpy bincount partials through the tiny merge (bin domain = ``bins``).
    Bin edges are float64 computed identically in the SQL replay; the top
    edge clips into the last bin (same clip both sides)."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import tiny_final_groupby

    stats = ds.aggregate(Min(col), Max(col), Count())
    lo, hi, n = float(stats[f"min({col})"]), float(stats[f"max({col})"]), int(stats["count()"])
    if n == 0:
        raise ValueError("value_histogram on empty dataset")
    width = (hi - lo) / bins if hi > lo else 1.0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {"bin": pa.array(nz, pa.int64()), "n": pa.array(counts[nz], pa.int64())}
        )

    hist = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["bin"], [("n", "sum")], ["bin", "n"]
    )

    def edges(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": batch.column("bin"),
                "lo_cents": pa.array(
                    np.floor((lo + b * width) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
                "hi_cents": pa.array(
                    np.floor((lo + (b + 1) * width) * 100 + 0.5).astype(np.int64), pa.int64()
                ),
                "n": batch.column("n"),
            }
        )

    return hist.map_batches(edges, batch_format="pyarrow")


# --------------------------------------------------------------- k-means


class _KMeansPartial:
    """Per-batch Lloyd step: assign each quantized vector to its nearest
    centroid (exact int64 squared distance, ties to the lowest centroid
    index -- numpy argmin's first hit == the oracle's ORDER BY d, cid) and
    emit <= k partial rows. Centroids arrive via a ray.put handle --
    ray.get is a zero-copy shared-memory read, so invoking this as a
    TASK-pool function (fresh instance per batch) costs microseconds,
    while the old per-round autoscaling ACTOR pool paid actor startup
    every Lloyd round (measured: 3 rounds 3.3 s -> 0.5 s at sf0.01)."""

    def __init__(self, centroids_handle, id_col: str, final: bool):
        import ray

        self.C = ray.get(centroids_handle[0])  # (k, D) int64
        self.c2 = (self.C * self.C).sum(axis=1)  # (k,)
        self.id_col = id_col
        self.final = final

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.C.shape[0]
        Q = np.stack(batch.column("q").to_pylist()).astype(np.int64)
        # exact integer decomposition of sum((q-c)^2): no float rounding
        d = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ self.C.T) + self.c2[None, :]
        lab = np.argmin(d, axis=1)
        counts = np.bincount(lab, minlength=k).astype(np.int64)
        nz = np.flatnonzero(counts)
        if self.final:
            ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sums = np.zeros(k, np.int64)
            np.add.at(sums, lab, ids)
            return pa.table(
                {
                    "cluster_id": pa.array(nz.astype(np.int64), pa.int64()),
                    "n_vecs": pa.array(counts[nz], pa.int64()),
                    "sum_vec_id": pa.array(sums[nz], pa.int64()),
                }
            )
        S = np.zeros_like(self.C)
        np.add.at(S, lab, Q)
        return pa.table(
            {
                "cluster": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
                "sums": pa.array(list(S[nz]), pa.list_(pa.int64())),
            }
        )


def kmeans_clusters(
    ds,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale: int = 1000,
):
    """Distributed Lloyd k-means over an embedding column with INTEGER
    arithmetic end-to-end, so every step is exactly SQL-replayable:

    - quantize ``q_d = floor(float64(v_d) * scale + 0.5)`` (int64
      milli-units; float32->float64 is exact, and the float64
      multiply/add/floor rounds identically in numpy and DuckDB -- verified
      bit-exact on the testdata),
    - init: the k vectors with the smallest ``md5_u64(str(id))`` keys,
      centroid index assigned in (key, id) order -- the md5-prefix
      pseudo-random seeding shared with the sampling family,
    - assign: ``argmin_c sum_d (q_d - c_d)^2`` in int64, ties to the lowest
      centroid index,
    - update: ``c'_d = floor(sum_d / count + 0.5)`` with the division in
      float64 (exact: |sum| << 2^53 on both sides); empty clusters keep
      their previous center.

    Plan shape: the quantized (id, q) projection is materialized ONCE and
    re-scanned per round (the standard iterative-ML trade; at corpus scale
    the projection is orders of magnitude smaller than its source). Each
    round is one map_batches pass emitting <= k partial rows per batch
    (count + per-dim sums); that k x n_blocks partial table is the only
    driver collect (bounded: k*(D+2) ints per block) -- the new k x D
    centroid matrix must reach the driver anyway to be re-broadcast via
    ray.put. No shuffle at all: k-means is map + tiny reduce per round.

    Returns (cluster_id, n_vecs, sum_vec_id) for non-empty final clusters,
    sorted by cluster_id -- an exact, float-free cluster fingerprint.

    Reference analogue: none (the reference has no ML ops); this is part of
    the mandated LLM-data-pipeline family (embedding-space clustering for
    corpus mixing / IVF index training).
    """
    import ray

    from .relational import tiny_final_groupby

    qds = _kmeans_quantize(ds, id_col, emb_col, scale).materialize()
    C = _kmeans_fit(qds, k=k, iters=iters, id_col=id_col)

    handle = [ray.put(C)]

    def final_step(batch: pa.Table) -> pa.Table:
        return _KMeansPartial(centroids_handle=handle, id_col=id_col, final=True)(batch)

    final_parts = qds.map_batches(final_step, batch_format="pyarrow", batch_size=4096)
    return tiny_final_groupby(
        final_parts,
        ["cluster_id"],
        [("n_vecs", "sum"), ("sum_vec_id", "sum")],
        ["cluster_id", "n_vecs", "sum_vec_id"],
    )


def kmeans_inertia(ds, k: int = 8, iters: int = 3, id_col: str = "vec_id",
                   emb_col: str = "embedding", scale: int = 1000):
    """Clustering quality audit: per final cluster, size and EXACT integer
    inertia (sum of squared quantized distances to the assigned centroid)
    -- the number an elbow plot or a cluster-health monitor reads. Shares
    ``_kmeans_fit`` (same seeding, same integer rounding, same (d, cid)
    argmin tie-break) so the SQL replay rides the existing assignment
    CTEs and just folds the winning distance.

    Plan shape: the quantized projection + fit as kmeans_clusters (map +
    tiny reduce per round, no shuffle); ONE extra assignment pass emitting
    <= k partial rows per batch; tiny bounded final. Integer end-to-end.

    Returns (cluster_id, n_vecs, inertia) for non-empty final clusters.
    """
    import ray

    from .relational import tiny_final_groupby

    qds = _kmeans_quantize(ds, id_col, emb_col, scale).materialize()
    C = _kmeans_fit(qds, k=k, iters=iters, id_col=id_col)
    handle = ray.put(C)

    def partial(batch: pa.Table) -> pa.Table:
        Cm = ray.get(handle)
        Q = np.stack(batch.column("q").to_pylist()).astype(np.int64)
        d = ((Q[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d, axis=1)  # first minimum == lowest cid tie-break
        dmin = d[np.arange(len(Q)), cid]
        u, inv = np.unique(cid, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, dmin)
        return pa.table(
            {
                "cluster_id": pa.array(u.astype(np.int64), pa.int64()),
                "n_vecs": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "inertia": pa.array(s, pa.int64()),
            }
        )

    parts = qds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return tiny_final_groupby(
        parts, ["cluster_id"], [("n_vecs", "sum"), ("inertia", "sum")],
        ["cluster_id", "n_vecs", "inertia"],
    )


def _kmeans_quantize(ds, id_col: str, emb_col: str, scale: int):
    """(id, q) integer-quantized projection of an embedding column — the
    float-free input every kmeans stage (and its SQL replay) agrees on."""

    def quant(batch: pa.Table) -> pa.Table:
        V = np.stack(batch.column(emb_col).to_pylist()).astype(np.float64)
        Q = np.floor(V * float(scale) + 0.5).astype(np.int64)
        return pa.table(
            {id_col: batch.column(id_col), "q": pa.array(list(Q), pa.list_(pa.int64()))}
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def _kmeans_fit(qds, k: int, iters: int, id_col: str) -> np.ndarray:
    """Lloyd iterations over a materialized (id, q) projection; returns the
    final (k, D) int64 centroid matrix. Factored out of kmeans_clusters so
    semdedup_keepers trains the identical clustering (same seeding, same
    integer rounding) that _kmeans_sql replays."""
    import ray

    from ..functions.dedup import md5_u64

    def init_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.array([md5_u64(str(int(i)).encode()) for i in ids], dtype=np.uint64)
        order = np.lexsort((ids, keys))[:k]
        qcol = batch.column("q").combine_chunks().take(pa.array(order))
        return pa.table(
            {
                "hkey": pa.array(keys[order], pa.uint64()),
                id_col: pa.array(ids[order], pa.int64()),
                "q": qcol,
            }
        )

    seed_rows = qds.map_batches(init_partial, batch_format="pyarrow").take_all()
    seed_rows.sort(key=lambda r: (int(r["hkey"]), int(r[id_col])))
    C = np.stack([np.asarray(r["q"], dtype=np.int64) for r in seed_rows[:k]])

    for _ in range(iters):
        handle = [ray.put(C)]

        def step(batch: pa.Table, _h=handle) -> pa.Table:
            return _KMeansPartial(centroids_handle=_h, id_col=id_col, final=False)(batch)

        parts = qds.map_batches(step, batch_format="pyarrow", batch_size=4096).take_all()
        counts = np.zeros(C.shape[0], np.int64)
        S = np.zeros_like(C)
        for r in parts:
            counts[int(r["cluster"])] += int(r["n"])
            S[int(r["cluster"])] += np.asarray(r["sums"], dtype=np.int64)
        nz = counts > 0
        C = C.copy()
        C[nz] = np.floor(S[nz].astype(np.float64) / counts[nz][:, None] + 0.5).astype(np.int64)

    return C


def semdedup_keepers(
    ds,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale: int = 1000,
    max_cluster: int = 20_000,
):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    remove semantic near-duplicates WITHIN each cluster -- the clustering
    turns the corpus-quadratic pair problem into k cluster-quadratic ones.
    Removal rule: a vector is dropped iff some SMALLER-id vector in its
    cluster has cosine >= threshold (dominance by any earlier near-dup,
    whether or not that one survives) -- deterministic at any partitioning
    and closed-form in SQL, no transitive closure needed.

    Scale shape: training reuses the integer-exact Lloyd fit (one small
    (id, q) projection, no shuffle); assignment is one stateless
    map_batches against the broadcast centroid matrix; the ONLY exchange
    groups by cluster_id, and the per-cluster kernel is one vectorized
    n^2 cosine matrix. At 100 TB, k is the knob: size k ~ N /
    target_cluster_size (SemDeDup uses 50k clusters for LAION) so each
    cluster's matrix fits a worker; ``max_cluster`` raises loudly instead
    of silently O(n^2)-ing a degenerate clustering.

    threshold defaults to 0.4 because the synthetic embeddings table is
    near-orthogonal (max pairwise cosine ~0.51): a production-style 0.95
    would never fire the removal path. Nearest pair-to-threshold margin at
    sf0.01 is 1.3e-4 -- 11 orders of magnitude above float64 divergence vs
    the DuckDB replay, so the boundary is compare-stable.

    Returns (vec_id, cluster_id) keeper rows.
    """
    import ray

    qds = _kmeans_quantize(ds, id_col, emb_col, scale).materialize()
    C = _kmeans_fit(qds, k=k, iters=iters, id_col=id_col)
    handle = [ray.put(C)]

    class Assign:
        def __init__(self):
            self.C = ray.get(handle[0])
            self.c2 = (self.C * self.C).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = np.stack(batch.column(emb_col).to_pylist()).astype(np.float64)
            Q = np.floor(V * float(scale) + 0.5).astype(np.int64)
            d = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ self.C.T) + self.c2[None, :]
            lab = np.argmin(d, axis=1).astype(np.int64)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "cluster_id": pa.array(lab, pa.int64()),
                    "vec": pa.array([v.tobytes() for v in V.astype(np.float32)], pa.binary()),
                }
            )

    def cluster_keepers(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n > max_cluster:
            raise ValueError(
                f"semdedup cluster of {n} rows exceeds max_cluster={max_cluster}; "
                "raise k so clusters fit a worker's n^2 budget"
            )
        ids = group[id_col].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = np.stack(
            [np.frombuffer(b, np.float32).astype(np.float64) for b in group["vec"].to_numpy()[order]]
        )
        unit = vecs / np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        sims = unit @ unit.T
        iu, ju = np.triu_indices(n, k=1)
        removed = np.zeros(n, dtype=bool)
        removed[np.unique(ju[sims[iu, ju] >= threshold])] = True
        return pd.DataFrame(
            {
                id_col: ids[~removed],
                "cluster_id": np.full(int((~removed).sum()), int(group["cluster_id"].iloc[0]),
                                      dtype=np.int64),
            }
        )

    return (
        ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)
        .groupby("cluster_id")
        .map_groups(cluster_keepers, batch_format="pandas")
    )


# --------------------------------------------------------------- pagerank


def derived_link_edges(ds, n_nodes: int, id_col: str = "doc_id"):
    """Deterministic citation graph, closed-form from the id column: node u
    emits ``deg(u) = 1 + md5_u64(f"{u}:deg") % 3`` links, link j targeting
    ``md5_u64(f"{u}:link:{j}") % n_nodes``; self-loops are dropped AFTER deg
    is fixed. Ids must be dense 0..N-1 (the modulus needs a dense target
    space). Shared by ``pagerank_top`` and ``triangle_count`` and replayed
    verbatim by their oracles' edge CTEs."""
    from ..functions.dedup import md5_u64

    def mkedges(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst, deg = [], [], []
        for u in ids:
            u = int(u)
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % n_nodes
                if t != u:
                    src.append(u)
                    dst.append(int(t))
                    deg.append(d)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    return ds.map_batches(mkedges, batch_format="pyarrow")


def bfs_levels(ds, source: int = 0, max_rounds: int = 8, id_col: str = "doc_id",
               broadcast_cap_bytes: int = 64 << 20):
    """Distributed BFS: minimum hop count from ``source`` to every node it
    reaches within ``max_rounds``, over the md5-derived citation graph
    shared with ``pagerank_top`` / ``triangle_count`` -- the reachability /
    influence-radius primitive.

    Per-round plan, chosen by FRONTIER size (the BFS-specific skew: the
    frontier starts at one node and only reaches edge scale in the
    exponential middle rounds):

    - frontier fits ``broadcast_cap_bytes`` (8 bytes/node): ship the sorted
      frontier ONCE with ray.put and probe it map-side over the
      materialized edge table -- the edge set (the 100 TB side) never
      re-shuffles, the round's only exchange is the level fold. The
      round-3 rewrite: the old always-join plan re-bucketed ALL edges
      EVERY round, 8 edge shuffles for 8 rounds (measured 24.4 s cold at
      sf0.01 for 248 reached nodes -- pure exchange constants).
    - otherwise: the bucketed hash join (both sides large, broadcast
      would cap out) -- unchanged semantics, automatic crossover.

    Candidates fold in with ONE groupby-MIN per round (idempotent, so
    re-discovered nodes keep their first level and no anti-join or
    visited-set broadcast is needed), expressed as the bucketed
    map_groups fold to skip the sort-aggregate barrier. Levels
    materialize per round (bounded recovery; same justification as
    pagerank_top). An already-exhausted frontier makes later rounds
    no-ops, so a fixed ``max_rounds`` unrolls verbatim into SQL CTEs.

    Returns (doc_id, level) for reached nodes, source included at 0.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .relational import bucketed_hash_join, derive_buckets, hash_bucket_column

    n_nodes = ds.count()
    edges = (
        derived_link_edges(ds, n_nodes, id_col=id_col)
        .select_columns(["src", "dst"])
        .materialize()
    )
    buckets = derive_buckets(edges.count(), rows_per_bucket=1_000_000)
    levels = rd.from_arrow(
        pa.table({"node": pa.array([int(source)], pa.int64()),
                  "level": pa.array([0], pa.int64())})
    ).materialize()

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("node", sort=False)["level"].min().reset_index()
        return pd.DataFrame(
            {
                "node": per["node"].to_numpy(np.int64),
                "level": per["level"].to_numpy(np.int64),
            }
        )

    for r in range(max_rounds):
        def is_frontier(batch: pa.Table, r_=r) -> pa.Table:
            return batch.filter(pc.equal(batch.column("level"), r_))

        # levels is materialized, so this filter-count is a memory scan
        frontier = levels.map_batches(is_frontier, batch_format="pyarrow")
        n_frontier = frontier.count()
        if n_frontier == 0:
            break

        def cand(batch: pa.Table, r_=r) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("dst").combine_chunks().cast(pa.int64()),
                    "level": pa.array(np.full(batch.num_rows, r_ + 1), pa.int64()),
                }
            )

        if n_frontier * 8 <= broadcast_cap_bytes:
            # bounded driver collect: <= cap bytes of int64 node ids
            fr = np.sort(
                np.fromiter(
                    (row["node"] for row in frontier.take_all()), np.int64, n_frontier
                )
            )
            handle = ray.put(fr)

            def probe(batch: pa.Table) -> pa.Table:
                f = ray.get(handle)
                src_ids = batch.column("src").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(f, src_ids)
                pos[pos == len(f)] = 0
                return batch.filter(pa.array(f[pos] == src_ids))

            candidates = edges.map_batches(probe, batch_format="pyarrow").map_batches(
                cand, batch_format="pyarrow"
            )
        else:
            def as_src(batch: pa.Table) -> pa.Table:
                # explicit rebuild, not select+rename Projects: the fused
                # Project pair mis-plans into a duplicate-column schema here
                return pa.table(
                    {"src": batch.column("node").combine_chunks().cast(pa.int64()),
                     "level": batch.column("level")}
                )

            joined = bucketed_hash_join(
                edges,
                frontier.map_batches(as_src, batch_format="pyarrow"),
                "src", "src", buckets=buckets,
            )
            candidates = joined.map_batches(cand, batch_format="pyarrow")

        def norm(batch: pa.Table) -> pa.Table:
            # normalize block type: join-path blocks arrive as pandas
            t = pa.table(
                {"node": batch.column("node").combine_chunks().cast(pa.int64()),
                 "level": batch.column("level").combine_chunks().cast(pa.int64())}
            )
            return hash_bucket_column(t, "node", buckets)

        levels = (
            levels.union(candidates)
            .map_batches(norm, batch_format="pyarrow")
            .repartition(buckets)
            .groupby("__bucket")
            .map_groups(fold_min, batch_format="pandas")
            .materialize()
        )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("node").combine_chunks().cast(pa.int64()),
                "level": batch.column("level").combine_chunks().cast(pa.int64()),
            }
        )

    return levels.map_batches(out, batch_format="pyarrow")


def pagerank_top(
    ds,
    iters: int = 4,
    damping_pct: int = 85,
    topn: int = 20,
    id_col: str = "doc_id",
    scale_total: int = 10**12,
):
    """Distributed PageRank over a deterministic citation graph derived
    closed-form from the id column, with INTEGER rank arithmetic so every
    round replays exactly in SQL (no float convergence fuzz):

    - graph: node u emits ``deg(u) = 1 + md5_u64(f"{u}:deg") % 3`` links,
      link j targeting ``md5_u64(f"{u}:link:{j}") % N``; self-loops are
      dropped AFTER deg is fixed, so self-loop mass evaporates (a documented,
      SQL-identical simplification of dangling-mass handling). Ids must be
      dense 0..N-1 (guaranteed by the corpus contract; the modulus needs a
      dense target space).
    - rank: ``r0 = SCALE // N``; each round
      ``r'(v) = BASE + (damping_pct * inc(v)) // 100`` with
      ``inc(v) = sum over edges (u,v) of r(u) // deg(u)`` and
      ``BASE = ((100 - damping_pct) * (SCALE // N)) // 100``. All values
      non-negative int64, so Python/numpy floor division == DuckDB ``//``.

    Plan shape: edges (~2N rows) are derived once and materialized; each
    round is ONE bucketed hash join (edges x ranks on src -- both sides
    large, so a broadcast is NOT valid at scale) followed by a grouped sum
    on the int64 dst. Nodes with no in-edges are covered by unioning a
    zero-contribution row per node into the grouped sum (value-identical
    to a left join back onto the node list, one fewer exchange per round).
    Ranks materialize per round: that truncates lineage (bounded recovery
    -- a lost worker replays one round, not the whole history) and keeps
    downstream schema probes O(1) instead of re-executing the prefix chain
    (the lazy-chained version measured 158 s for 4 rounds at sf0.1; this
    shape ~15-20 s). Nothing touches the driver but scalars. Top-n
    extraction
    is per-batch partial top-n -> single tiny merge (never a global sort).

    Returns the topn (doc_id, rank_scaled) rows, rank descending, id
    ascending on ties.
    """
    from ray.data.aggregate import Sum

    from .relational import bucketed_hash_join, derive_buckets

    n_nodes = ds.count()
    if n_nodes == 0:
        return ds.map_batches(
            lambda b: pa.table(
                {"doc_id": pa.array([], pa.int64()), "rank_scaled": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    r0 = scale_total // n_nodes
    base = ((100 - damping_pct) * r0) // 100

    edges = derived_link_edges(ds, n_nodes, id_col=id_col).materialize()
    buckets = derive_buckets(edges.count(), rows_per_bucket=1_000_000)

    def init_ranks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        return pa.table({"node": ids, "rank": pa.array([r0] * len(ids), pa.int64())})

    nodes = ds.map_batches(init_ranks, batch_format="pyarrow").materialize()
    ranks = nodes

    def share(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"dst": batch.column("dst"), "c": pa.array(r // d, pa.int64())}
        )

    def zero_contrib(batch: pa.Table) -> pa.Table:
        # one (dst=node, c=0) row per node: guarantees every node appears
        # in the grouped sum (BASE fill for in-degree-0 nodes) without a
        # second join per round
        return pa.table(
            {
                "dst": batch.column("node"),
                "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            }
        )

    zeros = nodes.map_batches(zero_contrib, batch_format="pyarrow").materialize()

    def apply(batch: pa.Table) -> pa.Table:
        node = batch.column("dst").combine_chunks().cast(pa.int64())
        iv = batch.column("inc").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": node, "rank": pa.array(base + (damping_pct * iv) // 100, pa.int64())}
        )

    for _ in range(iters):
        joined = bucketed_hash_join(
            edges, ranks.rename_columns(["src", "rank"]), "src", "src", buckets=buckets
        )
        ranks = (
            joined.map_batches(share, batch_format="pyarrow")
            .union(zeros)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="inc"))
            .map_batches(apply, batch_format="pyarrow")
            .materialize()
        )

    def _top(batch: pa.Table, node_col: str, rank_col: str) -> pa.Table:
        r = batch.column(rank_col).to_numpy(zero_copy_only=False)
        node = batch.column(node_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((node, -r))[:topn]
        return pa.table(
            {
                "doc_id": pa.array(node[order], pa.int64()),
                "rank_scaled": pa.array(r[order], pa.int64()),
            }
        )

    partials = ranks.map_batches(
        lambda b: _top(b, "node", "rank"), batch_format="pyarrow"
    )
    return partials.repartition(1).map_batches(
        lambda b: _top(b, "doc_id", "rank_scaled"), batch_format="pyarrow", batch_size=None
    )


# ------------------------------------------------------- hybrid retrieval


def hybrid_topk(
    docs_ds,
    emb_ds,
    text_queries: list[str],
    query_vectors: np.ndarray,
    k: int = 10,
    rrf_k: int = 60,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
):
    """Hybrid dense+sparse retrieval with reciprocal-rank fusion: BM25 over
    the text corpus and brute-force cosine over the embedding table, fused
    per query as ``rrf = sum_systems 1_000_000 // (rrf_k + rank)`` (1-based
    rank within each system, integer division -- so the fusion is exactly
    SQL-replayable; only each system's internal ORDERING feeds the score,
    never its float values). ``text_queries[i]`` and ``query_vectors[i]``
    are the sparse/dense views of the same logical query i; doc and vec ids
    share one id space (the corpus contract).

    Scale shape: both retrievers are single-pass broadcast-query pipelines
    (see ``bm25_topk`` / ``ann_topk``); their outputs are inherently tiny
    (n_queries x k rows each), so the fusion stages -- per-query rank
    assignment, union, grouped sum, per-query top-k -- shuffle only those
    candidate rows. Returns (query_id, doc_id, rrf_score), score desc,
    doc_id asc per query.
    """
    if len(text_queries) != len(query_vectors):
        raise ValueError("text_queries and query_vectors must align by index")

    sparse = bm25_topk(docs_ds, text_queries, k=k, id_col=doc_id_col, text_col=text_col)
    dense = ann_topk(emb_ds, query_vectors, k=k, id_col=vec_id_col)

    # normalize both candidate lists to (query_id, doc_id, sort key desc)
    def sparse_norm(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": batch["query_id"].astype("int64"),
                "doc_id": batch[doc_id_col].astype("int64"),
                "key": batch["score_ppm"].astype("float64"),
                "system": np.zeros(len(batch), dtype="int8"),
            }
        )

    def dense_norm(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": batch["query_id"].astype("int64"),
                "doc_id": batch[vec_id_col].astype("int64"),
                "key": batch["sim"].astype("float64"),
                "system": np.ones(len(batch), dtype="int8"),
            }
        )

    candidates = sparse.map_batches(sparse_norm, batch_format="pandas").union(
        dense.map_batches(dense_norm, batch_format="pandas")
    )

    # each system already emits <= n_queries x k rows TOTAL, so ranking +
    # fusion + final top-k runs in ONE single-block stage (the bounded
    # tiny-final pattern) instead of three sort-shuffle barriers on rows
    # that would fit in a page
    def fuse(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(
            ["system", "query_id", "key", "doc_id"],
            ascending=[True, True, False, True],
        )
        rank = batch.groupby(["system", "query_id"], sort=False).cumcount() + 1
        batch["pts"] = (1_000_000 // (rrf_k + rank)).astype("int64")
        summed = (
            batch.groupby(["query_id", "doc_id"], as_index=False, sort=False)["pts"]
            .sum()
            .rename(columns={"pts": "rrf_score"})
        )
        summed = summed.sort_values(
            ["query_id", "rrf_score", "doc_id"], ascending=[True, False, True]
        )
        out = summed.groupby("query_id", sort=False).head(k)
        return pd.DataFrame(
            {
                "query_id": out["query_id"].astype("int64"),
                "doc_id": out["doc_id"].astype("int64"),
                "rrf_score": out["rrf_score"].astype("int64"),
            }
        )

    return candidates.repartition(1).map_batches(
        fuse, batch_format="pandas", batch_size=None
    )


# ------------------------------------------------------ time-decay scoring


def decayed_user_value(ds, halflife_days: int = 7, user_col: str = "user_id"):
    """Recency-weighted per-user value: each event's integer cents are
    halved once per elapsed ``halflife_days`` (relative to the newest event
    in the table) via an arithmetic right shift, then summed per user --
    the freshness weighting a crawl/source scorer applies before mixing.
    Bit-shift halving keeps the whole computation in int64 (numpy ``>>`` ==
    DuckDB ``>>``; shift capped at 62), so the oracle replays it exactly --
    no float pow/exp drift.

    Plan: one tiny aggregate for the global max timestamp (a scalar to the
    driver), then a single map pass computing per-batch partial per-user
    sums, finished with a grouped sum on the bounded user domain. Age is
    whole days: ``(max_us - ts_us) // 86_400_000_000``.
    """
    from ray.data.aggregate import Max, Sum

    mx = ds.aggregate(Max("ts"))["max(ts)"]
    m_us = int(pd.Timestamp(mx).value // 1000)  # ns -> us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        age_days = (m_us - ts.view(np.int64)) // 86_400_000_000
        shift = np.minimum(age_days // halflife_days, 62)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        decayed = cents >> shift
        t = pa.table(
            {
                user_col: batch.column(user_col),
                "decayed_cents": pa.array(decayed, pa.int64()),
                "n_events": pa.array(np.ones(len(decayed), np.int64), pa.int64()),
            }
        )
        out = t.group_by([user_col]).aggregate(
            [("decayed_cents", "sum"), ("n_events", "sum")]
        )
        # arrow emits '<col>_<fn>' names with the keys last; restore order
        out = out.select([user_col, "decayed_cents_sum", "n_events_sum"])
        return out.rename_columns([user_col, "decayed_cents", "n_events"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(user_col).aggregate(
        Sum("decayed_cents", alias_name="decayed_cents"),
        Sum("n_events", alias_name="n_events"),
    )


def triangle_count(ds, id_col: str = "doc_id"):
    """Exact triangle count of the (undirected view of the) derived link
    graph -- the classic wedge-check formulation: canonicalize edges to
    ``a < b`` and dedup, build wedges by self-joining on the shared LOW
    vertex, then probe each wedge's closing pair against the edge set.
    Every triangle {a < b1 < b2} is counted exactly once, at its smallest
    vertex.

    Plan: two bucketed hash joins (edges x edges on ``a``, then wedges x
    edges on the packed closing key) and a count -- no driver-side data,
    only the final scalar. The closing key packs (b1, b2) as
    ``b1 * n_nodes + b2``, exact while n_nodes^2 < 2^63 (raises above;
    a 3e9-node graph needs a 128-bit or two-column exchange key instead).

    Returns a 1-row table (n_triangles int64).
    """
    from .relational import bucketed_hash_join, derive_buckets

    n_nodes = ds.count()
    if n_nodes == 0 or n_nodes * n_nodes >= 2**63:
        if n_nodes:
            raise ValueError("packed closing key would overflow int64")
        import ray.data as rd

        return rd.from_arrow(pa.table({"n_triangles": pa.array([0], pa.int64())}))

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    from ray.data.aggregate import Count

    und = (
        derived_link_edges(ds, n_nodes, id_col=id_col)
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    buckets = derive_buckets(und.count(), rows_per_bucket=1_000_000)

    def key_ab(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(a * n_nodes + b, pa.int64())})

    wedges = bucketed_hash_join(
        und.rename_columns(["a", "b1"]),
        und.rename_columns(["a", "b2"]),
        "a",
        "a",
        buckets=buckets,
    ).filter(expr="b1 < b2")

    def wedge_key(batch: pa.Table) -> pa.Table:
        b1 = batch.column("b1").to_numpy(zero_copy_only=False)
        b2 = batch.column("b2").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(b1 * n_nodes + b2, pa.int64())})

    closed = bucketed_hash_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        und.map_batches(key_ab, batch_format="pyarrow").rename_columns(["k2"]),
        "k",
        "k2",
        buckets=buckets,
    )
    n = closed.count()
    import ray.data as rd

    return rd.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))


# ----------------------------------------------------- skyline / mode / fk


def skyline_orders(ds, price_col: str = "o_totalprice", date_col: str = "o_orderdate",
                   id_col: str = "o_orderkey"):
    """Pareto frontier (skyline) of orders on (price higher-better, date
    later-better): a row survives iff no other row is >= on both axes and
    > on at least one. Exploits the skyline merge property -- the skyline
    of a union equals the skyline of the union of per-part skylines -- so
    each batch reduces to its local frontier (typically a handful of rows)
    and ONE tiny single-block pass finishes the merge: no shuffle of the
    input, no quadratic work at scale.

    Ties kept: two rows with identical (price, date) don't dominate each
    other (strict-on-one-axis rule), matching the SQL NOT EXISTS replay.
    Money as integer cents, dates as epoch days -- exact compare both
    sides. Returns (id, price_cents, date_day) sorted by id.
    """

    def to_ints(batch: pa.Table) -> pa.Table:
        price = np.floor(
            batch.column(price_col).to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        # timestamp[us] -> epoch days (floor); TPC-H-style dates are post-1970
        # so numpy's truncation IS floor division, matching the SQL replay's
        # floor(epoch(ts)) // 86400
        d = batch.column(date_col).to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "price_cents": pa.array(price, pa.int64()),
                "date_day": pa.array(d.view(np.int64), pa.int64()),
            }
        )

    def local_skyline(batch: pa.Table) -> pa.Table:
        p = batch.column("price_cents").to_numpy(zero_copy_only=False)
        t = batch.column("date_day").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(p) == 0:
            return batch
        # Row i survives iff (a) no strictly-greater price has date >= t[i]:
        # t[i] > M(p[i]) where M is the running max date over higher prices,
        # and (b) no equal price has a strictly later date: t[i] == the max
        # date within its own price group. Both-axis ties survive by (a)+(b).
        order = np.argsort(-p, kind="stable")
        ps, ts = p[order], t[order]
        run_break = np.r_[True, ps[1:] != ps[:-1]]
        starts = np.flatnonzero(run_break)          # one run per distinct price
        run_id = np.cumsum(run_break) - 1
        gmax = np.maximum.reduceat(ts, starts)      # max date per price group
        m = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(gmax)[:-1]]
        keep_sorted = (ts == gmax[run_id]) & (ts > m[run_id])
        keep = np.zeros(len(p), dtype=bool)
        keep[order] = keep_sorted
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "price_cents": pa.array(p[keep], pa.int64()),
                "date_day": pa.array(t[keep], pa.int64()),
            }
        )

    partials = ds.map_batches(to_ints, batch_format="pyarrow").map_batches(
        local_skyline, batch_format="pyarrow"
    )
    final = partials.repartition(1).map_batches(
        local_skyline, batch_format="pyarrow", batch_size=None
    )
    return final.sort(id_col)


# ------------------------------------------------------- market basket


def basket_lift_topk(ds_factory, order_col: str = "l_orderkey",
                     item_col: str = "l_partkey", min_support: int = 20,
                     topk: int = 20, buckets: int = 64):
    """Market-basket LIFT for the top-k co-occurring pairs:
    ``lift = P(a,b) / (P(a) * P(b))`` in ppm -- above 1e6 means the pair
    is genuinely associated, not just two individually popular items (raw
    pair counts, what ``basket_pairs_topk`` ranks, conflate the two).
    ``lift_ppm = (n_ab * n_baskets * 10^6) // (n_a * n_b)`` -- integer
    arithmetic end-to-end, replayed verbatim in SQL.

    Scale shape: the pair stage IS basket_pairs_topk (A-Priori pruned,
    one order-domain + one pair-domain exchange). Supports AND the exact
    distinct-basket count then come from ONE fused pass: the <= 2k items
    appearing in the top pairs are broadcast once and probed map-side,
    distinct (item, order) rows collapse per batch, per-batch-distinct
    orders ride along as sentinel (-1, order) rows, and ONE mixed-domain
    exchange (item rows bucketed by item hash, sentinel rows by order
    hash) counts both. The final join + arithmetic runs on k driver rows
    (bounded, documented collect). ``ds_factory`` is called per pass (the
    reads are cheap narrow scans; a computed pipeline would re-execute).

    Returns (part_a, part_b, n_orders, lift_ppm) ordered like the pair
    ranking (n_orders desc, part_a, part_b).
    """
    import ray

    pairs = basket_pairs_topk(
        ds_factory(), order_col, item_col, min_support, topk, buckets
    ).to_pandas()
    if pairs.empty:
        pairs["lift_ppm"] = pd.Series([], dtype=np.int64)
        return pairs

    items = np.sort(pd.concat([pairs["part_a"], pairs["part_b"]])
                    .unique().astype(np.int64))
    items_ref = ray.put(items)

    def probe(batch: pa.Table) -> pa.Table:
        # ONE fused partial pass emitting two row kinds telled apart by a
        # sentinel item of -1 (partkeys are positive):
        #   (item, order)  -- distinct-per-batch rows for the <= 2k probed
        #                     items, bucketed by ITEM hash downstream;
        #   (-1,   order)  -- distinct-per-batch orders for the exact
        #                     n_baskets count, bucketed by ORDER hash so the
        #                     sentinel rows spread instead of piling into
        #                     one skewed group.
        # Fusing saves a whole read + all-to-all barrier vs the previous
        # separate groupby("o").count() pass (measured 6.6 s -> see below).
        arr = ray.get(items_ref)
        i = batch.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = batch.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_o = np.unique(o)
        pos = np.clip(np.searchsorted(arr, i), 0, len(arr) - 1)
        hit = arr[pos] == i
        i, o = i[hit], o[hit]
        # per-batch distinct (item, order) collapse
        order = np.lexsort((o, i))
        i, o = i[order], o[order]
        keep = np.r_[True, (i[1:] != i[:-1]) | (o[1:] != o[:-1])]
        i, o = i[keep], o[keep]
        i = np.concatenate([i, np.full(len(uniq_o), -1, np.int64)])
        o = np.concatenate([o, uniq_o])
        return pa.table({item_col: pa.array(i, pa.int64()),
                         order_col: pa.array(o, pa.int64())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        # sentinel rows co-locate by order value, item rows by item value
        i = batch.column(item_col).to_numpy(zero_copy_only=False)
        o = batch.column(order_col).to_numpy(zero_copy_only=False)
        key = np.where(i < 0, o, i).astype(np.int64)
        b = pd.util.hash_array(key) % buckets
        return batch.append_column(
            "__bucket", pa.array(b.astype(np.int32), pa.int32()))

    def support(group: pd.DataFrame) -> pd.DataFrame:
        i = group[item_col].to_numpy(np.int64)
        o = group[order_col].to_numpy(np.int64)
        sent = i < 0
        n_orders_here = np.int64(len(np.unique(o[sent])))
        i, o = i[~sent], o[~sent]
        if len(i) == 0:
            return pd.DataFrame({item_col: np.array([-1], np.int64),
                                 "n": np.array([n_orders_here], np.int64)})
        order = np.lexsort((o, i))
        i, o = i[order], o[order]
        keep = np.r_[True, (i[1:] != i[:-1]) | (o[1:] != o[:-1])]
        i = i[keep]
        first = np.r_[True, i[1:] != i[:-1]]
        idx = np.flatnonzero(first)
        out_i = np.concatenate([i[first], [-1]])
        out_n = np.concatenate(
            [np.diff(np.r_[idx, len(i)]).astype(np.int64), [n_orders_here]])
        return pd.DataFrame({item_col: out_i, "n": out_n})

    folded = (
        ds_factory().map_batches(probe, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(support, batch_format="pandas")
        .to_pandas()
    )
    n_baskets = int(folded.loc[folded[item_col] < 0, "n"].sum())
    sup = folded[folded[item_col] >= 0].set_index(item_col)["n"]

    na = sup.loc[pairs["part_a"].to_numpy()].to_numpy(np.int64)
    nb = sup.loc[pairs["part_b"].to_numpy()].to_numpy(np.int64)
    pairs["lift_ppm"] = (
        pairs["n_orders"].to_numpy(np.int64) * n_baskets * 1_000_000
    ) // (na * nb)
    return pairs


def basket_pairs_topk(
    ds,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 20,
    topk: int = 20,
    buckets: int = 64,
    max_basket: int = 4096,
):
    """Top-k co-occurring item pairs (market-basket affinity) with A-Priori
    item pruning: only items whose ROW frequency >= ``min_support`` enter
    the pair stage (a pair can never be frequent if either member isn't --
    Agrawal & Srikant '94), which is what keeps the pair fan-out bounded at
    scale. Pair count = number of distinct orders containing both items.

    Scale shape: (1) item counts are a partial-agg + one key-domain
    exchange; the surviving frequent set is ray.put ONCE (its size is the
    min_support knob's job -- the classic A-Priori memory assumption) and
    probed map-side. (2) baskets co-locate with ONE order-domain exchange;
    pair generation is vectorized across all baskets of equal size (one
    triu gather per (size class), no per-order Python loop). (3) pair
    counts merge in ONE pair-domain exchange whose per-bucket top-k means
    only k x buckets candidate rows reach the single final-merge task.
    ``max_basket`` caps pathological baskets (m^2 pairs) loudly.

    Returns (part_a, part_b, n_orders), the top-k by (n_orders desc,
    part_a, part_b) -- fully ordered, deterministic at any partitioning.
    """
    import ray

    from .relational import hash_bucket_column

    # ---- pass 1: frequent items (A-Priori prune)
    def item_partial(batch: pa.Table) -> pa.Table:
        df = batch.select([item_col]).to_pandas()
        c = df.groupby(item_col, sort=False).size().rename("n").reset_index()
        return pa.table(
            {
                item_col: pa.array(c[item_col].to_numpy(np.int64), pa.int64()),
                "n": pa.array(c["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    def add_item_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, item_col, buckets)

    def merge_items(group: pd.DataFrame) -> pd.DataFrame:
        tot = group.groupby(item_col, sort=False)["n"].sum()
        keep = tot[tot >= min_support]
        return pd.DataFrame({item_col: keep.index.to_numpy(np.int64)})

    freq = (
        ds.map_batches(item_partial, batch_format="pyarrow")
        .map_batches(add_item_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_items, batch_format="pandas")
        .to_pandas()[item_col]
        .to_numpy(np.int64)
    )
    handle = ray.put(np.sort(freq))

    # ---- pass 2: baskets -> pairs -> counts -> top-k
    class FilterFrequent:
        def __init__(self):
            self.freq = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            items = batch.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(self.freq) == 0:
                hit = np.zeros(len(items), dtype=bool)
            else:
                pos_safe = np.clip(np.searchsorted(self.freq, items), 0, len(self.freq) - 1)
                hit = self.freq[pos_safe] == items
            orders = batch.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    order_col: pa.array(orders[hit], pa.int64()),
                    item_col: pa.array(items[hit], pa.int64()),
                }
            )

    def add_order_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, order_col, buckets)

    def gen_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # distinct (order, item), sorted -> per-basket sizes -> for each size
        # class, one (G, m) reshape + triu gather emits all pairs at once
        arr = np.unique(
            np.stack(
                [group[order_col].to_numpy(np.int64), group[item_col].to_numpy(np.int64)],
                axis=1,
            ),
            axis=0,
        )
        o, it = arr[:, 0], arr[:, 1]
        brk = np.r_[True, o[1:] != o[:-1]]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, len(o)])
        if sizes.size and sizes.max() > max_basket:
            raise ValueError(
                f"basket of {sizes.max()} items exceeds max_basket={max_basket}; "
                "raise min_support"
            )
        pas, pbs = [], []
        for m in np.unique(sizes):
            if m < 2:
                continue
            sel = starts[sizes == m]
            M = it[(sel[:, None] + np.arange(m)[None, :])]  # (G, m) baskets
            iu, ju = np.triu_indices(int(m), k=1)
            pas.append(M[:, iu].ravel())
            pbs.append(M[:, ju].ravel())
        if not pas:
            return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                                 "part_b": pd.Series([], dtype=np.int64),
                                 "n_orders": pd.Series([], dtype=np.int64)})
        pa_ = np.concatenate(pas)
        pb_ = np.concatenate(pbs)
        c = (
            pd.DataFrame({"part_a": pa_, "part_b": pb_})
            .groupby(["part_a", "part_b"], sort=False)
            .size()
            .rename("n_orders")
            .reset_index()
        )
        return c

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        key = (
            batch.column("part_a").to_numpy(zero_copy_only=False) * 1_000_003
            + batch.column("part_b").to_numpy(zero_copy_only=False)
        )
        b = pd.util.hash_array(key.astype(np.int64)) % buckets
        return batch.append_column("__bucket", pa.array(b.astype(np.int32), pa.int32()))

    def merge_pairs_topk(group: pd.DataFrame) -> pd.DataFrame:
        tot = (
            group.groupby(["part_a", "part_b"], sort=False)["n_orders"].sum().reset_index()
        )
        tot = tot.sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(topk)
        return tot.astype({"part_a": np.int64, "part_b": np.int64, "n_orders": np.int64})

    def final_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(topk)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(FilterFrequent, batch_format="pyarrow", concurrency=(1, 8))
        .map_batches(add_order_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(gen_pairs, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_pairs_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


# ------------------------------------------------------------ correlation


def corr_stats(ds, x_col: str, y_col: str):
    """Pearson correlation from EXACT integer sufficient statistics: each
    batch reduces to (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) over integer
    cents, one tiny single-block merge sums them, and the final correlation
    is one float64 expression over exact integers -- the expression tree is
    shared token-for-token with the SQL replay, so IEEE round-to-nearest
    makes both sides bit-identical before the ppm rounding. No shuffle at
    all: correlation is a 6-number reduction however large the input.

    Sums use object-dtype Python ints at the merge (sum_x2 of cents exceeds
    int64 at ~1e7 rows of 1e6-cent values); per-batch partials stay int64
    via a documented bound check. Returns one row:
    (n, sum_x_cents, sum_y_cents, corr_ppm).
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = np.floor(
            batch.column(x_col).to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            batch.column(y_col).to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        # int64 partial-overflow guard: |x|<=2^31-ish cents keeps x*x sums
        # inside int64 for any batch below ~2^63 / max(x^2) rows; testdata
        # money is <= ~1e7 cents so a 4096-row batch peaks ~4e17 < 2^63
        stats = [
            len(x), int(x.sum()), int(y.sum()),
            int((x * y).sum()), int((x * x).sum()), int((y * y).sum()),
        ]
        return pa.table(
            {
                "n": pa.array([stats[0]], pa.int64()),
                "sx": pa.array([stats[1]], pa.int64()),
                "sy": pa.array([stats[2]], pa.int64()),
                "sxy": pa.array([stats[3]], pa.int64()),
                "sx2": pa.array([stats[4]], pa.int64()),
                "sy2": pa.array([stats[5]], pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        # exact big-int totals (python ints), then ONE float64 expression
        # mirrored exactly by the oracle: num/den as double conversions of
        # exact integers -> IEEE ops round identically on both sides
        n = sum(batch.column("n").to_pylist())
        sx = sum(batch.column("sx").to_pylist())
        sy = sum(batch.column("sy").to_pylist())
        sxy = sum(batch.column("sxy").to_pylist())
        sx2 = sum(batch.column("sx2").to_pylist())
        sy2 = sum(batch.column("sy2").to_pylist())
        num = float(n * sxy - sx * sy)
        den = math.sqrt(float(n * sx2 - sx * sx)) * math.sqrt(float(n * sy2 - sy * sy))
        corr = num / den if den > 0.0 else 0.0
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "sum_x_cents": pa.array([sx], pa.int64()),
                "sum_y_cents": pa.array([sy], pa.int64()),
                "corr_ppm": pa.array([int(math.floor(corr * 1e6 + 0.5))], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def label_centroid_sums(ds, label_col: str = "label", emb_col: str = "embedding"):
    """Grouped vector aggregation: per label, the EXACT integer component
    sums of the embedding column (micros: floor(x*1e6 + 0.5) after an
    exact float32->float64 widening) plus the vector count -- the partial
    every distributed centroid/mean update reduces to (the kmeans fit uses
    the same shape internally; this exposes it as a standalone operator
    with a long-format (label, dim) output so the DuckDB UNNEST oracle
    compares exactly, no float means).

    Scale shape: per batch, ONE zero-copy flatten to an (n, d) matrix and
    one np.add.at scatter onto a (labels-in-batch, d) accumulator -- rows
    never leave the batch; the exchange is (labels x d) long-format
    partials, merged in a single bounded-domain block (labels and d are
    both bounded; an unbounded label domain would keep the distributed
    groupby instead, same partials).
    """
    from ..functions.similarity import to_matrix
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        m = to_matrix(batch.column(emb_col))  # float64, exact widening
        v = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        acc = np.zeros((len(uniq), v.shape[1]), dtype=np.int64)
        np.add.at(acc, inv, v)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        d = v.shape[1]
        return pa.table(
            {
                label_col: pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq)), pa.int64()),
                "sum_micros": pa.array(acc.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[label_col, "dim"],
        aggs=[("sum_micros", "sum"), ("n_vecs", "sum")],
        out_names=[label_col, "dim", "sum_micros", "n_vecs"],
    )


def typo_pairs(ds, col: str, buckets: int = 64):
    """Edit-distance-1 string self-join via FastSS deletion neighborhoods
    -- the fuzzy-join family's EXACT member (MinHash/SimHash/ngram are
    set-similarity; this is true Levenshtein<=1, the vocabulary-typo /
    near-identical-id matcher). No verification stage is needed because
    the keys are constructed to be exact:

    - substitution space: key ``(i, s with position i deleted)`` -- two
      distinct strings share it iff they differ ONLY at position i;
    - indel space: key ``deletion variant`` matched against key ``the
      string itself`` -- a hit means one string IS the other minus a char.

    The two spaces are disjoint (same length vs length+-1), and a pair
    arises under exactly one key, so within-group dedup is global dedup.

    Scale shape: pass 1 collapses to the distinct vocabulary (per-batch
    np.unique -> ONE value exchange -> per-bucket unique; Zipfian text
    makes the vocab domain << row domain); pass 2 explodes each DISTINCT
    value to its ~2L keys (the only per-string loop, over vocab not rows)
    and exchanges on the key hash; the per-bucket pair kernel is
    vectorized group arithmetic (size-class triu for substitutions, a
    first-row gather for indels). Returns (tok_a, tok_b) with tok_a <
    tok_b.
    """
    from .relational import hash_bucket_column

    def distinct_vals(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u.tolist(), pa.string())})

    def add_val_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, col, buckets)

    def uniq_vals(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({col: np.unique(group[col].to_numpy(object))})

    vocab = (
        ds.map_batches(distinct_vals, batch_format="pyarrow")
        .map_batches(add_val_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(uniq_vals, batch_format="pandas")
    )

    def explode(batch: pa.Table) -> pa.Table:
        keys, kinds, toks = [], [], []
        for t in batch.column(col).to_pylist():  # distinct vocab only
            keys.append("d:" + t); kinds.append(0); toks.append(t)  # indel target
            for i in range(len(t)):
                v = t[:i] + t[i + 1:]
                keys.append(f"s:{i}:{v}"); kinds.append(1); toks.append(t)
                keys.append("d:" + v); kinds.append(2); toks.append(t)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "kind": pa.array(kinds, pa.int8()),
                "tok": pa.array(toks, pa.string()),
            }
        )

    def add_key_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "key", buckets)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["key", "kind", "tok"], kind="mergesort")
        key = g["key"].to_numpy(object)
        kind = g["kind"].to_numpy(np.int8)
        tok = g["tok"].to_numpy(object)
        brk = np.r_[True, key[1:] != key[:-1]]
        grp = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        a_list, b_list = [], []
        # indel family: group's first row is the self (kind 0 sorts first);
        # every kind-2 row in such a group pairs with it
        has_self = kind[starts] == 0
        m = (kind == 2) & has_self[grp]
        if m.any():
            a_list.append(tok[starts[grp[m]]])
            b_list.append(tok[m])
        # substitution family: all-pairs within kind-1 groups, size-classed
        s_mask = kind == 1
        if s_mask.any():
            sk, st = key[s_mask], tok[s_mask]
            sb = np.r_[True, sk[1:] != sk[:-1]]
            sstarts = np.flatnonzero(sb)
            sizes = np.diff(np.r_[sstarts, len(sk)])
            for msize in np.unique(sizes):
                if msize < 2:
                    continue
                sel = sstarts[sizes == msize]
                M = st[(sel[:, None] + np.arange(msize)[None, :])]
                iu, ju = np.triu_indices(int(msize), k=1)
                a_list.append(M[:, iu].ravel())
                b_list.append(M[:, ju].ravel())
        if not a_list:
            return pd.DataFrame({"tok_a": pd.Series([], dtype=str),
                                 "tok_b": pd.Series([], dtype=str)})
        a = np.concatenate(a_list)
        b = np.concatenate(b_list)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        out = pd.DataFrame({"tok_a": lo, "tok_b": hi}).drop_duplicates()
        return out.reset_index(drop=True)

    return (
        vocab.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_key_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def in_degree_histogram(ds, id_col: str = "doc_id"):
    """In-degree distribution of the md5-derived citation graph (shared
    with ``pagerank_top`` / ``triangle_count`` / ``bfs_levels`` via
    ``derived_link_edges``) -- the first structural audit run on any link
    graph: hub skew shows up here before it breaks a join. Out-degree is
    1-3 by construction, so IN-degree is the informative side.

    Plan: edges -> per-batch ``value_counts`` on dst (partials, at most
    distinct-dst rows per batch) -> ONE dst-domain groupby-sum -> per-batch
    degree ``value_counts`` partials (the md5 target distribution is
    Binomial(2E/N, 1/N)-thin, so the degree domain is O(log N / log log N)
    -- bounded, which is what licenses ``tiny_final_groupby``) -> the
    0-in-degree row is closed-form (N minus cited-node count) and is
    appended inside the single final block, no extra pass.

    Returns (in_degree, n_nodes), 0-degree row included.
    Reference analogue: the manager's per-URL result-counter audit
    (``Manager.java:351-369`` counter hashmaps) generalized to graph form.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .relational import tiny_final_groupby

    n = ds.count()
    edges = derived_link_edges(ds, n, id_col=id_col).select_columns(["dst"])

    def dst_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("dst").combine_chunks())
        return pa.table(
            {
                "dst": vc.field("values"),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    per_node = (
        edges.map_batches(dst_partial, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum("c", alias_name="in_degree"))
    )

    def degree_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("in_degree").combine_chunks())
        return pa.table(
            {
                "in_degree": vc.field("values").cast(pa.int64()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = tiny_final_groupby(
        per_node.map_batches(degree_partial, batch_format="pyarrow"),
        ["in_degree"],
        [("n", "sum")],
        ["in_degree", "n_nodes"],
    )

    def add_zero_row(batch: pa.Table) -> pa.Table:
        cited = pc.sum(batch.column("n_nodes")).as_py() or 0
        uncited = n - cited
        if uncited > 0:
            zero = pa.table(
                {
                    "in_degree": pa.array([0], pa.int64()),
                    "n_nodes": pa.array([uncited], pa.int64()),
                }
            )
            batch = pa.concat_tables([zero, batch])
        return batch.sort_by("in_degree")

    return hist.map_batches(add_zero_row, batch_format="pyarrow", batch_size=None)


def table_checksum(ds, columns: list[str]):
    """Order-independent 64-bit content fingerprint of a dataset -- the
    anti-entropy primitive for verifying a copy/migration/replica without
    moving the data (each side computes locally; equal uint64s == equal
    content with md5-collision probability). Row hash = md5_u64 of the
    row's canonical serialization (values CAST to string, joined by the
    unit separator chr(31), NULL -> chr(0)); the fold is a WRAPPING uint64
    sum, so it is commutative -- row order, partitioning and block
    boundaries cannot change the answer.

    Exchange shape: ONE partial row per batch (n_rows + the batch's wrap
    sum as a decimal string -- uint64 exceeds Arrow's int64, same
    decimal-string convention as ``gini_ppm``'s rank-product term), then a
    single-block integer fold. The cheapest possible full-table pass.

    The md5 row loop is the repo's standard C-digest kernel (see
    ``functions/dedup.md5_u64``); serialization itself is vectorized
    (``binary_join_element_wise``). SQL replay: identical CAST || chr(31)
    serialization, md5-prefix UBIGINT, HUGEINT sum mod 2^64.

    Returns one row: (n_rows, checksum) with checksum a decimal string.
    Reference analogue: the manager's done-counter vs expected-counter
    equality check before declaring an app complete (``Manager.java:
    406-460``), strengthened from row COUNT to content equality.
    """
    import pyarrow.compute as pc

    from ..functions.dedup import md5_u64

    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            parts.append(pc.cast(batch.column(c), pa.string()))
        joined = pc.binary_join_element_wise(
            *parts, "\x1f", null_handling="replace", null_replacement="\x00"
        )
        n = batch.num_rows
        h = np.fromiter(
            (md5_u64(s.encode("utf-8")) for s in joined.to_pylist()),
            dtype=np.uint64,
            count=n,
        )
        wrap = int(h.sum(dtype=np.uint64)) if n else 0
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([str(wrap)], pa.string()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        total_n = int(pc.sum(batch.column("n")).as_py() or 0)
        total = sum(int(x) for x in batch.column("s").to_pylist()) % (1 << 64)
        return pa.table(
            {
                "n_rows": pa.array([total_n], pa.int64()),
                "checksum": pa.array([str(total)], pa.string()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def phrase_doc_counts(ds, w1: str, w2: str, lang_col: str = "lang", text_col: str = "text"):
    """Documents per language containing the exact token bigram
    ``w1 w2`` -- phrase search as a corpus-wide scan (the shape behind
    "how much of the corpus contains this boilerplate sentence"), on the
    same '[a-z0-9]+' lowered tokenization the token-frequency family
    shares character-for-character with its RE2 SQL replay
    (``top_tokens``, ``collocations``).

    Per batch: tokenize, one vectorized shifted-equality scan per doc
    (numpy, no quadratic work), emit (lang, hit-count) partials; the
    bounded lang domain licenses ``tiny_final_groupby``. Nothing but the
    partial rows is exchanged.

    Returns (lang, n_docs) for docs containing the phrase, langs with zero
    matches omitted (exactly what the GROUP BY replay produces).
    """
    import re

    from .relational import tiny_final_groupby

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column(lang_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        counts: dict[str, int] = {}
        for lang, text in zip(langs, texts):
            toks = tok_re.findall(text.lower())
            if len(toks) < 2:
                continue
            a = np.asarray(toks, dtype=object)
            if bool(np.any((a[:-1] == w1) & (a[1:] == w2))):
                counts[lang] = counts.get(lang, 0) + 1
        return pa.table(
            {
                "lang": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        [("n", "sum")],
        ["lang", "n_docs"],
    )


def oov_rate_by_lang(ds, vocab_k: int = 512, lang_col: str = "lang", text_col: str = "text"):
    """Vocabulary-coverage quality scoring: per language, what fraction of
    tokens (ppm) falls OUTSIDE the corpus's top-``vocab_k`` vocabulary --
    the CCNet-style "does this text look like the reference distribution"
    filter, with the corpus itself as the reference (a production pipeline
    would pass a held-out vocabulary; the plan is identical).

    Plan (two passes, both token-domain exchanges -- never text):

    1. **Vocabulary**: per-batch value_counts over the shared '[a-z0-9]+'
       lowered tokenization -> ``bucketed_grouped_sum`` (the string-key
       exchange moves (token, count) partials) -> per-block partial top-k
       -> one tiny merge block. The k-row vocabulary is a bounded,
       deliberate driver collect (same license as the broadcast join
       sides) and is closure-broadcast to pass 2 -- at any corpus size the
       vocabulary is ``vocab_k`` strings.
    2. **Scoring**: a second pass over the pruned (lang, text) read computes
       per-batch (lang, n_tokens, n_oov) partials via one vectorized
       ``isin`` against the broadcast set; the bounded lang domain licenses
       ``tiny_final_groupby``. Re-reading the source instead of
       ``materialize()``-ing pass 1's input is the documented
       storage-over-compute choice (see bm25_topk's scale note).

    The ppm division folds in ONE small final block with Python ints (at
    10^12 tokens/lang, n_oov * 10^6 overflows int64; the partial sums
    themselves stay int64-safe far past 100 TB).

    Vocabulary ties at the k-th slot break (count DESC, token ASC) on both
    sides. Returns (lang, n_tokens, n_oov, oov_ppm); langs whose docs
    produce zero tokens are absent (exactly what the GROUP BY replay
    yields). Reference analogue: Worker-side quality gating before costly
    extraction (SURVEY.md 2.10 quality family)."""
    import re

    from .relational import bucketed_grouped_sum, tiny_final_groupby

    tok_re = re.compile(r"[a-z0-9]+")

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(vocab_partial, batch_format="pandas"), "token", "n"
    )

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "token"], ascending=[False, True]).head(vocab_k)

    vocab_df = (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    vocab = frozenset(vocab_df["token"])

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        s = toks.explode().dropna()
        if len(s) == 0:
            return pd.DataFrame({lang_col: [], "n_tokens": [], "n_oov": []}).astype(
                {lang_col: str, "n_tokens": np.int64, "n_oov": np.int64}
            )
        g = pd.DataFrame(
            {
                lang_col: batch[lang_col].reindex(s.index).to_numpy(),
                "oov": (~s.isin(vocab)).to_numpy(np.int64),
            }
        )
        p = g.groupby(lang_col, sort=False)["oov"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                lang_col: p[lang_col],
                "n_tokens": p["size"].to_numpy(np.int64),
                "n_oov": p["sum"].to_numpy(np.int64),
            }
        )

    folded = tiny_final_groupby(
        ds.map_batches(score_partial, batch_format="pandas"),
        [lang_col],
        [("n_tokens", "sum"), ("n_oov", "sum")],
        [lang_col, "n_tokens", "n_oov"],
    )

    def add_ppm(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_tokens").to_pylist()
        no = batch.column("n_oov").to_pylist()
        ppm = pa.array([int(o) * 1_000_000 // int(t) for o, t in zip(no, nt)], pa.int64())
        return batch.append_column("oov_ppm", ppm)

    return folded.map_batches(add_ppm, batch_format="pyarrow", batch_size=None)


def dup_shingle_rate(
    ds, source_col: str = "source", text_col: str = "text", buckets: int | None = None
):
    """Cross-document duplicated-shingle audit: per source, what fraction
    (ppm) of per-doc DISTINCT word-3-shingles also appears in at least one
    OTHER document -- the exact-substring-duplication health metric behind
    "how much boilerplate does this crawl slice carry" (the measurement
    that motivates substring-level dedup a la Lee et al.; the pair family
    finds the offenders, this op sizes the problem per slice).

    Plan (ONE shingle-domain exchange, never text):

    1. ``map_batches``: per doc, ``np.unique(shingle_hashes(text))`` -- the
       SAME tokenization/shingling/md5-u64 kernel the MinHash and ngram
       families share with their SQL replays -- emitted as long
       (h: uint64, source) rows.
    2. Hash-bucket on h (all rows of one shingle value land in one bucket,
       so the in-bucket group size IS the global distinct-doc count --
       per-doc uniqueness makes rows (h, doc)-distinct) -> per-bucket
       vectorized transform('size') + per-source partials.
    3. Bounded source domain -> ``tiny_final_groupby`` + Python-int ppm.

    Grouping by the 64-bit shingle hash instead of the string is the pair
    family's documented trade: collisions mis-merge two shingle strings
    with probability 2^-64 per pair -- at 100 TB (~4e13 shingles) that is
    ~ppm-level error on a ppm metric; swap md5_u64 for the full 128-bit
    digest if exactness matters there. The oracle groups by the string
    itself, which is equality-identical at test scale.

    Returns (source, n_shingles, n_shared, shared_ppm)."""
    from ..functions.dedup import shingle_hashes
    from .relational import derive_buckets, hash_bucket_column, tiny_final_groupby

    if buckets is None:
        # ~40 shingles/doc: size buckets off the doc count so one bucket's
        # long rows stay ~2M regardless of corpus scale
        buckets = derive_buckets(ds.count(), rows_per_bucket=50_000)

    def long_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        memo: dict[str, int] = {}
        us = [np.unique(shingle_hashes(t or "", 3, memo)) for t in texts]
        lens = [len(u) for u in us]
        h = np.concatenate(us) if us else np.empty(0, np.uint64)
        src = np.repeat(np.asarray(srcs, dtype=object), lens)
        out = pa.table(
            {"h": pa.array(h, pa.uint64()), "source": pa.array(src, pa.string())}
        )
        return hash_bucket_column(out, "h", buckets)

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h", sort=False)["h"].transform("size")
        p = pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "shared": (nd >= 2).to_numpy().astype(np.int64),
            }
        )
        out = p.groupby("source", sort=False)["shared"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                "source": out["source"],
                "n_shingles": out["size"].to_numpy(np.int64),
                "n_shared": out["sum"].to_numpy(np.int64),
            }
        )

    folded = tiny_final_groupby(
        ds.map_batches(long_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_audit, batch_format="pandas"),
        ["source"],
        [("n_shingles", "sum"), ("n_shared", "sum")],
        ["source", "n_shingles", "n_shared"],
    )

    def add_ppm(batch: pa.Table) -> pa.Table:
        ns = batch.column("n_shingles").to_pylist()
        nh = batch.column("n_shared").to_pylist()
        ppm = pa.array([int(s) * 1_000_000 // int(t) for s, t in zip(nh, ns)], pa.int64())
        return batch.append_column("shared_ppm", ppm)

    return folded.map_batches(add_ppm, batch_format="pyarrow", batch_size=None)


def doc_boilerplate_score(
    ds, id_col: str = "doc_id", text_col: str = "text", buckets: int | None = None
):
    """Per-DOCUMENT boilerplate score: the ppm of a doc's DISTINCT
    word-3-shingles that also appear in at least one OTHER document --
    ``dup_shingle_rate`` (the per-slice aggregate) resolved down to a
    per-doc quality COLUMN, the signal a substring-dedup or quality gate
    filters on (Lee et al.'s "how much of this doc is corpus boilerplate"
    per row instead of per crawl slice).

    Plan (TWO bounded exchanges, never text):

    1. the SAME tokenize/shingle/md5-u64 kernel as the MinHash/ngram/
       dup_shingle families, emitted as (h: uint64, doc_id) long rows,
       hash-bucketed on h -- all rows of one shingle land together, so
       the in-bucket group size IS the global distinct-doc count;
    2. per h-bucket, per-doc PARTIAL (n, n_shared) counts -- collapsing
       each bucket to at most |docs-in-bucket| rows before anything
       moves again;
    3. ONE doc_id-bucketed fold sums the partials and computes the exact
       int64 ppm.

    Same 2^-64-per-pair hash-collision caveat as dup_shingle_rate; the
    SQL replay groups by the shingle string, equality-identical at test
    scale.

    Returns (doc_id, n_shingles, n_shared, boilerplate_ppm), one row per
    doc with at least one shingle (every doc: the kernel emits one
    whole-text shingle for <3-token docs)."""
    from ..functions.dedup import shingle_hashes
    from .relational import derive_buckets, hash_bucket_column

    n_docs = ds.count()
    if buckets is None:
        buckets = derive_buckets(n_docs, rows_per_bucket=50_000)
    doc_buckets = derive_buckets(n_docs, rows_per_bucket=500_000)

    def long_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        memo: dict[str, int] = {}
        us = [np.unique(shingle_hashes(t or "", 3, memo)) for t in texts]
        lens = [len(u) for u in us]
        h = np.concatenate(us) if us else np.empty(0, np.uint64)
        out = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            }
        )
        return hash_bucket_column(out, "h", buckets)

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h", sort=False)["h"].transform("size")
        p = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "shared": (nd >= 2).to_numpy().astype(np.int64),
            }
        )
        out = p.groupby("doc_id", sort=False)["shared"].agg(["size", "sum"]).reset_index()
        t = pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
                "n_shared": pa.array(out["sum"].to_numpy(np.int64), pa.int64()),
            }
        )
        return hash_bucket_column(t, "doc_id", doc_buckets, name="__dbucket").to_pandas()

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False)[["n", "n_shared"]].sum().reset_index()
        n = out["n"].to_numpy(np.int64)
        s = out["n_shared"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "n_shingles": n,
                "n_shared": s,
                "boilerplate_ppm": s * 1_000_000 // n,
            }
        )

    return (
        ds.map_batches(long_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_partials, batch_format="pandas")
        .groupby("__dbucket")
        .map_groups(fold_doc, batch_format="pandas")
    )


def pair_set_audit(exact, approx):
    """Precision/recall audit of an APPROXIMATE pair set against an EXACT
    one -- the measurement that justifies (or indicts) running MinHash
    instead of the exact-recall AllPairs join at scale ("measure, don't
    guess" applied to the dedup family itself).

    Both inputs are pair datasets carrying (doc_a, doc_b) int64 columns
    (extra columns dropped). Plan: tag each side with a bit (exact=1,
    approx=2), union, ONE pair-domain exchange bucketed on doc_a (both
    rows of a pair share doc_a, so the in-bucket per-pair bit-sum is
    global), per-bucket partial counts, single tiny fold. Each side emits
    a pair at most once, so sum==3 identifies intersection rows.

    Returns ONE row: (n_exact, n_approx, n_both, recall_ppm,
    precision_ppm); a zero denominator reports 1_000_000 (vacuously
    perfect) -- mirrored by the SQL replay."""
    from .relational import hash_bucket_column

    def tag(side: int):
        def _fn(batch: pa.Table) -> pa.Table:
            out = pa.table(
                {
                    "doc_a": batch.column("doc_a").cast(pa.int64()),
                    "doc_b": batch.column("doc_b").cast(pa.int64()),
                    "side": pa.array([side] * batch.num_rows, pa.int64()),
                }
            )
            return hash_bucket_column(out, "doc_a", 32)

        return _fn

    tagged = exact.map_batches(tag(1), batch_format="pyarrow").union(
        approx.map_batches(tag(2), batch_format="pyarrow")
    )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_a", "doc_b"], sort=False)["side"].sum()
        v = s.to_numpy()
        return pd.DataFrame(
            {
                "n_exact": [int(np.count_nonzero(v & 1))],
                "n_approx": [int(np.count_nonzero(v & 2))],
                "n_both": [int(np.count_nonzero(v == 3))],
            }
        ).astype(np.int64)

    partials = tagged.groupby("__bucket").map_groups(
        bucket_counts, batch_format="pandas"
    )

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ne = int(pc.sum(batch.column("n_exact")).as_py() or 0)
        na = int(pc.sum(batch.column("n_approx")).as_py() or 0)
        nb = int(pc.sum(batch.column("n_both")).as_py() or 0)
        recall = nb * 1_000_000 // ne if ne else 1_000_000
        precision = nb * 1_000_000 // na if na else 1_000_000
        return pa.table(
            {
                "n_exact": pa.array([ne], pa.int64()),
                "n_approx": pa.array([na], pa.int64()),
                "n_both": pa.array([nb], pa.int64()),
                "recall_ppm": pa.array([recall], pa.int64()),
                "precision_ppm": pa.array([precision], pa.int64()),
            }
        )

    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def hll_error_audit(events, col: str = "user_id"):
    """Sketch-accuracy audit: the HyperLogLog estimate next to the EXACT
    distinct count, with the absolute error in ppm -- the committed
    evidence for trusting (or re-sizing) the sketch at scale, same
    "measure, don't guess" shape as ``pair_set_audit``.

    The exact side is a value-domain exchange: per-batch ``np.unique``
    partials (the map-side distinct that shrinks the shuffle to the batch
    vocabulary), hash-bucketed, per-bucket nunique, tiny driver fold. The
    approximate side is the existing mergeable-sketch pipeline
    (``sketches.approx_distinct``). Both sides consume the same read;
    the driver fold is a handful of ints.

    Returns ONE row (exact_distinct, approx_distinct, abs_err_ppm)."""
    from ..functions.sketches import approx_distinct
    from .relational import hash_bucket_column

    est = int(np.floor(approx_distinct(events, col) + 0.5))

    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        return hash_bucket_column(pa.table({col: pa.array(u)}), col, 64)

    def bucket_n(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g[col].nunique())]})

    exact = int(
        events.map_batches(uniq, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_n, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    err = abs(est - exact) * 1_000_000 // exact if exact else 0
    return pd.DataFrame(
        {
            "exact_distinct": pd.array([exact], dtype="int64"),
            "approx_distinct": pd.array([est], dtype="int64"),
            "abs_err_ppm": pd.array([err], dtype="int64"),
        }
    )


def bloom_fp_audit(
    new_ds,
    corpus_ds,
    text_col: str = "text",
    *,
    bits_per_key: int = 16,
    merge_group: int = 64,
    join_buckets: int | None = None,
):
    """Bloom-prefilter false-positive audit: how many of the new batch's
    Bloom HITS were actually novel (false positives the exact
    re-verification join then had to absorb) -- the measurement behind
    ``novel_docs_bloom``'s claim that FP rate only costs re-verification
    volume. Third member of the "measure, don't guess" audit family
    (pair_set_audit, hll_error_audit).

    Same broadcast-bloom build as ``novel_docs_bloom`` (shared
    ``_broadcast_bloom``); the new batch is tagged once, hit rows
    re-verify through the bucketed left join, and THREE bounded count
    partials fold at the driver. fp_ppm is false positives over the
    non-duplicate rows actually tested (the population that could FP).

    Returns ONE row (n_new, n_bloom_hits, n_true_dups, n_false_pos,
    fp_ppm)."""
    import ray

    from ..functions.bloom import BloomFilter
    from .relational import bucketed_hash_join, derive_buckets

    corpus_hashes = _distinct_content_hashes(corpus_ds, text_col)
    n_keys = corpus_hashes.count()
    m_bits = BloomFilter.for_keys(max(n_keys, 1), bits_per_key).m
    handle = _broadcast_bloom(corpus_hashes, m_bits, merge_group)

    class BloomTag:
        def __init__(self) -> None:
            self.bloom = BloomFilter.from_bytes(ray.get(handle[0]))

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = dk.sha256_hex(batch.column(text_col).to_pylist())
            hit = self.bloom.contains_many(h)
            return pa.table(
                {
                    "__hash": pa.array(h, pa.string()),
                    "__hit": pa.array(hit, pa.bool_()),
                }
            )

    tagged = new_ds.map_batches(
        BloomTag, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()  # consumed twice: counts + hit re-verification

    def count_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "n_hit": pa.array(
                    [int(pc.sum(batch.column("__hit").cast(pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    cnt = tagged.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    n_new, n_hits = int(cnt["n"].sum()), int(cnt["n_hit"].sum())

    def keep_hits(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("__hit")).select(["__hash"])

    hits = tagged.map_batches(keep_hits, batch_format="pyarrow")
    buckets = join_buckets if join_buckets is not None else derive_buckets(n_keys)
    joined = bucketed_hash_join(
        hits, corpus_hashes, "__hash", "corpus_hash", buckets=buckets, how="left"
    )

    def true_dup_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.sum(pc.invert(pc.is_null(batch.column("corpus_hash"))).cast(pa.int64()))
        return pa.table({"n": pa.array([int(m.as_py() or 0)], pa.int64())})

    td = joined.map_batches(true_dup_partial, batch_format="pyarrow").to_pandas()
    n_true = int(td["n"].sum()) if "n" in td.columns else 0  # zero-hit batch: no blocks
    n_fp = n_hits - n_true
    tested = n_new - n_true
    fp_ppm = n_fp * 1_000_000 // tested if tested else 0
    return pd.DataFrame(
        {
            "n_new": pd.array([n_new], dtype="int64"),
            "n_bloom_hits": pd.array([n_hits], dtype="int64"),
            "n_true_dups": pd.array([n_true], dtype="int64"),
            "n_false_pos": pd.array([n_fp], dtype="int64"),
            "fp_ppm": pd.array([fp_ppm], dtype="int64"),
        }
    )


def cms_error_audit(ds_exact, ds_cms, k: int = 20):
    """Count-Min-sketch accuracy audit: for the exact top-``k`` tokens,
    the CMS estimate next to the true count and the overestimate in ppm
    (CMS never underestimates, so over_ppm >= 0) -- the audit-family
    measurement that sizes the sketch's collision noise before trusting
    it on an unbounded vocabulary.

    Both constituents are existing pipelines (``top_tokens`` exact heavy
    hitters; ``cms_token_counts`` point-queried at that candidate set);
    each returns k rows, so the final merge is a bounded, deliberate
    driver join. Two reads of the corpus text by design -- the exact side
    must see the data before the candidates exist.

    Returns k rows (token, n_exact, n_cms, over_ppm)."""
    exact = top_tokens(ds_exact, k=k).to_pandas()
    est = cms_token_counts(ds_cms, candidates=exact["token"].tolist(), k=k).to_pandas()
    m = exact.merge(est, on="token")
    over = [
        (int(c) - int(n)) * 1_000_000 // int(n) for c, n in zip(m["n_cms"], m["n"])
    ]
    return pd.DataFrame(
        {
            "token": m["token"],
            "n_exact": m["n"].astype("int64"),
            "n_cms": m["n_cms"].astype("int64"),
            "over_ppm": pd.array(over, dtype="int64"),
        }
    )


def dup_size_histogram(ds, text_col: str = "text"):
    """Duplicate-group-size histogram: how many distinct texts occur once,
    twice, three times... -- the corpus-health profile that says whether
    duplication is a long tail of near-singletons (cheap to keep) or a few
    monster clusters (salting / cap territory), one level finer than
    ``dedup_stats``' scalar totals.

    Two-level collapse, both exchanges bounded: per-batch sha256
    value_counts -> ``bucketed_grouped_sum`` over the hash domain (the
    only unbounded exchange, (hash, count) partials) -> per-block
    value_counts of the group SIZE -> tiny size-domain final (group sizes
    are <= the corpus's max multiplicity, a handful of distinct values).
    Text equality is hash equality modulo the dedup family's documented
    2^-256 collision odds.

    Returns (group_size, n_groups)."""
    from .relational import bucketed_grouped_sum, tiny_final_groupby

    def hash_counts(batch: pa.Table) -> pa.Table:
        h = dk.sha256_hex(batch.column(text_col).to_pylist())
        vc = pd.Series(h).value_counts()
        return pa.table(
            {
                "h": pa.array(vc.index, pa.string()),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    counts = bucketed_grouped_sum(
        ds.map_batches(hash_counts, batch_format="pyarrow"), "h", "n"
    )

    def size_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["n"].value_counts()
        return pd.DataFrame(
            {
                "group_size": vc.index.to_numpy(np.int64),
                "k": vc.to_numpy(np.int64),
            }
        )

    return tiny_final_groupby(
        counts.map_batches(size_partial, batch_format="pandas"),
        ["group_size"],
        [("k", "sum")],
        ["group_size", "n_groups"],
    )


def _cms_over_keys(ds, key: str, depth: int, width: int, merge_group: int = 64):
    """Per-batch key value_counts -> partial CMS -> the cms_token_counts
    tree merge (bounded ``merge_group`` sketches per task). Keys stringify
    as str(int) so the SQL replay's CAST(key AS VARCHAR) hashes
    identically. Returns the merged driver-side CountMinSketch."""
    from ..functions.sketches import CountMinSketch

    def partial(batch: pa.Table) -> pd.DataFrame:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vc = pd.Series(keys).value_counts()
        cms = CountMinSketch(depth, width).add_counts(
            [str(int(t)) for t in vc.index], vc.to_numpy(np.int64)
        )
        return pd.DataFrame({"sketch": [cms.to_bytes()]})

    def merge_block(batch: pd.DataFrame) -> pd.DataFrame:
        m = CountMinSketch.from_bytes(batch["sketch"].iloc[0])
        for b in batch["sketch"].iloc[1:]:
            m.merge(CountMinSketch.from_bytes(b))
        return pd.DataFrame({"sketch": [m.to_bytes()]})

    merged = ds.map_batches(partial, batch_format="pyarrow").materialize()
    while merged.count() > 1:
        blocks = (merged.count() + merge_group - 1) // merge_group
        merged = (
            merged.repartition(blocks)
            .map_batches(merge_block, batch_format="pandas", batch_size=None)
            .materialize()
        )
    return CountMinSketch.from_bytes(merged.take_all()[0]["sketch"])


def join_size_audit(
    left, right, left_key: str, right_key: str, depth: int = 4, width: int = 8192
):
    """Join-cardinality estimation audit -- the query-planner primitive:
    |A |><| B| estimated as the CMS inner product min over rows
    (Alon-Gibbons-Matias-Szegedy style; always an OVERESTIMATE, collisions
    only add mass), next to the EXACT count computed WITHOUT materializing
    the join (per-key count tables, one key-domain exchange, sum of count
    products). Fifth member of the audit family.

    The sketches are constant 256 KB regardless of key cardinality -- the
    at-scale path when even the per-key count table is too hot to ship; the
    audit quantifies what that compression costs. All driver folds are
    Python-int exact (count products overflow int64 at planetary scale).

    Returns ONE row (exact_rows, cms_estimate, over_ppm >= 0)."""
    from .relational import hash_bucket_column

    ska = _cms_over_keys(left, left_key, depth, width)
    skb = _cms_over_keys(right, right_key, depth, width)
    est = min(
        sum(int(a) * int(b) for a, b in zip(ska.table[r], skb.table[r]))
        for r in range(depth)
    )

    def side_counts(key: str, side: int):
        def _fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key).to_numpy(zero_copy_only=False)
            vc = pd.Series(keys).value_counts()
            t = pa.table(
                {
                    "k": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
                    "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
                    "side": pa.array([side] * len(vc), pa.int64()),
                }
            )
            return hash_bucket_column(t, "k", 64)

        return _fn

    both = left.map_batches(side_counts(left_key, 0), batch_format="pyarrow").union(
        right.map_batches(side_counts(right_key, 1), batch_format="pyarrow")
    )

    def bucket_product(g: pd.DataFrame) -> pd.DataFrame:
        p = g.groupby(["k", "side"], sort=False)["n"].sum().unstack("side")
        if 0 not in p.columns or 1 not in p.columns:
            return pd.DataFrame({"s": pd.array([0], dtype="int64")})
        prod = (p[0].fillna(0) * p[1].fillna(0)).sum()
        return pd.DataFrame({"s": pd.array([int(prod)], dtype="int64")})

    exact = int(
        both.groupby("__bucket")
        .map_groups(bucket_product, batch_format="pandas")
        .to_pandas()["s"]
        .sum()
    )
    over = (est - exact) * 1_000_000 // exact if exact else 0
    return pd.DataFrame(
        {
            "exact_rows": pd.array([exact], dtype="int64"),
            "cms_estimate": pd.array([est], dtype="int64"),
            "over_ppm": pd.array([over], dtype="int64"),
        }
    )


def langid_confusion(ds, lang_col: str = "lang", text_col: str = "text"):
    """Language-ID confusion matrix: labeled language vs the n-gram
    heuristic's prediction, counted per (lang, pred_lang) cell -- the
    classifier-quality audit for the quality-filter family (which langs
    does the cheap heuristic misroute, and where do 'unknown's come from).

    Pure map-side: one vectorized ``textstats.lang_id`` call per batch
    emits bounded (|langs| x |langs+2|) cell partials; ``tiny_final_groupby``
    folds them. The prediction kernel is the SAME regex/stopword machinery
    the ``language_id`` oracle replays char-for-char, so the whole matrix
    is SQL-checkable.

    Returns (lang, pred_lang, n_docs)."""
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pred = ts.lang_id(batch[text_col])
        df = pd.DataFrame(
            {"lang": batch[lang_col].to_numpy(), "pred_lang": pred.to_numpy()}
        )
        return (
            df.groupby(["lang", "pred_lang"], sort=False).size().rename("n").reset_index()
        )

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "pred_lang"],
        [("n", "sum")],
        ["lang", "pred_lang", "n_docs"],
    )


def k_anonymity_audit(ds, qi_cols: list[str], k: int = 10):
    """k-anonymity audit: how many rows sit in quasi-identifier groups
    smaller than ``k`` -- the re-identification-risk measurement a
    governance pass runs before releasing a dataset slice (the
    DATA-GOVERNANCE complement to ``redact_pii``'s content scrubbing).

    The QI key is the chr(31)-joined serialization of the quasi-identifier
    columns (table_checksum's convention, NULL as chr(0)); the combo
    domain is unbounded in general, so the counts fold through
    ``bucketed_grouped_sum`` (one key-domain exchange of (key, count)
    partials) and per-block partials reduce to four bounded counters at
    the driver.

    Returns ONE row (n_rows, n_groups, n_small_groups, n_rows_at_risk,
    risk_ppm = rows-at-risk per million rows)."""
    from .relational import bucketed_grouped_sum

    sep, nul = chr(31), chr(0)

    def key_counts(batch: pd.DataFrame) -> pd.DataFrame:
        parts = [
            batch[c].map(lambda v: nul if pd.isna(v) else str(v)) for c in qi_cols
        ]
        key = parts[0]
        for p in parts[1:]:
            key = key + sep + p
        vc = key.value_counts()
        return pd.DataFrame({"qi": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(key_counts, batch_format="pandas"), "qi", "n"
    )

    def risk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(np.int64)
        small = n < k
        return pd.DataFrame(
            {
                "n_rows": pd.array([int(n.sum())], dtype="int64"),
                "n_groups": pd.array([len(n)], dtype="int64"),
                "n_small_groups": pd.array([int(small.sum())], dtype="int64"),
                "n_rows_at_risk": pd.array([int(n[small].sum())], dtype="int64"),
            }
        )

    p = counts.map_batches(risk_partial, batch_format="pandas").to_pandas()
    n_rows = int(p["n_rows"].sum())
    at_risk = int(p["n_rows_at_risk"].sum())
    return pd.DataFrame(
        {
            "n_rows": pd.array([n_rows], dtype="int64"),
            "n_groups": pd.array([int(p["n_groups"].sum())], dtype="int64"),
            "n_small_groups": pd.array([int(p["n_small_groups"].sum())], dtype="int64"),
            "n_rows_at_risk": pd.array([at_risk], dtype="int64"),
            "risk_ppm": pd.array(
                [at_risk * 1_000_000 // n_rows if n_rows else 0], dtype="int64"
            ),
        }
    )


def split_skew_audit(
    ds, id_col: str = "doc_id", val_col: str = "n_chars", bucket_width: int = 256
):
    """Train/test split-skew audit: the exact total-variation distance (in
    ppm) between the two splits' value distributions over fixed-width
    buckets -- the "is my held-out set actually exchangeable" check run
    before trusting an eval number. Uses the SAME deterministic md5 split
    as ``train_val_test_split``, so what it audits is the engine's own
    split operator. TVD of identical distributions is 0; disjoint, 10^6.

    One pass: per-batch (split, bucket) counts -> ``tiny_final_groupby``
    (the bucket domain is value-range/width bounded) -> exact driver fold
    with Python ints: tvd_ppm = sum_i |a_i*n1 - b_i*n0| * 10^6
    // (2*n0*n1) -- the cross-multiplied form never touches a float.

    Returns ONE row (n_train, n_test, tvd_ppm)."""
    from .relational import tiny_final_groupby

    tagged = train_val_test_split(ds, id_col)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["split"].isin(["train", "test"])]
        df = pd.DataFrame(
            {
                "split": sub["split"].to_numpy(),
                "b": sub[val_col].to_numpy(np.int64) // bucket_width,
            }
        )
        return df.groupby(["split", "b"], sort=False).size().rename("n").reset_index()

    counts = tiny_final_groupby(
        tagged.map_batches(partial, batch_format="pandas"),
        ["split", "b"],
        [("n", "sum")],
        ["split", "b", "n"],
    ).to_pandas()
    tr = {int(r.b): int(r.n) for r in counts[counts["split"] == "train"].itertuples()}
    te = {int(r.b): int(r.n) for r in counts[counts["split"] == "test"].itertuples()}
    n0, n1 = sum(tr.values()), sum(te.values())
    if n0 == 0 or n1 == 0:
        tvd = 1_000_000 if (n0 or n1) else 0
    else:
        num = sum(
            abs(tr.get(b, 0) * n1 - te.get(b, 0) * n0) for b in set(tr) | set(te)
        )
        tvd = num * 1_000_000 // (2 * n0 * n1)
    return pd.DataFrame(
        {
            "n_train": pd.array([n0], dtype="int64"),
            "n_test": pd.array([n1], dtype="int64"),
            "tvd_ppm": pd.array([tvd], dtype="int64"),
        }
    )


def vocab_growth(sf_dir: str, fracs_ppm: tuple[int, ...] = (250_000, 500_000, 750_000, 1_000_000),
                 buckets: int = 64):
    """Heaps-law vocabulary growth curve: distinct whitespace-token count
    after the first ``frac`` of the corpus (by doc_id order), at each
    checkpoint fraction -- the "is the vocabulary saturating" audit that
    sizes tokenizer training data and predicts OOV decay.

    The curve for ALL checkpoints costs ONE token-domain pass: each token
    collapses to its FIRST doc_id (per-batch groupby-min partials ->
    bucketed min exchange on the token hash -- the shuffle moves (token,
    first_id) rows, never text), then each bucket bins its tokens' first
    ids against the broadcast checkpoint thresholds (one searchsorted) and
    only |checkpoints|-row count partials reach the tiny final. Checkpoint
    thresholds are integer ppm of max(doc_id)+1 so the SQL replay shares
    the arithmetic digit-for-digit.

    Returns (frac_ppm, n_docs, vocab_size) -- n_docs from a narrow
    doc_id-only scan, vocab_size the distinct tokens first seen below the
    threshold."""
    import ray.data as rd

    from .relational import hash_bucket_column, tiny_final_groupby

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def block_max(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"m": pa.array([pc.max(batch.column("doc_id")).as_py()])})

    n = int(ids.map_batches(block_max, batch_format="pyarrow").to_pandas()["m"].max()) + 1
    thresholds = [(f * n) // 1_000_000 for f in fracs_ppm]
    th = np.array(thresholds, np.int64)

    def id_counts(batch: pa.Table) -> pa.Table:
        d = np.sort(batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "frac_ppm": pa.array(list(fracs_ppm), pa.int64()),
                "c": pa.array(np.searchsorted(d, th, side="left"), pa.int64()),
            }
        )

    folded = ids.map_batches(id_counts, batch_format="pyarrow").to_pandas()
    n_docs = folded.groupby("frac_ppm", sort=True)["c"].sum().to_dict()

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def first_seen(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        ex = batch["text"].fillna("").str.findall(ts._WS_TOKEN).explode().dropna()
        ids_np = batch["doc_id"].to_numpy(np.int64)[ex.index.to_numpy(np.int64)]
        df = pd.DataFrame({"token": ex.to_numpy(object), "fid": ids_np})
        return df.groupby("token", sort=False, as_index=False)["fid"].min()

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "token", buckets)

    def bucket_bins(g: pd.DataFrame) -> pd.DataFrame:
        fid = np.sort(g.groupby("token", sort=False)["fid"].min().to_numpy(np.int64))
        return pd.DataFrame(
            {
                "frac_ppm": np.array(fracs_ppm, np.int64),
                "v": np.searchsorted(fid, th, side="left").astype(np.int64),
            }
        )

    partials = (
        docs.map_batches(first_seen, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_bins, batch_format="pandas")
    )
    merged = tiny_final_groupby(
        partials, keys=["frac_ppm"], aggs=[("v", "sum")], out_names=["frac_ppm", "vocab_size"]
    )

    def attach(batch: pa.Table) -> pa.Table:
        fp = batch.column("frac_ppm").to_pylist()
        return pa.table(
            {
                "frac_ppm": pa.array(fp, pa.int64()),
                "n_docs": pa.array([int(n_docs[f]) for f in fp], pa.int64()),
                "vocab_size": batch.column("vocab_size").cast(pa.int64()),
            }
        )

    return merged.map_batches(attach, batch_format="pyarrow")


def common_neighbor_pairs(ds, k: int = 20, id_col: str = "doc_id"):
    """Link prediction by common-neighbor count: the top-k NON-adjacent
    node pairs of the (undirected view of the) derived citation graph,
    ranked by how many neighbors they share -- the classic
    missing-link/recommendation score (Liben-Nowell & Kleinberg), and the
    structural dual of triangle_count (a predicted link is an OPEN wedge).

    Plan: canonical distinct undirected edges (triangle_count's canon) ->
    both-direction adjacency -> wedge self-join bucketed on the CENTER
    vertex (per-pair contribution = one shared neighbor) -> per-batch
    packed-pair count partials -> ``bucketed_grouped_sum`` on the packed
    int64 key -> LEFT bucketed join against the edge set drops pairs that
    are already edges (null-test anti-join) -> per-block partial top-k +
    tiny merge under the deterministic (n desc, a asc, b asc) order. The
    packed key needs n_nodes^2 < 2^63 (same guard as triangle_count).

    Returns (doc_a, doc_b, n_common), doc_a < doc_b, k rows."""
    from ray.data.aggregate import Count

    from .relational import bucketed_grouped_sum, bucketed_hash_join, derive_buckets

    n_nodes = ds.count()
    if n_nodes == 0 or n_nodes * n_nodes >= 2**63:
        raise ValueError("common_neighbor_pairs: packed pair key would overflow int64")

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    und = (
        derived_link_edges(ds, n_nodes, id_col=id_col)
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    buckets = derive_buckets(und.count(), rows_per_bucket=1_000_000)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow")
    wedges = bucketed_hash_join(
        adj.rename_columns(["w", "v1"]),
        adj.rename_columns(["w", "v2"]),
        "w",
        "w",
        buckets=buckets,
    ).filter(expr="v1 < v2")

    def pack_counts(batch: pa.Table) -> pa.Table:
        v1 = batch.column("v1").to_numpy(zero_copy_only=False)
        v2 = batch.column("v2").to_numpy(zero_copy_only=False)
        pk, cnt = np.unique(v1 * n_nodes + v2, return_counts=True)
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    cn = bucketed_grouped_sum(
        wedges.map_batches(pack_counts, batch_format="pyarrow"), "pk", "c", buckets=buckets
    )

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pk2": pa.array(a * n_nodes + b, pa.int64()),
                "is_edge": pa.array(np.ones(len(a), np.int8), pa.int8()),
            }
        )

    def drop_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_null(batch.column("is_edge")))

    non_edges = bucketed_hash_join(
        cn,
        und.map_batches(edge_keys, batch_format="pyarrow"),
        "pk",
        "pk2",
        buckets=buckets,
        how="left",
    ).map_batches(drop_edges, batch_format="pyarrow")

    def unpack_topk(batch: pd.DataFrame) -> pd.DataFrame:
        pk = batch["pk"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "doc_a": pk // n_nodes,
                "doc_b": pk % n_nodes,
                "n_common": batch["c"].to_numpy(np.int64),
            }
        )
        return out.sort_values(
            ["n_common", "doc_a", "doc_b"], ascending=[False, True, True]
        ).head(k)

    return (
        non_edges.map_batches(unpack_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(
            lambda df: df.sort_values(
                ["n_common", "doc_a", "doc_b"], ascending=[False, True, True]
            ).head(k),
            batch_format="pandas",
            batch_size=None,
        )
    )


def cross_source_dup_matrix(sf_dir: str, threshold: float = 0.6,
                            broadcast_cap_bytes: int = 256 << 20):
    """Cross-source near-duplicate contamination matrix: MinHash+LSH pair
    counts per UNORDERED source pair -- the provenance audit that localizes
    WHERE duplication comes from (mirror sites, cross-posted feeds) after
    dup_shingle_rate has sized it and before a dedup pass spends compute.

    Plan: the unchanged minhash_lsh_pairs plan yields the pair set, which
    is small by construction (the near-dup rate times the corpus). Its
    endpoint id set broadcasts ONCE (capped with a loud raise -- past the
    cap the bucketed-join shape is right, and the previous revision of
    this function implements it); one map-side pass over the narrow
    (doc_id, source) projection keeps ONLY endpoint rows (bounded by
    2x pairs), which fold to a doc->source dict; the pair stream then
    labels both endpoints dict-side and emits bounded (source_a,
    source_b) count partials. The corpus-sized source projection is never
    shuffled -- the round-3 bench showed the two bucketed joins it
    previously paid cost ~5 s at sf0.1 against a KB-sized pair set.
    Sources order lexicographically within a pair (LEAST/GREATEST,
    shared with the replay).

    Returns (source_a, source_b, n_pairs); only pairs with >= 1 near-dup."""
    import ray
    import ray.data as rd

    from .relational import tiny_final_groupby

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=threshold).drop_columns(["est_jaccard"]).materialize()

    def endpoint_ids(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64),
                    batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table({"k": pa.array(u, pa.int64())})

    ids = np.unique(
        pairs.map_batches(endpoint_ids, batch_format="pyarrow").to_pandas()["k"].to_numpy(np.int64)
    )
    if ids.nbytes > broadcast_cap_bytes:
        raise ValueError(
            f"near-dup endpoint ids {ids.nbytes >> 20} MB exceed the broadcast cap; "
            "resolve sources via the bucketed-join shape at this scale"
        )
    ids_handle = ray.put(ids)

    srcs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    class KeepEndpoints:
        def __init__(self) -> None:
            self.ids = ray.get(ids_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.ids, d)
            pos_safe = np.clip(pos, 0, max(len(self.ids) - 1, 0))
            hit = (self.ids[pos_safe] == d) if len(self.ids) else np.zeros(len(d), bool)
            return batch.filter(pa.array(hit))

    kept = srcs.map_batches(KeepEndpoints, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    lookup = ray.put(dict(zip(kept["doc_id"].astype(np.int64), kept["source"].astype(object))))

    class Label:
        def __init__(self) -> None:
            self.m = ray.get(lookup)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = np.array(
                [self.m[int(x)] for x in batch.column("doc_a").to_pylist()], dtype=object
            )
            b = np.array(
                [self.m[int(x)] for x in batch.column("doc_b").to_pylist()], dtype=object
            )
            t = pa.table(
                {
                    "source_a": pa.array(np.minimum(a, b), pa.string()),
                    "source_b": pa.array(np.maximum(a, b), pa.string()),
                }
            )
            return t.group_by(["source_a", "source_b"]).aggregate([([], "count_all")])

    return tiny_final_groupby(
        pairs.map_batches(Label, batch_format="pyarrow", concurrency=(1, 4)),
        keys=["source_a", "source_b"],
        aggs=[("count_all", "sum")],
        out_names=["source_a", "source_b", "n_pairs"],
    )


# shared char-for-char with the encoding_audit SQL replay (Python re and
# DuckDB RE2 read these identically; the mojibake pattern is the literal
# U+FFFD replacement character)
ENC_MOJIBAKE_PATTERN = "�"
ENC_CTRL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
ENC_NONASCII_PATTERN = r"[^\x00-\x7f]"


def encoding_audit(sf_dir: str):
    """Corpus encoding-hygiene report: per source, how many documents
    contain a U+FFFD replacement character (mojibake -- a decode already
    went wrong upstream), a C0 control character (binary contamination),
    or ANY non-ASCII byte (charset surprise in a nominally-ASCII feed) --
    the triage that decides whether a source needs re-crawling before it
    poisons tokenizer training.

    The synthetic corpus is clean ASCII, so the audit runs over a PLANTED
    corpus (redact_pii's discipline): docs with ``doc_id % 17 == 3`` get a
    U+FFFD appended, ``% 23 == 5`` a BEL control, ``% 29 == 7`` an e-acute
    -- the same CASE arithmetic the SQL replay applies, so the kernels are
    exercised and the compare stays exact. Pure map-side (compiled
    regexes, one str.contains per class), bounded source domain, tiny
    final.

    Returns (source, n_docs, n_mojibake, n_ctrl, n_nonascii)."""
    import re

    import ray.data as rd

    from .relational import tiny_final_groupby

    moji = re.compile(ENC_MOJIBAKE_PATTERN)
    ctrl = re.compile(ENC_CTRL_PATTERN)
    nonascii = re.compile(ENC_NONASCII_PATTERN)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        t = (
            batch["text"].fillna("")
            + pd.Series(np.where(ids % 17 == 3, "�", ""), index=batch.index)
            + pd.Series(np.where(ids % 23 == 5, "\x07", ""), index=batch.index)
            + pd.Series(np.where(ids % 29 == 7, "\xe9", ""), index=batch.index)
        )
        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(object),
                "n_docs": np.ones(len(ids), np.int64),
                "n_mojibake": t.str.contains(moji).to_numpy(np.int64),
                "n_ctrl": t.str.contains(ctrl).to_numpy(np.int64),
                "n_nonascii": t.str.contains(nonascii).to_numpy(np.int64),
            }
        )
        return df.groupby("source", sort=False, as_index=False).sum()

    return tiny_final_groupby(
        docs.map_batches(partial, batch_format="pandas"),
        keys=["source"],
        aggs=[("n_docs", "sum"), ("n_mojibake", "sum"), ("n_ctrl", "sum"), ("n_nonascii", "sum")],
        out_names=["source", "n_docs", "n_mojibake", "n_ctrl", "n_nonascii"],
    )


def quality_length_corr(ds, lang_col: str = "lang", text_col: str = "text"):
    """Exact per-language signed r^2 (ppm) between document LENGTH and the
    quality score -- the "is my quality filter just a length filter"
    audit: a near-1e6 value says the two signals are redundant and the
    cheaper one suffices; near-0 says quality carries independent signal.

    The classic five-sufficient-statistics parallel correlation
    (ols_trend_by_priority's discipline): per-batch per-lang int64
    partials of (n, Sx, Sy, Sxx, Syy, Sxy) -- batch_size=16384 is the
    proven int64-partial overflow guard -- then ONE bounded final block
    folds them with PYTHON ints (exact past int64 at any corpus size) and
    scores ``sign(cov) * cov^2 // max((varx*vary)//1e6, 1)``: every
    quantity an integer, division-free until the last floor, replayed
    digit-for-digit in HUGEINT (which fits through sf1; the engine side
    has no scale limit).

    Returns (lang, n_docs, r2_signed_ppm)."""
    from .relational import tiny_final_groupby  # noqa: F401  (shape doc)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        feats = ts.quality_features(batch[text_col])
        x = feats["n_chars"].to_numpy(np.int64)
        y = feats["quality_ppm"].to_numpy(np.int64)
        df = pd.DataFrame(
            {
                "lang": batch[lang_col].to_numpy(object),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return df.groupby("lang", sort=False, as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=16384)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in batch.groupby("lang", sort=True):
            # Python-int fold: partial sums are int64-safe per batch, but
            # the corpus-wide fold may not be
            n = sum(int(v) for v in g["n"])
            sx = sum(int(v) for v in g["sx"])
            sy = sum(int(v) for v in g["sy"])
            sxx = sum(int(v) for v in g["sxx"])
            syy = sum(int(v) for v in g["syy"])
            sxy = sum(int(v) for v in g["sxy"])
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            if vx == 0 or vy == 0:
                r2 = 0
            else:
                sign = -1 if cov < 0 else 1
                r2 = sign * ((cov * cov) // max((vx * vy) // 1_000_000, 1))
            rows.append((lang, n, r2))
        return pd.DataFrame(rows, columns=["lang", "n_docs", "r2_signed_ppm"])

    return partials.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def shuffle_mix_audit(sf_dir: str, epoch: int = 0, window: int = 1 << 18):
    """Shuffle-quality audit over the engine's OWN epoch_shuffle ("measure,
    don't guess" applied to the training-order primitive): the ppm of
    ADJACENT positions sharing a source in the shuffled order, against the
    exact exchangeability expectation ``sum(c_s*(c_s-1)) / (n*(n-1))`` --
    a materially higher observed rate means the permutation is leaking
    source runs into training batches.

    Plan: epoch_shuffle's (doc_id, pos) joins source via ONE bucketed hash
    join (both sides corpus-sized); adjacency is localized by range-
    bucketing ``pos // window`` with the single boundary row duplicated
    into the previous bucket, so every (i, i+1) pair is counted exactly
    once and each bucket does one vectorized diff -- no global sort, no
    self-join. Per-source counts and the pair folds are bounded driver
    scalars; all ppm math is Python-int / HUGEINT floor division.

    Returns ONE row (n_rows, n_adjacent_same, obs_same_ppm,
    expected_same_ppm)."""
    import ray.data as rd

    from .relational import bucketed_hash_join

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    shuf = epoch_shuffle(ids, epoch=epoch)

    def typed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "pos": batch.column("pos").cast(pa.int64()),
            }
        )

    srcs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["k", "source"])

    joined = bucketed_hash_join(
        shuf.map_batches(typed, batch_format="pyarrow"),
        srcs.map_batches(rename, batch_format="pyarrow"),
        "doc_id",
        "k",
        buckets=16,
    ).select_columns(["pos", "source"])

    def emit(batch: pa.Table) -> pa.Table:
        pos = batch.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch.column("source").to_numpy(zero_copy_only=False).astype(object)
        b = pos // window
        dup = (pos % window == 0) & (pos > 0)
        return pa.table(
            {
                "b": pa.array(np.concatenate([b, b[dup] - 1]).astype(np.int32), pa.int32()),
                "pos": pa.array(np.concatenate([pos, pos[dup]]), pa.int64()),
                "source": pa.array(np.concatenate([src, src[dup]]), pa.string()),
            }
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos")
        p = g["pos"].to_numpy(np.int64)
        s = g["source"].to_numpy(object)
        consec = p[1:] == p[:-1] + 1
        same = consec & (s[1:] == s[:-1])
        return pd.DataFrame({"n_pairs": [int(consec.sum())], "n_same": [int(same.sum())]})

    folded = (
        joined.map_batches(emit, batch_format="pyarrow")
        .groupby("b")
        .map_groups(pair_counts, batch_format="pandas")
        .to_pandas()
    )
    n_pairs, n_same = int(folded["n_pairs"].sum()), int(folded["n_same"].sum())

    def src_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch.column("source")})
        return t.group_by(["source"]).aggregate([([], "count_all")])

    cs = (
        srcs.map_batches(src_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source")["count_all"]
        .sum()
    )
    n = int(cs.sum())
    if n_pairs != n - 1:
        raise AssertionError(
            f"shuffle_mix_audit: adjacency coverage broken ({n_pairs} pairs for {n} rows)"
        )
    num = sum(int(c) * (int(c) - 1) for c in cs)
    return pd.DataFrame(
        {
            "n_rows": [n],
            "n_adjacent_same": [n_same],
            "obs_same_ppm": [(n_same * 1_000_000) // max(n - 1, 1)],
            "expected_same_ppm": [(num * 1_000_000) // max(n * (n - 1), 1)],
        }
    )


def categorical_independence_chi2(sf_dir: str, col_a: str = "lang", col_b: str = "source"):
    """Chi-squared independence audit between two categorical metadata
    columns ("is language balanced across sources") -- the stratification
    check run before per-source quotas or mixture weights are trusted.
    The statistic is the exact-integer scaled form
    ``sum over ALL cells of ((N*O - R*C)^2 * 1e6) // (N*R*C)`` (empty
    cells included: their term is ``(R*C*1e6)//N`` -- floored per cell,
    deterministic, replayed digit-for-digit in HUGEINT; no float, no
    p-value table).

    ONE bounded (a, b) count exchange (tiny_final_groupby); marginals and
    the full cross product fold inside the single final block with Python
    ints. Returns ONE row (n_rows, n_a, n_b, dof, chi2_ppm)."""
    import ray.data as rd

    from .relational import tiny_final_groupby

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=[col_a, col_b])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"a": batch.column(col_a), "b": batch.column(col_b)})
        return t.group_by(["a", "b"]).aggregate([([], "count_all")])

    cells = tiny_final_groupby(
        docs.map_batches(partial, batch_format="pyarrow"),
        keys=["a", "b"],
        aggs=[("count_all", "sum")],
        out_names=["a", "b", "o"],
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        obs = {(r["a"], r["b"]): int(r["o"]) for _, r in batch.iterrows()}
        rows = batch.groupby("a")["o"].sum().to_dict()
        colsum = batch.groupby("b")["o"].sum().to_dict()
        n = sum(int(v) for v in rows.values())
        chi2 = 0
        for a, r in rows.items():
            for b, c in colsum.items():
                o = obs.get((a, b), 0)
                d = n * o - int(r) * int(c)
                chi2 += (d * d * 1_000_000) // (n * int(r) * int(c))
        return pd.DataFrame(
            {
                "n_rows": [n],
                "n_a": [len(rows)],
                "n_b": [len(colsum)],
                "dof": [(len(rows) - 1) * (len(colsum) - 1)],
                "chi2_ppm": [chi2],
            }
        )

    return cells.repartition(1).map_batches(finalize, batch_format="pandas", batch_size=None)


def normalized_dedup_stats(ds, text_col: str = "text"):
    """C4-style NEAR-exact dedup profile: how much of the corpus collapses
    once text is normalized (lowercase, ASCII punctuation stripped,
    whitespace runs collapsed, trimmed) -- catches the reposts that raw
    exact dedup misses ("Hello, World!" vs "hello world") and sizes the
    gap between exact and fuzzy dedup before the pair family is spent.

    Same hash-only shuffle as dedup_stats: each batch normalizes (three
    compiled regex passes, patterns shared char-for-char with the RE2
    replay), hashes the normal form to md5-u64 and ships (hash, count)
    partials; per-bucket folds count distincts / dup rows / dup groups;
    one tiny single-row final. Text never shuffles.

    Returns ONE row (n_docs, n_distinct, n_dup_docs, n_dup_groups)."""
    import re

    from ..functions.dedup import md5_u64
    from .relational import bucketed_grouped_sum

    punct = re.compile(ts.PUNCT_PATTERN)
    ws = re.compile(ts.WS_PATTERN)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = (
            batch[text_col]
            .fillna("")
            .str.lower()
            .str.replace(punct, "", regex=True)
            .str.replace(ws, " ", regex=True)
            .str.strip()
        )
        h = np.fromiter(
            (md5_u64(x.encode("utf-8")) for x in t), dtype=np.uint64, count=len(t)
        ).astype(np.int64)
        u, c = np.unique(h, return_counts=True)
        return pd.DataFrame({"h": u, "c": c.astype(np.int64)})

    groups = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "h", "c"
    )

    def bucket_fold(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["c"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_docs": [int(c.sum())],
                "n_distinct": [len(c)],
                "n_dup_docs": [int(c[c >= 2].sum())],
                "n_dup_groups": [int((c >= 2).sum())],
            }
        )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sum().to_frame().T.astype("int64")

    return (
        groups.map_batches(bucket_fold, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def source_vocab_overlap(sf_dir: str, buckets: int = 64):
    """Cross-source LEXICAL similarity matrix: for every source pair, the
    count of shared distinct ``[a-z0-9]+`` tokens and the exact vocabulary
    Jaccard in ppm -- the cheap "are these feeds the same register/domain"
    signal that complements cross_source_dup_matrix (document-level) at
    the vocabulary level.

    Plan: each batch collapses to DISTINCT (token-md5, source) rows --
    each distinct token hashed ONCE then gathered (the batch-dedupe md5
    discipline); the projection is materialized for its two consumers.
    Intersections reuse cooccurrence_counts' one-exchange size-class triu
    kernel verbatim (categories = sources, ids = token hashes); per-source
    vocabulary sizes fold off the same projection through a second
    hash-disjoint exchange. The final join is sources^2-bounded driver
    work. Returns (source_a, source_b, n_common, jaccard_ppm)."""
    import re

    import ray.data as rd

    from ..functions.dedup import md5_u64
    from .relational import cooccurrence_counts, hash_bucket_column

    tok_re = re.compile(r"[a-z0-9]+")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.lower().str.findall(tok_re)
        ex = toks.reset_index(drop=True).explode().dropna()
        src = batch["source"].reset_index(drop=True).to_numpy(object)[
            ex.index.to_numpy(np.int64)
        ]
        df = pd.DataFrame({"tok": ex.to_numpy(object), "source": src}).drop_duplicates()
        uniq, inv = np.unique(df["tok"].to_numpy(object), return_inverse=True)
        hashes = np.fromiter(
            (md5_u64(t.encode("utf-8")) for t in uniq), dtype=np.uint64, count=len(uniq)
        ).astype(np.int64)
        return pd.DataFrame({"h": hashes[inv], "source": df["source"].to_numpy(object)})

    proj = docs.map_batches(partial, batch_format="pandas").materialize()
    inter = cooccurrence_counts(proj, id_col="h", cat_col="source", buckets=buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "h", buckets)

    def bucket_sizes(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["h", "source"]].drop_duplicates()
        vc = d["source"].value_counts()
        return pd.DataFrame({"source": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)})

    sizes = (
        proj.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_sizes, batch_format="pandas")
        .to_pandas()
        .groupby("source")["n"]
        .sum()
        .to_dict()
    )

    pairs = inter.to_pandas()
    na = pairs["type_a"].map(sizes).astype("int64")
    nb = pairs["type_b"].map(sizes).astype("int64")
    common = pairs["n_ids"].astype("int64")
    return pd.DataFrame(
        {
            "source_a": pairs["type_a"],
            "source_b": pairs["type_b"],
            "n_common": common,
            "jaccard_ppm": [
                (int(c) * 1_000_000) // (int(a) + int(b) - int(c))
                for c, a, b in zip(common, na, nb)
            ],
        }
    )


def token_simpson_by_lang(ds, lang_col: str = "lang", text_col: str = "text",
                          buckets: int = 64):
    """Gini-Simpson token diversity per language: ``1 - sum_t (c_t/N)^2``
    in exact integer ppm -- the float-free diversity statistic (Shannon
    entropy needs a log; Simpson does not) used to flag degenerate corpus
    slices whose token mass collapses onto a few types (boilerplate farms,
    template spam) before they reach training.

    Plan: per-batch (lang, token) value_counts partials -> ONE bucketed
    token-domain exchange (hash-bucket on token; partial rows only, never
    text) -> per bucket the EXACT global (lang, token) counts fold to
    per-lang (sum c, sum c^2, n_distinct) -- c^2 of a 10^12-count token
    overflows int64, so the bucket emits sum(c) / sum(c^2) as DECIMAL
    STRINGS and the single final block folds them with Python ints
    (exact at any corpus size; buckets x langs rows reach that block).

    Returns (lang, n_tokens, n_distinct, simpson_ppm) where simpson_ppm =
    1e6 - (sum c^2 * 1e6) // N^2, floor-div -- replayed digit-for-digit
    by the HUGEINT oracle. Langs producing zero tokens are absent."""
    import re

    from .relational import hash_bucket_column

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        s = toks.explode().dropna()
        if len(s) == 0:
            return pd.DataFrame({lang_col: pd.Series([], dtype=str),
                                 "token": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        g = pd.DataFrame({
            lang_col: batch[lang_col].reindex(s.index).to_numpy(),
            "token": s.to_numpy(),
        })
        p = g.groupby([lang_col, "token"], sort=False).size().reset_index(name="n")
        p["n"] = p["n"].astype(np.int64)
        return p

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "token", buckets)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        # exact global counts per (lang, token) inside this bucket, then the
        # per-lang ssq partial as decimal strings (int64-unsafe past ~3e9)
        c = g.groupby([lang_col, "token"], sort=False)["n"].sum()
        out = []
        for lang, sub in c.groupby(level=0, sort=False):
            vals = [int(v) for v in sub.to_numpy()]
            out.append((lang, str(sum(vals)), str(sum(v * v for v in vals)),
                        len(vals)))
        return pd.DataFrame(out, columns=[lang_col, "n_str", "ssq_str", "nd"])

    folded = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas")
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, sub in batch.groupby(lang_col, sort=False):
            n = sum(int(s) for s in sub["n_str"])
            ssq = sum(int(s) for s in sub["ssq_str"])
            nd = int(sub["nd"].sum())
            rows.append((lang, n, nd, 1_000_000 - (ssq * 1_000_000) // (n * n)))
        return pd.DataFrame(rows, columns=[lang_col, "n_tokens", "n_distinct",
                                           "simpson_ppm"]).astype(
            {"n_tokens": np.int64, "n_distinct": np.int64, "simpson_ppm": np.int64})

    return folded.repartition(1).map_batches(finalize, batch_format="pandas",
                                             batch_size=None)


def doc_surprisal_topk(ds, k: int = 50, id_col: str = "doc_id",
                       lang_col: str = "lang", text_col: str = "text"):
    """Integer-bit unigram surprisal scoring (the CCNet 'how unlike the
    reference distribution is this document' quality signal, with the
    corpus itself as the LM): each token contributes
    ``floor(log2(N / c(token)))`` WHOLE BITS -- computed exactly as
    ``bit_length(N // c) - 1`` (floor-div monotonicity makes the two
    equal for every c <= N), so no float log exists on either side and
    the DuckDB oracle replays it digit-for-digit via ``length(bin(N//c))-1``.
    High mean-bits docs are rare-token-dense: misspelling farms, foreign
    text mislabeled by lang-id, or genuinely novel content -- the review
    queue near-dup filtering never surfaces.

    Plan: pass 1 builds global token counts (per-batch value_counts ->
    ``bucketed_grouped_sum`` on the token domain); the (token, bits)
    table is a deliberate bounded driver collect broadcast via
    ``ray.put`` as a SORTED numpy pair (searchsorted probe, zero Python
    dict in the hot path) -- same license as the join broadcasts; past a
    vocabulary-size cap the honest shape is a bucketed token-domain join
    of pass-2 partials against the counts (bm25_topk documents the same
    trade). Pass 2 re-reads the pruned source (storage-over-compute, see
    bm25 scale note), scores each doc vectorized (explode -> searchsorted
    -> per-doc sum), keeps a per-batch partial top-k, and ONE tiny final
    merge resolves (mean_millibits DESC, doc_id ASC) LIMIT k.

    Returns (doc_id, lang, n_tokens, total_bits, mean_millibits) for the
    k most surprising docs; zero-token docs are excluded (no tokens, no
    surprisal)."""
    import re

    import ray

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(vocab_partial, batch_format="pandas"), "token", "n"
    ).to_pandas()
    if len(counts) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema([
            (id_col, pa.int64()), (lang_col, pa.string()),
            ("n_tokens", pa.int64()), ("total_bits", pa.int64()),
            ("mean_millibits", pa.int64())]).empty_table())
    counts = counts.sort_values("token").reset_index(drop=True)
    n_total = int(counts["n"].sum())
    bits = np.array([(n_total // int(c)).bit_length() - 1
                     for c in counts["n"]], dtype=np.int64)
    handle = ray.put({"tokens": counts["token"].to_numpy(object), "bits": bits})

    class Score:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
            s = toks.explode().dropna()
            if len(s) == 0:
                return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                     lang_col: pd.Series([], dtype=str),
                                     "n_tokens": pd.Series([], dtype=np.int64),
                                     "total_bits": pd.Series([], dtype=np.int64),
                                     "mean_millibits": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(self.lk["tokens"], s.to_numpy(object))
            tb = pd.Series(self.lk["bits"][pos], index=s.index)
            per_doc = tb.groupby(level=0).agg(["size", "sum"])
            docs = per_doc.index
            out = pd.DataFrame({
                id_col: batch[id_col].reindex(docs).to_numpy(),
                lang_col: batch[lang_col].reindex(docs).to_numpy(),
                "n_tokens": per_doc["size"].to_numpy(np.int64),
                "total_bits": per_doc["sum"].to_numpy(np.int64),
            })
            out["mean_millibits"] = (out["total_bits"] * 1000) // out["n_tokens"]
            return out.sort_values(["mean_millibits", id_col],
                                   ascending=[False, True]).head(k)

    def final_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["mean_millibits", id_col],
                                 ascending=[False, True]).head(k).reset_index(drop=True)

    return (
        ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))
        .repartition(1)
        .map_batches(final_topk, batch_format="pandas", batch_size=None)
    )


def sentence_stats_by_lang(ds, lang_col: str = "lang", text_col: str = "text"):
    """Gopher-style sentence-shape quality profile per language: mean
    words per sentence (milli, floor-div) plus the raw sums -- the rule
    family that rejects docs whose 'sentences' are navigation fragments
    (2-word lines) or unpunctuated walls (300-word 'sentences').

    Sentences are counted as runs of terminal punctuation ``[.!?]+``
    (non-overlapping regex count, identical to the RE2 replay's
    regexp_extract_all length); words are the shared '[a-z0-9]+' lowered
    tokenization. One vectorized ``str.count`` pass per batch, per-lang
    int partials, tiny bounded final merge -- exchange is a handful of
    rows per block. Langs with zero sentences report 0 milli (guarded
    floor-div on both sides).

    Returns (lang, n_docs, n_sentences, n_words,
    mean_words_per_sentence_milli)."""
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[text_col].fillna("")
        ns = txt.str.count(r"[.!?]+").to_numpy(np.int64)
        nw = txt.str.lower().str.count(r"[a-z0-9]+").to_numpy(np.int64)
        g = pd.DataFrame({lang_col: batch[lang_col], "ns": ns, "nw": nw})
        p = g.groupby(lang_col, sort=False).agg(
            n_docs=("ns", "size"), n_sentences=("ns", "sum"), n_words=("nw", "sum")
        ).reset_index()
        return p.astype({"n_docs": np.int64, "n_sentences": np.int64,
                         "n_words": np.int64})

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [lang_col],
        [("n_docs", "sum"), ("n_sentences", "sum"), ("n_words", "sum")],
        [lang_col, "n_docs", "n_sentences", "n_words"],
    )

    def add_milli(batch: pa.Table) -> pa.Table:
        ns = batch.column("n_sentences").to_pylist()
        nw = batch.column("n_words").to_pylist()
        milli = pa.array(
            [int(w) * 1000 // int(s) if int(s) > 0 else 0 for w, s in zip(nw, ns)],
            pa.int64(),
        )
        return batch.append_column("mean_words_per_sentence_milli", milli)

    return folded.map_batches(add_milli, batch_format="pyarrow", batch_size=None)


def melt(ds, id_cols: list[str], value_cols: list[str], var_name: str = "variable",
         value_name: str = "value", strip_prefix: str = ""):
    """Wide-to-long UNPIVOT (the reshape dual of ``pivot_counts``): each
    input row yields len(value_cols) output rows tagged with the source
    column name (``strip_prefix`` removed -- 'n_click' -> 'click'). Pure
    map-side numpy repeat/tile per batch, zero exchange: melting commutes
    with partitioning, so the long layout lands exactly as distributed as
    the wide one was. Used to hand a fixed-vocabulary pivot back to
    long-format consumers without a second shuffle."""
    names = [c[len(strip_prefix):] if c.startswith(strip_prefix) else c
             for c in value_cols]

    def unpivot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(value_cols)
        cols = {}
        for c in id_cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.repeat(v, k))
        cols[var_name] = pa.array(np.tile(np.asarray(names, object), n),
                                  pa.string())
        vals = np.stack(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in value_cols],
            axis=1,
        ).reshape(-1)
        cols[value_name] = pa.array(vals)
        return pa.table(cols)

    return ds.map_batches(unpivot, batch_format="pyarrow")


def benford_first_digit(ds, value_col: str = "o_totalprice"):
    """Benford first-significant-digit audit over exact integer cents --
    the fraud/synthetic-data forensics profile (fabricated numbers rarely
    follow Benford; the DET corpus's uniform prices measurably don't
    either, which is exactly what the audit shows). Digit extraction is
    vectorized integer floor-division (<= 10 halving passes, no string or
    float); per-batch digit counts fold through the 9-row bounded final,
    where share_ppm = n * 1e6 // total with Python ints. The oracle
    replays the digit via substr(CAST(cents AS VARCHAR), 1, 1) -- equal to
    the division route for every positive integer."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        p = batch.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        while True:
            big = cents >= 10
            if not big.any():
                break
            cents = np.where(big, cents // 10, cents)
        digit, n = np.unique(cents, return_counts=True)
        return pa.table({"digit": pa.array(digit, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digit"], [("n", "sum")], ["digit", "n"],
    )

    def add_share(batch: pa.Table) -> pa.Table:
        ns = [int(v) for v in batch.column("n").to_pylist()]
        total = sum(ns)
        share = pa.array([v * 1_000_000 // total for v in ns], pa.int64())
        return batch.append_column("share_ppm", share)

    return folded.map_batches(add_share, batch_format="pyarrow", batch_size=None)


def zipf_bits_audit(ds, max_rank: int = 4096, text_col: str = "text"):
    """Zipf rank-frequency shape audit in pure integers: the token
    frequency's floor(log2) at power-of-two ranks 1, 2, 4, ..., max_rank.
    Under Zipf's law freq(r) ~ C / r^s the bit-length drops ~s bits per
    octave of rank, so ``drop_bits`` IS the local Zipf slope measured with
    no float log on either side (same bit_length == floor(log2) identity
    as doc_surprisal_topk, monotonicity proof there). Complements
    vocab_growth (Heaps: vocabulary GROWTH) and token_diversity_by_lang
    (Simpson: CONCENTRATION) with the rank-frequency CURVE SHAPE -- the
    classic natural-language-vs-degenerate-text fingerprint (template spam
    goes flat, random noise goes steep-then-flat).

    Plan: per-batch value_counts over the shared '[a-z0-9]+' lowered
    tokenization -> bucketed_grouped_sum (the exchange moves (token, n)
    partials, never text) -> per-block partial top-max_rank -> ONE tiny
    merge block ranks and keeps the <= log2(max_rank)+1 power-of-two rows.
    max_rank caps every block at max_rank rows however large the
    vocabulary grows -- the same partial-top-k license as top_tokens.
    Ranks past the vocabulary size are absent (exactly what the oracle's
    row_number replay yields).

    Returns (rank, freq, freq_bits, drop_bits); drop_bits is 0 at rank 1,
    else freq_bits(previous octave) - freq_bits(this rank).
    Reference analogue: SURVEY.md 2.10 corpus-quality family."""
    import re

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "token", "n"
    )

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "token"], ascending=[False, True]).head(max_rank)

    def octaves(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.sort_values(["n", "token"], ascending=[False, True]).head(max_rank)
        freqs = top["n"].tolist()
        ranks, freq, bits, drop = [], [], [], []
        r, prev = 1, None
        while r <= len(freqs) and r <= max_rank:
            f = int(freqs[r - 1])
            b = f.bit_length() - 1
            ranks.append(r)
            freq.append(f)
            bits.append(b)
            drop.append(0 if prev is None else prev - b)
            prev = b
            r *= 2
        return pd.DataFrame(
            {
                "rank": pd.Series(ranks, dtype="int64"),
                "freq": pd.Series(freq, dtype="int64"),
                "freq_bits": pd.Series(bits, dtype="int64"),
                "drop_bits": pd.Series(drop, dtype="int64"),
            }
        )

    return (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(octaves, batch_format="pandas", batch_size=None)
    )


def hapax_rate_by_source(ds, source_col: str = "source", text_col: str = "text"):
    """Hapax-legomena audit per provenance source: of the distinct tokens a
    source contributes, how many occur EXACTLY ONCE within that source
    (hapax), as ppm of the source's vocabulary. High hapax ppm flags OCR
    noise / mojibake / random-string pollution (every error mints a fresh
    token); suspiciously LOW hapax flags template/boilerplate corpora.
    The classic corpus-linguistics health metric, complementary to
    vocab_growth (Heaps curve) and encoding_audit (character-class triage).

    Plan: per-batch (source, token) value_counts on a single
    '\\x1f'-joined composite key -> bucketed_grouped_sum (the exchange
    moves (key, n) partials, never text; \\x1f cannot appear in either
    part: sources are identifiers, tokens are [a-z0-9]+) -> per-batch
    (source, vocab, hapax) partials over the count table ->
    tiny_final_groupby on the bounded source domain; ppm folds in the
    final block with Python ints (hapax * 10^6 needs headroom past int64
    only beyond 9*10^12 distinct tokens/source -- Python ints regardless).

    Returns (source, vocab, hapax, hapax_ppm).
    Reference analogue: SURVEY.md 2.10 corpus-quality family."""
    import re

    from .relational import bucketed_grouped_sum, tiny_final_groupby

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[[source_col]].copy()
        df["tok"] = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        ex = df.explode("tok").dropna(subset=["tok"])
        key = ex[source_col].astype(str) + "\x1f" + ex["tok"].astype(str)
        vc = key.value_counts()
        return pd.DataFrame({"key": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "key", "n"
    )

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["key"].str.partition("\x1f")[0]
        g = (
            pd.DataFrame({"source": src, "one": (batch["n"] == 1).astype("int64")})
            .groupby("source", sort=False)["one"]
            .agg(["count", "sum"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "source": g["source"].astype(str),
                "vocab": g["count"].astype("int64"),
                "hapax": g["sum"].astype("int64"),
            }
        )

    folded = tiny_final_groupby(
        counts.map_batches(vocab_partial, batch_format="pandas"),
        ["source"],
        [("vocab", "sum"), ("hapax", "sum")],
        ["source", "vocab", "hapax"],
    )

    def add_ppm(batch: pa.Table) -> pa.Table:
        v = [int(x) for x in batch.column("vocab").to_pylist()]
        h = [int(x) for x in batch.column("hapax").to_pylist()]
        ppm = pa.array([hh * 1_000_000 // vv for hh, vv in zip(h, v)], pa.int64())
        return batch.append_column("hapax_ppm", ppm)

    return folded.map_batches(add_ppm, batch_format="pyarrow", batch_size=None)


def source_tv_distance(ds, source_col: str = "source", text_col: str = "text"):
    """Pairwise total-variation distance between per-source unigram token
    distributions, in integer ppm: tv(a, b) = sum_t |p_a(t) - p_b(t)| / 2
    with p(t) = count * 10^6 // total (floor-div ppm on both sides).
    Provenance-similarity audit: near-zero tv between two sources flags a
    SHARED GENERATOR (cross_source_dups finds shared documents; this
    fires even when no document is shared -- e.g. two scrapes of the same
    template farm), near-10^6 flags disjoint vocabularies.

    Plan (everything after pass 1 is vocabulary-sized, never corpus-sized):

    1. (source, token, n) counts via the composite-key string-bucket
       exchange (identical shape to hapax_rate_by_source), materialized
       once -- two consumers (totals + ppm), the bm25 projection license.
    2. Per-source token totals: a tiny bounded aggregate, driver-collected
       (bounded source domain, the broadcast-side license) and
       closure-broadcast along with the sorted source list.
    3. ppm per (source, token) row -- guarded kernel: numpy int64 while
       n * 10^6 provably fits (n < 2^43), Python ints past that (a 31-token
       template vocabulary at 10^12 docs concentrates ~10^14 counts per
       token, overflowing the int64 product).
    4. Token-bucketed exchange; each bucket pivots to a tokens x sources
       matrix (absent source in a bucket = 0 column via reindex) and folds
       |ppm_i - ppm_j| over all source pairs vectorized, 4096-token chunks
       capping the T x S x S broadcast at ~13 MB for 20 sources.
    5. tiny_final_groupby over the bounded pair domain; // 2 at the final.

    Returns (source_a, source_b, tv_ppm), source_a < source_b.
    Reference analogue: SURVEY.md 2.10 corpus-quality family."""
    import re

    from .relational import bucketed_grouped_sum, hash_bucket_column, tiny_final_groupby

    tok_re = re.compile(r"[a-z0-9]+")

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[[source_col]].copy()
        df["tok"] = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        ex = df.explode("tok").dropna(subset=["tok"])
        key = ex[source_col].astype(str) + "\x1f" + ex["tok"].astype(str)
        vc = key.value_counts()
        return pd.DataFrame({"key": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(count_partial, batch_format="pandas"), "key", "n"
    ).materialize()

    def total_partial(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["key"].str.partition("\x1f")[0]
        g = pd.DataFrame({"source": src, "n": batch["n"]}).groupby(
            "source", sort=False
        )["n"].sum().reset_index()
        return pd.DataFrame({"source": g["source"].astype(str), "n": g["n"].astype("int64")})

    totals_tbl = tiny_final_groupby(
        counts.map_batches(total_partial, batch_format="pandas"),
        ["source"], [("n", "sum")], ["source", "total"],
    ).to_pandas()  # bounded source domain -- deliberate driver collect
    totals = dict(zip(totals_tbl["source"], (int(v) for v in totals_tbl["total"])))
    sources = sorted(totals)

    def to_ppm(batch: pd.DataFrame) -> pd.DataFrame:
        parts = batch["key"].str.partition("\x1f")
        src, tok = parts[0], parts[2]
        n = batch["n"].to_numpy(np.int64)
        tot = src.map(totals).to_numpy(np.int64)
        if len(n) and int(n.max()) < (1 << 43):
            ppm = n * np.int64(1_000_000) // tot
        else:  # exact past the int64 product range
            ppm = np.fromiter(
                (int(a) * 1_000_000 // int(b) for a, b in zip(n, tot)),
                dtype=np.int64, count=len(n),
            )
        return pd.DataFrame({"token": tok.astype(str), "source": src.astype(str),
                             "ppm": ppm.astype(np.int64)})

    ppm_rows = counts.map_batches(to_ppm, batch_format="pandas")

    n_src = len(sources)
    iu = np.triu_indices(n_src, k=1)

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        mat = (
            g.pivot_table(index="token", columns="source", values="ppm",
                          aggfunc="sum", fill_value=0)
            .reindex(columns=sources, fill_value=0)
            .to_numpy(np.int64)
        )
        acc = np.zeros((n_src, n_src), np.int64)
        for lo in range(0, mat.shape[0], 4096):
            m = mat[lo:lo + 4096]
            acc += np.abs(m[:, :, None] - m[:, None, :]).sum(axis=0)
        return pd.DataFrame({
            "source_a": [sources[i] for i in iu[0]],
            "source_b": [sources[j] for j in iu[1]],
            "l1": acc[iu].astype(np.int64),
        })

    buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "token", buckets)

    partials = (
        ppm_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: pair_fold(g.drop(columns="__bucket")), batch_format="pandas")
    )

    folded = tiny_final_groupby(
        partials, ["source_a", "source_b"], [("l1", "sum")],
        ["source_a", "source_b", "l1"],
    )

    def halve(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # integer divide: l1 >= 0, so truncation == floor, matching SQL //2
        tv = pc.divide(batch.column("l1"), pa.scalar(2, pa.int64()))
        return pa.table({
            "source_a": batch.column("source_a"),
            "source_b": batch.column("source_b"),
            "tv_ppm": pc.cast(tv, pa.int64()),
        })

    return folded.map_batches(halve, batch_format="pyarrow", batch_size=None)


def token_burstiness(ds, k: int = 20, text_col: str = "text"):
    """Church-Gale burstiness profile of the top-k corpus tokens: corpus
    frequency cf, document frequency df, and per_doc_milli =
    cf * 1000 // df (mean occurrences per CONTAINING document, milli).
    Bursty tokens (high per-doc rate) are topical/content words that
    concentrate where they appear; flat tokens are function words. On a
    training corpus the profile separates template spam (every token
    bursty, repeated inside each doc) from natural text -- the
    within-doc complement of dup_shingle_rate's cross-doc signal.

    Plan: ONE pass emits per-batch (token, cf, df) partials -- cf from a
    flat explode value_counts, df from the explode deduplicated on
    (row, token) first (vectorized drop_duplicates, no per-row set
    loop) -- then one string-bucket exchange sums BOTH partial columns
    per bucket (inline variant of bucketed_grouped_sum for two sum
    columns), per-block partial top-k by (cf DESC, token ASC), one tiny
    merge block adds the milli ratio with Python ints (cf * 1000
    overflows int64 only past 9*10^15 occurrences; the partial sums
    stay int64-safe far beyond 100 TB).

    df is exact because each document is one row of ONE batch (documents
    are never split across batches by map_batches).

    Returns (token, cf, df, per_doc_milli), top-k by (cf DESC, token ASC).
    Reference analogue: SURVEY.md 2.10 corpus-quality family."""
    import re

    from .relational import hash_bucket_column

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        ex = toks.explode().dropna()
        cf = ex.value_counts()
        per_doc = ex.reset_index().drop_duplicates()
        df_counts = per_doc[per_doc.columns[1]].value_counts()
        out = pd.DataFrame({"cf": cf, "df": df_counts.reindex(cf.index)})
        return pd.DataFrame({
            "token": out.index.astype(str),
            "cf": out["cf"].to_numpy(np.int64),
            "df": out["df"].to_numpy(np.int64),
        })

    buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "token", buckets)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False)[["cf", "df"]].sum().reset_index()

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: bucket_sum(g.drop(columns="__bucket")), batch_format="pandas")
    )

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["cf", "token"], ascending=[False, True]).head(k)

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        top = batch.sort_values(["cf", "token"], ascending=[False, True]).head(k)
        milli = [int(c) * 1000 // int(d) for c, d in zip(top["cf"], top["df"])]
        return pd.DataFrame({
            "token": top["token"].astype(str).to_numpy(),
            "cf": top["cf"].to_numpy(np.int64),
            "df": top["df"].to_numpy(np.int64),
            "per_doc_milli": pd.Series(milli, dtype="int64").to_numpy(),
        })

    return (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def graph_reciprocity(ds, id_col: str = "doc_id"):
    """Edge reciprocity of the md5-derived citation graph (shared with
    pagerank_top / triangle_count / bfs_levels via derived_link_edges):
    of the DISTINCT directed edges, what ppm has its reverse edge also
    present. The standard directed-graph structural audit after the
    degree histogram -- a crawl graph with near-zero reciprocity is
    tree/feed-like, high reciprocity is social/forum-like, and a sudden
    shift flags a changed link extractor.

    Plan (ONE exchange): edges -> map to the unordered pair (u=min,
    v=max, dir) -> hash-bucket on u (both directions of a pair share u;
    pairs-per-u is bounded by max degree, so buckets stay flat) -> each
    bucket drop_duplicates (fuses the DISTINCT with the match) and
    groups by (u, v): a pair with both dirs present contributes 2
    reciprocal directed edges -> (total, reciprocal) partials ->
    tiny_final_groupby + Python-int ppm.

    Returns one row (directed_edges, reciprocal_edges, reciprocity_ppm).
    Reference analogue: SURVEY.md 2.13 graph family."""
    from .relational import hash_bucket_column

    n = ds.count()
    edges = derived_link_edges(ds, n, id_col=id_col)

    def to_pairs(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.minimum(src, dst)
        v = np.maximum(src, dst)
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "dir": pa.array((src < dst).astype(np.int8), pa.int8()),
        })

    buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "u", buckets)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns="__bucket").drop_duplicates()
        ndir = d.groupby(["u", "v"], sort=False)["dir"].nunique()
        total = int(ndir.sum())  # distinct directed edges in this bucket
        recip = int((ndir == 2).sum()) * 2
        return pd.DataFrame({"total": pd.Series([total], dtype="int64"),
                             "recip": pd.Series([recip], dtype="int64")})

    partials = (
        edges.map_batches(to_pairs, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        total = sum(int(x) for x in batch.column("total").to_pylist())
        recip = sum(int(x) for x in batch.column("recip").to_pylist())
        ppm = recip * 1_000_000 // total if total else 0
        return pa.table({
            "directed_edges": pa.array([total], pa.int64()),
            "reciprocal_edges": pa.array([recip], pa.int64()),
            "reciprocity_ppm": pa.array([ppm], pa.int64()),
        })

    return partials.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=None)


def dup_spans(ds, id_col: str = "doc_id", text_col: str = "text", buckets: int | None = None):
    """Per-DOCUMENT duplicated-SPAN coverage: the ppm of a doc's token
    POSITIONS covered by at least one word-3-shingle that also appears in
    another document -- the positional complement of
    ``doc_boilerplate_score``. Boilerplate counts DISTINCT shared shingles;
    a substring-dedup gate (Lee et al.'s ExactSubstr) cares how much of the
    token STREAM those shingles blanket: ten shared shingles tiling one
    30-token footer score very differently from ten scattered ones.

    Plan (TWO bounded exchanges, never text):

    1. the shared tokenize/shingle/md5-u64 kernel (``shingle_hashes_nw`` --
       ONE tokenization pass yields both the ordered positional hash array
       and nw), emitted as (h, doc_id, pos, nw) long rows plus ONE
       marker row per doc (pos=0, h=md5 of a doc-salted tag: a singleton
       group that carries nw through so zero-dup docs still fold out),
       hash-bucketed on h;
    2. per h-bucket, keep positions whose shingle lands in >= 2 DISTINCT
       docs (plus markers) -- the only rows that move again;
    3. ONE doc_id-bucketed fold unions the [pos, pos+L) intervals
       (L = 3, or nw for the <3-word whole-text shingle) with a sorted
       min(gap, L) sweep and computes the exact int64 ppm.

    Same 2^-64-per-pair hash-collision caveat as the dup_shingle family
    (markers included); the SQL replay groups by the shingle string and
    expands spans with generate_series, equality-identical at test scale.

    Returns (doc_id, nw, covered, dup_span_ppm), one row per doc with at
    least one token (whitespace-only docs have no positions to cover)."""
    from ..functions.dedup import md5_u64, shingle_hashes_nw
    from .relational import derive_buckets, hash_bucket_column

    n_docs = ds.count()
    if buckets is None:
        buckets = derive_buckets(n_docs, rows_per_bucket=50_000)
    doc_buckets = derive_buckets(n_docs, rows_per_bucket=500_000)

    def long_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        memo: dict[str, int] = {}
        hs, ps, dids, nws = [], [], [], []
        for did, t in zip(ids, texts):
            h, nw = shingle_hashes_nw(t or "", 3, memo)
            if nw == 0:
                continue
            n = len(h)
            hs.append(h)
            ps.append(np.arange(1, n + 1, dtype=np.int64))
            hs.append(np.array([md5_u64(b"\x00dup_spans:%d" % did)], np.uint64))
            ps.append(np.zeros(1, np.int64))
            dids.append(np.full(n + 1, did, np.int64))
            nws.append(np.full(n + 1, nw, np.int64))
        out = pa.table(
            {
                "h": pa.array(
                    np.concatenate(hs) if hs else np.empty(0, np.uint64), pa.uint64()
                ),
                "doc_id": pa.array(
                    np.concatenate(dids) if dids else np.empty(0, np.int64), pa.int64()
                ),
                "pos": pa.array(
                    np.concatenate(ps) if ps else np.empty(0, np.int64), pa.int64()
                ),
                "nw": pa.array(
                    np.concatenate(nws) if nws else np.empty(0, np.int64), pa.int64()
                ),
            }
        )
        return hash_bucket_column(out, "h", buckets)

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h", sort=False)["doc_id"].transform("nunique")
        keep = (nd.to_numpy(np.int64) >= 2) | (g["pos"].to_numpy(np.int64) == 0)
        out = g.loc[keep]
        t = pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
                "pos": pa.array(out["pos"].to_numpy(np.int64), pa.int64()),
                "nw": pa.array(out["nw"].to_numpy(np.int64), pa.int64()),
            }
        )
        return hash_bucket_column(t, "doc_id", doc_buckets, name="__dbucket").to_pandas()

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        pos_all = g["pos"].to_numpy(np.int64)
        docs = g.loc[pos_all == 0, ["doc_id", "nw"]].drop_duplicates("doc_id")
        d = g.loc[pos_all > 0, ["doc_id", "pos", "nw"]]
        did_out = docs["doc_id"].to_numpy(np.int64)
        nw_out = docs["nw"].to_numpy(np.int64)
        covered = np.zeros(len(docs), np.int64)
        if len(d):
            d = d.sort_values(["doc_id", "pos"]).drop_duplicates(["doc_id", "pos"])
            doc = d["doc_id"].to_numpy(np.int64)
            pos = d["pos"].to_numpy(np.int64)
            span = np.where(d["nw"].to_numpy(np.int64) >= 3, 3, d["nw"].to_numpy(np.int64))
            last = np.ones(len(d), bool)
            last[:-1] = doc[1:] != doc[:-1]
            gap = np.empty(len(d), np.int64)
            gap[-1] = 0  # masked: last rows take the full span below
            gap[:-1] = pos[1:] - pos[:-1]
            contrib = np.where(last, span, np.minimum(gap, span))
            cov = (
                pd.DataFrame({"doc_id": doc, "c": contrib})
                .groupby("doc_id", sort=False)["c"]
                .sum()
            )
            covered = (
                docs["doc_id"].map(cov).fillna(0).to_numpy(np.float64).astype(np.int64)
            )
        return pd.DataFrame(
            {
                "doc_id": did_out,
                "nw": nw_out,
                "covered": covered,
                "dup_span_ppm": covered * 1_000_000 // nw_out,
            }
        )

    return (
        ds.map_batches(long_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_partials, batch_format="pandas")
        .groupby("__dbucket")
        .map_groups(fold_doc, batch_format="pandas")
    )


def ks_priority_drift(ds, group_col: str = "o_orderpriority", value_col: str = "o_totalprice"):
    """Exact pairwise two-sample Kolmogorov-Smirnov distance between the
    order-value distributions of each priority class -- the
    distribution-DRIFT audit (did one slice's value distribution shift?)
    that complements source_tv_distance's categorical TV: KS is the sup-norm
    gap between EMPIRICAL CDFs of a numeric column, the standard two-sample
    drift test.

    Exactness without floats: at any value v, ``|F_a(v) - F_b(v)| =
    |C_a(v)*n_b - C_b(v)*n_a| / (n_a*n_b)`` with integer cumulative counts
    C; the max over v is attained at an OBSERVED value, so the sup over a
    continuum reduces to a max over the distinct-cents grid.
    ``ks_ppm = max_dev * 1e6 // (n_a*n_b)``.

    Distributed ECDF without a global sort: cents are RANGE-bucketed by a
    fixed width (ordering-preserving, unlike hash buckets), per-bucket
    (g, c, n) partial counts fold into the compressed distinct-value
    support, ONE tiny per-(bucket, g) total table comes to the driver to
    compute each bucket's CARRY-IN (counts below it) which is closure-
    broadcast back, and each bucket then scans its own sorted slice of the
    grid independently -- a two-pass distributed prefix sum. The folded
    support is materialized once (it is the compressed ECDF, orders of
    magnitude smaller than the input). Products C*n overflow int64 past
    n ~ 2^31 rows; the per-bucket kernel switches to Python big-int columns
    there (same guarded pattern as source_tv_distance).

    Returns one row per unordered group pair (prio_a < prio_b):
    (prio_a, prio_b, n_a, n_b, ks_ppm)."""
    from .relational import _cents

    width = 1 << 21  # ~$21k per range bucket: parallelism knob, not correctness

    def partials(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        g = batch.column(group_col).to_pylist()
        out = (
            pd.DataFrame({"g": g, "c": c})
            .groupby(["g", "c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "rbucket": pa.array(
                    out["c"].to_numpy(np.int64) // width, pa.int64()
                ),
                "g": pa.array(out["g"], pa.string()),
                "c": pa.array(out["c"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["rbucket", "g", "c"], sort=False)["n"].sum().reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    detail = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("rbucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )

    # tiny: (#range-buckets x #groups) rows -> driver computes carry-ins
    per_bucket = (
        detail.groupby(["rbucket", "g"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "bn"})
        .sort_values(["g", "rbucket"])
    )
    per_bucket["carry"] = per_bucket.groupby("g")["bn"].cumsum() - per_bucket["bn"]
    carry = {
        (int(r.rbucket), r.g): int(r.carry) for r in per_bucket.itertuples()
    }
    n_tot = {g: int(n) for g, n in per_bucket.groupby("g")["bn"].sum().items()}
    groups = sorted(n_tot)
    big = max(n_tot.values(), default=0) >= (1 << 31)

    def bucket_dev(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["rbucket"].iloc[0])
        piv = (
            g.pivot_table(index="c", columns="g", values="n", aggfunc="sum", fill_value=0)
            .reindex(columns=groups, fill_value=0)
            .sort_index()
        )
        cums = {}
        for gg in groups:
            col = piv[gg].to_numpy(np.int64).cumsum() + carry.get((rb, gg), 0)
            cums[gg] = [int(x) for x in col] if big else col
        rows = []
        for i, ga in enumerate(groups):
            for gb in groups[i + 1 :]:
                if big:
                    dev = max(
                        abs(ca * n_tot[gb] - cb * n_tot[ga])
                        for ca, cb in zip(cums[ga], cums[gb])
                    )
                else:
                    dev = int(
                        np.abs(cums[ga] * n_tot[gb] - cums[gb] * n_tot[ga]).max()
                    )
                rows.append((ga, gb, dev))
        return pd.DataFrame(rows, columns=["prio_a", "prio_b", "dev"]).astype(
            {"dev": "int64" if not big else "object"}
        )

    per_pair = detail.groupby("rbucket").map_groups(bucket_dev, batch_format="pandas")

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        best = df.groupby(["prio_a", "prio_b"], sort=True)["dev"].max().reset_index()
        ka, kb, na_, nb_, ppm = [], [], [], [], []
        for r in best.itertuples():
            a, b = n_tot[r.prio_a], n_tot[r.prio_b]
            ka.append(r.prio_a)
            kb.append(r.prio_b)
            na_.append(a)
            nb_.append(b)
            ppm.append(int(r.dev) * 1_000_000 // (a * b))
        return pa.table(
            {
                "prio_a": pa.array(ka, pa.string()),
                "prio_b": pa.array(kb, pa.string()),
                "n_a": pa.array(na_, pa.int64()),
                "n_b": pa.array(nb_, pa.int64()),
                "ks_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return per_pair.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def exact_quantiles_permille(
    ds, col: str, permilles, bins: int = 4096, pull_limit: int = 100_000
):
    """``exact_quantiles`` with the rank computed in INTEGER arithmetic:
    k = max(1, ceil(p*n/1000)) as ``(p*n + 999) // 1000``. The float
    convention (``math.ceil(q*n)``) can ulp-overshoot -- 0.1*3000 is
    300.00000000000006, whose ceil is 301 -- which makes a permille-grid
    SQL replay ambiguous; integer permilles remove the hazard on both
    sides. Returns ({p: value}, n). Same shared-stats-pass / bounded-pull
    plan as ``exact_quantiles``."""
    from ray.data.aggregate import Count, Max, Min

    permilles = list(permilles)
    stats = ds.aggregate(Min(col), Max(col), Count())
    lo, hi, n = (
        float(stats[f"min({col})"]),
        float(stats[f"max({col})"]),
        int(stats["count()"]),
    )
    if n == 0:
        raise ValueError("exact_quantiles_permille on empty dataset")
    ranks = {p: max(1, (p * n + 999) // 1000) for p in permilles}
    if hi == lo:
        return {p: lo for p in permilles}, n
    if n <= pull_limit:
        vals = np.sort(
            np.concatenate(
                [
                    b.column(col).to_numpy(zero_copy_only=False)
                    for b in ds.select_columns([col]).iter_batches(
                        batch_format="pyarrow"
                    )
                ]
                or [np.array([], dtype=np.float64)]
            )
        )
        return {p: float(vals[k - 1]) for p, k in ranks.items()}, n
    return {
        p: _quantile_from_stats(ds, col, k, lo, hi, n, bins, pull_limit)
        for p, k in ranks.items()
    }, n


def sampled_quantile_audit(
    ds,
    id_col: str = "o_orderkey",
    value_col: str = "o_totalprice",
    rate: float = 0.125,
    permilles=range(100, 1000, 100),
):
    """Sample-based quantile-estimation audit: estimate every decile of the
    order-value distribution from the DETERMINISTIC md5-threshold sample
    (``deterministic_sample``: reproducible across runs and cluster sizes,
    SQL-replayable) and measure each estimate's TRUE rank error against the
    full data -- the quantile member of the "measure, don't guess" sketch
    audits (hll/bloom/cms): sample quantiles are THE cheap scale path for
    range partitioning and histogram planning, and this quantifies what the
    sample rate buys.

    ONE data pass builds a range-bucketed COMPRESSED distribution
    (rbucket, cents, n_full, n_sample) -- the per-batch partial groups by
    distinct cents and tags sample membership, so both populations share
    the read and the md5 runs once per row. The materialized detail (the
    compressed ECDF, same license as ks_priority_drift) then serves
    everything without touching the data again: tiny per-bucket totals
    come to the driver, every rank (both sides) locates its bucket and
    residual there, one bounded filter pulls only the needed buckets'
    rows, and the TRUE rank of each estimate falls out of the same
    carry + in-bucket cumsum (no separate counting pass).
    rank_err_ppm = |count(full <= est)*1e6//n - p*1000| in Python ints
    (the SQL replay's BIGINT is fine to ~1e12 rows). The earlier
    per-rank histogram-bisection formulation ran ~2 passes per rank;
    this runs 1 + epsilon total (measured 18.6 s -> 6.3 s at sf0.1/32c;
    the residue is the per-row md5 of the sample predicate).

    Returns 9 rows: (q_permille, sample_n, est_cents, exact_cents,
    rank_err_ppm)."""
    from .relational import _cents, hash_bucket_column, tiny_final_groupby

    permilles = list(permilles)
    threshold = format(int(rate * 0xFFFFFFFF), "08x")
    width = 1 << 21  # range bucket: ordering-preserving parallelism knob

    def partials(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        hx = _md5_hex8(batch.column(id_col).to_pylist())
        in_samp = np.fromiter((h < threshold for h in hx), bool, len(hx))
        df = pd.DataFrame({"c": c, "s": in_samp.astype(np.int64)})
        g = df.groupby("c", sort=False)["s"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "rbucket": pa.array(g["c"].to_numpy(np.int64) // width, pa.int64()),
                "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
                "ns": pa.array(g["sum"].to_numpy(np.int64), pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["rbucket", "c"], sort=False)[["n", "ns"]].sum().reset_index()
        for col in ("n", "ns"):
            out[col] = out[col].astype(np.int64)
        return out

    detail = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("rbucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )
    totals = (
        tiny_final_groupby(
            detail, ["rbucket"], [("n", "sum"), ("ns", "sum")], ["rbucket", "n", "ns"]
        )
        .to_pandas()
        .sort_values("rbucket")
        .reset_index(drop=True)
    )
    n = int(totals["n"].sum())
    n_s = int(totals["ns"].sum())
    if n_s == 0:
        raise ValueError("sampled_quantile_audit: empty sample")
    buckets_sorted = totals["rbucket"].to_numpy(np.int64)

    def locate(col: str, total: int):
        """permille -> (bucket, residual rank, carry-below) for one side."""
        cum = totals[col].cumsum().to_numpy(np.int64)
        out = {}
        for p in permilles:
            k = max(1, (p * total + 999) // 1000)
            i = int(np.searchsorted(cum, k))
            out[p] = (int(buckets_sorted[i]), k - (int(cum[i - 1]) if i else 0),
                      int(cum[i - 1]) if i else 0)
        return out

    loc_full = locate("n", n)
    loc_samp = locate("ns", n_s)
    needed = {b for b, _, _ in loc_full.values()} | {
        b for b, _, _ in loc_samp.values()
    }

    def keep(batch: pa.Table) -> pa.Table:
        rb = batch.column("rbucket").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(rb, list(needed))))

    pulled = (
        detail.map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rbucket", "c"])
    )
    by_bucket = {
        int(rb): (
            grp["c"].to_numpy(np.int64),
            grp["n"].cumsum().to_numpy(np.int64),
            grp["ns"].cumsum().to_numpy(np.int64),
        )
        for rb, grp in pulled.groupby("rbucket")
    }

    def resolve(loc, col_idx):
        vals = {}
        for p, (b, k, _) in loc.items():
            cvals, cn, cns = by_bucket[b]
            cum = cn if col_idx == 0 else cns
            vals[p] = int(cvals[int(np.searchsorted(cum, k))])
        return vals

    est = resolve(loc_samp, 1)
    exact = resolve(loc_full, 0)
    # carry-in per bucket for the FULL side: counts in all lower buckets
    cum_n = totals["n"].cumsum().to_numpy(np.int64)
    carry_full = {
        int(b): int(cum_n[i - 1]) if i else 0 for i, b in enumerate(buckets_sorted)
    }
    bucket_index = {int(b): i for i, b in enumerate(buckets_sorted)}
    rows = []
    for p in permilles:
        v = est[p]
        b = v // width
        if b in by_bucket:
            cvals, cn, _ = by_bucket[b]
            inb = int(cn[np.searchsorted(cvals, v, side="right") - 1]) if np.searchsorted(
                cvals, v, side="right"
            ) else 0
            cle = carry_full.get(b, 0) + inb
        else:
            # estimate's bucket was not pulled (cannot happen: est comes
            # from a pulled bucket) -- carry of the next bucket boundary
            i = bucket_index.get(b, 0)
            cle = int(cum_n[i])
        rows.append(
            (p, n_s, v, exact[p], abs(cle * 1_000_000 // n - p * 1000))
        )
    return pd.DataFrame(
        rows,
        columns=["q_permille", "sample_n", "est_cents", "exact_cents", "rank_err_ppm"],
    ).astype("int64")


def compaction_bins(ds, keys=("source", "lang"), capacity: int = 100):
    """Compaction PLAN over partition sizes: group the corpus's (source,
    lang) partitions into target-size compaction bins -- the table-
    maintenance step every partitioned lake needs when small partitions
    accumulate (the write side of pruned_range_read / zorder_2d_prune's
    read-side story). Deterministic CUMULATIVE packing: partitions sort by
    rows DESC then key, and bin = exclusive-prefix-sum // capacity -- a
    window-function packing (unlike first-fit-decreasing it is
    SQL-replayable and embarrassingly recomputable, at the cost of bins
    that can straddle a capacity boundary by one partition).

    The data-scale work is ONE bounded partial-count pass
    (``tiny_final_groupby``: keys are bounded source x lang); the packing
    itself runs on the tiny partition-metadata table at the driver -- it is
    a plan, not data movement.

    Returns one row per partition: (*keys, n_rows, bin)."""
    from .relational import tiny_final_groupby

    keys = list(keys)

    def partials(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(keys)
            .aggregate([([], "count_all")])
            .rename_columns([*keys, "n"])
        )

    sizes = tiny_final_groupby(
        ds.map_batches(partials, batch_format="pyarrow"), keys, [("n", "sum")],
        [*keys, "n_rows"],
    ).to_pandas()
    sizes = sizes.sort_values(
        ["n_rows", *keys], ascending=[False] + [True] * len(keys)
    ).reset_index(drop=True)
    before = sizes["n_rows"].cumsum().shift(fill_value=0).to_numpy(np.int64)
    sizes["bin"] = before // capacity
    sizes["n_rows"] = sizes["n_rows"].astype(np.int64)
    sizes["bin"] = sizes["bin"].astype(np.int64)
    return sizes


def shingle_containment(
    ds, source_col: str = "source", text_col: str = "text", buckets: int | None = None
):
    """DIRECTIONAL content-leakage audit between sources: for every ordered
    source pair (a, b), the ppm of a's distinct word-3-shingles that also
    occur in b -- containment |S_a & S_b| / |S_a|, the asymmetric measure
    train/test decontamination needs (a small eval set fully contained in a
    big crawl has huge containment but near-zero Jaccard; cross_source_dups
    sees only whole-doc hits, source_vocab_overlap only unigrams).

    ONE bounded exchange: per-batch distinct (shingle-hash, source) rows
    (the map-side dedup; sources are bounded so this is at most
    |batch vocab| x |sources|), h-bucketed so each shingle's source set is
    co-located, then a per-bucket self-join on h whose (a, a) diagonal rows
    ARE the per-source distinct-shingle sizes -- sizes and intersections
    ride the same tiny (sources^2) partial fold. Final ppm in Python ints
    at the driver. Same 2^-64 hash-collision caveat as the shingle family.

    Returns ordered pairs a != b: (source_a, source_b, n_a, n_inter,
    containment_ppm)."""
    from ..functions.dedup import shingle_hashes
    from .relational import derive_buckets, hash_bucket_column, tiny_final_groupby

    n_docs = ds.count()
    if buckets is None:
        buckets = derive_buckets(n_docs, rows_per_bucket=50_000)

    def long_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        memo: dict[str, int] = {}
        us = [np.unique(shingle_hashes(t or "", 3, memo)) for t in texts]
        lens = [len(u) for u in us]
        df = pd.DataFrame(
            {
                "h": np.concatenate(us) if us else np.empty(0, np.uint64),
                "source": np.repeat(np.array(srcs, dtype=object), lens),
            }
        ).drop_duplicates()
        t = pa.table(
            {
                "h": pa.array(df["h"].to_numpy(), pa.uint64()),
                "source": pa.array(df["source"].tolist(), pa.string()),
            }
        )
        return hash_bucket_column(t, "h", buckets)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["h", "source"]].drop_duplicates()
        m = d.merge(d, on="h")
        out = (
            m.groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"source_x": "source_a", "source_y": "source_b"})
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = tiny_final_groupby(
        ds.map_batches(long_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["source_a", "source_b"],
        [("n", "sum")],
        ["source_a", "source_b", "n"],
    ).to_pandas()
    size = {
        r.source_a: int(r.n) for r in agg.itertuples() if r.source_a == r.source_b
    }
    rows = [
        (r.source_a, r.source_b, size[r.source_a], int(r.n),
         int(r.n) * 1_000_000 // size[r.source_a])
        for r in agg.itertuples()
        if r.source_a != r.source_b
    ]
    out = pd.DataFrame(
        rows, columns=["source_a", "source_b", "n_a", "n_inter", "containment_ppm"]
    )
    for c in ("n_a", "n_inter", "containment_ppm"):
        out[c] = out[c].astype(np.int64)
    return out


def cusum_changepoints(ds, ts_col: str = "ts", value_col: str = "value"):
    """One-sided CUSUM level-shift detector over the daily event-value
    series -- the streaming drift monitor (Page's cumulative sum) that
    flags WHEN ingest volume shifted upward, complementing spike_days'
    memoryless single-day z-test with a statistic that accumulates small
    sustained shifts.

    Integer-deterministic recurrence: with per-day cents x_d, global mean
    mu = sum(x) // n_days, allowance k = mu // 20 (5%) and threshold
    h = mu, s_d = max(0, s_{d-1} + x_d - mu - k); a day is flagged while
    s_d > h. The data-scale work is ONE bounded per-day partial-sum pass
    (day cardinality is bounded at any sf); the inherently-sequential
    recurrence then runs over the tiny day series at the driver -- it is
    monitoring state, not data movement. The SQL replay walks the same
    recurrence with a recursive CTE over ROW_NUMBER'd days.

    Returns one row per day: (day, value_cents, cusum_cents, flagged)."""
    import pyarrow.compute as pc

    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.floor_temporal(batch.column(ts_col), unit="day"), format="%Y-%m-%d"
        )
        t = pa.table({"day": day, "v": _cents(batch.column(value_col))})
        return t.group_by(["day"]).aggregate([("v", "sum")])

    daily = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["day"],
            [("v_sum", "sum")],
            ["day", "value_cents"],
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = [int(v) for v in daily["value_cents"]]
    n = len(x)
    mu = sum(x) // n if n else 0
    k = mu // 20
    s, cus, flags = 0, [], []
    for v in x:
        s = max(0, s + v - mu - k)
        cus.append(s)
        flags.append(1 if s > mu else 0)
    daily["value_cents"] = daily["value_cents"].astype(np.int64)
    daily["cusum_cents"] = pd.array(cus, dtype="int64")
    daily["flagged"] = pd.array(flags, dtype="int64")
    return daily


def bigram_surprisal_by_source(
    ds, source_col: str = "source", text_col: str = "text", buckets: int = 64
):
    """Character-BIGRAM conditional surprisal per source: the mean whole-bit
    surprisal ``floor(log2(n(c1)/n(c1c2)))`` over every adjacent codepoint
    pair, i.e. an integer-bit estimate of H(next char | current char) --
    the encoding-health signal (mojibake, double-encoded UTF-8, binary
    spills) that jumps when a source's character transitions stop looking
    like its own language model, complementing encoding_audit's fixed
    byte-pattern checks with a distributional one. Same
    ``bit_length(m // n) - 1 == floor(log2(m/n))`` identity as
    doc_surprisal/zipf_bits: no float log on either side.

    Vectorized kernel: texts decode once to uint32 codepoint arrays
    (utf-32-le view), per-source concatenation with an out-of-range
    separator (0x110000) kills cross-doc pairs, bigram key = c1<<32 | c2,
    per-batch np.unique partials. ONE exchange, bucketed on c1 so each
    (source, c1) marginal is co-located: the in-bucket fold computes exact
    pair counts, first-char marginals, whole-bit surprisal over the
    COMPRESSED (source, bigram) domain (charset^2-bounded, never the
    stream), and per-source partial sums; a tiny final folds sources.

    Returns (source, n_bigrams, total_bits, mean_millibits); docs shorter
    than 2 chars contribute nothing."""
    from .relational import hash_bucket_column, tiny_final_groupby

    SEP = np.uint32(0x110000)

    def partials(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        by_src: dict[str, list] = {}
        for s, t in zip(srcs, texts):
            if t and len(t) >= 2:
                by_src.setdefault(s, []).append(t)
        out_s, out_k, out_n = [], [], []
        for s, ts_ in by_src.items():
            parts = []
            for t in ts_:
                parts.append(np.frombuffer(t.encode("utf-32-le"), np.uint32))
                parts.append(np.array([SEP], np.uint32))
            big = np.concatenate(parts)
            a, b = big[:-1], big[1:]
            mask = (a != SEP) & (b != SEP)
            key = (a[mask].astype(np.uint64) << np.uint64(32)) | b[mask].astype(
                np.uint64
            )
            u, c = np.unique(key, return_counts=True)
            out_s.append(np.full(len(u), s, dtype=object))
            out_k.append(u)
            out_n.append(c.astype(np.int64))
        t = pa.table(
            {
                "source": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, object),
                    pa.string(),
                ),
                "key": pa.array(
                    np.concatenate(out_k) if out_k else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "n": pa.array(
                    np.concatenate(out_n) if out_n else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "c1": pa.array(
                    (np.concatenate(out_k) >> np.uint64(32)).astype(np.int64)
                    if out_k
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )
        return hash_bucket_column(t, "c1", buckets)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["source", "key"], sort=False).agg(
            n=("n", "sum"), c1=("c1", "first")
        ).reset_index()
        m = d.groupby(["source", "c1"], sort=False)["n"].transform("sum").to_numpy(
            np.int64
        )
        n = d["n"].to_numpy(np.int64)
        bits = np.fromiter(
            (int(q).bit_length() - 1 for q in m // n), np.int64, len(d)
        )
        p = pd.DataFrame({"source": d["source"], "n": n, "tb": n * bits})
        out = p.groupby("source", sort=False)[["n", "tb"]].sum().reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["tb"] = out["tb"].astype(np.int64)
        return out

    agg = tiny_final_groupby(
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas"),
        ["source"],
        [("n", "sum"), ("tb", "sum")],
        ["source", "n_bigrams", "total_bits"],
    ).to_pandas()
    agg["n_bigrams"] = agg["n_bigrams"].astype(np.int64)
    agg["total_bits"] = agg["total_bits"].astype(np.int64)
    agg["mean_millibits"] = (
        agg["total_bits"].to_numpy(np.int64) * 1000 // agg["n_bigrams"].to_numpy(np.int64)
    )
    return agg


def key_density_audit(ds, key_col: str = "o_orderkey"):
    """Surrogate-KEY-space integrity audit: row count, exact distinct
    count, key range, duplicate rows and the key-space DENSITY (distinct
    keys per 1e6 slots of [min, max]) -- the one-row health check that
    catches duplicate-key ingestion (dup_rows > 0), allocator gaps and
    sharded ranges that went sparse (density drops), before any
    uniqueness-assuming join runs. Same exact-distinct plan as
    hll_error_audit's exact side: per-batch np.unique partials bucketed on
    the key, per-bucket nunique, plus ONE Min/Max/Count aggregate; the
    fold is a handful of ints.

    Returns ONE row (n_rows, n_distinct, min_key, max_key, density_ppm,
    dup_rows)."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import hash_bucket_column

    stats = ds.aggregate(Min(key_col), Max(key_col), Count())
    lo, hi, n = (
        int(stats[f"min({key_col})"]),
        int(stats[f"max({key_col})"]),
        int(stats["count()"]),
    )

    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(key_col).to_numpy(zero_copy_only=False))
        return hash_bucket_column(pa.table({key_col: pa.array(u)}), key_col, 64)

    def bucket_n(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g[key_col].nunique())]})

    nd = int(
        ds.map_batches(uniq, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_n, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    span = hi - lo + 1
    return pd.DataFrame(
        {
            "n_rows": pd.array([n], dtype="int64"),
            "n_distinct": pd.array([nd], dtype="int64"),
            "min_key": pd.array([lo], dtype="int64"),
            "max_key": pd.array([hi], dtype="int64"),
            "density_ppm": pd.array([nd * 1_000_000 // span], dtype="int64"),
            "dup_rows": pd.array([n - nd], dtype="int64"),
        }
    )


def rolling_median_daily(ds, ts_col: str = "o_orderdate", value_col: str = "o_totalprice"):
    """7-row rolling LOWER MEDIAN of the daily revenue series -- the
    robust trend line (immune to single-day spikes that drag
    rolling_7d_sum / forecast baselines) a revenue monitor plots. Lower
    median = sorted rank (w+1)//2, exactly DuckDB's windowed
    quantile_disc(0.5), so the replay is a window aggregate and no float
    interpolation exists on either side.

    Daily totals come from ONE bounded per-day partial-sum pass (day
    cardinality is bounded at any sf); the 7-row sliding median then runs
    over the tiny ordered day series at the driver (window state, not data
    movement -- same license as cusum_changepoints).

    Returns one row per day: (day, value_cents, med7_cents)."""
    import pyarrow.compute as pc

    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.floor_temporal(batch.column(ts_col), unit="day"), format="%Y-%m-%d"
        )
        t = pa.table({"day": day, "v": _cents(batch.column(value_col))})
        return t.group_by(["day"]).aggregate([("v", "sum")])

    daily = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["day"],
            [("v_sum", "sum")],
            ["day", "value_cents"],
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["value_cents"].to_numpy(np.int64)
    med = np.empty(len(x), np.int64)
    for i in range(len(x)):
        w = np.sort(x[max(0, i - 6) : i + 1])
        med[i] = w[(len(w) + 1) // 2 - 1]
    daily["value_cents"] = daily["value_cents"].astype(np.int64)
    daily["med7_cents"] = med
    return daily


def doclen_deciles_by_source(ds, source_col: str = "source", len_col: str = "n_chars"):
    """Per-source document-LENGTH deciles -- the length-distribution
    profile (truncation, boilerplate padding, extraction bugs all move
    specific deciles long before they move the mean) that slots between
    quality_by_lang's means and value_histogram's global bins. Exact
    discrete deciles, rank = (n-1)*k//10 + 1 in INTEGER arithmetic --
    DuckDB's quantile_disc convention, no float interpolation.

    The exchange is per-batch (source, len, n) partial counts -- the
    compressed length distribution, bounded by the length domain, never
    the rows -- grouped per source (bounded); each source's fold sorts its
    distinct lengths once and reads all nine ranks off the cumsum.

    Returns (source, decile, n_chars), 9 rows per source."""

    def partials(batch: pa.Table) -> pa.Table:
        return (
            batch.select([source_col, len_col])
            .group_by([source_col, len_col])
            .aggregate([([], "count_all")])
            .rename_columns([source_col, len_col, "n"])
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = (
            g.groupby(len_col, sort=True)["n"].sum().reset_index()
        )  # distinct lengths, ascending
        cum = d["n"].cumsum().to_numpy(np.int64)
        n = int(cum[-1])
        ranks = [(n - 1) * k // 10 + 1 for k in range(1, 10)]
        idx = np.searchsorted(cum, ranks)
        return pd.DataFrame(
            {
                "source": g[source_col].iloc[0],
                "decile": pd.array(range(1, 10), dtype="int64"),
                "n_chars": d[len_col].to_numpy(np.int64)[idx],
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(source_col)
        .map_groups(fold, batch_format="pandas")
    )


def value_moments_by_type(ds, key_col: str = "event_type", value_col: str = "value"):
    """Exact integer higher-moment profile of event value per type: raw
    power sums s1/s2/s3 over cents fold associatively (the map-side
    combiner shape), and mean, population variance and the third central
    moment derive from them in EXACT integer arithmetic -- distribution-
    shape drift (a fee schedule change skews purchase values long before
    the mean moves) with no float accumulation order-sensitivity anywhere.

    var_cents2 = (n*s2 - s1^2) // n^2;
    m3_cents3 = (n^2*s3 - 3*n*s1*s2 + 2*s1^3) / n^3 with TRUNCATING
    division (matching SQL //; Python floor would differ on negative
    skew). Engine math is unbounded Python int; the HUGEINT SQL replay is
    exact to ~1e8 rows/type at 5e4-cent values (documented horizon).

    Returns (event_type, n, mean_cents, var_cents2, m3_cents3)."""
    from .relational import _cents, tiny_final_groupby

    def partials(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        k = batch.column(key_col).to_pylist()
        df = pd.DataFrame({"k": k, "c": c})
        # object dtype: power sums overflow int64 per batch at big values
        df["c2"] = df["c"].astype(object) * df["c"].astype(object)
        df["c3"] = df["c2"] * df["c"].astype(object)
        out = df.groupby("k", sort=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2=("c2", "sum"), s3=("c3", "sum")
        ).reset_index()
        return pa.table(
            {
                "k": pa.array(out["k"], pa.string()),
                "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
                "s1": pa.array([int(x) for x in out["s1"]], pa.int64()),
                # s2/s3 ride as decimal128/string-safe: use large_string? keep
                # exact via string to survive arrow int64 limits
                "s2": pa.array([str(int(x)) for x in out["s2"]], pa.string()),
                "s3": pa.array([str(int(x)) for x in out["s3"]], pa.string()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, part in g.groupby("k", sort=False):
            n = int(part["n"].sum())
            s1 = int(part["s1"].sum())
            s2 = sum(int(x) for x in part["s2"])
            s3 = sum(int(x) for x in part["s3"])
            mean = s1 // n
            var = (n * s2 - s1 * s1) // (n * n)
            num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
            den = n**3
            m3 = -((-num) // den) if num < 0 else num // den  # truncate like SQL
            rows.append((k, n, mean, var, m3))
        return pd.DataFrame(
            rows, columns=["event_type", "n", "mean_cents", "var_cents2", "m3_cents3"]
        ).astype({c: "int64" for c in ("n", "mean_cents", "var_cents2", "m3_cents3")})

    # types are bounded: one coalesced final fold (string power sums merge
    # as Python ints there)
    partial_ds = ds.map_batches(partials, batch_format="pyarrow")
    return partial_ds.repartition(1).map_batches(
        lambda b: pa.Table.from_pandas(fold(b.to_pandas()), preserve_index=False),
        batch_format="pyarrow",
        batch_size=None,
    )


def order_backlog_daily(orders, lineitem, buckets: int | None = None):
    """Daily open-order BACKLOG: how many orders have been placed but not
    yet fully shipped as of each change day -- the interval-stabbing
    operational series (WIP depth) that peak_concurrent_sessions computes
    for sessions, here derived by JOINING two tables (an order is open
    from o_orderdate through its LAST l_shipdate, inclusive).

    ONE co-grouped exchange: both sides normalize to (orderkey, ts,
    is_order) rows -- lineitem pre-maxed per batch (map-side combiner for
    the per-order last shipment) -- hash-bucketed on the orderkey; each
    bucket folds its orders against its per-order ship maxima (inner join:
    lineitem-less orders never open) and emits +1/-1 DELTA partials on the
    open day and the day AFTER last shipment. Deltas collapse to the
    bounded day domain (``tiny_final_groupby``); the running sum over the
    tiny ordered day series is driver-side window state. Output is the
    step function at its change days (backlog is constant in between).

    Returns (day, net_delta, open_orders) per change day."""
    from .relational import derive_buckets, hash_bucket_column, tiny_final_groupby

    n = max(orders.count(), lineitem.count())
    if buckets is None:
        buckets = derive_buckets(n)

    def norm_orders(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("o_orderkey"),
                "ts": batch.column("o_orderdate"),
                "is_order": pa.array(
                    np.ones(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )
        return hash_bucket_column(t, "k", buckets)

    def norm_lineitem(batch: pa.Table) -> pa.Table:
        t = (
            pa.table(
                {"k": batch.column("l_orderkey"), "ts": batch.column("l_shipdate")}
            )
            .group_by(["k"])
            .aggregate([("ts", "max")])
            .rename_columns(["k", "ts"])
        )
        t = t.append_column("is_order", pa.array(np.zeros(t.num_rows, np.int8), pa.int8()))
        return hash_bucket_column(t, "k", buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_order"] == 1]
        li = g[g["is_order"] == 0].groupby("k")["ts"].max()
        m = o.merge(li.rename("last"), left_on="k", right_index=True)
        if not len(m):
            return pd.DataFrame({"day": pd.Series([], dtype=str),
                                 "delta": pd.Series([], dtype="int64")})
        open_day = m["ts"].dt.floor("D").dt.strftime("%Y-%m-%d")
        close_day = (m["last"].dt.floor("D") + pd.Timedelta(days=1)).dt.strftime(
            "%Y-%m-%d"
        )
        d = pd.concat(
            [
                pd.DataFrame({"day": open_day, "delta": 1}),
                pd.DataFrame({"day": close_day, "delta": -1}),
            ]
        )
        out = d.groupby("day", sort=False)["delta"].sum().reset_index()
        out["delta"] = out["delta"].astype(np.int64)
        return out

    deltas = (
        tiny_final_groupby(
            orders.map_batches(norm_orders, batch_format="pyarrow")
            .union(lineitem.map_batches(norm_lineitem, batch_format="pyarrow"))
            .groupby("__bucket")
            .map_groups(fold, batch_format="pandas"),
            ["day"],
            [("delta", "sum")],
            ["day", "net_delta"],
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    deltas["net_delta"] = deltas["net_delta"].astype(np.int64)
    deltas["open_orders"] = deltas["net_delta"].cumsum().astype(np.int64)
    return deltas


def dow_revenue_profile(ds, ts_col: str = "o_orderdate", value_col: str = "o_totalprice"):
    """Day-of-week revenue seasonality: ISO weekday (1=Mon..7=Sun) order
    counts, revenue cents and each weekday's revenue SHARE in ppm -- the
    weekly seasonal fingerprint that weekly_revenue_wow's week-over-week
    deltas and spike_days' daily z-tests both ride on top of (a batch
    pipeline that loads Mondays twice shows up here first). ONE bounded
    7-key partial pass; shares floor-divide against the global total at
    the driver.

    Returns 7 rows: (isodow, n_orders, revenue_cents, share_ppm)."""
    import pyarrow.compute as pc

    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        # pyarrow day_of_week: Monday=0 -> ISO by +1
        dow = pc.add(pc.day_of_week(batch.column(ts_col)), 1)
        t = pa.table({"isodow": dow, "v": _cents(batch.column(value_col))})
        return t.group_by(["isodow"]).aggregate([("v", "sum"), ("v", "count")])

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["isodow"],
            [("v_sum", "sum"), ("v_count", "sum")],
            ["isodow", "revenue_cents", "n_orders"],
        )
        .to_pandas()
        .sort_values("isodow")
        .reset_index(drop=True)
    )
    total = int(out["revenue_cents"].sum())
    out["isodow"] = out["isodow"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["share_ppm"] = np.array(
        [int(v) * 1_000_000 // total for v in out["revenue_cents"]], np.int64
    )
    return out[["isodow", "n_orders", "revenue_cents", "share_ppm"]]


def completeness_audit(ds, string_cols=("text", "lang", "source"), id_col: str = "doc_id"):
    """Per-column COMPLETENESS audit over the documents table: null count,
    empty-string count and combined missing ppm for each string column --
    the first data-quality gate any ingest runs (an extractor that starts
    emitting empty text moves this before it moves any content statistic).
    ONE pass of per-batch per-column partial counts (bounded: one row per
    column per batch) folded tiny.

    Returns one row per audited column: (column, n_rows, n_null, n_empty,
    missing_ppm)."""
    from .relational import tiny_final_groupby

    cols = list(string_cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, nn, ne, nr = [], [], [], []
        for c in cols:
            col = batch.column(c)
            names.append(c)
            nr.append(batch.num_rows)
            nulls = col.null_count
            nn.append(int(nulls))
            v = col.to_pandas()
            ne.append(int((v == "").sum()))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(nr, pa.int64()),
                "n_null": pa.array(nn, pa.int64()),
                "n_empty": pa.array(ne, pa.int64()),
            }
        )

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["column"],
            [("n_rows", "sum"), ("n_null", "sum"), ("n_empty", "sum")],
            ["column", "n_rows", "n_null", "n_empty"],
        )
        .to_pandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "n_null", "n_empty"):
        out[c] = out[c].astype(np.int64)
    out["missing_ppm"] = (
        (out["n_null"] + out["n_empty"]).to_numpy(np.int64)
        * 1_000_000
        // out["n_rows"].to_numpy(np.int64)
    )
    return out


def doc_bigram_surprisal_topk(ds, k: int = 50, id_col: str = "doc_id",
                              lang_col: str = "lang", text_col: str = "text"):
    """Token-BIGRAM surprisal scoring: ``doc_surprisal_topk`` with the
    corpus bigram distribution as the LM -- each adjacent token pair
    contributes ``floor(log2(N_bigrams / c(pair)))`` whole bits (the same
    ``bit_length(N // c) - 1`` identity, no float log on either side).
    Unigram surprisal flags rare WORDS; this flags rare TRANSITIONS --
    word-salad spam, shuffled scrapes and wrong-language runs score high
    here while passing the unigram screen because every word is common.

    Same two-pass plan as doc_surprisal_topk: pass 1 folds per-batch
    bigram counts through the string-bucket exchange; the (bigram, bits)
    table broadcasts once via ray.put as sorted numpy pairs (searchsorted
    probe); pass 2 re-reads, scores vectorized (explode -> within-doc
    shift pairs -> searchsorted -> per-doc sums), keeps per-batch partial
    top-k, one tiny final merge on (mean_millibits DESC, doc_id ASC).
    Docs with fewer than 2 tokens have no bigrams and drop.

    Returns (doc_id, lang, n_bigrams, total_bits, mean_millibits) for the
    k most transition-surprising docs."""
    import re

    import ray

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")

    def _bigrams(batch: pd.DataFrame) -> pd.Series:
        s = (
            batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        )
        if len(s) == 0:
            return s
        nxt = s.groupby(level=0).shift(-1)
        return (s + " " + nxt).dropna()

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = _bigrams(batch).value_counts()
        return pd.DataFrame({"bg": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(vocab_partial, batch_format="pandas"), "bg", "n"
    ).to_pandas()
    if len(counts) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema([
            (id_col, pa.int64()), (lang_col, pa.string()),
            ("n_bigrams", pa.int64()), ("total_bits", pa.int64()),
            ("mean_millibits", pa.int64())]).empty_table())
    counts = counts.sort_values("bg").reset_index(drop=True)
    n_total = int(counts["n"].sum())
    bits = np.array([(n_total // int(c)).bit_length() - 1
                     for c in counts["n"]], dtype=np.int64)
    handle = ray.put({"bgs": counts["bg"].to_numpy(object), "bits": bits})

    class Score:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            s = _bigrams(batch)
            if len(s) == 0:
                return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                     lang_col: pd.Series([], dtype=str),
                                     "n_bigrams": pd.Series([], dtype=np.int64),
                                     "total_bits": pd.Series([], dtype=np.int64),
                                     "mean_millibits": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(self.lk["bgs"], s.to_numpy(object))
            tb = pd.Series(self.lk["bits"][pos], index=s.index)
            per_doc = tb.groupby(level=0).agg(["size", "sum"])
            docs = per_doc.index
            out = pd.DataFrame({
                id_col: batch[id_col].reindex(docs).to_numpy(),
                lang_col: batch[lang_col].reindex(docs).to_numpy(),
                "n_bigrams": per_doc["size"].to_numpy(np.int64),
                "total_bits": per_doc["sum"].to_numpy(np.int64),
            })
            out["mean_millibits"] = (out["total_bits"] * 1000) // out["n_bigrams"]
            return out.sort_values(["mean_millibits", id_col],
                                   ascending=[False, True]).head(k)

    def final_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["mean_millibits", id_col],
                                 ascending=[False, True]).head(k).reset_index(drop=True)

    return (
        ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))
        .repartition(1)
        .map_batches(final_topk, batch_format="pandas", batch_size=None)
    )


def negative_samples(orders, lineitem, customer, n_parts: int, k: int = 8,
                     buckets: int | None = None):
    """Deterministic NEGATIVE sampling for contrastive / link-prediction
    training: for every customer, k candidate partkeys drawn by md5
    arithmetic (``md5_u64(f"{cust}:{j}") % n_parts`` -- reproducible
    across runs and cluster sizes, SQL-replayable like every RNG-ish
    thing here), with candidates that the customer actually purchased
    removed by an ANTI-join against the true interaction set. The
    training-data counterpart of link_prediction_topk: that ranks likely
    edges, this manufactures the non-edges a ranking model trains
    against.

    ONE exchange: the interaction side (orders |><| lineitem via the
    bucketed hash join, projected to distinct (cust, part) per batch) and
    the candidate side (generated straight off the customer table, no
    shuffle) are both bucketed on cust; each bucket folds with a vectorized
    merge-indicator anti-join. Collisions between a customer's own
    candidates are kept as distinct (neg_idx) rows on both sides.

    Returns (custkey, neg_idx, partkey) for surviving negatives."""
    from ..functions.dedup import md5_u64
    from .relational import bucketed_hash_join, derive_buckets, hash_bucket_column

    if buckets is None:
        buckets = derive_buckets(max(orders.count(), lineitem.count()))
    joined = bucketed_hash_join(
        orders, lineitem, "o_orderkey", "l_orderkey", buckets=buckets
    )

    def inter_rows(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c": batch.column("o_custkey").to_numpy(zero_copy_only=False),
                "p": batch.column("l_partkey").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        t = pa.table(
            {
                "c": pa.array(df["c"].to_numpy(np.int64), pa.int64()),
                "p": pa.array(df["p"].to_numpy(np.int64), pa.int64()),
                "j": pa.array(np.zeros(len(df), np.int64), pa.int64()),
                "is_cand": pa.array(np.zeros(len(df), np.int8), pa.int8()),
            }
        )
        return hash_bucket_column(t, "c", buckets)

    def cand_rows(batch: pa.Table) -> pa.Table:
        cs = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        c_rep = np.repeat(cs, k)
        j_rep = np.tile(np.arange(1, k + 1, dtype=np.int64), len(cs))
        p = np.fromiter(
            (
                md5_u64(b"%d:%d" % (c, j)) % n_parts
                for c, j in zip(c_rep, j_rep)
            ),
            np.int64,
            len(c_rep),
        )
        t = pa.table(
            {
                "c": pa.array(c_rep, pa.int64()),
                "p": pa.array(p, pa.int64()),
                "j": pa.array(j_rep, pa.int64()),
                "is_cand": pa.array(np.ones(len(c_rep), np.int8), pa.int8()),
            }
        )
        return hash_bucket_column(t, "c", buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cand = g[g["is_cand"] == 1]
        inter = g[g["is_cand"] == 0][["c", "p"]].drop_duplicates()
        m = cand.merge(inter, on=["c", "p"], how="left", indicator=True)
        keep = m[m["_merge"] == "left_only"]
        return pd.DataFrame(
            {
                "custkey": keep["c"].to_numpy(np.int64),
                "neg_idx": keep["j"].to_numpy(np.int64),
                "partkey": keep["p"].to_numpy(np.int64),
            }
        )

    inter_ds = joined.map_batches(inter_rows, batch_format="pyarrow")
    cand_ds = customer.map_batches(cand_rows, batch_format="pyarrow")
    return inter_ds.union(cand_ds).groupby("__bucket").map_groups(
        fold, batch_format="pandas"
    )


def span_corruption_plan(ds, id_col: str = "doc_id", text_col: str = "text",
                         span_len: int = 3, tokens_per_span: int = 20):
    """T5-style span-corruption PLAN: for each doc, a deterministic list
    of mask spans over its whitespace-token stream -- n_spans = nw //
    tokens_per_span spans of ``span_len`` tokens (~15% corruption at the
    defaults), each start drawn by md5 arithmetic
    (``md5_u64(f"{doc_id}:{i}") % (nw - span_len + 1) + 1``, 1-based).
    The plan is data: a downstream packer joins it against the text to
    materialize masked inputs/targets, and because it is md5-derived the
    SAME spans regenerate on any cluster shape (resume-safe augmentation,
    the property random.Random can never give). Overlapping spans are
    permitted (T5 merges them at materialization).

    Embarrassingly parallel: ONE map_batches, no exchange; docs shorter
    than ``tokens_per_span`` tokens contribute no spans.

    Returns (doc_id, span_idx, start_tok, span_len)."""
    from ..functions.dedup import md5_u64
    from ..functions.textstats import _WS_TOKEN

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column(text_col).to_pylist()
        out_d, out_i, out_s = [], [], []
        for did, t in zip(ids, texts):
            nw = len(_WS_TOKEN.findall(t or ""))
            n_spans = nw // tokens_per_span
            if n_spans <= 0 or nw < span_len:
                continue
            mod = nw - span_len + 1
            for i in range(1, n_spans + 1):
                out_d.append(did)
                out_i.append(i)
                out_s.append(md5_u64(b"%d:%d" % (did, i)) % mod + 1)
        n = len(out_d)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "span_idx": pa.array(out_i, pa.int64()),
                "start_tok": pa.array(out_s, pa.int64()),
                "span_len": pa.array(np.full(n, span_len, np.int64), pa.int64()),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow")


def two_hop_reach(ds, topn: int = 20, id_col: str = "doc_id"):
    """2-hop IN-neighborhood size for the most-cited nodes of the shared
    md5 citation graph: for each of the ``topn`` highest in-degree nodes,
    how many DISTINCT nodes sit two citation hops upstream (who cites the
    citers) -- the influence-funnel audit one step past
    in_degree_histogram (out-degree is capped at 3 by construction, so
    the interesting reach is inbound). Ties at the top-n boundary break
    on (in_deg DESC, node ASC) on both sides.

    Plan: ONE dst-bucketed exchange dedupes the edge multiset and fixes
    exact in-degrees in the same fold (dst co-located) -- the distinct-
    edge table materializes once and serves both hops; seeds come from
    per-batch partial top-n (total order makes the union a superset);
    the seeds' in-neighbor lists are a bounded driver collect broadcast
    back as a closure map (u -> seeds it feeds), so hop 2 is ONE map-side
    pass over the distinct edges -- no second join shuffle. Seeds whose
    citers have no citers report reach2 = 0.

    Returns (seed, in_deg, reach2), topn rows."""
    from .relational import derive_buckets, hash_bucket_column

    n = ds.count()
    edges = derived_link_edges(ds, n, id_col=id_col)
    buckets = derive_buckets(2 * n)

    def bucketed(batch: pa.Table) -> pa.Table:
        t = (
            pa.table({"src": batch.column("src"), "dst": batch.column("dst")})
            .group_by(["src", "dst"])
            .aggregate([])
        )
        return hash_bucket_column(t, "dst", buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["src", "dst"]].drop_duplicates()
        ind = d.groupby("dst", sort=False)["src"].transform("size")
        return pd.DataFrame(
            {
                "src": d["src"].to_numpy(np.int64),
                "dst": d["dst"].to_numpy(np.int64),
                "in_deg": ind.to_numpy(np.int64),
            }
        )

    detail = (
        edges.map_batches(bucketed, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["dst", "in_deg"])
            .to_pandas()
            .drop_duplicates()
            .sort_values(["in_deg", "dst"], ascending=[False, True])
            .head(topn)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    seeds = (
        detail.map_batches(partial_top, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial_top, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    seed_set = set(int(x) for x in seeds["dst"])

    def n1_rows(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(dst, list(seed_set))))

    n1 = detail.map_batches(n1_rows, batch_format="pyarrow").to_pandas()
    u2seeds: dict[int, list[int]] = {}
    for r in n1.itertuples():
        u2seeds.setdefault(int(r.src), []).append(int(r.dst))

    def hop2(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        out_s, out_w = [], []
        for w, u in zip(src, dst):
            for s in u2seeds.get(int(u), ()):
                out_s.append(s)
                out_w.append(int(w))
        df = pd.DataFrame({"seed": out_s, "w": out_w}).drop_duplicates()
        return pa.table(
            {
                "seed": pa.array(df["seed"].to_numpy(np.int64), pa.int64()),
                "w": pa.array(df["w"].to_numpy(np.int64), pa.int64()),
            }
        )

    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("seed", sort=False)["w"].nunique().reset_index(name="reach2")
        out["reach2"] = out["reach2"].astype(np.int64)
        return out

    r2 = (
        detail.map_batches(hop2, batch_format="pyarrow")
        .groupby("seed")
        .map_groups(count_fold, batch_format="pandas")
        .to_pandas()
    )
    out = seeds.rename(columns={"dst": "seed"}).merge(r2, on="seed", how="left")
    out["reach2"] = out["reach2"].fillna(0).astype(np.int64)
    out["in_deg"] = out["in_deg"].astype(np.int64)
    out["seed"] = out["seed"].astype(np.int64)
    return out[["seed", "in_deg", "reach2"]]


def revenue_time_rollup(ds, ts_col: str = "o_orderdate", value_col: str = "o_totalprice"):
    """Time-hierarchy ROLLUP of revenue: one output row per (year),
    (year, quarter) and (year, quarter, month) group -- the calendar
    drill-down docs_rollup/docs_cube provide for categorical dimensions,
    on the time axis. Aggregated-out levels report -1 (not NULL: the
    driver's value-hash compare stringifies, and -1 is unambiguous in a
    month/quarter domain).

    ONE bounded exchange at MONTH granularity (the finest level; the
    month domain is bounded at any sf) -- quarters and years then fold
    from the month partials at the driver with Python-int sums, zero
    extra passes (the classic rollup-from-finest-partial identity).

    Returns (level, y, q, m, n_orders, revenue_cents); level in
    {'year', 'quarter', 'month'}."""
    import pyarrow.compute as pc

    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        t = pa.table(
            {
                "y": pc.year(ts),
                "m": pc.month(ts),
                "v": _cents(batch.column(value_col)),
            }
        )
        return t.group_by(["y", "m"]).aggregate([("v", "sum"), ("v", "count")])

    months = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["y", "m"],
            [("v_sum", "sum"), ("v_count", "sum")],
            ["y", "m", "revenue_cents", "n_orders"],
        )
        .to_pandas()
        .sort_values(["y", "m"])
        .reset_index(drop=True)
    )
    months["q"] = (months["m"].to_numpy(np.int64) - 1) // 3 + 1
    rows = []
    for r in months.itertuples():
        rows.append(("month", int(r.y), int(r.q), int(r.m), int(r.n_orders), int(r.revenue_cents)))
    for (y, q), g in months.groupby(["y", "q"]):
        rows.append(("quarter", int(y), int(q), -1, int(g["n_orders"].sum()), int(g["revenue_cents"].sum())))
    for y, g in months.groupby("y"):
        rows.append(("year", int(y), -1, -1, int(g["n_orders"].sum()), int(g["revenue_cents"].sum())))
    out = pd.DataFrame(rows, columns=["level", "y", "q", "m", "n_orders", "revenue_cents"])
    for c in ("y", "q", "m", "n_orders", "revenue_cents"):
        out[c] = out[c].astype(np.int64)
    return out


def bpe_merge_candidates(ds, text_col: str = "text", k: int = 50):
    """BPE vocabulary-induction kernel (round 1 of byte-pair encoding):
    corpus-wide counts of adjacent character pairs WITHIN word tokens,
    weighted by occurrence — exactly the statistic BPE training computes
    before each merge (the full trainer iterates this kernel after
    rewriting the chosen pair; one round is the distributed-counting
    core). Tokens are ``[a-z0-9]+`` runs of the lowercased text, shared
    char-for-char with the ``top_tokens`` family's oracle.

    Plan (100 TB shape): per batch, ONE value_counts dedupes tokens
    (Zipfian vocab: distinct << total), then pairs are generated
    VECTORIZED per character position over the distinct-token table
    (≤ max_word_len pandas slice ops per batch, never a per-token Python
    loop) and weighted by token frequency. The shuffle moves (pair, n)
    partials — pair domain ≤ 36² — never text. Top-k by (n DESC, pair
    ASC) via per-block partial top-k + one tiny merge."""
    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re).explode().dropna()
        if not len(toks):
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=str), "n": pd.Series([], dtype=np.int64)}
            )
        vc = toks.value_counts()
        words = vc.index.to_series().reset_index(drop=True)
        freq = pd.Series(vc.to_numpy(np.int64))
        maxlen = int(words.str.len().max())
        parts = []
        for i in range(maxlen - 1):
            pair = words.str.slice(i, i + 2)
            m = pair.str.len() == 2
            if m.any():
                parts.append(pd.DataFrame({"pair": pair[m], "n": freq[m]}))
        if not parts:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=str), "n": pd.Series([], dtype=np.int64)}
            )
        out = pd.concat(parts, ignore_index=True)
        g = out.groupby("pair", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    from .relational import bucketed_grouped_sum

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "pair", "n", buckets=16
    )

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "pair"], ascending=[False, True]).head(k)

    return (
        counts.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
    )


def _md5_leading_ones16(payload: str) -> tuple[int, int]:
    """Two iid geometric(1/2) draws from one md5: the leading-ones count
    of hex digits [0:4) and [4:8) as 16-bit integers (each capped at 16).
    P(G = g) = 2^-(g+1); exactly replayable in SQL as a sum of 16
    monotone threshold indicators (u16 has ≥ j leading ones iff
    u16 ≥ 2^16 − 2^(16−j))."""
    import hashlib as _hl

    h = _hl.md5(payload.encode()).hexdigest()

    def ones(u16: int) -> int:
        g = 0
        while g < 16 and (u16 >> (15 - g)) & 1:
            g += 1
        return g

    return ones(int(h[0:4], 16)), ones(int(h[4:8], 16))


def dp_geometric_counts(ds, group_col: str = "lang", seed: str = "dp1"):
    """Differentially-private grouped counts via the (two-sided) geometric
    mechanism: noise K = G1 − G2 with G1, G2 iid geometric(p=1/2) — the
    discrete Laplace with ε = ln 2 for count queries (sensitivity 1;
    Ghosh–Roughgarden–Sundararajan's universally-optimal mechanism). The
    draws are DERANDOMIZED from md5(seed:group) so the release is
    reproducible and the DuckDB oracle replays it bit-exactly (a real
    deployment would use fresh randomness and publish only ``dp_count``;
    ``n``/``noise`` are emitted here so the gate verifies the mechanism).

    Plan: per-batch Arrow partial counts (bounded group domain) → one tiny
    final merge; the noise is applied on the key-domain-sized result —
    nothing about the mechanism touches the wide data path."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table({group_col: batch.column(group_col)})
            .group_by([group_col])
            .aggregate([([], "count_all")])
        )

    tiny = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col],
        [("count_all", "sum")],
        [group_col, "n"],
    ).to_pandas()
    g1g2 = [_md5_leading_ones16(f"{seed}:{g}") for g in tiny[group_col]]
    noise = np.array([a - b for a, b in g1g2], dtype=np.int64)
    tiny["n"] = tiny["n"].astype(np.int64)
    tiny["noise"] = noise
    tiny["dp_count"] = tiny["n"] + noise
    return tiny.sort_values(group_col).reset_index(drop=True)


def dow_adjusted_spikes(ds, ts_col: str = "o_orderdate", value_col: str = "o_totalprice"):
    """Seasonality-adjusted anomaly days: daily revenue minus its
    day-of-week mean (integer floor-division cents), flagged where
    |residual| > 3 × MAD(residuals) (MAD = lower-median of absolute
    residuals) — the deseasonalize-then-robust-threshold monitor that
    ``spike_days`` (raw z-score) misses when weekly seasonality dominates.

    Plan: per-batch (day, cents) Arrow partials → tiny final merge (day
    domain is bounded by the calendar, ~2.4k keys for TPC-H) → the dow
    profile, residuals and MAD run on that key-domain-sized table. Output:
    flagged days only, (day, dow, revenue_cents, resid_cents), day ASC."""
    import pyarrow.compute as pc

    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pc.cast(batch.column(ts_col), pa.date32()),
                "v": _cents(batch.column(value_col)),
            }
        )
        return t.group_by(["day"]).aggregate([("v", "sum")])

    days = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["day"],
            [("v_sum", "sum")],
            ["day", "revenue_cents"],
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    day_arr = pa.array(pd.to_datetime(days["day"]).dt.date, pa.date32())
    days["dow"] = pc.day_of_week(day_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    rev = days["revenue_cents"].to_numpy(np.int64)
    prof = days.groupby("dow")["revenue_cents"].agg(["sum", "count"])
    dow_mean = (prof["sum"] // prof["count"]).astype(np.int64)  # all-positive: // == floor
    resid = rev - dow_mean.reindex(days["dow"]).to_numpy(np.int64)
    ab = np.sort(np.abs(resid))
    mad = int(ab[(len(ab) + 1) // 2 - 1]) if len(ab) else 0
    days["resid_cents"] = resid
    out = days[np.abs(resid) > 3 * mad][["day", "dow", "revenue_cents", "resid_cents"]]
    out = out.sort_values("day").reset_index(drop=True)
    out["day"] = pd.to_datetime(out["day"]).dt.strftime("%Y-%m-%d")
    for c in ("dow", "revenue_cents", "resid_cents"):
        out[c] = out[c].astype(np.int64)
    return out


def boundary_overlap_pairs(
    ds, text_col: str = "text", id_col: str = "doc_id", k: int = 2, cap: int = 40
):
    """Crawl-stitch candidates: ordered pairs (A, B) where A's LAST k
    word tokens equal B's FIRST k word tokens — the boundary-overlap
    signature of one page split across consecutive crawl records (or a
    chunker that re-emitted its overlap), which whole-doc dedup and
    shingle containment both miss because the shared region is tiny.
    Tokens are ``[a-z0-9]+`` runs of the lowercased text; docs with
    fewer than k tokens are skipped.

    Plan (100 TB shape): one pass emits TWO long rows per doc
    ((md5-u64(window), doc_id, side) — never text, distinct window
    strings hashed once per batch via factorize), h-hash-bucketed
    exchange, and a vectorized per-bucket heads×tails merge. Skew cap:
    a window string with more than ``cap`` docs on EITHER side is a
    boilerplate boundary (navigation chrome), emits nothing, and is
    replayed verbatim by the oracle's cap CTE — the same guard as the
    minhash/simhash pair families. Output (doc_a, doc_b), unordered
    (the driver compare sorts; a global sort here would be a pointless
    all-to-all on the wide path)."""
    import re as _re

    from ..functions.dedup import md5_u64
    from .relational import derive_buckets, hash_bucket_column

    word_re = _re.compile(r"[a-z0-9]+")

    def windows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        m = (toks.str.len() >= k).to_numpy()
        ids = batch[id_col].to_numpy()[m].astype(np.int64)
        if not len(ids):
            return pd.DataFrame(
                {
                    "h": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "side": pd.Series([], dtype=str),
                }
            )
        tk = toks[m]
        head = tk.str[:k].str.join(" ")
        tail = tk.str[-k:].str.join(" ")

        def hcol(series: pd.Series) -> np.ndarray:
            codes, uniq = pd.factorize(series.to_numpy())
            hv = np.array(
                [md5_u64(("bnd:" + u).encode()) for u in uniq], dtype=np.uint64
            )
            return hv[codes].view(np.int64)

        return pd.DataFrame(
            {
                "h": np.concatenate([hcol(head), hcol(tail)]),
                "doc_id": np.concatenate([ids, ids]),
                "side": np.array(["h"] * len(ids) + ["t"] * len(ids)),
            }
        )

    long = ds.map_batches(windows, batch_format="pandas")
    buckets = derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "h", buckets)

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        # per-window-side counts -> cap filter, then ONE vectorized merge
        cnt = g.groupby(["h", "side"]).size().unstack(fill_value=0)
        for c in ("h", "t"):
            if c not in cnt.columns:
                cnt[c] = 0
        ok = cnt[(cnt["h"] <= cap) & (cnt["t"] <= cap)].index
        g = g[g["h"].isin(ok)]
        heads = g[g["side"] == "h"][["h", "doc_id"]].rename(columns={"doc_id": "doc_b"})
        tails = g[g["side"] == "t"][["h", "doc_id"]].rename(columns={"doc_id": "doc_a"})
        out = tails.merge(heads, on="h")
        out = out[out["doc_a"] != out["doc_b"]][["doc_a", "doc_b"]]
        return out.astype({"doc_a": "int64", "doc_b": "int64"})

    return (
        long.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_join, batch_format="pandas")
    )


def l_diversity_audit(
    ds,
    qi_cols: tuple = ("event_type",),
    ts_col: str = "ts",
    sensitive: str = "user_id",
    l: int = 5,
):
    """l-diversity audit: for each quasi-identifier cell (here
    (event_type, day)), how many DISTINCT sensitive values (users) it
    contains — the release-safety check k-anonymity misses: a cell can
    be large (k-safe) yet point at a handful of people. Cells with
    ``n_users < l`` are flagged ``at_risk``; ALL cells are emitted so
    the audit is non-vacuous on safe data.

    Plan: per batch, group to (cell, user, n) partials (the only
    dedup-safe projection), then ONE exchange bucketed on the chr(31)
    cell‖user key — every (cell, user) pair lands wholly in one bucket,
    so per-bucket nunique/sum partials ADD across buckets — and a tiny
    final fold over the bounded cell domain. Output
    (event_type, day, n_events, n_users, at_risk), cell ASC."""
    import pyarrow.compute as pc

    from .relational import hash_bucket_column, tiny_final_groupby

    SEP = chr(31)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                **{c: batch[c] for c in qi_cols},
                "day": batch[ts_col].dt.strftime("%Y-%m-%d"),
                "u": batch[sensitive],
            }
        )
        g = df.groupby([*qi_cols, "day", "u"], sort=False).size().rename("n").reset_index()
        g["__key"] = (
            g[list(qi_cols)].astype(str).agg(SEP.join, axis=1)
            + SEP + g["day"] + SEP + g["u"].astype(str)
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "__key", 32)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.groupby([*qi_cols, "day", "u"], sort=False)["n"].sum().reset_index()
        cell = pairs.groupby([*qi_cols, "day"], sort=False).agg(
            n_events=("n", "sum"), n_users=("u", "size")
        ).reset_index()
        return cell.astype({"n_events": "int64", "n_users": "int64"})

    cells = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas"),
        [*qi_cols, "day"],
        [("n_events", "sum"), ("n_users", "sum")],
        [*qi_cols, "day", "n_events", "n_users"],
    ).to_pandas()
    cells["at_risk"] = (cells["n_users"] < l).astype(np.int64)
    out = cells.sort_values([*qi_cols, "day"]).reset_index(drop=True)
    for c in ("n_events", "n_users", "at_risk"):
        out[c] = out[c].astype(np.int64)
    return out


_PAD_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


def padding_waste_by_bucket(ds, text_col: str = "text"):
    """Length-bucketed batching audit: assign each doc to the smallest
    power-of-two token bucket ≥ its whitespace-token count (min 16, the
    _PAD_BUCKETS ladder) and measure the padding a bucket-batched
    trainer would burn — the number that justifies sequence PACKING
    (``pack_sequences``) over naive length-bucketing. ``waste_ppm`` is
    exact integer ppm of padded slots per bucket.

    Plan: one pass of per-batch (bucket, n_docs, sum_tokens) partials
    (np.searchsorted on the bounded ladder — no log2 floats to drift
    from the oracle's CASE chain), tiny final fold over ≤10 buckets.
    Docs longer than the top bucket clamp into it (waste floors at 0;
    documented, replayed by the oracle)."""
    from ..functions import textstats as ts
    from .relational import tiny_final_groupby

    ladder = np.array(_PAD_BUCKETS, dtype=np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[text_col].fillna("").str.count(ts._WS_TOKEN).to_numpy(np.int64)
        idx = np.minimum(np.searchsorted(ladder, n, side="left"), len(ladder) - 1)
        df = pd.DataFrame({"bucket": ladder[idx], "n": n})
        g = df.groupby("bucket", sort=False).agg(
            n_docs=("n", "size"), sum_tokens=("n", "sum")
        ).reset_index()
        return g.astype({"bucket": "int64", "n_docs": "int64", "sum_tokens": "int64"})

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["bucket"],
            [("n_docs", "sum"), ("sum_tokens", "sum")],
            ["bucket", "n_docs", "sum_tokens"],
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    cap = out["bucket"].to_numpy(np.int64) * out["n_docs"].to_numpy(np.int64)
    waste = np.maximum(cap - out["sum_tokens"].to_numpy(np.int64), 0)
    out["waste_tokens"] = waste
    out["waste_ppm"] = waste * 1_000_000 // np.maximum(cap, 1)
    for c in ("bucket", "n_docs", "sum_tokens", "waste_tokens", "waste_ppm"):
        out[c] = out[c].astype(np.int64)
    return out


def order_total_reconciliation(orders, lineitem, buckets: int | None = None):
    """Cross-table reconciliation audit: does each order's header total
    equal the sum of its line items' ``extendedprice × (1−discount) ×
    (1+tax)``? The ingest-consistency gate every warehouse runs between
    a header table and its detail table. Per-status summary:
    (o_orderstatus, n_orders, n_exact, sum_abs_diff_cents,
    max_abs_diff_cents) — a bounded output whatever the mismatch rate.

    Plan (100 TB shape): line items collapse to per-batch (orderkey,
    cents) partials BEFORE the exchange (map-side combine), both sides
    union into ONE orderkey-bucketed shuffle of 3-int rows, each bucket
    folds its orders (header cents − detail cents, LEFT-join semantics:
    detail-less orders diff against 0, orphan details drop) into a
    bounded per-status partial, and a tiny final merge finishes. The
    cents kernel is the proven float chain (left-assoc IEEE products,
    then floor) the revenue family already replays exactly in SQL."""
    from .relational import derive_buckets, hash_bucket_column, tiny_final_groupby

    if buckets is None:
        buckets = derive_buckets(max(orders.count(), lineitem.count()))

    def norm_orders(batch: pa.Table) -> pa.Table:
        oc = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "k": batch.column("o_orderkey"),
                "status": batch.column("o_orderstatus"),
                "oc": pa.array(oc, pa.int64()),
                "lc": pa.array(np.zeros(len(oc), np.int64), pa.int64()),
            }
        )
        return hash_bucket_column(t, "k", buckets)

    def norm_lineitem(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dis = batch.column("l_discount").to_numpy(zero_copy_only=False)
        tax = batch.column("l_tax").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1 - dis) * (1 + tax) * 100.0 + 0.5).astype(np.int64)
        part = (
            pa.table({"k": batch.column("l_orderkey"), "lc": pa.array(cents, pa.int64())})
            .group_by(["k"])
            .aggregate([("lc", "sum")])
        )
        n = part.num_rows
        t = pa.table(
            {
                "k": part.column("k"),
                "status": pa.array([""] * n, pa.string()),
                "oc": pa.array(np.zeros(n, np.int64), pa.int64()),
                "lc": part.column("lc_sum"),
            }
        )
        return hash_bucket_column(t, "k", buckets)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("k", sort=False).agg(
            status=("status", "max"), oc=("oc", "sum"), lc=("lc", "sum")
        )
        per = per[per["status"] != ""]  # orphan details: no header row
        diff = per["oc"].to_numpy(np.int64) - per["lc"].to_numpy(np.int64)
        per = per.assign(ad=np.abs(diff), ex=(diff == 0).astype(np.int64))
        out = per.groupby("status", sort=False).agg(
            n_orders=("ad", "size"),
            n_exact=("ex", "sum"),
            sum_abs_diff_cents=("ad", "sum"),
            max_abs_diff_cents=("ad", "max"),
        ).reset_index().rename(columns={"status": "o_orderstatus"})
        return out.astype(
            {c: "int64" for c in ("n_orders", "n_exact", "sum_abs_diff_cents", "max_abs_diff_cents")}
        )

    o_long = orders.map_batches(norm_orders, batch_format="pyarrow")
    l_long = lineitem.map_batches(norm_lineitem, batch_format="pyarrow")
    partials = o_long.union(l_long).groupby("__bucket").map_groups(
        bucket_fold, batch_format="pandas"
    )
    out = (
        tiny_final_groupby(
            partials,
            ["o_orderstatus"],
            [
                ("n_orders", "sum"),
                ("n_exact", "sum"),
                ("sum_abs_diff_cents", "sum"),
                ("max_abs_diff_cents", "max"),
            ],
            ["o_orderstatus", "n_orders", "n_exact", "sum_abs_diff_cents", "max_abs_diff_cents"],
        )
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    for c in ("n_orders", "n_exact", "sum_abs_diff_cents", "max_abs_diff_cents"):
        out[c] = out[c].astype(np.int64)
    return out


def mattr_by_lang(ds, text_col: str = "text", lang_col: str = "lang",
                  window: int = 25):
    """MATTR lexical diversity per language (Covington & McFall 2010):
    moving-average type-token ratio over a fixed token window -- the
    length-robust replacement for raw TTR (which collapses as docs grow).
    Per doc: mean over all n-W+1 windows of distinct(window)/W (docs
    shorter than W use their single full window); integerized as
    S * 10^6 // (W * n_windows) so the SQL replay is exact. Zero-token
    docs are excluded from both count and mean.

    Scale shape: the sliding distinct count is ONE amortized-O(n) pass
    per doc map-side (add/remove dict counts); only (lang, ppm-sum,
    doc-count) partials reach the tiny final exchange.

    Returns (lang, n_docs, mean_mattr_ppm)."""
    import re as _re

    from .relational import tiny_final_groupby

    word_re = _re.compile(r"[a-z0-9]+")

    def doc_mattr_ppm(toks: list) -> int | None:
        n = len(toks)
        if n == 0:
            return None
        if n < window:
            return len(set(toks)) * 1_000_000 // n
        counts: dict = {}
        distinct = 0
        s_sum = 0
        for i, t in enumerate(toks):
            c = counts.get(t, 0)
            if c == 0:
                distinct += 1
            counts[t] = c + 1
            if i >= window:
                old = toks[i - window]
                counts[old] -= 1
                if counts[old] == 0:
                    distinct -= 1
            if i >= window - 1:
                s_sum += distinct
        return s_sum * 1_000_000 // (window * (n - window + 1))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {}
        for lang, text in zip(batch[lang_col], batch[text_col].fillna("")):
            ppm = doc_mattr_ppm(word_re.findall(text.lower()))
            if ppm is None:
                continue
            rows.setdefault(lang, []).append(ppm)
        return pd.DataFrame({
            "lang": list(rows),
            "n": pd.Series([len(v) for v in rows.values()], dtype=np.int64),
            "ppm_sum": pd.Series([sum(v) for v in rows.values()], dtype=np.int64),
        })

    agg = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], [("n", "sum"), ("ppm_sum", "sum")],
        ["lang", "n_docs", "ppm_sum"],
    ).to_pandas()
    agg["mean_mattr_ppm"] = (
        agg["ppm_sum"].astype(np.int64) // agg["n_docs"].clip(lower=1)
    ).astype(np.int64)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg[["lang", "n_docs", "mean_mattr_ppm"]].sort_values(
        "lang").reset_index(drop=True)


def gopher_quality_flags(ds, id_col: str = "doc_id", text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mwl_x100: int = 300, max_mwl_x100: int = 1000,
                         min_stop_hits: int = 2):
    """Gopher-style quality-rule flags (Rae et al. 2021, Table A1 subset):
    per doc, integer 0/1 flags for the word-count window, the mean-word-
    length window (3-10 chars, x100 fixed point), the symbol-to-word
    ratio (# and ellipsis runs; <= 0.1 as 10*symbols <= words) and the
    >= 2-stopwords rule, plus their AND as ``keep`` -- the composite gate
    the Gopher/MassiveText cleaning pipeline applies before dedup. All
    map-side integer arithmetic (ppm-free: pure counts and fixed-point),
    no exchange; the oracle replays each count with the shared stopword
    list (textstats.STOPWORDS, same set the quality/langid oracles use).

    Returns (doc_id, f_word_count, f_mean_word_len, f_symbol_ratio,
    f_stopwords, keep)."""

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        f = gopher_flag_arrays(
            batch[text_col], min_words=min_words, max_words=max_words,
            min_mwl_x100=min_mwl_x100, max_mwl_x100=max_mwl_x100,
            min_stop_hits=min_stop_hits)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(np.int64), **f})

    return ds.map_batches(flags, batch_format="pandas")


def gopher_flag_arrays(texts: pd.Series, *, min_words: int = 50,
                       max_words: int = 100_000, min_mwl_x100: int = 300,
                       max_mwl_x100: int = 1000, min_stop_hits: int = 2):
    """Vectorized Gopher-rule flag arrays for a text Series -- the shared
    kernel behind ``gopher_quality_flags`` and the ingest daemon's
    ``gopher=True`` hygiene mode (one implementation, no drift)."""
    from ..functions import textstats as ts

    s = texts.fillna("")
    n_words = s.str.count(r"\S+").to_numpy(np.int64)
    wchars = s.str.replace(r"\s+", "", regex=True).str.len().to_numpy(np.int64)
    mwl100 = wchars * 100 // np.maximum(n_words, 1)
    n_sym = (s.str.count("#") + s.str.count(r"\.\.\.")).to_numpy(np.int64)
    stop_hits = s.str.lower().str.count(ts._ALL_STOP_RE).to_numpy(np.int64)
    f_wc = ((n_words >= min_words) & (n_words <= max_words)).astype(np.int64)
    f_mwl = ((mwl100 >= min_mwl_x100) & (mwl100 <= max_mwl_x100)).astype(np.int64)
    f_sym = (10 * n_sym <= n_words).astype(np.int64)
    f_stop = (stop_hits >= min_stop_hits).astype(np.int64)
    return {
        "f_word_count": f_wc,
        "f_mean_word_len": f_mwl,
        "f_symbol_ratio": f_sym,
        "f_stopwords": f_stop,
        "keep": f_wc & f_mwl & f_sym & f_stop,
    }


def chao1_vocab_estimate(ds, text_col: str = "text"):
    """Chao1 unseen-vocabulary estimate + Good-Turing sample coverage:
    from the vocabulary's singleton/doubleton counts, how many types the
    corpus has NOT yet shown -- the how-much-more-vocabulary-is-out-there
    number a crawl-sizing decision reads (Chao 1984 species richness;
    Good 1953 coverage). Bias-corrected integer-exact form:

        v_chao1      = V + f1*(f1-1) // (2*(f2+1))
        coverage_ppm = (N - f1) * 10^6 // N      (N = token occurrences)

    Tokens are the ``[a-z0-9]+`` runs of the lowercased text (the
    vocab_pruning_plan tokenization; same word-frequency CTE in the
    oracle). Plan (100 TB shape): ONE (token, n) count exchange, then the
    unbounded vocabulary collapses to four per-block scalar partials
    (types, f1, f2, occurrences) -- the driver fold is 4 ints per block,
    vocabulary-size-independent (the ams_f2_audit discipline).

    Returns one row: (v_obs, f1, f2, v_chao1, coverage_ppm)."""
    import re as _re

    from .relational import bucketed_grouped_sum

    word_re = _re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "token", "n"
    )

    def scalar_partials(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "v": pd.Series([len(n)], dtype=np.int64),
            "f1": pd.Series([int((n == 1).sum())], dtype=np.int64),
            "f2": pd.Series([int((n == 2).sum())], dtype=np.int64),
            "occ": pd.Series([int(n.sum())], dtype=np.int64),
        })

    p = counts.map_batches(scalar_partials, batch_format="pandas").to_pandas()
    if len(p) == 0:
        v = f1 = f2 = occ = 0
    else:
        v, f1, f2, occ = (int(p[c].sum()) for c in ("v", "f1", "f2", "occ"))
    v_chao1 = v + f1 * (f1 - 1) // (2 * (f2 + 1))
    coverage_ppm = (occ - f1) * 1_000_000 // max(occ, 1)
    return pd.DataFrame({
        "v_obs": pd.Series([v], dtype=np.int64),
        "f1": pd.Series([f1], dtype=np.int64),
        "f2": pd.Series([f2], dtype=np.int64),
        "v_chao1": pd.Series([v_chao1], dtype=np.int64),
        "coverage_ppm": pd.Series([coverage_ppm], dtype=np.int64),
    })


def vocab_pruning_plan(ds, text_col: str = "text", thresholds=(1, 2, 5, 10, 100)):
    """Tokenizer min-count pruning plan: for each candidate ``min_count``
    threshold, how many vocabulary types survive and what fraction of
    token OCCURRENCES falls out-of-vocabulary — the table a tokenizer /
    embedding trainer reads to pick its cutoff. Tokens are ``[a-z0-9]+``
    runs of the lowercased text (the bpe_merge_candidates tokenization).

    Plan (100 TB shape): one token-count exchange ((token, n) partials,
    Zipf-deduped per batch), then the UNBOUNDED vocabulary collapses to
    its FREQUENCY HISTOGRAM (distinct count values ≪ distinct tokens —
    a second, tiny exchange), and every threshold folds from that
    histogram at the driver. Output per threshold:
    (min_count, kept_types, oov_types, kept_occurrences, oov_ppm)."""
    import re as _re

    from .relational import bucketed_grouped_sum, tiny_final_groupby

    word_re = _re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "token", "n"
    )

    def fhist(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("n", sort=False).size().rename("n_types").reset_index()
        g = g.rename(columns={"n": "f"})
        return g.astype({"f": "int64", "n_types": "int64"})

    hist = tiny_final_groupby(
        counts.map_batches(fhist, batch_format="pandas"),
        ["f"],
        [("n_types", "sum")],
        ["f", "n_types"],
    ).to_pandas()
    f = hist["f"].to_numpy(np.int64)
    nt = hist["n_types"].to_numpy(np.int64)
    total_occ = int((f * nt).sum())
    total_types = int(nt.sum())
    rows = []
    for t in thresholds:
        keep = f >= t
        kept_types = int(nt[keep].sum())
        kept_occ = int((f[keep] * nt[keep]).sum())
        oov = total_occ - kept_occ
        rows.append(
            (
                int(t),
                kept_types,
                total_types - kept_types,
                kept_occ,
                oov * 1_000_000 // max(total_occ, 1),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["min_count", "kept_types", "oov_types", "kept_occurrences", "oov_ppm"],
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


_CDC_B, _CDC_M, _CDC_W, _CDC_MASK = 257, 2147483647, 16, 63
_CDC_POW = np.array(
    [pow(_CDC_B, _CDC_W - 1 - j, _CDC_M) for j in range(_CDC_W)], dtype=np.int64
)


def winnow_fingerprint_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 8,
    cap: int = 40,
    min_shared: int = 5,
):
    """Winnowing copy detection (Schleimer-Wilkerson-Aiken, the MOSS
    algorithm): each doc is reduced to the set of window-minimum k-gram
    hashes — winnowing GUARANTEES any shared substring of length
    ≥ k+w−1 yields at least one shared fingerprint — and pairs sharing
    ≥ ``min_shared`` fingerprints are reported with their shared count.
    The positional robust complement of MinHash (which estimates
    whole-doc similarity, not contained copies).

    Determinism: the winnowing key packs (31-bit polynomial gram hash,
    20-bit reversed position) into one int64, so the window MIN itself
    encodes the rightmost-tie rule and both sides replay it with a
    single ``MIN() OVER (ROWS w−1 PRECEDING)`` — no argmin logic. The
    gram hash is the cdc_chunk_dedup polynomial (k terms mod 2^31−1
    over codepoints, int64-safe, generated term-for-term into the
    oracle) — measured ~6× cheaper than per-gram md5 because NO gram
    string is ever materialized: the whole batch's codepoints
    concatenate once (k−1 sentinel gap between docs) and ONE
    sliding-window matmul hashes every gram of every doc. 31-bit hash
    collisions merge fingerprints IDENTICALLY on both sides (the oracle
    joins on the same hash), so the compare stays exact. Prefix windows
    (< w grams in) are included by both sides; docs shorter than k
    grams emit nothing; positions clamp at 2^20−1 (1 MB docs).

    Plan (100 TB shape): stage 1 is embarrassingly parallel and fully
    batch-vectorized; the exchange moves only distinct
    (fingerprint, doc_id) int rows; hot fingerprints past ``cap`` docs
    are boilerplate and drop (cap CTE in the oracle);
    per-fingerprint-bucket pair partials fold through ONE pair-keyed
    groupby sum. Output (doc_a, doc_b, n_shared), doc_a < doc_b."""
    from numpy.lib.stride_tricks import sliding_window_view

    from .relational import derive_buckets, hash_bucket_column

    POSBITS = 20
    POSMAX = (1 << POSBITS) - 1
    M = _CDC_M
    powvec = np.array([pow(_CDC_B, k - 1 - j, M) for j in range(k)], dtype=np.int64)

    def prints(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"hh": pd.Series([], dtype=np.int64), "doc_id": pd.Series([], dtype=np.int64)}
        )
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].fillna("").str.lower().tolist()
        cps, offs, lens = [], [], []
        gap = np.full(k - 1, 0x110000, np.int64)  # sentinel > any codepoint
        off = 0
        for s in texts:
            cp = np.frombuffer(s.encode("utf-32-le"), np.uint32).astype(np.int64)
            cps.append(cp)
            cps.append(gap)
            offs.append(off)
            lens.append(len(cp))
            off += len(cp) + k - 1
        concat = np.concatenate(cps) if cps else np.zeros(0, np.int64)
        if len(concat) < k:
            return empty
        # ONE matmul hashes every k-gram of every doc; windows that cross
        # a sentinel gap fall between the per-doc slices and are never read
        hw_full = (sliding_window_view(concat, k) @ powvec) % M
        out_hh, out_doc = [], []
        big = np.iinfo(np.int64).max
        for d, o, L in zip(ids, offs, lens):
            n = L - k + 1
            if n < 1:
                continue
            key = (hw_full[o : o + n] << POSBITS) | (
                POSMAX - np.minimum(np.arange(n, dtype=np.int64), POSMAX)
            )
            ww = min(w, n)
            padded = np.concatenate([np.full(ww - 1, big, np.int64), key])
            sel = np.unique(sliding_window_view(padded, ww).min(axis=1))
            hh = np.unique(sel >> POSBITS)
            out_hh.append(hh)
            out_doc.append(np.full(len(hh), d, np.int64))
        if not out_hh:
            return empty
        return pd.DataFrame(
            {"hh": np.concatenate(out_hh), "doc_id": np.concatenate(out_doc)}
        )

    buckets = derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "hh", buckets)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("hh", sort=False)["doc_id"].transform("size")
        g = g[sz <= cap]
        m = g.merge(g, on="hh", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = (
            m.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .size()
            .rename("n")
            .reset_index()
            .rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})
        )
        return out.astype({"doc_a": "int64", "doc_b": "int64", "n": "int64"})

    partials = (
        ds.map_batches(prints, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # pair-keyed fold: Ray's native sort-aggregate on the 2-column key
    # measured 25 s on 107k partial rows at sf0.1 (vs 0.9 s for the
    # derived-key fold, now shared as relational.grouped_pair_fold)
    from .relational import grouped_pair_fold

    folded = grouped_pair_fold(
        partials, ["doc_a", "doc_b"], {"n_shared": ("n", "sum")}
    )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        out = g[g["n_shared"] >= min_shared]
        return out.astype({"doc_a": "int64", "doc_b": "int64", "n_shared": "int64"})

    return folded.map_batches(keep, batch_format="pandas")


def cdc_chunk_dedup(ds, text_col: str = "text"):
    """Content-defined chunking dedup audit (the rsync/LBFS/casync
    storage primitive): split every document at positions where a
    W=16-char polynomial rolling hash ≡ 0 (mod 64), then measure how
    much a chunk store would save — duplicated chunks (shared
    boilerplate, partial copies) are stored ONCE even when whole-doc
    and shingle dedup both miss them. Boundaries are content-defined,
    so an insertion only reshapes its own chunk, not every later one
    (the property fixed-size blocks lack).

    Exactness: the hash is 16 integer products mod 2^31−1 over unicode
    codepoints — term ≤ 2^51, sum ≤ 2^55, int64-safe — replayed
    term-for-term by the oracle's generated SQL expression; chunk
    identity downstream is md5-u64 ('cdc:'‖chunk, collision-free at 64
    bits vs the oracle's DISTINCT on the chunk string). No min/max
    chunk bounds (production CDC adds them; the replayable semantics
    don't change). Lengths are CHARACTERS on both sides.

    Plan (100 TB shape): stage 1 is embarrassingly parallel and emits
    per-batch pre-grouped (chunk-hash, chars, n) partials — never chunk
    text; ONE hash-bucketed exchange makes distinct-fold partials add;
    a 4-counter tiny merge finishes. Output one row:
    (n_chunks, n_distinct_chunks, total_chars, stored_chars,
    saving_ppm)."""
    import hashlib as _hl

    from numpy.lib.stride_tricks import sliding_window_view

    from .relational import derive_buckets, hash_bucket_column

    W, M, MASK = _CDC_W, _CDC_M, _CDC_MASK

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        hs, ls = [], []
        for s in batch[text_col].fillna(""):
            L = len(s)
            if L == 0:
                continue
            if L >= W:
                cp = np.frombuffer(s.encode("utf-32-le"), np.uint32).astype(np.int64)
                hw = (sliding_window_view(cp, W) @ _CDC_POW) % M
                ends = np.flatnonzero(hw % (MASK + 1) == 0) + W  # 1-based ends
                cuts = np.unique(np.append(ends, L))
            else:
                cuts = np.array([L], dtype=np.int64)
            prev = 0
            for cut in cuts:
                c = int(cut)
                chunk = s[prev:c]
                hs.append(
                    int.from_bytes(
                        _hl.md5(("cdc:" + chunk).encode()).digest()[:8], "big"
                    )
                    >> 1
                )
                ls.append(c - prev)
                prev = c
        if not hs:
            return pd.DataFrame(
                {
                    "h": pd.Series([], dtype=np.int64),
                    "chars": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        df = pd.DataFrame(
            {"h": np.array(hs, np.int64), "chars": np.array(ls, np.int64)}
        )
        g = df.groupby(["h", "chars"], sort=False).size().rename("n").reset_index()
        return g.astype({"h": "int64", "chars": "int64", "n": "int64"})

    buckets = derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "h", buckets)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("h", sort=False).agg(n=("n", "sum"), chars=("chars", "first"))
        return pd.DataFrame(
            {
                "n_chunks": [int(per["n"].sum())],
                "n_distinct_chunks": [len(per)],
                "total_chars": [int((per["n"] * per["chars"]).sum())],
                "stored_chars": [int(per["chars"].sum())],
            }
        ).astype("int64")

    tot = (
        ds.map_batches(chunks, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    total = int(tot["total_chars"])
    stored = int(tot["stored_chars"])
    out = pd.DataFrame(
        {
            "n_chunks": [int(tot["n_chunks"])],
            "n_distinct_chunks": [int(tot["n_distinct_chunks"])],
            "total_chars": [total],
            "stored_chars": [stored],
            "saving_ppm": [(total - stored) * 1_000_000 // max(total, 1)],
        }
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def gdpr_erasure_plan(sf_dir: str, mod: int = 50):
    """Right-to-be-forgotten erasure plan: given a deletion cohort of
    customers (here derived deterministically — custkeys whose
    md5-u64('gdpr:'‖key) ≡ 0 mod ``mod``, ~2% — standing in for the
    externally-supplied request list), count the rows each table must
    erase and how many distinct subjects they touch: the sizing pass a
    compliance pipeline runs before executing deletes. A real external
    list would broadcast via ``ray.put`` and filter with ``isin`` (the
    ``novel_docs`` pattern); the derived predicate keeps the plan fully
    map-side AND bit-exactly oracle-checkable.

    Plan: each table's scan filters map-side (the md5 is computed once
    per DISTINCT key per batch — keys repeat in fact tables), folds to
    per-batch (table, user, n) partials, and ONE table‖user-bucketed
    exchange makes the distinct-subject counts add (the
    ``l_diversity_audit`` fold). Output
    (tbl, n_rows_to_erase, n_users_to_erase), tbl ASC."""
    import ray.data as rd

    from ..functions.dedup import md5_u64
    from .relational import hash_bucket_column, tiny_final_groupby

    SEP = chr(31)
    specs = [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ]

    def make_partial(tbl: str, col: str):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            u = batch[col].to_numpy(np.int64)
            codes, uniq = pd.factorize(u)
            hit = np.array(
                [md5_u64(f"gdpr:{v}".encode()) % mod == 0 for v in uniq], dtype=bool
            )
            keep = hit[codes]
            if not keep.any():
                return pd.DataFrame(
                    {
                        "tbl": pd.Series([], dtype=str),
                        "u": pd.Series([], dtype=np.int64),
                        "n": pd.Series([], dtype=np.int64),
                    }
                )
            g = (
                pd.Series(u[keep]).value_counts().rename("n").reset_index()
                .rename(columns={"index": "u"})
            )
            g.columns = ["u", "n"]
            g.insert(0, "tbl", tbl)
            return g.astype({"u": "int64", "n": "int64"})

        return partial

    longs = []
    for tbl, col in specs:
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet", columns=[col])
        longs.append(ds.map_batches(make_partial(tbl, col), batch_format="pandas"))
    long = longs[0].union(*longs[1:])

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__key"] = batch["tbl"] + SEP + batch["u"].astype(str)
        return batch

    def key_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "__key", 32)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["tbl", "u"], sort=False)["n"].sum().reset_index()
        out = per.groupby("tbl", sort=False).agg(
            n_rows_to_erase=("n", "sum"), n_users_to_erase=("u", "size")
        ).reset_index()
        return out.astype({"n_rows_to_erase": "int64", "n_users_to_erase": "int64"})

    out = (
        tiny_final_groupby(
            long.map_batches(add_bucket, batch_format="pandas")
            .map_batches(key_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_fold, batch_format="pandas"),
            ["tbl"],
            [("n_rows_to_erase", "sum"), ("n_users_to_erase", "sum")],
            ["tbl", "n_rows_to_erase", "n_users_to_erase"],
        )
        .to_pandas()
        .set_index("tbl")
        # a table whose cohort slice is empty still reports a 0 row (the
        # oracle's COUNT over an empty filter does; so must the engine)
        .reindex([t for t, _ in specs], fill_value=0)
        .reset_index()
        .sort_values("tbl")
        .reset_index(drop=True)
    )
    for c in ("n_rows_to_erase", "n_users_to_erase"):
        out[c] = out[c].astype(np.int64)
    return out


def max_coverage_select(ds, k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """Greedy max-coverage corpus selection (submodular curation, the
    lazy-greedy baseline of facility-location data selection): pick k
    documents one at a time, each maximizing the number of NOT-YET-
    COVERED word bigrams it contributes (ties → smallest doc_id; a
    round with no positive gain stops the selection). The marginal-gain
    objective is what separates this from ``budget_select`` (modular
    score-sort): each round's scores depend on everything already
    chosen. Bigrams, not unigrams, so coverage does not saturate on a
    small vocabulary. The covered set broadcasts as a SORTED int64
    array (zero-copy from the object store; searchsorted membership),
    not a Python set.

    Plan (100 TB shape): the corpus is tokenized ONCE into a
    materialized COMPACT projection — distinct (doc_id, bigram-md5-u64)
    int rows, built by the vectorized shifted-compare pairing with
    per-batch factorize-dedup before hashing — and every greedy round
    runs over that int table, not the text (the bm25 two-consumer
    materialize pattern; measured 12.8 s → ~4 s at sf0.1). Each round
    broadcasts the covered hash set once (``ray.put``) and only the
    block WINNER'S row (id, gain, its new hashes) leaves a task —
    driver state is k rounds × blocks winner rows, never the corpus.
    64-bit bigram hashing is collision-free at corpus scale vs the
    oracle's DISTINCT on the bigram strings (the boundary_overlap_pairs
    equivalence). Returns (round, doc_id, gain, covered_total)."""
    import hashlib as _hl

    import ray

    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")

    def bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "h": pd.Series([], dtype=np.int64)}
        )
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        docs = batch[id_col].to_numpy(np.int64)
        ex = toks.reset_index(drop=True).explode().dropna()
        if len(ex) < 2:
            return empty
        idx = ex.index.to_numpy(np.int64)
        t = ex.to_numpy()
        same = idx[1:] == idx[:-1]
        if not same.any():
            return empty
        big = pd.Series(t[:-1][same]).str.cat(pd.Series(t[1:][same]), sep=" ")
        codes, uniq = pd.factorize(big.to_numpy())
        hv = np.array(
            [
                int.from_bytes(_hl.md5(("mc:" + u).encode()).digest()[:8], "big")
                for u in uniq
            ],
            dtype=np.uint64,
        ).view(np.int64)
        out = pd.DataFrame(
            {"doc_id": docs[idx[:-1][same]], "h": hv[codes]}
        ).drop_duplicates()
        return out.astype({"doc_id": "int64", "h": "int64"})

    # one doc-bucketed exchange pins every doc's rows into ONE block
    # (Ray's dynamic block splitting could otherwise split a doc across
    # blocks and silently undercount a per-block winner); rounds then
    # map per-block with batch_size=None
    from .relational import derive_buckets, hash_bucket_column

    buckets = derive_buckets(ds.count())

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "doc_id", buckets)

    compact = (
        ds.map_batches(bigrams, batch_format="pandas")
        .map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: g, batch_format="pandas")
        .materialize()
    )

    covered: set = set()
    out_rows = []
    for rnd in range(1, k + 1):
        # task pool, not actor pool: a fresh actor pool per round pays
        # ~1 s spin-up x k rounds; a closure over the ray.put handle is
        # a local object-store get per task (blocks are few at
        # batch_size=None)
        cov_ref = ray.put(np.array(sorted(covered), dtype=np.int64))

        def gain_fn(batch: pd.DataFrame, _ref=cov_ref) -> pd.DataFrame:
            cov = ray.get(_ref)
            empty = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "gain": pd.Series([], dtype=np.int64),
                    "newtoks": pd.Series([], dtype=object),
                }
            )
            h = batch["h"].to_numpy(np.int64)
            # sorted-array membership: zero-copy from the object store,
            # no per-round set deserialization
            if len(cov):
                pos = np.searchsorted(cov, h)
                pos[pos == len(cov)] = len(cov) - 1
                mask = cov[pos] != h
            else:
                mask = np.ones(len(h), dtype=bool)
            df = batch[mask]
            if not len(df):
                return empty
            gains = df.groupby("doc_id", sort=False).size().sort_index()
            win = int(gains.idxmax())  # first max after sort = min id
            new = df[df["doc_id"] == win]["h"].tolist()
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([win], dtype=np.int64),
                    "gain": pd.Series([len(new)], dtype=np.int64),
                    "newtoks": pd.Series([new], dtype=object),
                }
            )

        blocks = compact.map_batches(
            gain_fn, batch_format="pandas", batch_size=None
        ).to_pandas()
        # an all-empty round yields a schema-less empty frame: selection done
        if blocks.empty or "gain" not in blocks.columns:
            break
        blocks = blocks[blocks["gain"] > 0]
        if not len(blocks):
            break
        blocks = blocks.sort_values(["gain", "doc_id"], ascending=[False, True])
        winner = blocks.iloc[0]
        covered |= set(winner["newtoks"])
        out_rows.append(
            (rnd, int(winner["doc_id"]), int(winner["gain"]), len(covered))
        )
    out = pd.DataFrame(
        out_rows, columns=["round", "doc_id", "gain", "covered_total"]
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


# content-safety screening categories: term lists are opaque inputs in a
# real deployment (brand-safety / toxicity lexicons); these defaults are
# drawn from the synthetic corpus vocabulary so the screen is non-vacuous
# on the test tables
SCREEN_CATEGORIES: dict[str, tuple] = {
    "speed": ("fast", "slow"),
    "structure": ("table", "row", "line"),
    "ops": ("scan", "merge", "join"),
}


def blocklist_screen(ds, categories: dict | None = None, text_col: str = "text",
                     lang_col: str = "lang"):
    """Content-safety blocklist screen: per (category, lang), how many
    docs contain ≥1 whole-token hit from the category's term list and
    the total hit count — the lexicon pre-filter (brand-safety /
    toxicity / spam lists) that runs before any model-based screen.
    Whole-token semantics via ``textstats._stop_regex`` (lookaround-
    pinned maximal [a-z]+ runs — ONE vectorized ``str.count`` per
    category), the construction already proven char-for-char equal to
    the oracle's tokenize + list_contains replay on the stopword
    kernels. Zero cells are kept: a lang with no hits still reports.

    Plan: per batch, |categories| str.counts + one bounded
    (category, lang) partial; tiny final merge. Purely map-side —
    nothing about the screen touches a shuffle."""
    from ..functions import textstats as ts
    from .relational import tiny_final_groupby

    cats = categories or SCREEN_CATEGORIES
    regs = {c: ts._stop_regex(set(words)) for c, words in cats.items()}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].fillna("").str.lower()
        lang = batch[lang_col]
        outs = []
        for c, rx in regs.items():
            hits = low.str.count(rx).astype(np.int64)
            g = pd.DataFrame({"lang": lang, "h": hits}).groupby("lang", sort=False).agg(
                n_docs=("h", lambda s: int((s > 0).sum())), n_hits=("h", "sum")
            ).reset_index()
            g.insert(0, "category", c)
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        return out.astype({"n_docs": "int64", "n_hits": "int64"})

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["category", "lang"],
            [("n_docs", "sum"), ("n_hits", "sum")],
            ["category", "lang", "n_docs", "n_hits"],
        )
        .to_pandas()
        .sort_values(["category", "lang"])
        .reset_index(drop=True)
    )
    for c in ("n_docs", "n_hits"):
        out[c] = out[c].astype(np.int64)
    return out


def boundary_stitch_chains(ds, collect_cap_rows: int = 2_000_000, **kwargs):
    """Crawl-stitch CHAINS: connected components over the
    ``boundary_overlap_pairs`` edge set (A's tail == B's head), reported
    as a chain-size histogram (chain_size, n_chains) — a page split into
    N consecutive crawl records shows up as one chain of N docs, the
    signal a reassembly pass sizes itself by.

    Plan: boundary pairs → components → bounded histogram. The edge set
    is split-rate-bounded (a few pairs per split page, 0.83 s to produce
    at sf0.1), but its chains are PATHS — diameter grows with split
    depth, and ``dedup_clusters`` pointer jumping paid O(log diameter)
    join rounds (measured 42 s at sf0.1 against the sub-second edge
    pass). Under ``collect_cap_rows`` the pairs therefore collect to the
    driver for a path-compressed union-find (the adaptive
    small-side convention: bounded, deliberate, loud); past the cap the
    distributed pointer-jumping path runs unchanged. Identical
    histograms either way — component sizes are representation-free."""
    from .relational import tiny_final_groupby

    pairs = boundary_overlap_pairs(ds, **kwargs).materialize()
    if pairs.count() <= collect_cap_rows:
        df = pairs.to_pandas()
        if not len(df):
            return pd.DataFrame({"chain_size": pd.Series([], dtype="int64"),
                                 "n_chains": pd.Series([], dtype="int64")})
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        par = np.arange(len(ids), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while par[root] != root:
                root = par[root]
            while par[x] != root:  # path compression
                par[x], x = root, par[x]
            return root

        ai, bi = inv[: len(a)], inv[len(a):]
        for x, y in zip(ai, bi):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                par[max(rx, ry)] = min(rx, ry)
        roots = np.array([find(int(i)) for i in range(len(ids))], np.int64)
        sizes = pd.Series(roots).value_counts()
        h = sizes.value_counts().sort_index()
        return pd.DataFrame({
            "chain_size": h.index.to_numpy(np.int64),
            "n_chains": h.to_numpy(np.int64),
        })
    cl = dedup_clusters(pairs)

    def sizes(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("cluster_id", sort=False).size().rename("n").reset_index()
        return g.astype({"cluster_id": "int64", "n": "int64"})

    # cluster ids are co-located by dedup_clusters' final fold keyed on
    # doc -- re-bucket on cluster_id so each chain counts once
    from .relational import hash_bucket_column

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "cluster_id", 16)

    def bucket_sizes(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("cluster_id", sort=False)["n"].sum()
        h = per.value_counts().rename("n_chains").reset_index()
        h.columns = ["chain_size", "n_chains"]
        return h.astype({"chain_size": "int64", "n_chains": "int64"})

    out = (
        tiny_final_groupby(
            cl.map_batches(sizes, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_sizes, batch_format="pandas"),
            ["chain_size"],
            [("n_chains", "sum")],
            ["chain_size", "n_chains"],
        )
        .to_pandas()
        .sort_values("chain_size")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def pseudonym_collision_audit(ds, id_col: str = "user_id", space_bits: int = 16):
    """Pseudonymization collision audit: hash every subject id into a
    ``2^space_bits`` pseudonym space (md5-u64 mod) and count how many
    DISTINCT subjects collide — the birthday-bound check a privacy
    engineer runs before releasing a pseudonymized join key (a collision
    silently MERGES two people's histories). ``space_bits=16`` is
    deliberately small so the audit exercises its collision path on test
    data; a production key uses 64+ bits and this same audit proves it.

    Plan: per batch, ids dedupe then hash once per distinct id; the
    exchange buckets distinct (id, pseudonym) pairs BY PSEUDONYM (an
    id always lands with its pseudonym, a pseudonym never splits, so
    per-bucket distinct counts of BOTH columns add); 3-counter fold.
    Output one row: (n_users, n_pseudonyms, n_collisions,
    collision_ppm)."""
    from ..functions.dedup import md5_u64
    from .relational import hash_bucket_column

    mod = 1 << space_bits

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(batch[id_col].to_numpy(np.int64))
        p = np.array([md5_u64(f"pseud:{v}".encode()) % mod for v in u], dtype=np.int64)
        return pd.DataFrame({"u": u, "p": p})

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "p", 32)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.drop_duplicates(["u", "p"])
        return pd.DataFrame(
            {
                "n_users": [int(per["u"].nunique())],
                "n_pseudonyms": [int(per["p"].nunique())],
            }
        ).astype("int64")

    tot = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    nu, npse = int(tot["n_users"]), int(tot["n_pseudonyms"])
    out = pd.DataFrame(
        {
            "n_users": [nu],
            "n_pseudonyms": [npse],
            "n_collisions": [nu - npse],
            "collision_ppm": [(nu - npse) * 1_000_000 // max(nu, 1)],
        }
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def code_switch_rate_by_source(ds, text_col: str = "text", source_col: str = "source",
                               min_hits: int = 2):
    """Code-switching screen: per source, how many docs show stopword
    evidence of TWO OR MORE languages (≥ ``min_hits`` whole-token
    stopword hits in each) — mixed-language pages are a classic crawl
    artifact that poisons per-language training splits, and the per-doc
    langid argmax (``language_id``) cannot see them by construction.
    Uses the same per-language stopword kernels (lookaround-pinned
    counts == tokenize+membership) the langid family already replays
    exactly in SQL.

    Plan: 4 vectorized str.counts per batch, bounded (source) partial,
    tiny final merge. Output (source, n_docs, n_code_switch,
    code_switch_ppm), source ASC."""
    from ..functions import textstats as ts
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].fillna("").str.lower()
        langs_hit = np.zeros(len(low), dtype=np.int64)
        for lang in ts.LANG_ORDER:
            hits = low.str.count(ts._LANG_STOP_RE[lang]).to_numpy(np.int64)
            langs_hit += (hits >= min_hits).astype(np.int64)
        flag = (langs_hit >= 2).astype(np.int64)
        g = pd.DataFrame({"source": batch[source_col], "f": flag}).groupby(
            "source", sort=False
        ).agg(n_docs=("f", "size"), n_code_switch=("f", "sum")).reset_index()
        return g.astype({"n_docs": "int64", "n_code_switch": "int64"})

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["source"],
            [("n_docs", "sum"), ("n_code_switch", "sum")],
            ["source", "n_docs", "n_code_switch"],
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["code_switch_ppm"] = (
        out["n_code_switch"].to_numpy(np.int64) * 1_000_000
        // np.maximum(out["n_docs"].to_numpy(np.int64), 1)
    )
    for c in ("n_docs", "n_code_switch", "code_switch_ppm"):
        out[c] = out[c].astype(np.int64)
    return out


def token_budget_waterfill(ds, text_col: str = "text", source_col: str = "source",
                           budget_num: int = 2, budget_den: int = 5):
    """Mixture balancing by water-filling: given per-source token
    supplies and a global token budget (here ``2/5`` of the corpus,
    integer floor), find the LEVEL cap L — the largest integer with
    Σ min(supply_i, L) ≤ budget — and allot each source
    min(supply_i, L). Small sources keep everything, big sources cap at
    the common level: the standard head-room-equalizing allocation a
    training-mixture planner runs before sampling (uniform-ish mixture
    without starving small sources).

    Exactness: L comes from the closed form over the supply-ascending
    prefix sums (candidate (B − s_{i−1}) // (n−i+1) per row, max over
    valid rows — provably the maximal non-overshooting level), all
    integer, replayed by the oracle with one window cumsum. One bounded
    (source) token-count pass; the waterfill itself runs on the
    key-domain-sized table. Output (source, available_tokens,
    allotted_tokens, capped), source ASC."""
    from ..functions import textstats as ts
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[text_col].fillna("").str.count(ts._WS_TOKEN).astype(np.int64)
        g = pd.DataFrame({"source": batch[source_col], "n": n}).groupby(
            "source", sort=False
        )["n"].sum().rename("available_tokens").reset_index()
        return g.astype({"available_tokens": "int64"})

    src = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pandas"),
            ["source"],
            [("available_tokens", "sum")],
            ["source", "available_tokens"],
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    a = src["available_tokens"].to_numpy(np.int64)
    total = int(a.sum())
    B = total * budget_num // budget_den
    order = np.argsort(a, kind="stable")
    asc = a[order]
    n = len(asc)
    prefix = np.concatenate([[0], np.cumsum(asc)])
    L = 0
    for i in range(1, n + 1):  # key-domain-sized: ≤ |sources| iterations
        cand = (B - int(prefix[i - 1])) // (n - i + 1)
        prev = int(asc[i - 2]) if i >= 2 else 0
        if cand >= prev:
            L = max(L, cand)
    allot = np.minimum(a, L)
    src["allotted_tokens"] = allot.astype(np.int64)
    src["capped"] = (a > L).astype(np.int64)
    src["available_tokens"] = src["available_tokens"].astype(np.int64)
    return src


def random_walks(ds, n_seeds: int = 16, walks_per_seed: int = 4, walk_len: int = 3,
                 id_col: str = "doc_id"):
    """Deterministic random-walk corpus over the shared md5 citation
    graph — the DeepWalk/node2vec training-data generator: from each
    seed, ``walks_per_seed`` walks of up to ``walk_len`` hops, the next
    hop drawn from the current node's SORTED distinct out-neighbors by
    md5 arithmetic (``md5('walk:{seed}:{w}:{t}:{v}') % out_degree``) —
    the same walk regenerates on any cluster shape, Ray or SQL. Seeds
    are the ``n_seeds`` smallest ``md5('rwseed:'‖id)`` nodes (a
    deterministic pseudo-random sample). A walk that reaches a node
    with no out-edges simply ends (the oracle's step JOIN drops it the
    same way).

    Plan (100 TB shape): edges derive once and MATERIALIZE as a compact
    distinct (src, dst) int table (per-doc emission means per-batch
    dedup IS global dedup); each hop broadcasts the ≤ seeds×walks
    frontier node set and filters the edge table map-side — the
    adjacency rows reaching the driver are bounded by frontier×max_deg,
    never the graph. Output (seed, walk_id, step, node) including
    step 0."""
    from ..functions.dedup import md5_u64

    n = ds.count()
    edges = derived_link_edges(ds, n)

    def dedupe(batch: pa.Table) -> pa.Table:
        df = batch.select(["src", "dst"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    compact = edges.map_batches(dedupe, batch_format="pyarrow").materialize()

    # seeds: n_seeds smallest md5('rwseed:'||id) -- per-block partial
    # top-k + tiny merge (the top_tokens plan)
    def seed_partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # keep UNSIGNED: an int64 view flips the sort order of large
        # hashes vs the oracle's UBIGINT ORDER BY
        h = np.array(
            [md5_u64(f"rwseed:{int(u)}".encode()) for u in ids], dtype=np.uint64
        )
        df = pd.DataFrame({"h": h, "v": ids}).sort_values(["h", "v"]).head(n_seeds)
        return df

    seeds = (
        ds.map_batches(seed_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda b: b.sort_values(["h", "v"]).head(n_seeds),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()["v"]
        .to_numpy(np.int64)
    )

    rows = [(int(s), w, 0, int(s)) for s in seeds for w in range(walks_per_seed)]
    frontier = list(rows)  # (seed, w, t, v) still walking
    import ray

    for t in range(walk_len):
        need = np.array(sorted({v for *_, v in frontier}), dtype=np.int64)
        if not len(need):
            break
        ref = ray.put(need)

        def pick(batch: pa.Table, _ref=ref) -> pa.Table:
            want = ray.get(_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(want, src)
            pos[pos == len(want)] = len(want) - 1
            return batch.filter(pa.array(want[pos] == src))

        adj_rows = compact.map_batches(pick, batch_format="pyarrow").to_pandas()
        adj = {
            int(s): g["dst"].sort_values().to_numpy(np.int64)
            for s, g in adj_rows.groupby("src")
        }
        nxt = []
        for seed, w, _, v in frontier:
            nbrs = adj.get(v)
            if nbrs is None or not len(nbrs):
                continue
            idx = md5_u64(f"walk:{seed}:{w}:{t}:{v}".encode()) % len(nbrs)
            nv = int(nbrs[idx])
            nxt.append((seed, w, t + 1, nv))
        rows.extend(nxt)
        frontier = nxt

    out = pd.DataFrame(rows, columns=["seed", "walk_id", "step", "node"])
    out = out.sort_values(["seed", "walk_id", "step"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def kwic_snippets(ds, terms=("merge", "vector", "stream"), window: int = 3,
                  k: int = 20, text_col: str = "text", id_col: str = "doc_id"):
    """Keyword-in-context concordance: for each query term, the first
    ``k`` occurrences corpus-wide (ordered by doc_id, then token
    position) with a ±``window``-token snippet — the human-inspection
    surface every corpus-curation decision loops through ("show me how
    this term is actually used before I block/keep it"). Tokens are the
    shared ``[a-z0-9]+`` lowered runs; positions are 1-based.

    Plan: per batch, ONE explode + isin finds hits; the batch keeps
    only its k smallest (doc_id, pos) per term BEFORE building snippets
    (bounded snippet work however hot the term), then the per-block
    partials merge in one tiny final top-k (the top_tokens plan).
    Output (term, doc_id, pos, snippet), term/doc/pos ASC."""
    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")
    tset = set(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "term": pd.Series([], dtype=str),
                "doc_id": pd.Series([], dtype=np.int64),
                "pos": pd.Series([], dtype=np.int64),
                "snippet": pd.Series([], dtype=str),
            }
        )
        toks = batch[text_col].fillna("").str.lower().str.findall(word_re)
        docs = batch[id_col].to_numpy(np.int64)
        ex = toks.reset_index(drop=True).explode().dropna()
        if not len(ex):
            return empty
        idx = ex.index.to_numpy(np.int64)
        t = ex.to_numpy()
        m = pd.Series(t).isin(tset).to_numpy()
        if not m.any():
            return empty
        pos = (
            pd.Series(np.ones(len(idx), np.int64)).groupby(idx).cumsum().to_numpy()
        )
        hits = pd.DataFrame(
            {"term": t[m], "doc_id": docs[idx[m]], "pos": pos[m], "row": idx[m]}
        )
        hits = (
            hits.sort_values(["term", "doc_id", "pos"])
            .groupby("term", sort=False)
            .head(k)
        )
        snips = []
        tok_lists = toks.reset_index(drop=True)
        for r in hits.itertuples():  # ≤ k×|terms| rows per batch by construction
            arr = tok_lists.iloc[r.row]
            lo = max(r.pos - 1 - window, 0)
            hi = min(r.pos + window, len(arr))
            snips.append(" ".join(arr[lo:hi]))
        hits = hits.drop(columns=["row"])
        hits["snippet"] = snips
        return hits.astype({"doc_id": "int64", "pos": "int64"})

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "term" not in batch.columns:
            return batch
        return (
            batch.sort_values(["term", "doc_id", "pos"])
            .groupby("term", sort=False)
            .head(k)
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values(["term", "doc_id", "pos"])
        .reset_index(drop=True)
    )
    for c in ("doc_id", "pos"):
        out[c] = out[c].astype(np.int64)
    return out


def leakage_free_split_audit(ds, threshold: float = 0.6, train_pct: int = 8):
    """Near-duplicate-aware train/val splitting audit: assigning splits
    by DOCUMENT hash lets near-duplicate pairs straddle train and val
    (the eval-contamination leak dedup papers warn about); assigning by
    CLUSTER hash cannot. This op measures both policies on the same
    corpus: MinHash-LSH pairs → connected components → per-doc cluster
    id (singletons are their own cluster), then for each policy the
    train/val doc counts and the number of multi-doc clusters whose
    members land in BOTH splits. ``by_cluster`` straddling is 0 by
    construction — computed honestly, not asserted.

    Plan: the pair/cluster machinery is the existing
    ``minhash_lsh_pairs`` + ``dedup_clusters``; docs LEFT-join their
    cluster through one doc_id-bucketed hash join; ONE cluster-keyed
    exchange folds per-cluster split masks into bounded partials.
    Output (method, n_train, n_val, straddling_clusters), method ASC."""
    from ..functions.dedup import md5_u64
    from .relational import bucketed_hash_join, derive_buckets, hash_bucket_column

    ids = ds.select_columns(["doc_id"])
    pairs = minhash_lsh_pairs(ds, threshold=threshold)
    cl = dedup_clusters(pairs)
    joined = bucketed_hash_join(
        ids, cl, "doc_id", "doc_id", buckets=derive_buckets(ds.count()), how="left"
    )

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy(np.int64)
        c = batch["cluster_id"].to_numpy()
        c = np.where(pd.isna(c), d, c).astype(np.int64)

        def split_of(vals: np.ndarray) -> np.ndarray:
            codes, uniq = pd.factorize(vals)
            s = np.array(
                [md5_u64(f"lsplit:{int(v)}".encode()) % 10 < train_pct for v in uniq],
                dtype=bool,
            )
            return s[codes]

        return pd.DataFrame(
            {
                "c": c,
                "nt": split_of(d).astype(np.int64),       # naive: by doc hash
                "ct": split_of(c).astype(np.int64),       # by cluster hash
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "c", 32)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("c", sort=False).agg(
            n=("nt", "size"), nt=("nt", "sum"), ct=("ct", "sum")
        )
        n = per["n"].to_numpy(np.int64)
        nt = per["nt"].to_numpy(np.int64)
        ct = per["ct"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_docs": [int(n.sum())],
                "naive_train": [int(nt.sum())],
                "cluster_train": [int(ct.sum())],
                "naive_straddle": [int(((n > 1) & (nt > 0) & (nt < n)).sum())],
                "cluster_straddle": [int(((n > 1) & (ct > 0) & (ct < n)).sum())],
            }
        ).astype("int64")

    tot = (
        joined.map_batches(assign, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    nd = int(tot["n_docs"])
    out = pd.DataFrame(
        [
            ("by_cluster", int(tot["cluster_train"]), nd - int(tot["cluster_train"]),
             int(tot["cluster_straddle"])),
            ("by_doc", int(tot["naive_train"]), nd - int(tot["naive_train"]),
             int(tot["naive_straddle"])),
        ],
        columns=["method", "n_train", "n_val", "straddling_clusters"],
    )
    for c in ("n_train", "n_val", "straddling_clusters"):
        out[c] = out[c].astype(np.int64)
    return out


def _roundtrip_export(sf_dir: str, fmt: str):
    """Derive a (event_type, day, value_cents) export of the events table
    in ``fmt`` ('json' = JSONL shards, 'csv') under a content-keyed /tmp
    dir, written ONCE per (sf_dir, format) and reused — floats convert
    to integer cents and timestamps to day strings BEFORE serialization,
    so the text roundtrip is bit-exact by construction (JSON/CSV float
    printing would not be)."""
    import hashlib as _hl
    import os

    import ray.data as rd

    key = _hl.md5(f"{os.path.abspath(sf_dir)}".encode()).hexdigest()[:12]
    out_dir = f"/tmp/graft_roundtrip/{fmt}_{key}"
    if not os.path.isdir(out_dir) or not os.listdir(out_dir):
        os.makedirs(out_dir, exist_ok=True)
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

        def project(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "event_type": batch.column("event_type"),
                    "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
                    "value_cents": pa.array(
                        np.floor(
                            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
                            + 0.5
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        proj = ds.map_batches(project, batch_format="pyarrow")
        if fmt == "json":
            proj.write_json(out_dir)
        else:
            proj.write_csv(out_dir)
    return out_dir


def text_source_daily(sf_dir: str, fmt: str = "json"):
    """Text-format ingest roundtrip: the events table exported once as
    JSONL or CSV shards (the two formats web-scale pipelines actually
    receive), re-ingested with ``ray.data.read_json`` / ``read_csv``,
    and aggregated per (event_type, day) — proving the whole engine
    path (schema, partials, bounded fold) is source-format-agnostic.
    Exactness: the export writes integer cents and day STRINGS, so the
    text roundtrip cannot lose precision; the oracle aggregates the
    original parquet directly.

    Returns (event_type, day, n_events, value_cents)."""
    import ray.data as rd

    from .relational import tiny_final_groupby

    path = _roundtrip_export(sf_dir, fmt)
    ds = rd.read_json(path) if fmt == "json" else rd.read_csv(path)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = batch.column("day")
        # CSV type inference re-parses the day strings as dates/timestamps;
        # normalize back to the exported string form so both formats (and
        # the oracle) agree
        if pa.types.is_timestamp(day.type) or pa.types.is_date(day.type):
            day = pc.strftime(pc.cast(day, pa.timestamp("us")), format="%Y-%m-%d")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "value_cents": pc.cast(batch.column("value_cents"), pa.int64()),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("value_cents", "sum"), ([], "count_all")]
        )

    out = (
        tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "day"],
            [("value_cents_sum", "sum"), ("count_all", "sum")],
            ["event_type", "day", "value_cents", "n_events"],
        )
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    out = out[["event_type", "day", "n_events", "value_cents"]]
    for c in ("n_events", "value_cents"):
        out[c] = out[c].astype(np.int64)
    return out


def matryoshka_recall_audit(ds, queries: np.ndarray, trunc_dim: int = 16, k: int = 10,
                            id_col: str = "vec_id", emb_col: str = "embedding"):
    """Matryoshka-truncation retrieval audit: cosine top-k over only the
    FIRST ``trunc_dim`` embedding dimensions vs the full-width top-k —
    the measurement behind MRL-style "coarse dims first" serving (run
    retrieval on a prefix, verify the recall cost before committing to
    the cheaper index). Both rankings use the shared brute-force kernel
    (``ann_topk``: broadcast query matrix, per-batch partial top-k);
    the truncated side slices dims in-stage, never re-materializing the
    table. Output per query: (query_id, n_overlap, recall_ppm), k-exact
    on both sides, query_id ASC."""

    def slice_dims(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: batch.column(id_col),
                emb_col: pc.list_slice(batch.column(emb_col), 0, trunc_dim),
            }
        )

    full = ann_topk(ds, queries, k=k, id_col=id_col, emb_col=emb_col).to_pandas()
    trunc = ann_topk(
        ds.map_batches(slice_dims, batch_format="pyarrow"),
        np.asarray(queries, dtype=np.float64)[:, :trunc_dim],
        k=k,
        id_col=id_col,
        emb_col=emb_col,
    ).to_pandas()
    fset = full.groupby("query_id")[id_col].apply(set)
    tset = trunc.groupby("query_id")[id_col].apply(set)
    rows = []
    for q in sorted(fset.index):
        ov = len(fset[q] & tset.get(q, set()))
        rows.append((int(q), ov, ov * 1_000_000 // k))
    out = pd.DataFrame(rows, columns=["query_id", "n_overlap", "recall_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def mmr_diverse_topk(ds, queries: np.ndarray, k: int = 5, pool: int = 50,
                     lam: float = 0.7, id_col: str = "vec_id",
                     emb_col: str = "embedding", max_bytes: int = 256 << 20):
    """Maximal Marginal Relevance re-ranking: from each query's cosine
    top-``pool`` candidates, greedily pick k results maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — the classic
    diversity re-ranker (Carbonell & Goldstein '98) that stops a result
    list from being five near-copies of the same document. Ties break
    to the smallest id; step 1's penalty term is empty, so it reduces
    to the plain top-1. ``lam`` must NOT be 0.5 when queries are corpus
    members: the first selection is then the query vector itself, so
    every step-2 score collapses to ``0.5·(c − c) ≡ 0`` and the ranking
    degenerates to ulp noise (measured; 0.7 keeps scores separated by
    the data, not the rounding).

    Plan: candidate generation IS ``ann_topk`` (broadcast matmul,
    per-batch partial top-k); the pool's vectors come back through one
    broadcast-ids map-side filter (bounded by queries × pool rows, loud
    raise past ``max_bytes``); the greedy loop runs on that
    pool-sized table. Both sides order by the SAME float64 expression
    (IEEE-deterministic given the shared cosine kernel contract the ann
    family already relies on). Output (query_id, rank, vec_id)."""
    import ray

    from ..functions import similarity as sk

    cand = ann_topk(ds, queries, k=pool, id_col=id_col, emb_col=emb_col).to_pandas()
    ids = np.unique(cand[id_col].to_numpy(np.int64))
    if ids.nbytes > max_bytes:
        raise ValueError(
            "mmr pool id set exceeds the broadcast cap; shard the greedy "
            "loop per query at this scale"
        )
    handle = [ray.put(ids)]

    class KeepPool:
        def __init__(self) -> None:
            self.ids = ray.get(handle[0])

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.is_in(batch.column(id_col), pa.array(self.ids, pa.int64()))
            )

    pool_rows = (
        ds.map_batches(KeepPool, batch_format="pyarrow", concurrency=(1, 8))
        .to_pandas()
    )
    vecs = sk.normalize(
        np.stack(pool_rows[emb_col].to_numpy()).astype(np.float64)
    )
    vid = pool_rows[id_col].to_numpy(np.int64)
    vmap = {int(v): i for i, v in enumerate(vid)}

    out = []
    for q, g in cand.groupby("query_id"):
        g = g.sort_values([id_col]).reset_index(drop=True)
        pool_ids = g[id_col].to_numpy(np.int64)
        cq = g["sim"].to_numpy(np.float64)
        pv = vecs[[vmap[int(v)] for v in pool_ids]]
        selected: list[int] = []
        sel_vecs: list[np.ndarray] = []
        remaining = np.ones(len(pool_ids), dtype=bool)
        for rank in range(1, min(k, len(pool_ids)) + 1):
            if sel_vecs:
                pen = np.max(np.stack([pv @ sv for sv in sel_vecs]), axis=0)
                score = lam * cq - (1 - lam) * pen
            else:
                score = lam * cq
            score = np.where(remaining, score, -np.inf)
            # argmax with smallest-id tie-break: ids are sorted ascending,
            # argmax returns the first (= smallest id) among equal scores
            j = int(np.argmax(score))
            out.append((int(q), rank, int(pool_ids[j])))
            selected.append(j)
            sel_vecs.append(pv[j])
            remaining[j] = False
    res = pd.DataFrame(out, columns=["query_id", "rank", "vec_id"])
    for c in res.columns:
        res[c] = res[c].astype(np.int64)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


# Poisson(1) CDF ladder for the bootstrap weight map, quantized onto the
# Mersenne-61 hash range as integer thresholds so the engine (searchsorted)
# and the DuckDB replay (CASE ladder on the same literals) compare the SAME
# integers -- no float comparison anywhere. Weights cap at 8: P(X>8|lam=1)
# ~= 1.1e-6, and BOTH sides clamp identically so the cap is semantics, not
# error.
_POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
)


def bootstrap_constants(n_resamples: int = 64, seed: int = 7):
    """Per-resample affine constants (a_b, b_b) on the Mersenne-61 field and
    the Poisson(1) integer threshold ladder. Derived from md5 so the SQL
    replay can embed the SAME literals (``__ray_entry__`` calls this very
    function when building the oracle): resample b's uniform draw for row
    key h is ``((a_b * h + b_b) mod 2^64) mod (2^61-1)`` -- one md5 per ROW
    fans out to B resamples by arithmetic, the exact trick the MinHash
    permutation family proved oracle-exact (analytics.minhash_lsh_pairs)."""
    from ..functions import dedup as dk

    M = dk._MERSENNE
    a = np.array(
        [max(1, dk.md5_u64(f"bootA{seed}:{i}".encode()) % M)
         for i in range(n_resamples)], dtype=np.uint64)
    b = np.array(
        [dk.md5_u64(f"bootB{seed}:{i}".encode()) % M
         for i in range(n_resamples)], dtype=np.uint64)
    thresholds = np.array([int(c * M) for c in _POISSON1_CDF], dtype=np.uint64)
    return a, b, thresholds


def bootstrap_ci_mean(ds, value_col: str = "o_totalprice",
                      key_col: str = "o_orderkey", n_resamples: int = 64,
                      seed: int = 7, lo_pct: int = 25, hi_pct: int = 975):
    """Poisson-bootstrap confidence interval for the mean -- the bootstrap
    that actually runs at 100 TB. Classic resampling needs global
    coordination (each resample draws n rows WITH replacement); the Poisson
    bootstrap (Chamandy et al. 2012, "Estimating Uncertainty for Massive
    Data Streams", Google) replaces the multinomial with independent
    per-(row, resample) Poisson(1) weights, so every row computes its B
    weights LOCALLY from a hash and the whole procedure is one
    embarrassingly-parallel pass + a B-row fold. Here the Poisson draw is
    deterministic: u = affine(md5(key)) on Mersenne-61, weight = rung of u
    in the integer-quantized Poisson(1) CDF ladder -- bit-replayable in SQL.

    Output (single row, integer cents x100 for exactness):
    mean_c100 (point estimate over all rows), ci_lo_c100 / ci_hi_c100
    (percentile bootstrap bounds at lo_pct/hi_pct permille over the B
    resample means, floor-divided), n_resamples (surviving resamples --
    a resample with total weight 0 is dropped identically on both sides).

    Scale shape: one narrow scan; per batch a (B x n) uint64 matrix of
    weights folds to 2B int64 partials (sum_w, sum_wx) plus one b=-1 row
    carrying the plain sum/count, so the exchange moves B+1 rows per block
    regardless of input size; the final fold is a tiny_final_groupby over
    B+1 bounded keys; the percentile pick runs on B driver floats' worth of
    integers. No shuffle of data rows, ever."""
    from ..functions import dedup as dk
    from .relational import _cents, tiny_final_groupby

    M = np.uint64(dk._MERSENNE)
    a, b, thr = bootstrap_constants(n_resamples, seed)
    bidx = np.arange(-1, n_resamples, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(batch.column(value_col)).to_numpy()
        h = np.array([dk.md5_u64(str(i).encode()) for i in ids], dtype=np.uint64)
        with np.errstate(over="ignore"):
            u = (a[:, None] * h[None, :] + b[:, None]) % M
        w = np.searchsorted(thr, u.ravel(), side="right").reshape(
            n_resamples, -1).astype(np.int64)
        sw = np.concatenate([[len(ids)], w.sum(axis=1)])
        swx = np.concatenate([[int(cents.sum())], (w * cents[None, :]).sum(axis=1)])
        return pa.table({
            "b": pa.array(bidx, pa.int64()),
            "sw": pa.array(sw, pa.int64()),
            "swx": pa.array(swx, pa.int64()),
        })

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192),
        keys=["b"], aggs=[("sw", "sum"), ("swx", "sum")],
        out_names=["b", "sw", "swx"],
    ).to_pandas()

    point = folded[folded["b"] < 0].iloc[0]
    mean_c100 = int(point["swx"]) * 100 // int(point["sw"])
    rs = folded[(folded["b"] >= 0) & (folded["sw"] > 0)]
    means = np.sort((rs["swx"].to_numpy(np.int64) * 100)
                    // rs["sw"].to_numpy(np.int64))
    m = len(means)
    lo = int(means[(lo_pct * m) // 1000])
    hi = int(means[(hi_pct * m + 999) // 1000 - 1])
    return pd.DataFrame({
        "mean_c100": pd.Series([mean_c100], dtype=np.int64),
        "ci_lo_c100": pd.Series([lo], dtype=np.int64),
        "ci_hi_c100": pd.Series([hi], dtype=np.int64),
        "n_resamples": pd.Series([m], dtype=np.int64),
    })


def embedding_covariance_topk(ds, vec_col: str = "embedding", topk: int = 20,
                              quant: int = 1000):
    """Top-k most-covarying embedding dimension pairs -- the distributed
    linear-algebra primitive behind whitening / PCA preprocessing: ONE pass
    accumulates the Gram matrix X^T X, the column sums and the count as
    map-side partials, and the driver finishes the (d x d) centering
    arithmetic on d^2 integers. At 100 TB this is the only shape that works:
    the data never shuffles, each block contributes a (d(d-1)/2 + d + 1)-row
    partial regardless of block size, and the fold is a bounded-key
    tiny_final_groupby.

    Exactness: elements quantize to integer milli-units (floor(x*1000+0.5),
    the quantize_embeddings convention -- banker's rounding differs between
    numpy and SQL, floor(x+0.5) does not), so Gram sums are exact integers
    and the covariance NUMERATOR cov_num = n*S_ab - s_a*s_b is exact
    (covariance itself = cov_num / n^2 in milli^2 -- left rational on
    purpose; the driver arithmetic runs on Python ints so n*S cannot
    overflow before the final int64 check).

    Returns (dim_a, dim_b, cov_num): 1-based dims (matching SQL list
    indexing), a < b, ranked by |cov_num| desc then (dim_a, dim_b)."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(n, d)
        Q = np.floor(V * quant + 0.5).astype(np.int64)
        S = Q.T @ Q
        s = Q.sum(axis=0)
        iu, ju = np.triu_indices(d, k=1)
        keys = np.concatenate([iu * d + ju, d * d + np.arange(d), [-1]])
        vals = np.concatenate([S[iu, ju], s, [n]])
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "v": pa.array(vals, pa.int64())})

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["k"], aggs=[("v", "sum")], out_names=["k", "v"],
    ).to_pandas()
    kv = dict(zip(folded["k"].astype(int), folded["v"].astype(int)))
    n = kv[-1]
    # max key is d*d + (d-1); floor(sqrt(d^2 + d)) == d for every d >= 1
    d = int((max(k for k in kv if 0 <= k) + 1) ** 0.5)
    rows = []
    for a in range(d):
        for b in range(a + 1, d):
            cov = n * kv[a * d + b] - kv[d * d + a] * kv[d * d + b]
            rows.append((a + 1, b + 1, cov))
    rows.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    out = pd.DataFrame(rows[:topk], columns=["dim_a", "dim_b", "cov_num"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def t_closeness_audit(ds, qi_col: str = "event_type", value_col: str = "value",
                      bin_cents: int = 10_00, n_bins: int = 10,
                      threshold_ppm: int = 150_000):
    """t-closeness audit -- the third rung of the release-safety ladder
    (k_anonymity_audit: cells big enough; l_diversity_audit: enough distinct
    people; HERE: the sensitive DISTRIBUTION inside a cell must not diverge
    from the global one, or the cell leaks by inference even when k- and
    l-safe). Distance is the Earth Mover's Distance over an ORDERED
    sensitive domain (Li, Li & Venkatasubramanian, ICDE'07): value binned
    into ``n_bins`` fixed ``bin_cents``-wide rungs (clamped at the top --
    fixed literals, data-independent, so both sides bin identically),
    EMD = sum_j |CumP_cell(j) - CumP_global(j)| / (n_bins - 1) over the
    first n_bins-1 cumulative points.

    Exactness: with n_c = cell rows and N = total rows, the ppm distance is
    ``t_ppm = (1e6 * sum_j |cum_c(j)*N - cum_g(j)*n_c|) //
    (n_c * N * (n_bins-1))`` -- every term an integer; the driver arithmetic
    runs on Python ints (the cross products reach ~1e18 at single-digit-TB
    row counts, past int64 when multiplied by 1e6).

    Scale shape: per batch a (qi, bin, n) count partial; ONE bounded fold
    (|qi| x n_bins keys) via tiny_final_groupby; the EMD arithmetic runs on
    that bounded driver table. No row-domain shuffle.

    Returns (qi, n_events, t_ppm, at_risk) ordered by qi."""
    from .relational import _cents, tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        qi = batch.column(qi_col).to_pandas()
        cents = np.maximum(_cents(batch.column(value_col)).to_numpy(), 0)
        bins = np.minimum(cents // bin_cents, n_bins - 1).astype(np.int64)
        g = (pd.DataFrame({"qi": qi, "bin": bins})
             .groupby(["qi", "bin"], sort=False).size().rename("n").reset_index())
        return pa.Table.from_pandas(
            g.astype({"bin": np.int64, "n": np.int64}), preserve_index=False)

    counts = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["qi", "bin"], aggs=[("n", "sum")], out_names=["qi", "bin", "n"],
    ).to_pandas()

    glob = np.zeros(n_bins, dtype=object)
    for _, r in counts.iterrows():
        glob[int(r["bin"])] += int(r["n"])
    cum_g = np.cumsum(glob)
    N = int(cum_g[-1])

    rows = []
    for qi, g in counts.groupby("qi"):
        cell = np.zeros(n_bins, dtype=object)
        for _, r in g.iterrows():
            cell[int(r["bin"])] += int(r["n"])
        cum_c = np.cumsum(cell)
        n_c = int(cum_c[-1])
        tot = sum(abs(int(cum_c[j]) * N - int(cum_g[j]) * n_c)
                  for j in range(n_bins - 1))
        t_ppm = (1_000_000 * tot) // (n_c * N * (n_bins - 1))
        rows.append((qi, n_c, int(t_ppm), int(t_ppm > threshold_ppm)))
    out = pd.DataFrame(rows, columns=["qi", "n_events", "t_ppm", "at_risk"])
    for c in ("n_events", "t_ppm", "at_risk"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("qi").reset_index(drop=True)


def sq8_recall_audit(ds, queries: "np.ndarray", k: int = 10,
                     quant: int = 1000, levels: int = 255,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Scalar-quantization (SQ8) recall audit -- the remaining rung of the
    ANN-compression ladder (PQ codes / binary sign bits / Matryoshka
    truncation / THIS: per-dimension 8-bit linear quantization, FAISS
    ``SQ8``). recall@k of code-space L2 ranking vs exact L2 ranking.

    Integer-exact, SQL-replayable: embeddings quantize to milli ints
    (floor(x*1000+0.5), the house convention); per-dim (min, max) over
    those ints define the grid; code = (v - mn) * levels // max(mx - mn,
    1) -- non-negative integer floor division, identical in numpy and
    DuckDB. Both rankings are squared-L2 sums of int64 differences, ties
    to the smaller id.

    Scale shape: pass A folds per-batch per-dim (min, max) partials (2d
    ints per block regardless of rows); pass B quantizes per batch
    against the broadcast grid + query codes and emits per-batch top-k
    partials for BOTH rankings -- the driver merges k x 2 x |queries| x
    blocks bounded rows; no row-domain shuffle anywhere.

    Returns (query_id, n_overlap, recall_ppm) ordered by query_id."""
    import ray

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, -1)

    Qm = np.floor(np.asarray(queries, np.float64) * quant + 0.5).astype(np.int64)

    # ---- pass A: per-dim (min, max) partials, bounded driver fold
    def minmax_partial(batch: pa.Table) -> pa.Table:
        V = _mat(batch.column(emb_col))
        return pa.table({
            "mn": pa.array([V.min(axis=0).tolist()], pa.list_(pa.int64())),
            "mx": pa.array([V.max(axis=0).tolist()], pa.list_(pa.int64())),
        })

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").to_pandas()
    mn = np.min(np.stack(mm["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(mm["mx"].to_numpy()), axis=0)
    span = np.maximum(mx - mn, 1)
    qcodes = np.clip((Qm - mn), 0, None) * levels // span
    qcodes = np.minimum(qcodes, levels)  # queries may exceed corpus max
    grid = ray.put((mn, span, qcodes, Qm))

    # ---- pass B: encode + both rankings, per-batch top-k partials
    class TopKPartial:
        def __init__(self) -> None:
            self.mn, self.span, self.qcodes, self.qm = ray.get(grid)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            V = _mat(batch.column(emb_col))
            codes = (V - self.mn) * levels // self.span
            out_q, out_id, out_kind, out_d = [], [], [], []
            for qi in range(len(self.qm)):
                for kind, a, b in (("sq", codes, self.qcodes[qi]),
                                   ("exact", V, self.qm[qi])):
                    dist = ((a - b) ** 2).sum(axis=1)
                    order = np.lexsort((ids, dist))[:k]
                    out_q.extend([qi] * len(order))
                    out_id.extend(ids[order].tolist())
                    out_kind.extend([kind] * len(order))
                    out_d.extend(dist[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "kind": pa.array(out_kind, pa.string()),
                "dist": pa.array(out_d, pa.int64()),
            })

    parts = ds.map_batches(TopKPartial, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    rows = []
    for qi in range(len(Qm)):
        sel = parts[parts["query_id"] == qi]
        tops = {}
        for kind in ("sq", "exact"):
            g = sel[sel["kind"] == kind].sort_values(["dist", id_col])
            tops[kind] = set(g[id_col].head(k).astype(np.int64))
        n_overlap = len(tops["sq"] & tops["exact"])
        rows.append((qi, n_overlap, n_overlap * 1_000_000 // k))
    out = pd.DataFrame(rows, columns=["query_id", "n_overlap", "recall_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def pq_recall_audit(ds, queries: "np.ndarray", n_sub: int = 8,
                    n_codes: int = 16, k: int = 10, quant: int = 1000,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Product-quantization recall audit -- the other half of the FAISS
    ANN family (ivf_topk prunes WHICH vectors to score; PQ compresses HOW
    each is scored: d dims -> n_sub one-byte codes, distances via a
    per-query lookup table). Audits the compression the way
    matryoshka_recall_audit audits truncation: recall@k of ADC-ranked
    top-k vs exact top-k per query.

    Deterministic, integer, SQL-replayable training: embeddings quantize
    to milli ints; the ``n_codes`` codewords per subspace start from the
    vectors with the smallest md5('pqseed:'||id) (the sample_n trick --
    a hash-random but replayable draw), take ONE Lloyd assignment step
    (squared-L2 on ints, ties to the lower seed rank), and the trained
    codebook is the truncating-div integer mean of each cluster (matches
    SQL's //; empty cluster keeps its seed). Encoding, the ADC lookup table and exact distances
    are then all exact integer arithmetic -- the DuckDB oracle replays
    every step.

    Scale shape: three passes, none shuffling the row domain. (A) seed
    election: per-batch partial top-``n_codes`` by hash, driver merge
    (bounded). (B) assignment statistics: per batch a (sub, code, dim)
    sum/count partial -- <= n_sub*n_codes*(d/n_sub + 1) rows per block
    regardless of size -- folded by tiny_final_groupby. (C) encode + ADC
    + exact in ONE pass against the broadcast codebook: per batch builds
    the (q, sub, code) lookup table once, gathers code columns, and emits
    only per-batch top-k partials for both rankings; the driver merges
    k x 2 x |queries| x blocks bounded rows.

    Returns (query_id, n_overlap, recall_ppm) ordered by query_id."""
    import ray

    from ..functions import dedup as dk
    from .relational import tiny_final_groupby

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    # ---- pass A: md5-elected seed vectors (bounded partial top-n merge)
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _mat(batch.column(emb_col))
        h = np.array([dk.md5_u64(f"pqseed:{i}".encode()) for i in ids], np.uint64)
        top = np.lexsort((ids, h))[:n_codes]
        return pa.table({
            "h": pa.array(h[top], pa.uint64()),
            id_col: pa.array(ids[top], pa.int64()),
            "qv": pa.array(list(Q[top]), pa.list_(pa.int64())),
        })

    sp = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((sp[id_col].to_numpy(np.int64),
                        sp["h"].to_numpy(np.uint64)))[:n_codes]
    seeds = np.stack(sp["qv"].iloc[order].to_numpy())  # (n_codes, d) int64
    d = seeds.shape[1]
    dsub = d // n_sub
    seeds_h = ray.put(seeds)

    def _assign(Q: np.ndarray, book: np.ndarray) -> np.ndarray:
        # (n, n_sub) code indices; argmin takes the FIRST minimum -> ties
        # resolve to the lower code rank on both sides
        codes = np.empty((len(Q), n_sub), dtype=np.int64)
        for s in range(n_sub):
            qs = Q[:, s * dsub:(s + 1) * dsub]
            bs = book[:, s * dsub:(s + 1) * dsub]
            dist = ((qs[:, None, :] - bs[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(dist, axis=1)
        return codes

    # ---- pass B: one Lloyd step's sum/count statistics
    def stats_partial(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        book = ray.get(seeds_h)
        codes = _assign(Q, book)
        keys, vals = [], []
        for s in range(n_sub):
            qs = Q[:, s * dsub:(s + 1) * dsub]
            for c in range(n_codes):
                sel = qs[codes[:, s] == c]
                if not len(sel):
                    continue
                base = (s * n_codes + c) * dsub
                keys.extend(range(base, base + dsub))
                vals.extend(sel.sum(axis=0).tolist())
                keys.append(n_sub * n_codes * dsub + s * n_codes + c)
                vals.append(len(sel))
        return pa.table({"k": pa.array(np.asarray(keys, np.int64)),
                         "v": pa.array(np.asarray(vals, np.int64))})

    folded = tiny_final_groupby(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        keys=["k"], aggs=[("v", "sum")], out_names=["k", "v"],
    ).to_pandas()
    kv = dict(zip(folded["k"].astype(int), folded["v"].astype(int)))
    book = seeds.copy()
    for s in range(n_sub):
        for c in range(n_codes):
            n = kv.get(n_sub * n_codes * dsub + s * n_codes + c, 0)
            if n <= 0:
                continue  # empty cluster keeps its seed subvector
            base = (s * n_codes + c) * dsub
            for j in range(dsub):
                v = kv[base + j]
                # TRUNCATING division (matches SQL //; sums can be negative)
                book[c, s * dsub + j] = -((-v) // n) if v < 0 else v // n
    book_h = ray.put(book)

    qq = np.floor(np.asarray(queries, np.float64) * quant + 0.5).astype(np.int64)
    qq_h = ray.put(qq)

    # ---- pass C: encode, ADC + exact distances, per-batch top-k partials
    def topk_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _mat(batch.column(emb_col))
        book = ray.get(book_h)
        qmat = ray.get(qq_h)
        codes = _assign(Q, book)
        nq = len(qmat)
        lut = np.empty((nq, n_sub, n_codes), dtype=np.int64)
        for s in range(n_sub):
            qs = qmat[:, s * dsub:(s + 1) * dsub]
            bs = book[:, s * dsub:(s + 1) * dsub]
            lut[:, s, :] = ((qs[:, None, :] - bs[None, :, :]) ** 2).sum(axis=2)
        out_q, out_id, out_d, out_kind = [], [], [], []
        for qi in range(nq):
            ad = lut[qi, np.arange(n_sub)[None, :], codes].sum(axis=1)
            ed = ((Q - qmat[qi][None, :]) ** 2).sum(axis=1)
            for kind, dist in ((0, ad), (1, ed)):
                top = np.lexsort((ids, dist))[:k]
                out_q.extend([qi] * len(top))
                out_id.extend(ids[top].tolist())
                out_d.extend(dist[top].tolist())
                out_kind.extend([kind] * len(top))
        return pa.table({
            "query_id": pa.array(np.asarray(out_q, np.int64)),
            id_col: pa.array(np.asarray(out_id, np.int64)),
            "dist": pa.array(np.asarray(out_d, np.int64)),
            "kind": pa.array(np.asarray(out_kind, np.int64)),
        })

    part = ds.map_batches(topk_partial, batch_format="pyarrow",
                          batch_size=4096).to_pandas()
    rows = []
    qids = None
    for qi, g in part.groupby("query_id"):
        tops = {}
        for kind, gg in g.groupby("kind"):
            o = np.lexsort((gg[id_col].to_numpy(np.int64),
                            gg["dist"].to_numpy(np.int64)))[:k]
            tops[kind] = set(gg[id_col].to_numpy(np.int64)[o].tolist())
        n_ov = len(tops.get(0, set()) & tops.get(1, set()))
        rows.append((int(qi), n_ov, n_ov * 1_000_000 // k))
    out = pd.DataFrame(rows, columns=["query_id", "n_overlap", "recall_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def lang_temperature_plan(ds, lang_col: str = "lang", alpha_sqrt: bool = True):
    """Multilingual temperature-sampling plan: reweight language shares to
    p_l ~ (n_l)^0.5 -- the alpha=0.5 exponent mC4 / XLM-R use to keep
    low-resource languages from vanishing while not letting them dominate.
    Emits, per language: raw count, the integer weight, the target share
    in ppm, and the resample factor in ppm (>1e6 = upsample, <1e6 =
    downsample) a sampler would apply to realize the plan at the same
    corpus size.

    Exactness: weight = floor(ieee_sqrt(n)) -- float64 sqrt of an int64 is
    correctly rounded in BOTH numpy and DuckDB, so floor agrees bit-for-bit
    (documented convention; an integer isqrt differs from it only within
    1 ulp of perfect squares ABOVE 2^52 rows per language). Shares and
    factors are floor-divided integers: share_ppm = w*1e6 // sum_w,
    factor_ppm = w*N*1e6 // (sum_w*n) -- the driver runs Python ints so the
    triple product cannot overflow.

    Scale shape: a per-batch value_counts partial + one bounded-key fold
    (|langs| keys); all plan arithmetic on the driver's bounded table."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(lang_col).to_pandas().value_counts()
        return pa.table({
            lang_col: pa.array(c.index.astype(str)),
            "n": pa.array(c.to_numpy(np.int64)),
        })

    counts = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[lang_col], aggs=[("n", "sum")], out_names=[lang_col, "n_docs"],
    ).to_pandas()

    n = counts["n_docs"].to_numpy(np.int64)
    w = np.floor(np.sqrt(n.astype(np.float64))).astype(object)
    N = int(n.sum())
    sum_w = int(sum(w))
    counts["weight"] = [int(x) for x in w]
    counts["target_share_ppm"] = [int(x) * 1_000_000 // sum_w for x in w]
    counts["resample_factor_ppm"] = [
        int(x) * N * 1_000_000 // (sum_w * int(nn)) for x, nn in zip(w, n)
    ]
    for c in ("n_docs", "weight", "target_share_ppm", "resample_factor_ppm"):
        counts[c] = counts[c].astype(np.int64)
    return counts.sort_values(lang_col).reset_index(drop=True)


def quality_dup_calibration(ds, id_col: str = "doc_id",
                            text_col: str = "text", bin_ppm: int = 100_000,
                            n_bins: int = 10):
    """Does the quality score actually predict duplication? Per fixed
    quality bin (``bin_ppm``-wide rungs of quality_ppm, top-clamped), the
    fraction of documents participating in EXACT duplication (text-hash
    group size >= 2) -- the calibration curve a filtering policy should
    consult before trusting 'low quality' as a dedup proxy (and vice
    versa). Composes two green kernels: textstats quality features and the
    md5-prefix exact-dup key.

    Scale shape: stage 1 maps docs to compact (h, qbin) pairs (text never
    leaves the batch); ONE hash-domain exchange buckets by h so each text
    group lands whole; per-bucket fold emits <= 2*n_bins partial counts;
    tiny bounded final. Returns (qbin, n_docs, n_dup_docs, dup_rate_ppm)
    for observed bins, qbin ASC."""
    from ..functions import dedup as dk
    from ..functions import textstats as ts
    from .relational import hash_bucket_column, tiny_final_groupby

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        f = ts.quality_features(batch[text_col])
        q = np.minimum(f["quality_ppm"].to_numpy(np.int64) // bin_ppm,
                       n_bins - 1)
        memo: dict = {}
        h = np.array([dk.md5_u64_hashed(t, memo) for t in batch[text_col]],
                     dtype=np.uint64)
        return pd.DataFrame({"h": h, "qbin": q.astype(np.int64)})

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "h", 32)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h")["qbin"].transform("size")
        out = pd.DataFrame({"qbin": g["qbin"],
                            "dup": (sizes >= 2).astype(np.int64)})
        agg = out.groupby("qbin", as_index=False).agg(
            n_docs=("dup", "size"), n_dup_docs=("dup", "sum"))
        return agg.astype({"qbin": np.int64, "n_docs": np.int64,
                           "n_dup_docs": np.int64})

    cal = tiny_final_groupby(
        ds.map_batches(pairs, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas"),
        keys=["qbin"], aggs=[("n_docs", "sum"), ("n_dup_docs", "sum")],
        out_names=["qbin", "n_docs", "n_dup_docs"],
    ).to_pandas()
    cal["dup_rate_ppm"] = (
        cal["n_dup_docs"].to_numpy(np.int64) * 1_000_000
        // cal["n_docs"].to_numpy(np.int64)
    )
    for c in cal.columns:
        cal[c] = cal[c].astype(np.int64)
    return cal.sort_values("qbin").reset_index(drop=True)


def embedding_outliers_topk(ds, topk: int = 20, quant: int = 1000,
                            id_col: str = "vec_id", emb_col: str = "embedding",
                            label_col: str = "label"):
    """Label-conditioned embedding outliers: the top-k vectors FARTHEST
    (squared integer L2) from their own label's centroid -- the mislabeled
    /contaminated-cluster screen run before trusting labels for semdedup
    or classifier training. Centroid = truncating-div integer mean per dim
    of milli-quantized vectors (exact; truncation matches SQL's // on
    negative sums); distances are exact ints.

    Scale shape: pass 1 accumulates per-label (sum-per-dim, count)
    partials (labels x d bounded rows per block, no row shuffle), driver
    folds the bounded table into centroids and broadcasts them; pass 2
    scores map-side and keeps per-batch partial top-k, merged on the
    driver ((dist DESC, vec_id) total order). Returns
    (vec_id, label, dist) int64, rank order."""
    import ray

    from .relational import tiny_final_groupby

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    def sums(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        labs = np.unique(lab)
        d = Q.shape[1]
        out_l, out_j, out_v = [], [], []
        for L in labs:
            sel = Q[lab == L]
            out_l.extend([int(L)] * (d + 1))
            out_j.extend(range(d))
            out_j.append(-1)  # count row
            out_v.extend(sel.sum(axis=0).tolist())
            out_v.append(len(sel))
        return pa.table({label_col: pa.array(np.asarray(out_l, np.int64)),
                         "j": pa.array(np.asarray(out_j, np.int64)),
                         "v": pa.array(np.asarray(out_v, np.int64))})

    folded = tiny_final_groupby(
        ds.map_batches(sums, batch_format="pyarrow"),
        keys=[label_col, "j"], aggs=[("v", "sum")],
        out_names=[label_col, "j", "v"],
    ).to_pandas()
    counts = folded[folded["j"] < 0].set_index(label_col)["v"]
    cents = {}
    for L, g in folded[folded["j"] >= 0].groupby(label_col):
        g = g.sort_values("j")
        v = g["v"].to_numpy(np.int64)
        n = int(counts.loc[L])
        # TRUNCATING division (matches SQL //; sums can be negative)
        cents[int(L)] = np.where(v < 0, -((-v) // n), v // n).astype(np.int64)
    labs_sorted = sorted(cents)
    cent_mat = np.stack([cents[L] for L in labs_sorted])
    lab_index = {L: i for i, L in enumerate(labs_sorted)}
    cents_h = ray.put((cent_mat, lab_index))

    def score(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cent_mat, lab_index = ray.get(cents_h)
        rows = np.array([lab_index[int(x)] for x in lab], np.int64)
        dist = ((Q - cent_mat[rows]) ** 2).sum(axis=1)
        top = np.lexsort((ids, -dist))[:topk]
        return pa.table({
            id_col: pa.array(ids[top], pa.int64()),
            label_col: pa.array(lab[top], pa.int64()),
            "dist": pa.array(dist[top], pa.int64()),
        })

    part = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    o = np.lexsort((part[id_col].to_numpy(np.int64),
                    -part["dist"].to_numpy(np.int64)))[:topk]
    out = part.iloc[o].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def centroid_separation_audit(ds, quant: int = 1000, emb_col: str = "embedding",
                              label_col: str = "label"):
    """Per-label cluster-separation audit -- the companion screen to
    embedding_outliers_topk: before trusting labels for semdedup / stratified
    training, check each label's WITHIN dispersion (mean squared integer L2
    to its own centroid) against the squared distance to its NEAREST other
    centroid. A separation ratio near or below 1 means the label blends into
    a neighbor (Davies-Bouldin-style signal, kept integer-exact instead of
    ratio-of-floats).

    Exactness: vectors milli-quantized (floor(x*1000+0.5)), centroids are
    truncating-div integer means (matches SQL //; sums can be negative),
    within-SSD and centroid distances are exact int64 sums;
    within_msd = ssd // n and separation_ppm = nn_dist * 1e6 //
    GREATEST(within_msd, 1) are floor divisions of non-negative ints.

    Scale shape: pass 1 = per-label (sum-per-dim, count) partials (bounded
    labels x (d+1) rows per block, no row shuffle) folded by
    tiny_final_groupby; the (L x L) centroid geometry is driver arithmetic
    on a bounded table; pass 2 = map-side within-SSD partials against the
    ray.put-broadcast centroid matrix, folded the same way. Two streaming
    passes, zero row-domain shuffles -- the only shape that holds at 100 TB.

    Returns (label, n_vecs, within_msd, nn_label, nn_dist, separation_ppm)
    int64, ordered by label. nn tie-break: (dist, label) ascending."""
    import ray

    from .relational import tiny_final_groupby

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    def sums(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_j, out_v = [], [], []
        for L in np.unique(lab):
            sel = Q[lab == L]
            d = Q.shape[1]
            out_l.extend([int(L)] * (d + 1))
            out_j.extend(range(d))
            out_j.append(-1)
            out_v.extend(sel.sum(axis=0).tolist())
            out_v.append(len(sel))
        return pa.table({label_col: pa.array(np.asarray(out_l, np.int64)),
                         "j": pa.array(np.asarray(out_j, np.int64)),
                         "v": pa.array(np.asarray(out_v, np.int64))})

    folded = tiny_final_groupby(
        ds.map_batches(sums, batch_format="pyarrow"),
        keys=[label_col, "j"], aggs=[("v", "sum")],
        out_names=[label_col, "j", "v"],
    ).to_pandas()
    counts = folded[folded["j"] < 0].set_index(label_col)["v"]
    cents = {}
    for L, g in folded[folded["j"] >= 0].groupby(label_col):
        v = g.sort_values("j")["v"].to_numpy(np.int64)
        n = int(counts.loc[L])
        cents[int(L)] = np.where(v < 0, -((-v) // n), v // n).astype(np.int64)
    labs = sorted(cents)
    cent_mat = np.stack([cents[L] for L in labs])
    lab_index = {L: i for i, L in enumerate(labs)}
    cents_h = ray.put((cent_mat, lab_index))

    def ssd(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cm, idx = ray.get(cents_h)
        rows = np.array([idx[int(x)] for x in lab], np.int64)
        dist = ((Q - cm[rows]) ** 2).sum(axis=1)
        out_l = np.unique(lab)
        out_s = np.array([int(dist[lab == L].sum()) for L in out_l], np.int64)
        return pa.table({label_col: pa.array(out_l),
                         "s": pa.array(out_s, pa.int64())})

    ssd_tbl = tiny_final_groupby(
        ds.map_batches(ssd, batch_format="pyarrow"),
        keys=[label_col], aggs=[("s", "sum")], out_names=[label_col, "s"],
    ).to_pandas().set_index(label_col)["s"]

    rows = []
    for L in labs:
        i = lab_index[L]
        # nearest other centroid, tie-break (dist, label) ascending
        nn_label, nn_dist = None, None
        for M in labs:
            if M == L:
                continue
            dd = int(((cent_mat[i] - cent_mat[lab_index[M]]) ** 2).sum())
            if nn_dist is None or (dd, M) < (nn_dist, nn_label):
                nn_label, nn_dist = M, dd
        n = int(counts.loc[L])
        within = int(ssd_tbl.loc[L]) // n
        sep = nn_dist * 1_000_000 // max(within, 1)
        rows.append((L, n, within, nn_label, nn_dist, sep))
    out = pd.DataFrame(rows, columns=["label", "n_vecs", "within_msd",
                                      "nn_label", "nn_dist", "separation_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def readability_by_lang(ds, lang_col: str = "lang", text_col: str = "text"):
    """Flesch-Kincaid readability grade per language, integer-exact -- the
    classic curriculum-level screen run beside the Gopher sentence-shape
    rules when stratifying a corpus by difficulty (educational-value
    filtering's cheap heuristic ancestor). Adds the syllable dimension
    sentence_stats_by_lang lacks: syllables are approximated as vowel
    GROUPS ``[aeiouy]+`` over the lowered text (the standard regex proxy;
    identical non-overlapping count in pandas and RE2), words are the
    shared ``[a-z0-9]+`` lowered tokenization, sentences the shared
    ``[.!?]+`` runs.

    FK grade = 0.39*(W/S) + 11.8*(Syl/W) - 15.59, reported in milli as
    ``390*W // GREATEST(S,1) + 11800*Syl // GREATEST(W,1) - 15590`` --
    per-term floor division of non-negative ints, so both sides agree
    exactly (the per-term floors ARE the published convention here, not an
    approximation of a float pipeline).

    Scale shape: one vectorized str.count pass per batch, per-lang int
    partials, tiny bounded final merge -- a handful of rows per block,
    no row-domain shuffle. Returns (lang, n_docs, n_words, n_sentences,
    n_syllables, fk_grade_milli) ordered by the driver compare."""
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].fillna("").str.lower()
        ns = low.str.count(r"[.!?]+").to_numpy(np.int64)
        nw = low.str.count(r"[a-z0-9]+").to_numpy(np.int64)
        sy = low.str.count(r"[aeiouy]+").to_numpy(np.int64)
        g = pd.DataFrame({lang_col: batch[lang_col], "ns": ns, "nw": nw, "sy": sy})
        p = g.groupby(lang_col, sort=False).agg(
            n_docs=("ns", "size"), n_words=("nw", "sum"),
            n_sentences=("ns", "sum"), n_syllables=("sy", "sum"),
        ).reset_index()
        return p.astype({"n_docs": np.int64, "n_words": np.int64,
                         "n_sentences": np.int64, "n_syllables": np.int64})

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [lang_col],
        [("n_docs", "sum"), ("n_words", "sum"), ("n_sentences", "sum"),
         ("n_syllables", "sum")],
        [lang_col, "n_docs", "n_words", "n_sentences", "n_syllables"],
    )

    def add_grade(batch: pa.Table) -> pa.Table:
        w = batch.column("n_words").to_pylist()
        s = batch.column("n_sentences").to_pylist()
        sy = batch.column("n_syllables").to_pylist()
        grade = pa.array(
            [390 * int(W) // max(int(S), 1) + 11800 * int(Y) // max(int(W), 1)
             - 15590 for W, S, Y in zip(w, s, sy)],
            pa.int64(),
        )
        return batch.append_column("fk_grade_milli", grade)

    return folded.map_batches(add_grade, batch_format="pyarrow", batch_size=None)


def nearest_centroid_confusion(ds, quant: int = 1000,
                               emb_col: str = "embedding",
                               label_col: str = "label"):
    """Nearest-centroid confusion matrix -- the label-noise estimator that
    closes the embedding-audit family (outliers: which vectors are wrong;
    separation: which labels blend; HERE: where do they blend TO): every
    vector is classified to its nearest label centroid (exact integer
    squared L2, ties to the smallest label) and the (true, predicted)
    confusion counts come back with per-true-label shares in floor-div ppm.

    Exactness: milli-quantized vectors, truncating-div integer centroids
    (matches SQL //), integer distance matrix Q^2 + C^2 - 2QC^T (values
    bounded ~1e10 at d=64 milli-scale, far inside int64), (dist, label)
    argmin tie-break = ascending-label argmin over the sorted centroid
    matrix.

    Scale shape: pass 1 = the bounded per-label (sum-per-dim, count) fold;
    pass 2 = map-side (L x L)-bounded confusion partials against the
    ray.put-broadcast centroid matrix, folded by tiny_final_groupby. No
    row-domain shuffle. Returns (label, pred_label, n_vecs, share_ppm)
    ordered by (label, pred_label)."""
    import ray

    from .relational import tiny_final_groupby

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    def sums(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_j, out_v = [], [], []
        for L in np.unique(lab):
            sel = Q[lab == L]
            d = Q.shape[1]
            out_l.extend([int(L)] * (d + 1))
            out_j.extend(range(d))
            out_j.append(-1)
            out_v.extend(sel.sum(axis=0).tolist())
            out_v.append(len(sel))
        return pa.table({label_col: pa.array(np.asarray(out_l, np.int64)),
                         "j": pa.array(np.asarray(out_j, np.int64)),
                         "v": pa.array(np.asarray(out_v, np.int64))})

    folded = tiny_final_groupby(
        ds.map_batches(sums, batch_format="pyarrow"),
        keys=[label_col, "j"], aggs=[("v", "sum")],
        out_names=[label_col, "j", "v"],
    ).to_pandas()
    counts = folded[folded["j"] < 0].set_index(label_col)["v"]
    cents = {}
    for L, g in folded[folded["j"] >= 0].groupby(label_col):
        v = g.sort_values("j")["v"].to_numpy(np.int64)
        n = int(counts.loc[L])
        cents[int(L)] = np.where(v < 0, -((-v) // n), v // n).astype(np.int64)
    labs = np.array(sorted(cents), np.int64)
    cent_mat = np.stack([cents[int(L)] for L in labs])
    cents_h = ray.put((cent_mat, labs))

    def confuse(batch: pa.Table) -> pa.Table:
        Q = _mat(batch.column(emb_col))
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cm, labs_v = ray.get(cents_h)
        # exact integer distance matrix; argmin ties -> first = smallest label
        D = ((Q * Q).sum(axis=1)[:, None] + (cm * cm).sum(axis=1)[None, :]
             - 2 * (Q @ cm.T))
        # pack (true, pred) as INDEX pairs into the sorted label vector --
        # negative-label-safe (raw-value packing would corrupt under
        # floor-mod); the true label always indexes: pass 1 saw every label
        li = np.searchsorted(labs_v, lab)
        pi = np.argmin(D, axis=1)
        key = li * len(labs_v) + pi
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            label_col: pa.array(labs_v[uk // len(labs_v)], pa.int64()),
            "pred_label": pa.array(labs_v[uk % len(labs_v)], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    conf = tiny_final_groupby(
        ds.map_batches(confuse, batch_format="pyarrow"),
        keys=[label_col, "pred_label"], aggs=[("n", "sum")],
        out_names=[label_col, "pred_label", "n"],
    ).to_pandas().sort_values([label_col, "pred_label"]).reset_index(drop=True)
    totals = counts.astype(int)
    conf["share_ppm"] = [
        int(n) * 1_000_000 // int(totals.loc[L])
        for L, n in zip(conf[label_col], conf["n"])
    ]
    out = conf.rename(columns={"n": "n_vecs"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def source_centroid_geometry(sf_dir: str, quant: int = 1000, buckets: int = 32):
    """Per-source embedding-centroid geometry -- the domain-shift audit
    across corpus slices: for every unordered source pair, the EXACT
    integer dot product of the two truncating-div centroids plus both
    squared norms. Cosine is left rational on purpose (dot / sqrt(na*nb)
    floats differently across engines; the three integers determine it
    exactly and the driver compare stays string-exact), matching the
    embedding_covariance_topk convention of shipping exact numerators.

    Scale shape: embeddings join their doc's source through ONE bucketed
    hash join (both sides corpus-sized -- no broadcast), per-source
    (sum-per-dim, count) partials are bounded (sources x (d+1) rows per
    block), and the pairwise geometry is driver arithmetic on Python ints
    over the bounded centroid table. Returns (source_a, source_b,
    dot_num, normsq_a, normsq_b), source_a < source_b lexicographic."""
    import ray.data as rd

    from .relational import bucketed_hash_join, tiny_final_groupby

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    joined = bucketed_hash_join(emb, docs, "vec_id", "doc_id",
                                buckets=buckets)

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    def sums(df) -> pa.Table:
        batch = pa.Table.from_pandas(df, preserve_index=False)
        Q = _mat(batch.column("embedding"))
        src = batch.column("source").to_pandas().to_numpy()
        out_s, out_j, out_v = [], [], []
        for S in pd.unique(src):
            sel = Q[src == S]
            d = Q.shape[1]
            out_s.extend([str(S)] * (d + 1))
            out_j.extend(range(d))
            out_j.append(-1)
            out_v.extend(sel.sum(axis=0).tolist())
            out_v.append(len(sel))
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "j": pa.array(np.asarray(out_j, np.int64)),
                         "v": pa.array(np.asarray(out_v, np.int64))})

    folded = tiny_final_groupby(
        joined.map_batches(sums, batch_format="pandas"),
        keys=["source", "j"], aggs=[("v", "sum")],
        out_names=["source", "j", "v"],
    ).to_pandas()
    counts = folded[folded["j"] < 0].set_index("source")["v"]
    cents = {}
    for S, g in folded[folded["j"] >= 0].groupby("source"):
        v = g.sort_values("j")["v"].to_numpy(np.int64)
        n = int(counts.loc[S])
        cents[str(S)] = [int(x) for x in
                         np.where(v < 0, -((-v) // n), v // n)]
    srcs = sorted(cents)
    rows = []
    for i, a in enumerate(srcs):
        ca = cents[a]
        for b in srcs[i + 1:]:
            cb = cents[b]
            dot = sum(x * y for x, y in zip(ca, cb))
            na = sum(x * x for x in ca)
            nb = sum(x * x for x in cb)
            rows.append((a, b, dot, na, nb))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "dot_num",
                                      "normsq_a", "normsq_b"])
    for c in ("dot_num", "normsq_a", "normsq_b"):
        out[c] = out[c].astype(np.int64)
    return out


def kcenter_coreset(ds, k: int = 8, quant: int = 1000,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Gonzalez farthest-first-traversal k-center coreset over the
    embedding table -- the classic 2-approximation to the k-center
    objective (Gonzalez 1985) and the standard geometry-aware seed set
    for coreset selection / k-means++ style initialization over a
    training corpus: pick the min-id point, then k-1 times pick the point
    FARTHEST (exact integer squared L2 on the shared milli-quantization)
    from every center chosen so far; ties break to the smallest id so
    the traversal is a pure function of the table.

    Scale shape: the narrow (id, quantized-vector) projection
    materializes ONCE (the k-pass working set -- columnar int64 blocks in
    the object store, spillable; the corpus text never loads); each of
    the k-1 rounds is ONE streaming map over it (distance to the <= k
    broadcast centers, a few KB shipped per round) emitting a SINGLE
    (max_d, argmax_id) partial row per block, folded on the driver over
    #blocks rows. Total work k^2*N*d multiply-adds -- recomputing the
    running min each round keeps rounds stateless (no per-round dataset
    rewrite, no lineage growth), the right trade for small k; past
    k ~ 50 persist the running-min column instead (one rewrite per
    round). Selected ids are excluded in-stage so duplicate points
    (d = 0 everywhere) cannot re-select a center when N < k rounds
    remain; rounds stop early when no candidate rows remain.

    Returns (sel_order 1..k, vec_id, distsq): distsq is the point's
    exact min squared distance to all PRIOR centers at selection time
    (0 for the seed) -- the nonincreasing Gonzalez radius profile, a
    direct read of how much geometric coverage each extra center buys.
    Reference analogue: SURVEY.md 2.10 embedding family."""

    def _quant(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)

    def project(batch: pa.Table) -> pa.Table:
        Q = _quant(batch.column(vec_col))
        return pa.table(
            {
                "vec_id": batch.column(id_col).cast(pa.int64()),
                "q": pa.array(list(Q), pa.list_(pa.int64())),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow").materialize()
    seed = int(proj.min("vec_id"))
    centers: list[tuple[int, np.ndarray | None]] = [(seed, None)]
    rows = [(1, seed, 0)]

    def _rows(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        return col.flatten().to_numpy(zero_copy_only=False).astype(np.int64).reshape(n, d)

    for r in range(2, k + 1):
        # center vectors must be known BEFORE the distance pass: resolve
        # the newest one via one targeted predicate-pushdown pull (k small,
        # a few KB total -- the broadcast side of every round's map)
        for j, (cid, cv) in enumerate(centers):
            if cv is None:
                t = proj.filter(expr=f"vec_id == {cid}").take(1)
                centers[j] = (cid, np.asarray(t[0]["q"], np.int64))
        ids_sel = np.array(sorted(c[0] for c in centers), np.int64)
        cmat = np.stack([c[1] for c in centers])

        def far_partial(batch: pa.Table, _sel=ids_sel, _cm=cmat) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            Q = _rows(batch.column("q"))
            keep = ~np.isin(ids, _sel)
            ids, Q = ids[keep], Q[keep]
            if not len(ids):
                return pa.table({"d": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64())})
            dmin = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
            for cv in _cm:
                diff = Q - cv[None, :]
                np.minimum(dmin, np.einsum("ij,ij->i", diff, diff), out=dmin)
            best = int(dmin.max())
            cand = ids[dmin == best]
            return pa.table({"d": pa.array([best], pa.int64()),
                             "vec_id": pa.array([int(cand.min())], pa.int64())})

        parts = proj.map_batches(far_partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        best_d = int(parts["d"].max())
        best_id = int(parts.loc[parts["d"] == best_d, "vec_id"].min())
        centers.append((best_id, None))
        rows.append((r, best_id, best_d))

    out = pd.DataFrame(rows, columns=["sel_order", "vec_id", "distsq"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out



def pca_top_component(ds, iters: int = 12, quant: int = 1000,
                      scale: int = 1_000_000, vec_col: str = "embedding"):
    """Top principal component of the embedding cloud by power iteration
    on the EXACT integer covariance numerator -- the one-pass distributed
    PCA head used to audit anisotropy / dominant-direction collapse in an
    embedding table before ANN indexing (a cloud that is secretly rank-1
    breaks IVF and LSH recall) and to whiten-or-not decisions.

    Exactness: the corpus pass folds the same (triu second moments,
    per-dim sums, n) partials as embedding_covariance_topk, here WITH the
    diagonal; C[a,b] = n*S[a,b] - s[a]*s[b] is the n^2-scaled covariance,
    PSD and integer. Power iteration runs a FIXED ``iters`` rounds of
    w = C v; v' = trunc(w * scale / max|w|) -- truncation toward zero
    spelled sign-split (floor-div on magnitudes) so the SQL replay is
    character-identical; max|w| = 0 keeps v (stationary zero edge). All
    driver arithmetic on Python ints (C reaches ~1e18 at 1e6 rows --
    HUGEINT territory the SQL mirrors); only the FINAL projection narrows
    to int64. No convergence test on purpose: a fixed iteration count is
    the determinism contract, and 12 rounds of exact arithmetic resolve
    any spectral gap the audit cares about.

    Scale shape: ONE streaming pass over the vectors (d*(d+1)/2 + d + 1
    int partials per block, folded by tiny_final_groupby); the d x d
    iteration is driver-side on a bounded matrix. Rayleigh quotient
    reported as lambda_micro = trunc(v'Cv * 1e6 / (v'v * n^2)) -- the top
    eigenvalue of the covariance in micro-milli^2 units, int64-safe at
    any n because the n^2 scaling cancels.

    Returns (dim 1-based, v_scaled in [-scale, scale], lambda_micro
    repeated) ordered by dim. Reference analogue: SURVEY.md 2.10
    embedding family."""
    from .relational import tiny_final_groupby

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        V = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(n, d)
        Q = np.floor(V * quant + 0.5).astype(np.int64)
        S = Q.T @ Q
        s = Q.sum(axis=0)
        iu, ju = np.triu_indices(d, k=0)
        keys = np.concatenate([iu * d + ju, d * d + np.arange(d), [-1]])
        vals = np.concatenate([S[iu, ju], s, [n]])
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "v": pa.array(vals, pa.int64())})

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["k"], aggs=[("v", "sum")], out_names=["k", "v"],
    ).to_pandas()
    kv = {int(k): int(v) for k, v in zip(folded["k"], folded["v"])}
    n = kv[-1]
    d = int((max(k for k in kv if 0 <= k) + 1) ** 0.5)
    s = [kv[d * d + a] for a in range(d)]
    C = [[0] * d for _ in range(d)]
    for a in range(d):
        for b in range(a, d):
            cv = n * kv[a * d + b] - s[a] * s[b]
            C[a][b] = C[b][a] = cv

    def tdiv(num: int, den: int) -> int:
        return -((-num) // den) if num < 0 else num // den

    v = [scale] + [0] * (d - 1)
    for _ in range(iters):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [tdiv(x * scale, m) for x in w]
    vcv = sum(v[i] * C[i][j] * v[j] for i in range(d) for j in range(d))
    vv = sum(x * x for x in v)
    lam = (vcv * 1_000_000) // (vv * n * n) if vv else 0
    out = pd.DataFrame({
        "dim": np.arange(1, d + 1, dtype=np.int64),
        "v_scaled": np.array(v, dtype=np.int64),
        "lambda_micro": np.full(d, lam, dtype=np.int64),
    })
    return out


def rendezvous_routing_balance(ds, n_workers: int = 16,
                               id_col: str = "doc_id"):
    """Rendezvous (highest-random-weight) routing balance audit: assign
    every document to the worker whose md5 score md5_u64('hrw:' || id ||
    ':' || worker) is highest (Thaler & Ravishankar 1996) and report the
    per-worker load. HRW is the affinity router for stateful actor pools
    (a doc must hit the SAME decode-memo / model-cache actor every run,
    across jobs and resubmits): unlike ``hash(id) % W``, growing the pool
    W -> W+1 remaps only ~1/(W+1) of the keys, so warm per-actor state
    survives a resize -- the property this audit certifies before wiring
    a router into the flagship's kind->extractor pools, alongside the
    uniformity read (share_ppm should sit near 1e6/W for every worker).

    Scale shape: map-side only -- each batch computes W md5 scores per id
    (hashlib C digests; the per-id loop is the documented md5-parity
    price, same adjudication as the fingerprint kernel) and folds to AT
    MOST W count partials per block; ONE tiny W-row fold, ppm arithmetic
    on the driver. Nothing corpus-sized ever exchanges.

    Returns (worker, n_docs, share_ppm) for workers that received >= 1
    doc, ordered by worker name. Reference analogue: the manager's
    static queue->worker wiring (SURVEY.md 2.4) made elastic."""
    from ..functions.dedup import md5_u64
    from .relational import tiny_final_groupby

    names = [f"w{i:02d}" for i in range(n_workers)]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.zeros(len(names), np.int64)
        for d in ids:
            best_w, best_h = 0, -1
            for j, w in enumerate(names):
                h = md5_u64(b"hrw:%d:%s" % (d, w.encode()))
                # ties (2^-64) break to the smallest worker name: strict >
                if h > best_h:
                    best_w, best_h = j, h
            counts[best_w] += 1
        keep = counts > 0
        return pa.table({
            "worker": pa.array(np.array(names, object)[keep], pa.string()),
            "n": pa.array(counts[keep], pa.int64()),
        })

    folded = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["worker"], aggs=[("n", "sum")], out_names=["worker", "n_docs"],
    ).to_pandas().sort_values("worker").reset_index(drop=True)
    total = int(folded["n_docs"].sum())
    folded["share_ppm"] = [
        int(n) * 1_000_000 // total for n in folded["n_docs"]
    ]
    for c in ("n_docs", "share_ppm"):
        folded[c] = folded[c].astype(np.int64)
    return folded


def dsir_importance_weights(sf_dir: str, target_lang: str = "en",
                            n_buckets: int = 1024):
    """DSIR-style importance weights over hashed unigram features (Xie et
    al. 2023, Data Selection via Importance Resampling): score every
    document by how much its token distribution looks like the TARGET
    slice (lang = target_lang) versus the raw corpus, then sample/keep by
    score downstream. The per-bucket log-likelihood ratio is computed at
    the repo's float-free bits resolution -- wb[b] = floor(log2(nt[b]+1))
    - floor(log2(nr[b]+1)) via the bit_length identity (monotonicity
    proof at doc_surprisal_topk) -- and the per-doc score is the
    length-normalized mean in milli-bits, sign-split truncating division
    so the SQL replay is character-identical. True DSIR uses float logs;
    at selection time only the ORDERING matters, and bits resolution
    orders identically wherever bucket counts differ by >= 2x.

    Scale shape: pass 1 folds (bucket, n_raw, n_target) count partials --
    at most n_buckets rows per block, ONE tiny fold; the n_buckets-int
    weight table broadcasts via ray.put; pass 2 re-tokenizes and scores
    map-side (two corpus text passes are inherent: the weights must exist
    before scoring -- DSIR itself is two-pass). Token hashing memoizes
    per batch (Zipfian vocab, same as the pair family). Nothing
    corpus-sized exchanges; output streams.

    Returns a Dataset of (doc_id, n_tok, score_milli), docs with >= 1
    token. Reference analogue: SURVEY.md 2.10 corpus-quality family."""
    import re

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.dedup import md5_u64_hashed
    from .relational import tiny_final_groupby

    word = re.compile(r"[a-z0-9]+")

    def _buckets(texts, memo):
        out = []
        for t in texts:
            toks = word.findall((t or "").lower())
            out.append(np.array(
                [md5_u64_hashed("dsir:" + tk, memo) % n_buckets
                 for tk in toks], np.int64))
        return out

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}
        bks = _buckets(batch.column("text").to_pylist(), memo)
        is_t = pc.equal(batch.column("lang"), target_lang).to_numpy(
            zero_copy_only=False)
        nr = np.zeros(n_buckets, np.int64)
        nt = np.zeros(n_buckets, np.int64)
        for bk, t in zip(bks, is_t):
            np.add.at(nr, bk, 1)
            if t:
                np.add.at(nt, bk, 1)
        keep = nr > 0
        idx = np.nonzero(keep)[0].astype(np.int64)
        return pa.table({"b": pa.array(idx, pa.int64()),
                         "nr": pa.array(nr[keep], pa.int64()),
                         "nt": pa.array(nt[keep], pa.int64())})

    folded = tiny_final_groupby(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        keys=["b"], aggs=[("nr", "sum"), ("nt", "sum")],
        out_names=["b", "nr", "nt"],
    ).to_pandas()
    wb = np.zeros(n_buckets, np.int64)
    for b, nr, nt in zip(folded["b"], folded["nr"], folded["nt"]):
        wb[int(b)] = ((int(nt) + 1).bit_length() - 1) - (
            (int(nr) + 1).bit_length() - 1)
    wb_handle = ray.put(wb)

    scored_in = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])

    class Score:
        def __init__(self) -> None:
            self.wb = ray.get(wb_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            memo: dict[str, int] = {}
            bks = _buckets(batch.column("text").to_pylist(), memo)
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            out_id, out_n, out_s = [], [], []
            for did, bk in zip(ids, bks):
                if not len(bk):
                    continue
                num = int(self.wb[bk].sum())
                ntok = len(bk)
                milli = (num * 1000) // ntok if num >= 0 else -(
                    (-num * 1000) // ntok)
                out_id.append(did)
                out_n.append(ntok)
                out_s.append(milli)
            return pa.table({
                "doc_id": pa.array(np.asarray(out_id, np.int64)),
                "n_tok": pa.array(np.asarray(out_n, np.int64)),
                "score_milli": pa.array(np.asarray(out_s, np.int64)),
            })

    return scored_in.map_batches(Score, batch_format="pyarrow",
                                 concurrency=(1, 8))


def lpa_communities(ds, rounds: int = 4, id_col: str = "doc_id", edges=None):
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the md5-derived citation graph -- the community detector next to
    the connectivity family (connected components find WHO TOUCHES WHOM;
    LPA finds DENSER-THAN-CUT blocks, the mirror-site / topic-cluster
    structure a dedup or mixture plan acts on). Deterministic variant:
    every node votes its own label PLUS each undirected neighbor's label;
    the new label is the modal vote with ties to the SMALLEST label --
    the self-vote both damps the classic sync-LPA bipartite oscillation
    and keeps isolated nodes labeled with no extra join. A FIXED
    ``rounds`` count (no convergence probe) is the determinism contract,
    same as pagerank_top.

    Plan shape: distinct undirected edges symmetrize once and
    materialize (~2N rows); each round is ONE bucketed hash join
    (edges x labels on the neighbor end -- both sides corpus-sized, no
    broadcast) and ONE mode_by_key exchange (moves the (node, label)
    vote domain, never raw rows); labels materialize per round (bounded
    recovery + O(1) schema probes, the measured pagerank justification).

    Returns a Dataset of (doc_id, community), one row per node.
    ``edges`` overrides the derived graph with an explicit (src, dst)
    Dataset (pytest hand graphs)."""
    from .relational import bucketed_hash_join, derive_buckets, mode_by_key

    if edges is None:
        edges = derived_link_edges(ds, ds.count(), id_col=id_col)

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"node": pa.array(np.concatenate([lo, hi])),
                         "nbr": pa.array(np.concatenate([hi, lo]))})

    from ray.data.aggregate import Count

    sym = (
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["node", "nbr"])
        .aggregate(Count(alias_name="__n"))
        .select_columns(["node", "nbr"])
        .materialize()
    )
    buckets = derive_buckets(sym.count(), rows_per_bucket=1_000_000)

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        return pa.table({"node": ids, "lab": ids})

    labels = ds.map_batches(init_labels, batch_format="pyarrow").materialize()

    def project_votes(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "lab"])

    def project_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node").combine_chunks().cast(pa.int64()),
            "lab": batch.column("mode_value").combine_chunks().cast(pa.int64()),
        })

    for _ in range(rounds):
        nbr_lab = bucketed_hash_join(
            sym, labels.rename_columns(["nbr", "lab"]), "nbr", "nbr",
            buckets=buckets,
        )
        votes = nbr_lab.map_batches(
            project_votes, batch_format="pyarrow").union(labels)
        labels = (
            mode_by_key(votes, "node", "lab")
            .map_batches(project_labels, batch_format="pyarrow")
            .materialize()
        )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("node"),
            "community": batch.column("lab"),
        })

    return labels.map_batches(final, batch_format="pyarrow")


def degree_assortativity(ds, id_col: str = "doc_id", edges=None):
    """Degree assortativity of the md5-derived citation graph (Newman
    2002): the Pearson correlation of endpoint degrees over the
    undirected edge list -- positive means hubs link hubs (social-graph
    shape), negative means hubs link leaves (web/citation shape). The
    single number that says whether hot-key skew in a graph pipeline
    CONCENTRATES (assortative cores make pointer-jumping and LPA rounds
    skew-bound) or SPREADS.

    Exactness: with x, y the endpoint degrees over the SYMMETRIZED edge
    list (every undirected edge votes twice, so sum x = sum y and the
    two marginal variances coincide), r = num / den with
    ``num = M * Sxy - Sx * Sx`` and ``den = M * Sxx - Sx * Sx`` -- exact
    Python-int driver arithmetic. num and den grow ~M^2 (past int64 near
    1e8 edges), so the SHIPPED value is r_ppm = sign-split-trunc(num *
    1e6 / den) -- exact integer both sides, bounded in [-1e6, 1e6] at
    any graph size.

    Plan shape: distinct undirected edges symmetrize once; degree =
    ONE grouped count over the symmetrized list; TWO bucketed hash
    joins attach x and y (both sides edge-domain -- no broadcast);
    per-block (count, Sx, Sxx, Sxy) partials fold to ONE tiny row.

    Returns one row (m_votes, r_ppm); degree-regular graphs have a zero
    variance term (r undefined) and ship r_ppm = 0."""
    from ray.data.aggregate import Count

    from .relational import bucketed_hash_join, derive_buckets, tiny_final_groupby

    if edges is None:
        edges = derived_link_edges(ds, ds.count(), id_col=id_col)

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"node": pa.array(np.concatenate([lo, hi])),
                         "nbr": pa.array(np.concatenate([hi, lo]))})

    sym = (
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["node", "nbr"])
        .aggregate(Count(alias_name="__n"))
        .select_columns(["node", "nbr"])
        .materialize()
    )
    buckets = derive_buckets(sym.count(), rows_per_bucket=1_000_000)
    deg = sym.groupby("node").aggregate(Count(alias_name="deg")).materialize()

    with_x = bucketed_hash_join(sym, deg, "node", "node", buckets=buckets)

    def flip(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nbr": batch.column("nbr"),
            "node": batch.column("node"),
            "x": batch.column("deg").combine_chunks().cast(pa.int64()),
        })

    both = bucketed_hash_join(
        with_x.map_batches(flip, batch_format="pyarrow"),
        deg.rename_columns(["nbr", "deg"]), "nbr", "nbr", buckets=buckets,
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "m": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    f = tiny_final_groupby(
        both.map_batches(moments, batch_format="pyarrow"),
        keys=["k"],
        aggs=[("m", "sum"), ("sx", "sum"), ("sxx", "sum"), ("sxy", "sum")],
        out_names=["k", "m", "sx", "sxx", "sxy"],
    ).to_pandas()
    m = int(f["m"].iloc[0]) if len(f) else 0
    sx = int(f["sx"].iloc[0]) if len(f) else 0
    sxx = int(f["sxx"].iloc[0]) if len(f) else 0
    sxy = int(f["sxy"].iloc[0]) if len(f) else 0
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    if den == 0:
        r_ppm = 0
    elif num >= 0:
        r_ppm = (num * 1_000_000) // den
    else:
        r_ppm = -(((-num) * 1_000_000) // den)
    return pd.DataFrame({
        "m_votes": pd.Series([m], dtype="int64"),
        "r_ppm": pd.Series([r_ppm], dtype="int64"),
    })


def hits_scores(ds, rounds: int = 3, topn: int = 20, scale: int = 1_000_000,
                id_col: str = "doc_id", edges=None):
    """HITS hubs-and-authorities (Kleinberg 1999) over the md5-derived
    citation graph -- the second classic link-analysis ranking next to
    pagerank_top, separating GOOD POINTERS (hubs) from GOOD TARGETS
    (authorities): a(v) = sum of h over in-neighbors, h(u) = sum of a
    over out-neighbors, renormalized each half-step. The float L2
    normalization is replaced by an exact integer max-normalization
    ``v' = (s * scale) // max(s)`` -- every quantity non-negative int so
    Python floor-div == DuckDB ``//`` -- and a FIXED ``rounds`` count is
    the determinism contract (pagerank_top's convention). Rankings are
    normalization-invariant, which is all the audit consumes.

    Plan shape: edges materialize once; each half-step is ONE bucketed
    hash join (edges x scores -- both corpus-sized, no broadcast), ONE
    grouped int sum, a driver max() scalar, and a map-side rescale;
    scores materialize per half-step (bounded recovery, the measured
    pagerank justification). Nodes with no in-edges never enter the
    authority table (zero by construction on both sides).

    Returns the topn (doc_id, auth_scaled, hub_scaled) by authority
    descending, id ascending on ties; hub_scaled is 0 for a top
    authority that points at nothing scored."""
    from ray.data.aggregate import Sum

    from .relational import bucketed_hash_join, derive_buckets

    if edges is None:
        edges = derived_link_edges(ds, ds.count(), id_col=id_col)
    edges = edges.select_columns(["src", "dst"]).materialize()
    buckets = derive_buckets(edges.count(), rows_per_bucket=1_000_000)

    def init_scores(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        return pa.table({"node": ids,
                         "v": pa.array([scale] * len(ids), pa.int64())})

    h = ds.map_batches(init_scores, batch_format="pyarrow").materialize()
    a = None

    def _half_step(scores, src_key: str, dst_key: str):
        """scores on the ``src_key`` end -> summed, renormalized scores
        on the ``dst_key`` end."""
        joined = bucketed_hash_join(
            edges, scores.rename_columns([src_key, "v"]), src_key, src_key,
            buckets=buckets,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column(dst_key),
                             "v": batch.column("v")})

        raw = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("v", alias_name="s"))
            .materialize()
        )
        m = raw.max("s")
        if m is None or m == 0:
            return raw.map_batches(
                lambda b: pa.table({"node": b.column("node"),
                                    "v": pa.array(np.zeros(b.num_rows,
                                                           np.int64))}),
                batch_format="pyarrow",
            ).materialize()

        def rescale(batch: pa.Table, _m=int(m)) -> pa.Table:
            s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": batch.column("node"),
                             "v": pa.array(s * scale // _m, pa.int64())})

        return raw.map_batches(rescale, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        a = _half_step(h, "src", "dst")
        h = _half_step(a, "dst", "src")

    def topk_partial(batch: pa.Table, _n=topn) -> pa.Table:
        df = batch.to_pandas().sort_values(["v", "node"],
                                           ascending=[False, True]).head(_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        a.map_batches(topk_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()
    )
    # hub lookup for <= topn ids: a targeted map-side mask pull
    ids = np.array(sorted(int(i) for i in top["node"]), np.int64)

    def keep_top(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(n, ids)))

    hub_rows = (h.map_batches(keep_top, batch_format="pyarrow").to_pandas()
                if len(ids) else pd.DataFrame({"node": [], "v": []}))
    if "node" not in hub_rows.columns:  # empty pull loses its schema
        hub_rows = pd.DataFrame({"node": [], "v": []})
    hub_map = dict(zip(hub_rows["node"].astype(np.int64),
                       hub_rows["v"].astype(np.int64)))
    out = pd.DataFrame({
        "doc_id": top["node"].astype(np.int64),
        "auth_scaled": top["v"].astype(np.int64),
        "hub_scaled": np.array([int(hub_map.get(int(i), 0)) for i in
                                top["node"]], np.int64),
    })
    return out.reset_index(drop=True)


def langid_kappa(ds, lang_col: str = "lang", text_col: str = "text"):
    """Cohen's kappa between the labeled language and the n-gram
    heuristic's prediction (Cohen 1960) -- the chance-corrected
    agreement scalar that turns langid_confusion's matrix into ONE
    routing-trust number (raw accuracy flatters any classifier on a
    skewed language mix; kappa subtracts the agreement a
    marginal-matching random router would get).

    Exactness: from the bounded confusion table, with N rows, A the
    diagonal sum and E = sum over labels of row-marginal *
    column-marginal, kappa = (N*A - E) / (N*N - E); computed on driver
    Python ints and shipped as sign-split-truncating kappa_ppm (N*N
    passes int64 near 3e9 docs; ppm is bounded). Degenerate N*N == E
    (single-label world) ships 0.

    Scale shape: inherits langid_confusion's map-side cell partials and
    ONE tiny fold; everything after is driver arithmetic on the
    |langs|^2-bounded table.

    Returns one row (n_docs, agree, kappa_ppm)."""
    cm = langid_confusion(ds, lang_col=lang_col, text_col=text_col).to_pandas()
    n = int(cm["n_docs"].sum())
    agree = int(cm.loc[cm["lang"] == cm["pred_lang"], "n_docs"].sum())
    r = cm.groupby("lang")["n_docs"].sum()
    c = cm.groupby("pred_lang")["n_docs"].sum()
    e = sum(int(r[k]) * int(c[k]) for k in r.index if k in c.index)
    num = n * agree - e
    den = n * n - e
    if den == 0:
        kappa_ppm = 0
    elif num >= 0:
        kappa_ppm = (num * 1_000_000) // den
    else:
        kappa_ppm = -(((-num) * 1_000_000) // den)
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "agree": pd.Series([agree], dtype="int64"),
        "kappa_ppm": pd.Series([kappa_ppm], dtype="int64"),
    })


def kmv_distinct_audit(events, col: str = "user_id", k: int = 256):
    """KMV (k-minimum-values) distinct-count audit (Bar-Yossef et al.
    2002): the bottom-k sketch estimate next to the EXACT distinct count
    with the absolute error in ppm -- completing the sketch-accuracy
    family (hll_error_audit: registers; bloom_fp_audit: membership;
    cms_error_audit: frequency; HERE: order statistics). KMV is the
    sketch of choice when the same bottom-k set must ALSO serve set
    operations (union = merge-and-trim, intersection via Jaccard of the
    combined bottom-k) -- one artifact, three answers, which HLL cannot
    do.

    Estimator: with m_k the k-th smallest md5-u64 over DISTINCT keys,
    estimate = (k-1) * 2^64 // m_k (driver Python ints; the SQL replay
    uses HUGEINT); fewer than k distinct values seen -> the bottom set
    IS the population and its size ships exactly. Same 2^-64
    hash-collision caveat as the pair family.

    Scale shape: per-batch unique -> hash -> k-smallest partials (k rows
    per block max), ONE driver merge of k x blocks rows; the exact side
    is the same value-domain exchange hll_error_audit uses. Returns ONE
    row (exact_distinct, kmv_distinct, abs_err_ppm)."""
    from ..functions.dedup import md5_u64
    from .relational import hash_bucket_column

    def bottom_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        hs = np.array([md5_u64(b"kmv:%s" % str(v).encode()) for v in u],
                      np.uint64)
        hs = np.sort(hs)[:k]
        return pa.table({"hv": pa.array(hs, pa.uint64())})

    bot = np.unique(
        events.map_batches(bottom_partial, batch_format="pyarrow")
        .to_pandas()["hv"].to_numpy(np.uint64)
    )[:k]
    if len(bot) < k:
        est = len(bot)
    else:
        est = ((k - 1) * (1 << 64)) // int(bot[-1])

    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        return hash_bucket_column(pa.table({col: pa.array(u)}), col, 64)

    def bucket_n(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g[col].nunique())]})

    exact = int(
        events.map_batches(uniq, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_n, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    err = abs(int(est) - exact) * 1_000_000 // exact if exact else 0
    return pd.DataFrame({
        "exact_distinct": pd.array([exact], dtype="int64"),
        "kmv_distinct": pd.array([int(est)], dtype="int64"),
        "abs_err_ppm": pd.array([err], dtype="int64"),
    })


def kcore_nodes(ds, k: int = 2, rounds: int = 4, id_col: str = "doc_id",
                edges=None, broadcast_cap_ids: int = 8_000_000):
    """k-core peeling over the md5-derived citation graph (Seidman 1983):
    iteratively drop nodes whose degree within the SURVIVING subgraph is
    below k -- the densest-region extractor that pagerank/LPA rank but
    never delimit, and the standard prefilter before any expensive
    per-subgraph pass (a node outside the 2-core can sit on no cycle and
    no triangle). A FIXED ``rounds`` count is the determinism contract:
    round t ships the t-th peel iterate, a monotone-decreasing superset
    of the true k-core that EQUALS it once a round removes nothing
    (sparse random graphs converge in a handful of peels; the monotone
    chain makes the fixed cut exact on both sides by construction).

    Plan shape (incremental peel -- the first revision re-semi-joined the
    FULL survivor set onto both edge ends every round, 2 corpus-sized
    joins x rounds, measured 25.5 s at sf0.1): the live edge set
    materializes once and only SHRINKS; each round is ONE grouped degree
    count over live edges plus ONE map-side filter that drops edges
    touching that round's REMOVED set -- which is exactly the newly
    peeled nodes, broadcast via ray.put under ``broadcast_cap_ids``
    (adaptive-broadcast convention; a loud raise past the cap documents
    the bucketed anti-join fallback shape). Rounds stop early at a
    fixpoint (nothing removed) or an empty core -- both sides of the
    oracle agree by monotonicity.

    Returns a Dataset of (doc_id,) -- the nodes surviving ``rounds``
    peels, i.e. the k-core upper iterate."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Count

    if edges is None:
        edges = derived_link_edges(ds, ds.count(), id_col=id_col)

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"node": pa.array(np.concatenate([lo, hi])),
                         "nbr": pa.array(np.concatenate([hi, lo]))})

    live = (
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["node", "nbr"])
        .aggregate(Count(alias_name="__n"))
        .select_columns(["node", "nbr"])
        .materialize()
    )

    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    for _ in range(rounds):
        deg = live.groupby("node").aggregate(Count(alias_name="dg"))

        def below_k(batch: pa.Table, _k=k) -> pa.Table:
            # only the PEELED rows travel to the driver (bounded by the
            # round's peel size, never the node domain)
            if "node" not in batch.column_names:
                return pa.table({"node": pa.array([], pa.int64())})
            d = batch.column("dg").to_numpy(zero_copy_only=False)
            return pa.table(
                {"node": batch.column("node").combine_chunks()
                 .cast(pa.int64()).filter(pa.array(d < _k))})

        rem_df = deg.map_batches(below_k, batch_format="pyarrow").to_pandas()
        rem = (rem_df["node"].to_numpy(np.int64)
               if "node" in rem_df.columns else np.empty(0, np.int64))
        if not len(rem):
            break  # fixpoint: the iterate IS the k-core
        if len(rem) > broadcast_cap_ids:
            raise ValueError(
                f"peeled set {len(rem)} ids exceeds the broadcast cap; "
                "drop the edges via the bucketed anti-join shape at this "
                "scale (semi-join live edges against the survivor set)")
        rem_handle = ray.put(np.sort(rem))

        class DropTouched:
            def __init__(self) -> None:
                self.rem = ray.get(rem_handle)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if "node" not in batch.column_names:  # schema-less empty
                    return pa.table({"node": pa.array([], pa.int64()),
                                     "nbr": pa.array([], pa.int64())})
                a = batch.column("node").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                b = batch.column("nbr").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                pos_a = np.searchsorted(self.rem, a)
                pos_b = np.searchsorted(self.rem, b)
                na = np.clip(pos_a, 0, max(len(self.rem) - 1, 0))
                nb = np.clip(pos_b, 0, max(len(self.rem) - 1, 0))
                hit = (self.rem[na] == a) | (self.rem[nb] == b)
                return batch.filter(pa.array(~hit))

        live = live.map_batches(
            DropTouched, batch_format="pyarrow", concurrency=(1, 8)
        ).materialize()
        if live.count() == 0:
            return rd.from_arrow(empty)

    # surviving iterate = nodes at degree >= k in the final live set (at a
    # fixpoint every live node qualifies, so the recompute is identical);
    # stays a Dataset -- the node domain never lands on the driver
    final_deg = live.groupby("node").aggregate(Count(alias_name="dg"))

    def at_least_k(batch: pa.Table, _k=k) -> pa.Table:
        if "node" not in batch.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        d = batch.column("dg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": batch.column("node").combine_chunks()
             .cast(pa.int64()).filter(pa.array(d >= _k))})

    return final_deg.map_batches(at_least_k, batch_format="pyarrow")




def entity_dedupe_keepers(ds, col: str, broadcast_cap_rows: int = 2_000_000,
                          buckets: int = 64):
    """End-to-end entity canonicalization: FastSS edit-distance-1 pairs
    (``typo_pairs``) -> connected components (``dedup_clusters``) -> a
    canonical-name map for the WHOLE vocabulary -- the classic record-
    linkage resolve step (a typo'd customer name and its true form merge
    under the lexicographically smallest member; untouched names map to
    themselves). This is the fuzzy mirror of exact_dedup's keep-first:
    exact dedup collapses identical strings, THIS collapses a
    Levenshtein-1 neighborhood, and the two compose (run this first,
    then exact machinery downstream sees clean keys).

    Scale shape: the pair and component machinery is the existing exact
    FastSS + union-find path; the component table is PAIR-bounded (only
    names in some pair), broadcast via ray.put under
    ``broadcast_cap_rows`` (loud raise past it -- the bucketed-join
    shape is the fallback documented at cross_source_dup_matrix); the
    vocabulary distinct is one value-domain exchange and the canonical
    gather is map-side. Returns (name, canonical), one row per DISTINCT
    name, canonical <= name lexicographically."""
    import ray

    from .relational import hash_bucket_column

    pairs = typo_pairs(ds, col, buckets=buckets)
    cl = dedup_clusters(pairs, id_a="tok_a", id_b="tok_b").to_pandas()
    if len(cl) > broadcast_cap_rows:
        raise ValueError(
            f"component table {len(cl)} rows exceeds the broadcast cap; "
            "attach canonicals via the bucketed-join shape at this scale")
    canon_handle = ray.put(dict(zip(cl["doc_id"].astype(str),
                                    cl["cluster_id"].astype(str))))

    def distinct_vals(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u.tolist(), pa.string())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, col, buckets)

    def canon_group(g: pd.DataFrame) -> pd.DataFrame:
        # ray.get on a broadcast handle is a shared-memory lookup per
        # group, not a copy per row
        m = ray.get(canon_handle)
        names = np.unique(g[col].to_numpy(object))
        return pd.DataFrame({
            "name": names,
            "canonical": [m.get(str(n), str(n)) for n in names],
        })

    return (
        ds.map_batches(distinct_vals, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(canon_group, batch_format="pandas")
    )


def hive_partition_prune_daily(sf_dir: str, lo_day: str = "2024-01-10",
                               hi_day: str = "2024-01-20",
                               cache_root: str = "/tmp/graft_hive"):
    """Hive-style partition pruning, end to end: the events table is laid
    out ONCE as a day=YYYY-MM-DD partitioned parquet dataset (the
    standard warehouse layout), then a day-range query reads it back
    through a ``PathPartitionFilter`` so non-matching partition
    DIRECTORIES never open -- pruning at the file listing, the layout
    complement of ``pruned_range_read`` (row-group zone maps) and
    ``zorder_2d_prune`` (multi-dim clustering): three rungs of the same
    skip-the-bytes ladder. At 100 TB the partitioned layout is what
    turns a 30-day scan into a 10-day scan BEFORE any reader task
    launches.

    The partitioned copy is content-addressed per sf_dir under /tmp and
    written through a tmp-dir + atomic rename (concurrent callers race
    benignly; losers reuse the winner's directory). Day derivation,
    cents quantization and the aggregate are shared character-for-
    character with events_daily's replay.

    Returns (day, n_events, value_cents) for lo_day <= day < hi_day,
    via a bounded per-day fold."""
    import os
    import shutil

    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.datasource.partitioning import Partitioning, PathPartitionFilter

    from .relational import _cents, tiny_final_groupby

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, tag, "events_by_day")
    if not os.path.isdir(out):
        src = rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts", "value"])

        def add_day(batch: pa.Table) -> pa.Table:
            day = pc.strftime(pc.floor_temporal(batch.column("ts"),
                                                unit="day"), format="%Y-%m-%d")
            return pa.table({"day": day,
                             "value_cents": _cents(batch.column("value"))})

        tmp = f"{out}.tmp.{os.getpid()}"
        src.map_batches(add_day, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["day"])
        try:
            os.rename(tmp, out)
        except OSError:  # another process won the race: reuse theirs
            shutil.rmtree(tmp, ignore_errors=True)

    part_filter = PathPartitionFilter.of(
        lambda kv: lo_day <= kv["day"] < hi_day)
    ds = rd.read_parquet(out, partition_filter=part_filter,
                         partitioning=Partitioning("hive"))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "day": batch.column("day").combine_chunks().cast(pa.string()),
            "value_cents": batch.column("value_cents").combine_chunks()
            .cast(pa.int64()),
        })
        return t.group_by(["day"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")])

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"],
        [("value_cents_sum", "sum"), ("value_cents_count", "sum")],
        ["day", "value_cents", "n_events"],
    )


def bloom_pruned_join_revenue(sf_dir: str, priority: str = "1-URGENT",
                              bits_per_key: int = 16):
    """Bloom semi-join pruning, the classic distributed-join traffic
    optimization, end to end: the SELECTIVE build side (urgent orders)
    folds into one mergeable Bloom filter; the probe side (lineitem)
    tests membership MAP-SIDE and only survivors -- true matches plus
    the filter's bounded false positives -- enter the join exchange.
    False positives cost shuffle bytes, never correctness: the exact
    bucketed hash join eliminates them, so the aggregate equals the
    plain join's. At 100 TB the pruned traffic is the win: a 2%
    build-side selectivity turns the probe shuffle into ~2% of its
    bytes for 2 bits-per-key-per-probe-row of map-side work.

    Plan: ONE narrow build pass (per-batch partial Blooms, driver
    OR-merge of block-count x KB filters -- the md5 probe layout is
    functions/bloom.BloomFilter, already bit-for-bit SQL-replayed by
    novel_docs_bloom); bloom broadcast via ray.put; probe map-filter;
    one bucketed hash join of SURVIVORS against build keys; cents
    revenue fold. The pruned-traffic accounting (survivors vs probe
    rows vs true matches) is pytest-held; the oracle checks the exact
    aggregate through the plain join.

    Returns ONE row (n_lineitems, revenue_cents): joined lineitem rows
    and the sum of extendedprice*(1 - discount) in the shared cents
    convention -- both additive, so per-block partials fold exactly
    however dynamic block splitting carves the join output."""
    import ray
    import ray.data as rd

    from ..functions.bloom import BloomFilter
    from .relational import bucketed_hash_join, derive_buckets, tiny_final_groupby

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def build_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(batch.column("o_orderpriority"), priority)
        return pa.table({"o_orderkey": batch.column("o_orderkey")
                         .combine_chunks().cast(pa.int64())}).filter(
            keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep)

    keys = orders.map_batches(build_keys, batch_format="pyarrow").materialize()
    n_build = keys.count()
    bloom = BloomFilter.for_keys(max(n_build, 1), bits_per_key=bits_per_key)

    def partial_bloom(batch: pa.Table) -> pa.Table:
        b = BloomFilter(bloom.m, bloom.k)
        b.add_many([str(x) for x in batch.column("o_orderkey").to_pylist()])
        return pa.table({"b": pa.array([b.to_bytes()], pa.binary())})

    for raw in keys.map_batches(partial_bloom,
                                batch_format="pyarrow").to_pandas()["b"]:
        bloom.merge(BloomFilter.from_bytes(raw))
    bloom_handle = ray.put(bloom.to_bytes())

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    class Probe:
        def __init__(self) -> None:
            self.bloom = BloomFilter.from_bytes(ray.get(bloom_handle))

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            # ~4 lineitems share an order: digest each DISTINCT key once
            # and gather (the md5-memoization convention of the pair
            # family) -- same probes, same oracle, 4x fewer digests
            uk, inv = np.unique(k, return_inverse=True)
            ok = self.bloom.contains_many([str(x) for x in uk])[inv]
            kept = batch.filter(pa.array(ok))
            price = kept.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = kept.column("l_discount").to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
            return pa.table({
                "l_orderkey": kept.column("l_orderkey").combine_chunks()
                .cast(pa.int64()),
                "rev": pa.array(rev, pa.int64()),
            })

    survivors = li.map_batches(Probe, batch_format="pyarrow",
                               concurrency=(1, 8))
    joined = bucketed_hash_join(
        survivors, keys, "l_orderkey", "o_orderkey",
        buckets=derive_buckets(max(n_build, 1)),
    )

    def fold(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_lineitems": pa.array([len(rev)], pa.int64()),
            "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
        })

    f = tiny_final_groupby(
        joined.map_batches(fold, batch_format="pyarrow"),
        keys=["k"],
        aggs=[("n_lineitems", "sum"), ("revenue_cents", "sum")],
        out_names=["k", "n_lineitems", "revenue_cents"],
    ).to_pandas()
    return f.drop(columns=["k"]).astype("int64")


def encoding_advisor(ds, columns, id_type_bytes: int | None = None,
                     buckets: int = 64):
    """Dictionary-encoding advisor for string columns -- the storage-
    layout decision beside compaction (fragment sizing) and z-order
    (clustering): for each column, the EXACT byte arithmetic of plain
    utf8 storage vs dictionary storage (distinct-value bytes + one
    fixed-width index per row, width = the bytes needed to index the
    dictionary), and the verdict. Low-cardinality columns (return
    flags, statuses, priorities) win by ~n_rows x (avg_len - 1) bytes;
    near-unique columns lose by the dictionary overhead -- the advisor
    makes the call from data, not heuristics.

    Exactness: plain_bytes = SUM(utf8 length); dict_bytes = SUM over
    DISTINCT values of length + n_rows * max(1, (bit_length(n_distinct
    - 1) + 7) // 8). Pure integers; the SQL replay shares the formula
    via length(bin()) arithmetic.

    Scale shape: per column, per-batch partials collapse to the BATCH-
    distinct (value, len) domain plus one (rows, bytes) counter row;
    ONE value-domain hash exchange dedupes globally (Zipfian
    categorical domains make this tiny); the final advisor table is
    |columns| rows of driver arithmetic.

    Returns (column, n_rows, n_distinct, plain_bytes, dict_bytes,
    dict_wins) ordered by column."""
    from .relational import hash_bucket_column

    rows = []
    for col in columns:
        def partial(batch: pa.Table, _c=col) -> pa.Table:
            v = batch.column(_c).to_pandas().fillna("")
            lens = v.str.len().to_numpy(np.int64)
            u = v.drop_duplicates()
            return pa.table({
                "v": pa.array(["\x00total"] + u.tolist(), pa.string()),
                "len": pa.array(
                    np.concatenate([[int(lens.sum())],
                                    u.str.len().to_numpy(np.int64)]),
                    pa.int64()),
                "n": pa.array(
                    np.concatenate([[len(v)], np.zeros(len(u), np.int64)]),
                    pa.int64()),
            })

        def add_bucket(batch: pa.Table) -> pa.Table:
            return hash_bucket_column(batch, "v", buckets)

        def dedupe(g: pd.DataFrame) -> pd.DataFrame:
            tot = g[g["v"] == "\x00total"]
            vals = g[g["v"] != "\x00total"].drop_duplicates("v")
            return pd.DataFrame({
                "n_rows": [int(tot["n"].sum())],
                "plain": [int(tot["len"].sum())],
                "n_distinct": [len(vals)],
                "dlen": [int(vals["len"].sum())],
            })

        f = (
            ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(dedupe, batch_format="pandas")
            .to_pandas()
        )
        n_rows = int(f["n_rows"].sum())
        plain = int(f["plain"].sum())
        n_distinct = int(f["n_distinct"].sum())
        dlen = int(f["dlen"].sum())
        idx_w = max(1, ((max(n_distinct - 1, 1)).bit_length() + 7) // 8)
        dict_bytes = dlen + n_rows * idx_w
        rows.append((col, n_rows, n_distinct, plain, dict_bytes,
                     1 if dict_bytes < plain else 0))
    out = pd.DataFrame(rows, columns=["column", "n_rows", "n_distinct",
                                      "plain_bytes", "dict_bytes",
                                      "dict_wins"]).sort_values("column")
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def local_clustering_topk(ds, topn: int = 20, id_col: str = "doc_id",
                          edges=None):
    """Per-node local clustering coefficient, top-n (Watts & Strogatz
    1998): lcc(v) = triangles through v / (deg(v) choose 2) -- the
    per-node refinement of triangle_count's global scalar, the standard
    ego-density screen (a crawl hub with high degree and near-zero lcc
    is a directory page; high lcc marks tight cliques -- mirror rings,
    template families). Shipped as exact truncating ppm.

    Plan: the same wedge-probe machinery as triangle_count but the wedge
    APEX survives the closing-key pack, so each closed wedge credits all
    THREE vertices (3 rows into one grouped count -- a triangle-domain
    exchange, tiny); degree is one grouped count over the symmetrized
    distinct edges; ONE bucketed left join attaches triangle counts to
    degrees; per-block partial top-n then a single tiny merge. Same
    n_nodes^2 < 2^63 packed-key bound as triangle_count.

    Returns (doc_id, deg, n_tri, lcc_ppm) top-n by (lcc_ppm DESC,
    doc_id), nodes with deg >= 2 only. ``edges`` overrides the derived
    graph (pytest hand graphs, the graph-family convention)."""
    from ray.data.aggregate import Count

    from .relational import bucketed_hash_join, derive_buckets

    n_nodes = ds.count()
    if n_nodes == 0 or n_nodes * n_nodes >= 2**63:
        raise ValueError("packed closing key needs n_nodes^2 < 2^63")

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    if edges is None:
        edges = derived_link_edges(ds, n_nodes, id_col=id_col)
    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    buckets = derive_buckets(und.count(), rows_per_bucket=1_000_000)

    wedges = bucketed_hash_join(
        und.rename_columns(["a", "b1"]), und.rename_columns(["a", "b2"]),
        "a", "a", buckets=buckets,
    ).filter(expr="b1 < b2")

    def wedge_key(batch: pa.Table) -> pa.Table:
        b1 = batch.column("b1").to_numpy(zero_copy_only=False)
        b2 = batch.column("b2").to_numpy(zero_copy_only=False)
        return pa.table({
            "apex": batch.column("a").combine_chunks().cast(pa.int64()),
            "k": pa.array(b1 * n_nodes + b2, pa.int64()),
        })

    def key_ab(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"k2": pa.array(a * n_nodes + b, pa.int64())})

    closed = bucketed_hash_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        und.map_batches(key_ab, batch_format="pyarrow"),
        "k", "k2", buckets=buckets,
    )

    def credit(batch: pa.Table) -> pa.Table:
        apex = batch.column("apex").to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(
            np.concatenate([apex, k // n_nodes, k % n_nodes]), pa.int64())})

    tri = (
        closed.map_batches(credit, batch_format="pyarrow")
        .groupby("v").aggregate(Count(alias_name="n_tri"))
        .materialize()
    )

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

    deg = (
        und.map_batches(undirect, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="deg"))
    )
    def tri_as_node(batch: pa.Table) -> pa.Table:
        # explicit projection, not rename_columns: the grouped count can
        # emit pandas blocks that a rename Project chokes on (and empty
        # blocks that lose schema -- same hazard as kcore_nodes)
        if "v" not in batch.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64())})
        return pa.table({
            "node": batch.column("v").combine_chunks().cast(pa.int64()),
            "n_tri": batch.column("n_tri").combine_chunks().cast(pa.int64()),
        })

    both = bucketed_hash_join(
        deg, tri.map_batches(tri_as_node, batch_format="pyarrow"),
        "node", "node", buckets=buckets, how="left")

    def score(batch: pa.Table, _n=topn) -> pa.Table:
        df = batch.to_pandas()
        if "node" not in df.columns or not len(df):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64()),
                             "lcc_ppm": pa.array([], pa.int64())})
        df = df[df["deg"].to_numpy(np.int64) >= 2]
        deg_v = df["deg"].to_numpy(np.int64)
        nt = df["n_tri"].fillna(0).to_numpy(np.int64)
        lcc = (2 * nt * 1_000_000) // (deg_v * (deg_v - 1))
        out = pd.DataFrame({"doc_id": df["node"].to_numpy(np.int64),
                            "deg": deg_v, "n_tri": nt, "lcc_ppm": lcc})
        out = out.sort_values(["lcc_ppm", "doc_id"],
                              ascending=[False, True]).head(_n)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_top(batch: pa.Table, _n=topn) -> pa.Table:
        df = batch.to_pandas().sort_values(["lcc_ppm", "doc_id"],
                                           ascending=[False, True]).head(_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        both.map_batches(score, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_top, batch_format="pyarrow")
        .to_pandas()
    )
    for c in top.columns:
        top[c] = top[c].astype(np.int64)
    return top.reset_index(drop=True)


def revenue_acf(sf_dir: str, max_lag: int = 7):
    """Autocorrelation function of daily order revenue at lags 1..max_lag
    (Box & Jenkins): THE first diagnostic read before any forecasting or
    anomaly model -- lag-7 mass says weekly seasonality (dow_adjusted_
    spikes then applies it), a slow decay says trend (ols_trend measures
    it), white noise says don't bother. Exactness: with the bounded
    daily series x_1..x_n in cents and S = sum(x), the lag-k coefficient
    is acf_k = num_k / den with ``num_k = sum_t (n*x_t - S)(n*x_{t+k} -
    S)`` and ``den = sum_t (n*x_t - S)^2`` -- the n-scaled demeaning
    keeps every term an integer (no fractional mean); shipped as
    sign-split truncating ppm on driver Python ints (the products pass
    int64 at planetary revenue, HUGEINT in the replay).

    Scale shape: ONE distributed daily fold (day x cents partials, the
    events_daily shape over orders); the ACF arithmetic runs on the
    bounded day-domain table -- the cusum/ols convention.

    Returns (lag, acf_ppm) for lags 1..max_lag; lags with no overlap
    (k >= n) or a constant series (den = 0) ship 0."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import _cents, tiny_final_groupby

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("o_orderdate"), format="%Y-%m-%d")
        t = pa.table({"day": day,
                      "cents": _cents(batch.column("o_totalprice"))})
        return t.group_by(["day"]).aggregate([("cents", "sum")])

    daily = tiny_final_groupby(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("cents_sum", "sum")], ["day", "cents"],
    ).to_pandas().sort_values("day")
    x = [int(v) for v in daily["cents"]]
    n = len(x)
    s = sum(x)
    d = [n * v - s for v in x]
    den = sum(v * v for v in d)
    rows = []
    for k in range(1, max_lag + 1):
        if den == 0 or k >= n:
            rows.append((k, 0))
            continue
        num = sum(d[t] * d[t + k] for t in range(n - k))
        ppm = (num * 1_000_000) // den if num >= 0 else -(
            ((-num) * 1_000_000) // den)
        rows.append((k, ppm))
    out = pd.DataFrame(rows, columns=["lag", "acf_ppm"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def event_type_stationary(sf_dir: str, iters: int = 12,
                          scale: int = 1_000_000):
    """Stationary distribution of the per-user event-type Markov chain:
    where the clickstream SETTLES if users keep behaving like the
    observed transition counts -- the long-run behavior profile that
    complements event_transitions (one-step counts) and session_paths
    (observed trajectories). pi is iterated a FIXED ``iters`` rounds of
    pi' = pi P in pure integers: per-source-term truncating division by
    the row sum, then a truncating renormalization to ``scale`` -- both
    spelled sign-free (all mass non-negative) so the SQL replay is
    character-identical; the fixed round count is the determinism
    contract shared with pagerank/HITS/PCA. Types whose row sum is zero
    (never a predecessor) pass no mass; unreachable types decay to 0.

    Scale shape: the transition fold is the existing event_transitions
    machinery (LAG pairs -> bounded (prev, next, n) table, one
    exchange); the k x k iteration runs on driver Python ints over the
    bounded type domain. Returns (event_type, pi_scaled) for every type
    appearing as a transition SOURCE or TARGET, ordered by type."""
    import ray.data as rd

    from .relational import event_transitions

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type", "event_id"])
    tr = event_transitions(ev).to_pandas()
    types = sorted(set(tr["prev_type"]) | set(tr["next_type"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    C = [[0] * k for _ in range(k)]
    for p, nx, n in zip(tr["prev_type"], tr["next_type"], tr["n"]):
        C[idx[p]][idx[nx]] = int(n)
    rowsum = [sum(r) for r in C]
    pi = [scale // k] * k
    for _ in range(iters):
        raw = [0] * k
        for i in range(k):
            if rowsum[i] == 0:
                continue
            for j in range(k):
                if C[i][j]:
                    raw[j] += (pi[i] * C[i][j]) // rowsum[i]
        tot = sum(raw)
        if tot == 0:  # mass vanished (no live transition): all-zero, as
            pi = [0] * k  # the replay's NULL-division COALESCE yields
            break
        pi = [(v * scale) // tot for v in raw]
    out = pd.DataFrame({"event_type": types,
                        "pi_scaled": np.array(pi, np.int64)})
    return out


def lpa_modularity(ds, rounds: int = 4, id_col: str = "doc_id", edges=None):
    """Newman modularity of the LPA partition (Newman & Girvan 2004):
    Q = sum_c [ e_c/m - (d_c/2m)^2 ] -- the standard goodness score for
    a community assignment, here grading lpa_communities' own output
    (positive and large: real block structure worth exploiting for
    locality; near zero: the partition is noise and a dedup/mixture plan
    should not trust it). Exactness: with m undirected edges, e_c =
    within-community edges and d_c = community degree mass,
    ``Q = sum_c (4*m*e_c - d_c^2) / (4*m^2)`` -- every term an integer;
    the global numerator folds distributively over the community domain
    and ships as sign-split truncating ppm (driver Python ints; the
    replay uses HUGEINT).

    Scale shape: labels come from the same fixed-round LPA; TWO
    bucketed hash joins attach both endpoints' communities to the
    distinct undirected edge list (corpus-sized sides, no broadcast);
    within-community edge counts and degree mass fold per community,
    then ONE bounded global sum. Returns one row (m_edges,
    n_communities, modularity_ppm)."""
    from ray.data.aggregate import Count, Sum

    from .relational import bucketed_hash_join, derive_buckets, tiny_final_groupby

    if edges is None:
        edges = derived_link_edges(ds, ds.count(), id_col=id_col)
    edges = edges.materialize()
    labels = lpa_communities(ds, rounds=rounds, id_col=id_col,
                             edges=edges).materialize()

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.minimum(s, d), pa.int64()),
                         "b": pa.array(np.maximum(s, d), pa.int64())})

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["a", "b"])
        .materialize()
    )
    m = und.count()
    buckets = derive_buckets(max(m, 1), rows_per_bucket=1_000_000)

    def lab_as(name):
        def project(batch: pa.Table, _n=name) -> pa.Table:
            if "doc_id" not in batch.column_names:
                return pa.table({_n: pa.array([], pa.int64()),
                                 f"c_{_n}": pa.array([], pa.int64())})
            return pa.table({
                _n: batch.column("doc_id").combine_chunks().cast(pa.int64()),
                f"c_{_n}": batch.column("community").combine_chunks()
                .cast(pa.int64()),
            })
        return project

    e1 = bucketed_hash_join(
        und, labels.map_batches(lab_as("a"), batch_format="pyarrow"),
        "a", "a", buckets=buckets)
    e2 = bucketed_hash_join(
        e1, labels.map_batches(lab_as("b"), batch_format="pyarrow"),
        "b", "b", buckets=buckets)

    def within_partial(batch: pa.Table) -> pa.Table:
        ca = batch.column("c_a").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = batch.column("c_b").to_numpy(zero_copy_only=False).astype(np.int64)
        # every edge contributes degree mass to BOTH endpoint communities;
        # within-community edges count once under their shared label
        comm = np.concatenate([ca, cb])
        t = pa.table({"c": pa.array(comm, pa.int64()),
                      "deg": pa.array(np.ones(len(comm), np.int64)),
                      "within": pa.array(
                          np.concatenate([(ca == cb).astype(np.int64),
                                          np.zeros(len(cb), np.int64)]))})
        return t.group_by(["c"]).aggregate([("deg", "sum"), ("within", "sum")])

    per_c = tiny_final_groupby(
        e2.map_batches(within_partial, batch_format="pyarrow"),
        keys=["c"], aggs=[("deg_sum", "sum"), ("within_sum", "sum")],
        out_names=["c", "d_c", "e_c"],
    ).to_pandas()
    n_comm = len(per_c)
    num = sum(4 * m * int(e) - int(d) * int(d)
              for e, d in zip(per_c["e_c"], per_c["d_c"]))
    den = 4 * m * m
    if den == 0:
        ppm = 0
    elif num >= 0:
        ppm = (num * 1_000_000) // den
    else:
        ppm = -(((-num) * 1_000_000) // den)
    return pd.DataFrame({
        "m_edges": pd.Series([m], dtype="int64"),
        "n_communities": pd.Series([n_comm], dtype="int64"),
        "modularity_ppm": pd.Series([ppm], dtype="int64"),
    })


def ppr_top(sf_dir: str, topic_lang: str = "en", iters: int = 4,
            damping_pct: int = 85, topn: int = 20,
            scale_total: int = 1_000_000_000_000):
    """Personalized PageRank (Haveliwala 2002, topic-sensitive): the
    teleport lands on the TOPIC SET (docs with lang = topic_lang), not
    uniformly -- ranking authority AS SEEN FROM one corpus slice (which
    hubs matter to the English sub-corpus), the recommendation/locality
    primitive the global pagerank_top cannot express. Same integer
    recurrence and fixed-round determinism contract: r0_v = S // nT on
    topic nodes else 0; r'(v) = base_v + (damping * inc(v)) // 100 with
    base_v = ((100 - damping) * (S // nT)) // 100 on topic nodes else 0;
    all quantities non-negative ints so the replay is character-exact.

    Scale shape: pagerank_top's plan with ONE twist -- the per-node
    teleport rides the SAME zero-contribution union rows the uniform
    version already ships (rows (node, c=0, b=base_v); shares carry
    b=0; the one grouped exchange folds Sum(c) AND Max(b) together), so
    personalization costs no extra join, no broadcast, no second
    exchange per round. Returns the topn (doc_id, rank_scaled), rank
    descending, id ascending on ties; an empty topic slice raises."""
    import ray.data as rd

    from ray.data.aggregate import Max, Sum

    from .relational import bucketed_hash_join, derive_buckets

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    n_nodes = docs.count()
    import pyarrow.compute as pc

    def topic_mask(batch: pa.Table) -> pa.Table:
        is_t = pc.equal(batch.column("lang"), topic_lang)
        return pa.table({
            "node": batch.column("doc_id").combine_chunks().cast(pa.int64()),
            "is_t": is_t.combine_chunks().cast(pa.int8())
            if isinstance(is_t, pa.ChunkedArray) else is_t.cast(pa.int8()),
        })

    nodes = docs.map_batches(topic_mask, batch_format="pyarrow").materialize()
    n_topic = int(nodes.sum("is_t") or 0)
    if n_topic == 0:
        raise ValueError(f"empty topic slice lang={topic_lang!r}")
    r0 = scale_total // n_topic
    base_t = ((100 - damping_pct) * r0) // 100

    edges = derived_link_edges(
        docs.select_columns(["doc_id"]), n_nodes).materialize()
    buckets = derive_buckets(edges.count(), rows_per_bucket=1_000_000)

    def init_ranks(batch: pa.Table, _r0=r0) -> pa.Table:
        m = batch.column("is_t").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": batch.column("node"),
                         "rank": pa.array(m * _r0, pa.int64())})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def zero_base(batch: pa.Table, _b=base_t) -> pa.Table:
        m = batch.column("is_t").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "dst": batch.column("node"),
            "c": pa.array(np.zeros(len(m), np.int64)),
            "b": pa.array(m * _b, pa.int64()),
        })

    zeros = nodes.map_batches(zero_base, batch_format="pyarrow").materialize()

    def share(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        return pa.table({"dst": batch.column("dst"),
                         "c": pa.array(r // d, pa.int64()),
                         "b": pa.array(np.zeros(len(d), np.int64))})

    def apply(batch: pa.Table, _d=damping_pct) -> pa.Table:
        iv = batch.column("inc").to_numpy(zero_copy_only=False).astype(np.int64)
        bv = batch.column("base").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": batch.column("dst").combine_chunks().cast(pa.int64()),
            "rank": pa.array(bv + (_d * iv) // 100, pa.int64()),
        })

    for _ in range(iters):
        joined = bucketed_hash_join(
            edges, ranks.rename_columns(["src", "rank"]), "src", "src",
            buckets=buckets)
        ranks = (
            joined.map_batches(share, batch_format="pyarrow")
            .union(zeros)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="inc"), Max("b", alias_name="base"))
            .map_batches(apply, batch_format="pyarrow")
            .materialize()
        )

    def _top(batch: pa.Table, node_col: str, rank_col: str) -> pa.Table:
        r = batch.column(rank_col).to_numpy(zero_copy_only=False)
        node = batch.column(node_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((node, -r))[:topn]
        return pa.table({"doc_id": pa.array(node[order], pa.int64()),
                         "rank_scaled": pa.array(r[order], pa.int64())})

    partials = ranks.map_batches(
        lambda b: _top(b, "node", "rank"), batch_format="pyarrow")
    return partials.repartition(1).map_batches(
        lambda b: _top(b, "doc_id", "rank_scaled"), batch_format="pyarrow",
        batch_size=None)


def bitext_mining_topk(sf_dir: str, src_lang: str = "en",
                       tgt_lang: str = "de", topn: int = 20,
                       quant: int = 1000,
                       broadcast_cap_bytes: int = 256 << 20):
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER parallel-corpus recipe): for every source-language
    vector, its nearest target-language vector by exact integer dot
    product plus the ABSOLUTE margin over the runner-up -- a big margin
    marks a genuine translation pair, a thin one marks a hub point
    that is everyone's neighbor (the failure mode raw top-1 mining
    drowns in). The absolute-margin variant keeps everything integer
    (dot1 - dot2; the ratio variant divides two possibly-negative
    dots).

    Scale shape: lang attaches to vectors through ONE bucketed hash
    join (the source_centroid_geometry convention); the TARGET slice
    broadcasts once as a dense int64 matrix under
    ``broadcast_cap_bytes`` (loud raise past it -- the IVF-bucketed
    mining pass is the documented scale path, same adjudication as the
    ann family's brute-force baseline); each source batch is one
    matmul + vectorized top-2; global top-n by (margin DESC, src id)
    via per-block partials and a tiny merge.

    Returns (src_id, tgt_id, dot_num, margin_num) top-n; a single
    target vector yields margin 0; an empty slice raises."""
    import ray
    import ray.data as rd

    from .relational import bucketed_hash_join, derive_buckets

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    joined = bucketed_hash_join(emb, docs, "vec_id", "doc_id",
                                buckets=derive_buckets(emb.count())
                                ).materialize()

    def _mat(col) -> np.ndarray:
        # the bucketed join round-trips through pandas, which re-enters
        # Arrow as a tensor extension column -- accept list AND tensor
        # layouts (and plain object arrays from a DataFrame column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.Array) and pa.types.is_list(col.type):
            n = len(col)
            d = len(col[0]) if n else 0
            V = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            return np.floor(V * quant + 0.5).astype(np.int64).reshape(n, d)
        arr = col.to_numpy(zero_copy_only=False) if hasattr(col, "to_numpy") \
            else np.asarray(col)
        M = (np.stack([np.asarray(v, np.float64) for v in arr])
             if arr.dtype == object else np.asarray(arr, np.float64))
        return np.floor(M * quant + 0.5).astype(np.int64)

    def keep_lang(lang):
        def _fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = pc.equal(batch.column("lang"), lang)
            return batch.filter(m.combine_chunks()
                                if isinstance(m, pa.ChunkedArray) else m)
        return _fn

    tgt = joined.map_batches(keep_lang(tgt_lang),
                             batch_format="pyarrow").to_pandas()
    if not len(tgt):
        raise ValueError(f"empty target slice lang={tgt_lang!r}")
    tcol = pa.array(list(tgt["embedding"]), pa.list_(pa.float32()))
    T = _mat(tcol)
    tids = tgt["vec_id"].to_numpy(np.int64)
    order = np.argsort(tids)
    T, tids = T[order], tids[order]  # id-ascending: ties pick min id
    if T.nbytes > broadcast_cap_bytes:
        raise ValueError(
            f"target matrix {T.nbytes >> 20} MB exceeds the broadcast cap; "
            "mine through the IVF-bucketed pass at this scale")
    t_handle = ray.put((T, tids))

    class Mine:
        def __init__(self) -> None:
            self.T, self.tids = ray.get(t_handle)

        def __call__(self, batch: pa.Table, _n=topn) -> pa.Table:
            Q = _mat(batch.column("embedding"))
            sids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            if not len(sids):
                return pa.table({"src_id": pa.array([], pa.int64()),
                                 "tgt_id": pa.array([], pa.int64()),
                                 "dot_num": pa.array([], pa.int64()),
                                 "margin_num": pa.array([], pa.int64())})
            D = Q @ self.T.T  # exact int64 dots
            # top-1 with (dot DESC, id ASC): ids ascend, argmax is first max
            best = D.argmax(axis=1)
            dot1 = D[np.arange(len(sids)), best]
            if D.shape[1] > 1:
                D2 = D.copy()
                D2[np.arange(len(sids)), best] = np.iinfo(np.int64).min
                dot2 = D2.max(axis=1)
                margin = dot1 - dot2
            else:
                margin = np.zeros(len(sids), np.int64)
            out = pd.DataFrame({
                "src_id": sids, "tgt_id": self.tids[best],
                "dot_num": dot1, "margin_num": margin,
            }).sort_values(["margin_num", "src_id"],
                           ascending=[False, True]).head(_n)
            return pa.Table.from_pandas(out, preserve_index=False)

    src = joined.map_batches(keep_lang(src_lang), batch_format="pyarrow")
    partials = src.map_batches(Mine, batch_format="pyarrow",
                               concurrency=(1, 8))

    def merge_top(batch: pa.Table, _n=topn) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["margin_num", "src_id"], ascending=[False, True]).head(_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = partials.repartition(1).map_batches(
        merge_top, batch_format="pyarrow", batch_size=None).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def nb_source_classifier(ds, id_col: str = "doc_id", label_col: str = "source",
                         text_col: str = "text", train_mod: int = 10,
                         train_lt: int = 8):
    """Multinomial Naive Bayes domain classifier in WHOLE BITS -- the
    classifier-based quality/domain filter every curation stack runs
    (fastText-style scorer in CCNet/fineweb; here trained on the corpus's
    own ``source`` labels so the op is self-contained). All arithmetic is
    integer so the DuckDB oracle replays it digit-for-digit:

    - split: ``md5_u64(f"{doc_id}:nbsplit") % train_mod < train_lt`` is
      train (default 80%), the rest is scored -- the proven md5-prefix
      split primitive (``deterministic_sample``).
    - token cost under label s: ``bit_length((N_s + V) // (c_ts + 1)) - 1``
      whole bits -- add-one-smoothed multinomial likelihood via the
      ``bit_length(m//n)-1 == floor(log2(m/n))`` identity (same primitive
      as ``doc_surprisal_topk``; hypothesis-pinned vs DuckDB). N_s = train
      tokens in s, V = distinct train tokens, c_ts = count of t in s.
      Unseen test tokens cost ``bit_length(N_s + V) - 1`` (c=0).
    - prior cost: ``bit_length(n_train_docs // n_docs_s) - 1``.
    - predict = argmin(total cost); ties break to the lexicographically
      smallest label. Zero-token test docs are excluded on both sides.

    Plan: pass 1 tokenizes train docs per batch (compiled ``[a-z0-9]+`` on
    lowered text, shared char-for-char with the oracle regexp) and
    pre-aggregates (label, token) counts; ``bucketed_grouped_sum`` on the
    fused key merges them. The model (labels x vocab bit matrix) is a
    deliberate bounded driver collect broadcast via ``ray.put`` -- same
    license as the idf broadcast in ``bm25_topk``; past a vocab cap the
    honest shape is the bucketed token-domain join bm25 documents. Pass 2
    scores each test batch fully vectorized (explode -> searchsorted ->
    per-doc matrix gather-sum + per-label unseen constant) and emits
    per-batch (actual, predicted) partial counts; one tiny bounded final
    merge (labels^2 keys) resolves the confusion matrix.

    Returns (actual, predicted, n_docs) sorted; n_docs int64."""
    import re

    import ray

    from .relational import bucketed_grouped_sum, tiny_final_groupby

    tok_re = re.compile(r"[a-z0-9]+")
    SEP = "\x1f"

    def is_train(ids) -> np.ndarray:
        return np.array(
            [dk.md5_u64(f"{i}:nbsplit".encode()) % train_mod < train_lt
             for i in ids], dtype=bool)

    def train_partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = is_train(batch[id_col].tolist())
        sub = batch.loc[m, [label_col, text_col]]
        toks = sub[text_col].fillna("").str.lower().str.findall(tok_re)
        lab = sub[label_col].astype(str)
        s = toks.explode().dropna()
        if len(s) == 0:
            return pd.DataFrame({"key": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        key = lab.loc[s.index].to_numpy(object) + SEP + s.to_numpy(object)
        vc = pd.Series(key).value_counts()
        # one extra row per train DOC carries the prior count out of the
        # same pass: key = label + SEP (empty token is impossible: the
        # tokenizer never yields '')
        pr = lab.value_counts()
        return pd.DataFrame({
            "key": np.concatenate([vc.index.to_numpy(object),
                                   (pr.index + SEP).to_numpy(object)]),
            "n": np.concatenate([vc.to_numpy(np.int64), pr.to_numpy(np.int64)]),
        })

    counts = bucketed_grouped_sum(
        ds.map_batches(train_partial, batch_format="pandas"), "key", "n"
    ).to_pandas()
    if len(counts) == 0:
        return pd.DataFrame({"actual": pd.Series([], dtype=str),
                             "predicted": pd.Series([], dtype=str),
                             "n_docs": pd.Series([], dtype=np.int64)})
    split = counts["key"].str.split(SEP, n=1, expand=True)
    counts["label"], counts["token"] = split[0], split[1]
    prior = counts[counts["token"] == ""]
    tokc = counts[counts["token"] != ""]
    labels = np.sort(tokc["label"].unique())  # candidates = labels with >=1 train token
    vocab = np.sort(tokc["token"].unique())
    V = len(vocab)
    if V == 0 or len(labels) == 0:
        return pd.DataFrame({"actual": pd.Series([], dtype=str),
                             "predicted": pd.Series([], dtype=str),
                             "n_docs": pd.Series([], dtype=np.int64)})
    n_train_docs = int(prior["n"].sum())
    nd_by_label = prior.set_index("label")["n"]
    # bits[v, l] = cost of vocab token v under label l; unseen[l] = c=0 cost
    C = np.zeros((V, len(labels)), dtype=np.int64)
    li = {l: j for j, l in enumerate(labels)}
    vi = np.searchsorted(vocab, tokc["token"].to_numpy(object))
    C[vi, [li[l] for l in tokc["label"]]] = tokc["n"].to_numpy(np.int64)
    N_s = C.sum(axis=0)
    bits = np.empty_like(C)
    unseen = np.empty(len(labels), dtype=np.int64)
    pbits = np.empty(len(labels), dtype=np.int64)
    for j in range(len(labels)):
        tot = int(N_s[j]) + V
        bits[:, j] = [(tot // (int(c) + 1)).bit_length() - 1 for c in C[:, j]]
        unseen[j] = tot.bit_length() - 1
        pbits[j] = (n_train_docs // int(nd_by_label[labels[j]])).bit_length() - 1
    handle = ray.put({"vocab": vocab, "bits": bits, "unseen": unseen,
                      "pbits": pbits, "labels": labels})

    class Score:
        def __init__(self) -> None:
            self.m = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = self.m
            test = batch.loc[~is_train(batch[id_col].tolist()),
                             [label_col, text_col]]
            toks = test[text_col].fillna("").str.lower().str.findall(tok_re)
            s = toks.explode().dropna()
            schema = pa.schema([("actual", pa.string()),
                                ("predicted", pa.string()),
                                ("n_docs", pa.int64())])
            if len(s) == 0:
                return schema.empty_table()
            pos = np.searchsorted(m["vocab"], s.to_numpy(object))
            pos_c = np.clip(pos, 0, len(m["vocab"]) - 1)
            seen = m["vocab"][pos_c] == s.to_numpy(object)
            # per-token cost rows: seen -> model row; unseen -> unseen const
            cost = np.where(seen[:, None], m["bits"][pos_c], m["unseen"][None, :])
            df = pd.DataFrame(cost, index=s.index)
            per_doc = df.groupby(level=0).sum()  # rows = docs with >=1 token
            score = per_doc.to_numpy(np.int64) + m["pbits"][None, :]
            pred = m["labels"][np.argmin(score, axis=1)]  # labels sorted: argmin = smallest on tie
            out = pd.DataFrame({
                "actual": test.loc[per_doc.index, label_col].astype(str).to_numpy(object),
                "predicted": pred,
            })
            g = out.value_counts().reset_index(name="n_docs")
            return pa.table({"actual": pa.array(g["actual"], pa.string()),
                             "predicted": pa.array(g["predicted"], pa.string()),
                             "n_docs": pa.array(g["n_docs"].astype(np.int64))})

    partials = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))
    out = tiny_final_groupby(partials, ["actual", "predicted"],
                             [("n_docs", "sum")],
                             ["actual", "predicted", "n_docs"]).to_pandas()
    return out.sort_values(["actual", "predicted"]).reset_index(drop=True)


def ccnet_bucket_counts(ds, id_col: str = "doc_id", lang_col: str = "lang",
                        text_col: str = "text"):
    """CCNet-style head/middle/tail bucketing per language: score every
    document by mean whole-bit unigram surprisal (``doc_surprisal_topk``'s
    exact integer kernel -- ``mean_millibits = total_bits * 1000 //
    n_tokens`` with per-token ``bit_length(N // c) - 1`` bits against the
    corpus's own unigram LM), then split each language at its exact
    tertile order statistics: ``t1`` = k1-th smallest score (k1 =
    ceil(n/3)), ``t2`` = k2-th (k2 = ceil(2n/3)); head = score <= t1
    (least surprising = most in-distribution), middle = (t1, t2], tail =
    > t2. This is the CCNet data split (Wenzek et al. 2020) with the
    corpus unigram model standing in for the external KenLM; zero-token
    docs are excluded (no tokens, no perplexity).

    Plan: pass 1 builds global token counts (per-batch value_counts ->
    ``bucketed_grouped_sum``); the (token, bits) table broadcasts sorted
    via ``ray.put`` (same bounded license as ``doc_surprisal_topk``).
    Pass 2 scores each batch vectorized and pre-aggregates a (lang,
    score) HISTOGRAM -- the score domain is bounded (millibits of a
    <=~30-bit-per-token code), so tertile thresholds AND bucket counts
    both resolve from the merged histogram on the driver without a
    second corpus pass or any per-doc shuffle.

    Returns (lang, bucket, n_docs) sorted, bucket in head/middle/tail."""
    import re

    import ray

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")
    SEP = "\x1f"

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(vocab_partial, batch_format="pandas"), "token", "n"
    ).to_pandas()
    empty = pd.DataFrame({"lang": pd.Series([], dtype=str),
                          "bucket": pd.Series([], dtype=str),
                          "n_docs": pd.Series([], dtype=np.int64)})
    if len(counts) == 0:
        return empty
    counts = counts.sort_values("token").reset_index(drop=True)
    n_total = int(counts["n"].sum())
    bits = np.array([(n_total // int(c)).bit_length() - 1
                     for c in counts["n"]], dtype=np.int64)
    handle = ray.put({"tokens": counts["token"].to_numpy(object), "bits": bits})

    class Hist:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
            s = toks.explode().dropna()
            if len(s) == 0:
                return pd.DataFrame({"key": pd.Series([], dtype=str),
                                     "n": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(self.lk["tokens"], s.to_numpy(object))
            tb = pd.Series(self.lk["bits"][pos], index=s.index)
            per_doc = tb.groupby(level=0).agg(["size", "sum"])
            score = (per_doc["sum"].to_numpy(np.int64) * 1000) // \
                per_doc["size"].to_numpy(np.int64)
            key = batch[lang_col].reindex(per_doc.index).astype(str).to_numpy(object) \
                + SEP + score.astype(str).astype(object)
            vc = pd.Series(key).value_counts()
            return pd.DataFrame({"key": vc.index.to_numpy(object),
                                 "n": vc.to_numpy(np.int64)})

    hist = bucketed_grouped_sum(
        ds.map_batches(Hist, batch_format="pandas", concurrency=(1, 8)), "key", "n"
    ).to_pandas()
    if len(hist) == 0:
        return empty
    split = hist["key"].str.split(SEP, n=1, expand=True)
    hist["lang"] = split[0]
    hist["score"] = split[1].astype(np.int64)
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("score")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy(np.int64)
        sc = g["score"].to_numpy(np.int64)
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
        t1 = int(sc[np.searchsorted(cum, k1)])
        t2 = int(sc[np.searchsorted(cum, k2)])
        head = int(g.loc[g["score"] <= t1, "n"].sum())
        middle = int(g.loc[(g["score"] > t1) & (g["score"] <= t2), "n"].sum())
        tail = n - head - middle
        rows += [(lang, "head", head), (lang, "middle", middle),
                 (lang, "tail", tail)]
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n_docs"])
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


def soft_dedup_weights(ds, id_col: str = "doc_id", text_col: str = "text",
                       buckets: int | None = None):
    """Soft deduplication: instead of DROPPING duplicates, every document
    gets a training weight ``weight_ppm = 10^6 // cluster_size`` so each
    distinct content contributes ~one document's worth of gradient however
    many copies exist (the count-based variant of SoftDeDup reweighting;
    the hard-dedup families stay for when dropping is the policy). Sum of
    weights over a cluster <= 10^6, equality when size divides 10^6 --
    floor-div keeps it integer-exact and SQL-replayable.

    Plan: per-batch sha256 content hash (the exact_dedup convention; text
    itself never shuffles), int32 bucket from the hash's leading 8 hex
    digits so the ONE exchange is int-keyed (the measured-faster shape vs
    string-keyed groupby, see ``bucketed_grouped_sum``), then a per-bucket
    vectorized transform('size') emits (doc_id, cluster_size, weight_ppm).
    Fan-out is size-derived (``derive_buckets``); per-bucket memory is
    rows/B * ~80 bytes regardless of corpus size.

    Returns one row per input doc: (doc_id, cluster_size, weight_ppm)."""
    from .relational import derive_buckets

    B = int(buckets or derive_buckets(ds.count()))

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = dk.sha256_hex(batch.column(text_col).to_pylist())
        bucket = np.array([int(h[:8], 16) % B for h in hashes], dtype=np.int32)
        return pa.table({
            id_col: batch.column(id_col),
            "text_hash": pa.array(hashes),
            "bucket": pa.array(bucket),
        })

    def weigh(group: pd.DataFrame) -> pd.DataFrame:
        n = group.groupby("text_hash")["text_hash"].transform("size").to_numpy(np.int64)
        return pd.DataFrame({
            id_col: group[id_col].to_numpy(np.int64),
            "cluster_size": n,
            "weight_ppm": 1_000_000 // n,
        })

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(weigh, batch_format="pandas")
    )


def binary_hamming_topk(ds, queries: "np.ndarray", k: int = 10,
                        quant: int = 1000, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Binary (1-bit) quantization recall audit -- the third rung of the
    vector-compression ladder beside ``pq_recall_audit`` (8x) and
    ``matryoshka_recall_audit`` (truncation): each embedding collapses to
    its 64 SIGN BITS (bit i set iff x_i > 0 on the raw floats), candidates
    rank by Hamming distance to the query's sign pattern, and recall@k is
    measured against the exact ranking (integer squared L2 on milli-quantized
    vectors -- the pq convention; inputs are unit-norm so L2 order IS
    cosine order). Ties break to the smaller vec_id in both rankings.

    One streaming pass: the query block (sign pattern + milli vector)
    broadcasts via ``ray.put``; each batch computes all-query Hamming
    counts and exact integer L2 fully vectorized and emits only per-batch
    top-k partials for BOTH rankings; the driver-side final merges
    ``2 * k * |queries| * n_blocks`` bounded rows. No shuffle touches the
    vector domain.

    Returns (query_id, n_overlap, recall_ppm) ordered by query_id."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    qb = q > 0  # (nq, d) sign pattern
    qm = np.floor(q * quant + 0.5).astype(np.int64)
    handle = ray.put((qb, qm))

    def _mat(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(col)
        d = len(col[0]) if n else 0
        return col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(n, d)

    class Partial:
        def __init__(self) -> None:
            self.qb, self.qm = ray.get(handle)

        def __call__(self, batch: pa.Table, _k=k) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(ids):
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64()),
                                 "which": pa.array([], pa.string())})
            E = _mat(batch.column(emb_col))
            B = E > 0
            M = np.floor(E * quant + 0.5).astype(np.int64)
            frames = []
            for j in range(len(self.qb)):
                ham = (B != self.qb[j][None, :]).sum(axis=1).astype(np.int64)
                diff = M - self.qm[j][None, :]
                l2 = (diff * diff).sum(axis=1)
                for which, dist in (("bin", ham), ("exact", l2)):
                    order = np.lexsort((ids, dist))[:_k]
                    frames.append(pd.DataFrame({
                        "query_id": np.full(len(order), j, np.int64),
                        "vec_id": ids[order], "dist": dist[order],
                        "which": which}))
            return pa.Table.from_pandas(pd.concat(frames), preserve_index=False)

    def final(batch: pa.Table, _k=k) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for qid, g in df.groupby("query_id"):
            tops = {}
            for which, gg in g.groupby("which"):
                gg = gg.sort_values(["dist", "vec_id"]).head(_k)
                tops[which] = set(gg["vec_id"])
            n_overlap = len(tops.get("bin", set()) & tops.get("exact", set()))
            rows.append((int(qid), n_overlap, n_overlap * 1_000_000 // _k))
        out = pd.DataFrame(rows, columns=["query_id", "n_overlap", "recall_ppm"])
        return pa.Table.from_pandas(
            out.sort_values("query_id").astype(np.int64), preserve_index=False)

    return (
        ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def filter_impact_audit(ds, lang_col: str = "lang", text_col: str = "text",
                        threshold_ppm: int = 400_000,
                        four_fifths_ppm: int = 800_000):
    """Disparate-impact audit of the quality gate: when the training-
    corpus filter (``quality_ppm >= threshold``, the composed-pipeline
    gate) drops documents, does it drop some LANGUAGES much harder than
    others? Reports per-lang pass rates and each lang's impact ratio
    against the best-passing lang, flagged by the four-fifths rule
    (ratio < 80% = the filter disproportionately excludes that slice --
    the curation-governance check a multilingual corpus runs before
    shipping a filtered mix).

    Integer-exact: pass_rate_ppm = n_pass * 10^6 // n_docs;
    impact_ratio_ppm = rate * 10^6 // max_rate (1e6 with flag 0 when
    every lang fails everything -- no disparity in uniform rejection).

    Map-side quality scoring (``textstats.quality_features``, the
    SQL-pinned kernel) -> per-lang (n_docs, n_pass) partials -> tiny
    bounded final -> driver ratio arithmetic on a handful of rows.

    Returns (lang, n_docs, n_pass, pass_rate_ppm, impact_ratio_ppm,
    flag_disparate) sorted by lang."""
    from .relational import tiny_final_groupby

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qp = ts.quality_features(batch[text_col])["quality_ppm"].to_numpy(np.int64)
        g = pd.DataFrame({lang_col: batch[lang_col],
                          "n_docs": np.ones(len(qp), np.int64),
                          "n_pass": (qp >= threshold_ppm).astype(np.int64)})
        return g.groupby(lang_col, as_index=False).sum()

    agg = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        [lang_col], [("n_docs", "sum"), ("n_pass", "sum")],
        [lang_col, "n_docs", "n_pass"],
    ).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64 if c != lang_col else str)
                             for c in (lang_col, "n_docs", "n_pass", "pass_rate_ppm",
                                       "impact_ratio_ppm", "flag_disparate")})
    agg["pass_rate_ppm"] = (agg["n_pass"] * 1_000_000) // agg["n_docs"]
    mr = int(agg["pass_rate_ppm"].max())
    if mr == 0:
        agg["impact_ratio_ppm"] = np.int64(1_000_000)
        agg["flag_disparate"] = np.int64(0)
    else:
        agg["impact_ratio_ppm"] = (agg["pass_rate_ppm"] * 1_000_000) // mr
        agg["flag_disparate"] = (agg["impact_ratio_ppm"] < four_fifths_ppm).astype(np.int64)
    for c in ("n_docs", "n_pass", "pass_rate_ppm", "impact_ratio_ppm", "flag_disparate"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values(lang_col).reset_index(drop=True)


def texttiling_boundaries(ds, id_col: str = "doc_id", text_col: str = "text",
                          block_tokens: int = 20,
                          boundary_cos2_ppm: int = 250_000):
    """TextTiling topic-shift audit (Hearst 1997, integerized): split each
    document into consecutive ``block_tokens``-token blocks, score every
    adjacent-block gap by SQUARED cosine over token counts in exact ppm
    (``dot^2 * 10^6 // (|a|^2 * |b|^2)`` -- squaring removes the sqrt, so
    no float exists on either side), and call a gap a topic boundary when
    its score falls below ``boundary_cos2_ppm``. Docs whose text drifts
    topic-to-topic segment high; single-topic docs score near 10^6
    everywhere. The per-doc boundary count is the long-document splitting
    signal a chunking stage (``chunk_documents``) can consume.

    Purely map-side -- per batch: explode tokens with positions (pandas
    cumcount), fold (doc, block, token) counts, self-merge block b with
    b+1 on (doc, token) for the dot products, compose norms -- all
    C-level frames, no Python per-row loop, NO shuffle at any width.
    Zero-token docs are excluded; a one-block doc reports 0 gaps, 0
    boundaries and min_cos2_ppm = 10^6 (nothing to split).

    Returns (doc_id, n_blocks, n_gaps, n_boundaries, min_cos2_ppm)."""
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re)
        ids = batch[id_col].to_numpy(np.int64)
        s = toks.explode().dropna()
        schema = pa.schema([(id_col, pa.int64()), ("n_blocks", pa.int64()),
                            ("n_gaps", pa.int64()), ("n_boundaries", pa.int64()),
                            ("min_cos2_ppm", pa.int64())])
        if len(s) == 0:
            return schema.empty_table()
        f = pd.DataFrame({"row": s.index, "token": s.to_numpy(object)})
        f["pos"] = f.groupby("row").cumcount()
        f["block"] = f["pos"] // block_tokens
        cnt = (f.groupby(["row", "block", "token"], sort=False)
               .size().rename("c").reset_index())
        norms = (cnt.assign(c2=cnt["c"] * cnt["c"])
                 .groupby(["row", "block"], sort=False)["c2"].sum()
                 .rename("norm").reset_index())
        nb = norms.groupby("row", sort=False)["block"].max().add(1).rename("n_blocks")
        # dot of block b with b+1: shift the block id and inner-merge
        nxt = cnt.assign(block=cnt["block"] - 1)
        dots = cnt.merge(nxt, on=["row", "block", "token"], suffixes=("_a", "_b"))
        gap_dot = (dots.assign(d=dots["c_a"] * dots["c_b"])
                   .groupby(["row", "block"], sort=False)["d"].sum()
                   .rename("dot").reset_index())
        # every adjacent pair is a gap, even with zero shared tokens
        gaps = norms[norms["block"] < norms.merge(
            nb, left_on="row", right_index=True)["n_blocks"] - 1][["row", "block"]]
        gaps = gaps.merge(norms, on=["row", "block"]).rename(columns={"norm": "na"})
        nxt_norm = norms.assign(block=norms["block"] - 1).rename(columns={"norm": "nb_"})
        gaps = gaps.merge(nxt_norm, on=["row", "block"])
        gaps = gaps.merge(gap_dot, on=["row", "block"], how="left")
        dot = gaps["dot"].fillna(0).to_numpy(np.int64)
        cos2 = (dot * dot * 1_000_000) // (
            gaps["na"].to_numpy(np.int64) * gaps["nb_"].to_numpy(np.int64))
        gaps = gaps.assign(cos2=cos2)
        per = gaps.groupby("row", sort=False)["cos2"].agg(
            n_gaps="size", min_cos2="min",
            n_boundaries=lambda v: int((v < boundary_cos2_ppm).sum()))
        out = nb.to_frame().join(per, how="left")
        out["n_gaps"] = out["n_gaps"].fillna(0).astype(np.int64)
        out["n_boundaries"] = out["n_boundaries"].fillna(0).astype(np.int64)
        out["min_cos2"] = out["min_cos2"].fillna(1_000_000).astype(np.int64)
        out = out.reset_index()
        return pa.table({
            id_col: pa.array(ids[out["row"].to_numpy()], pa.int64()),
            "n_blocks": pa.array(out["n_blocks"].to_numpy(np.int64)),
            "n_gaps": pa.array(out["n_gaps"].to_numpy(np.int64)),
            "n_boundaries": pa.array(out["n_boundaries"].to_numpy(np.int64)),
            "min_cos2_ppm": pa.array(out["min_cos2"].to_numpy(np.int64)),
        })

    return ds.map_batches(score, batch_format="pandas")


def anf_effective_diameter(ds, id_col: str = "doc_id", max_h: int = 6,
                           p: int = 6, buckets: int | None = None,
                           force_distributed: bool = False):
    """Approximate Neighbourhood Function / effective diameter of the
    md5-derived citation graph (Palmer et al. ANF, Boldi et al. HyperANF):
    every node carries a tiny HLL sketch (m = 2^p registers) of its
    OUT-reachable ball; each round every node folds its successors'
    sketches into its own (register-wise max -- HLL union is exact), so
    after h rounds sketch_v estimates |ball(v, h)|. N(h) = sum of the
    per-node estimates is the neighbourhood function; the effective
    diameter is the first h where N(h) >= 90% of N(max_h). The classic
    trick: all-pairs distances in O(h) linear passes carrying n * m
    bytes of state -- never a per-pair row.

    Determinism contract: fixed ``max_h`` rounds (the iterative-family
    convention); the per-node estimator is the exact HyperLogLog float
    ladder the approx_distinct family pinned against DuckDB (alpha
    bias term, exact HUGEINT register sum, linear-counting branch,
    FLOOR(x+0.5)). The oracle derives the SAME registers from first
    principles -- exact min-hop reachability + grouped HLL -- so the
    propagation itself is what the equality proves.

    Scale shape: sketch state is (v, idx, rank) rows, <= n * m and
    typically far fewer (a ball smaller than m fills few registers);
    per round ONE bucketed hash join ships successor registers and ONE
    bucketed grouped max folds them. Per-round estimates are a
    per-node grouped computation folded inside the same buckets; only
    (round, partial sum) scalars reach the driver.

    Returns (h, pairs_est, frac_ppm, is_effective_diameter), h=0..max_h."""
    import ray.data as rd

    from ..functions.dedup import md5_u64
    from .relational import bucketed_hash_join, derive_buckets

    n_nodes = ds.count()
    if n_nodes == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("h", "pairs_est", "frac_ppm",
                                       "is_effective_diameter")})
    B = int(buckets or derive_buckets(n_nodes * (1 << p), rows_per_bucket=2_000_000))
    m = 1 << p
    # materialize once: the per-round join would otherwise re-derive the
    # edge list from the id column every iteration
    edges = derived_link_edges(ds, n_nodes, id_col=id_col).drop_columns(
        ["deg"]).materialize()

    def init_sketch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.empty(len(ids), np.int64)
        rank = np.empty(len(ids), np.int64)
        for i, u in enumerate(ids):
            h = md5_u64(str(int(u)).encode())
            idx[i] = h >> (64 - p)
            rest = ((h << p) | ((1 << p) - 1)) & ((1 << 64) - 1)
            rank[i] = 64 - rest.bit_length() + 1
        return pa.table({"v": pa.array(ids), "idx": pa.array(idx),
                         "rank": pa.array(rank)})

    def grouped_max(sk):
        def add_bucket(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array((v % B).astype(np.int32)))

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            out = (g.groupby(["v", "idx"], as_index=False)["rank"].max())
            return out.astype({"v": np.int64, "idx": np.int64, "rank": np.int64})

        return (sk.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(fold, batch_format="pandas"))

    def estimate_sum(sk) -> int:
        """Sum of per-node rounded HLL estimates (exact integer register
        sums, the pinned float ladder). NO shuffle: ``sk`` comes out of
        ``grouped_max``, whose map_groups blocks hold complete per-node
        register sets, so a batch_size=None map over those blocks sees
        every node whole and only per-block partial sums reach the
        driver."""
        alpha = 0.7213 / (1 + 1.079 / m)

        def est_fold(g: pd.DataFrame) -> pd.DataFrame:
            # exact integer numerators: object-dtype Python ints survive
            # the 2^64 terms that uint64 cannot
            val = pd.Series([1 << (64 - int(r)) for r in g["rank"]],
                            index=g.index, dtype=object)
            gg = pd.DataFrame({"v": g["v"], "val": val})
            per = gg.groupby("v")["val"].agg(["sum", "count"])
            total = 0
            for num, cnt in zip(per["sum"], per["count"]):
                zeros = m - int(cnt)
                numerator = int(num) + (zeros << 64)
                est = alpha * m * m * 18446744073709551616.0 / float(numerator)
                if est <= 2.5 * m and zeros > 0:
                    est = m * np.log(m / zeros)
                total += int(np.floor(est + 0.5))
            return pd.DataFrame({"part": pd.Series([total], dtype=np.int64)})

        parts = sk.map_batches(est_fold, batch_format="pandas",
                               batch_size=None).to_pandas()
        return int(parts["part"].sum())

    # ---- capped driver fast path (the dedup_clusters pattern): the
    # sketch matrix is n * m BYTES -- tiny relative to the graph -- so
    # under the cap the whole register state lives in one numpy array on
    # the driver and each round is ONE vectorized maximum-scatter over
    # the collected edge list: zero shuffles, zero barriers. Past the
    # cap (> ~4M nodes at m=64) the bucketed distributed path below
    # runs -- same registers, same estimates.
    if n_nodes * m <= (256 << 20) and not force_distributed:
        E = edges.to_pandas()  # bounded by the same cap license
        esrc = E["src"].to_numpy(np.int64)
        edst = E["dst"].to_numpy(np.int64)
        ids = np.sort(
            ds.select_columns([id_col]).to_pandas()[id_col].to_numpy(np.int64))
        R = np.zeros((n_nodes, m), dtype=np.uint8)
        for u in ids:
            h = md5_u64(str(int(u)).encode())
            rest = ((h << p) | ((1 << p) - 1)) & ((1 << 64) - 1)
            r = 64 - rest.bit_length() + 1
            i = h >> (64 - p)
            R[u, i] = max(R[u, i], r)

        alpha = 0.7213 / (1 + 1.079 / m)

        def est_total(R: np.ndarray) -> int:
            total = 0
            for row in R:
                zeros = int(np.count_nonzero(row == 0))
                num = (zeros << 64) + sum(
                    1 << (64 - int(r)) for r in row[row > 0])
                est = alpha * m * m * 18446744073709551616.0 / float(num)
                if est <= 2.5 * m and zeros > 0:
                    est = m * np.log(m / zeros)
                total += int(np.floor(est + 0.5))
            return total

        sums = [est_total(R)]
        for _ in range(max_h):
            R2 = R.copy()
            np.maximum.at(R2, esrc, R[edst])
            R = R2
            sums.append(est_total(R))
        final = sums[-1] or 1
        frac = [s * 1_000_000 // final for s in sums]
        d90 = next((h for h, f in enumerate(frac) if f >= 900_000), max_h)
        return pd.DataFrame({
            "h": pd.Series(range(max_h + 1), dtype=np.int64),
            "pairs_est": pd.Series(sums, dtype=np.int64),
            "frac_ppm": pd.Series(frac, dtype=np.int64),
            "is_effective_diameter": pd.Series(
                [1 if h == d90 else 0 for h in range(max_h + 1)],
                dtype=np.int64),
        })

    sk = grouped_max(ds.map_batches(init_sketch, batch_format="pyarrow")).materialize()
    sums = [estimate_sum(sk)]
    for _ in range(max_h):
        msgs = bucketed_hash_join(edges, sk, "dst", "v", buckets=B)

        def project(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": batch["src"].to_numpy(np.int64),
                                 "idx": batch["idx"].to_numpy(np.int64),
                                 "rank": batch["rank"].to_numpy(np.int64)})

        moved = msgs.map_batches(project, batch_format="pandas")
        sk = grouped_max(moved.union(sk)).materialize()
        sums.append(estimate_sum(sk))
    final = sums[-1] or 1
    frac = [s * 1_000_000 // final for s in sums]
    d90 = next((h for h, f in enumerate(frac) if f >= 900_000), max_h)
    return pd.DataFrame({
        "h": pd.Series(range(max_h + 1), dtype=np.int64),
        "pairs_est": pd.Series(sums, dtype=np.int64),
        "frac_ppm": pd.Series(frac, dtype=np.int64),
        "is_effective_diameter": pd.Series(
            [1 if h == d90 else 0 for h in range(max_h + 1)], dtype=np.int64),
    })


def quality_neardup_auc(ds, pairs=None, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        ground_truth: str = "minhash"):
    """Exact ROC-AUC of the cheap quality score as a NEAR-DUPLICATE
    predictor: does low ``quality_ppm`` flag the documents the near-dup
    pair family will catch? The threshold-free companion of
    ``quality_dup_calibration`` -- one number that says whether the
    cheap gate can pre-screen for the costly one. Positives = members of
    at least one near-dup pair. ``ground_truth`` picks the pair family:
    ``"minhash"`` (default -- ``minhash_lsh_pairs`` est >= ``threshold``,
    the family that scales sub-linearly; VERDICT r4 #1) or ``"ngram"``
    (``ngram_jaccard_pairs`` exact word-3-gram Jaccard -- an opt-in audit
    that inherits that generator's corpus-size guard raise). An explicit
    ``pairs`` table overrides both.

    AUC is the exact Mann-Whitney statistic with the tie convention,
    computed from the score HISTOGRAM (scores are bounded ppm ints, so
    no global sort): 2U = sum_s n_pos(s) * (2 * cum_neg_below(s) +
    n_neg(s)); auc_ppm = 2U * 10^6 // (2 * P * N); a single-class
    corpus pins to 500000 (uninformative) on both sides.

    Plan: the pair table is pair-bounded -- its distinct ids collect
    (size-asserted via ``collect_bounded``) and broadcast via ``ray.put``
    (same license as the near-dup keepers' anti-join set); ONE text pass
    scores each batch and folds (score, label) partials;
    ``bucketed_grouped_sum`` on the fused int key ``score * 2 + label``
    merges them; the bounded histogram drives the exact cumulative
    arithmetic on the driver.

    Returns one row: (n_pos, n_neg, auc_ppm)."""
    import ray

    from .relational import bucketed_grouped_sum, collect_bounded

    if pairs is None:
        if ground_truth == "minhash":
            pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                                      threshold=threshold)
        elif ground_truth == "ngram":
            pairs = ngram_jaccard_pairs(ds, id_col=id_col, text_col=text_col,
                                        threshold=threshold)
        else:
            raise ValueError(
                f"unknown ground_truth {ground_truth!r}: 'minhash' | 'ngram'")
    pdf = collect_bounded(
        pairs, what="quality_neardup_auc pair set",
        alternative="pair_set_audit (distributed per-combo compare)")
    pos = set()
    if len(pdf):
        pos.update(int(v) for v in pdf["doc_a"])
        pos.update(int(v) for v in pdf["doc_b"])
    handle = ray.put(np.array(sorted(pos), dtype=np.int64))

    class HistPartial:
        def __init__(self) -> None:
            self.pos = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            qp = ts.quality_features(batch[text_col])["quality_ppm"].to_numpy(np.int64)
            ids = batch[id_col].to_numpy(np.int64)
            lab = np.isin(ids, self.pos).astype(np.int64)
            key = qp * 2 + lab
            vc = pd.Series(key).value_counts()
            return pd.DataFrame({"key": vc.index.to_numpy(np.int64),
                                 "n": vc.to_numpy(np.int64)})

    hist = bucketed_grouped_sum(
        ds.map_batches(HistPartial, batch_format="pandas", concurrency=(1, 8)),
        "key", "n",
    ).to_pandas()
    if len(hist) == 0:
        return pd.DataFrame({"n_pos": pd.Series([0], dtype=np.int64),
                             "n_neg": pd.Series([0], dtype=np.int64),
                             "auc_ppm": pd.Series([500_000], dtype=np.int64)})
    hist["s"] = hist["key"] // 2
    hist["pos"] = hist["key"] % 2
    piv = hist.pivot_table(index="s", columns="pos", values="n",
                           aggfunc="sum", fill_value=0).sort_index()
    np_col = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    nn_col = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    tp, tn = int(np_col.sum()), int(nn_col.sum())
    cumlt = np.concatenate([[0], np.cumsum(nn_col)[:-1]])
    u2 = int(np.sum(np_col * (2 * cumlt + nn_col)))
    auc = 500_000 if tp == 0 or tn == 0 else u2 * 1_000_000 // (2 * tp * tn)
    return pd.DataFrame({"n_pos": pd.Series([tp], dtype=np.int64),
                         "n_neg": pd.Series([tn], dtype=np.int64),
                         "auc_ppm": pd.Series([auc], dtype=np.int64)})


def bm25_prf_topk(ds, queries: list[str], k: int = 10, fb_docs: int = 3,
                  fb_terms: int = 3, k1: float = 1.2, b: float = 0.75,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Pseudo-relevance feedback retrieval (Rocchio-lite two-stage BM25):
    round 1 retrieves each query's top ``fb_docs`` documents; the
    ``fb_terms`` strongest NEW terms of those feedback docs -- weight =
    occurrences-in-feedback x whole-bit idf ``bit_length(N // df) - 1``
    (the pinned integer-log primitive), ties to the lexicographically
    smaller term -- expand the query; round 2 re-runs BM25 with the
    expanded term set. The classic recall lever when queries undershoot
    corpus vocabulary (Rocchio 1971 / Robertson-Walker PRF), expressed
    as two ``bm25_topk`` invocations plus one bounded candidate pass.

    Scale shape: four corpus text passes total (round-1 BM25, the
    feedback-doc fetch, candidate-term df, round-2 BM25) -- PRF is
    inherently multi-pass; every intermediate besides the passes is
    pair-bounded (fb_docs x |queries| texts on the driver, candidate
    vocab df partials per block). Term selection is integer-exact so
    the DuckDB oracle replays both rounds and the expansion rule.

    Returns (query_id, doc_id, score_ppm) top-k per query, round-2
    scores, (score DESC, doc_id ASC) ties."""
    import re

    word = re.compile(r"[a-z0-9]+")
    r1 = bm25_topk(ds, queries, k=fb_docs, k1=k1, b=b,
                   id_col=id_col, text_col=text_col).to_pandas()
    fb_ids = sorted({int(v) for v in r1[id_col]}) if len(r1) else []
    if not fb_ids:
        return bm25_topk(ds, queries, k=k, k1=k1, b=b,
                         id_col=id_col, text_col=text_col)

    fb_set = set(fb_ids)

    def fetch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column(id_col),
                        value_set=pa.array(fb_ids, pa.int64()))
        return batch.filter(mask).select([id_col, text_col])

    fb = ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    fb_text = dict(zip(fb[id_col].astype(np.int64), fb[text_col]))

    # per-query candidate counts over that query's feedback docs,
    # excluding the query's own terms
    orig_terms = [set(word.findall(q.lower())) for q in queries]
    from collections import Counter
    cand: list[Counter] = [Counter() for _ in queries]
    for _, row in r1.iterrows():
        qi = int(row["query_id"])
        toks = word.findall(str(fb_text[int(row[id_col])]).lower())
        cand[qi].update(t for t in toks if t not in orig_terms[qi])
    all_cand = sorted({t for c in cand for t in c})
    if not all_cand:
        return bm25_topk(ds, queries, k=k, k1=k1, b=b,
                         id_col=id_col, text_col=text_col)

    # one pass: corpus df for the candidate terms + doc count. ONE
    # O(tokens) intersection pass per doc instead of an O(n_cand) stack of
    # Series.map membership scans (the per-row site VERDICT r4 flagged;
    # measured 1.4-1.7x at 31-1000 candidates, BASELINE.md r5)
    cand_set = frozenset(all_cand)

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        toks = batch[text_col].fillna("").str.lower().str.findall(word)
        c: Counter = Counter()
        for s in toks:
            c.update(cand_set.intersection(s))
        rows = {"__n__": len(batch)}
        for t in all_cand:
            rows[t] = int(c.get(t, 0))
        return pd.DataFrame([rows])

    agg = ds.map_batches(df_partial, batch_format="pandas").to_pandas().sum()
    n_docs = int(agg["__n__"])
    expansions: list[list[str]] = []
    for qi in range(len(queries)):
        wgt = sorted(
            ((-c * ((n_docs // int(agg[t])).bit_length() - 1), t)
             for t, c in cand[qi].items()),
        )[:fb_terms]
        expansions.append([t for _, t in wgt])
    expanded = [q + " " + " ".join(e) if e else q
                for q, e in zip(queries, expansions)]
    return bm25_topk(ds, expanded, k=k, k1=k1, b=b,
                     id_col=id_col, text_col=text_col)


def cluster_balanced_sample(ds, k: int = 8, iters: int = 3,
                            per_cluster: int = 8, id_col: str = "vec_id",
                            emb_col: str = "embedding", scale: int = 1000):
    """Cluster-balanced (diversity) sampling: fit the shared integer
    Lloyd k-means, then draw a deterministic md5-roll quota from EVERY
    cluster -- the curation recipe that keeps a small sample covering
    embedding space instead of mirroring its density (the
    cluster-then-sample step of SemDeDup-era diversity selection; the
    opposite lever of density-proportional ``stratified_sample``).
    Selection inside a cluster is the sampling family's md5-prefix roll
    ``md5_u64(f"cbs:{id}")`` with (roll, id) ties -- hash-random but
    exactly SQL-replayable.

    Plan: the quantized projection and Lloyd fit are the existing
    kmeans machinery (map + tiny reduce per round, no shuffle); one
    final pass assigns each batch and keeps a per-batch top-quota per
    cluster; the bounded ``k x quota x n_blocks`` partial merges in one
    tiny task. Returns (cluster_id, vec_id) sorted."""
    import ray

    from ..functions.dedup import md5_u64

    qds = _kmeans_quantize(ds, id_col, emb_col, scale).materialize()
    C = _kmeans_fit(qds, k=k, iters=iters, id_col=id_col)
    handle = [ray.put(C)]

    def partial(batch: pa.Table, _q=per_cluster) -> pa.Table:
        import ray as _ray

        Cm = _ray.get(handle[0])
        c2 = (Cm * Cm).sum(axis=1)
        Q = np.stack(batch.column("q").to_pylist()).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ Cm.T) + c2[None, :]
        lab = np.argmin(d, axis=1).astype(np.int64)
        roll = np.array([md5_u64(f"cbs:{int(i)}".encode()) for i in ids],
                        dtype=np.uint64)
        df = pd.DataFrame({"cluster_id": lab, id_col: ids, "roll": roll})
        out = (df.sort_values(["cluster_id", "roll", id_col])
               .groupby("cluster_id", sort=False).head(_q))
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(batch: pa.Table, _q=per_cluster) -> pa.Table:
        df = batch.to_pandas()
        out = (df.sort_values(["cluster_id", "roll", id_col])
               .groupby("cluster_id", sort=False).head(_q)
               .drop(columns=["roll"])
               .sort_values(["cluster_id", id_col]))
        return pa.table({
            "cluster_id": pa.array(out["cluster_id"].to_numpy(np.int64)),
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
        })

    return (
        qds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def dedup_family_agreement(ds, id_col: str = "doc_id", text_col: str = "text",
                           include_ngram: bool = False):
    """Meta-audit of the near-dup PAIR FAMILIES: pairwise Jaccard
    agreement between the edge generators (MinHash-LSH est>=0.6, SimHash
    hamming<=3, winnowing shared>=5; plus exact 3-gram Jaccard>=0.5 when
    ``include_ngram``) over the same corpus -- the one-table answer to
    "which dedup signal do we trust, and where do they disagree". High
    minhash/winnow overlap with low simhash overlap says the corpus's
    near-dups are shingle-level (reorderings), not bag-of-words-level,
    and vice versa.

    The default family set is the three SUB-LINEAR generators (VERDICT
    r4 #1: exact n-gram AllPairs measured 10x exponent 1.29 -- the one
    family that cannot run at 100 TB); ``include_ngram=True`` opts the
    exact family back in as an audit and inherits
    ``ngram_jaccard_pairs``' corpus-size guard raise.

    Each family's pair table is pair-bounded by construction, so the
    comparison runs on collected pair sets -- and that bound is
    ASSERTED at collect time (``collect_bounded``: a family whose skew
    caps fail raises :class:`relational.CollectCapExceeded` naming the
    distributed per-combo alternative, ``pair_set_audit``, instead of
    silently pulling an unbounded pair domain onto the driver).
    Degenerate empty unions pin jaccard to 10^6 (vacuous agreement) on
    both sides.

    Returns 3 rows (6 with ``include_ngram``): (family_a, family_b, n_a,
    n_b, n_common, jaccard_ppm), families lexicographic."""
    from .relational import collect_bounded

    fams = {
        "minhash": minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                                     threshold=0.6),
        "simhash": simhash_pairs(ds, id_col=id_col, text_col=text_col,
                                 max_hamming=3),
        "winnow": winnow_fingerprint_pairs(ds, text_col=text_col,
                                           id_col=id_col),
    }
    if include_ngram:
        fams["ngram"] = ngram_jaccard_pairs(
            ds, id_col=id_col, text_col=text_col, threshold=0.5)
    sets = {}
    for name, out in fams.items():
        df = collect_bounded(
            out, what=f"dedup_family_agreement[{name}] pair set",
            alternative="pair_set_audit (distributed per-combo compare)")
        sets[name] = (set(zip(df["doc_a"].astype(np.int64),
                              df["doc_b"].astype(np.int64)))
                      if len(df) else set())
    names = sorted(sets)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            common = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            jac = 1_000_000 if union == 0 else common * 1_000_000 // union
            rows.append((a, b, len(sets[a]), len(sets[b]), common, jac))
    out = pd.DataFrame(rows, columns=["family_a", "family_b", "n_a", "n_b",
                                      "n_common", "jaccard_ppm"])
    for c in out.columns[2:]:
        out[c] = out[c].astype(np.int64)
    return out


def ams_f2_audit(ds, text_col: str = "text", k_est: int = 17):
    """AMS (Alon-Matias-Szegedy) second-frequency-moment audit over the
    token stream: F2 = sum of squared token counts (the collision mass /
    self-join size of the vocabulary -- what sizes a token-keyed join or
    detects skew) estimated by ``k_est`` linear sketches vs the exact
    value. Estimator j keeps ONE integer S_j = sum over occurrences of
    sign_j(token), with the four-wise-style sign drawn from the md5
    prefix (``md5_u64(f"ams:{j}:{t}") % 2``); E[S_j^2] = F2 and the
    MEDIAN of the k odd estimators is the robust estimate -- integers
    end to end, so the oracle replays every sign, sum and the median
    pick. Completes the sketch-accuracy ladder beside the HLL (F0), CMS
    (point counts), KMV and Bloom audits.

    Scale shape: S_j is LINEAR in the stream and F2 is a sum of per-token
    squares, so BOTH sides reduce to per-block integer partials over the
    grouped (token, count) exchange: each block of global counts emits one
    row of (sum c^2, S_0..S_{k-1}) and only those k+1 ints per block reach
    the driver -- the driver fold is independent of vocabulary size (the
    full-vocabulary ``.to_pandas()`` here was VERDICT r3 "what's wrong"
    #2; a web corpus has 10^8-10^9 types).

    Returns one row: (f2_exact, f2_est, err_ppm)."""
    import re

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")
    if k_est % 2 == 0:
        raise ValueError("k_est must be odd: the median pick is a single row")

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts_ds = bucketed_grouped_sum(
        ds.map_batches(vocab_partial, batch_format="pandas"), "token", "n"
    )

    def moment_partials(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["n"].to_numpy(np.int64)
        row = {"f2_part": int(np.sum(c * c))}
        toks = batch["token"].tolist()
        for j in range(k_est):
            signs = np.array(
                [1 if dk.md5_u64(f"ams:{j}:{t}".encode()) % 2 == 1 else -1
                 for t in toks], dtype=np.int64)
            row[f"s{j}"] = int(np.sum(signs * c))
        return pd.DataFrame([row])

    parts = counts_ds.map_batches(
        moment_partials, batch_format="pandas"
    ).to_pandas()  # one (k+1)-int row per block, never the vocabulary
    if len(parts) == 0:
        return pd.DataFrame({"f2_exact": pd.Series([0], dtype=np.int64),
                             "f2_est": pd.Series([0], dtype=np.int64),
                             "err_ppm": pd.Series([0], dtype=np.int64)})
    f2_exact = int(parts["f2_part"].sum())
    s2 = []
    for j in range(k_est):
        sj = int(parts[f"s{j}"].sum())
        s2.append(sj * sj)
    f2_est = sorted(s2)[k_est // 2]
    err = abs(f2_est - f2_exact) * 1_000_000 // f2_exact if f2_exact else 0
    return pd.DataFrame({"f2_exact": pd.Series([f2_exact], dtype=np.int64),
                         "f2_est": pd.Series([f2_est], dtype=np.int64),
                         "err_ppm": pd.Series([err], dtype=np.int64)})


def unigram_power_sample_plan(ds, text_col: str = "text", topn: int = 30):
    """Word2vec-style negative-sampling distribution plan: token weights
    ~ count^(3/4) -- the popularity-smoothed unigram distribution
    (Mikolov et al. 2013) that keeps stopwords from dominating negative
    draws while still preferring frequent tokens. The token-level analog
    of ``lang_temperature_plan``'s alpha=0.5 language reweighting.

    Exactness: c^(3/4) = sqrt(c * sqrt(c)) computed as
    ``floor(ieee_sqrt(c * floor(ieee_sqrt(c))))`` -- float64 sqrt of an
    int64 is correctly rounded in BOTH numpy and DuckDB (the documented
    lang_temperature convention), so both floors agree bit-for-bit;
    shares are floor-divided ppm over the WHOLE vocabulary's weight sum.

    Plan: per-batch token value_counts partials -> one
    ``bucketed_grouped_sum`` exchange on the token domain -> driver
    arithmetic on the bounded count table. Returns the ``topn`` tokens
    by (weight DESC, token ASC): (token, n, weight, target_share_ppm)."""
    import math
    import re

    from .relational import bucketed_grouped_sum

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok_re).explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    counts = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "token", "n"
    ).to_pandas()
    if len(counts) == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64),
                             "weight": pd.Series([], dtype=np.int64),
                             "target_share_ppm": pd.Series([], dtype=np.int64)})
    w = [int(math.floor(math.sqrt(int(n) * int(math.floor(math.sqrt(int(n)))))))
         for n in counts["n"]]
    counts = counts.assign(weight=pd.Series(w, index=counts.index, dtype=np.int64))
    sum_w = int(counts["weight"].sum())
    counts["target_share_ppm"] = (
        (counts["weight"].astype(object) * 1_000_000) // sum_w).astype(np.int64)
    out = counts.sort_values(["weight", "token"],
                             ascending=[False, True]).head(topn)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)[["token", "n", "weight", "target_share_ppm"]]
