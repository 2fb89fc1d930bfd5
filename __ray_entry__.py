"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md #2 + the training-data extras); ``oracle_sql()`` provides DuckDB
oracles for every SQL-expressible one (extraction itself is checked by the
pytest oracle in tests/, and the SQL-expressible shadow of it --
``extract_flat_identity`` / ``span_kind_counts`` -- is checked here).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


def _flagship(sf_dir: str):
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, store = wrap.interleaved_from_documents(sf_dir)
    return pipeline.extract_dataset(ds, store, num_partitions=32)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 -> (doc_id, spans) Dataset."""
    return _flagship("/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# queries: each callable takes sf_dir and returns Dataset / DataFrame / Table
# --------------------------------------------------------------------------


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _encode_spans_column(doc_ids, spans_rows):
    """Canonical per-doc span serialization: ``order US kind US media_ref US
    text`` joined by RS (0x1e). The nested ``list<struct>`` flagship output
    hash-compares as ONE deterministic string per document -- covering span
    order, kinds, refs and extracted text byte-for-byte -- without relying
    on how the driver's compare stringifies nested Arrow values."""
    enc = [
        "\x1e".join(
            f"{s['order']}\x1f{s['kind']}\x1f{s['media_ref']}\x1f{s['text']}" for s in row
        )
        for row in spans_rows
    ]
    return pa.table({"doc_id": pa.array(list(doc_ids), pa.string()),
                     "spans_enc": pa.array(enc, pa.string())})


def _q_extract_interleaved(sf_dir: str):
    """Flagship interleaved extraction, serialized per-doc for the exact
    DuckDB oracle (_interleaved_sql): the wrap and media store are md5
    arithmetic on doc_id/ref-index (sources/wrap.py, corpus.py), so the SQL
    recomputes boilerplate stripping, glyph-OCR truths, pdf reading order
    and the error sentinels independently from documents.parquet alone.
    entry() still returns the raw nested (doc_id, spans) Dataset."""
    out = _flagship(sf_dir)

    def encode(batch: pa.Table) -> pa.Table:
        return _encode_spans_column(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        )

    return out.map_batches(encode, batch_format="pyarrow")


def _q_extract_salted(sf_dir: str):
    """Flagship extraction through the SALTED two-level reassembly
    (stages/reassemble.reassemble_salted -- the skew path for
    pathological span-count documents, north rule "salted keys"): byte-
    identical output contract vs the plain reassembly, so the SAME exact
    interleaved SQL oracle certifies it (previously pytest-equality only;
    the skew drill's full-scale numbers live in SKEW_DRILL.json)."""
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap
    from distributed_system___ocr_ray.stages.reassemble import reassemble_salted

    ds, store = wrap.interleaved_from_documents(sf_dir)
    out = reassemble_salted(
        pipeline.extracted_dataset(ds, store, num_partitions=32), num_salts=4)

    def encode(batch: pa.Table) -> pa.Table:
        return _encode_spans_column(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        )

    return out.map_batches(encode, batch_format="pyarrow")


def _q_extract_flat_identity(sf_dir: str):
    """Full explode->extract->reassemble over flat-wrapped docs; on plain text
    extraction is the identity, so DuckDB can check the whole round trip."""
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    out = pipeline.extract_dataset(wrap.flat_as_spans(sf_dir), {}, num_partitions=32)

    def flatten(batch: pa.Table) -> pa.Table:
        ids = [int(d.split("-")[1]) for d in batch.column("doc_id").to_pylist()]
        texts = [s[0]["text"] for s in batch.column("spans").to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "extracted_text": pa.array(texts, pa.string())}
        )

    return out.map_batches(flatten, batch_format="pyarrow")


def _q_span_kind_counts(sf_dir: str):
    """Exploded span cardinality per kind over the interleaved corpus; the
    wrap is deterministic arithmetic on doc_id, so DuckDB can predict it."""
    from ray.data.aggregate import Count

    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, _ = wrap.interleaved_from_documents(sf_dir)
    exploded = pipeline.exploded_dataset(ds, num_partitions=32)
    out = exploded.groupby("kind").aggregate(Count(alias_name="n_spans"))
    return out.select_columns(["kind", "n_spans"])


def _q_extract_status_counts(sf_dir: str):
    """Flagship extraction per-status span counts (ok / download-error / decode-error sentinels)."""
    from ray.data.aggregate import Count

    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, store = wrap.interleaved_from_documents(sf_dir)
    extracted = pipeline.extracted_dataset(ds, store, num_partitions=32)
    return extracted.groupby("status").aggregate(Count(alias_name="n_spans"))


def _q_retry_plan(sf_dir: str):
    """Failed-span retry work-list (compose.retry_plan): every not-ok
    (status, media_ref) with its span count; the oracle independently
    recomputes the failure set from doc_id + md5 arithmetic (broken-ref
    sentinels and corruption rolls), so the redelivery surface is
    end-to-end checked."""
    from distributed_system___ocr_ray.pipelines import compose

    return compose.retry_plan(sf_dir)


def _q_span_profile_by_kind(sf_dir: str):
    """Extracted-output length profile per span kind over the REAL flagship
    pipeline (compose.span_profile_by_kind); the oracle aggregates the same
    closed-form allspans table as extract_interleaved, so routing AND
    output text lengths are end-to-end checked."""
    from distributed_system___ocr_ray.pipelines import compose

    return compose.span_profile_by_kind(sf_dir)


def _q_doc_completeness_by_lang(sf_dir: str):
    """Per-language fully-extracted-document share over the REAL flagship
    pipeline (compose.doc_completeness_by_lang); the oracle independently
    recomputes every span's status from doc_id + md5 arithmetic, so this
    end-to-end checks the engine's error routing per corpus slice."""
    from distributed_system___ocr_ray.pipelines import compose

    return compose.doc_completeness_by_lang(sf_dir)


def _q_media_ref_counts(sf_dir: str):
    """Per-media_ref multiplicity over the exploded interleaved corpus -- the
    engine analogue of the reference's urlCounters (Manager.java:50,216);
    SQL-checkable because the wrap's ref assignment is doc_id arithmetic."""
    from ray.data.aggregate import Count

    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, _ = wrap.interleaved_from_documents(sf_dir)
    exploded = pipeline.exploded_dataset(ds, num_partitions=32)

    def image_refs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pa.compute.and_(
            pc.equal(batch.column("kind"), "image"),
            pc.invert(pc.match_substring(batch.column("media_ref"), "missing")),
        )
        return pa.table({"media_ref": batch.column("media_ref").filter(mask)})

    return (
        exploded.map_batches(image_refs, batch_format="pyarrow")
        .groupby("media_ref")
        .aggregate(Count(alias_name="n_refs"))
    )


def _q_render_html(sf_dir: str):
    """Reference-style HTML render sink (S7) over the FLAT-wrapped corpus:
    extraction is the identity on tag-free text, so the rendered page is a
    deterministic string assembly DuckDB reproduces exactly (escape ->
    newline-to-<br/> -> block wrap, LocalApplication.java:180-207). The
    interleaved render stays exercised by tests/test_render_html.py."""
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap
    from distributed_system___ocr_ray.stages.render_html import render_html

    out = pipeline.extract_dataset(wrap.flat_as_spans(sf_dir), {}, num_partitions=32)
    return render_html(out)


def _q_extract_sharded(sf_dir: str):
    """Shard-local zero-shuffle plan via the checkpointed runner; returns the
    committed output (cross-checked vs the shuffle plan in tests)."""
    import shutil
    import tempfile

    from distributed_system___ocr_ray.pipelines.extract import load_output
    from distributed_system___ocr_ray.pipelines.sharded import run_extraction_sharded
    from distributed_system___ocr_ray.sources import lance_like, wrap

    work = tempfile.mkdtemp(prefix="graft_sharded_q_")
    try:
        ds, store = wrap.interleaved_from_documents(sf_dir)
        docs_dir = f"{work}/docs"
        # streaming fragment writer: no driver-side corpus materialization
        lance_like.write_dataset(ds, docs_dir, rows_per_fragment=500)
        run_extraction_sharded(docs_dir, store, f"{work}/out")
        out = load_output(f"{work}/out").to_pandas()
        # same canonical serialization as extract_interleaved: both plans
        # must reproduce the same closed-form span table (_interleaved_sql)
        return _encode_spans_column(out["doc_id"], out["spans"]).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_docs_by_lang(sf_dir: str):
    """Grouped document count per language (partial-aggregate then tiny final groupby)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.docs_by_lang(sf_dir)


def _q_doc_stats_by_source(sf_dir: str):
    """Per-source document count and length moments."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.doc_stats_by_source(sf_dir)


def _q_filter_project(sf_dir: str):
    """Predicate filter + column projection over documents (read-pruned)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.filter_project_documents(sf_dir)


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary: grouped sums/averages over lineitem with date filter."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.pricing_summary(sf_dir)


def _q_revenue_by_nation(sf_dir: str):
    """Multi-way dimension join to per-nation revenue rollup."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.revenue_by_nation(sf_dir)


def _q_events_daily(sf_dir: str):
    """Events per day: date-truncate then grouped count."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.events_daily(sf_dir)


def _q_daily_activity(sf_dir: str):
    """FULL OUTER join of orders/day vs events/day with zeros where one
    side is silent — no join operator: both sides emit two-column partials
    into one shared bounded-day-domain fold. Oracle: FULL OUTER JOIN +
    COALESCE."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.daily_activity_full_outer(sf_dir)


def _q_ols_trend(sf_dir: str):
    """Exact one-pass distributed OLS slope (order cents over days since
    1992-01-01, per priority): five integer sufficient statistics per
    batch, Python-int final fold, sign-split floor division to ppm.
    Oracle: the same HUGEINT normal-equation arithmetic."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.ols_trend_by_priority(sf_dir)


def _q_top_users(sf_dir: str):
    """Global top users by summed event value (partial top-k merge)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.top_users_by_value(sf_dir, k=10)


def _q_order_lineitem_join(sf_dir: str):
    """Orders-lineitem equi-join with per-order revenue aggregation."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.order_lineitem_join_stats(sf_dir)


def _q_last_order_before_event(sf_dir: str):
    """As-of (point-in-time) join: latest order at or before each event."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.last_order_before_event(sf_dir)


def _q_session_windows(sf_dir: str):
    """Sessionization: gap-based windows per user with per-session stats."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.session_windows(sf_dir)


def _q_sliding_windows(sf_dir: str):
    """Fixed-size sliding event windows per user."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.sliding_windows(sf_dir)


def _q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users (mergeable sketch partial/final).

    Approximate vs the TRUE cardinality, but a deterministic function of the
    data: the md5-prefix hash, register maxima, bias-corrected estimator and
    linear-counting branch are all replayed exactly by the DuckDB oracle, so
    the estimate itself is hash-compared (rounded to integer -- the only
    float ops are the final estimator arithmetic, identical on both sides)."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.functions.sketches import approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"approx_distinct_users": [int(np.floor(est + 0.5))]})


def _q_top_orders_per_segment(sf_dir: str):
    """Top-N orders per market segment (grouped partial top-k)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.top_orders_per_segment(sf_dir)


def _q_token_count_by_lang(sf_dir: str):
    """Whitespace/regex token counts aggregated per language."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["lang", "text"])
    return analytics.token_count_by_key(ds, key="lang").select_columns(["lang", "n_ws_tokens"])


def _q_exact_dedup_groups(sf_dir: str):
    """Exact duplicate groups: (keeper id, copy count) per distinct content; hash-only shuffle."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.exact_dedup_groups(_docs(sf_dir, ["doc_id", "text"]))


def _q_exact_dedup_rows(sf_dir: str):
    """Full keeper ROWS via the semi-filter scale shape: keepers from the
    hash-only shuffle, then a map-side broadcast ``pc.is_in`` filter -- full
    rows never enter a shuffle (analytics.exact_dedup_semifilter; the
    bucketed-join past-the-cap path is pytest-held equal). Text is omitted
    from the output only to keep the driver compare payload small; the
    engine filters complete rows."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.exact_dedup_semifilter(
        _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    )
    return out.select_columns(["doc_id", "lang", "n_chars"])


def _novelty_split(sf_dir: str):
    """(new_ds, corpus_ds) for the three novelty queries: 'new batch' =
    every 5th doc, 'committed corpus' = the rest. ONE definition — the
    three queries and their three oracle SQL strings all assume this exact
    split rule, so a drift between copies would silently break the
    'shares the oracle verbatim' contract (review finding, round 3)."""

    def mod5(want_zero: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if want_zero else (ids % 5 != 0)
            return batch.filter(pa.array(mask))

        return fn

    new_ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        mod5(True), batch_format="pyarrow"
    )
    corpus_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        mod5(False), batch_format="pyarrow"
    )
    return new_ds, corpus_ds


def _q_novel_docs(sf_dir: str):
    """Incremental-ingest novelty filter: 'new batch' = every 5th doc,
    'committed corpus' = the rest; keep new docs whose text is absent from
    the corpus (exact content match). Corpus side reduces to distinct
    hashes then broadcasts; new side filters map-side."""
    from distributed_system___ocr_ray.pipelines import analytics

    new_ds, corpus_ds = _novelty_split(sf_dir)
    out = analytics.novel_docs(new_ds, corpus_ds)
    return out.select_columns(["doc_id", "lang"])


def _q_dedup_stats(sf_dir: str):
    """Global dedup scalars: total docs, distinct contents, duplicate rows."""
    from ray.data.aggregate import Count, Sum

    from distributed_system___ocr_ray.pipelines import analytics

    groups = analytics.exact_dedup_groups(_docs(sf_dir, ["doc_id", "text"]))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("one", pa.array([1] * batch.num_rows, pa.int64()))

    return (
        groups.map_batches(tag, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum("n_copies", alias_name="n_docs"), Count(alias_name="n_distinct"))
        .select_columns(["n_docs", "n_distinct"])
    )


def _pairs_df(ds, columns: dict[str, str]):
    """Small pair results -> pandas with a guaranteed schema (an all-empty
    map_groups output otherwise loses its column names)."""
    import pandas as pd

    df = ds.to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame({c: pd.Series(dtype=t) for c, t in columns.items()})
    return df[list(columns)]


def _q_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs. est_jaccard is k/64 (k = matching
    signature positions), reported as the integer k so the DuckDB oracle --
    which replays shingling, the md5 shingle hash, all 64 seeded
    permutations, banding, the bucket skew cap and the candidate join in
    SQL -- compares exactly. Oracle caveat: band buckets keyed by value
    equality in SQL vs a 63-bit md5 of the band slice in the engine (a
    2^-63 collision could perturb candidates either way -- negligible)."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.6)
    df = _pairs_df(out, {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"})
    df["n_match"] = (df.pop("est_jaccard") * 64).round().astype("int64")
    return df


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs; the DuckDB oracle replays the md5 token hash,
    per-bit majority vote, band blocking and Hamming filter in SQL."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)
    return _pairs_df(out, {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})


def _q_ngram_jaccard_pairs(sf_dir: str):
    """Exact-recall prefix-filtered Jaccard pairs; the DuckDB oracle computes
    the full exact pair set (self-join on word 3-shingles), which the prefix
    lemma guarantees the distributed plan also finds."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)
    return _pairs_df(out, {"doc_a": "int64", "doc_b": "int64", "jaccard_ppm": "int64"})


def _q_ngram_dup_clusters(sf_dir: str):
    """Connected components over the exact-recall Jaccard pair graph --
    checkable end-to-end in SQL via a recursive-CTE transitive closure."""
    from distributed_system___ocr_ray.pipelines import analytics

    pairs = analytics.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)
    out = analytics.dedup_clusters(pairs)
    return _pairs_df(out, {"doc_id": "int64", "cluster_id": "int64"})


def _q_embedding_neardup(sf_dir: str):
    """Embedding cosine near-duplicate pairs above threshold (bucketed block matmul)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = analytics.embedding_neardup_pairs(ds, threshold=0.95)
    # pair identities only: cosine floats stay out of the hash compare. The
    # oracle is the exact >=0.95 pair set; LSH recall on it is probabilistic
    # by design (~0.999 at this threshold), so the compare is honest but can
    # in principle flag a recall miss -- planted-dup recall is pytest-held.
    return _pairs_df(out, {"vec_a": "int64", "vec_b": "int64"})


def _q_extract_embed_neardup(sf_dir: str):
    """Composed flow: extraction -> hash-embedding -> cosine near-dup, one
    streaming plan over the interleaved corpus. Pair ids only (floats stay
    out of the hash compare); the oracle replays extraction + the md5
    feature-hash embedding + the exact >= threshold cosine pair set in SQL
    (_extract_embed_neardup_sql). replicate=2 stamps an exact twin of every
    doc so the pair set is NON-EMPTY and deterministic: identical vectors
    hash to identical LSH buckets in every table (recall exactly 1), while
    the closest non-twin pair sits at cosine ~0.97 -- far from the 0.999
    threshold, so no float-margin pair can flip the compare."""
    from distributed_system___ocr_ray.pipelines.compose import extract_embed_neardup
    from distributed_system___ocr_ray.sources import wrap

    ds, store = wrap.interleaved_from_documents(sf_dir, replicate=2)
    out = extract_embed_neardup(ds, store, threshold=0.999)
    return _pairs_df(out, {"vec_a": "object", "vec_b": "object"})


def _q_minhash_dup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash-LSH pairs -> connected components via
    iterative min-label propagation. The DuckDB oracle replays the full
    MinHash pair SQL plus a recursive-CTE transitive closure."""
    from distributed_system___ocr_ray.pipelines import analytics

    pairs = analytics.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.6)
    out = analytics.dedup_clusters(pairs)
    return _pairs_df(out, {"doc_id": "int64", "cluster_id": "int64"})


def _q_simhash_dup_clusters(sf_dir: str):
    """Near-dup clusters over the SIMHASH pair graph (completing the
    cluster matrix beside minhash_dup_clusters and ngram_dup_clusters:
    same connected-components engine, third edge generator); oracle
    wraps the full simhash pair replay as a CTE and applies the shared
    recursive-closure pattern."""
    from distributed_system___ocr_ray.pipelines import analytics

    pairs = analytics.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)
    out = analytics.dedup_clusters(pairs)
    return _pairs_df(out, {"doc_id": "int64", "cluster_id": "int64"})


def _q_clean_corpus_keepers(sf_dir: str):
    """Composed cleaning pipeline: length filter -> exact dedup keep-first.
    SQL-checkable end-to-end."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    filtered = ds.filter(expr="n_chars >= 100 and n_chars <= 20000")
    groups = analytics.exact_dedup_groups(filtered)
    return groups.select_columns(["keeper_doc_id"])


def _q_sample_docs(sf_dir: str):
    """Deterministic md5-threshold sampling (reproducible across cluster
    sizes; DuckDB md5 matches byte-for-byte)."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return analytics.deterministic_sample(ds, rate=0.25)


def _q_dataset_split_counts(sf_dir: str):
    """Deterministic md5 train/val/test split assignment with per-split counts."""
    from ray.data.aggregate import Count

    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id"])
    return (
        analytics.train_val_test_split(ds)
        .groupby("split")
        .aggregate(Count(alias_name="n_docs"))
    )


def _q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling: 50% of 'en', 25% of 'de', 10%
    elsewhere -- entirely map-side (per-key md5 thresholds), no shuffle."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return analytics.stratified_sample(ds, key="lang", fractions={"en": 0.5, "de": 0.25}, default=0.1)


def _q_redact_pii(sf_dir: str):
    """PII scrub over a corpus with deterministically PLANTED pii (the
    synthetic documents carry none): each doc gets a URL, an email and a
    phone derived from its doc_id via string arithmetic the SQL oracle
    reproduces, then functions.scrub.redact_pii replaces them with
    placeholder tokens. Pattern strings and replace order are shared
    verbatim with the oracle's nested regexp_replace chain."""
    import pandas as pd

    from distributed_system___ocr_ray.pipelines import analytics

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text"] = (
            b["text"]
            + " visit https://ex.org/p" + b["doc_id"].astype(str)
            + " mail user" + b["doc_id"].astype(str) + "@mail.example.com call +1-555-"
            + (b["doc_id"] % 10000).map(lambda d: f"{d:04d}")
        )
        return b

    planted = _docs(sf_dir, ["doc_id", "text"]).map_batches(plant, batch_format="pandas")
    return analytics.redact_pii_docs(planted)


# eval set for the decontamination query: a 4% md5-threshold sample of the
# corpus itself (self-contained; a real pipeline would pass the benchmark
# dataset). Shared between the engine query and the SQL oracle.
_CONTAM_EVAL_RATE = 0.04
_CONTAM_K = 8


def _q_contamination_flags(sf_dir: str):
    """Benchmark decontamination: n_hits = how many distinct eval-set
    first-8-token probes each doc contains (GPT-3-style n-gram overlap).
    Eval probes are collected once (bounded) and broadcast; the corpus pass
    is map-side substring scans, zero shuffle."""
    from distributed_system___ocr_ray.pipelines import analytics

    docs = _docs(sf_dir, ["doc_id", "text"])
    eval_ds = analytics.deterministic_sample(
        _docs(sf_dir, ["doc_id", "text"]), rate=_CONTAM_EVAL_RATE
    )
    return analytics.contamination_flags(docs, eval_ds, k=_CONTAM_K)


_BUDGET_TOKENS = 10_000
_MIX_SHARES = {"src0": 500_000, "src1": 300_000, "src2": 200_000}
_MIX_TARGET = 40


def _q_sample_by_quality(sf_dir: str):
    """Importance sampling proportional to the quality score: each doc
    keeps with probability quality_ppm/1e6 via a deterministic md5 roll —
    soft curation instead of a hard threshold. Map-side only; the oracle
    recomputes the quality expression and the same roll."""
    import pandas as pd

    from distributed_system___ocr_ray.functions import textstats as ts
    from distributed_system___ocr_ray.pipelines import analytics

    def wq(batch: pd.DataFrame) -> pd.DataFrame:
        f = ts.quality_features(batch["text"])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].values, "quality_ppm": f["quality_ppm"].values}
        )

    slim = _docs(sf_dir, ["doc_id", "text"]).map_batches(wq, batch_format="pandas")
    return analytics.sample_by_weight(slim, "quality_ppm")


def _q_value_histogram(sf_dir: str):
    """32-bin exact order-value histogram (bin edges in integer cents):
    one (min, max, count) aggregate then bincount partials through the
    tiny merge. Oracle replays the identical float64 width/bin/edge
    arithmetic."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return analytics.value_histogram(ds, "o_totalprice", bins=32)


def _q_running_totals(sf_dir: str):
    """Per-customer running order spend (cumulative window over
    (o_orderdate, o_orderkey)); partition-bucketed vectorized cumsum,
    integer cents. Oracle: SUM OVER (PARTITION BY ... ORDER BY ...)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.running_totals(sf_dir)


def _q_robust_outliers(sf_dir: str):
    """Per-lang median/MAD outlier flags on n_chars (dev > 2 * MAD), both
    medians exact via histogram bisection — no global sort. All-integer
    compare; the oracle replays the ceil-rank median convention with
    row_number windows. k_mad=2 (not the textbook 3) because the synthetic
    n_chars distribution is tight enough that 3*MAD flags nothing at the
    driver's sf0.01 — an empty result would gate nothing."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.robust_outliers(
        lambda: _docs(sf_dir, ["doc_id", "lang", "n_chars"]), k_mad=2
    )


def _q_collocations(sf_dir: str):
    """Top-50 bigram collocations by integer-exact PMI ordering
    (floor(1e6 * n_xy * N / (n_x * n_y)), min_count 5). One shuffle for
    unigram+bigram+total counts; HUGEINT division in the oracle."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.collocations(_docs(sf_dir, ["text"]), k=50, min_count=5)


_POSTINGS_TERMS = ["batch", "data", "stream"]


def _q_postings_lookup(sf_dir: str):
    """Inverted-index build + zone-map-pruned term lookup end-to-end:
    documents -> distinct (term, doc_id) postings -> sort by term (the one
    all-to-all, the index's build cost) -> Lance-style commit -> per-term
    manifest-only fragment pruning -> exact IN filter -> per-term doc
    counts. require_pruning=True makes the green row certify the string
    zone maps actually skipped fragments."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.pipelines import index as idx

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tdir = tempfile.mkdtemp(prefix="graft_postings_") + "/postings"
    try:
        idx.build_postings(
            _docs(sf_dir, ["doc_id", "text"]), tdir,
            rows_per_fragment=max(2000, n_docs * 10),
        )
        out = idx.lookup_terms(tdir, _POSTINGS_TERMS, require_pruning=True)
        return out.to_pandas()
    finally:
        import os

        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _q_percent_rank_by_lang(sf_dir: str):
    """Per-lang percentile rank of n_chars in integer ppm (RANK tie-min,
    (rank-1)*1e6 // (n-1), single-row groups 0); hash-bucketed one-pass
    vectorized ranking. Oracle: the same integer window arithmetic."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.percent_rank_by_group(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    )


def _q_customer_order_counts(sf_dir: str):
    """LEFT OUTER join through the bucketed hash join: customers keep a row
    even with zero orders (the reference's completion ledger must list
    inputs that produced nothing — same semantics). Orders pre-aggregate to
    per-customer counts BEFORE the join (the wide side never ships raw
    rows), then the null side fills 0."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    from distributed_system___ocr_ray.pipelines import relational

    customers = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    counts = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="cnt"))
    )
    joined = relational.bucketed_hash_join(
        customers, counts, "c_custkey", "o_custkey", how="left"
    )

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].astype("int64"),
                "n_orders": batch["cnt"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(clean, batch_format="pandas")


def _q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — the exact twin of the
    HLL approx path. Distinct pairs shuffle on a val-hash bucket (hot keys
    spread); per-bucket counts are disjoint and sum exactly."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return analytics.grouped_distinct_count(ev, "event_type", "user_id")


def _q_last_event_per_user(sf_dir: str):
    """Per-user latest event (argmax record): per-batch partial argmax,
    key-bucketed merge; value in integer cents. Oracle: row_number DESC
    window."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        t = batch.column("ts").cast(pa.int64())
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": t,
                "event_type": batch.column("event_type"),
                "value_cents": pa.array(
                    np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    out = analytics.latest_record_per_key(
        ev.map_batches(cents, batch_format="pyarrow"),
        "user_id", "ts_us", ["event_type", "value_cents"],
    )
    return out


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_events_pivot_daily(sf_dir: str):
    """Long-to-wide pivot: one row per day, one count column per event
    type (fixed vocabulary). One key-domain-sized shuffle; the single
    final block reshapes. Oracle: conditional aggregation with the same
    n_{type} column names."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def day(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // (86400 * 10**6)
        return pa.table(
            {"day": pa.array(d, pa.int64()), "event_type": batch.column("event_type")}
        )

    return analytics.pivot_counts(
        ev.map_batches(day, batch_format="pyarrow"), "day", "event_type", _EVENT_TYPES
    )


def _q_events_unpivot_daily(sf_dir: str):
    """Wide-to-long UNPIVOT of the daily event pivot (the reshape dual of
    events_pivot_daily; analytics.melt): pure map-side repeat/tile after
    the pivot's single exchange -- melting commutes with partitioning, so
    no second shuffle exists. Oracle: DuckDB UNPIVOT over the identical
    pivot subquery with the n_ prefix stripped."""
    from distributed_system___ocr_ray.pipelines import analytics

    wide = _q_events_pivot_daily(sf_dir)
    return analytics.melt(
        wide, ["day"], [f"n_{t}" for t in _EVENT_TYPES],
        var_name="event_type", value_name="n", strip_prefix="n_",
    )


def _q_benford_first_digit(sf_dir: str):
    """Benford first-significant-digit forensics profile of order prices
    in exact integer cents (analytics.benford_first_digit): vectorized
    integer floor-division digit extraction, 9-row bounded final,
    Python-int share ppm. Oracle extracts the digit via
    substr(CAST(cents AS VARCHAR), 1, 1) -- equal for positive ints."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return analytics.benford_first_digit(ds)


def _q_zipf_bits_audit(sf_dir: str):
    """Zipf rank-frequency shape audit (analytics.zipf_bits_audit): token
    frequency and its floor(log2) bit-length at power-of-two ranks over
    the shared '[a-z0-9]+' lowered tokenization; drop_bits per octave is
    the local Zipf slope, float-log-free on both sides. Oracle replays
    via row_number() (n DESC, tk ASC) + length(bin(n))-1."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return analytics.zipf_bits_audit(ds, max_rank=4096)


def _q_hapax_rate_by_source(sf_dir: str):
    """Per-source hapax-legomena rate (analytics.hapax_rate_by_source):
    ppm of each source's vocabulary occurring exactly once within the
    source -- OCR-noise / template-corpus health audit. Oracle replays
    the (source, token) count table and the floor-div ppm."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return analytics.hapax_rate_by_source(ds)


def _q_source_tv_distance(sf_dir: str):
    """Pairwise total-variation distance between per-source unigram
    distributions in integer ppm (analytics.source_tv_distance) -- the
    shared-generator provenance audit. Oracle replays the floor-div ppm
    table and the pair grid with two LEFT JOINs + //2."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return analytics.source_tv_distance(ds)


def _q_token_burstiness(sf_dir: str):
    """Church-Gale burstiness profile of the top-20 tokens
    (analytics.token_burstiness): corpus frequency, document frequency,
    and mean occurrences per containing doc (milli floor-div). Oracle
    replays cf/df via COUNT(*) / COUNT(DISTINCT doc_id) per token."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return analytics.token_burstiness(ds, k=20)


def _q_graph_reciprocity(sf_dir: str):
    """Edge reciprocity ppm of the md5-derived citation graph
    (analytics.graph_reciprocity): distinct directed edges whose reverse
    is also present. Oracle replays the shared edge CTEs + a self-join
    EXISTS over the DISTINCT edge set."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.graph_reciprocity(ds)


def _q_docs_rollup(sf_dir: str):
    """OLAP ROLLUP counts over (lang, source) in one shuffle: coarser
    levels fold from the finest inside the single final block; rolled
    columns carry 'ALL'. Oracle: GROUP BY ROLLUP + COALESCE."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.rollup_counts(
        _docs(sf_dir, ["lang", "source"]), ["lang", "source"]
    )


def _q_docs_cube(sf_dir: str):
    """OLAP CUBE counts over (lang, source): all four grouping sets fold
    from the finest level inside the single final block — one shuffle,
    not 2^k scans. Oracle: GROUP BY CUBE + COALESCE."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.cube_counts(
        _docs(sf_dir, ["lang", "source"]), ["lang", "source"]
    )


def _q_dedup_keep_best(sf_dir: str):
    """Exact dedup keeping the best-quality representative per content
    group (max quality_ppm, tie min doc_id) — quality computed map-side,
    per-batch partial argmax, group-domain-sized shuffle. Oracle: the
    shared quality CTE + a row_number window."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.dedup_keep_best(_docs(sf_dir, ["doc_id", "text"]))


def _q_shipments_within_7d(sf_dir: str):
    """Band/range join (no equality key): per order, count ALL lineitem
    shipments corpus-wide with l_shipdate in [o_orderdate, +7 days).
    Window-width time buckets, 2x replication of the small side only,
    per-bucket sort + two searchsorted calls; zero counts survive.
    Oracle: LEFT JOIN on the range predicate."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"])
    return relational.range_join_counts(
        orders, lineitem, "o_orderdate", "l_shipdate", "o_orderkey",
        window_us=7 * 86400 * 10**6, out_col="n_shipped",
    )


def _range_bounds(sf_dir: str) -> tuple[int, int]:
    """[3N/10, 11N/20) — the ONE definition of the doc_id range the two
    storage-layer range queries and their oracle SQL share (the _RANGE_CTE
    twin; a drift between copies would silently break the
    shares-the-oracle-verbatim contract — review finding, round 3)."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return 3 * n // 10, 11 * n // 20


# SQL twin of _range_bounds: same integer arithmetic, computed by DuckDB
_RANGE_CTE = (
    "b AS (SELECT 3 * COUNT(*) // 10 AS lo, 11 * COUNT(*) // 20 AS hi "
    "FROM documents)"
)


def _lang_agg(ds):
    """(lang, n_docs, sum_chars) over a (doc_id, lang, n_chars) Dataset —
    the shared aggregation tail of the two range queries."""
    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby

    def agg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": pa.array([1] * batch.num_rows, pa.int64()),
                "sum_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    return tiny_final_groupby(
        ds.map_batches(agg, batch_format="pyarrow"),
        ["lang"],
        [("n_docs", "sum"), ("sum_chars", "sum")],
        ["lang", "n_docs", "sum_chars"],
    )


def _q_cow_delete_counts(sf_dir: str):
    """Copy-on-write delete end-to-end: stream documents into a Lance-style
    table (contiguous fragments + zone maps), DELETE the shared doc_id
    range — write amplification bounded by the zone maps (untouched
    fragments carry over by reference; the guard raises unless some
    fragments were carried AND some rows were deleted) — then aggregate
    the surviving rows per lang. The oracle is the complement WHERE clause
    over the source table."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.sources import lance_like

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lo, hi = _range_bounds(sf_dir)
    tdir = tempfile.mkdtemp(prefix="graft_cow_") + "/docs"
    try:
        lance_like.write_dataset(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            tdir,
            rows_per_fragment=max(50, n // 10),
        )
        man = lance_like.delete_where(
            tdir, [("doc_id", ">=", lo), ("doc_id", "<", hi)]
        )
        if not (man["rows_deleted"] > 0 and man["fragments_carried"] > 0):
            raise AssertionError(
                f"copy-on-write delete shape wrong: {man['rows_deleted']} rows, "
                f"{man['fragments_carried']} carried"
            )
        return _lang_agg(lance_like.read_dataset(tdir)).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _merge_updates(sf_dir: str) -> "pa.Table":
    """The deterministic MERGE updates batch the two lakehouse-mutation
    queries share: every 5th doc_id inside the shared range becomes
    lang='xx' with n_chars+1000 (UPDATE); every 97th doc_id re-keyed past
    the table's max id arrives as lang='new' (INSERT). The updates batch
    is the SMALL side of a MERGE by construction -- building it
    driver-side is the operator's contract, not a scale compromise."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lo, hi = _range_bounds(sf_dir)
    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ids = src.column("doc_id").to_numpy()
    upd = src.filter(pa.array((ids >= lo) & (ids < hi) & (ids % 5 == 0)))
    upd = pa.table(
        {
            "doc_id": upd.column("doc_id"),
            "lang": pa.array(["xx"] * upd.num_rows, pa.string()),
            "n_chars": pc.add(upd.column("n_chars"), 1000),
        }
    )
    ins = src.filter(pa.array(ids % 97 == 0))
    ins = pa.table(
        {
            "doc_id": pc.add(ins.column("doc_id"), n),
            "lang": pa.array(["new"] * ins.num_rows, pa.string()),
            "n_chars": ins.column("n_chars"),
        }
    )
    return pa.concat_tables([upd, ins])


def _q_merge_upsert_counts(sf_dir: str):
    """Keyed MERGE (upsert) end-to-end: stream documents into a Lance-style
    table (contiguous fragments + zone maps), MERGE a deterministic updates
    batch — every 5th doc_id inside the shared range becomes lang='xx' with
    n_chars+1000 (UPDATE), every 97th doc_id re-keyed past the table's max
    id arrives as lang='new' (INSERT) — then aggregate the merged table per
    lang. Write amplification is zone-map-bounded (the guard raises unless
    fragments were carried untouched AND both update and insert rows
    landed). The oracle replays the merge as target-minus-matched UNION ALL
    updates in SQL. Delta/Iceberg MERGE INTO semantics
    (sources/lance_like.merge_upsert)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.sources import lance_like

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tdir = tempfile.mkdtemp(prefix="graft_merge_") + "/docs"
    try:
        lance_like.write_dataset(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            tdir,
            rows_per_fragment=max(50, n // 10),
        )
        man = lance_like.merge_upsert(tdir, _merge_updates(sf_dir), "doc_id")
        if not (
            man["rows_updated"] > 0
            and man["rows_inserted"] > 0
            and man["fragments_carried"] > 0
        ):
            raise AssertionError(
                f"merge shape wrong: {man['rows_updated']} updated, "
                f"{man['rows_inserted']} inserted, "
                f"{man['fragments_carried']} carried"
            )
        return _lang_agg(lance_like.read_dataset(tdir)).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _q_change_feed_counts(sf_dir: str):
    """Row-level change data feed (Delta CDF / Iceberg changelog): build a
    Lance-style docs table (v1), MERGE the shared deterministic updates
    batch (v2), COW-DELETE the half-range just above the merge window
    (v3), then COMPACT (v4). ``changed_rows(v3, v4)`` must be EMPTY
    (compaction carries every row -- asserted), and the returned
    per-change key counts of ``changed_rows(v1, v3)`` must equal the three
    mutation rules replayed in SQL. Only rewritten fragments are ever
    read; carried rows (the untouched neighbors inside rewritten
    fragments) cancel by content hash (pipelines/compose.changed_rows)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.pipelines import compose
    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby
    from distributed_system___ocr_ray.sources import lance_like

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lo, hi = _range_bounds(sf_dir)
    tdir = tempfile.mkdtemp(prefix="graft_cdf_") + "/docs"
    try:
        lance_like.write_dataset(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            tdir,
            rows_per_fragment=max(50, n // 10),
        )
        v1 = lance_like.latest_version(tdir)
        lance_like.merge_upsert(tdir, _merge_updates(sf_dir), "doc_id")
        man3 = lance_like.delete_where(
            tdir, [("doc_id", ">=", hi), ("doc_id", "<", hi + (hi - lo) // 2)]
        )
        v3 = man3["version"]
        lance_like.compact(tdir, target_rows_per_fragment=n)
        if compose.changed_rows(tdir, v3).count() != 0:
            raise AssertionError("compaction must produce an empty change feed")
        feed = compose.changed_rows(tdir, v1, v3)

        def one(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "change": batch.column("change"),
                    "n_keys": pa.array([1] * batch.num_rows, pa.int64()),
                }
            )

        return tiny_final_groupby(
            feed.map_batches(one, batch_format="pyarrow"),
            ["change"],
            [("n_keys", "sum")],
            ["change", "n_keys"],
        ).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _q_pruned_range_read(sf_dir: str):
    """Zone-map pruned range read end-to-end: stream documents into a
    Lance-style table (~10 contiguous fragments, per-fragment min/max
    recorded in the manifest), then answer the shared doc_id range query
    by pruning fragments from the MANIFEST ALONE before the read is
    planned (exact filter pushed down into the surviving fragments'
    read), and aggregating per lang. Raises unless pruning actually
    skipped fragments, so the green CORRECTNESS row certifies both the
    zone maps' correctness (vs the full-scan SQL) and their
    effectiveness. At 100 TB this is the O(matching-fragments) range-scan
    path (Lance/Iceberg zone-map semantics)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.sources import lance_like

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lo, hi = _range_bounds(sf_dir)
    tdir = tempfile.mkdtemp(prefix="graft_prune_") + "/docs"
    try:
        lance_like.write_dataset(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            tdir,
            rows_per_fragment=max(50, n // 10),
        )
        preds = [("doc_id", ">=", lo), ("doc_id", "<", hi)]
        paths, total = lance_like.pruned_fragment_paths(tdir, preds)
        if not (0 < len(paths) < total):
            raise AssertionError(
                f"zone-map pruning ineffective: {len(paths)}/{total} fragments kept"
            )
        return _lang_agg(lance_like.read_dataset(tdir, predicates=preds)).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention triangle over the events stream: first
    active week cohorts x week offsets, distinct users per cell. One
    user-bucketed shuffle of deduped (user, week) pairs; tiny merge.
    Oracle: epoch-week arithmetic + per-user MIN + COUNT DISTINCT."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return analytics.retention_cohorts(ev)


def _q_domain_counts(sf_dir: str):
    """Per-domain URL counts over a deterministically URL-planted corpus
    (every doc links d{doc_id%7}.example.org; doc_id%3==0 docs add a
    second link on d0) — the crawl-curation domain ranking. Unbounded-key
    partial counts + distributed sum + partial top-k merge; the oracle
    replays planting, extraction, hostname reduction and ranking."""
    import pandas as pd

    from distributed_system___ocr_ray.pipelines import analytics

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        extra = (" see https://d0.example.org/x" + b["doc_id"].astype(str)).where(
            b["doc_id"] % 3 == 0, ""
        )
        b["text"] = (
            b["text"]
            + " via https://d" + (b["doc_id"] % 7).astype(str)
            + ".example.org:8080/page" + b["doc_id"].astype(str)
            + extra
        )
        return b

    planted = _docs(sf_dir, ["doc_id", "text"]).map_batches(plant, batch_format="pandas")
    return analytics.domain_counts(planted, k=10)


_FUNNEL_STEPS = ["view", "click", "purchase"]


def _q_funnel_counts(sf_dir: str):
    """view -> click -> purchase funnel with first-touch anchors: users
    completing each stage strictly after their previous anchor. Hash-
    bucketed per-user vectorized stages, tiny count merge. Oracle: chained
    MIN-anchor CTEs."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return analytics.funnel_counts(ev, _FUNNEL_STEPS)


def _q_zscore_by_lang(sf_dir: str):
    """Per-language z-scored quality (integer ppm): exact int sums ->
    float64 mean/std -> the same IEEE floor both sides — the feature
    normalization before cross-language thresholding."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.zscore_by_group(_docs(sf_dir, ["doc_id", "lang", "text"]))


def _q_sample_n_per_group(sf_dir: str):
    """Balanced eval subset: the 15 smallest-md5-key docs per language —
    exact per-group sizes, deterministic, append-stable. Oracle: QUALIFY
    ROW_NUMBER over PARTITION BY lang in the same md5 order."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.sample_n_per_group(_docs(sf_dir, ["doc_id", "lang"]), 15)


_FUZZY_NOVEL_THRESHOLD = 0.6


def _q_novel_docs_minhash(sf_dir: str):
    """Fuzzy novelty gate: every-5th doc is the new batch, the rest the
    committed corpus; new docs near-duplicating (MinHash est-Jaccard >=
    0.6) any corpus doc are dropped. The unchanged minhash_lsh_pairs plan
    runs over a side-encoded union; the oracle replays it (permutation
    literals, banding, skew cap) over the same union and anti-joins the
    cross-side matches."""
    from distributed_system___ocr_ray.pipelines import analytics

    new_ds, corpus_ds = _novelty_split(sf_dir)
    out = analytics.novel_docs_minhash(
        new_ds, corpus_ds, threshold=_FUZZY_NOVEL_THRESHOLD
    )
    return out.select_columns(["doc_id", "lang"])


def _q_chunk_documents(sf_dir: str):
    """Sliding-window chunking (64-token chunks, 16-token overlap) — the
    embedding/RAG indexing fan-out. Pure map-side; the oracle replays
    tokenization, stride windows and the space-join via list_slice."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.chunk_documents(_docs(sf_dir, ["doc_id", "text"]), 64, 16)


def _q_novel_docs_bloom(sf_dir: str):
    """Same novelty semantics as novel_docs (every-5th-doc new batch vs
    the rest as corpus) through the Bloom-prefilter path: misses pass
    map-side as definitely-novel, hits re-verify exactly against the real
    hash table — the 35x-smaller broadcast with unchanged output, which is
    why it shares novel_docs' NOT IN oracle verbatim."""
    from distributed_system___ocr_ray.pipelines import analytics

    new_ds, corpus_ds = _novelty_split(sf_dir)
    out = analytics.novel_docs_bloom(new_ds, corpus_ds)
    return out.select_columns(["doc_id", "lang"])


_BOILER1 = "promo: subscribe to our newsletter today!"
_BOILER2 = "follow us on social media for updates"


def _q_line_dedup(sf_dir: str):
    """C4-style corpus line dedup over a deterministically boilerplated
    corpus: every doc gains a newsletter line (all docs), a social line
    (doc_id%3==0) and a short 'ad' line (exempt, < 8 chars). After dedup
    only the globally-first occurrence of each boilerplate line survives;
    each doc's own unique line and the exempt short line stay everywhere.
    Engine: hash-only line-stats shuffle -> broadcast {hash: first-pack}
    -> map-side rewrite. Oracle replays split/count/min-pack/rejoin."""
    import pyarrow as pa

    from distributed_system___ocr_ray.pipelines import analytics

    def boiler(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = [
            t
            + "\n"
            + _BOILER1
            + ("\n" + _BOILER2 if d % 3 == 0 else "")
            + "\nad"
            for d, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": batch.column("doc_id"), "text": pa.array(out, pa.string())})

    src = _docs(sf_dir, ["doc_id", "text"]).map_batches(boiler, batch_format="pyarrow")
    return analytics.line_dedup(src, min_line_chars=8)


def _q_sample_exact_n(sf_dir: str):
    """Exact-size deterministic sample (the 60 docs with the smallest
    md5('samplen:'||doc_id) keys): per-batch partial top-n + one tiny
    merge, stable across runs/cluster sizes/appends. Oracle: QUALIFY
    ROW_NUMBER over the same md5 order."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.sample_n(_docs(sf_dir, ["doc_id", "lang"]), 60)


def _q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch-3 training shuffle: dense positions 0..n-1 in
    md5('epoch3:' || doc_id) order — the same permutation at any cluster
    size / block layout (what random_shuffle cannot guarantee), resumable
    mid-epoch. Engine: uniform-key fixed-width range partition + prefix-sum
    ranks, no global sort barrier. Oracle: one ROW_NUMBER window."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.epoch_shuffle(_docs(sf_dir, ["doc_id"]), epoch=3)


def _q_cms_top_tokens(sf_dir: str):
    """Count-Min-sketch frequency estimates for the exact top-20 tokens:
    the sketch (4x8192 md5-bucketed counters, per-batch partials, tree
    merge) is point-queried at a deterministic candidate set — the exact
    heavy hitters — so the whole query is SQL-replayable counter-for-
    counter. Estimates are >= truth by construction; the oracle recomputes
    every bucket count and min-over-rows estimate independently."""
    from distributed_system___ocr_ray.pipelines import analytics

    cands = analytics.top_tokens(_docs(sf_dir, ["text"]), k=20).to_pandas()["token"].tolist()
    return analytics.cms_token_counts(_docs(sf_dir, ["text"]), candidates=cands, k=20)


def _q_mixture_sample(sf_dir: str):
    """Data mixing to target proportions (50/30/20 across three sources,
    ~40 docs): per-source counts calibrate integer keep-rates, then a pure
    map-side deterministic md5 filter samples — reproducible across runs
    and cluster sizes, rates self-adjusting to observed source sizes. The
    oracle recomputes counts, rates and the md5 roll in SQL."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.mixture_sample(
        _docs(sf_dir, ["doc_id", "source"]), _MIX_SHARES, _MIX_TARGET
    )


def _q_budget_select(sf_dir: str):
    """Token-budget corpus selection: the highest-quality documents whose
    running token sum fits a 10k-token budget — greedy prefix of
    (quality_ppm DESC, doc_id ASC). Engine: two bounded histogram passes
    over the integer ppm domain find the exact quality threshold, the
    above-threshold set is a map-side filter, and the tie group resolves
    via the distributed prefix-sum (no global sort anywhere). The oracle
    replays it with one SQL window function."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.budget_select(_docs(sf_dir, ["doc_id", "text"]), _BUDGET_TOKENS)


def _q_pack_sequences(sf_dir: str):
    """Streaming greedy sequence packing (seq_len=512) in global doc_id
    order via the distributed prefix-sum pattern (range partition ->
    per-range sums -> driver exclusive scan -> per-range ordered cumsum).
    The oracle replays it with one SQL window function."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.pack_sequences(_docs(sf_dir, ["doc_id", "text"]), seq_len=512)


def _q_quantize_embeddings(sf_dir: str):
    """int8 embedding quantization, compared via per-vector integer
    checksums (sum / L1 / max of the quantized values) -- exact compare
    without list-column stringification differences; the list itself is
    pytest-held (dtype, dequantization error bound)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = analytics.quantize_embeddings(ds)

    def checksums(batch: pa.Table) -> pa.Table:
        q = [np.asarray(v, dtype=np.int64) for v in batch.column("q_embedding").to_pylist()]
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "q_sum": pa.array([int(v.sum()) for v in q], pa.int64()),
                "q_l1": pa.array([int(np.abs(v).sum()) for v in q], pa.int64()),
                "q_max": pa.array([int(v.max()) for v in q], pa.int64()),
            }
        )

    return out.map_batches(checksums, batch_format="pyarrow")


def _query_matrix(sf_dir: str, n: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(tbl.column("vec_id").to_numpy())[:n]
    return np.stack([tbl.column("embedding")[int(i)].as_py() for i in order]).astype(np.float64)


def _q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k ANN: per-batch numpy matmul against the broadcast query matrix."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = analytics.ann_topk(ds, _query_matrix(sf_dir), k=10)
    return out.select_columns(["query_id", "vec_id"])


def _q_ivf_topk(sf_dir: str):
    """IVF approximate top-k: coarse k-means routing, probe nearest cells only."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # n_probe == n_centroids: exhaustive probing makes the result exact BY
    # CONSTRUCTION (every centroid list is scanned), so the brute-force SQL
    # oracle (same as ann_topk) is valid at any scale while still driving the
    # complete IVF plan end-to-end: centroid sampling -> CentroidAssign ->
    # probe filter -> per-cluster partial top-k -> merge. Approximate probing
    # (n_probe < n_centroids) is a recall/latency trade-off with no exact
    # oracle -- its recall floor is pytest-held (test_ivf_topk_recall).
    out = analytics.ivf_topk(ds, _query_matrix(sf_dir), k=10, n_centroids=16, n_probe=16)
    # id pairs only (floats stay out of the hash compare)
    return out.select_columns(["query_id", "vec_id"])


def _q_ivf_indexed_topk(sf_dir: str):
    """IVF top-k through a PERSISTED centroid index: build the centroid
    table once (pipelines.index.build_ivf_centroids -- the dense-side
    build-once/lookup-many artifact beside build_postings), then the
    lookup probes it WITHOUT re-clustering. Same exhaustive-probe
    construction as ivf_topk (n_probe == n_centroids), so the brute-force
    SQL oracle stays exact; the persisted centroids are the deterministic
    seeded fit, so indexed and per-call paths are value-identical
    (pytest-held equality in tests/test_ivf_index.py)."""
    import tempfile

    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics
    from distributed_system___ocr_ray.pipelines import index as idx

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    tdir = tempfile.mkdtemp(prefix="graft_ivf_") + "/centroids"
    idx.build_ivf_centroids(ds, tdir, n_centroids=16)
    out = analytics.ivf_topk(ds, _query_matrix(sf_dir), k=10, n_centroids=16,
                             n_probe=16, centroids=tdir)
    return out.select_columns(["query_id", "vec_id"])


def _q_triangle_count(sf_dir: str):
    """Exact triangle count of the derived link graph (wedge-check with two
    bucketed joins); the oracle replays the edge CTEs plus the classic
    three-way self-join."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.triangle_count(ds)


def _q_in_degree_histogram(sf_dir: str):
    """In-degree distribution of the derived citation graph (0-degree row
    included closed-form); the oracle replays the shared edge CTEs plus a
    LEFT JOIN COALESCE(0) double GROUP BY."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.in_degree_histogram(ds)


def _q_table_checksum(sf_dir: str):
    """Order-independent uint64 content fingerprint of the documents table
    (anti-entropy verification); oracle replays the chr(31) serialization +
    md5-prefix UBIGINT + HUGEINT wrap-sum mod 2^64."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return analytics.table_checksum(ds, cols)


def _q_phrase_doc_counts(sf_dir: str):
    """Docs per language containing the token bigram 'order fast' (phrase
    search over the shared '[a-z0-9]+' tokenization); oracle replays via
    shifted list_zip equality on regexp_extract_all."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return analytics.phrase_doc_counts(ds, "order", "fast")


def _q_oov_rate_by_lang(sf_dir: str):
    """Per-language out-of-vocabulary token rate against the corpus top-512
    vocabulary (CCNet-style coverage quality filter); oracle rebuilds the
    identical vocabulary (count DESC, token ASC LIMIT 512) and the integer
    ppm on the shared '[a-z0-9]+' lowered tokenization."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return analytics.oov_rate_by_lang(ds, vocab_k=512)


def _q_dup_shingle_rate(sf_dir: str):
    """Per-source duplicated-shingle rate (exact-substring-duplication
    health metric); oracle reuses the shared word-3-shingle CTE body
    (_SHINGLE_CTES) and counts shingle instances appearing in >= 2 docs."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return analytics.dup_shingle_rate(ds)


def _q_doc_boilerplate(sf_dir: str):
    """Per-doc duplicated-shingle ppm (the boilerplate quality column a
    substring-dedup gate filters on; analytics.doc_boilerplate_score);
    oracle reuses the shared word-3-shingle CTE body (_SHINGLE_CTES) and
    resolves dup_shingle_rate's >= 2-doc rule per doc_id."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return analytics.doc_boilerplate_score(ds)


def _q_dup_spans(sf_dir: str):
    """Per-doc duplicated-SPAN token coverage ppm (positional complement of
    doc_boilerplate: how much of the token stream shared 3-shingles blanket;
    analytics.dup_spans); oracle replays positions with a QUALIFY window and
    expands spans via generate_series."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return analytics.dup_spans(ds)


def _q_ks_priority_drift(sf_dir: str):
    """Exact pairwise two-sample Kolmogorov-Smirnov distance between
    order-priority classes' value distributions in integer ppm
    (distribution-drift audit; analytics.ks_priority_drift); oracle
    replays the integer sup-norm |C_a*n_b - C_b*n_a| over the full
    distinct-cents grid with window cumsums."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return analytics.ks_priority_drift(ds)


def _q_sampled_quantile_audit(sf_dir: str):
    """Decile estimates from the deterministic md5-threshold sample vs the
    full data's exact deciles, with true rank error in ppm (the quantile
    member of the sketch-audit family; analytics.sampled_quantile_audit);
    oracle replays the integer rank convention (p*n+999)//1000 with
    ROW_NUMBER over both populations."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return analytics.sampled_quantile_audit(ds)


def _q_compaction_bins(sf_dir: str):
    """Deterministic cumulative bin-packing of (source, lang) partition
    sizes into capacity-100 compaction bins (table-maintenance plan;
    analytics.compaction_bins); oracle replays the exclusive window
    prefix-sum // capacity."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
    return analytics.compaction_bins(ds)


def _q_shingle_containment(sf_dir: str):
    """Directional 3-shingle containment between sources in ppm
    (train/test leakage-direction audit; analytics.shingle_containment);
    oracle joins the shared shingle CTE body back to source and replays
    the self-join whose diagonal is the per-source size."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return analytics.shingle_containment(ds)


def _q_cusum_changepoints(sf_dir: str):
    """Page's one-sided CUSUM level-shift detector over daily event value
    in integer cents (sustained-drift monitor complementing spike_days;
    analytics.cusum_changepoints); oracle walks the same max(0, s+x-mu-k)
    recurrence with a recursive CTE."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    return analytics.cusum_changepoints(ds)


def _q_bigram_surprisal_by_source(sf_dir: str):
    """Char-bigram conditional surprisal per source in integer millibits
    (encoding-health distribution audit; analytics.bigram_surprisal_by_source);
    oracle pairs chars with a lead window over '(?s).' extraction and
    replays the bit_length identity via length(bin(m//n))-1."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return analytics.bigram_surprisal_by_source(ds)


def _q_key_density_audit(sf_dir: str):
    """Key-space integrity audit over o_orderkey: exact distinct, range,
    duplicate rows and density ppm (analytics.key_density_audit)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    return analytics.key_density_audit(ds)


def _q_rolling_median_daily(sf_dir: str):
    """7-row rolling lower median of daily order revenue cents (robust
    trend line; analytics.rolling_median_daily); oracle is DuckDB's
    windowed quantile_disc(0.5), rank-identical to (w+1)//2."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return analytics.rolling_median_daily(ds)


def _q_doclen_deciles_by_source(sf_dir: str):
    """Per-source document-length deciles with the integer rank convention
    (n-1)*k//10 + 1 (analytics.doclen_deciles_by_source)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return analytics.doclen_deciles_by_source(ds)


def _q_value_moments_by_type(sf_dir: str):
    """Exact integer power-sum moments of event value per type (mean,
    population variance, truncated third central moment;
    analytics.value_moments_by_type); oracle replays in HUGEINT."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return analytics.value_moments_by_type(ds)


def _q_order_backlog_daily(sf_dir: str):
    """Daily open-order backlog step function (placed but not fully
    shipped; analytics.order_backlog_daily); oracle replays the +1/-1
    delta grid and a window running sum."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    return analytics.order_backlog_daily(orders, lineitem)


def _q_dow_revenue_profile(sf_dir: str):
    """ISO-weekday revenue seasonality profile with ppm shares
    (analytics.dow_revenue_profile)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return analytics.dow_revenue_profile(ds)


def _q_completeness_audit(sf_dir: str):
    """Per-column null/empty completeness audit over documents
    (analytics.completeness_audit)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return analytics.completeness_audit(ds)


def _q_first_event_after_order(sf_dir: str):
    """Forward as-of join: first event strictly after each order, gap in
    days (relational.first_event_after_order); oracle is the MIN-over-join
    formulation, tie-identical because only ts-derived fields are output."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.first_event_after_order(sf_dir)


def _q_doc_bigram_surprisal_topk(sf_dir: str):
    """Token-bigram LM surprisal top-k (rare TRANSITIONS: word salad that
    passes the unigram screen; analytics.doc_bigram_surprisal_topk);
    oracle pairs tokens with a lead window and replays the bit identity."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return analytics.doc_bigram_surprisal_topk(ds)


def _q_negative_samples(sf_dir: str):
    """Deterministic md5 negative sampling with anti-join against the true
    (customer, part) interactions (analytics.negative_samples)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    n_parts = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"]).count()
    return analytics.negative_samples(orders, lineitem, customer, n_parts)


def _q_span_corruption_plan(sf_dir: str):
    """T5-style deterministic span-corruption plan over the token stream
    (analytics.span_corruption_plan); md5-arithmetic starts replay in SQL."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return analytics.span_corruption_plan(ds)


def _q_two_hop_reach(sf_dir: str):
    """2-hop in-neighborhood size for the top-20 most-cited nodes of the
    shared md5 citation graph (analytics.two_hop_reach); oracle composes
    the shared edge CTE with a double join + COUNT DISTINCT."""
    from distributed_system___ocr_ray.pipelines import analytics

    docs = _docs(sf_dir, ["doc_id"])
    return analytics.two_hop_reach(docs)


def _q_revenue_time_rollup(sf_dir: str):
    """Calendar ROLLUP (year / quarter / month) of order revenue with -1
    for aggregated-out levels (analytics.revenue_time_rollup)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return analytics.revenue_time_rollup(ds)


def _q_token_diversity_by_lang(sf_dir: str):
    """Gini-Simpson token diversity per language in exact integer ppm
    (float-free diversity statistic; analytics.token_simpson_by_lang);
    oracle replays the floor-div ppm over HUGEINT sum-of-squares on the
    shared '[a-z0-9]+' lowered tokenization."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return analytics.token_simpson_by_lang(ds)


def _q_doc_surprisal_topk(sf_dir: str):
    """Top-50 docs by integer-bit unigram surprisal (CCNet-style rarity
    scoring with the corpus as its own LM; analytics.doc_surprisal_topk);
    per-token bits are floor(log2(N/c)) computed exactly as
    bit_length(N//c)-1, which the oracle replays via length(bin(N//c))-1
    -- no float log on either side."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return analytics.doc_surprisal_topk(ds, k=50)


def _q_sentence_stats_by_lang(sf_dir: str):
    """Gopher-style sentence-shape profile per language (mean words per
    sentence, milli floor-div; analytics.sentence_stats_by_lang); both
    sides count non-overlapping '[.!?]+' runs and '[a-z0-9]+' words."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return analytics.sentence_stats_by_lang(ds)


def _q_readability_by_lang(sf_dir: str):
    """Flesch-Kincaid grade per language in integer milli
    (analytics.readability_by_lang); both sides count '[.!?]+' sentences,
    '[a-z0-9]+' words and '[aeiouy]+' vowel-group syllables on the lowered
    text, with per-term floor division as the published convention."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return analytics.readability_by_lang(ds)


def _q_session_paths(sf_dir: str):
    """Per-session event-type trigram counts (path mining one level above
    event_transitions' bigrams); deterministic (ts, event_id) tie order on
    both sides makes the counts exact, not order-dependent."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    return relational.session_paths(events)


def _q_minhash_recall_audit(sf_dir: str):
    """Precision/recall of the MinHash+LSH pair set (est >= 0.6, the
    registered minhash_pairs query) against the exact word-3-gram Jaccard
    >= 0.5 ground truth (the registered ngram_jaccard_pairs query) -- the
    committed evidence for recommending MinHash as the at-scale dedup
    path. Oracle composes the two already-green CTE replays (they share
    the shingle CTE body) and the same floor-div ppm."""
    from distributed_system___ocr_ray.pipelines import analytics

    docs = _docs(sf_dir, ["doc_id", "text"])
    exact = analytics.ngram_jaccard_pairs(docs, threshold=0.5)
    approx = analytics.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.6)
    return analytics.pair_set_audit(exact, approx)


def _q_trimmed_mean_price(sf_dir: str):
    """Exact 5%-trimmed mean order price per priority (robust center
    without a global sort -- grouped _range_offsets rank trimming);
    oracle is the row_number/count window replay on identical cents."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    return relational.trimmed_mean_by_group(
        ds, "o_orderpriority", "o_totalprice", trim_pct=5
    )


def _q_top_revenue_suppliers(sf_dir: str):
    """TPC-H Q15 shape: supplier(s) with the global-max revenue; oracle is
    the grouped-sum + scalar-max replay on identical per-row cents."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.top_revenue_suppliers(sf_dir)


def _q_big_volume_orders(sf_dir: str):
    """TPC-H Q18 shape: orders with total lineitem quantity > 150 (cents
    boundary exact on both sides), price attached via one hash join."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.big_volume_orders(sf_dir)


def _q_hll_error_audit(sf_dir: str):
    """HyperLogLog estimate vs exact distinct users with abs error in ppm;
    oracle composes the register-exact HLL replay with COUNT(DISTINCT)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return analytics.hll_error_audit(events, "user_id")


def _q_bloom_fp_audit(sf_dir: str):
    """Bloom-prefilter FP audit on the shared novelty split; the oracle
    replays the ENTIRE filter in SQL: md5(sha256-hex) halves,
    Kirsch-Mitzenmacher double hashing (h2 forced odd), k=7 probes,
    m = GREATEST(64, 16 * n_distinct_corpus_keys), all-bits-set test."""
    from distributed_system___ocr_ray.pipelines import analytics

    new_ds, corpus_ds = _novelty_split(sf_dir)
    return analytics.bloom_fp_audit(new_ds, corpus_ds)


def _q_cms_error_audit(sf_dir: str):
    """CMS estimate vs exact count for the exact top-20 tokens, with the
    overestimate in ppm; oracle shares the CMS CTE body counter-for-counter
    and adds the exact column."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.cms_error_audit(_docs(sf_dir, ["text"]), _docs(sf_dir, ["text"]))


def _q_dup_size_histogram(sf_dir: str):
    """Histogram of exact-duplicate group sizes (corpus-health profile one
    level finer than dedup_stats), over the corpus with every-7th doc
    repeated once (the documents table is dup-free by construction, so the
    planted rows make the size-2 bucket real on both sides); oracle is the
    two-level GROUP BY over the same UNION ALL."""
    from distributed_system___ocr_ray.pipelines import analytics

    docs = _docs(sf_dir, ["doc_id", "text"])

    def every7(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 == 0))

    planted = docs.union(docs.map_batches(every7, batch_format="pyarrow"))
    return analytics.dup_size_histogram(planted)


def _q_join_size_audit(sf_dir: str):
    """CMS inner-product join-size estimate vs the exact orders|><|lineitem
    cardinality (computed from count products, never the join itself);
    oracle replays every counter and the min-over-rows inner product."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    return analytics.join_size_audit(orders, lineitem, "o_orderkey", "l_orderkey")


def _q_interarrival_quantiles(sf_dir: str):
    """Exact p50/p90 whole-second gaps between consecutive same-user
    events per type; oracle is the LAG + cumulative-count-window replay
    with the same (ts, event_id) tie order."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    return relational.interarrival_quantiles(events)


def _q_rfm_segments(sf_dir: str):
    """Per-customer RFM quartile scores against exact type-1 boundaries;
    oracle recomputes the 9 boundaries via row_number = CEIL(q*n) and the
    same [v > b] scoring."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.rfm_segments(sf_dir)


def _q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix (labeled lang vs heuristic prediction);
    oracle wraps the char-for-char language_id replay and joins the label."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.langid_confusion(_docs(sf_dir, ["lang", "text"]))


def _q_revenue_share_by_nation(sf_dir: str):
    """Nation revenue + ppm share of its region (ratio-to-report window);
    oracle is SUM OVER (PARTITION BY region) with the same floor-div ppm."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.revenue_share_by_nation(sf_dir)


def _q_k_anonymity(sf_dir: str):
    """k-anonymity risk over the (lang, source) quasi-identifier pair at
    k=10; oracle is the two-level GROUP BY with FILTER counters."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.k_anonymity_audit(_docs(sf_dir, ["lang", "source"]), ["lang", "source"], k=10)


def _q_top_prices_with_ties(sf_dir: str):
    """Grouped top-3 WITH TIES (DENSE_RANK semantics) on segment prices;
    oracle is QUALIFY dense_rank() <= 3 on identical integer cents."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.top_prices_with_ties(sf_dir, k=3)


def _q_session_durations(sf_dir: str):
    """Exact p50/p90 session duration seconds + session count (30-min gap,
    session_windows' break rule); oracle is the session replay + MIN/MAX
    per session + cumulative-count quantile read."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return relational.session_duration_quantiles(events)


def _q_trailing_rows_sum(sf_dir: str):
    """ROWS-frame trailing window: per user, each event's value sum over
    its last 5 events in (ts, event_id) order -- the row-counted dual of
    rolling_7d_sum's calendar RANGE frame; shifted-cumsum kernel
    (relational.trailing_rows_sum)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return relational.trailing_rows_sum(ev, k=5)


def _q_source_vocab_overlap(sf_dir: str):
    """Exact vocabulary Jaccard between every source pair (shared distinct
    [a-z0-9]+ tokens) -- the lexical-register similarity matrix;
    cooccurrence triu kernel over token md5s + hash-disjoint size fold
    (analytics.source_vocab_overlap)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.source_vocab_overlap(sf_dir)


def _q_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 flavor: suppliers shipping >15% of some part's total
    quantity, counted per supplier -- both aggregation levels and the
    cross-multiplied compare fold inside ONE partkey-bucketed exchange
    (relational.dominant_suppliers)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.dominant_suppliers(sf_dir, threshold_pct=15)


def _q_out_of_order_audit(sf_dir: str):
    """Streaming disorder audit: adjacent event-time inversions in per-user
    ARRIVAL (event_id) order + worst lateness -- sizes watermark delay
    before event-time windows are trusted; det stream measures 0 disorder
    (relational.out_of_order_audit)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    return relational.out_of_order_audit(ev)


def _q_normalized_dedup(sf_dir: str):
    """C4-style near-exact dedup profile after lowercase/punct-strip/
    ws-collapse normalization -- sizes the gap between raw exact dedup and
    the fuzzy pair family; hash-only shuffle
    (analytics.normalized_dedup_stats)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.normalized_dedup_stats(_docs(sf_dir, ["text"]))


def _q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape: per part of size class 10, the supplier with the
    MIN observed unit price (ties -> min suppkey); broadcast part filter,
    map-side prune, one partkey-bucketed argmin exchange
    (relational.cheapest_supplier_per_part)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.cheapest_supplier_per_part(sf_dir, p_size=10)


def _q_lang_source_chi2(sf_dir: str):
    """Exact-integer chi-squared independence audit between lang and
    source -- the stratification check; all cells (empty included) folded
    with Python ints (analytics.categorical_independence_chi2)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.categorical_independence_chi2(sf_dir)


def _q_shuffle_mix_audit(sf_dir: str):
    """Adjacent same-source rate of the engine's epoch_shuffle order vs the
    exact exchangeability expectation -- "is my shuffle actually mixing";
    range-bucketed adjacency with boundary-row duplication, Python-int ppm
    folds (analytics.shuffle_mix_audit)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.shuffle_mix_audit(sf_dir, epoch=0)


def _q_quality_length_corr(sf_dir: str):
    """Per-lang signed r^2 ppm between n_chars and quality_ppm -- the
    "is my quality filter just a length filter" audit; five-sufficient-
    statistics parallel correlation, Python-int final fold
    (analytics.quality_length_corr)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.quality_length_corr(_docs(sf_dir, ["lang", "text"]))


def _q_encoding_audit(sf_dir: str):
    """Per-source encoding hygiene over the planted corpus (U+FFFD /
    control / non-ASCII plants by doc_id arithmetic, redact_pii's
    discipline); patterns shared char-for-char with the RE2 replay
    (analytics.encoding_audit)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.encoding_audit(sf_dir)


def _q_cross_source_dups(sf_dir: str):
    """MinHash near-dup pair counts per unordered source pair -- the
    provenance contamination matrix; pairs from the unchanged minhash
    plan, endpoint sources resolved by a capped broadcast of the (small
    by construction) endpoint id set over the narrow (doc_id, source)
    projection (analytics.cross_source_dup_matrix)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.cross_source_dup_matrix(sf_dir, threshold=0.6)


def _q_link_prediction_topk(sf_dir: str):
    """Top-20 NON-adjacent pairs of the derived citation graph by
    common-neighbor count (Liben-Nowell/Kleinberg link prediction); wedge
    self-join on the center vertex, packed-pair count exchange, null-test
    anti-join vs the edge set (analytics.common_neighbor_pairs)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.common_neighbor_pairs(_docs(sf_dir, ["doc_id"]), k=20)


def _q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: distinct whitespace tokens first seen
    in the first 25/50/75/100% of the corpus by doc_id, with the doc count
    at each checkpoint; ONE token-domain min-exchange serves every
    checkpoint (analytics.vocab_growth)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.vocab_growth(sf_dir)


def _q_interval_overlap_pairs(sf_dir: str):
    """Per-user count of overlapping activity-interval pairs (half-open
    max(s) < min(e)) -- the double-booking audit over _activity_intervals,
    the third sweep-line consumer next to coverage and peak concurrency;
    counted pair-free via two searchsorted calls per bucket
    (relational.overlap_pairs)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.overlap_pairs(
        _activity_intervals(sf_dir), "user_id", "s_us", "e_us"
    )


def _q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose revenue exceeds 700 ppm of the GLOBAL
    total -- the group-vs-global-scalar HAVING; the oracle repeats the
    cross-multiplied HUGEINT compare and the ppm floor division
    (relational.revenue_concentrated_parts)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.revenue_concentrated_parts(sf_dir, share_ppm=700)


def _q_inactive_high_balance(sf_dir: str):
    """TPC-H Q22 shape: per nation, customers above the positive-balance
    average with NO order since 2000-01-01 -- global-scalar threshold +
    date-filtered anti-join + grouped sum
    (relational.inactive_high_balance)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.inactive_high_balance(sf_dir, cutoff="2000-01-01")


def _q_split_skew_audit(sf_dir: str):
    """Exact TVD ppm between the train and test splits' n_chars
    distributions (256-wide buckets); oracle replays the md5 split and the
    cross-multiplied HUGEINT fold."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.split_skew_audit(_docs(sf_dir, ["doc_id", "n_chars"]))


def _q_first_last_order(sf_dir: str):
    """Per-customer FIRST_VALUE/LAST_VALUE order price under the
    deterministic (day, orderkey) order, with delta; oracle is the
    row_number=1 replay both directions."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.first_last_order(sf_dir)


def _q_supplier_hhi(sf_dir: str):
    """Supplier revenue HHI concentration in ppm (exact integer square
    sums past int64 via Python ints / HUGEINT); one suppkey exchange."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.supplier_hhi(sf_dir)


def _q_decayed_user_value(sf_dir: str):
    """Recency-weighted per-user value: integer cents halved per elapsed
    week (bit shift) relative to the newest event -- exactly replayed by
    the oracle with DuckDB's ``>>`` on the same whole-day age."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return analytics.decayed_user_value(ds, halflife_days=7)


def _q_hybrid_topk(sf_dir: str):
    """Dense+sparse hybrid retrieval fused by integer reciprocal-rank
    fusion; the oracle composes the BM25 replay and the brute-force cosine
    ranking as CTEs and applies the identical ``1e6 // (60 + rank)`` sum
    (_hybrid_sql). Only each system's ordering feeds the fused score."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = analytics.hybrid_topk(
        _docs(sf_dir, ["doc_id", "text"]),
        emb,
        _BM25_QUERIES,
        _query_matrix(sf_dir),
        k=10,
    )
    return _pairs_df(out, {"query_id": "int64", "doc_id": "int64", "rrf_score": "int64"})


def _q_pagerank_top(sf_dir: str):
    """Distributed integer PageRank over the md5-derived citation graph;
    the oracle unrolls the identical edge derivation + rank recurrence as
    CTEs (_pagerank_sql). Top-20 by (rank desc, id asc)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.pagerank_top(ds, iters=4, damping_pct=85, topn=20)


def _q_ccnet_bucket_counts(sf_dir: str):
    """CCNet head/middle/tail split per language: exact integer mean-
    millibit unigram surprisal per doc, per-lang tertile order-statistic
    thresholds, bucket counts (analytics.ccnet_bucket_counts -- Wenzek
    et al. 2020 with the corpus unigram LM standing in for KenLM);
    oracle replays bits, scores, row_number tertiles and the bucket CASE
    digit-for-digit."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    return analytics.ccnet_bucket_counts(ds)


def _q_soft_dedup_weights(sf_dir: str):
    """Soft dedup: per-doc training weight 10^6 // exact-content cluster
    size (analytics.soft_dedup_weights -- reweight instead of drop); the
    oracle joins per-text counts back onto documents with the same
    floor-div ppm."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "text"])
    return analytics.soft_dedup_weights(ds)


def _q_filter_impact_audit(sf_dir: str):
    """Disparate-impact audit of the composed pipeline's quality gate:
    per-lang pass rates at the 400k-ppm threshold, impact ratio vs the
    best-passing lang, four-fifths-rule flag (analytics.
    filter_impact_audit); oracle shares the quality CTEs char-for-char
    and replays the floor-div ratio ladder."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["lang", "text"])
    return analytics.filter_impact_audit(ds)


def _q_texttiling_boundaries(sf_dir: str):
    """TextTiling topic-shift audit: fixed 20-token blocks, integer
    squared-cosine gap scores in ppm, boundaries below 250k
    (analytics.texttiling_boundaries -- Hearst 1997 integerized, purely
    map-side); oracle replays block ids, token-count dots, norms and
    the floor-div cos^2 with the same no-gap/1e6 degenerate pins."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "text"])
    return analytics.texttiling_boundaries(ds)


def _q_quality_neardup_auc(sf_dir: str):
    """Exact Mann-Whitney ROC-AUC of the cheap quality score as a
    near-duplicate predictor, positives = members of a MinHash est
    >= 0.5 pair (analytics.quality_neardup_auc -- the threshold-free
    companion of quality_dup_calibration; MinHash is the default ground
    truth since VERDICT r4 #1, exact ngram is an opt-in audit); oracle
    composes the green minhash-pair CTEs, the shared quality CTEs and
    the histogram cumulative 2U walk with the tie convention."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "text"])
    return analytics.quality_neardup_auc(ds)


def _q_nb_source_classifier(sf_dir: str):
    """Classifier-based domain filtering stand-in: multinomial Naive
    Bayes over source labels, trained on the md5-split 80% train slice
    and scored on the rest, all in whole bits (bit_length floor-log2
    identity) so the oracle replays train counts, smoothing, priors,
    argmin and tie-breaks digit-for-digit (analytics.nb_source_classifier
    -- the fastText-style quality/domain scorer of CCNet/fineweb
    pipelines, self-contained on the corpus's own labels)."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _docs(sf_dir, ["doc_id", "source", "text"])
    return analytics.nb_source_classifier(ds)


def _q_ppr_top(sf_dir: str):
    """Personalized PageRank with the teleport landing on the lang='en'
    slice (analytics.ppr_top -- topic-sensitive authority); oracle is
    the pagerank replay with a per-node CASE teleport, unrolled CTEs."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.ppr_top(sf_dir)


def _q_anf_effective_diameter(sf_dir: str):
    """HyperANF neighbourhood function / effective diameter of the
    citation graph: per-node HLL ball sketches, register-max propagation
    per hop, N(h) and the 90% knee (analytics.anf_effective_diameter --
    Palmer et al. ANF / Boldi et al. HyperANF, the all-pairs-distances-
    in-linear-passes trick); oracle derives the SAME registers from
    first principles (recursive min-hop reachability + grouped HLL with
    the pinned estimator ladder), so the equality proves the
    propagation."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.anf_effective_diameter(ds)


def _q_bfs_levels(sf_dir: str):
    """Min-hop BFS levels from doc 0 over the md5-derived citation graph
    (analytics.bfs_levels): per round a capped broadcast-frontier map-side
    probe (edges never re-shuffle; falls back to the bucketed join past
    the cap) + one bucketed groupby-MIN fold (idempotent -- no visited-set
    broadcast); the oracle unrolls the identical rounds as CTEs."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.bfs_levels(ds, source=0, max_rounds=8)


def _bfs_levels_sql(max_rounds: int = 8) -> str:
    """Unrolled-CTE replay of ``analytics.bfs_levels``: the shared edge
    derivation, then per round a frontier join + UNION ALL + MIN fold --
    identical to the engine's groupby-MIN (an exhausted frontier makes
    later rounds no-ops on both sides)."""
    parts = [
        f"WITH {_edges_ctes()}, ",
        "l0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS level), ",
    ]
    for r in range(max_rounds):
        parts.append(
            f"c{r + 1} AS (SELECT e.dst AS node, CAST({r + 1} AS BIGINT) AS level "
            f"FROM edges e JOIN l{r} f ON f.node = e.src AND f.level = {r}), "
        )
        parts.append(
            f"l{r + 1} AS (SELECT node, MIN(level) AS level FROM "
            f"(SELECT * FROM l{r} UNION ALL SELECT * FROM c{r + 1}) GROUP BY node), "
        )
    body = "".join(parts).rstrip().rstrip(",")
    return f"{body} SELECT node AS doc_id, level FROM l{max_rounds}"


def _q_cluster_balanced_sample(sf_dir: str):
    """Cluster-balanced diversity sample: shared integer Lloyd fit, then
    a deterministic md5-roll quota of 8 from every cluster
    (analytics.cluster_balanced_sample -- coverage-first sampling, the
    opposite lever of density-proportional stratified_sample); oracle =
    the shared assignment CTEs + per-cluster QUALIFY over the same
    md5 roll."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = analytics.cluster_balanced_sample(ds)
    return _pairs_df(out, {"cluster_id": "int64", "vec_id": "int64"})


def _q_kmeans_inertia(sf_dir: str):
    """Per-cluster size + exact integer inertia for the shared Lloyd fit
    (analytics.kmeans_inertia); the oracle folds the winning distance from
    the existing assignment CTEs' dF."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return analytics.kmeans_inertia(ds, k=8, iters=3)


def _kmeans_inertia_sql(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """Inertia on top of the shared assignment CTEs: the per-vector winning
    (d, cid) row from dF, folded per cluster."""
    return _kmeans_assign_ctes(k=k, iters=iters, scale=scale) + (
        "SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        "CAST(SUM(d) AS BIGINT) AS inertia FROM "
        "(SELECT vec_id, cid, d, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d, cid) AS rn FROM dF) WHERE rn = 1 GROUP BY cid"
    )


def _q_rnn_pairs(sf_dir: str):
    """Reciprocal nearest neighbors: mutual cosine top-5 pairs over the
    embeddings table (analytics.rnn_pairs) -- blocked matmul knn against
    the bounded broadcast, then one pair-domain mutuality exchange."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return analytics.rnn_pairs(ds, k=5)


_RNN_PAIRS_SQL = (
    "WITH knn AS (SELECT a.vec_id AS src, b.vec_id AS nbr "
    "FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id "
    "QUALIFY row_number() OVER (PARTITION BY a.vec_id "
    "ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, "
    "b.vec_id) <= 5) "
    "SELECT k1.src AS vec_id_a, k1.nbr AS vec_id_b FROM knn k1 "
    "JOIN knn k2 ON k2.src = k1.nbr AND k2.nbr = k1.src "
    "WHERE k1.src < k1.nbr"
)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means (integer arithmetic end-to-end); the oracle
    unrolls the identical quantize -> md5-seed -> assign -> floor-mean loop
    as CTEs (_kmeans_sql). Output is the float-free cluster fingerprint
    (cluster_id, n_vecs, sum_vec_id)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.kmeans_clusters(ds, k=8, iters=3, scale=1000)


def _q_language_id(sf_dir: str):
    """N-gram-heuristic language identification per document."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.language_id(_docs(sf_dir, ["doc_id", "text"]))


def _q_quality_scores(sf_dir: str):
    """Per-doc quality scoring: length, punctuation, stopword-ratio features (ppm integers)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.quality_scores(_docs(sf_dir, ["doc_id", "text"]))


def _q_fingerprints(sf_dir: str):
    """Per-doc rolling-hash document fingerprint."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def _q_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition signals (top-token / dup-bigram ppm);
    map-side explode + C groupby, replayed in SQL with unnest +
    generate_subscripts + a self-join on adjacent ordinals."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.repetition_stats(_docs(sf_dir, ["doc_id", "text"]))


# canonical BM25 query set (terms drawn from the corpus vocabulary); shared
# verbatim by the engine query and the SQL oracle so idf/tf constants align
_BM25_QUERIES = ["hash join table", "window agg stream", "fast merge sort scan"]
_BM25_K = 10


def _q_bm25_prf_topk(sf_dir: str):
    """Pseudo-relevance-feedback retrieval: round-1 BM25 top-3 feedback
    docs, whole-bit-idf-weighted expansion terms (top-3 new terms per
    query), round-2 BM25 over the expanded set
    (analytics.bm25_prf_topk -- Rocchio-lite two-stage search); the
    oracle replays BOTH rounds and the expansion rule relationally over
    a dynamic (query_id, term) table."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.bm25_prf_topk(_docs(sf_dir, ["doc_id", "text"]), _BM25_QUERIES)
    return _pairs_df(out, {"query_id": "int64", "doc_id": "int64", "score_ppm": "int64"})


def _q_bm25_topk(sf_dir: str):
    """BM25 top-k docs per query (broadcast query set, one corpus pass,
    integer-ppm scores -- see analytics.bm25_topk). The DuckDB oracle
    replays tokenization, df/idf, the per-term ppm floor and the ranked
    QUALIFY top-k exactly."""
    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.bm25_topk(_docs(sf_dir, ["doc_id", "text"]), _BM25_QUERIES, k=_BM25_K)
    return _pairs_df(out, {"query_id": "int64", "doc_id": "int64", "score_ppm": "int64"})


def _q_top_tokens(sf_dir: str):
    """Exact corpus heavy hitters (top-20 whitespace tokens)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.top_tokens(_docs(sf_dir, ["text"]), k=20)


def _q_quality_by_lang(sf_dir: str):
    """Mean quality score per language from map-side quality features."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.quality_by_lang(_docs(sf_dir, ["lang", "text"]))


def _q_median_order_value(sf_dir: str):
    """Exact distributed median via iterative histogram bisection (no global
    sort; pull_limit forces at least one distributed histogram round)."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    v = analytics.exact_quantile(ds, "o_totalprice", q=0.5, pull_limit=1000)
    return pd.DataFrame({"median_cents": [int(np.floor(v * 100 + 0.5))]})


def _q_profile_documents(sf_dir: str):
    """Table profiling: per-column row/null/EXACT-distinct counts over
    documents (analytics.profile_table) -- every column shares ONE
    md5-token-domain exchange instead of a COUNT(DISTINCT) shuffle each."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return analytics.profile_table(
        ds, ["doc_id", "text", "lang", "source", "n_chars"])


_PROFILE_DOCUMENTS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM documents"
    for c in ["doc_id", "text", "lang", "source", "n_chars"]
)


def _q_pps_sample(sf_dir: str):
    """Systematic PPS sample: exactly 500 documents drawn with probability
    proportional to n_chars (analytics.pps_systematic_sample) -- a
    distributed integer prefix sum over the id domain; the draw is pure
    integer arithmetic, replayed verbatim by the SQL window below."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return analytics.pps_systematic_sample(ds, "doc_id", "n_chars", k=500)


_PPS_SAMPLE_SQL = (
    "WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id) AS cw FROM documents), "
    "tot AS (SELECT SUM(CAST(n_chars AS BIGINT)) AS w FROM documents), "
    "h AS (SELECT doc_id, n_chars, CAST((cw * 500) // w - "
    "((cw - n_chars) * 500) // w AS BIGINT) AS n_hits FROM c, tot) "
    "SELECT doc_id, n_chars, n_hits FROM h WHERE n_hits > 0"
)


def _q_weighted_median_price(sf_dir: str):
    """Quantity-weighted exact median of lineitem price
    (analytics.weighted_quantile_cents): histogram bisection on WEIGHT
    rank -- integer-cents bins, exact int64 weight sums, a width-1 bin is
    the answer under any skew; pull_limit=1000 forces distributed rounds."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_quantity"])
    v = analytics.weighted_quantile_cents(
        ds, "l_extendedprice", "l_quantity", q=0.5, pull_limit=1000)
    return pd.DataFrame({"wmedian_cents": [int(v)]})


_WEIGHTED_MEDIAN_PRICE_SQL = (
    "WITH t AS (SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS cents, "
    "CAST(l_quantity AS BIGINT) AS w FROM lineitem), "
    "tot AS (SELECT SUM(w) AS tw FROM t), "
    "c AS (SELECT cents, SUM(w) OVER (ORDER BY cents) AS cw FROM t) "
    "SELECT CAST(MIN(cents) AS BIGINT) AS wmedian_cents FROM c, tot "
    "WHERE cw >= CEIL(0.5 * tw)"
)


def _q_ngram_dedup_keepers(sf_dir: str):
    """Composed near-dup cleaning: exact-recall Jaccard pairs -> connected
    components -> keep the min doc per cluster plus all unclustered docs
    (left anti-join semantics via the bucketed join, scale-safe -- the
    non-keeper set is never collected to the driver)."""
    from distributed_system___ocr_ray.pipelines import analytics
    from distributed_system___ocr_ray.pipelines.relational import bucketed_hash_join

    pairs = analytics.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)
    clusters = analytics.dedup_clusters(pairs)

    def non_keepers(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.not_equal(batch.column("doc_id"), batch.column("cluster_id"))
        return pa.table({"cdoc": batch.column("doc_id").filter(mask)})

    non = clusters.map_batches(non_keepers, batch_format="pyarrow")
    docs = _docs(sf_dir, ["doc_id"])
    # anti-join by NULL test only -- the left-join's float padding of cdoc
    # never has its VALUE compared, so 64-bit ids stay precision-safe
    joined = bucketed_hash_join(docs, non, "doc_id", "cdoc", how="left")

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_null(batch.column("cdoc"))
        return pa.table({"keeper_doc_id": batch.column("doc_id").filter(mask)})

    return joined.map_batches(keep, batch_format="pyarrow")


def _q_training_corpus_counts(sf_dir: str):
    """The COMPOSED training-data prep pipeline end-to-end through the
    engine: extract (flat wrap: identity on tag-free text) -> quality filter
    (quality_ppm >= 400000) -> exact dedup keep-first -> deterministic
    md5 train/val/test split -> per-split counts. Every stage is the real
    operator other queries use individually; the flat wrap keeps the whole
    composition exactly SQL-checkable."""
    import pandas as pd

    from distributed_system___ocr_ray.functions import textstats as ts
    from distributed_system___ocr_ray.pipelines import analytics
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby
    from distributed_system___ocr_ray.sources import wrap

    out = pipeline.extract_dataset(wrap.flat_as_spans(sf_dir), {}, num_partitions=32)

    def flatten(batch: pa.Table) -> pa.Table:
        ids = [int(d.split("-")[1]) for d in batch.column("doc_id").to_pylist()]
        texts = [s[0]["text"] for s in batch.column("spans").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})

    def quality_filter(batch: pd.DataFrame) -> pd.DataFrame:
        ppm = ts.quality_features(batch["text"])["quality_ppm"]
        return batch[ppm.to_numpy() >= 400_000]

    filt = out.map_batches(flatten, batch_format="pyarrow").map_batches(
        quality_filter, batch_format="pandas"
    )
    # dedup via the GROUPS plan, not full-row exact_dedup: the split only
    # needs the surviving ids, and exact_dedup's groupby would shuffle the
    # entire text column on the duplicate-cluster key -- precisely the
    # skewed-key exchange the engine's semifilter exists to avoid (VERDICT
    # r3 "what's wrong" #1). Here only (64-char hash, id) pairs move.
    keepers = (
        analytics.exact_dedup_groups(filt, id_col="doc_id", text_col="text")
        .select_columns(["keeper_doc_id"])
        .rename_columns({"keeper_doc_id": "doc_id"})
    )
    split = analytics.train_val_test_split(keepers)

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["split"].value_counts()
        return pd.DataFrame({"split": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    return tiny_final_groupby(
        split.map_batches(partial_counts, batch_format="pandas"),
        ["split"], [("n", "sum")], ["split", "n_docs"],
    )


def _q_median_value_by_event_type(sf_dir: str):
    """Exact per-event-type median of event value (grouped quantile over a
    bounded key set: one histogram-bisection run per type, no sort)."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    out = analytics.grouped_quantile(
        lambda: rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"]),
        key="event_type",
        col="value",
        q=0.5,
    )
    return pd.DataFrame(
        {
            "event_type": out["event_type"],
            "median_cents": np.floor(out["q_value"] * 100 + 0.5).astype("int64"),
        }
    )


_MEDIAN_BY_TYPE_SQL = (
    "WITH s AS (SELECT event_type, value AS v, "
    "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn, "
    "COUNT(*) OVER (PARTITION BY event_type) AS n FROM events) "
    "SELECT event_type, CAST(FLOOR(v * 100 + 0.5) AS BIGINT) AS median_cents "
    "FROM s WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)"
)


def _q_user_median_value_sketch(sf_dir: str):
    """Per-user approximate median event value via the unbounded-key
    grouped histogram sketch (256 bins; estimate = first-bin lower edge,
    deterministic, replayed bit-for-bit in SQL)."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    out = analytics.grouped_quantile_sketch(ds, key="user_id", col="value", q=0.5).to_pandas()
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype("int64"),
            "approx_median_cents": np.floor(out["q_value"] * 100 + 0.5).astype("int64"),
        }
    )


_USER_MEDIAN_SKETCH_SQL = (
    # same float64 arithmetic as the engine: w = (hi-lo)/256, bin =
    # clip(floor((v-lo)/w)), estimate = lo + first_bin(cum >= ceil(q*n)) * w
    "WITH m AS (SELECT CAST(MIN(value) AS DOUBLE) lo, CAST(MAX(value) AS DOUBLE) hi FROM events), "
    "b AS (SELECT user_id, LEAST(GREATEST(CAST(FLOOR((CAST(value AS DOUBLE) - m.lo) / "
    "(CASE WHEN m.hi > m.lo THEN (m.hi - m.lo) / 256.0 ELSE 1.0 END)) AS BIGINT), 0), 255) AS bin "
    "FROM events, m), "
    "c AS (SELECT user_id, bin, COUNT(*) cnt FROM b GROUP BY 1, 2), "
    "cum AS (SELECT user_id, bin, SUM(cnt) OVER (PARTITION BY user_id ORDER BY bin) AS cum, "
    "SUM(cnt) OVER (PARTITION BY user_id) AS n FROM c), "
    "pick AS (SELECT user_id, MIN(bin) AS bin FROM cum WHERE cum >= CEIL(0.5 * n) GROUP BY 1) "
    "SELECT p.user_id, CAST(FLOOR((m.lo + p.bin * "
    "(CASE WHEN m.hi > m.lo THEN (m.hi - m.lo) / 256.0 ELSE 1.0 END)) * 100 + 0.5) AS BIGINT) "
    "AS approx_median_cents FROM pick p, m"
)


def _q_tfidf_keywords(sf_dir: str):
    """Top-3 tf-idf keywords per document (integer ppm, term-ascending tie
    break); df pass + broadcast idf + batch-local per-doc top-k."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.tfidf_keywords(_docs(sf_dir, ["doc_id", "text"]), k=3)


_TFIDF_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
    "AS term FROM documents), "
    "tf AS (SELECT doc_id, term, COUNT(*) tf FROM tok GROUP BY 1, 2), "
    "df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM tok GROUP BY 1), "
    "n AS (SELECT COUNT(*) n FROM documents), "
    "sc AS (SELECT tf.doc_id, tf.term, CAST(FLOOR(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)) "
    "* 1000000.0 + 0.5) AS BIGINT) AS score_ppm FROM tf JOIN df USING(term), n) "
    "SELECT doc_id, term, score_ppm FROM sc "
    "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, term) <= 3"
)


def _q_debounce_events(sf_dir: str):
    """Stream debounce: per (user_id, event_type), ordered by (ts,
    event_id), drop events within 24 h of their predecessor (pure-LAG
    semantics so the SQL window replays it exactly; 24 h drops ~36% of the
    synthetic events, so the filter is meaningfully exercised)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    return relational.debounce_events(ds, min_gap_seconds=86_400)


_DEBOUNCE_SQL = (
    "WITH s AS (SELECT event_id, user_id, event_type, ts, "
    "LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS pts "
    "FROM events) "
    "SELECT event_id, user_id, event_type FROM s "
    "WHERE pts IS NULL OR ts - pts >= INTERVAL 86400 SECOND"
)


def _q_corpus_report(sf_dir: str):
    """Dataset-card summary in one row: doc/distinct counts, exact dup rate,
    whitespace-token quantiles (p50/p90/p99 via the histogram-bisection
    exact_quantile -- no global sort), and mean quality ppm. Ratio math is
    pure integer (``(2s+n)//(2n)`` == floor(s/n+0.5)) so the compare stays
    exact at any corpus size (a float64 mean would lose integer exactness
    past 2^53 total ppm)."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from distributed_system___ocr_ray.functions import textstats as ts
    from distributed_system___ocr_ray.pipelines import analytics

    def slim(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_ws_tokens": ts.token_counts(batch["text"])["n_ws_tokens"].values,
                "quality_ppm": ts.quality_features(batch["text"])["quality_ppm"].values,
            }
        )

    # slim 2-int-column projection, materialized once and reused by the
    # three quantile runs + the aggregate (at true scale you would skip the
    # materialize and pay re-reads; at report scale this is the cheaper and
    # still bounded choice -- 16 B/row, object-store spillable)
    s = (
        _docs(sf_dir, ["text"])
        .map_batches(slim, batch_format="pandas")
        .materialize()
    )
    agg = s.aggregate(Count(alias_name="n"), Sum("quality_ppm", alias_name="sq"))
    n, sq = int(agg["n"]), int(agg["sq"])
    quantiles = {
        f"tok_p{int(q * 100)}": int(analytics.exact_quantile(s, "n_ws_tokens", q=q))
        for q in (0.5, 0.9, 0.99)
    }

    groups = analytics.exact_dedup_groups(_docs(sf_dir, ["doc_id", "text"]))
    n_distinct = groups.count()

    return pd.DataFrame(
        [
            {
                "n_docs": n,
                "n_distinct": n_distinct,
                "dup_ppm": (2 * (n - n_distinct) * 1_000_000 + n) // (2 * n),
                **quantiles,
                "mean_quality_ppm": (2 * sq + n) // (2 * n),
            }
        ]
    ).astype("int64")


def _corpus_report_sql() -> str:
    return (
        f"WITH {_quality_ctes()}, "
        f"base AS (SELECT n_ws_tokens, {_QPPM_EXPR} AS qppm FROM r), "
        "tq AS (SELECT n_ws_tokens AS v, row_number() OVER (ORDER BY n_ws_tokens) rn, "
        "COUNT(*) OVER () n FROM base), "
        "c AS (SELECT COUNT(*) AS n, COUNT(DISTINCT text) AS d FROM documents), "
        "qa AS (SELECT SUM(qppm) AS sq, COUNT(*) AS n FROM base) "
        "SELECT c.n AS n_docs, c.d AS n_distinct, "
        "CAST((2 * (c.n - c.d) * 1000000 + c.n) // (2 * c.n) AS BIGINT) AS dup_ppm, "
        "(SELECT v FROM tq WHERE rn = CAST(CEIL(0.50 * n) AS BIGINT)) AS tok_p50, "
        "(SELECT v FROM tq WHERE rn = CAST(CEIL(0.90 * n) AS BIGINT)) AS tok_p90, "
        "(SELECT v FROM tq WHERE rn = CAST(CEIL(0.99 * n) AS BIGINT)) AS tok_p99, "
        "CAST((2 * qa.sq + qa.n) // (2 * qa.n) AS BIGINT) AS mean_quality_ppm "
        "FROM c, qa"
    )


def _q_ingest_increment_counts(sf_dir: str):
    """The daily-ingest COMPOSITION end-to-end through the engine
    (compose.ingest_increment): two increments (doc_id % 3 == 1, then == 2)
    flow through hygiene (quality + repetition gates) -> in-batch exact
    dedup -> novelty vs the corpus grown by day 1 -> versioned append.
    Returns the per-day stage counts; the oracle replays every gate and the
    cross-day NOT IN with the shared SQL builders."""
    import shutil
    import tempfile

    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import compose

    corpus_dir = tempfile.mkdtemp(prefix="graft_ingest_") + "/corpus"
    try:
        rows = []
        for day in (1, 2):
            def pick(batch: pa.Table, d=day) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 3 == d))

            inc = _docs(sf_dir, ["doc_id", "text"]).map_batches(pick, batch_format="pyarrow")
            s = compose.ingest_increment(inc, corpus_dir)
            rows.append(
                {
                    "day": day,
                    "rows_in": s["rows_in"],
                    "after_hygiene": s["after_hygiene"],
                    "after_dedup": s["after_dedup"],
                    "after_novelty": s["after_novelty"],
                    "corpus_rows": s["corpus_rows"],
                }
            )
        return pd.DataFrame(rows).astype("int64")
    finally:
        shutil.rmtree(corpus_dir.rsplit("/", 1)[0], ignore_errors=True)


def _ingest_increment_sql(min_q: int = 400_000, max_top: int = 600_000) -> str:
    """SQL replay of _q_ingest_increment_counts: the hygiene gates reuse the
    quality CTE builder + the repetition top-token CTE, dedup is COUNT
    (DISTINCT text), and day-2 novelty is NOT IN day-1's kept texts."""
    return (
        f"WITH {_quality_ctes()}, "
        "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^ \t\n\f\r]+')) "
        "AS tok FROM documents), "
        "cnt AS (SELECT doc_id, tok, COUNT(*) c FROM tok GROUP BY 1, 2), "
        "top AS (SELECT doc_id, CAST(FLOOR(MAX(c) * 1e6 / SUM(c) + 0.5) AS BIGINT) "
        "top_token_ppm FROM cnt GROUP BY 1), "
        "hyg AS (SELECT r.doc_id, d.text FROM r JOIN documents d USING(doc_id) "
        f"LEFT JOIN top USING(doc_id) WHERE {_QPPM_EXPR} >= {min_q} "
        f"AND COALESCE(top.top_token_ppm, 0) <= {max_top}), "
        "d1 AS (SELECT * FROM hyg WHERE doc_id % 3 = 1), "
        "d2 AS (SELECT * FROM hyg WHERE doc_id % 3 = 2), "
        "n1 AS (SELECT COUNT(DISTINCT text) AS novel FROM d1), "
        "n2 AS (SELECT COUNT(DISTINCT text) AS novel FROM d2 "
        "WHERE text NOT IN (SELECT text FROM d1)) "
        "SELECT 1 AS day, "
        "(SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 1) AS rows_in, "
        "(SELECT COUNT(*) FROM d1) AS after_hygiene, "
        "(SELECT COUNT(DISTINCT text) FROM d1) AS after_dedup, "
        "(SELECT novel FROM n1) AS after_novelty, "
        "(SELECT novel FROM n1) AS corpus_rows "
        "UNION ALL SELECT 2, "
        "(SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 2), "
        "(SELECT COUNT(*) FROM d2), "
        "(SELECT COUNT(DISTINCT text) FROM d2), "
        "(SELECT novel FROM n2), "
        "(SELECT novel FROM n1) + (SELECT novel FROM n2)"
    )


def _q_media_metadata(sf_dir: str):
    """Typed metadata over the flagship media store. The store is md5
    arithmetic (corpus.build_media_store), so the DuckDB oracle recomputes
    every payload's size/dims/blocks independently: GLY1 width = 6 * len
    (truth sentence), byte size = 8 + ceil(42n/8) (minus the 3-byte corrupt
    truncation), MPDF1 byte size = 5 + len of the sorted-keys JSON body,
    corrupt pdfs parse as 'unknown'. Nullable metadata is canonicalized to
    -1 so the string compare is representation-stable."""
    import pyarrow.compute as pc
    import ray.data as rd

    from distributed_system___ocr_ray import corpus
    from distributed_system___ocr_ray.sources import wrap
    from distributed_system___ocr_ray.stages import multimodal

    store = corpus.build_media_store(n_img=wrap.DEFAULT_N_IMG, n_pdf=wrap.DEFAULT_N_PDF, seed=42)
    out = multimodal.media_metadata(rd.from_arrow(store))

    def canon(batch: pa.Table) -> pa.Table:
        cols = {"media_ref": batch.column("media_ref"), "media_kind": batch.column("media_kind"),
                "n_bytes": batch.column("n_bytes")}
        for c in ("width", "height", "n_blocks"):
            cols[c] = pc.fill_null(pc.cast(batch.column(c), pa.int64()), -1)
        return pa.table(cols)

    return out.map_batches(canon, batch_format="pyarrow")


def _q_dangling_ref_audit(sf_dir: str):
    """Pre-run media-ref integrity audit over the interleaved corpus: a
    broadcast anti-join of every image/pdf span ref against the store's
    ref set, per-kind totals + distinct counts (analytics.
    dangling_ref_audit). The wrap's ~5% broken-ref plan is doc_id
    arithmetic, so the oracle replays exactly which refs dangle from
    documents.parquet alone."""
    from distributed_system___ocr_ray.pipelines import analytics
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, store = wrap.interleaved_from_documents(sf_dir)
    exploded = pipeline.exploded_dataset(ds, num_partitions=32)
    return analytics.dangling_ref_audit(
        exploded, store.column("media_ref").to_pylist())


def _q_orphan_media_audit(sf_dir: str):
    """Inverse integrity audit: store payloads never referenced by any
    span (GC candidates before a store rewrite). Oracle replays the
    wrap's non-broken ref arithmetic as a distinct-index set per kind and
    subtracts from the full store ranges."""
    from distributed_system___ocr_ray.pipelines import analytics
    from distributed_system___ocr_ray.pipelines import extract as pipeline
    from distributed_system___ocr_ray.sources import wrap

    ds, store = wrap.interleaved_from_documents(sf_dir)
    exploded = pipeline.exploded_dataset(ds, num_partitions=32)
    return analytics.orphan_media_audit(exploded, store)


def _q_media_dedup_groups(sf_dir: str):
    """Exact media dedup over the flagship payload store plus a CDN-mirror
    replica of every 3rd payload (same bytes under a second ref scheme --
    the standard web-corpus shape: re-hosted logos/figures). Engine hashes
    payloads map-side and ships only digest+ref (analytics.
    media_dedup_groups); the oracle replays payload CONTENT symbolically
    from the md5-deterministic store construction and groups on it."""
    import ray.data as rd

    from distributed_system___ocr_ray import corpus
    from distributed_system___ocr_ray.sources import wrap

    store = corpus.build_media_store(
        n_img=wrap.DEFAULT_N_IMG, n_pdf=wrap.DEFAULT_N_PDF, seed=42)
    refs = store.column("media_ref").to_pylist()
    payloads = store.column("payload").to_pylist()
    m_refs, m_payloads = [], []
    for r, p in zip(refs, payloads):
        if int(r[-6:]) % 3 == 0:
            m_refs.append("mirror://" + r[len("mem://"):])
            m_payloads.append(p)
    full = pa.table({
        "media_ref": pa.array(refs + m_refs, pa.string()),
        "payload": pa.array(payloads + m_payloads, pa.binary()),
    })
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.media_dedup_groups(rd.from_arrow(full))


def _q_skyline_orders(sf_dir: str):
    """Pareto frontier of orders on (price higher-better, date later-better).
    Engine: per-batch local skyline (vectorized price-desc sweep) then one
    tiny single-block merge — the skyline-of-union == skyline-of-local-
    skylines property means the shuffle moves only frontier rows. Money as
    integer cents, dates as epoch days, exact on both sides."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    return analytics.skyline_orders(ds)


_SKYLINE_ORDERS_SQL = (
    "WITH o AS (SELECT o_orderkey, "
    "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents, "
    "CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS date_day FROM orders) "
    "SELECT o_orderkey, price_cents, date_day FROM o a "
    "WHERE NOT EXISTS (SELECT 1 FROM o b "
    "WHERE b.price_cents >= a.price_cents AND b.date_day >= a.date_day "
    "AND (b.price_cents > a.price_cents OR b.date_day > a.date_day)) "
    "ORDER BY o_orderkey"
)


def _read_narrow(path: str, columns, filter=None, rows_per_block: int = 4_000_000):
    """Size-derived read for NARROW projections (key/audit scans): Ray's
    default parallelism heuristic splits by cpu count, which turns a
    few-MB key column into 64 kilobyte blocks and makes every downstream
    stage task-scheduling-bound (measured: the 3-relation fk audit fell
    from 13.8s to 2.7s at sf0.1 on this change alone). Deriving block
    count from the row count keeps blocks ~tens of MB at any scale --
    the same rows-per-partition rule as relational.derive_buckets."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    n = _pq.ParquetFile(path).metadata.num_rows
    nb = max(1, min(512, n // rows_per_block + 1))
    return rd.read_parquet(path, columns=columns, filter=filter, override_num_blocks=nb)


def _q_mode_event_type(sf_dir: str):
    """Grouped mode: each user's most frequent event type (ties -> smallest
    type string). Engine: per-batch partial counts -> one key-domain hash
    exchange -> vectorized per-bucket argmax (relational.mode_by_key)."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "event_type"])
    return relational.mode_by_key(ds, "user_id", "event_type")


_MODE_EVENT_TYPE_SQL = (
    "WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY 1, 2), "
    "r AS (SELECT user_id, event_type, n, ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rk FROM c) "
    "SELECT user_id, event_type AS mode_value, n AS n_rows FROM r WHERE rk = 1"
)


def _q_fk_orphan_audit(sf_dir: str):
    """Referential-integrity audit after simulated parent purges: orphaned
    lineitems when only finished orders survive, orphaned orders/events when
    only BUILDING-segment customers survive. Parent filters are pushed into
    the parquet read (row-group stats); all three anti-joins share ONE
    key-domain exchange (relational.orphan_audit_multi) — no broadcast,
    no row shuffle, one groupby barrier total."""
    import pyarrow.dataset as pds

    from distributed_system___ocr_ray.pipelines import relational

    lineitem = _read_narrow(f"{sf_dir}/lineitem.parquet", ["l_orderkey"])
    orders_f = _read_narrow(
        f"{sf_dir}/orders.parquet", ["o_orderkey"],
        filter=(pds.field("o_orderstatus") == "F"),
    )
    orders = _read_narrow(f"{sf_dir}/orders.parquet", ["o_custkey"])
    events = _read_narrow(f"{sf_dir}/events.parquet", ["user_id"])
    cust_b = _read_narrow(
        f"{sf_dir}/customer.parquet", ["c_custkey"],
        filter=(pds.field("c_mktsegment") == "BUILDING"),
    )
    return relational.orphan_audit_multi(
        [
            (lineitem, "l_orderkey", orders_f, "o_orderkey", "lineitem->orders[F]"),
            (orders, "o_custkey", cust_b, "c_custkey", "orders->customer[BUILDING]"),
            (events, "user_id", cust_b, "c_custkey", "events->customer[BUILDING]"),
        ]
    )


_FK_ORPHAN_AUDIT_SQL = (
    "SELECT 'lineitem->orders[F]' AS relation, "
    "CAST(COUNT(*) AS BIGINT) AS n_child_rows, "
    "CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows, "
    "CAST(COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l.l_orderkey END) AS BIGINT) "
    "AS n_orphan_keys "
    "FROM lineitem l LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o "
    "ON l.l_orderkey = o.o_orderkey "
    "UNION ALL SELECT 'orders->customer[BUILDING]', CAST(COUNT(*) AS BIGINT), "
    "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o.o_custkey END) AS BIGINT) "
    "FROM orders o LEFT JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c "
    "ON o.o_custkey = c.c_custkey "
    "UNION ALL SELECT 'events->customer[BUILDING]', CAST(COUNT(*) AS BIGINT), "
    "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
    "CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN e.user_id END) AS BIGINT) "
    "FROM events e LEFT JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c "
    "ON e.user_id = c.c_custkey"
)


def _q_corr_qty_price(sf_dir: str):
    """Pearson correlation between lineitem quantity and extended price —
    a 6-number exact-integer reduction with zero shuffle
    (analytics.corr_stats); ONE shared float64 expression finishes it."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _read_narrow(f"{sf_dir}/lineitem.parquet", ["l_quantity", "l_extendedprice"])
    return analytics.corr_stats(ds, "l_quantity", "l_extendedprice")


_CORR_QTY_PRICE_SQL = (
    "WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT)) AS sx, "
    "SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT)) AS sy, "
    "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT) * "
    "CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT)) AS sxy, "
    "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT) * "
    "CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT)) AS sx2, "
    "SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT) * "
    "CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT)) AS sy2 FROM lineitem) "
    "SELECT n, CAST(sx AS BIGINT) AS sum_x_cents, CAST(sy AS BIGINT) AS sum_y_cents, "
    "CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE) / "
    "(sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)) * sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))) "
    "* 1e6 + 0.5) AS BIGINT) AS corr_ppm FROM s"
)


def _q_forward_fill_daily(sf_dir: str):
    """Calendar densification + forward fill: per user, the last observed
    event value of each day carried forward across the user's own day span
    (relational.forward_fill_daily); one activity-domain exchange, one
    vectorized searchsorted fill per bucket."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "value", "event_id"])
    return relational.forward_fill_daily(ds, "user_id", "ts", "value", "event_id")


_FORWARD_FILL_DAILY_SQL = (
    "WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents, ts, event_id FROM events), "
    "o AS (SELECT user_id, day, cents FROM (SELECT user_id, day, cents, "
    "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) "
    "AS rn FROM e) WHERE rn = 1), "
    "s AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM o GROUP BY 1), "
    "g AS (SELECT user_id, UNNEST(generate_series(d0, d1)) AS day FROM s), "
    "j AS (SELECT g.user_id, g.day, o.cents FROM g LEFT JOIN o "
    "ON g.user_id = o.user_id AND g.day = o.day) "
    "SELECT user_id, day, CAST(last_value(cents IGNORE NULLS) OVER "
    "(PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS BIGINT) AS value_cents, "
    "CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed FROM j"
)


def _q_scd2_history(sf_dir: str):
    """SCD type-2 compaction: per user, the daily last-observed value
    stream collapsed into change intervals (valid_from_day, valid_to_day,
    value_cents), open interval marked -1 (relational.scd2_history);
    shares forward_fill_daily's map-side daily-argmax collapse."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "value", "event_id"])
    return relational.scd2_history(ds, "user_id", "ts", "value", "event_id")


_SCD2_HISTORY_SQL = (
    "WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents, ts, event_id FROM events), "
    "o AS (SELECT user_id, day, cents FROM (SELECT user_id, day, cents, "
    "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) "
    "AS rn FROM e) WHERE rn = 1), "
    "c AS (SELECT user_id, day, cents, LAG(cents) OVER "
    "(PARTITION BY user_id ORDER BY day) AS prev FROM o), "
    "k AS (SELECT user_id, day AS valid_from_day, cents FROM c "
    "WHERE prev IS NULL OR cents != prev) "
    "SELECT user_id, valid_from_day, COALESCE(LEAD(valid_from_day) OVER "
    "(PARTITION BY user_id ORDER BY valid_from_day), CAST(-1 AS BIGINT)) "
    "AS valid_to_day, cents AS value_cents FROM k"
)


def _q_pit_value_join(sf_dir: str):
    """Point-in-time join: each purchase event picks the SCD2 dimension
    version valid at event time (relational.pit_value_join) -- the
    leakage-safe feature-store join, composed from the scd2_history build
    plus the bucketed as-of join."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.pit_value_join(sf_dir, event_type="purchase")


_PIT_VALUE_JOIN_SQL = (
    "WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents, ts, event_id FROM events), "
    "o AS (SELECT user_id, day, cents FROM (SELECT user_id, day, cents, "
    "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) "
    "AS rn FROM e) WHERE rn = 1), "
    "c AS (SELECT user_id, day, cents, LAG(cents) OVER "
    "(PARTITION BY user_id ORDER BY day) AS prev FROM o), "
    "k AS (SELECT user_id, day AS valid_from_day, cents FROM c "
    "WHERE prev IS NULL OR cents != prev), "
    "v AS (SELECT user_id, valid_from_day, COALESCE(LEAD(valid_from_day) OVER "
    "(PARTITION BY user_id ORDER BY valid_from_day), CAST(-1 AS BIGINT)) "
    "AS valid_to_day, cents AS value_cents FROM k), "
    "p AS (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 "
    "AS day FROM events WHERE event_type = 'purchase') "
    "SELECT p.event_id, p.user_id, p.day, v.value_cents FROM p JOIN v "
    "ON v.user_id = p.user_id AND v.valid_from_day <= p.day "
    "AND (v.valid_to_day = -1 OR p.day < v.valid_to_day)"
)


def _q_order_part_list(sf_dir: str):
    """Grouped ordered collect: per order, the sorted distinct part keys
    joined with ',' (relational.collect_sorted_list); map-side distinct
    collapse, one pair-domain exchange, one vectorized join per bucket."""
    from distributed_system___ocr_ray.pipelines import relational

    # smaller blocks than the narrow-scan default: the string-join reduce
    # parallelism equals the block count feeding the groupby, and this
    # kernel is compute-bound (measured 7.0 s single-block vs ~1.3 s at 6
    # blocks on identical sf0.1 input)
    ds = _read_narrow(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_partkey"],
        rows_per_block=100_000,
    )
    return relational.collect_sorted_list(ds, "l_orderkey", "l_partkey", "parts_csv")


_ORDER_PART_LIST_SQL = (
    "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
    "SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_values, "
    "STRING_AGG(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS parts_csv "
    "FROM d GROUP BY l_orderkey"
)


def _q_rolling_7d_sum(sf_dir: str):
    """Trailing 7-day range-window spend per user and active day
    (relational.rolling_range_sum); map-side daily-sum collapse, one
    key-domain exchange, prefix-sum + searchsorted windows per bucket --
    no calendar densify."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "value"])
    return relational.rolling_range_sum(ds, "user_id", "ts", "value", window_days=7)


_ROLLING_7D_SUM_SQL = (
    "WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events), "
    "d AS (SELECT user_id, day, SUM(cents) AS c FROM e GROUP BY 1, 2) "
    "SELECT user_id, day, CAST(c AS BIGINT) AS day_cents, "
    "CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY day "
    "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_window_cents "
    "FROM d"
)


def _q_conversion_within(sf_dir: str):
    """Click->purchase-within-7-days conversion attribution per user
    (relational.conversion_within): map-side projection keeps only the
    two event types, one key-domain exchange, then two searchsorted
    calls over a window-padded ordinal composite answer every click at
    once -- no per-key loop, no pair materialization."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "event_type"])
    return relational.conversion_within(
        ds, "user_id", "ts", "event_type", "click", "purchase",
        window_us=7 * 86_400_000_000,
    )


_CONVERSION_WITHIN_SQL = (
    "WITH c AS (SELECT user_id, epoch_us(ts) AS t, ROW_NUMBER() OVER () AS rid "
    "FROM events WHERE event_type = 'click'), "
    "p AS (SELECT user_id, epoch_us(ts) AS t FROM events "
    "WHERE event_type = 'purchase'), "
    "per AS (SELECT c.user_id, c.rid, COUNT(p.t) AS m FROM c LEFT JOIN p "
    "ON p.user_id = c.user_id AND p.t > c.t AND p.t <= c.t + 604800000000 "
    "GROUP BY c.user_id, c.rid) "
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_from, "
    "CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted, "
    "CAST(SUM(m) AS BIGINT) AS n_pairs FROM per GROUP BY user_id"
)


def _q_order_rank_global(sf_dir: str):
    """Global 0-based RANK() of every order by total price
    (relational.global_rank): two narrow passes derive range bins and
    their prefix-sum offsets, then ONE range exchange ranks each bin
    locally -- the total-order window with no all-to-all sort."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"])
    return relational.global_rank(ds, "o_totalprice", "o_orderkey")


_ORDER_RANK_GLOBAL_SQL = (
    "SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS value_cents, "
    "CAST(RANK() OVER (ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) - 1 "
    "AS BIGINT) AS rank0 FROM orders"
)


def _q_order_decile_stats(sf_dir: str):
    """Equi-depth deciles of order totals (relational.global_ntile):
    NTILE(10) over (price, orderkey) without a global sort -- the shared
    range-histogram prefix sum makes every row's global row number
    computable inside its value bin; per-tile partials merge in one tiny
    final block."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_totalprice"])
    return relational.global_ntile(ds, "o_totalprice", "o_orderkey", n_tiles=10)


_ORDER_DECILE_STATS_SQL = (
    "WITH r AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents, "
    "NTILE(10) OVER (ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), "
    "o_orderkey) AS tile FROM orders) "
    "SELECT CAST(tile AS BIGINT) AS tile, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "MIN(cents) AS min_cents, MAX(cents) AS max_cents, "
    "CAST(SUM(cents) AS BIGINT) AS sum_cents FROM r GROUP BY tile"
)


def _q_spike_days(sf_dir: str):
    """Daily spend-anomaly flags (relational.spike_days): a day spikes
    when its total beats 2x the trailing-28-observed-day mean, compared
    in cross-multiplied integer form -- bounded day domain, single-block
    prefix-sum window."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["ts", "value"])
    return relational.spike_days(ds, "ts", "value")


_SPIKE_DAYS_SQL = (
    "WITH d AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS rev FROM events GROUP BY 1), "
    "w AS (SELECT day, rev, COALESCE(SUM(rev) OVER (ORDER BY day "
    "ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING), 0) AS sp, "
    "COUNT(rev) OVER (ORDER BY day ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING) "
    "AS np FROM d) "
    "SELECT day, CAST(rev AS BIGINT) AS rev_cents, "
    "CAST(CASE WHEN np >= 7 AND rev * np > 2 * sp THEN 1 ELSE 0 END AS BIGINT) "
    "AS spike FROM w"
)


def _q_fulfillment_latency(sf_dir: str):
    """Fulfillment SLA: exact p50/p90 of (last ship day - order day) per
    priority (relational.fulfillment_latency); one orderkey exchange
    resolves per-order max ship day, the bounded (priority, latency)
    count table is the quantile's sufficient statistic."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.fulfillment_latency(sf_dir)


_FULFILLMENT_LATENCY_SQL = (
    "WITH per AS (SELECT o.o_orderpriority AS pri, "
    "MAX(CAST(FLOOR(epoch(l.l_shipdate)) AS BIGINT) // 86400) - "
    "CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS lat "
    "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate), "
    "c AS (SELECT pri, lat, COUNT(*) AS n FROM per GROUP BY 1, 2), "
    "w AS (SELECT pri, lat, SUM(n) OVER (PARTITION BY pri ORDER BY lat) AS cum, "
    "SUM(n) OVER (PARTITION BY pri) AS tot FROM c) "
    "SELECT pri AS o_orderpriority, CAST(MAX(tot) AS BIGINT) AS n_orders, "
    "CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN lat END) AS BIGINT) AS p50_days, "
    "CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN lat END) AS BIGINT) AS p90_days "
    "FROM w GROUP BY pri"
)


def _q_key_skew(sf_dir: str):
    """Join-key skew pre-flight on lineitem.l_suppkey: exact group-size
    max/p50/p99 off a (size, n_keys) count table — the salting-decision
    diagnostic. Oracle: double GROUP BY + cumulative-count windows."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/lineitem.parquet", ["l_suppkey"])
    return relational.key_skew_report(ds, "l_suppkey")


def _q_weekly_revenue_wow(sf_dir: str):
    """Week-over-week revenue deltas (relational.period_over_period):
    per-batch period collapse, bounded-domain single-block LAG; integer
    cents end-to-end, gap weeks skipped like SQL LAG."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/orders.parquet",
                      ["o_orderdate", "o_totalprice"])
    return relational.period_over_period(ds, "o_orderdate", "o_totalprice",
                                         period_days=7)


_WEEKLY_REVENUE_WOW_SQL = (
    "WITH w AS (SELECT CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 604800 "
    "AS period, SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS rev "
    "FROM orders GROUP BY 1) "
    "SELECT period, CAST(rev AS BIGINT) AS rev_cents, "
    "CAST(COALESCE(LAG(rev) OVER (ORDER BY period), 0) AS BIGINT) AS prev_cents, "
    "CAST(rev - COALESCE(LAG(rev) OVER (ORDER BY period), 0) AS BIGINT) "
    "AS delta_cents FROM w"
)


def _q_order_value_gini(sf_dir: str):
    """Revenue concentration: exact Gini coefficient of order totals in
    ppm (relational.gini_ppm) -- rank formulation over the shared range
    histogram; integer arithmetic end-to-end, HUGEINT on the SQL side."""
    import pandas as pd

    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/orders.parquet", ["o_totalprice"])
    return pd.DataFrame({"gini_ppm": [relational.gini_ppm(ds, "o_totalprice")]})


_ORDER_VALUE_GINI_SQL = (
    "WITH r AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c, "
    "ROW_NUMBER() OVER (ORDER BY CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) "
    "AS rn FROM orders), "
    "s AS (SELECT SUM(CAST(rn AS HUGEINT) * c) AS s2, "
    "SUM(CAST(c AS HUGEINT)) AS s1, CAST(COUNT(*) AS HUGEINT) AS n FROM r) "
    "SELECT CAST((2*s2 - (n+1)*s1) * 1000000 // (n * s1) AS BIGINT) "
    "AS gini_ppm FROM s"
)


def _q_approx_users_by_type(sf_dir: str):
    """Grouped HLL: approximate distinct users per event_type
    (sketches.approx_distinct_by_key, p=10) -- one mergeable register
    array per (batch, type), KB-sized exchange, estimator replayed
    bit-exactly by the DuckDB oracle."""
    from distributed_system___ocr_ray.functions.sketches import approx_distinct_by_key

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["event_type", "user_id"])
    return approx_distinct_by_key(ds, "event_type", "user_id", p=10)


def _q_new_users_daily(sf_dir: str):
    """First-touch growth curve: new users per day + cumulative distinct
    users (relational.new_users_daily); per-key MIN collapse, one
    key-domain exchange, bounded-day-domain final cumsum."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts"])
    return relational.new_users_daily(ds)


_NEW_USERS_DAILY_SQL = (
    "WITH f AS (SELECT user_id, MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) "
    "AS day FROM events GROUP BY 1), "
    "d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY 1) "
    "SELECT day, new_users, CAST(SUM(new_users) OVER (ORDER BY day "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users FROM d"
)


def _q_rolling_active_users(sf_dir: str):
    """Trailing-30-day distinct active users per calendar day
    (relational.rolling_active_users): per-batch distinct-(user, day)
    collapse, one key-domain exchange, per-bucket coverage-island +1/-1
    deltas, then a single bounded-day-domain cumsum + calendar expansion
    -- never a per-day COUNT(DISTINCT) rescan."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts"])
    return relational.rolling_active_users(ds, window_days=30)


_ROLLING_ACTIVE_USERS_SQL = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d FROM events), "
    "b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud), "
    "cal AS (SELECT UNNEST(range(lo, hi + 1)) AS day FROM b) "
    "SELECT cal.day AS day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) "
    "AS active_users FROM cal LEFT JOIN ud "
    "ON ud.d BETWEEN cal.day - 29 AND cal.day GROUP BY cal.day"
)


def _q_bucketed_join_revenue(sf_dir: str):
    """Storage co-partitioned join end-to-end: write orders and lineitem
    hash-BUCKETED on the order key (lance_like.write_bucketed -- the one
    ingest-time exchange), then join them bucket-by-bucket with ZERO
    query-time shuffle (relational.zip_join_bucketed) and aggregate
    quantity per order priority. The green row certifies the bucketed
    writer, the spec validation and the zip join against a plain SQL
    join."""
    import shutil
    import tempfile

    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational
    from distributed_system___ocr_ray.sources import lance_like

    root = tempfile.mkdtemp(prefix="graft_bucketed_")
    try:
        lance_like.write_bucketed(
            _read_narrow(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderpriority"]),
            f"{root}/orders", "o_orderkey", 16,
        )
        lance_like.write_bucketed(
            _read_narrow(f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_quantity"]),
            f"{root}/lineitem", "l_orderkey", 16,
        )
        joined = relational.zip_join_bucketed(
            f"{root}/orders", f"{root}/lineitem", "o_orderkey", "l_orderkey"
        )

        def partial(batch: "pa.Table") -> "pa.Table":
            import pyarrow as pa

            t = pa.table(
                {
                    "o_orderpriority": batch.column("o_orderpriority"),
                    "qty_cents": pa.array(
                        np.floor(
                            batch.column("l_quantity").to_numpy(zero_copy_only=False)
                            * 100.0 + 0.5
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )
            return t.group_by(["o_orderpriority"]).aggregate(
                [("qty_cents", "sum"), ("qty_cents", "count")]
            )

        from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby

        out = tiny_final_groupby(
            joined.map_batches(partial, batch_format="pyarrow"),
            ["o_orderpriority"],
            [("qty_cents_sum", "sum"), ("qty_cents_count", "sum")],
            ["o_orderpriority", "sum_qty_cents", "n_rows"],
        )
        return out.to_pandas()  # materialize before the scratch dir is removed
    finally:
        shutil.rmtree(root, ignore_errors=True)


_BUCKETED_JOIN_REVENUE_SQL = (
    "SELECT o_orderpriority, "
    "CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n_rows "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1"
)


def _q_label_centroids(sf_dir: str):
    """Grouped vector aggregation: per label, exact integer component sums
    (micros) of the embedding column in long (label, dim) format
    (analytics.label_centroid_sums) -- the distributed-centroid partial as
    a standalone, SQL-replayable operator."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _read_narrow(f"{sf_dir}/embeddings.parquet", ["label", "embedding"])
    return analytics.label_centroid_sums(ds)


_LABEL_CENTROIDS_SQL = (
    "WITH u AS (SELECT label, g.k AS k1, "
    "CAST(FLOOR(CAST(embedding[g.k] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v "
    "FROM embeddings CROSS JOIN generate_series(1, 64) g(k)) "
    "SELECT CAST(label AS BIGINT) AS label, CAST(k1 - 1 AS BIGINT) AS dim, "
    "CAST(SUM(v) AS BIGINT) AS sum_micros, CAST(COUNT(*) AS BIGINT) AS n_vecs "
    "FROM u GROUP BY 1, 2"
)


def _q_incremental_daily_totals(sf_dir: str):
    """Incremental view maintenance end-to-end: build a Lance-style event
    table (~75% of rows), materialize the daily aggregate, append the
    remaining ~25%, then refresh the aggregate from the DIFF fragments
    alone (compose.refresh_daily_agg) -- raising unless the refresh
    actually read fewer fragments than a full rebuild. The green row
    certifies O(increment) refresh == full recompute."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from distributed_system___ocr_ray.pipelines import compose
    from distributed_system___ocr_ray.sources import lance_like

    root = tempfile.mkdtemp(prefix="graft_ivm_") + "/events"
    try:
        base = _read_narrow(f"{sf_dir}/events.parquet", ["event_id", "ts", "value"])

        def split(keep_mod: bool):
            def f(batch: "pa.Table") -> "pa.Table":
                m = pc.equal(pc.bit_wise_and(batch.column("event_id"), 3), 0)
                mask = m if keep_mod else pc.invert(m)
                return batch.filter(mask).select(["ts", "value"])
            return f

        lance_like.write_dataset(
            base.map_batches(split(False), batch_format="pyarrow"), root,
            rows_per_fragment=2048,
        )
        agg1, v1 = compose.refresh_daily_agg(root)
        lance_like.write_dataset(
            base.map_batches(split(True), batch_format="pyarrow"), root,
            mode="append", rows_per_fragment=2048,
        )
        n_total = len(lance_like.fragment_paths(root))
        d = lance_like.diff(root, v1)
        if not d["added"] or len(d["added"]) >= n_total:
            raise RuntimeError("incremental refresh did not prune fragments")
        agg2, _ = compose.refresh_daily_agg(root, agg1, v1)
        return agg2
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


_INCREMENTAL_DAILY_TOTALS_SQL = (
    "SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1"
)


def _q_late_orders_by_priority(sf_dir: str):
    """TPC-H Q4-shape EXISTS semi-join: orders with at least one lineitem
    shipped on/after 2000-06-01, counted per priority
    (relational.semi_join_agg); the probe side collapses to distinct keys
    map-side and broadcasts once -- the fact table streams, no shuffle."""
    import pyarrow.compute as pc

    from distributed_system___ocr_ray.pipelines import relational

    cutoff = pa.scalar(np.datetime64("2000-06-01", "us"), pa.timestamp("us"))

    def late_only(batch: "pa.Table") -> "pa.Table":
        mask = pc.greater_equal(batch.column("l_shipdate"), cutoff)
        return batch.filter(mask).select(["l_orderkey"])

    probe = _read_narrow(f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_shipdate"]).map_batches(
        late_only, batch_format="pyarrow"
    )
    fact = _read_narrow(f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderpriority"])
    return relational.semi_join_agg(fact, probe, "o_orderkey", "l_orderkey", "o_orderpriority")


_LATE_ORDERS_BY_PRIORITY_SQL = (
    "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_matching FROM orders "
    "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate >= TIMESTAMP '2000-06-01') GROUP BY 1"
)


def _q_mor_delete_counts(sf_dir: str):
    """Merge-on-read delete end-to-end (the CDC-writer flavor beside
    _q_cow_delete_counts's copy-on-write): stream documents into a
    Lance-style table, EQUALITY-delete the shared doc_id range as a
    small delete file -- the guard asserts every fragment carried by
    reference (zero rewrites) and a positive deleted-key count -- then
    aggregate surviving rows per lang THROUGH the delete-applying
    reader (sources/lance_like.delete_where_mor + read_dataset's
    anti-filter stage). The oracle is the complement WHERE clause over
    the source table, shared with the COW twin."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.sources import lance_like

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lo, hi = _range_bounds(sf_dir)
    tdir = tempfile.mkdtemp(prefix="graft_mor_") + "/docs"
    try:
        lance_like.write_dataset(
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
            tdir,
            rows_per_fragment=max(50, n // 10),
        )
        before = len(lance_like.read_manifest(tdir)["fragments"])
        man = lance_like.delete_where_mor(
            tdir, [("doc_id", ">=", lo), ("doc_id", "<", hi)], key_col="doc_id"
        )
        if not (man["keys_deleted"] > 0 and man["fragments_carried"] == before
                and man["fragments_scanned"] < before):
            raise AssertionError(
                f"merge-on-read delete shape wrong: {man['keys_deleted']} keys, "
                f"{man['fragments_carried']}/{before} carried, "
                f"{man['fragments_scanned']} scanned"
            )
        return _lang_agg(lance_like.read_dataset(tdir)).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)


def _q_wap_publish_counts(sf_dir: str):
    """Write-Audit-Publish end-to-end: stage the in-range slice of
    documents as its own table, AUDIT it (verify fsck + exact row-count
    contract computed independently), publish into a fresh target as a
    metadata-only snapshot (sources/lance_like.wap_publish), then
    aggregate the TARGET per lang -- plus an in-query negative check
    that a tampered staging fails its audit and leaves the target
    untouched. Oracle is the range-filter aggregate over the source."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from distributed_system___ocr_ray.sources import lance_like

    lo, hi = _range_bounds(sf_dir)
    root = tempfile.mkdtemp(prefix="graft_wap_")
    stage, target = root + "/stage", root + "/target"
    try:
        ds = lance_like.write_dataset(  # noqa: F841 -- manifest unused
            _docs(sf_dir, ["doc_id", "lang", "n_chars"]).filter(
                expr=f"doc_id >= {lo} and doc_id < {hi}"),
            stage,
        )
        import duckdb

        expected = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet') "
            f"WHERE doc_id >= {lo} AND doc_id < {hi}"
        ).fetchone()[0]
        man = lance_like.wap_publish(stage, target, expected_rows=expected)
        if man["audited_rows"] != expected:
            raise AssertionError("audit accounting mismatch")
        # negative path: a wrong contract must fail and not touch the target
        v_before = lance_like.latest_version(target)
        try:
            lance_like.wap_publish(stage, target, expected_rows=expected + 1)
            raise AssertionError("audit should have failed")
        except lance_like.WapAuditError:
            pass
        if lance_like.latest_version(target) != v_before:
            raise AssertionError("failed audit must not publish")
        return _lang_agg(lance_like.read_dataset(target)).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_time_travel_counts(sf_dir: str):
    """Snapshot-isolation read (time travel): write odd-event rows as
    table version 1, append the evens as version 2, then aggregate AT
    VERSION 1 -- the versioned manifest guarantees the snapshot is
    unaffected by later appends (Lance/Iceberg time-travel semantics;
    every fragment is immutable, so an old manifest IS the old table).
    The oracle replays the v1 membership rule (odd event_id) in SQL."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    import ray.data as rd

    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby
    from distributed_system___ocr_ray.sources import lance_like

    root = tempfile.mkdtemp(prefix="graft_tt_") + "/events"
    try:
        base = _read_narrow(f"{sf_dir}/events.parquet", ["event_id", "event_type", "value"])

        def half(odd: bool):
            def f(batch: "pa.Table") -> "pa.Table":
                m = pc.equal(pc.bit_wise_and(batch.column("event_id"), 1), 1)
                return batch.filter(m if odd else pc.invert(m)).select(
                    ["event_type", "value"]
                )
            return f

        lance_like.write_dataset(base.map_batches(half(True), batch_format="pyarrow"), root)
        lance_like.write_dataset(
            base.map_batches(half(False), batch_format="pyarrow"), root, mode="append"
        )
        if lance_like.latest_version(root) != 2:
            raise RuntimeError("expected two manifest versions")
        v1_paths = lance_like.fragment_paths(root, version=1)

        def partial(batch: "pa.Table") -> "pa.Table":
            t = pa.table(
                {
                    "event_type": batch.column("event_type"),
                    "value_cents": pa.array(
                        np.floor(
                            batch.column("value").to_numpy(zero_copy_only=False)
                            * 100.0 + 0.5
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )
            return t.group_by(["event_type"]).aggregate(
                [("value_cents", "sum"), ("value_cents", "count")]
            )

        out = tiny_final_groupby(
            rd.read_parquet(v1_paths).map_batches(partial, batch_format="pyarrow"),
            keys=["event_type"],
            aggs=[("value_cents_sum", "sum"), ("value_cents_count", "sum")],
            out_names=["event_type", "value_cents", "n_events"],
        )
        return out.to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


_TIME_TRAVEL_COUNTS_SQL = (
    "SELECT event_type, "
    "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
    "WHERE event_id % 2 = 1 GROUP BY 1"
)


def _q_star_join_revenue(sf_dir: str):
    """Star-schema revenue cube: lineitem enriched by part (brand) AND
    supplier->nation (snowflake hop folded into the broadcast) in ONE
    fact pass (relational.star_join_revenue); two searchsorted probes per
    batch, zero join shuffles."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.star_join_revenue(sf_dir)


_STAR_JOIN_REVENUE_SQL = (
    "SELECT p_brand, n_name, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents, CAST(COUNT(*) AS BIGINT) AS n_rows "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2"
)


def _q_zorder_2d_prune(sf_dir: str):
    """Z-order layout end-to-end: cluster events by the Morton interleave
    of (user_id, day) (lance_like.write_zordered -- one ingest-time sort),
    then answer a 2-D range query (middle-quartile windows on BOTH dims)
    from the zone maps, raising unless fragments were actually pruned.
    The green row certifies the Morton kernel, the clustered layout and
    the 2-level pruned read against a plain WHERE oracle."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby
    from distributed_system___ocr_ray.sources import lance_like

    root = tempfile.mkdtemp(prefix="graft_zorder_") + "/events"
    try:
        base = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "event_type", "value"])

        def derive_day(batch: "pa.Table") -> "pa.Table":
            day = batch.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "day": pa.array(day, pa.int64()),
                    "event_type": batch.column("event_type"),
                    "value": batch.column("value"),
                }
            )

        n = base.count()
        res = lance_like.write_zordered(
            base.map_batches(derive_day, batch_format="pyarrow"),
            root, "user_id", "day", rows_per_fragment=max(256, n // 32),
        )
        (ulo, uhi) = res["bounds"]["user_id"]
        (dlo, dhi) = res["bounds"]["day"]
        # middle-quartile windows, integer arithmetic the SQL replays
        u1, u2 = ulo + (uhi - ulo) // 4, ulo + (uhi - ulo) // 2
        d1, d2 = dlo + (dhi - dlo) // 4, dlo + (dhi - dlo) // 2
        preds = [("user_id", "between", (u1, u2)), ("day", "between", (d1, d2))]
        paths, total = lance_like.pruned_fragment_paths(root, preds)
        if not paths or len(paths) >= total:
            raise RuntimeError(
                f"z-order pruning ineffective: {len(paths)}/{total} fragments kept"
            )
        ds = lance_like.read_dataset(root, predicates=preds)

        def partial(batch: "pa.Table") -> "pa.Table":
            t = pa.table(
                {
                    "event_type": batch.column("event_type"),
                    "value_cents": pa.array(
                        np.floor(
                            batch.column("value").to_numpy(zero_copy_only=False)
                            * 100.0 + 0.5
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )
            return t.group_by(["event_type"]).aggregate(
                [("value_cents", "sum"), ("value_cents", "count")]
            )

        out = tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["event_type"],
            aggs=[("value_cents_sum", "sum"), ("value_cents_count", "sum")],
            out_names=["event_type", "value_cents", "n_events"],
        )
        return out.to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


_ZORDER_2D_PRUNE_SQL = (
    "WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, "
    "event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events), "
    "b AS (SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi, "
    "MIN(day) AS dlo, MAX(day) AS dhi FROM e) "
    "SELECT event_type, CAST(SUM(cents) AS BIGINT) AS value_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM e, b "
    "WHERE user_id BETWEEN ulo + (uhi - ulo) // 4 AND ulo + (uhi - ulo) // 2 "
    "AND day BETWEEN dlo + (dhi - dlo) // 4 AND dlo + (dhi - dlo) // 2 "
    "GROUP BY 1"
)


def _q_evolved_schema_counts(sf_dir: str):
    """Schema evolution end-to-end: write docs (doc_id % 4 != 0) without a
    quality_tier column, ADD COLUMN quality_tier default 0 (metadata-only,
    lance_like.evolve_add_column), append the doc_id % 4 == 0 cohort WITH
    quality_tier = 1, then read the evolved table (old fragments filled
    with the default, new read physically) and count per (lang, tier).
    The oracle replays the cohort rule in SQL."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    import ray.data as rd

    from distributed_system___ocr_ray.pipelines.relational import tiny_final_groupby
    from distributed_system___ocr_ray.sources import lance_like

    root = tempfile.mkdtemp(prefix="graft_evo_") + "/docs"
    try:
        base = _read_narrow(f"{sf_dir}/documents.parquet", ["doc_id", "lang"])

        def cohort(new: bool):
            def f(batch: "pa.Table") -> "pa.Table":
                m = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 3), 0)
                out = batch.filter(m if new else pc.invert(m))
                if new:
                    out = out.append_column(
                        "quality_tier", pa.array([1] * out.num_rows, pa.int64())
                    )
                return out
            return f

        lance_like.write_dataset(base.map_batches(cohort(False), batch_format="pyarrow"), root)
        lance_like.evolve_add_column(root, "quality_tier", "int64", 0)
        lance_like.write_dataset(
            base.map_batches(cohort(True), batch_format="pyarrow"), root, mode="append"
        )
        ds = lance_like.read_evolved(root)

        def partial(batch: "pa.Table") -> "pa.Table":
            return batch.select(["lang", "quality_tier"]).group_by(
                ["lang", "quality_tier"]
            ).aggregate([([], "count_all")])

        out = tiny_final_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["lang", "quality_tier"],
            aggs=[("count_all", "sum")],
            out_names=["lang", "quality_tier", "n_docs"],
        )
        return out.to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


_EVOLVED_SCHEMA_COUNTS_SQL = (
    "SELECT lang, CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) "
    "AS quality_tier, CAST(COUNT(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY 1, 2"
)


def _q_typo_pairs(sf_dir: str):
    """Edit-distance-1 fuzzy self-join over customer names
    (analytics.typo_pairs, FastSS deletion neighborhoods): exact
    Levenshtein<=1 pairs with NO verification stage -- substitution and
    indel key spaces are constructed to admit only true pairs."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _read_narrow(f"{sf_dir}/customer.parquet", ["c_name"])
    return analytics.typo_pairs(ds, "c_name")


_TYPO_PAIRS_SQL = (
    "WITH v AS (SELECT DISTINCT c_name AS tk FROM customer) "
    "SELECT a.tk AS tok_a, b.tk AS tok_b FROM v a "
    "JOIN v b ON a.tk < b.tk AND levenshtein(a.tk, b.tk) = 1"
)


def _q_encoding_advisor(sf_dir: str):
    """Dictionary-encoding advisor over documents (lang: 5-distinct win,
    source: 20-distinct win, text: near-unique lose)
    (analytics.encoding_advisor); oracle shares the exact byte formula
    via length(bin()) index-width arithmetic."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.encoding_advisor(
        _docs(sf_dir, ["lang", "source", "text"]),
        ["lang", "source", "text"])


def _q_bloom_pruned_join_revenue(sf_dir: str):
    """Bloom semi-join pruned orders x lineitem revenue
    (analytics.bloom_pruned_join_revenue): the urgent-order build side
    folds into one mergeable Bloom, probe rows test map-side, and only
    survivors enter the exact join exchange -- false positives cost
    bytes, never correctness. Oracle is the plain join aggregate."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.bloom_pruned_join_revenue(sf_dir)


def _q_lpa_modularity(sf_dir: str):
    """Newman modularity of the LPA partition over the md5-derived
    citation graph (analytics.lpa_modularity); oracle reuses the shared
    LPA voting chain and replays the per-community degree-mass /
    within-edge fold and the exact 4m-scaled quotient."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.lpa_modularity(_docs(sf_dir, ["doc_id"]))


def _q_event_type_stationary(sf_dir: str):
    """Stationary distribution of the per-user event-type Markov chain
    by fixed-round integer power iteration (analytics.
    event_type_stationary); oracle replays the LAG transition counts
    and every round's per-source truncating division + renormalization
    as MATERIALIZED CTEs."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.event_type_stationary(sf_dir)


def _q_revenue_acf(sf_dir: str):
    """Autocorrelation of daily order revenue at lags 1..7
    (analytics.revenue_acf -- the Box-Jenkins pre-forecast diagnostic);
    oracle replays the n-scaled integer demeaning, the lag self-join,
    and the sign-split truncating ppm in HUGEINT."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.revenue_acf(sf_dir)


def _q_hive_partition_prune_daily(sf_dir: str):
    """Day-range aggregate over a hive day=partitioned copy of events,
    read through PathPartitionFilter so non-matching partition dirs
    never open (analytics.hive_partition_prune_daily); oracle is the
    plain WHERE-range aggregate with the shared day/cents conventions."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.hive_partition_prune_daily(sf_dir)


def _q_entity_dedupe_keepers(sf_dir: str):
    """Entity canonicalization over customer names: FastSS edit-1 pairs
    -> connected components -> canonical map for the whole vocabulary
    (analytics.entity_dedupe_keepers); oracle composes the shared
    levenshtein pair CTE with a recursive min-label closure and a
    LEFT JOIN back onto the distinct vocabulary."""
    from distributed_system___ocr_ray.pipelines import analytics

    ds = _read_narrow(f"{sf_dir}/customer.parquet", ["c_name"])
    return analytics.entity_dedupe_keepers(ds, "c_name")


def _q_json_field_stats(sf_dir: str):
    """Semi-structured extraction: integer field k pulled from the JSON
    props column with one compiled vectorized regex per batch
    (relational.json_field_stats), aggregated per event_type; the regex
    is shared char-for-char with the oracle's regexp_extract."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["props", "event_type"])
    return relational.json_field_stats(ds, "props", "k", "event_type")


_JSON_FIELD_STATS_SQL = (
    "WITH x AS (SELECT event_type, "
    "CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS BIGINT) AS k "
    "FROM events WHERE regexp_extract(props, '\"k\":\\s*(\\d+)', 1) <> '') "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MIN(k) AS BIGINT) AS min_k, "
    "CAST(MAX(k) AS BIGINT) AS max_k FROM x GROUP BY 1"
)


def _q_customers_without_orders(sf_dir: str):
    """NOT EXISTS anti-join: customers with no URGENT order, counted per
    market segment (relational.semi_join_agg with anti=True) -- the
    post-purge audit complement of the Q4 semi-join, same one-broadcast
    streaming shape (probe side filtered map-side before the distinct
    collapse)."""
    import pyarrow.compute as pc

    from distributed_system___ocr_ray.pipelines import relational

    def urgent_only(batch: "pa.Table") -> "pa.Table":
        mask = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        return batch.filter(mask).select(["o_custkey"])

    probe = _read_narrow(
        f"{sf_dir}/orders.parquet", ["o_custkey", "o_orderpriority"]
    ).map_batches(urgent_only, batch_format="pyarrow")
    fact = _read_narrow(f"{sf_dir}/customer.parquet", ["c_custkey", "c_mktsegment"])
    return relational.semi_join_agg(
        fact, probe, "c_custkey", "o_custkey", "c_mktsegment", anti=True
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = (
    "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_matching FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
    "AND o_orderpriority = '1-URGENT') GROUP BY 1"
)


def _q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape: the DISTRIBUTION of orders-per-customer -- a
    two-level aggregate (per-customer counts via one key-domain exchange of
    map-side partials, then a bounded-domain count-of-counts). Customers
    with zero orders are out of scope by construction (the left-join
    variant is customer_order_counts)."""
    from distributed_system___ocr_ray.pipelines.relational import (
        bucketed_grouped_sum, tiny_final_groupby)

    ds = _read_narrow(f"{sf_dir}/orders.parquet", ["o_custkey"])

    def partial(batch: "pa.Table") -> "pa.Table":
        t = batch.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return t.rename_columns(["o_custkey", "n"])

    per_cust = bucketed_grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"), "o_custkey", "n"
    )

    def to_counts(batch: "pa.Table") -> "pa.Table":
        t = batch.select(["n"]).group_by(["n"]).aggregate([([], "count_all")])
        return t.rename_columns(["n_orders", "n_customers"])

    return tiny_final_groupby(
        per_cust.map_batches(to_counts, batch_format="pyarrow"),
        keys=["n_orders"],
        aggs=[("n_customers", "sum")],
        out_names=["n_orders", "n_customers"],
    )


_ORDER_COUNT_DISTRIBUTION_SQL = (
    "WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders "
    "FROM orders GROUP BY 1) "
    "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers FROM c GROUP BY 1"
)


def _q_audience_overlap(sf_dir: str):
    """Set-intersection matrix: users appearing under BOTH event types, for
    every unordered type pair (relational.cooccurrence_counts); distinct
    collapse, one id-domain exchange, size-class triu pair kernel."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "event_type"])
    return relational.cooccurrence_counts(ds)


_AUDIENCE_OVERLAP_SQL = (
    "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
    "SELECT a.event_type AS type_a, b.event_type AS type_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_ids FROM d a "
    "JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type GROUP BY 1, 2"
)


def _q_event_transitions(sf_dir: str):
    """Markov transition matrix: per-user consecutive event-type bigram
    counts ordered by (ts, event_id) (relational.event_transitions); one
    key-domain exchange, vectorized bigram bincount per bucket, tiny
    vocabulary-sized final merge."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "event_id", "event_type"])
    return relational.event_transitions(ds)


_EVENT_TRANSITIONS_SQL = (
    "WITH t AS (SELECT user_id, event_type, LAG(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) "
    "SELECT prev AS prev_type, event_type AS next_type, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM t WHERE prev IS NOT NULL GROUP BY 1, 2"
)


def _q_basket_pairs(sf_dir: str):
    """Market-basket affinity: top-20 part pairs co-occurring in orders,
    A-Priori-pruned at item support 20 (analytics.basket_pairs_topk)."""
    from distributed_system___ocr_ray.pipelines import analytics

    # smaller blocks than the narrow-scan default: BOTH sort-groupby
    # exchanges (basket co-location, pair merge) parallelize by the block
    # count feeding them, and the pair stage doubles the row count
    # (measured 8.1 s single-block vs ~3 s at 7 blocks on sf0.1 input)
    ds = _read_narrow(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_partkey"],
        rows_per_block=100_000,
    )
    return analytics.basket_pairs_topk(ds, min_support=20, topk=20)


_BASKET_PAIRS_SQL = (
    "WITH f AS (SELECT l_partkey FROM (SELECT l_partkey, COUNT(*) AS c "
    "FROM lineitem GROUP BY 1) WHERE c >= 20), "
    "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "WHERE l_partkey IN (SELECT l_partkey FROM f)), "
    "p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders FROM li a JOIN li b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2) "
    "SELECT * FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT 20"
)


def _q_basket_lift(sf_dir: str):
    """Market-basket lift in ppm for the top-20 pairs
    (analytics.basket_lift_topk): the pair stage is basket_pairs_topk;
    supports probe only the items in the top pairs (broadcast set,
    distinct collapse, one item-domain exchange); the k-row final
    arithmetic is integer-exact."""
    from distributed_system___ocr_ray.pipelines import analytics

    def factory():
        return _read_narrow(
            f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_partkey"],
            rows_per_block=100_000,
        )

    return analytics.basket_lift_topk(factory, min_support=20, topk=20)


_BASKET_LIFT_SQL = (
    "WITH f AS (SELECT l_partkey FROM (SELECT l_partkey, COUNT(*) AS c "
    "FROM lineitem GROUP BY 1) WHERE c >= 20), "
    "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "WHERE l_partkey IN (SELECT l_partkey FROM f)), "
    "p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders FROM li a JOIN li b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2), "
    "p2 AS (SELECT * FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT 20), "
    "s AS (SELECT l_partkey, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS c "
    "FROM lineitem WHERE l_partkey IN "
    "(SELECT part_a FROM p2 UNION SELECT part_b FROM p2) GROUP BY 1), "
    "nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem) "
    "SELECT part_a, part_b, n_orders, "
    "CAST((n_orders * nb.n * 1000000) // (sa.c * sb.c) AS BIGINT) AS lift_ppm "
    "FROM p2 JOIN s sa ON sa.l_partkey = p2.part_a "
    "JOIN s sb ON sb.l_partkey = p2.part_b, nb"
)


def _q_longest_streak(sf_dir: str):
    """Per-user longest consecutive-active-days streak (gaps-and-islands)
    over the event stream; one activity-domain exchange, vectorized
    run-length kernel (relational.longest_streak)."""
    from distributed_system___ocr_ray.pipelines import relational

    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts"])
    return relational.longest_streak(ds, "user_id", "ts")


def _activity_intervals(sf_dir: str):
    """Shared interval derivation for the sweep-line queries: each event
    opens a half-open interval [ts, ts + (cents % 60000) * 10ms) -- the
    md5-free deterministic duration rule both SQL replays restate in the
    ``iv`` CTE (_ACTIVITY_IV_CTE, char-for-char twin)."""
    ds = _read_narrow(f"{sf_dir}/events.parquet", ["user_id", "ts", "value"])

    def project(batch: pa.Table) -> pa.Table:
        import numpy as np

        s = batch.column("ts").cast(pa.int64()).to_numpy()
        v = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "s_us": pa.array(s, pa.int64()),
                "e_us": pa.array(s + (cents % 60000) * 10_000, pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


# SQL twin of _activity_intervals' duration rule
_ACTIVITY_IV_CTE = (
    "iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + "
    "(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % 60000) * 10000 AS e "
    "FROM events)"
)


def _q_user_active_coverage(sf_dir: str):
    """Per-user total covered time of the UNION of activity intervals
    (overlaps merged) + disjoint-island count -- the SLA-uptime /
    ad-exposure sweep over _activity_intervals; map-side island merge
    makes the one exchange islands-domain sized
    (relational.interval_coverage)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.interval_coverage(
        _activity_intervals(sf_dir), "user_id", "s_us", "e_us"
    )


def _q_peak_concurrent_sessions(sf_dir: str):
    """Per-user PEAK concurrent activity intervals + the first instant the
    peak is reached -- the sweep-line dual of user_active_coverage over
    the same _activity_intervals; START/END deltas net to one row per
    (user, t) map-side so the exchange is timestamp-domain sized
    (relational.peak_concurrency)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.peak_concurrency(
        _activity_intervals(sf_dir), "user_id", "s_us", "e_us"
    )


# islands via MAX-OVER-preceding: a new island opens where start exceeds
# the key's running max end; covered = per-island MAX(e) - MIN(s)
_USER_ACTIVE_COVERAGE_SQL = (
    f"WITH {_ACTIVITY_IV_CTE}, "
    "m AS (SELECT user_id, s, e, MAX(e) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
    "AS prev_max FROM iv), "
    "g AS (SELECT user_id, s, e, SUM(CASE WHEN prev_max IS NULL OR "
    "s > prev_max THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM m), "
    "a AS (SELECT user_id, isl, MAX(e) - MIN(s) AS len FROM g "
    "GROUP BY user_id, isl) "
    "SELECT user_id, CAST(SUM(len) AS BIGINT) AS covered_us, "
    "CAST(COUNT(*) AS BIGINT) AS n_islands FROM a GROUP BY user_id"
)


# sweep line: +1/-1 deltas, ends-before-starts at equal t (ORDER BY t, d);
# the running sum's max is the peak, MIN(t) at the peak is when it is
# first reached (within a timestamp the dip-then-rise never exceeds
# max(before, after), so netting per t -- what the engine ships -- and
# row-wise SQL agree; see relational.peak_concurrency)
_PEAK_CONCURRENT_SQL = (
    f"WITH {_ACTIVITY_IV_CTE}, "
    "ev AS (SELECT user_id, s AS t, 1 AS d FROM iv "
    "UNION ALL SELECT user_id, e AS t, -1 AS d FROM iv), "
    "r AS (SELECT user_id, t, SUM(d) OVER (PARTITION BY user_id "
    "ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run FROM ev), "
    "p AS (SELECT user_id, MAX(run) AS peak FROM r GROUP BY user_id) "
    "SELECT r.user_id, CAST(p.peak AS BIGINT) AS peak, "
    "CAST(MIN(r.t) AS BIGINT) AS peak_at_us "
    "FROM r JOIN p ON r.user_id = p.user_id AND r.run = p.peak "
    "GROUP BY r.user_id, p.peak"
)


_LONGEST_STREAK_SQL = (
    "WITH d AS (SELECT DISTINCT user_id, "
    "CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day FROM events), "
    "r AS (SELECT user_id, day, day - ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY day) AS grp FROM d), "
    "s AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2) "
    "SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak_days, "
    "CAST(SUM(len) AS BIGINT) AS n_active_days FROM s GROUP BY user_id"
)


def _q_semdedup_keepers(sf_dir: str):
    """SemDeDup: kmeans the embedding space (the integer-exact Lloyd fit
    kmeans_clusters uses), then within each cluster drop vectors that have
    a smaller-id near-dup at cosine >= 0.4 (the testdata is near-orthogonal;
    see analytics.semdedup_keepers for the threshold rationale)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # k is THE SemDeDup scale knob (k ~ N / target_cluster_size): derive it
    # so clusters stay inside the per-worker n^2 budget at any corpus size
    # (the 100x sweep fired the max_cluster guard at fixed k=8). At the
    # oracle scales (<=20k vectors) this still resolves to k=8, so the
    # unrolled SQL replay is unchanged.
    k = max(8, ds.count() // 2500)
    return analytics.semdedup_keepers(ds, k=k, iters=3, threshold=0.4)


def _q_forecast_revenue_delta(sf_dir: str):
    """TPC-H Q6 shape: what-if discount revenue for shipping-year 1996,
    discount band 5-7%, qty < 24 -- pure filtered global aggregate, 2-int
    partials, no row ever crosses the exchange
    (relational.forecast_revenue_delta)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.forecast_revenue_delta(sf_dir)


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: PROMO parts' ppm share of 1996-09 gross revenue --
    broadcast part bitmap, map-side month filter, ONE ppm row
    (relational.promo_revenue)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.promo_revenue(sf_dir)


def _q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: OR of three (brand, size-range, qty-range)
    conjunctions evaluated map-side against a broadcast part attribute
    table -- the disjunctive-join optimizer trap flattened to a scan
    (relational.disjunctive_revenue)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.disjunctive_revenue(sf_dir)


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: top-10 unshipped-order revenue for the BUILDING
    segment at the 1997-06-30 cutoff -- broadcast segment filter, map-side
    combiner on lineitem, one orderkey-bucketed join+topk exchange
    (relational.shipping_priority)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.shipping_priority(sf_dir)


def _q_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by returned revenue in 1996Q4 --
    orderkey-bucketed fact-fact join with map-side combiners, then a
    custkey-bucketed fold with per-bucket top-k
    (relational.returned_items_topk)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.returned_items_topk(sf_dir)


def _pin_schema_if_empty(ds, schema: "pa.Schema"):
    """Ray Data cannot represent a zero-row Dataset's schema (empty blocks
    drop it entirely, `to_pandas()` then yields zero COLUMNS); for bounded
    final results that may legitimately be empty at tiny scales, return the
    Dataset untouched when non-empty and a typed empty pyarrow Table (a
    driver-accepted return type) otherwise."""
    import pyarrow as pa

    df = ds.to_pandas()
    if len(df):
        return pa.Table.from_pandas(df, preserve_index=False)
    return schema.empty_table()


def _q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: 1996-1997 revenue shipped between NATION_1 and
    NATION_2 per direction per ship-year -- both nation legs broadcast,
    map-side combiners, one orderkey-bucketed exchange
    (relational.nation_trade_volume)."""
    import pyarrow as pa

    from distributed_system___ocr_ray.pipelines import relational

    return _pin_schema_if_empty(
        relational.nation_trade_volume(sf_dir),
        pa.schema(
            [
                ("supp_nation", pa.string()),
                ("cust_nation", pa.string()),
                ("l_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )


def _q_market_share(sf_dir: str):
    """TPC-H Q8 shape: NATION_5 suppliers' ppm share of PROMO-part revenue
    sold to ASIA customers, per order-year -- three broadcast dimension
    legs, per-orderkey combiner, one bucketed exchange
    (relational.market_share)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.market_share(sf_dir)


def _q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue from Brand#13 lineitems below 1/5 of the
    part's average quantity -- the correlated per-group average as two
    broadcast-joined scans, zero row shuffle, exact cross-multiplied
    integer compare (relational.small_qty_revenue)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.small_qty_revenue(sf_dir)


def _q_supplier_count_by_part(sf_dir: str):
    """TPC-H Q16 shape (over the observed lineitem relation): distinct
    suppliers per (brand, type, size) class, one brand excluded, sizes
    listed -- batch-distinct combiner then a suppkey-bucketed global
    dedup (relational.supplier_count_by_part_attrs)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.supplier_count_by_part_attrs(sf_dir)


def _q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (adapted: late = last shipment > 60 days after the
    order date): per supplier, finished multi-supplier orders where it was
    the ONLY late one -- max-shipdate combiner, one orderkey-bucketed
    exchange, vectorized exactly-one-late predicate
    (relational.waiting_suppliers)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.waiting_suppliers(sf_dir)


def _q_product_profit(sf_dir: str):
    """TPC-H Q9 shape (10% of retail price stands in for supplycost):
    ECONOMY-part profit per supplier nation per order year -- two
    broadcast dimension legs, per-orderkey combiner, one bucketed
    exchange (relational.product_profit)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.product_profit(sf_dir)


def _q_order_priority_check(sf_dir: str):
    """TPC-H Q4 shape (late = some lineitem shipped > 30 days after the
    order date): per priority class, orders in 1996Q1 with at least one
    late lineitem -- EXISTS as a max-shipdate combiner, lossless
    shipdate>date_lo prune, one orderkey-bucketed exchange
    (relational.order_priority_check)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.order_priority_check(sf_dir)


def _q_line_priority_counts(sf_dir: str):
    """TPC-H Q12 shape (l_returnflag stands in for the absent ship mode):
    per flag, 1996-shipped lineitems from high- vs low-priority orders --
    per-(orderkey, flag) combiner, one-bit order side, one bucketed
    exchange (relational.line_priority_counts)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.line_priority_counts(sf_dir)


def _q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape: customers per exact qualifying-order count
    (priority 5-LOW excluded), zero bin included via the metadata-only
    customer total -- per-batch custkey combiner, custkey-bucketed fold,
    per-bucket histogram collapse (relational.customer_order_distribution)."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.customer_order_distribution(sf_dir)


def _q_bpe_merge_candidates(sf_dir: str):
    """BPE round-1 merge statistics: corpus-wide adjacent-char-pair counts
    within [a-z0-9]+ tokens of the lowered text, weighted by occurrence,
    top-50 by (n DESC, pair ASC) (analytics.bpe_merge_candidates). Oracle
    replays tokenize -> word-freq -> unnest(range) char pairs -> sum."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.bpe_merge_candidates(_docs(sf_dir, ["text"]))


def _q_dp_geometric_counts(sf_dir: str):
    """Differentially-private per-lang doc counts under the two-sided
    geometric mechanism (eps = ln 2), noise derandomized from
    md5('dp1:'||lang) leading-ones draws (analytics.dp_geometric_counts);
    oracle replays the mechanism with 16 monotone threshold indicators."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.dp_geometric_counts(_docs(sf_dir, ["lang"]))


def _q_dow_adjusted_spikes(sf_dir: str):
    """Seasonality-adjusted revenue anomalies: day revenue minus its
    day-of-week floor-mean, flagged where |resid| > 3*MAD (lower-median)
    (analytics.dow_adjusted_spikes); all-integer so the replay is exact."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return analytics.dow_adjusted_spikes(ds)


def _q_boundary_overlap_pairs(sf_dir: str):
    """Crawl-stitch candidate pairs: A's last-2-token window == B's
    first-2-token window, boilerplate-boundary skew cap 40 per side
    (analytics.boundary_overlap_pairs); oracle replays list_slice windows,
    the cap CTE and the self-pair exclusion on the window STRINGS (the
    engine joins on their md5-u64, collision-free at 64 bits)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.boundary_overlap_pairs(_docs(sf_dir, ["doc_id", "text"]))


def _q_attribution_last_touch(sf_dir: str):
    """Last-touch attribution: each purchase event's value credited to the
    user's immediately preceding event_type, '(none)' for first touches
    (relational.attribution_last_touch); oracle replays the LAG window."""
    from distributed_system___ocr_ray.pipelines import relational

    return relational.attribution_last_touch(sf_dir)


def _q_l_diversity_audit(sf_dir: str):
    """l-diversity audit over (event_type, day) cells: events, distinct
    users, at_risk flag where n_users < 5 (analytics.l_diversity_audit);
    oracle is the direct COUNT DISTINCT replay."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
    )
    return analytics.l_diversity_audit(ds)


def _q_padding_waste_by_bucket(sf_dir: str):
    """Length-bucketed batching padding audit: power-of-two token buckets,
    exact ppm of padded slots per bucket (analytics.padding_waste_by_bucket);
    oracle replays the bucket ladder as a CASE chain (no log2 floats)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.padding_waste_by_bucket(_docs(sf_dir, ["text"]))


def _q_order_total_reconciliation(sf_dir: str):
    """Header-vs-detail reconciliation: o_totalprice against the order's
    summed lineitem extendedprice*(1-disc)*(1+tax) cents, per-status
    (analytics.order_total_reconciliation); oracle is the LEFT JOIN +
    FILTER replay on the same float chain."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    return analytics.order_total_reconciliation(orders, lineitem)


def _q_chao1_vocab_estimate(sf_dir: str):
    """Chao1 unseen-vocabulary estimate + Good-Turing coverage from the
    singleton/doubleton counts (analytics.chao1_vocab_estimate); oracle
    replays the word-frequency CTE and the integer-exact bias-corrected
    Chao1 / coverage arithmetic."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.chao1_vocab_estimate(_docs(sf_dir, ["text"]))


def _q_real_pdf_roundtrip(sf_dir: str):
    """End-to-end exercise of the REAL PDF codec on every English doc:
    write each text through functions/pdftext.make_pdf as two runs
    emitted in REVERSED stream order (second half at a lower y first),
    FlateDecode-compressed, then extract with the vendored ISO-32000
    parser -- geometric reading-order reconstruction must reassemble the
    original word order for every doc. Identity oracle: the roundtrip is
    exact on the single-space ASCII en corpus, so the SQL twin is a plain
    projection. Actor-pool map_batches; only (doc_id, text_out) rows move."""
    import ray.data as rd

    class PdfRoundtrip:
        def __init__(self):
            from distributed_system___ocr_ray.functions import pdftext

            self.pdftext = pdftext

        def __call__(self, batch: pa.Table) -> pa.Table:
            pt = self.pdftext
            outs = []
            for text in batch.column("text").to_pylist():
                words = text.split()
                k = len(words) // 2
                first, second = " ".join(words[:k]), " ".join(words[k:])
                pdf = pt.make_pdf(
                    [[(72.0, 650.0, second), (72.0, 700.0, first)]])
                outs.append(pt.extract_text(pdf).replace("\n", " "))
            return pa.table({"doc_id": batch.column("doc_id"),
                             "text_out": pa.array(outs, pa.string())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    ds = ds.filter(expr="lang == 'en'").drop_columns(["lang"])
    return ds.map_batches(PdfRoundtrip, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 8))


def _q_mattr_by_lang(sf_dir: str):
    """MATTR moving-average type-token ratio per language, window 25
    (analytics.mattr_by_lang); oracle replays every window's distinct
    count via generate_series + list_slice + list_distinct."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.mattr_by_lang(_docs(sf_dir, ["text", "lang"]))


def _q_gopher_quality_flags(sf_dir: str):
    """Gopher-rule quality flags per doc (word-count window, mean word
    length, symbol ratio, stopword floor, composite keep) --
    analytics.gopher_quality_flags; oracle replays every count with the
    shared stopword list."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.gopher_quality_flags(_docs(sf_dir, ["doc_id", "text"]))


def _q_real_png_roundtrip(sf_dir: str):
    """End-to-end exercise of the vendored PNG codec on every English
    doc: the text's byte prefix (truncated to a whole number of 32-wide
    rows) becomes a grayscale PNG via png.encode, decodes back through
    the full filter/CRC path, and the recovered bytes are re-read as
    text. Identity oracle: substr(text, 1, floor(len/32)*32). Docs
    shorter than one row fall back to a 1-wide column image so nothing
    is skipped."""
    import ray.data as rd

    class PngRoundtrip:
        WIDTH = 32

        def __init__(self):
            from distributed_system___ocr_ray.functions import png

            self.png = png

        def __call__(self, batch: pa.Table) -> pa.Table:
            outs = []
            for text in batch.column("text").to_pylist():
                data = text.encode("ascii")
                w = self.WIDTH if len(data) >= self.WIDTH else max(len(data), 1)
                k = (len(data) // w) * w
                img = np.frombuffer(data[:k], dtype=np.uint8).reshape(-1, w)
                if img.size == 0:
                    outs.append("")
                    continue
                back = self.png.decode(self.png.encode(img))
                outs.append(back.reshape(-1).tobytes().decode("ascii"))
            return pa.table({"doc_id": batch.column("doc_id"),
                             "text_out": pa.array(outs, pa.string())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    ds = ds.filter(expr="lang == 'en'").drop_columns(["lang"])
    return ds.map_batches(PngRoundtrip, batch_format="pyarrow",
                          batch_size=256, concurrency=(1, 8))


def _q_corpus_datacard(sf_dir: str):
    """One-row corpus data card: the summary a curation pipeline publishes
    with a release -- doc/lang/source counts, exact-dup rows, total chars
    and tokens, mean quality. ONE pass over (text, lang, source): every
    field folds from per-block scalar partials except the dup count, whose
    hash-only exchange is the exact_dedup_groups plan; no row-domain
    shuffle anywhere. SQL twin composes the same folds."""
    import pandas as pd
    import ray.data as rd

    from distributed_system___ocr_ray.functions import dedup as dk
    from distributed_system___ocr_ray.functions import textstats as ts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang", "source"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        q = ts.quality_features(batch["text"])["quality_ppm"].to_numpy(np.int64)
        toks = batch["text"].fillna("").str.count(r"[a-z0-9]+").to_numpy(np.int64)
        return pd.DataFrame({
            "n_docs": pd.Series([len(batch)], dtype=np.int64),
            "langs": [",".join(sorted(set(batch["lang"])))],
            "sources": [",".join(sorted(set(batch["source"])))],
            "total_chars": pd.Series([int(batch["text"].fillna("").str.len().sum())], dtype=np.int64),
            "total_tokens": pd.Series([int(toks.sum())], dtype=np.int64),
            "quality_sum": pd.Series([int(q.sum())], dtype=np.int64),
        })

    p = ds.map_batches(partials, batch_format="pandas").to_pandas()

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(dk.sha256_hex(batch.column("text").to_pylist()))})

    from ray.data.aggregate import Count

    distinct = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h").aggregate(Count(alias_name="c")).count()
    )
    n_docs = int(p["n_docs"].sum())
    langs = set()
    sources = set()
    for ls in p["langs"]:
        langs.update(x for x in ls.split(",") if x)
    for ss in p["sources"]:
        sources.update(x for x in ss.split(",") if x)
    return pd.DataFrame({
        "n_docs": pd.Series([n_docs], dtype=np.int64),
        "n_langs": pd.Series([len(langs)], dtype=np.int64),
        "n_sources": pd.Series([len(sources)], dtype=np.int64),
        "dup_rows": pd.Series([n_docs - int(distinct)], dtype=np.int64),
        "total_chars": pd.Series([int(p["total_chars"].sum())], dtype=np.int64),
        "total_tokens": pd.Series([int(p["total_tokens"].sum())], dtype=np.int64),
        "mean_quality_ppm": pd.Series(
            [int(p["quality_sum"].sum()) // max(n_docs, 1)], dtype=np.int64),
    })


def _q_vocab_pruning_plan(sf_dir: str):
    """Tokenizer min-count pruning table: surviving types and OOV
    occurrence ppm per threshold, folded from the vocabulary's frequency
    histogram (analytics.vocab_pruning_plan); oracle replays via a
    threshold CROSS JOIN over the word-frequency CTE."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.vocab_pruning_plan(_docs(sf_dir, ["text"]))


def _q_dedup_family_agreement(sf_dir: str):
    """Pairwise Jaccard agreement between the three SUB-LINEAR near-dup
    pair generators (minhash, simhash, winnow) over the same corpus
    (analytics.dedup_family_agreement -- the which-signal-to-trust
    meta-audit; exact ngram demoted to an opt-in audit, VERDICT r4 #1);
    oracle composes the three already-green pair replays and the set
    arithmetic."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.dedup_family_agreement(_docs(sf_dir, ["doc_id", "text"]))


def _q_unigram_power_sample_plan(sf_dir: str):
    """Word2vec negative-sampling distribution: token weights ~ n^(3/4)
    via the nested floor-sqrt identity, vocabulary-wide floor-div shares,
    top-30 by (weight DESC, token) (analytics.unigram_power_sample_plan
    -- the token-level analog of lang_temperature_plan); oracle replays
    counts, both sqrt floors, the share division and the ranked cut."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.unigram_power_sample_plan(_docs(sf_dir, ["text"]))


def _q_ams_f2_audit(sf_dir: str):
    """AMS second-moment sketch audit: 17 md5-signed linear estimators,
    median of squares vs exact F2 of the token counts
    (analytics.ams_f2_audit -- completing the sketch-accuracy ladder
    beside HLL/CMS/KMV/Bloom); oracle replays signs, sums, the median
    row pick and the floor-div error ppm."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.ams_f2_audit(_docs(sf_dir, ["text"]))


def _q_winnow_dup_clusters(sf_dir: str):
    """Copy-detection clusters over the winnowing (MOSS) pair graph --
    fourth edge generator for the cluster matrix beside
    minhash/ngram/simhash; same connected-components engine, oracle
    wraps the full winnow pair replay as a CTE with the shared
    recursive-closure pattern."""
    from distributed_system___ocr_ray.pipelines import analytics

    pairs = analytics.winnow_fingerprint_pairs(_docs(sf_dir, ["doc_id", "text"]))
    out = analytics.dedup_clusters(pairs)
    return _pairs_df(out, {"doc_id": "int64", "cluster_id": "int64"})


def _q_winnow_fingerprint_pairs(sf_dir: str):
    """Winnowing (MOSS) copy-detection pairs: window-minimum 20-gram
    fingerprints, pairs sharing >= 5 prints with the shared count
    (analytics.winnow_fingerprint_pairs); the packed (hash, reversed-pos)
    int64 makes the rightmost-tie rule a plain window MIN the oracle
    replays verbatim."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.winnow_fingerprint_pairs(_docs(sf_dir, ["doc_id", "text"]))


def _q_cdc_chunk_dedup(sf_dir: str):
    """Content-defined chunking dedup audit: rolling-hash (W=16, mod
    2^31-1, boundary mask 64) chunk boundaries, corpus-wide chunk-store
    savings (analytics.cdc_chunk_dedup); oracle replays the 16-term
    polynomial hash expression and DISTINCTs the chunk strings."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.cdc_chunk_dedup(_docs(sf_dir, ["text"]))


def _q_gdpr_erasure_plan(sf_dir: str):
    """Erasure sizing per table for a derived ~2% deletion cohort
    (analytics.gdpr_erasure_plan); oracle filters each table with the
    same md5 predicate and counts rows + distinct subjects."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.gdpr_erasure_plan(sf_dir)


def _q_max_coverage_select(sf_dir: str):
    """Greedy max-coverage selection of 5 docs by uncovered word-bigram
    gain (analytics.max_coverage_select); oracle unrolls the k rounds as
    chained CTEs (argmax with (g DESC, doc_id) LIMIT 1 per round)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.max_coverage_select(_docs(sf_dir, ["doc_id", "text"]))


def _q_blocklist_screen(sf_dir: str):
    """Lexicon content screen: per (category, lang) docs-with-hits and
    total whole-token hits over the default category lists
    (analytics.blocklist_screen); oracle replays each category with the
    proven tokenize + list_contains construction."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.blocklist_screen(_docs(sf_dir, ["text", "lang"]))


def _q_boundary_stitch_chains(sf_dir: str):
    """Chain-size histogram of boundary-overlap connected components
    (analytics.boundary_stitch_chains: pairs -> dedup_clusters pointer
    jumping -> histogram); oracle closes the shared boundary edge CTE
    recursively."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.boundary_stitch_chains(_docs(sf_dir, ["doc_id", "text"]))


def _q_pseudonym_collision_audit(sf_dir: str):
    """Birthday-bound collision audit of a 16-bit pseudonym space over
    event subjects (analytics.pseudonym_collision_audit); oracle is the
    direct COUNT DISTINCT replay of ids and md5-mod pseudonyms."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return analytics.pseudonym_collision_audit(ds)


def _q_code_switch_rate_by_source(sf_dir: str):
    """Mixed-language doc rate per source: >= 2 languages with >= 2
    whole-token stopword hits (analytics.code_switch_rate_by_source);
    oracle replays the per-language stopword membership counts."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.code_switch_rate_by_source(_docs(sf_dir, ["text", "source"]))


def _q_token_budget_waterfill(sf_dir: str):
    """Water-filling token allocation: per-source supply capped at the
    max level whose allocation fits 2/5 of the corpus
    (analytics.token_budget_waterfill); oracle replays the prefix-sum
    closed form with one window cumsum."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.token_budget_waterfill(_docs(sf_dir, ["text", "source"]))


def _q_random_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk corpus over the shared md5
    citation graph (analytics.random_walks); oracle unrolls the hops as
    step CTEs over the sorted-adjacency list table."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.random_walks(_docs(sf_dir, ["doc_id"]))


def _q_kwic_snippets(sf_dir: str):
    """Keyword-in-context concordance: first 20 occurrences per query
    term with a +-3-token snippet (analytics.kwic_snippets); oracle
    replays positions + list_slice + QUALIFY row_number."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.kwic_snippets(_docs(sf_dir, ["doc_id", "text"]))


def _q_leakage_free_split_audit(sf_dir: str):
    """Near-dup-aware vs naive train/val split policies measured on the
    same corpus: straddling multi-doc near-dup clusters per policy
    (analytics.leakage_free_split_audit); oracle composes the green
    MinHash recursive-CC replay with md5 split predicates."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.leakage_free_split_audit(_docs(sf_dir, ["doc_id", "text"]))


def _q_jsonl_source_daily(sf_dir: str):
    """JSONL ingest roundtrip: events exported once as JSONL shards
    (ints + day strings, precision-lossless by construction), re-read
    via ray.data.read_json, aggregated (analytics.text_source_daily);
    oracle aggregates the original parquet."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.text_source_daily(sf_dir, fmt="json")


def _q_csv_source_daily(sf_dir: str):
    """CSV ingest roundtrip via ray.data.read_csv — same contract as the
    JSONL variant (analytics.text_source_daily)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.text_source_daily(sf_dir, fmt="csv")


def _q_matryoshka_recall_audit(sf_dir: str):
    """Truncated-dims (first 16) vs full-width cosine top-10 overlap per
    query (analytics.matryoshka_recall_audit); oracle runs both rankings
    with list_slice + list_cosine_similarity and counts the overlap."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.matryoshka_recall_audit(ds, _query_matrix(sf_dir))


def _q_mmr_diverse_topk(sf_dir: str):
    """MMR diversity re-ranking of each query's cosine top-50 pool
    (analytics.mmr_diverse_topk); oracle unrolls the greedy steps with
    GREATEST-penalty scoring over list_cosine_similarity."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.mmr_diverse_topk(ds, _query_matrix(sf_dir))


def _q_embedding_covariance_topk(sf_dir: str):
    """Top-20 |covariance| embedding dimension pairs from one Gram-matrix
    partial pass (analytics.embedding_covariance_topk -- the PCA/whitening
    preprocessing primitive); oracle quantizes to the same integer
    milli-units, self-joins the unnested (row, dim, value) triples, and
    replays cov_num = n*S_ab - s_a*s_b exactly."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return analytics.embedding_covariance_topk(ds)


def _q_embedding_outliers_topk(sf_dir: str):
    """Top-20 vectors farthest (exact integer L2) from their own label's
    floor-div integer centroid (analytics.embedding_outliers_topk -- the
    mislabel screen); oracle replays quantization, centroid floor
    division and the (dist DESC, vec_id) rank."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.embedding_outliers_topk(ds)


def _q_centroid_separation_audit(sf_dir: str):
    """Per-label within-cluster mean squared distance vs nearest-other-
    centroid distance (analytics.centroid_separation_audit -- the
    Davies-Bouldin-style separability screen); oracle replays quantization,
    truncating-div centroids, exact integer SSDs and the (dist, label)
    nearest tie-break."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    return analytics.centroid_separation_audit(ds)


def _q_source_centroid_geometry(sf_dir: str):
    """Per-source embedding-centroid pairwise geometry (exact integer dot
    products + squared norms; analytics.source_centroid_geometry -- the
    domain-shift audit across corpus slices). Cosine left rational: the
    three integers determine it exactly on both sides."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.source_centroid_geometry(sf_dir)


def _q_bitext_mining_topk(sf_dir: str):
    """Margin-based bitext mining en->de over the embeddings table
    (analytics.bitext_mining_topk, the CCMatrix/LASER recipe with the
    all-integer absolute margin); oracle replays the cross-slice dot
    grid, the (dot DESC, id) top-2 and the (margin DESC, src) top-20."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.bitext_mining_topk(sf_dir)


def _q_kcenter_coreset(sf_dir: str):
    """Gonzalez farthest-first k-center coreset over the embeddings table
    (analytics.kcenter_coreset -- geometry-aware seed/coreset selection);
    oracle replays the milli quantization, the min-id seed, and every
    round's exact-integer argmax with the (distsq DESC, vec_id) tie-break
    as an unrolled CTE chain."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return analytics.kcenter_coreset(ds, k=8)


def _q_pca_top_component(sf_dir: str):
    """Top principal component of the embedding cloud by fixed-round
    power iteration on the exact integer covariance numerator
    (analytics.pca_top_component -- the anisotropy/rank-collapse audit);
    oracle replays the one-pass moment fold and all 12 rounds of
    sign-split truncating rescale as unrolled MATERIALIZED CTEs."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return analytics.pca_top_component(ds)


def _q_rendezvous_routing_balance(sf_dir: str):
    """Highest-random-weight (rendezvous) doc->worker routing balance
    over 16 workers (analytics.rendezvous_routing_balance -- the elastic
    affinity router audit); oracle replays the md5 score grid and the
    (score DESC, worker) argmax with QUALIFY row_number."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return analytics.rendezvous_routing_balance(ds, n_workers=16)


def _q_lpa_communities(sf_dir: str):
    """Synchronous label-propagation communities with self-vote and
    smallest-label tie-break over the md5-derived citation graph, 4 fixed
    rounds (analytics.lpa_communities); oracle replays the undirected
    edge symmetrization and every voting round as MATERIALIZED CTEs."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.lpa_communities(_docs(sf_dir, ["doc_id"]))


def _q_kcore_nodes(sf_dir: str):
    """4-round 2-core peel of the md5-derived citation graph
    (analytics.kcore_nodes -- the dense-region prefilter); oracle
    replays every peel round as MATERIALIZED CTEs (surviving-subgraph
    degree, threshold filter)."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.kcore_nodes(_docs(sf_dir, ["doc_id"]))


def _q_kmv_distinct_audit(sf_dir: str):
    """KMV bottom-k distinct-count audit over events.user_id
    (analytics.kmv_distinct_audit -- the order-statistics sketch next to
    the HLL/Bloom/CMS accuracy audits); oracle replays the 'kmv:' md5-u64
    bottom-256 and the (k-1)*2^64 // m_k HUGEINT estimator."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return analytics.kmv_distinct_audit(ev)


def _q_langid_kappa(sf_dir: str):
    """Cohen's kappa between labeled lang and the n-gram heuristic
    (analytics.langid_kappa -- the chance-corrected routing-trust
    scalar); oracle wraps the char-for-char language_id replay and the
    HUGEINT marginal arithmetic."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.langid_kappa(_docs(sf_dir, ["doc_id", "lang", "text"]))


def _q_hits_scores(sf_dir: str):
    """HITS hubs/authorities over the md5-derived citation graph, 3
    fixed rounds of exact integer max-renormalized mutual recursion
    (analytics.hits_scores); oracle unrolls every half-step as
    MATERIALIZED CTEs and replays the (auth DESC, id) top-20."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.hits_scores(_docs(sf_dir, ["doc_id"]))


def _q_local_clustering_topk(sf_dir: str):
    """Top-20 nodes by local clustering coefficient over the md5-derived
    citation graph (analytics.local_clustering_topk -- per-node
    refinement of triangle_count); oracle replays the apex-carrying
    wedge probe, the 3-way triangle credit, and the exact truncating
    ppm with the (lcc DESC, doc_id) rank."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.local_clustering_topk(_docs(sf_dir, ["doc_id"]))


def _q_degree_assortativity(sf_dir: str):
    """Newman degree assortativity of the md5-derived citation graph
    (analytics.degree_assortativity): exact-integer endpoint-degree
    Pearson over the symmetrized undirected edge list, shipped as
    sign-split truncating r_ppm; oracle replays edges, degrees and the
    HUGEINT moment arithmetic."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.degree_assortativity(_docs(sf_dir, ["doc_id"]))


def _q_dsir_importance_weights(sf_dir: str):
    """DSIR-style hashed-unigram importance weights, target slice
    lang='en' (analytics.dsir_importance_weights -- the data-selection
    scorer); oracle replays the md5 bucket grid, the bits-resolution
    per-bucket log-ratio via length(bin(n+1))-1, and the sign-split
    truncating milli mean."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.dsir_importance_weights(sf_dir)


def _q_nearest_centroid_confusion(sf_dir: str):
    """Nearest-centroid confusion matrix over the embeddings table
    (analytics.nearest_centroid_confusion -- the label-noise estimator);
    oracle replays quantization, truncating-div centroids, exact integer
    distances and the (dist, label) argmin tie-break."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])
    return analytics.nearest_centroid_confusion(ds)


def _q_watermark_late_counts(sf_dir: str):
    """Global-watermark allowed-lateness audit per event-time hour
    (relational.watermark_late_counts: arrival order = event_id, watermark
    = running max event time - 300 s, strict drop test); oracle is the
    window-function replay MAX(us) OVER (ORDER BY event_id ... 1
    PRECEDING)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import relational

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    return relational.watermark_late_counts(ds)


def _q_quality_dup_calibration(sf_dir: str):
    """Exact-dup participation rate per fixed quality-ppm bin
    (analytics.quality_dup_calibration -- is the quality score a dedup
    proxy?); oracle composes the green quality CTEs with the md5-prefix
    text-group key and the same clamped bin + floor-div ppm."""
    from distributed_system___ocr_ray.pipelines import analytics

    return analytics.quality_dup_calibration(_docs(sf_dir, ["doc_id", "text"]))


def _q_lang_temperature_plan(sf_dir: str):
    """alpha=0.5 temperature-sampling plan per language: sqrt weights,
    target share and resample factor in exact floor-divided ppm
    (analytics.lang_temperature_plan -- the mC4/XLM-R low-resource
    rebalance); oracle replays FLOOR(SQRT(n)) and the integer share
    arithmetic."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return analytics.lang_temperature_plan(ds)


def _q_binary_hamming_topk(sf_dir: str):
    """Binary (sign-bit) quantization recall audit: Hamming top-10 vs
    exact integer-L2 top-10 per query (analytics.binary_hamming_topk --
    the 1-bit rung of the compression ladder beside pq/matryoshka);
    oracle replays sign bits, per-dim mismatch counts, milli-int L2 and
    both (dist, vec_id) rankings."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.binary_hamming_topk(ds, _query_matrix(sf_dir))


def _q_sq8_recall_audit(sf_dir: str):
    """Scalar-quantization (SQ8, FAISS-style per-dim 8-bit grid) recall
    audit: code-space L2 top-k vs exact milli-int L2 top-k, recall@10 per
    query -- completes the ANN-compression ladder beside PQ / binary /
    Matryoshka. Integer end-to-end (milli-int grid, non-negative floor
    division), so the oracle replays the grid fit, encoding, both
    rankings and the overlap exactly."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.sq8_recall_audit(ds, _query_matrix(sf_dir), k=10)


def _q_pq_recall_audit(sf_dir: str):
    """Product-quantization ADC recall@10 vs exact integer L2 per query
    (analytics.pq_recall_audit: md5-elected seeds, one Lloyd step,
    truncating-div integer codebook -- the FAISS-style compression audit
    beside ivf_topk's pruning audit); oracle replays seed election,
    assignment, centroids, encoding, the ADC lookup sum and both top-10
    rankings step for step (_pq_sql)."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return analytics.pq_recall_audit(ds, _query_matrix(sf_dir))


def _q_t_closeness_audit(sf_dir: str):
    """t-closeness per event_type cell: integer-ppm EMD between the cell's
    and the global $10-binned value distribution (analytics.
    t_closeness_audit, completing the k-anonymity / l-diversity /
    t-closeness release ladder); oracle replays the zero-filled bin grid,
    the cumulative cross products and the exact floor-divided ppm."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return analytics.t_closeness_audit(ds)


def _q_bootstrap_ci_mean(sf_dir: str):
    """Poisson-bootstrap 95% CI for mean order value in integer cents x100
    (analytics.bootstrap_ci_mean -- Chamandy et al.'s hash-seeded Poisson
    weights, the bootstrap that parallelizes); oracle replays the md5 ->
    64 affine draws -> CDF-ladder weights -> per-resample floor-divided
    means -> percentile rank pick, all on shared integer literals."""
    import ray.data as rd

    from distributed_system___ocr_ray.pipelines import analytics

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return analytics.bootstrap_ci_mean(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # extraction engine (flagship + SQL-checkable shadows)
        "extract_interleaved": _q_extract_interleaved,
        "extract_salted": _q_extract_salted,
        "extract_flat_identity": _q_extract_flat_identity,
        "span_kind_counts": _q_span_kind_counts,
        "extract_status_counts": _q_extract_status_counts,
        "doc_completeness_by_lang": _q_doc_completeness_by_lang,
        "span_profile_by_kind": _q_span_profile_by_kind,
        "retry_plan": _q_retry_plan,
        "media_ref_counts": _q_media_ref_counts,
        "render_html": _q_render_html,
        "extract_sharded": _q_extract_sharded,
        # relational toolbox
        "docs_by_lang": _q_docs_by_lang,
        "doc_stats_by_source": _q_doc_stats_by_source,
        "filter_project_documents": _q_filter_project,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "events_daily": _q_events_daily,
        "daily_activity": _q_daily_activity,
        "ols_trend": _q_ols_trend,
        "top_users_by_value": _q_top_users,
        "order_lineitem_join": _q_order_lineitem_join,
        "last_order_before_event": _q_last_order_before_event,
        "session_windows": _q_session_windows,
        "sliding_windows": _q_sliding_windows,
        "approx_distinct_users": _q_approx_distinct_users,
        "top_orders_per_segment": _q_top_orders_per_segment,
        # text analysis
        "token_count_by_lang": _q_token_count_by_lang,
        "quality_by_lang": _q_quality_by_lang,
        "median_order_value": _q_median_order_value,
        "weighted_median_price": _q_weighted_median_price,
        "pps_sample": _q_pps_sample,
        "profile_documents": _q_profile_documents,
        "top_tokens": _q_top_tokens,
        "language_id": _q_language_id,
        "quality_scores": _q_quality_scores,
        "fingerprints": _q_fingerprints,
        "repetition_stats": _q_repetition_stats,
        # dedup family
        "exact_dedup_groups": _q_exact_dedup_groups,
        "exact_dedup_rows": _q_exact_dedup_rows,
        "novel_docs": _q_novel_docs,
        "dedup_stats": _q_dedup_stats,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "ngram_dup_clusters": _q_ngram_dup_clusters,
        "ngram_dedup_keepers": _q_ngram_dedup_keepers,
        "embedding_neardup": _q_embedding_neardup,
        "extract_embed_neardup": _q_extract_embed_neardup,
        "minhash_dup_clusters": _q_minhash_dup_clusters,
        "simhash_dup_clusters": _q_simhash_dup_clusters,
        "clean_corpus_keepers": _q_clean_corpus_keepers,
        "sample_docs": _q_sample_docs,
        "stratified_sample": _q_stratified_sample,
        "dataset_split_counts": _q_dataset_split_counts,
        "training_corpus_counts": _q_training_corpus_counts,
        "ingest_increment_counts": _q_ingest_increment_counts,
        "corpus_report": _q_corpus_report,
        "median_value_by_event_type": _q_median_value_by_event_type,
        "user_median_value_sketch": _q_user_median_value_sketch,
        "debounce_events": _q_debounce_events,
        "tfidf_keywords": _q_tfidf_keywords,
        # corpus hygiene (round 3)
        "redact_pii": _q_redact_pii,
        "contamination_flags": _q_contamination_flags,
        "pack_sequences": _q_pack_sequences,
        "budget_select": _q_budget_select,
        "mixture_sample": _q_mixture_sample,
        "cms_top_tokens": _q_cms_top_tokens,
        "epoch_shuffle": _q_epoch_shuffle,
        "sample_exact_n": _q_sample_exact_n,
        "line_dedup": _q_line_dedup,
        "novel_docs_bloom": _q_novel_docs_bloom,
        "chunk_documents": _q_chunk_documents,
        "novel_docs_minhash": _q_novel_docs_minhash,
        "sample_n_per_group": _q_sample_n_per_group,
        "zscore_by_lang": _q_zscore_by_lang,
        "funnel_counts": _q_funnel_counts,
        "domain_counts": _q_domain_counts,
        "retention_cohorts": _q_retention_cohorts,
        "sample_by_quality": _q_sample_by_quality,
        "value_histogram": _q_value_histogram,
        "pruned_range_read": _q_pruned_range_read,
        "postings_lookup": _q_postings_lookup,
        "percent_rank_by_lang": _q_percent_rank_by_lang,
        "customer_order_counts": _q_customer_order_counts,
        "cow_delete_counts": _q_cow_delete_counts,
        "merge_upsert_counts": _q_merge_upsert_counts,
        "change_feed_counts": _q_change_feed_counts,
        "shipments_within_7d": _q_shipments_within_7d,
        "docs_rollup": _q_docs_rollup,
        "docs_cube": _q_docs_cube,
        "events_pivot_daily": _q_events_pivot_daily,
        "events_unpivot_daily": _q_events_unpivot_daily,
        "benford_first_digit": _q_benford_first_digit,
        "zipf_bits_audit": _q_zipf_bits_audit,
        "hapax_rate_by_source": _q_hapax_rate_by_source,
        "source_tv_distance": _q_source_tv_distance,
        "token_burstiness": _q_token_burstiness,
        "graph_reciprocity": _q_graph_reciprocity,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "last_event_per_user": _q_last_event_per_user,
        "dedup_keep_best": _q_dedup_keep_best,
        "running_totals": _q_running_totals,
        "robust_outliers": _q_robust_outliers,
        "collocations": _q_collocations,
        # similarity search / retrieval
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "ivf_indexed_topk": _q_ivf_indexed_topk,
        "kmeans_clusters": _q_kmeans_clusters,
        "semdedup_keepers": _q_semdedup_keepers,
        "pagerank_top": _q_pagerank_top,
        "ppr_top": _q_ppr_top,
        "bfs_levels": _q_bfs_levels,
        "anf_effective_diameter": _q_anf_effective_diameter,
        "rnn_pairs": _q_rnn_pairs,
        "kmeans_inertia": _q_kmeans_inertia,
        "cluster_balanced_sample": _q_cluster_balanced_sample,
        "hybrid_topk": _q_hybrid_topk,
        "decayed_user_value": _q_decayed_user_value,
        "triangle_count": _q_triangle_count,
        "in_degree_histogram": _q_in_degree_histogram,
        "table_checksum": _q_table_checksum,
        "phrase_doc_counts": _q_phrase_doc_counts,
        "oov_rate_by_lang": _q_oov_rate_by_lang,
        "dup_shingle_rate": _q_dup_shingle_rate,
        "doc_boilerplate": _q_doc_boilerplate,
        "dup_spans": _q_dup_spans,
        "ks_priority_drift": _q_ks_priority_drift,
        "sampled_quantile_audit": _q_sampled_quantile_audit,
        "compaction_bins": _q_compaction_bins,
        "shingle_containment": _q_shingle_containment,
        "cusum_changepoints": _q_cusum_changepoints,
        "bigram_surprisal_by_source": _q_bigram_surprisal_by_source,
        "key_density_audit": _q_key_density_audit,
        "rolling_median_daily": _q_rolling_median_daily,
        "doclen_deciles_by_source": _q_doclen_deciles_by_source,
        "value_moments_by_type": _q_value_moments_by_type,
        "order_backlog_daily": _q_order_backlog_daily,
        "dow_revenue_profile": _q_dow_revenue_profile,
        "completeness_audit": _q_completeness_audit,
        "first_event_after_order": _q_first_event_after_order,
        "doc_bigram_surprisal_topk": _q_doc_bigram_surprisal_topk,
        "negative_samples": _q_negative_samples,
        "span_corruption_plan": _q_span_corruption_plan,
        "two_hop_reach": _q_two_hop_reach,
        "revenue_time_rollup": _q_revenue_time_rollup,
        "token_diversity_by_lang": _q_token_diversity_by_lang,
        "doc_surprisal_topk": _q_doc_surprisal_topk,
        "sentence_stats_by_lang": _q_sentence_stats_by_lang,
        "readability_by_lang": _q_readability_by_lang,
        "session_paths": _q_session_paths,
        "minhash_recall_audit": _q_minhash_recall_audit,
        "trimmed_mean_price": _q_trimmed_mean_price,
        "top_revenue_suppliers": _q_top_revenue_suppliers,
        "big_volume_orders": _q_big_volume_orders,
        "hll_error_audit": _q_hll_error_audit,
        "bloom_fp_audit": _q_bloom_fp_audit,
        "cms_error_audit": _q_cms_error_audit,
        "dup_size_histogram": _q_dup_size_histogram,
        "join_size_audit": _q_join_size_audit,
        "interarrival_quantiles": _q_interarrival_quantiles,
        "rfm_segments": _q_rfm_segments,
        "langid_confusion": _q_langid_confusion,
        "supplier_hhi": _q_supplier_hhi,
        "revenue_share_by_nation": _q_revenue_share_by_nation,
        "k_anonymity": _q_k_anonymity,
        "top_prices_with_ties": _q_top_prices_with_ties,
        "first_last_order": _q_first_last_order,
        "split_skew_audit": _q_split_skew_audit,
        "session_durations": _q_session_durations,
        "important_parts": _q_important_parts,
        "inactive_high_balance": _q_inactive_high_balance,
        "interval_overlap_pairs": _q_interval_overlap_pairs,
        "vocab_growth": _q_vocab_growth,
        "link_prediction_topk": _q_link_prediction_topk,
        "cross_source_dups": _q_cross_source_dups,
        "encoding_audit": _q_encoding_audit,
        "quality_length_corr": _q_quality_length_corr,
        "shuffle_mix_audit": _q_shuffle_mix_audit,
        "cheapest_supplier": _q_cheapest_supplier,
        "lang_source_chi2": _q_lang_source_chi2,
        "normalized_dedup": _q_normalized_dedup,
        "out_of_order_audit": _q_out_of_order_audit,
        "dominant_suppliers": _q_dominant_suppliers,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "trailing_rows_sum": _q_trailing_rows_sum,
        "forecast_revenue_delta": _q_forecast_revenue_delta,
        "shipping_priority": _q_shipping_priority,
        "nation_trade_volume": _q_nation_trade_volume,
        "market_share": _q_market_share,
        "small_qty_revenue": _q_small_qty_revenue,
        "supplier_count_by_part": _q_supplier_count_by_part,
        "waiting_suppliers": _q_waiting_suppliers,
        "product_profit": _q_product_profit,
        "order_priority_check": _q_order_priority_check,
        "line_priority_counts": _q_line_priority_counts,
        "customer_order_distribution": _q_customer_order_distribution,
        "returned_items": _q_returned_items,
        "promo_revenue": _q_promo_revenue,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "skyline_orders": _q_skyline_orders,
        "mode_event_type": _q_mode_event_type,
        "fk_orphan_audit": _q_fk_orphan_audit,
        "longest_streak": _q_longest_streak,
        "user_active_coverage": _q_user_active_coverage,
        "peak_concurrent_sessions": _q_peak_concurrent_sessions,
        "basket_pairs": _q_basket_pairs,
        "basket_lift": _q_basket_lift,
        "corr_qty_price": _q_corr_qty_price,
        "forward_fill_daily": _q_forward_fill_daily,
        "event_transitions": _q_event_transitions,
        "approx_users_by_type": _q_approx_users_by_type,
        "new_users_daily": _q_new_users_daily,
        "bucketed_join_revenue": _q_bucketed_join_revenue,
        "label_centroids": _q_label_centroids,
        "incremental_daily_totals": _q_incremental_daily_totals,
        "late_orders_by_priority": _q_late_orders_by_priority,
        "time_travel_counts": _q_time_travel_counts,
        "star_join_revenue": _q_star_join_revenue,
        "zorder_2d_prune": _q_zorder_2d_prune,
        "evolved_schema_counts": _q_evolved_schema_counts,
        "typo_pairs": _q_typo_pairs,
        "entity_dedupe_keepers": _q_entity_dedupe_keepers,
        "hive_partition_prune_daily": _q_hive_partition_prune_daily,
        "bloom_pruned_join_revenue": _q_bloom_pruned_join_revenue,
        "encoding_advisor": _q_encoding_advisor,
        "revenue_acf": _q_revenue_acf,
        "event_type_stationary": _q_event_type_stationary,
        "lpa_modularity": _q_lpa_modularity,
        "json_field_stats": _q_json_field_stats,
        "audience_overlap": _q_audience_overlap,
        "customers_without_orders": _q_customers_without_orders,
        "order_count_distribution": _q_order_count_distribution,
        "scd2_history": _q_scd2_history,
        "order_part_list": _q_order_part_list,
        "rolling_7d_sum": _q_rolling_7d_sum,
        "conversion_within": _q_conversion_within,
        "rolling_active_users": _q_rolling_active_users,
        "pit_value_join": _q_pit_value_join,
        "order_decile_stats": _q_order_decile_stats,
        "order_value_gini": _q_order_value_gini,
        "weekly_revenue_wow": _q_weekly_revenue_wow,
        "fulfillment_latency": _q_fulfillment_latency,
        "key_skew": _q_key_skew,
        "spike_days": _q_spike_days,
        "order_rank_global": _q_order_rank_global,
        "quantize_embeddings": _q_quantize_embeddings,
        "bm25_topk": _q_bm25_topk,
        "bm25_prf_topk": _q_bm25_prf_topk,
        "bpe_merge_candidates": _q_bpe_merge_candidates,
        "dp_geometric_counts": _q_dp_geometric_counts,
        "dow_adjusted_spikes": _q_dow_adjusted_spikes,
        "boundary_overlap_pairs": _q_boundary_overlap_pairs,
        "attribution_last_touch": _q_attribution_last_touch,
        "l_diversity_audit": _q_l_diversity_audit,
        "padding_waste_by_bucket": _q_padding_waste_by_bucket,
        "order_total_reconciliation": _q_order_total_reconciliation,
        "chao1_vocab_estimate": _q_chao1_vocab_estimate,
        "real_pdf_roundtrip": _q_real_pdf_roundtrip,
        "real_png_roundtrip": _q_real_png_roundtrip,
        "corpus_datacard": _q_corpus_datacard,
        "gopher_quality_flags": _q_gopher_quality_flags,
        "mattr_by_lang": _q_mattr_by_lang,
        "vocab_pruning_plan": _q_vocab_pruning_plan,
        "winnow_fingerprint_pairs": _q_winnow_fingerprint_pairs,
        "winnow_dup_clusters": _q_winnow_dup_clusters,
        "ams_f2_audit": _q_ams_f2_audit,
        "unigram_power_sample_plan": _q_unigram_power_sample_plan,
        "dedup_family_agreement": _q_dedup_family_agreement,
        "cdc_chunk_dedup": _q_cdc_chunk_dedup,
        "gdpr_erasure_plan": _q_gdpr_erasure_plan,
        "max_coverage_select": _q_max_coverage_select,
        "blocklist_screen": _q_blocklist_screen,
        "boundary_stitch_chains": _q_boundary_stitch_chains,
        "pseudonym_collision_audit": _q_pseudonym_collision_audit,
        "code_switch_rate_by_source": _q_code_switch_rate_by_source,
        "token_budget_waterfill": _q_token_budget_waterfill,
        "random_walks": _q_random_walks,
        "kwic_snippets": _q_kwic_snippets,
        "leakage_free_split_audit": _q_leakage_free_split_audit,
        "jsonl_source_daily": _q_jsonl_source_daily,
        "csv_source_daily": _q_csv_source_daily,
        "matryoshka_recall_audit": _q_matryoshka_recall_audit,
        "mmr_diverse_topk": _q_mmr_diverse_topk,
        "bootstrap_ci_mean": _q_bootstrap_ci_mean,
        "embedding_covariance_topk": _q_embedding_covariance_topk,
        "t_closeness_audit": _q_t_closeness_audit,
        "pq_recall_audit": _q_pq_recall_audit,
        "sq8_recall_audit": _q_sq8_recall_audit,
        "lang_temperature_plan": _q_lang_temperature_plan,
        "quality_dup_calibration": _q_quality_dup_calibration,
        "watermark_late_counts": _q_watermark_late_counts,
        "embedding_outliers_topk": _q_embedding_outliers_topk,
        "centroid_separation_audit": _q_centroid_separation_audit,
        "nearest_centroid_confusion": _q_nearest_centroid_confusion,
        "source_centroid_geometry": _q_source_centroid_geometry,
        "kcenter_coreset": _q_kcenter_coreset,
        "bitext_mining_topk": _q_bitext_mining_topk,
        "pca_top_component": _q_pca_top_component,
        "rendezvous_routing_balance": _q_rendezvous_routing_balance,
        "dsir_importance_weights": _q_dsir_importance_weights,
        "lpa_communities": _q_lpa_communities,
        "degree_assortativity": _q_degree_assortativity,
        "local_clustering_topk": _q_local_clustering_topk,
        "hits_scores": _q_hits_scores,
        "langid_kappa": _q_langid_kappa,
        "nb_source_classifier": _q_nb_source_classifier,
        "quality_neardup_auc": _q_quality_neardup_auc,
        "texttiling_boundaries": _q_texttiling_boundaries,
        "filter_impact_audit": _q_filter_impact_audit,
        "mor_delete_counts": _q_mor_delete_counts,
        "wap_publish_counts": _q_wap_publish_counts,
        "binary_hamming_topk": _q_binary_hamming_topk,
        "soft_dedup_weights": _q_soft_dedup_weights,
        "ccnet_bucket_counts": _q_ccnet_bucket_counts,
        "kmv_distinct_audit": _q_kmv_distinct_audit,
        "kcore_nodes": _q_kcore_nodes,
        # multimodal
        "media_metadata": _q_media_metadata,
        "media_dedup_groups": _q_media_dedup_groups,
        "dangling_ref_audit": _q_dangling_ref_audit,
        "orphan_media_audit": _q_orphan_media_audit,
    }


# --------------------------------------------------------------------------
# programmatic oracle SQL builders (shared pattern strings with the kernels
# in functions/textstats.py so Python and RE2 stay character-for-character
# identical; ratios compare as integer ppm so nothing is float-fuzzy)
# --------------------------------------------------------------------------


def _sql_stop_hits(words) -> str:
    from distributed_system___ocr_ray.functions import textstats as ts  # noqa: F401

    lst = ", ".join(f"'{w}'" for w in sorted(words))
    return (
        "len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
        f"x -> list_contains([{lst}], x)))"
    )


def _lang_id_sql() -> str:
    from distributed_system___ocr_ray.functions.textstats import LANG_ORDER, STOPWORDS

    hits = {lang: f"h_{lang}" for lang in LANG_ORDER}
    sub = ", ".join(f"{_sql_stop_hits(STOPWORDS[lang])} AS {hits[lang]}" for lang in LANG_ORDER)
    cjk = "len(regexp_extract_all(text, '[一-鿿぀-ヿ]'))"
    # cascaded CASE = numpy argmax-first (ties keep the earlier language)
    e, d, f, s = (hits[lang] for lang in LANG_ORDER)
    return (
        f"WITH f AS (SELECT doc_id, text, {sub} FROM documents) "
        "SELECT doc_id, CASE "
        f"WHEN {cjk} > 0 AND CAST({cjk} AS DOUBLE) / greatest(length(text), 1) > 0.05 THEN 'zh' "
        f"WHEN {e} = 0 AND {d} = 0 AND {f} = 0 AND {s} = 0 THEN 'unknown' "
        f"WHEN {e} >= {d} AND {e} >= {f} AND {e} >= {s} THEN 'en' "
        f"WHEN {d} >= {f} AND {d} >= {s} THEN 'de' "
        f"WHEN {f} >= {s} THEN 'fr' ELSE 'es' END AS pred_lang FROM f"
    )


# quality_ppm expression over the r-CTE's ratio columns (shared between the
# per-doc and the per-lang oracle)
_QPPM_EXPR = (
    "CAST(FLOOR(((len_score * (1.0 - least(greatest(punct_ratio, 0.0), 1.0))) * "
    "(0.5 + 0.5 * least(greatest(stop_ratio * 5, 0.0), 1.0))) * 1000000.0 + 0.5) AS BIGINT)"
)


def _quality_ctes(extra: str = "") -> str:
    from distributed_system___ocr_ray.functions.textstats import PUNCT_PATTERN, STOPWORDS

    all_stop = set().union(*STOPWORDS.values())
    e = f", {extra}" if extra else ""
    return (
        f"f AS (SELECT doc_id{e}, length(text) AS n_chars, "
        "len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens, "
        f"len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS n_punct, "
        "len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words, "
        f"{_sql_stop_hits(all_stop)} AS stop_hits FROM documents), "
        f"r AS (SELECT doc_id{e}, n_chars, n_ws_tokens, "
        "CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio, "
        "CASE WHEN n_words > 0 THEN CAST(stop_hits AS DOUBLE) / n_words ELSE 0.0 END AS stop_ratio, "
        "least(greatest(CAST(n_chars AS DOUBLE) / 500.0, 0.0), 1.0) AS len_score FROM f)"
    )


_MATTR_SQL = (
    # replay of analytics.mattr_by_lang (W=25): per-doc windows via
    # generate_series unnest, list_slice distinct counts, integer ppm
    "WITH toks AS (SELECT doc_id, lang, "
    "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
    "base AS (SELECT doc_id, lang, t, len(t) AS n FROM toks WHERE len(t) > 0), "
    "small AS (SELECT lang, len(list_distinct(t)) * 1000000 // n AS ppm "
    "FROM base WHERE n < 25), "
    "win AS (SELECT doc_id, lang, t, n, "
    "unnest(generate_series(1, n - 24)) AS i FROM base WHERE n >= 25), "
    "big AS (SELECT lang, SUM(len(list_distinct(list_slice(t, i, i + 24)))) "
    "* 1000000 // (25 * (n - 24)) AS ppm FROM win GROUP BY doc_id, lang, n), "
    "allp AS (SELECT * FROM small UNION ALL SELECT * FROM big) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_mattr_ppm "
    "FROM allp GROUP BY lang ORDER BY lang"
)


def _gopher_flags_sql() -> str:
    """Replays analytics.gopher_quality_flags: same counts, same
    fixed-point mean word length, same stopword list."""
    from distributed_system___ocr_ray.functions.textstats import STOPWORDS

    all_stop = set().union(*STOPWORDS.values())
    return (
        "WITH f AS (SELECT doc_id, "
        "len(regexp_extract_all(text, '\\S+')) AS n_words, "
        "length(regexp_replace(text, '\\s+', '', 'g')) AS wchars, "
        "len(regexp_extract_all(text, '#')) + "
        "len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym, "
        f"{_sql_stop_hits(all_stop)} AS stop_hits FROM documents), "
        "r AS (SELECT doc_id, n_words, wchars * 100 // GREATEST(n_words, 1) "
        "AS mwl100, n_sym, stop_hits FROM f) "
        "SELECT doc_id, "
        "CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS f_word_count, "
        "CAST(mwl100 BETWEEN 300 AND 1000 AS BIGINT) AS f_mean_word_len, "
        "CAST(10 * n_sym <= n_words AS BIGINT) AS f_symbol_ratio, "
        "CAST(stop_hits >= 2 AS BIGINT) AS f_stopwords, "
        "CAST((n_words BETWEEN 50 AND 100000) AND (mwl100 BETWEEN 300 AND 1000) "
        "AND 10 * n_sym <= n_words AND stop_hits >= 2 AS BIGINT) AS keep "
        "FROM r"
    )


def _corpus_datacard_sql() -> str:
    """Replays _q_corpus_datacard: the quality CTEs (shared with the
    per-doc oracle), raw-text token runs, distinct-text dup count, floored
    mean quality."""
    return (
        f"WITH {_quality_ctes('text, lang, source')}, "
        "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
        "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
        "CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) "
        "AS total_tokens, "
        f"CAST(SUM({_QPPM_EXPR}) AS BIGINT) AS qsum FROM r), "
        "d AS (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS nd FROM documents) "
        "SELECT n_docs, n_langs, n_sources, n_docs - d.nd AS dup_rows, "
        "total_chars, total_tokens, "
        "CAST(qsum // GREATEST(n_docs, 1) AS BIGINT) AS mean_quality_ppm "
        "FROM agg, d"
    )


def _quality_sql() -> str:
    return (
        f"WITH {_quality_ctes()} "
        "SELECT doc_id, n_chars, n_ws_tokens, "
        "CAST(FLOOR(punct_ratio * 1000000.0 + 0.5) AS BIGINT) AS punct_ppm, "
        "CAST(FLOOR(stop_ratio * 1000000.0 + 0.5) AS BIGINT) AS stop_ppm, "
        f"{_QPPM_EXPR} AS quality_ppm FROM r"
    )


def _training_corpus_sql() -> str:
    """End-to-end composed-pipeline oracle: quality CTE (same expressions as
    the per-doc oracle) -> ppm filter -> keep-first dedup -> md5 split ->
    counts."""
    return (
        f"WITH {_quality_ctes('text')}, "
        "filt AS (SELECT doc_id, text FROM r "
        f"WHERE trim(text) <> '' AND {_QPPM_EXPR} >= 400000), "
        "ded AS (SELECT MIN(doc_id) AS doc_id FROM filt GROUP BY text), "
        "s AS (SELECT CASE WHEN h < '19999999' THEN 'val' "
        "WHEN h < '33333333' THEN 'test' ELSE 'train' END AS split FROM "
        "(SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM ded)) "
        "SELECT split, COUNT(*) AS n_docs FROM s GROUP BY split"
    )


def _quality_by_lang_sql() -> str:
    return (
        f"WITH {_quality_ctes('lang')} "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM({_QPPM_EXPR}) AS BIGINT) AS sum_quality_ppm FROM r GROUP BY lang"
    )


def _fingerprint_sql() -> str:
    from distributed_system___ocr_ray.functions.textstats import WS_PATTERN

    return (
        "SELECT doc_id, substr(md5(trim(regexp_replace(text, "
        f"'{WS_PATTERN}', ' ', 'g'), ' ')), 1, 16) AS fingerprint FROM documents"
    )


def _redact_pii_sql() -> str:
    """Replays _q_redact_pii exactly: identical planted-PII string
    arithmetic, then the same three regexp_replace patterns in the same
    order (pattern strings imported from functions.scrub, so engine and
    oracle can never drift)."""
    from distributed_system___ocr_ray.functions.scrub import (
        EMAIL_PATTERN,
        EMAIL_TOKEN,
        PHONE_PATTERN,
        PHONE_TOKEN,
        URL_PATTERN,
        URL_TOKEN,
    )

    planted = (
        "text || ' visit https://ex.org/p' || doc_id || ' mail user' || doc_id || "
        "'@mail.example.com call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    return (
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
        f"{planted}, '{URL_PATTERN}', '{URL_TOKEN}', 'g'), "
        f"'{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'), "
        f"'{PHONE_PATTERN}', '{PHONE_TOKEN}', 'g') AS clean_text FROM documents"
    )


def _contamination_sql(rate: float, k: int) -> str:
    """Replays _q_contamination_flags: same normalization (scrub
    NORM_WS_PATTERN + lower), same md5-threshold eval pick, same
    first-k-token probe, same distinct-probe substring count."""
    from distributed_system___ocr_ray.functions.scrub import (
        NORM_TOKEN_PATTERN,
        NORM_WS_PATTERN,
    )

    threshold = format(int(rate * 0xFFFFFFFF), "08x")
    return (
        "WITH norm AS (SELECT doc_id, lower(regexp_replace(text, "
        f"'{NORM_WS_PATTERN}', ' ', 'g')) AS ntext FROM documents), "
        "ev AS (SELECT array_to_string(list_slice(regexp_extract_all(ntext, "
        f"'{NORM_TOKEN_PATTERN}'), 1, {k}), ' ') AS sh FROM norm "
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{threshold}' "
        f"AND len(regexp_extract_all(ntext, '{NORM_TOKEN_PATTERN}')) >= {k}), "
        "sh AS (SELECT DISTINCT sh FROM ev) "
        "SELECT n.doc_id, CAST(COALESCE(SUM(CASE WHEN strpos(n.ntext, s.sh) > 0 "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits "
        "FROM norm n LEFT JOIN sh s ON strpos(n.ntext, s.sh) > 0 GROUP BY n.doc_id"
    )


def _sample_by_quality_sql() -> str:
    h = _MD5U64.format(v="'samplew:' || CAST(doc_id AS VARCHAR)")
    return (
        f"WITH {_quality_ctes()}, "
        f"q AS (SELECT doc_id, {_QPPM_EXPR} AS quality_ppm FROM r) "
        "SELECT doc_id, quality_ppm FROM q "
        f"WHERE {h} % 1000000 < CAST(quality_ppm AS UBIGINT)"
    )


def _value_histogram_sql(bins: int = 32) -> str:
    """Replays _q_value_histogram with the identical float64 arithmetic:
    width = (max-min)/bins, bin = clip(floor((v-min)/width)), edges
    floored to cents. numpy's astype(int64) truncates, but (v-lo)/width
    is nonnegative so trunc == floor."""
    return (
        "WITH s AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders), "
        f"w AS (SELECT lo, hi, CASE WHEN hi > lo THEN (hi - lo) / {bins} ELSE 1.0 END "
        "AS width FROM s), "
        "b AS (SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - w.lo) / w.width) AS BIGINT), 0), "
        f"{bins - 1}) AS bin FROM orders, w) "
        "SELECT b.bin, "
        "CAST(FLOOR((w.lo + b.bin * w.width) * 100 + 0.5) AS BIGINT) AS lo_cents, "
        "CAST(FLOOR((w.lo + (b.bin + 1) * w.width) * 100 + 0.5) AS BIGINT) AS hi_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM b, w GROUP BY 1, 2, 3"
    )


def _retention_cohorts_sql(week_secs: int = 604800) -> str:
    """Replays _q_retention_cohorts: week = epoch-seconds // week_secs,
    cohort = per-user MIN week, one count per distinct (user, week).

    FLOOR before the BIGINT cast: DuckDB's epoch() is DOUBLE and a bare
    CAST ROUNDS fractional seconds (604799.7 -> 604800), while the engine
    floors integer microseconds (us // 1e6) — an event in the last <1 s of
    a week would otherwise land in week w+1 in SQL but week w in the
    engine (review finding, round 3)."""
    return (
        "WITH uw AS (SELECT DISTINCT user_id, "
        f"CAST(FLOOR(epoch(ts)) AS BIGINT) // {week_secs} AS week FROM events), "
        "c AS (SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY user_id) "
        "SELECT c.cohort AS cohort_week, uw.week - c.cohort AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS users FROM uw JOIN c USING (user_id) "
        "GROUP BY 1, 2"
    )


def _domain_counts_sql(k: int = 10) -> str:
    """Replays _q_domain_counts: same planting expressions, the shared
    URL_PATTERN extraction, hostname = lowercase(first ':'-segment of the
    first '/'-segment after the scheme), count, top-k by (n DESC, domain)."""
    from distributed_system___ocr_ray.functions.scrub import URL_PATTERN

    return (
        "WITH src AS (SELECT doc_id, text || ' via https://d' || "
        "CAST(doc_id % 7 AS VARCHAR) || '.example.org:8080/page' || "
        "CAST(doc_id AS VARCHAR) || CASE WHEN doc_id % 3 = 0 THEN "
        "' see https://d0.example.org/x' || CAST(doc_id AS VARCHAR) ELSE '' END "
        "AS text FROM documents), "
        f"u AS (SELECT unnest(regexp_extract_all(text, '{URL_PATTERN}')) AS url FROM src), "
        "d AS (SELECT lower(string_split(string_split("
        "regexp_replace(url, '^https?://', ''), '/')[1], ':')[1]) AS domain FROM u) "
        "SELECT domain, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY domain "
        f"ORDER BY n DESC, domain LIMIT {k}"
    )


def _funnel_counts_sql(steps: list[str]) -> str:
    """Replays _q_funnel_counts: stage k's anchor is the per-user MIN ts of
    step-k events strictly after the stage k-1 anchor."""
    ctes, prev = [], None
    for i, s in enumerate(steps, start=1):
        if prev is None:
            ctes.append(
                f"t{i} AS (SELECT user_id, MIN(ts) AS a{i} FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"t{i} AS (SELECT e.user_id, MIN(e.ts) AS a{i} FROM events e "
                f"JOIN t{i-1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{s}' AND e.ts > p.a{i-1} GROUP BY e.user_id)"
            )
        prev = s
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{s}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS users FROM t{i}"
        for i, s in enumerate(steps, start=1)
    )
    return f"WITH {', '.join(ctes)} {selects}"


def _zscore_by_lang_sql() -> str:
    """Replays _q_zscore_by_lang: per-lang exact integer (n, sum, sum2)
    over the shared quality expression, then the identical float64
    mean/var/sqrt/floor chain (integer sums first, so no float-summation-
    order divergence); std == 0 groups get z_ppm = 0."""
    return (
        f"WITH {_quality_ctes(extra='lang')}, "
        f"q AS (SELECT doc_id, lang, {_QPPM_EXPR} AS qp FROM r), "
        "s AS (SELECT lang, COUNT(*) AS n, SUM(qp) AS sm, SUM(qp * qp) AS s2 "
        "FROM q GROUP BY lang) "
        "SELECT q.doc_id, q.lang, CASE WHEN "
        "(CAST(s.s2 AS DOUBLE) / s.n - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n)) > 0 "
        "THEN CAST(FLOOR((CAST(q.qp AS DOUBLE) - CAST(s.sm AS DOUBLE) / s.n) / "
        "sqrt(CAST(s.s2 AS DOUBLE) / s.n - (CAST(s.sm AS DOUBLE) / s.n) * (CAST(s.sm AS DOUBLE) / s.n)) "
        "* 1000000.0 + 0.5) AS BIGINT) ELSE 0 END AS z_ppm "
        "FROM q JOIN s USING (lang)"
    )


def _sample_n_per_group_sql(n: int, group_col: str = "lang") -> str:
    h = _MD5U64.format(v="'samplen:' || CAST(doc_id AS VARCHAR)")
    return (
        f"SELECT doc_id, {group_col} FROM documents "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY {h}, doc_id) <= {n}"
    )


def _novel_docs_minhash_sql(threshold: float) -> str:
    """Replays _q_novel_docs_minhash: the full minhash replay over the
    side-encoded union (sid = 2*id for corpus, 2*id+1 for the every-5th
    new batch), then new docs with a cross-side pair are anti-joined out.
    In minhash_lsh_pairs doc_a < doc_b, so the odd (new) sid can sit on
    either side of a pair."""
    ctes = _minhash_ctes(threshold=threshold, src="uni")
    return (
        "WITH uni AS (SELECT doc_id * 2 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END "
        "AS doc_id, text FROM documents), "
        f"{ctes[len('WITH '):] if ctes.startswith('WITH ') else ctes}, "
        "matched AS (SELECT (CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END) // 2 "
        "AS doc_id FROM mpairs WHERE doc_a % 2 != doc_b % 2) "
        "SELECT d.doc_id, d.lang FROM documents d WHERE d.doc_id % 5 = 0 "
        "AND d.doc_id NOT IN (SELECT doc_id FROM matched)"
    )


def _chunk_documents_sql(chunk: int, overlap: int) -> str:
    """Replays _q_chunk_documents: k in [0, ceil(n/stride)) windows of the
    whitespace-token array, 1-based inclusive list_slice."""
    stride = chunk - overlap
    return (
        "WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents), "
        "n AS (SELECT doc_id, toks, len(toks) AS n FROM t), "
        "c AS (SELECT doc_id, toks, n, CAST(unnest(range(0, "
        f"CAST(CEIL(CAST(n AS DOUBLE) / {stride}) AS BIGINT))) AS BIGINT) AS chunk_id FROM n) "
        "SELECT doc_id, chunk_id, "
        f"array_to_string(list_slice(toks, chunk_id * {stride} + 1, "
        f"LEAST(chunk_id * {stride} + {chunk}, n)), ' ') AS text, "
        f"CAST(LEAST(chunk_id * {stride} + {chunk}, n) - chunk_id * {stride} AS BIGINT) "
        "AS n_tokens FROM c"
    )


def _line_dedup_sql(min_chars: int = 8) -> str:
    """Replays _q_line_dedup end-to-end: the boilerplate construction, the
    per-line (count, min(doc_id*2^32 + idx)) stats over lines >=
    min_chars, the keep-first filter, and the ordered chr(10) rejoin.
    Docs whose every line was a non-first duplicate come back as ''."""
    return (
        "WITH src AS (SELECT doc_id, text || chr(10) || "
        f"'{_BOILER1}' || "
        f"CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_BOILER2}' ELSE '' END || "
        "chr(10) || 'ad' AS text FROM documents), "
        "t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM src), "
        "l AS (SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS i FROM t), "
        "d AS (SELECT line, COUNT(*) AS n, MIN(doc_id * 4294967296 + (i - 1)) AS mp "
        f"FROM l WHERE length(line) >= {min_chars} GROUP BY line), "
        "k AS (SELECT l.doc_id, l.i, l.line FROM l LEFT JOIN d "
        f"ON length(l.line) >= {min_chars} AND l.line = d.line "
        "WHERE d.n IS NULL OR d.n = 1 OR (l.doc_id * 4294967296 + (l.i - 1)) = d.mp), "
        "o AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text FROM k GROUP BY doc_id) "
        "SELECT s.doc_id, COALESCE(o.text, '') AS text FROM src s LEFT JOIN o USING (doc_id)"
    )


def _sample_exact_n_sql(n: int) -> str:
    """Replays _q_sample_exact_n: the n smallest md5_u64('samplen:'||id)
    keys, ties by id."""
    h = _MD5U64.format(v="'samplen:' || CAST(doc_id AS VARCHAR)")
    return (
        "SELECT doc_id, lang FROM documents "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY {h}, doc_id) <= {n}"
    )


def _epoch_shuffle_sql(epoch: int) -> str:
    """Replays _q_epoch_shuffle with one window function over the same
    md5-prefix sort key (dedup.md5_u64 == the _MD5U64 macro)."""
    h = _MD5U64.format(v=f"'epoch{epoch}:' || CAST(doc_id AS VARCHAR)")
    return (
        f"SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 AS BIGINT) AS pos "
        "FROM documents"
    )


def _cms_ctes(k: int = 20, depth: int = 4, width: int = 8192) -> str:
    """Shared CTE body of the CMS replays: every CMS bucket counter is
    COUNT(*) of tokens hashing to (row, md5_u64('cms{r}:'||tok) % width),
    and each candidate's estimate is the MIN over rows of its bucket's
    counter — identical md5-prefix arithmetic to sketches.CountMinSketch."""
    h_tok = _MD5U64.format(v="'cms' || CAST(r AS VARCHAR) || ':' || tk")
    h_cand = _MD5U64.format(v="'cms' || CAST(r2.r AS VARCHAR) || ':' || cand.tk")
    return (
        "tok AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tk FROM documents), "
        f"cand AS (SELECT tk, COUNT(*) AS n FROM tok GROUP BY tk ORDER BY n DESC, tk LIMIT {k}), "
        f"rows_ AS (SELECT CAST(r AS INTEGER) AS r FROM range({depth}) t(r)), "
        f"sk AS (SELECT r, {h_tok} % {width} AS b, COUNT(*) AS c "
        "FROM tok CROSS JOIN rows_ GROUP BY 1, 2), "
        "est AS (SELECT cand.tk, MIN(sk.c) AS n_cms FROM cand CROSS JOIN rows_ r2 "
        f"JOIN sk ON sk.r = r2.r AND sk.b = {h_cand} % {width} GROUP BY cand.tk)"
    )


def _cms_top_tokens_sql(k: int = 20, depth: int = 4, width: int = 8192) -> str:
    return (
        f"WITH {_cms_ctes(k, depth, width)} "
        "SELECT cand.tk AS token, CAST(est.n_cms AS BIGINT) AS n_cms "
        "FROM cand JOIN est ON cand.tk = est.tk"
    )


def _cms_error_audit_sql(k: int = 20, depth: int = 4, width: int = 8192) -> str:
    """cms_top_tokens' CTE body plus the exact count and the CMS
    overestimate in ppm (CMS >= truth by construction, so the floor-div
    is on non-negative ints on both sides)."""
    return (
        f"WITH {_cms_ctes(k, depth, width)} "
        "SELECT cand.tk AS token, CAST(cand.n AS BIGINT) AS n_exact, "
        "CAST(est.n_cms AS BIGINT) AS n_cms, "
        "CAST((est.n_cms - cand.n) * 1000000 // cand.n AS BIGINT) AS over_ppm "
        "FROM cand JOIN est ON cand.tk = est.tk"
    )


def _mixture_sample_sql(shares: dict[str, int], target: int) -> str:
    """Replays _q_mixture_sample: per-source counts CTE -> the same integer
    rate arithmetic (want = target*share//1e6; rate = min(1e6, 1e6*want//n))
    -> the same md5_u64(doc_id) % 1e6 roll (dedup.md5_u64 == big-endian
    16-hex md5 prefix, the _MD5U64 macro)."""
    share_case = (
        "CASE source " + " ".join(f"WHEN '{s}' THEN {p}" for s, p in shares.items()) + " ELSE 0 END"
    )
    h = _MD5U64.format(v="CAST(d.doc_id AS VARCHAR)")
    return (
        "WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source), "
        f"r AS (SELECT source, LEAST(1000000, 1000000 * (({target} * {share_case}) // 1000000) // n) "
        "AS rate FROM c) "
        "SELECT d.doc_id, d.source FROM documents d JOIN r USING(source) "
        f"WHERE {h} % 1000000 < CAST(r.rate AS UBIGINT)"
    )


def _budget_select_sql(budget: int) -> str:
    """Replays _q_budget_select with one window function: keep rows while
    the running token sum over (quality_ppm DESC, doc_id ASC) stays within
    the budget (monotone running sum => WHERE cum <= budget IS the greedy
    prefix). quality_ppm reuses the shared _QPPM_EXPR expression tree."""
    return (
        f"WITH {_quality_ctes()}, "
        f"q AS (SELECT doc_id, n_ws_tokens, {_QPPM_EXPR} AS quality_ppm FROM r), "
        "o AS (SELECT *, SUM(n_ws_tokens) OVER (ORDER BY quality_ppm DESC, doc_id ASC "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM q) "
        "SELECT doc_id, CAST(n_ws_tokens AS BIGINT) AS n_tokens, quality_ppm FROM o "
        f"WHERE cum <= {budget}"
    )


def _pack_sequences_sql(seq_len: int) -> str:
    """Replays _q_pack_sequences with one window function: pack_id =
    floor(cum_tokens_before / seq_len) over global doc_id order (RE2 \\S ==
    the textstats whitespace-token class)."""
    return (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
        "CAST(FLOOR((SUM(len(regexp_extract_all(text, '\\S+'))) OVER (ORDER BY doc_id) "
        f"- len(regexp_extract_all(text, '\\S+'))) / {seq_len}) AS BIGINT) AS pack_id "
        "FROM documents"
    )


def _status_counts_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Span statuses over the interleaved wrap: which spans exist and which
    refs are broken are doc_id arithmetic (sources/wrap.py), and since round
    3 the media store's corruption roll is md5 arithmetic too
    (``md5(tag || ':c') < corrupt_frac * 2^64``), so the whole status table
    is recomputed INDEPENDENTLY in SQL -- no constants enumerated from the
    engine's own generator."""
    from distributed_system___ocr_ray.sources import wrap

    n_img, n_pdf = wrap.DEFAULT_N_IMG, wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)

    def bad_img(idx_expr: str) -> str:
        tag = f"'{seed}:img:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    def bad_pdf(idx_expr: str) -> str:
        tag = f"'{seed}:pdf:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    return (
        "WITH spans AS ("
        "SELECT 'ok' AS status FROM documents "
        "UNION ALL SELECT CASE WHEN doc_id % 20 = 0 THEN 'download_error' "
        f"WHEN {bad_img(f'(doc_id*7) % {n_img}')} THEN 'ocr_error' ELSE 'ok' END "
        "FROM documents "
        "UNION ALL SELECT CASE WHEN (doc_id+1) % 20 = 0 THEN 'download_error' "
        f"WHEN {bad_img(f'(doc_id*7+3) % {n_img}')} THEN 'ocr_error' ELSE 'ok' END "
        "FROM documents WHERE doc_id % 2 = 1 "
        "UNION ALL SELECT CASE WHEN doc_id % 40 = 10 THEN 'download_error' "
        f"WHEN {bad_pdf(f'(doc_id*11) % {n_pdf}')} THEN 'parse_error' ELSE 'ok' END "
        "FROM documents WHERE doc_id % 2 = 0) "
        "SELECT status, COUNT(*) AS n_spans FROM spans GROUP BY status"
    )


def _doc_completeness_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Per-language completeness over the interleaved wrap: independently
    recomputes each span's ok/error status from doc_id + md5 arithmetic
    (same expressions as _status_counts_sql, doc_id carried), folds to a
    per-doc bad count, joins lang, floor-div ppm."""
    from distributed_system___ocr_ray.sources import wrap

    n_img, n_pdf = wrap.DEFAULT_N_IMG, wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)

    def bad_img(idx_expr: str) -> str:
        tag = f"'{seed}:img:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    def bad_pdf(idx_expr: str) -> str:
        tag = f"'{seed}:pdf:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    return (
        "WITH spans AS ("
        "SELECT doc_id, 0 AS bad FROM documents "
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 20 = 0 THEN 1 "
        f"WHEN {bad_img(f'(doc_id*7) % {n_img}')} THEN 1 ELSE 0 END "
        "FROM documents "
        "UNION ALL SELECT doc_id, CASE WHEN (doc_id+1) % 20 = 0 THEN 1 "
        f"WHEN {bad_img(f'(doc_id*7+3) % {n_img}')} THEN 1 ELSE 0 END "
        "FROM documents WHERE doc_id % 2 = 1 "
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 40 = 10 THEN 1 "
        f"WHEN {bad_pdf(f'(doc_id*11) % {n_pdf}')} THEN 1 ELSE 0 END "
        "FROM documents WHERE doc_id % 2 = 0), "
        "pd AS (SELECT doc_id, SUM(bad) AS n_bad FROM spans GROUP BY 1) "
        "SELECT d.lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN p.n_bad = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_complete, "
        "CAST(SUM(CASE WHEN p.n_bad = 0 THEN 1 ELSE 0 END) * 1000000 "
        "// COUNT(*) AS BIGINT) AS complete_ppm "
        "FROM pd p JOIN documents d USING (doc_id) GROUP BY d.lang"
    )


def _retry_plan_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Retry work-list: independently recomputes every FAILED span's
    (status, media_ref) from doc_id + md5 arithmetic -- broken refs get the
    per-doc missing-sentinel, corrupt media the ocr/parse error -- and
    counts spans per pair (same failure expressions as _status_counts_sql,
    refs carried)."""
    from distributed_system___ocr_ray.sources import wrap

    n_img, n_pdf = wrap.DEFAULT_N_IMG, wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)

    def bad_img(idx_expr: str) -> str:
        tag = f"'{seed}:img:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    def bad_pdf(idx_expr: str) -> str:
        tag = f"'{seed}:pdf:' || ({idx_expr}) || ':c'"
        return f"{_MD5U64.format(v=tag)} < {th}"

    return (
        "WITH fails AS ("
        "SELECT CASE WHEN doc_id % 20 = 0 THEN 'download_error' "
        "ELSE 'ocr_error' END AS status, "
        "CASE WHEN doc_id % 20 = 0 THEN "
        "printf('mem://img/missing-%06d', doc_id) "
        f"ELSE printf('mem://img/%06d', (doc_id*7) % {n_img}) END AS media_ref "
        f"FROM documents WHERE doc_id % 20 = 0 OR {bad_img(f'(doc_id*7) % {n_img}')} "
        "UNION ALL "
        "SELECT CASE WHEN (doc_id+1) % 20 = 0 THEN 'download_error' "
        "ELSE 'ocr_error' END, "
        "CASE WHEN (doc_id+1) % 20 = 0 THEN "
        "printf('mem://img/missing-%06d', doc_id) "
        f"ELSE printf('mem://img/%06d', (doc_id*7+3) % {n_img}) END "
        "FROM documents WHERE doc_id % 2 = 1 "
        f"AND ((doc_id+1) % 20 = 0 OR {bad_img(f'(doc_id*7+3) % {n_img}')}) "
        "UNION ALL "
        "SELECT CASE WHEN doc_id % 40 = 10 THEN 'download_error' "
        "ELSE 'parse_error' END, "
        "CASE WHEN doc_id % 40 = 10 THEN "
        "printf('mem://pdf/missing-%06d', doc_id) "
        f"ELSE printf('mem://pdf/%06d', (doc_id*11) % {n_pdf}) END "
        "FROM documents WHERE doc_id % 2 = 0 "
        f"AND (doc_id % 40 = 10 OR {bad_pdf(f'(doc_id*11) % {n_pdf}')})) "
        "SELECT status, media_ref, CAST(COUNT(*) AS BIGINT) AS n_spans "
        "FROM fails GROUP BY status, media_ref"
    )


def _render_html_sql() -> str:
    """Mirror of stages/render_html.render_doc on identity-extracted flat
    docs: html.escape (&, <, >, \", ') then newline -> <br/>, one <p> block
    inside the doc <div> (LocalApplication.java:180-207 shape)."""
    esc = (
        "replace(replace(replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), "
        "'>', '&gt;'), '\"', '&quot;'), chr(39), '&#x27;')"
    )
    return (
        "SELECT printf('doc-%010d', doc_id) AS doc_id, "
        "'<div id=\"' || printf('doc-%010d', doc_id) || '\">' || chr(10) || '<p>' || "
        f"replace({esc}, chr(10), '<br/>') || '</p>' || chr(10) || '</div>' AS html "
        "FROM documents WHERE trim(text) <> ''"
    )


# distinct word-3-gram shingle strings per document (with the <3-words
# fallback matching dedup.shingle_hashes) -- shared by the ngram-Jaccard AND
# MinHash oracles, so both families tokenize/shingle identically in SQL
def _shingle_ctes(src: str = "documents") -> str:
    """Word-3-gram shingle CTE body, parameterized by the source relation
    (novel_docs_minhash replays over a side-encoded union, not documents)."""
    return _SHINGLE_CTES.replace("FROM documents", f"FROM {src}", 1)


_SHINGLE_CTES = (
    "ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
    "base AS (SELECT doc_id, len(w) AS nw, w FROM ws), "
    "tok AS (SELECT doc_id, unnest(w) AS tk, unnest(generate_series(1, len(w))) AS i "
    "FROM base WHERE nw >= 3), "
    "sh3 AS (SELECT DISTINCT doc_id, tk || ' ' || lead(tk, 1) OVER win || ' ' || "
    "lead(tk, 2) OVER win AS s FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i) "
    "QUALIFY lead(tk, 2) OVER win IS NOT NULL), "
    "shsmall AS (SELECT doc_id, array_to_string(w, ' ') AS s FROM base WHERE nw < 3), "
    "sh AS (SELECT * FROM sh3 UNION ALL SELECT * FROM shsmall)"
)

# exact word-3-gram Jaccard pair set (threshold 0.5) -- shared CTE body for
# the pair and cluster oracles; jaccard as integer ppm (identical float64
# division then floor on both sides)
_NGRAM_PAIRS_CTES = (
    f"{_SHINGLE_CTES}, "
    "sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "jac AS (SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j "
    "FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b), "
    "pairs AS (SELECT doc_a, doc_b, CAST(FLOOR(j * 1000000.0 + 0.5) AS BIGINT) "
    "AS jaccard_ppm FROM jac WHERE j >= 0.5)"
)

_NGRAM_PAIRS_SQL = f"WITH {_NGRAM_PAIRS_CTES} SELECT doc_a, doc_b, jaccard_ppm FROM pairs"

_NGRAM_CC_CTES = (
    f"{_NGRAM_PAIRS_CTES}, "
    "edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs "
    "UNION SELECT doc_b, doc_a FROM pairs), "
    "reach AS (SELECT a, b FROM edges "
    "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), "
    "cl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
    "FROM reach GROUP BY a)"
)

_NGRAM_CLUSTERS_SQL = (
    f"WITH RECURSIVE {_NGRAM_CC_CTES} SELECT doc_id, cluster_id FROM cl"
)

_NGRAM_KEEPERS_SQL = (
    f"WITH RECURSIVE {_NGRAM_CC_CTES} "
    "SELECT d.doc_id AS keeper_doc_id FROM documents d "
    "LEFT JOIN cl ON d.doc_id = cl.doc_id "
    "WHERE cl.cluster_id IS NULL OR cl.cluster_id = d.doc_id"
)

# replay of analytics.dup_shingle_rate over the SAME shared shingle CTE
# body: sh is (doc_id, s)-distinct, so COUNT(*) per s is the distinct-doc
# count; the engine's u64-hash grouping is string-equality-identical here
_DUP_SHINGLE_SQL = (
    f"WITH {_SHINGLE_CTES}, "
    "g AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s), "
    "j AS (SELECT d.source, CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END AS shared "
    "FROM sh JOIN g USING (s) JOIN documents d USING (doc_id)), "
    "a AS (SELECT source, COUNT(*) AS n_shingles, SUM(shared) AS n_shared "
    "FROM j GROUP BY source) "
    "SELECT source, CAST(n_shingles AS BIGINT) AS n_shingles, "
    "CAST(n_shared AS BIGINT) AS n_shared, "
    "CAST(n_shared * 1000000 // n_shingles AS BIGINT) AS shared_ppm FROM a"
)

# replay of analytics.doc_boilerplate_score: dup_shingle_rate's >= 2-doc
# rule over the SAME shared shingle CTE body, grouped per doc_id
_DOC_BOILERPLATE_SQL = (
    f"WITH {_SHINGLE_CTES}, "
    "g AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s), "
    "j AS (SELECT sh.doc_id, CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END AS shared "
    "FROM sh JOIN g USING (s)), "
    "a AS (SELECT doc_id, COUNT(*) AS n_shingles, SUM(shared) AS n_shared "
    "FROM j GROUP BY doc_id) "
    "SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, "
    "CAST(n_shared AS BIGINT) AS n_shared, "
    "CAST(n_shared * 1000000 // n_shingles AS BIGINT) AS boilerplate_ppm FROM a"
)

# replay of analytics.dup_spans: POSITIONAL word-3-shingles (no DISTINCT --
# every occurrence keeps its 1-based start i), shingles in >= 2 distinct docs
# mark their positions, spans [i, i+L) expand via generate_series and the
# per-doc COUNT(DISTINCT j) IS the interval-union coverage
_DUP_SPANS_SQL = (
    "WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
    "base AS (SELECT doc_id, len(w) AS nw, w FROM ws), "
    "tok AS (SELECT doc_id, unnest(w) AS tk, unnest(generate_series(1, len(w))) AS i "
    "FROM base WHERE nw >= 3), "
    "shp AS (SELECT doc_id, i, tk || ' ' || lead(tk, 1) OVER win || ' ' || "
    "lead(tk, 2) OVER win AS s FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i) "
    "QUALIFY lead(tk, 2) OVER win IS NOT NULL), "
    "shsm AS (SELECT doc_id, 1 AS i, array_to_string(w, ' ') AS s "
    "FROM base WHERE nw >= 1 AND nw < 3), "
    "allp AS (SELECT * FROM shp UNION ALL SELECT * FROM shsm), "
    "g AS (SELECT s FROM allp GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2), "
    "dup AS (SELECT DISTINCT a.doc_id, a.i FROM allp a JOIN g USING (s)), "
    "cov AS (SELECT d.doc_id, unnest(generate_series(d.i, "
    "d.i + (CASE WHEN b.nw >= 3 THEN 3 ELSE b.nw END) - 1)) AS j "
    "FROM dup d JOIN base b USING (doc_id)), "
    "c AS (SELECT doc_id, COUNT(DISTINCT j) AS covered FROM cov GROUP BY doc_id) "
    "SELECT b.doc_id, CAST(b.nw AS BIGINT) AS nw, "
    "CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered, "
    "CAST(COALESCE(c.covered, 0) * 1000000 // b.nw AS BIGINT) AS dup_span_ppm "
    "FROM base b LEFT JOIN c USING (doc_id) WHERE b.nw >= 1"
)

# replay of analytics.ks_priority_drift: the KS sup is attained on the
# observed distinct-cents grid, so cross-join every group onto the grid,
# window-cumsum the left-joined counts, and max the integer deviation
_KS_PRIORITY_SQL = (
    "WITH v AS (SELECT o_orderpriority AS g, "
    "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c FROM orders), "
    "n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY g), "
    "d AS (SELECT g, c, COUNT(*) AS cnt FROM v GROUP BY g, c), "
    "grid AS (SELECT gs.g, vs.c FROM (SELECT DISTINCT g FROM v) gs "
    "CROSS JOIN (SELECT DISTINCT c FROM v) vs), "
    "cum AS (SELECT grid.g, grid.c, SUM(COALESCE(d.cnt, 0)) "
    "OVER (PARTITION BY grid.g ORDER BY grid.c) AS cc "
    "FROM grid LEFT JOIN d ON grid.g = d.g AND grid.c = d.c), "
    "pd AS (SELECT a.g AS prio_a, b.g AS prio_b, "
    "MAX(ABS(a.cc * nb.n - b.cc * na.n)) AS dev "
    "FROM cum a JOIN cum b ON a.c = b.c AND a.g < b.g "
    "JOIN n na ON na.g = a.g JOIN n nb ON nb.g = b.g GROUP BY 1, 2) "
    "SELECT prio_a, prio_b, CAST(na.n AS BIGINT) AS n_a, "
    "CAST(nb.n AS BIGINT) AS n_b, "
    "CAST(dev * 1000000 // (na.n * nb.n) AS BIGINT) AS ks_ppm "
    "FROM pd JOIN n na ON na.g = prio_a JOIN n nb ON nb.g = prio_b"
)

# replay of analytics.sampled_quantile_audit: same md5-hex-prefix sample
# predicate as sample_docs (threshold 0x1fffffff = rate 0.125), the integer
# rank convention (p*n+999)//1000 via ROW_NUMBER on both populations, and a
# correlated COUNT(<=) for the estimate's true rank
_SAMPLED_QUANTILE_SQL = (
    "WITH v AS (SELECT o_orderkey AS k, "
    "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c FROM orders), "
    "s AS (SELECT c FROM v WHERE substr(md5(CAST(k AS VARCHAR)), 1, 8) < '1fffffff'), "
    "q AS (SELECT unnest(generate_series(100, 900, 100)) AS q_permille), "
    "ns AS (SELECT COUNT(*) AS n FROM s), "
    "nf AS (SELECT COUNT(*) AS n FROM v), "
    "ss AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM s), "
    "ff AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v), "
    "est AS (SELECT q.q_permille, ss.c AS est_cents FROM q, ns, ss "
    "WHERE ss.rn = GREATEST(1, (q.q_permille * ns.n + 999) // 1000)), "
    "exq AS (SELECT q.q_permille, ff.c AS exact_cents FROM q, nf, ff "
    "WHERE ff.rn = GREATEST(1, (q.q_permille * nf.n + 999) // 1000)), "
    "r AS (SELECT e.q_permille, e.est_cents, "
    "(SELECT COUNT(*) FROM v WHERE v.c <= e.est_cents) AS cle FROM est e) "
    "SELECT r.q_permille, CAST(ns.n AS BIGINT) AS sample_n, "
    "CAST(r.est_cents AS BIGINT) AS est_cents, "
    "CAST(x.exact_cents AS BIGINT) AS exact_cents, "
    "CAST(abs(r.cle * 1000000 // nf.n - r.q_permille * 1000) AS BIGINT) "
    "AS rank_err_ppm "
    "FROM r JOIN exq x ON x.q_permille = r.q_permille, ns, nf"
)

# replay of analytics.token_simpson_by_lang: exact HUGEINT sum-of-squares
# over global (lang, token) counts, floor-div ppm
_TOKEN_DIVERSITY_SQL = (
    "WITH t AS (SELECT lang, unnest(regexp_extract_all(lower(text), "
    "'[a-z0-9]+')) AS tok FROM documents), "
    "c AS (SELECT lang, tok, CAST(COUNT(*) AS HUGEINT) AS n FROM t GROUP BY 1, 2), "
    "a AS (SELECT lang, SUM(n) AS nt, SUM(n * n) AS ssq, COUNT(*) AS nd "
    "FROM c GROUP BY lang) "
    "SELECT lang, CAST(nt AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct, "
    "CAST(1000000 - (ssq * 1000000) // (nt * nt) AS BIGINT) AS simpson_ppm FROM a"
)

# replay of analytics.doc_surprisal_topk: per-token whole-bit surprisal
# floor(log2(N/c)) == length(bin(N//c)) - 1 (floor-div monotonicity), milli
# mean floor-div, (mean DESC, doc_id ASC) LIMIT 50
_DOC_SURPRISAL_SQL = (
    "WITH t AS (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), "
    "'[a-z0-9]+')) AS tok FROM documents), "
    "c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok), "
    "nn AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM c), "
    "b AS (SELECT tok, CAST(length(bin((SELECT ntot FROM nn) // n)) - 1 "
    "AS BIGINT) AS bits FROM c), "
    "d AS (SELECT t.doc_id, any_value(t.lang) AS lang, "
    "CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    "CAST(SUM(b.bits) AS BIGINT) AS total_bits "
    "FROM t JOIN b USING (tok) GROUP BY t.doc_id) "
    "SELECT doc_id, lang, n_tokens, total_bits, "
    "CAST(total_bits * 1000 // n_tokens AS BIGINT) AS mean_millibits "
    "FROM d ORDER BY mean_millibits DESC, doc_id ASC LIMIT 50"
)

# replay of analytics.sentence_stats_by_lang: non-overlapping '[.!?]+' run
# counts, shared word tokenization, guarded milli floor-div
_SENTENCE_STATS_SQL = (
    "WITH s AS (SELECT lang, len(regexp_extract_all(text, '[.!?]+')) AS ns, "
    "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM documents) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(ns) AS BIGINT) AS n_sentences, CAST(SUM(nw) AS BIGINT) AS n_words, "
    "CAST(CASE WHEN SUM(ns) > 0 THEN SUM(nw) * 1000 // SUM(ns) ELSE 0 END "
    "AS BIGINT) AS mean_words_per_sentence_milli FROM s GROUP BY lang"
)

_TOP_TOKENS_SQL = (
    "SELECT tk AS token, CAST(COUNT(*) AS BIGINT) AS n FROM "
    "(SELECT unnest(regexp_extract_all(text, '\\S+')) AS tk FROM documents) "
    "GROUP BY tk ORDER BY n DESC, tk LIMIT 20"
)

_MEDIAN_ORDER_SQL = (
    "WITH s AS (SELECT o_totalprice AS v, "
    "row_number() OVER (ORDER BY o_totalprice) AS rn, COUNT(*) OVER () AS n FROM orders) "
    "SELECT CAST(FLOOR(v * 100 + 0.5) AS BIGINT) AS median_cents FROM s "
    "WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)"
)

_EMBEDDING_NEARDUP_SQL = (
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM embeddings a "
    "JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95"
)

# uint64 from the first 8 md5 digest bytes -- the exact value
# functions/dedup.md5_u64 computes (big-endian prefix)
_MD5U64 = "CAST(('0x' || substr(md5({v}), 1, 16)) AS UBIGINT)"


def _minhash_ctes(threshold: float = 0.6, num_perm: int = 64, bands: int = 16,
                  seed: int = 7, src: str = "documents") -> str:
    """Replay of pipelines/analytics.minhash_lsh_pairs in SQL: the same
    md5-prefix shingle hash, the same 64 seeded permutation constants
    (embedded as literals from the very MinHasher the engine builds), the
    same uint64-wrap-then-Mersenne arithmetic via HUGEINT, LSH banding by
    value equality, the engine's bucket skew cap (representative-only
    pairing past _MAX_GROUP_SIZE, the bkc CTE), and the est >= threshold
    filter on candidate pairs. One documented deviation: the engine keys
    band buckets by a 63-bit md5 of the slice, so a 2^-63 collision could
    merge two value-buckets -- adding candidates, or (if the merged group
    tops the cap) dropping pairs the oracle keeps. Negligible by
    construction and unobserved at any tested scale."""
    from distributed_system___ocr_ray.functions import dedup as dk

    mh = dk.MinHasher(num_perm=num_perm, seed=seed)
    perms = ", ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    r = num_perm // bands
    hsh = _MD5U64.format(v="s")
    return (
        f"{_shingle_ctes(src)}, "
        f"hsh AS (SELECT doc_id, {hsh} AS h FROM sh), "
        f"perm(i, pa, pb) AS (VALUES {perms}), "
        "sigv AS (SELECT h.doc_id, p.i AS i, "
        "MIN(((CAST(p.pa AS HUGEINT) * h.h + p.pb) % 18446744073709551616) "
        "% 2305843009213693951) AS v "
        "FROM hsh h CROSS JOIN perm p GROUP BY h.doc_id, p.i), "
        f"bk AS (SELECT doc_id, i // {r} AS band, "
        "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey "
        "FROM sigv GROUP BY doc_id, band), "
        # group_pairs' skew cap: a bucket over _MAX_GROUP_SIZE members pairs
        # each member with the bucket's min id (the representative) only
        "bkc AS (SELECT band, bkey, COUNT(*) AS n, MIN(doc_id) AS rep "
        "FROM bk GROUP BY band, bkey), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bk a "
        "JOIN bk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id "
        "JOIN bkc c ON c.band = a.band AND c.bkey = a.bkey "
        f"WHERE c.n <= {dk._MAX_GROUP_SIZE} OR a.doc_id = c.rep), "
        "nm AS (SELECT c.doc_a, c.doc_b, "
        "CAST(SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS BIGINT) AS n_match "
        "FROM cand c JOIN sigv sa ON sa.doc_id = c.doc_a "
        "JOIN sigv sb ON sb.doc_id = c.doc_b AND sb.i = sa.i "
        "GROUP BY c.doc_a, c.doc_b), "
        "mpairs AS (SELECT doc_a, doc_b, n_match FROM nm "
        f"WHERE CAST(n_match AS DOUBLE) / {num_perm}.0 >= {threshold})"
    )


def _minhash_pairs_sql() -> str:
    return f"WITH {_minhash_ctes()} SELECT doc_a, doc_b, n_match FROM mpairs"


def _minhash_recall_audit_sql() -> str:
    """Replay of analytics.pair_set_audit over the two already-green pair
    replays: the minhash body defines sh..mpairs; the ngram tail
    (sz/inter/jac/pairs) reads the SAME sh CTE, so strip its duplicated
    shingle prefix and compose one WITH."""
    ngram_tail = _NGRAM_PAIRS_CTES[len(_SHINGLE_CTES) + 2 :]
    return (
        f"WITH {_minhash_ctes()}, {ngram_tail}, "
        "ne AS (SELECT COUNT(*) AS n FROM pairs), "
        "na AS (SELECT COUNT(*) AS n FROM mpairs), "
        "nb AS (SELECT COUNT(*) AS n FROM pairs JOIN mpairs USING (doc_a, doc_b)) "
        "SELECT CAST(ne.n AS BIGINT) AS n_exact, "
        "CAST(na.n AS BIGINT) AS n_approx, CAST(nb.n AS BIGINT) AS n_both, "
        "CAST(CASE WHEN ne.n = 0 THEN 1000000 ELSE nb.n * 1000000 // ne.n END "
        "AS BIGINT) AS recall_ppm, "
        "CAST(CASE WHEN na.n = 0 THEN 1000000 ELSE nb.n * 1000000 // na.n END "
        "AS BIGINT) AS precision_ppm FROM ne, na, nb"
    )


def _simhash_clusters_sql() -> str:
    """Connected components over the SQL-replayed SimHash pair graph --
    the same recursive-closure pattern as the minhash/ngram cluster
    oracles, with the whole pair replay nested as a CTE."""
    return (
        f"WITH RECURSIVE sp AS ({_simhash_pairs_sql()}), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM sp "
        "UNION SELECT doc_b, doc_a FROM sp), "
        "reach AS (SELECT a, b FROM edges "
        "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), "
        "cl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a) "
        "SELECT doc_id, cluster_id FROM cl"
    )


def _anf_sql(p: int = 6, max_h: int = 6) -> str:
    """First-principles replay of ``analytics.anf_effective_diameter``:
    exact min-hop reachability (recursive UNION on (v, u, h), capped at
    max_h) -> per-(node, h) HLL registers over the EXACT ball members ->
    the pinned estimator ladder (exact HUGEINT register sum, alpha bias,
    linear-counting branch, FLOOR(x+0.5)) -> N(h), frac, 90% knee.
    Register-wise MAX over members equals the engine's per-hop max
    propagation -- that identity is what the equality certifies."""
    m = 1 << p
    hh = _MD5U64.format(v="CAST(u AS VARCHAR)")
    deg_h = _MD5U64.format(v="CAST(doc_id AS VARCHAR) || ':deg'")
    lnk_h = _MD5U64.format(v="CAST(src AS VARCHAR) || ':link:' || CAST(j AS VARCHAR)")
    alpha = repr(0.7213 / (1 + 1.079 / m))
    return (
        "WITH RECURSIVE "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
        f"degs AS (SELECT doc_id AS src, CAST(1 + {deg_h} % 3 AS BIGINT) AS deg "
        "FROM documents), "
        "lnk AS (SELECT src, deg, unnest(range(deg)) AS j FROM degs), "
        f"edges AS (SELECT src, dst FROM (SELECT src, CAST({lnk_h} % nn.n AS BIGINT) "
        "AS dst FROM lnk, nn) WHERE dst <> src), "
        "reach AS (SELECT doc_id AS v, doc_id AS u, 0 AS h FROM documents "
        "UNION SELECT r.v, e.dst AS u, r.h + 1 AS h FROM reach r "
        f"JOIN edges e ON e.src = r.u WHERE r.h < {max_h}), "
        "md AS (SELECT v, u, MIN(h) AS minh FROM reach GROUP BY 1, 2), "
        f"urank AS (SELECT u, CAST(h >> {64 - p} AS BIGINT) AS idx, "
        "64 - length(bin(CAST((CAST(h AS HUGEINT) % "
        f"CAST({1 << (64 - p)} AS HUGEINT)) * {1 << p} + {(1 << p) - 1} "
        "AS UBIGINT))) + 1 AS rank "
        f"FROM (SELECT DISTINCT u, {hh} AS h FROM (SELECT u FROM md))), "
        "mh AS (SELECT md.v, md.u, g.h FROM md "
        f"CROSS JOIN generate_series(0, {max_h}) g(h) WHERE md.minh <= g.h), "
        "reg AS (SELECT mh.v, mh.h, ur.idx, MAX(ur.rank) AS r FROM mh "
        "JOIN urank ur ON ur.u = mh.u GROUP BY 1, 2, 3), "
        "agg AS (SELECT v, h, SUM(CAST(power(2.0, CAST(64 - r AS DOUBLE)) "
        "AS HUGEINT)) AS pnum, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM reg GROUP BY 1, 2), "
        f"e AS (SELECT v, h, CAST({alpha} AS DOUBLE) * {m} * {m} "
        "* 18446744073709551616.0 / CAST(pnum + "
        f"(CAST({m} AS HUGEINT) - cnt) * CAST(18446744073709551616.0 AS HUGEINT) "
        f"AS DOUBLE) AS est0, {m} - cnt AS zeros FROM agg), "
        f"pe AS (SELECT v, h, CAST(FLOOR((CASE WHEN est0 <= {m} * 2.5 "
        f"AND zeros > 0 THEN {m} * ln(CAST({m} AS DOUBLE) / zeros) "
        "ELSE est0 END) + 0.5) AS BIGINT) AS pairs FROM e), "
        "nh AS (SELECT h, CAST(SUM(pairs) AS BIGINT) AS pairs_est FROM pe "
        "GROUP BY h), "
        f"fin AS (SELECT pairs_est AS f FROM nh WHERE h = {max_h}), "
        "fr AS (SELECT h, pairs_est, pairs_est * 1000000 // "
        "(SELECT f FROM fin) AS frac_ppm FROM nh), "
        "d90 AS (SELECT MIN(h) AS d FROM fr WHERE frac_ppm >= 900000) "
        "SELECT h, pairs_est, frac_ppm, "
        "CAST(CASE WHEN h = (SELECT d FROM d90) THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_effective_diameter FROM fr ORDER BY h"
    )


def _minhash_clusters_sql() -> str:
    """Connected components (min doc_id per component) over the SQL-replayed
    MinHash pair graph -- same recursive-closure pattern as the ngram
    cluster oracle."""
    return (
        f"WITH RECURSIVE {_minhash_ctes()}, "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM mpairs "
        "UNION SELECT doc_b, doc_a FROM mpairs), "
        "reach AS (SELECT a, b FROM edges "
        "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), "
        "cl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a) "
        "SELECT doc_id, cluster_id FROM cl"
    )


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Replay of pipelines/analytics.simhash_pairs: per-token-occurrence
    md5-prefix hash, per-bit majority vote (bit p of the simhash is
    sum(2*((h>>p)&1)-1) > 0 -- the identity dedup.simhash64's
    unpackbits/packbits round trip computes), 16-bit band blocking, and
    Hamming <= max_hamming via bit_count(xor). The engine's bucket skew cap
    (over _MAX_GROUP_SIZE members -> representative-only pairing) is modeled
    exactly by the sbc CTE."""
    from distributed_system___ocr_ray.functions import dedup as dk

    _SIMHASH_CAP = dk._MAX_GROUP_SIZE
    th = _MD5U64.format(v="tk")
    return (
        "WITH tw AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tk "
        "FROM documents), "
        f"th AS (SELECT doc_id, {th} AS h FROM tw), "
        "bitv AS (SELECT doc_id, g.p AS p, "
        "SUM(CASE WHEN (h >> CAST(g.p AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v "
        "FROM th CROSS JOIN generate_series(0, 63) g(p) GROUP BY doc_id, g.p), "
        "shv AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN "
        "(CAST(1 AS UBIGINT) << CAST(p AS INTEGER)) ELSE 0 END) AS UBIGINT) AS sh "
        "FROM bitv GROUP BY doc_id), "
        "shall AS (SELECT d.doc_id, CAST(COALESCE(s.sh, 0) AS UBIGINT) AS sh "
        "FROM documents d LEFT JOIN shv s ON d.doc_id = s.doc_id), "
        "sb AS (SELECT doc_id, gb.b AS band, "
        "CAST((sh >> CAST(16 * gb.b AS INTEGER)) & 65535 AS BIGINT) AS bkey, sh "
        "FROM shall CROSS JOIN generate_series(0, 3) gb(b)), "
        # the engine's bucket cap: over _MAX_GROUP_SIZE members, pair each
        # member with the bucket's min id (representative) only
        "sbc AS (SELECT band, bkey, COUNT(*) AS n, MIN(doc_id) AS rep "
        "FROM sb GROUP BY band, bkey), "
        "scand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "a.sh AS sha, b.sh AS shb FROM sb a "
        "JOIN sb b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id "
        "JOIN sbc c ON c.band = a.band AND c.bkey = a.bkey "
        f"WHERE c.n <= {_SIMHASH_CAP} OR a.doc_id = c.rep) "
        "SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming "
        f"FROM scand WHERE bit_count(xor(sha, shb)) <= {max_hamming}"
    )


def _bm25_prf_sql(queries: list[str] | None = None, k: int | None = None,
                  fb_docs: int = 3, fb_terms: int = 3,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """Replay of ``analytics.bm25_prf_topk``: the _bm25_sql scoring body
    factored over a PLUGGABLE (query_id, term) source, run once with the
    literal round-1 terms, once with the expansion-augmented q2 CTE;
    expansion = per-query top-``fb_terms`` candidates by occurrences x
    ``length(bin(N // df)) - 1`` whole-bit idf, (wgt DESC, term) ties,
    candidates = feedback-doc tokens minus that query's own terms."""
    import re

    queries = _BM25_QUERIES if queries is None else queries
    k = _BM25_K if k is None else k
    qt = sorted({(qi, w) for qi, q in enumerate(queries)
                 for w in re.findall(r"[a-z0-9]+", q.lower())})
    qvals = ", ".join(f"({qi}, '{w}')" for qi, w in qt)
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    k1r, br = repr(k1), repr(b)
    ts_expr = (
        f"(idf * (tf * CAST({k1p1} AS DOUBLE))) / "
        f"(tf + CAST({k1r} AS DOUBLE) * (CAST({omb} AS DOUBLE) "
        f"+ CAST({br} AS DOUBLE) * (dl / avgdl)))"
    )

    def bm25_round(qsrc: str, suffix: str, kk: int) -> str:
        return (
            f"tf{suffix} AS (SELECT q.query_id, q.term, t.doc_id, "
            f"CAST(COUNT(*) AS DOUBLE) AS tf FROM tok t JOIN {qsrc} q ON t.tk = q.term "
            "GROUP BY q.query_id, q.term, t.doc_id), "
            f"df{suffix} AS (SELECT tk AS term, COUNT(DISTINCT doc_id) AS df FROM tok "
            f"WHERE tk IN (SELECT term FROM {qsrc}) GROUP BY tk), "
            f"idf{suffix} AS (SELECT term, ln(1.0 + (CAST((SELECT n FROM g) - df "
            f"AS DOUBLE) + 0.5) / (df + 0.5)) AS idf FROM df{suffix}), "
            f"ts{suffix} AS (SELECT tf.query_id, tf.doc_id, "
            f"CAST(FLOOR({ts_expr} * 1000000.0 + 0.5) AS BIGINT) AS ppm "
            f"FROM tf{suffix} tf JOIN idf{suffix} idf ON idf.term = tf.term "
            "JOIN d ON d.doc_id = tf.doc_id CROSS JOIN g), "
            f"sc{suffix} AS (SELECT query_id, doc_id, CAST(SUM(ppm) AS BIGINT) "
            f"AS score_ppm FROM ts{suffix} GROUP BY query_id, doc_id), "
            f"top{suffix} AS (SELECT query_id, doc_id, score_ppm FROM sc{suffix} "
            f"QUALIFY row_number() OVER (PARTITION BY query_id "
            f"ORDER BY score_ppm DESC, doc_id) <= {kk})"
        )

    return (
        "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w "
        "FROM documents), "
        "d AS (SELECT doc_id, len(w) AS dl FROM w), "
        "g AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl "
        "FROM d), "
        "tok AS (SELECT doc_id, unnest(w) AS tk FROM w), "
        f"q1(query_id, term) AS (VALUES {qvals}), "
        + bm25_round("q1", "1", fb_docs) + ", "
        "cand AS (SELECT r.query_id, t.tk AS term, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM top1 r JOIN tok t ON t.doc_id = r.doc_id "
        "LEFT JOIN q1 qq ON qq.query_id = r.query_id AND qq.term = t.tk "
        "WHERE qq.term IS NULL GROUP BY 1, 2), "
        "dfall AS (SELECT tk AS term, COUNT(DISTINCT doc_id) AS df FROM tok "
        "WHERE tk IN (SELECT term FROM cand) GROUP BY 1), "
        "wt AS (SELECT c.query_id, c.term, "
        "c.c * (length(bin((SELECT n FROM g) // da.df)) - 1) AS wgt "
        "FROM cand c JOIN dfall da ON da.term = c.term), "
        "exp AS (SELECT query_id, term FROM wt "
        "QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY wgt DESC, term) <= {fb_terms}), "
        "q2 AS (SELECT query_id, term FROM q1 UNION SELECT query_id, term FROM exp), "
        + bm25_round("q2", "2", k)
        + " SELECT query_id, doc_id, score_ppm FROM top2"
    )


def _bm25_sql(queries: list[str] | None = None, k: int | None = None,
              k1: float = 1.2, b: float = 0.75) -> str:
    """Replay of pipelines/analytics.bm25_topk: same [a-z0-9]+ lowercase
    tokenization, same Lucene idf ln(1 + (N-df+0.5)/(df+0.5)), the same
    double arithmetic written with the engine's evaluation order and
    repr()-exact constant literals, per-TERM ppm floor then INTEGER sum
    (order-independent on both sides), ranked top-k with the (score desc,
    doc_id asc) tie-break."""
    import re

    queries = _BM25_QUERIES if queries is None else queries
    k = _BM25_K if k is None else k
    qt = sorted(
        {(qi, w) for qi, q in enumerate(queries) for w in re.findall(r"[a-z0-9]+", q.lower())}
    )
    if not qt:  # no query yields a token: typed-empty result, not VALUES ()
        return (
            "SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS doc_id, "
            "CAST(NULL AS BIGINT) AS score_ppm WHERE 1 = 0"
        )
    qvals = ", ".join(f"({qi}, '{w}')" for qi, w in qt)
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    k1r, br = repr(k1), repr(b)
    ts_expr = (
        f"(idf * (tf * CAST({k1p1} AS DOUBLE))) / "
        f"(tf + CAST({k1r} AS DOUBLE) * (CAST({omb} AS DOUBLE) "
        f"+ CAST({br} AS DOUBLE) * (dl / avgdl)))"
    )
    return (
        "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w "
        "FROM documents), "
        "d AS (SELECT doc_id, len(w) AS dl FROM w), "
        "g AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sdl, "
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM d), "
        "tok AS (SELECT doc_id, unnest(w) AS tk FROM w), "
        f"q(query_id, term) AS (VALUES {qvals}), "
        "tf AS (SELECT q.query_id, q.term, t.doc_id, "
        "CAST(COUNT(*) AS DOUBLE) AS tf FROM tok t JOIN q ON t.tk = q.term "
        "GROUP BY q.query_id, q.term, t.doc_id), "
        "df AS (SELECT tk AS term, COUNT(DISTINCT doc_id) AS df FROM tok "
        "WHERE tk IN (SELECT term FROM q) GROUP BY tk), "
        "idf AS (SELECT term, ln(1.0 + (CAST((SELECT n FROM g) - df AS DOUBLE) + 0.5) "
        "/ (df + 0.5)) AS idf FROM df), "
        "ts AS (SELECT tf.query_id, tf.doc_id, "
        f"CAST(FLOOR({ts_expr} * 1000000.0 + 0.5) AS BIGINT) AS ppm "
        "FROM tf JOIN idf ON idf.term = tf.term JOIN d ON d.doc_id = tf.doc_id "
        "CROSS JOIN g), "
        "sc AS (SELECT query_id, doc_id, CAST(SUM(ppm) AS BIGINT) AS score_ppm "
        "FROM ts GROUP BY query_id, doc_id) "
        "SELECT query_id, doc_id, score_ppm FROM sc "
        f"QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY score_ppm DESC, doc_id) <= {k}"
    )


def _kcenter_sql(k: int = 8, quant: int = 1000) -> str:
    """Replay of analytics.kcenter_coreset: the same milli quantization
    (FLOOR(x*quant+0.5)), min-id seed, and k-1 unrolled Gonzalez rounds --
    each round's running-min distance d{r} = LEAST(d{r-1}, distsq to the
    round-r center) and its argmax with the exact (d DESC, vec_id)
    tie-break, selected ids excluded like the engine's in-stage mask.
    SUMs stay HUGEINT mid-query; the projection CASTs to BIGINT.
    Every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    d{r} -> c{r} -> d{r+1} recurrence would otherwise expand into an
    exponentially nested plan (observed: the k=8 chain never finished)."""
    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS v "
        "FROM embeddings), "
        "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
        "u AS MATERIALIZED (SELECT vec_id, i, v[i] AS x FROM q, dims "
        "WHERE v[i] IS NOT NULL), "
        "c1 AS MATERIALIZED (SELECT MIN(vec_id) AS id FROM q), "
        "d1 AS MATERIALIZED (SELECT u.vec_id, "
        "SUM((u.x - c.x) * (u.x - c.x)) AS d FROM u "
        "JOIN u c ON c.i = u.i AND c.vec_id = (SELECT id FROM c1) GROUP BY 1)"
    ]
    for r in range(2, k + 1):
        sel = ", ".join(f"(SELECT id FROM c{j})" for j in range(1, r))
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT vec_id AS id, d FROM d{r - 1} "
            f"WHERE vec_id NOT IN ({sel}) ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"d{r} AS MATERIALIZED (SELECT p.vec_id, LEAST(p.d, n.d) AS d "
                f"FROM d{r - 1} p "
                "JOIN (SELECT u.vec_id, SUM((u.x - c.x) * (u.x - c.x)) AS d FROM u "
                f"JOIN u c ON c.i = u.i AND c.vec_id = (SELECT id FROM c{r}) "
                "GROUP BY 1) n ON n.vec_id = p.vec_id)"
            )
    rows = [
        "SELECT CAST(1 AS BIGINT) AS sel_order, (SELECT id FROM c1) AS vec_id, "
        "CAST(0 AS BIGINT) AS distsq"
    ] + [
        f"SELECT CAST({r} AS BIGINT), (SELECT id FROM c{r}), "
        f"CAST((SELECT d FROM c{r}) AS BIGINT)"
        for r in range(2, k + 1)
    ]
    return (
        ", ".join(parts)
        + " SELECT * FROM (" + " UNION ALL ".join(rows) + ") "
        "WHERE vec_id IS NOT NULL ORDER BY sel_order"
    )


def _stationary_sql(iters: int = 12, scale: int = 1_000_000) -> str:
    """Replay of analytics.event_type_stationary: the shared LAG
    transition counts, then ``iters`` unrolled rounds -- per-source-term
    truncating division by the row sum, truncating renormalization to
    ``scale`` (all mass non-negative, no sign split needed); a vanished
    total NULLs the division and COALESCE yields the engine's all-zero.
    Chained CTEs MATERIALIZED."""
    parts = [
        "WITH tr AS MATERIALIZED (SELECT prev AS prev_type, event_type AS "
        "next_type, CAST(COUNT(*) AS HUGEINT) AS n FROM (SELECT event_type, "
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events) WHERE prev IS NOT NULL GROUP BY 1, 2), "
        "ty AS MATERIALIZED (SELECT DISTINCT t FROM (SELECT prev_type AS t "
        "FROM tr UNION SELECT next_type FROM tr)), "
        "kk AS (SELECT COUNT(*) AS k FROM ty), "
        "rs AS MATERIALIZED (SELECT prev_type, SUM(n) AS rsum FROM tr "
        "GROUP BY 1), "
        f"p0 AS MATERIALIZED (SELECT t, CAST({scale} // "
        "(SELECT k FROM kk) AS HUGEINT) AS v FROM ty)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT tr.next_type AS t, "
            "SUM((p.v * tr.n) // rs.rsum) AS raw FROM tr "
            f"JOIN p{t - 1} p ON p.t = tr.prev_type "
            "JOIN rs ON rs.prev_type = tr.prev_type GROUP BY 1)"
        )
        parts.append(f"tt{t} AS (SELECT SUM(raw) AS tot FROM r{t})")
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT ty.t, COALESCE((r.raw * {scale}) "
            f"// (SELECT tot FROM tt{t}), 0) AS v FROM ty "
            f"LEFT JOIN r{t} r ON r.t = ty.t)"
        )
    return (
        ", ".join(parts)
        + f" SELECT t AS event_type, CAST(v AS BIGINT) AS pi_scaled "
        f"FROM p{iters} ORDER BY t"
    )


def _pca_sql(iters: int = 12, quant: int = 1000, scale: int = 1_000_000) -> str:
    """Replay of analytics.pca_top_component: the same one-pass moment
    fold (n, per-dim sums, full second-moment grid -> the n^2-scaled
    integer covariance), then ``iters`` unrolled power-iteration rounds --
    w = C v in HUGEINT, rescale by sign-split truncating division exactly
    as the engine spells it, max|w| = 0 keeps v. Rayleigh quotient
    lambda_micro = (v'Cv * 1e6) // (v'v * n^2), nonneg both sides (C is
    PSD) so plain floor-div. All chained CTEs MATERIALIZED (same
    exponential-inlining hazard as _kcenter_sql)."""
    parts = [
        "WITH q AS MATERIALIZED (SELECT list_transform(embedding, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS v, "
        "row_number() OVER () AS rid FROM embeddings), "
        "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
        "u AS MATERIALIZED (SELECT rid, i, v[i] AS x FROM q, dims "
        "WHERE v[i] IS NOT NULL), "
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM q), "
        "st AS MATERIALIZED (SELECT i, SUM(CAST(x AS HUGEINT)) AS s FROM u "
        "GROUP BY 1), "
        "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, "
        "SUM(CAST(a.x AS HUGEINT) * b.x) AS sij FROM u a "
        "JOIN u b ON a.rid = b.rid GROUP BY 1, 2), "
        "c AS MATERIALIZED (SELECT g.i, g.j, "
        "(SELECT n FROM nn) * g.sij - sa.s * sb.s AS cv FROM g "
        "JOIN st sa ON sa.i = g.i JOIN st sb ON sb.i = g.j), "
        "v0 AS MATERIALIZED (SELECT i, CAST(CASE WHEN i = "
        f"(SELECT MIN(i) FROM st) THEN {scale} ELSE 0 END AS HUGEINT) AS v "
        "FROM st)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT c.i, SUM(c.cv * v.v) AS w "
            f"FROM c JOIN v{t - 1} v ON v.i = c.j GROUP BY 1)"
        )
        parts.append(f"m{t} AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w{t})")
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT p.i, "
            f"CASE WHEN (SELECT m FROM m{t}) = 0 THEN p.v "
            f"WHEN w.w >= 0 THEN (w.w * {scale}) // (SELECT m FROM m{t}) "
            f"ELSE -(((-w.w) * {scale}) // (SELECT m FROM m{t})) END AS v "
            f"FROM v{t - 1} p JOIN w{t} w ON w.i = p.i)"
        )
    last = f"v{iters}"
    parts.append(
        "ray AS MATERIALIZED (SELECT SUM(va.v * c.cv * vb.v) AS r FROM c "
        f"JOIN {last} va ON va.i = c.i JOIN {last} vb ON vb.i = c.j)"
    )
    parts.append(f"vv AS MATERIALIZED (SELECT SUM(v * v) AS q2 FROM {last})")
    return (
        ", ".join(parts)
        + " SELECT CAST(i AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_scaled, "
        "CAST(((SELECT r FROM ray) * 1000000) // ((SELECT q2 FROM vv) * "
        "(SELECT n FROM nn) * (SELECT n FROM nn)) AS BIGINT) AS lambda_micro "
        f"FROM {last} ORDER BY dim"
    )


def _approx_distinct_sql(p: int = 12) -> str:
    """Replay of functions/sketches.HyperLogLog: md5-prefix 64-bit hash,
    idx = top p bits, rest = (h << p) | ones (the wrap emulated via
    HUGEINT mod), rank = leading zeros + 1 (MIN set-bit position),
    register maxima over 2^p registers (absent = 0), then the exact
    estimator: alpha*m^2/sum(2^-reg) with the linear-counting branch.
    The only float arithmetic is the final estimator, computed by the same
    double ops on both sides; the estimate is compared as a rounded
    integer."""
    m = 1 << p
    alpha = repr(0.7213 / (1 + 1.079 / m))
    h = _MD5U64.format(v="CAST(user_id AS VARCHAR)")
    return (
        "WITH v AS (SELECT DISTINCT user_id FROM events), "
        f"h AS (SELECT {h} AS h FROM v), "
        f"rr AS (SELECT CAST(h >> {64 - p} AS BIGINT) AS idx, "
        f"CAST((CAST(h AS HUGEINT) % CAST({1 << (64 - p)} AS HUGEINT)) "
        f"* {1 << p} + {(1 << p) - 1} AS UBIGINT) AS rest FROM h), "
        # per-HASH first-set-bit rank (GROUP BY idx, rest), THEN the register
        # fold takes MAX over hashes -- grouping by idx alone would collapse
        # every hash in a register to the global MIN rank, which diverges from
        # the engine's np.maximum.at register maxima once registers hold
        # multiple hashes (verified: 4093/4096 registers wrong at 60k users)
        "rk AS (SELECT idx, rest, MIN(g.k) AS rank FROM rr "
        "CROSS JOIN generate_series(1, 64) g(k) "
        "WHERE (rest >> CAST(64 - g.k AS INTEGER)) & 1 = 1 GROUP BY idx, rest), "
        "reg AS (SELECT idx, MAX(rank) AS r FROM rk GROUP BY idx), "
        f"allr AS (SELECT gs.i AS idx, COALESCE(reg.r, 0) AS r "
        f"FROM generate_series(0, {m - 1}) gs(i) LEFT JOIN reg ON reg.idx = gs.i), "
        # the register sum is an exact HUGEINT (sum of 2^(64-r), r <= 64) so
        # the only rounding is the final cast to DOUBLE -- a float SUM()
        # here would be accumulation-order-sensitive in the last ulp and
        # could diverge from the engine's numpy sum (then flip the rounded
        # integer estimate); power(2.0, 64-r) is an exact power-of-two
        # double, and its HUGEINT cast is exact
        f"e AS (SELECT CAST({alpha} AS DOUBLE) * CAST({m} AS DOUBLE) "
        f"* CAST({m} AS DOUBLE) * 18446744073709551616.0 "
        "/ CAST(SUM(CAST(power(2.0, CAST(64 - r AS DOUBLE)) AS HUGEINT)) AS DOUBLE) "
        "AS est0, "
        "SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros FROM allr) "
        f"SELECT CAST(FLOOR((CASE WHEN est0 <= CAST({m} AS DOUBLE) * 2.5 AND zeros > 0 "
        f"THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / zeros) ELSE est0 END) "
        "+ 0.5) AS BIGINT) AS approx_distinct_users FROM e"
    )


def _approx_distinct_by_type_sql(p: int = 10) -> str:
    """Grouped replay of _approx_distinct_sql: the identical HLL pipeline
    (md5-prefix hash, per-hash MIN set-bit rank, per-register MAX, exact
    HUGEINT register sum, linear-counting branch) with event_type threaded
    through every CTE -- one register table and one estimate per type."""
    m = 1 << p
    alpha = repr(0.7213 / (1 + 1.079 / m))
    h = _MD5U64.format(v="CAST(user_id AS VARCHAR)")
    return (
        "WITH v AS (SELECT DISTINCT event_type, user_id FROM events), "
        f"h AS (SELECT event_type, {h} AS h FROM v), "
        f"rr AS (SELECT event_type, CAST(h >> {64 - p} AS BIGINT) AS idx, "
        f"CAST((CAST(h AS HUGEINT) % CAST({1 << (64 - p)} AS HUGEINT)) "
        f"* {1 << p} + {(1 << p) - 1} AS UBIGINT) AS rest FROM h), "
        "rk AS (SELECT event_type, idx, rest, MIN(g.k) AS rank FROM rr "
        "CROSS JOIN generate_series(1, 64) g(k) "
        "WHERE (rest >> CAST(64 - g.k AS INTEGER)) & 1 = 1 GROUP BY 1, 2, 3), "
        "reg AS (SELECT event_type, idx, MAX(rank) AS r FROM rk GROUP BY 1, 2), "
        "types AS (SELECT DISTINCT event_type FROM events), "
        f"allr AS (SELECT t.event_type, gs.i AS idx, COALESCE(reg.r, 0) AS r "
        f"FROM types t CROSS JOIN generate_series(0, {m - 1}) gs(i) "
        "LEFT JOIN reg ON reg.event_type = t.event_type AND reg.idx = gs.i), "
        f"e AS (SELECT event_type, CAST({alpha} AS DOUBLE) * CAST({m} AS DOUBLE) "
        f"* CAST({m} AS DOUBLE) * 18446744073709551616.0 "
        "/ CAST(SUM(CAST(power(2.0, CAST(64 - r AS DOUBLE)) AS HUGEINT)) AS DOUBLE) "
        "AS est0, SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros "
        "FROM allr GROUP BY event_type) "
        f"SELECT event_type, CAST(FLOOR((CASE WHEN est0 <= CAST({m} AS DOUBLE) * 2.5 "
        f"AND zeros > 0 THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / zeros) "
        "ELSE est0 END) + 0.5) AS BIGINT) AS approx_distinct FROM e"
    )


# python str.strip() / \s whitespace set (ASCII subset; the corpus is ASCII)
_WS_SQL = "(' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))"


def _sent_sql(tag_sql: str, lo: int = 4, hi: int = 10) -> str:
    """SQL expression replaying corpus.det_sentence(tag): word count and word
    indices are div/mod slices of the 64-bit md5 prefix of the tag, with the
    word list and exact integer divisors (span * N_WORDS^j) as literals."""
    from distributed_system___ocr_ray.corpus import _WORDS, N_WORDS

    span = hi - lo + 1
    hu = _MD5U64.format(v=tag_sql)
    words = ", ".join(f"'{w}'" for w in _WORDS)
    divs = ", ".join(str(span * N_WORDS**j) for j in range(hi))
    body = (
        f"array_to_string(list_transform("
        f"generate_series(0, CAST({hu} % {span} AS INT) + {lo - 1}), "
        f"j -> ([{words}])[CAST(({hu} // (CAST([{divs}] AS UBIGINT[]))[j + 1]) "
        f"% {N_WORDS} AS INT) + 1]), ' ')"
    )
    return f"(upper(substr({body}, 1, 1)) || substr({body}, 2) || '.')"


def _interleaved_ctes(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """CTE body producing ``allspans(doc_id, ord, kind, ref, out)`` -- the
    closed-form replay of the ENTIRE flagship pipeline (wrap -> explode ->
    kind-routed extraction -> offset-ordered reassembly) from the documents
    table alone. Per doc_id: span structure/refs are doc_id arithmetic
    (sources/wrap.py), the stripped text span is h1 + the doc's normalized
    sentences (functions/html_strip semantics on the det page template), the
    image span replays the glyph-OCR truth sentence (corpus.det_sentence md5
    arithmetic) or its corruption/missing sentinels, and the pdf span
    replays mini-PDF block layout + pdfminer-style reading order
    (sort by x//200 column, then y, then x) in SQL. Shared by the flagship
    pair of oracles and the composed extract->embed->neardup oracle."""
    from distributed_system___ocr_ray.sources import wrap as _wrap

    n_img, n_pdf = _wrap.DEFAULT_N_IMG, _wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)
    img_tag = f"'{seed}:img:' || g.i"
    img_c_tag = img_tag + " || ':c'"
    pdfj_tag = f"'{seed}:pdf:' || g.i || ':' || gj.j"
    pdfj_s_tag = pdfj_tag + " || ':s'"
    pdf_nb_tag = f"'{seed}:pdf:' || g.i || ':nb'"
    pdf_c_tag = f"'{seed}:pdf:' || a.i || ':c'"
    h1_tag = f"'{seed}:wrap:' || doc_id || ':h1'"
    ws = _WS_SQL
    return (
        "imgt AS ("
        "SELECT g.i AS i, "
        f"CASE WHEN {_MD5U64.format(v=img_c_tag)} < {th} "
        "THEN 'OCR operation error' "
        f"ELSE {_sent_sql(img_tag)} END AS t "
        f"FROM generate_series(0, {n_img - 1}) g(i)), "
        "pdfb AS ("
        "SELECT g.i AS i, gj.j AS j, "
        f"CAST(([10,30,230,250,450])[CAST({_MD5U64.format(v=pdfj_tag)} % 5 AS INT) + 1] AS INT) AS x, "
        f"CAST(40 * gj.j + CAST(({_MD5U64.format(v=pdfj_tag)} // 5) % 21 AS INT) AS INT) AS y, "
        f"{_sent_sql(pdfj_s_tag)} AS s "
        f"FROM generate_series(0, {n_pdf - 1}) g(i) "
        "CROSS JOIN generate_series(0, 3) gj(j) "
        f"WHERE gj.j <= CAST({_MD5U64.format(v=pdf_nb_tag)} % 4 AS INT)), "
        "pdfagg AS ("
        "SELECT i, string_agg(s, chr(10) ORDER BY x // 200, y, x) AS t FROM pdfb GROUP BY i), "
        "pdft AS ("
        "SELECT a.i AS i, "
        f"CASE WHEN {_MD5U64.format(v=pdf_c_tag)} < {th} "
        "THEN 'PDF parse error' ELSE a.t END AS t FROM pdfagg a), "
        "txt AS ("
        f"SELECT doc_id, {_sent_sql(h1_tag, 2, 4)} AS h1, "
        "list_transform("
        f"list_filter(string_split(text, '.'), p -> trim(p, {ws}) <> ''), "
        f"p -> regexp_replace(trim(p, {ws}), '\\s+', ' ', 'g') || '.')[1:3] AS sents, "
        "text FROM documents), "
        "txt2 AS ("
        "SELECT doc_id, array_to_string(list_filter(list_prepend(h1, "
        "CASE WHEN len(sents) = 0 "
        f"THEN [trim(regexp_replace(substr(text, 1, 200), '\\s+', ' ', 'g'), {ws})] "
        "ELSE sents END), x -> x <> ''), chr(10)) AS stripped FROM txt), "
        "allspans AS ("
        "SELECT doc_id, 0 AS ord, 'text' AS kind, '' AS ref, stripped AS out FROM txt2 "
        "UNION ALL "
        "SELECT d.doc_id, 1 + gk.k AS ord, 'image' AS kind, "
        "CASE WHEN (d.doc_id + gk.k) % 20 = 0 THEN printf('mem://img/missing-%06d', d.doc_id) "
        f"ELSE printf('mem://img/%06d', (d.doc_id*7 + gk.k*3) % {n_img}) END AS ref, "
        "CASE WHEN (d.doc_id + gk.k) % 20 = 0 THEN 'Image download error' ELSE it.t END AS out "
        "FROM documents d CROSS JOIN generate_series(0, 1) gk(k) "
        f"LEFT JOIN imgt it ON it.i = (d.doc_id*7 + gk.k*3) % {n_img} "
        "WHERE gk.k <= d.doc_id % 2 "
        "UNION ALL "
        "SELECT d.doc_id, 2 AS ord, 'pdf' AS kind, "
        "CASE WHEN d.doc_id % 40 = 10 THEN printf('mem://pdf/missing-%06d', d.doc_id) "
        f"ELSE printf('mem://pdf/%06d', (d.doc_id*11) % {n_pdf}) END AS ref, "
        "CASE WHEN d.doc_id % 40 = 10 THEN 'PDF download error' ELSE pt.t END AS out "
        f"FROM documents d LEFT JOIN pdft pt ON pt.i = (d.doc_id*11) % {n_pdf} "
        "WHERE d.doc_id % 2 = 0)"
    )


def _interleaved_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Flagship oracle: canonical per-doc serialization (matching
    _encode_spans_column) of the closed-form span table."""
    return (
        f"WITH {_interleaved_ctes(seed, corrupt_frac)} "
        "SELECT printf('doc-%010d', doc_id) AS doc_id, "
        "string_agg(CAST(ord AS VARCHAR) || chr(31) || kind || chr(31) || ref || chr(31) || out, "
        "chr(30) ORDER BY ord) AS spans_enc "
        "FROM allspans GROUP BY doc_id"
    )


def _extract_embed_neardup_sql(threshold: float = 0.999, dim: int = 64) -> str:
    """Composed-pipeline oracle: the closed-form extracted span table ->
    HashEmbedder replay (lowercased whitespace tokens -> md5-prefix % dim
    bucket counts, cosine on the count vectors -- normalization cancels in
    the cosine ratio) -> the EXACT >= threshold pair set. As with
    embedding_neardup, LSH recall on it is probabilistic by design (~0.999
    at this threshold; planted-dup recall is pytest-held), so the compare is
    honest but strict."""
    bucket = _MD5U64.format(v="tok")
    return (
        f"WITH {_interleaved_ctes()}, "
        "doctext AS (SELECT printf('doc-%010d', doc_id) AS doc, "
        "string_agg(out, chr(10) ORDER BY ord) AS text FROM allspans GROUP BY doc_id), "
        # the query's replicate=2 twin: same spans under the '-r001' id
        "doctext2 AS (SELECT doc, text FROM doctext "
        "UNION ALL SELECT doc || '-r001', text FROM doctext), "
        "toks AS (SELECT doc, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok FROM doctext2), "
        f"vec AS (SELECT doc, CAST({bucket} % {dim} AS INT) AS bucket, "
        "CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY 1, 2), "
        "nrm AS (SELECT doc, sqrt(SUM(c * c)) AS n FROM vec GROUP BY doc) "
        "SELECT a.doc AS vec_a, b.doc AS vec_b "
        "FROM vec a JOIN vec b ON a.bucket = b.bucket AND a.doc < b.doc "
        "JOIN nrm na ON na.doc = a.doc JOIN nrm nb ON nb.doc = b.doc "
        "GROUP BY a.doc, b.doc, na.n, nb.n "
        f"HAVING SUM(a.c * b.c) / (na.n * nb.n) >= {threshold}"
    )


def _media_metadata_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Independent replay of MediaMetadata over the md5-deterministic store:
    payload sizes are recomputed from the wire formats themselves -- GLY1 =
    4B magic + 4B dims + packbits(7 rows x 6n cols), minus 3 truncated bytes
    when corrupt; MPDF1 = 5B magic + the exact ``json.dumps(sort_keys=True)``
    body length (rebuilt character-for-character via string_agg). Needs no
    driver view: everything derives from generate_series + md5."""
    from distributed_system___ocr_ray.sources import wrap as _wrap

    n_img, n_pdf = _wrap.DEFAULT_N_IMG, _wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)
    img_tag = f"'{seed}:img:' || g.i"
    img_c_tag = img_tag + " || ':c'"
    pdfj_tag = f"'{seed}:pdf:' || g.i || ':' || gj.j"
    pdfj_s_tag = pdfj_tag + " || ':s'"
    pdf_nb_tag = f"'{seed}:pdf:' || g.i || ':nb'"
    pdf_c_tag = f"'{seed}:pdf:' || p.i || ':c'"
    return (
        "WITH imgs AS ("
        f"SELECT g.i AS i, length({_sent_sql(img_tag)}) AS n, "
        f"{_MD5U64.format(v=img_c_tag)} < {th} AS corrupt "
        f"FROM generate_series(0, {n_img - 1}) g(i)), "
        "imgm AS ("
        "SELECT printf('mem://img/%06d', i) AS media_ref, 'gly1' AS media_kind, "
        "CAST(8 + (42 * n + 7) // 8 - CASE WHEN corrupt THEN 3 ELSE 0 END AS BIGINT) AS n_bytes, "
        "CAST(6 * n AS BIGINT) AS width, CAST(7 AS BIGINT) AS height, "
        "CAST(-1 AS BIGINT) AS n_blocks FROM imgs), "
        "pdfb AS ("
        "SELECT g.i AS i, gj.j AS j, "
        f"CAST(([10,30,230,250,450])[CAST({_MD5U64.format(v=pdfj_tag)} % 5 AS INT) + 1] AS INT) AS x, "
        f"CAST(40 * gj.j + CAST(({_MD5U64.format(v=pdfj_tag)} // 5) % 21 AS INT) AS INT) AS y, "
        f"{_sent_sql(pdfj_s_tag)} AS s "
        f"FROM generate_series(0, {n_pdf - 1}) g(i) "
        "CROSS JOIN generate_series(0, 3) gj(j) "
        f"WHERE gj.j <= CAST({_MD5U64.format(v=pdf_nb_tag)} % 4 AS INT)), "
        "pdfj AS ("
        "SELECT i, CAST(COUNT(*) AS BIGINT) AS nb, "
        "CAST(5 + length('{\"blocks\": [' || "
        "string_agg('{\"text\": \"' || s || '\", \"x\": ' || x || ', \"y\": ' || y || '}', "
        "', ' ORDER BY j) || ']}') AS BIGINT) AS n_bytes "
        "FROM pdfb GROUP BY i), "
        "pdfm AS ("
        "SELECT printf('mem://pdf/%06d', p.i) AS media_ref, "
        f"CASE WHEN {_MD5U64.format(v=pdf_c_tag)} < {th} THEN 'unknown' ELSE 'mpdf1' END AS media_kind, "
        "p.n_bytes AS n_bytes, CAST(-1 AS BIGINT) AS width, CAST(-1 AS BIGINT) AS height, "
        f"CASE WHEN {_MD5U64.format(v=pdf_c_tag)} < {th} THEN CAST(-1 AS BIGINT) ELSE p.nb END AS n_blocks "
        "FROM pdfj p) "
        "SELECT * FROM imgm UNION ALL SELECT * FROM pdfm"
    )


def _media_dedup_sql(seed: int = 42, corrupt_frac: float = 0.02) -> str:
    """Replay of ``analytics.media_dedup_groups`` over the mirrored store:
    payload CONTENT is replayed symbolically (payloads are md5-arithmetic
    functions of their tag: GLY1 <-> truth sentence + corrupt flag, MPDF1
    <-> exact sorted-keys JSON body + corrupt flag -- both corruptions are
    deterministic, so content-key equality <-> payload-byte equality on
    this fixture), every i%3==0 payload gains a mirror:// ref, and groups
    fold to (min ref, ref count)."""
    from distributed_system___ocr_ray.sources import wrap as _wrap

    n_img, n_pdf = _wrap.DEFAULT_N_IMG, _wrap.DEFAULT_N_PDF
    th = int(corrupt_frac * 2**64)
    img_tag = f"'{seed}:img:' || g.i"
    img_c_tag = img_tag + " || ':c'"
    pdfj_tag = f"'{seed}:pdf:' || g.i || ':' || gj.j"
    pdfj_s_tag = pdfj_tag + " || ':s'"
    pdf_nb_tag = f"'{seed}:pdf:' || g.i || ':nb'"
    pdf_c_tag = f"'{seed}:pdf:' || p.i || ':c'"
    return (
        "WITH imgs AS ("
        f"SELECT g.i AS i, {_sent_sql(img_tag)} AS content, "
        f"{_MD5U64.format(v=img_c_tag)} < {th} AS corrupt "
        f"FROM generate_series(0, {n_img - 1}) g(i)), "
        "imgk AS (SELECT i, 'img:' || content || "
        "CASE WHEN corrupt THEN ':C' ELSE '' END AS key FROM imgs), "
        "imgr AS ("
        "SELECT printf('mem://img/%06d', i) AS ref, key FROM imgk "
        "UNION ALL "
        "SELECT printf('mirror://img/%06d', i), key FROM imgk WHERE i % 3 = 0), "
        "pdfb AS ("
        "SELECT g.i AS i, gj.j AS j, "
        f"CAST(([10,30,230,250,450])[CAST({_MD5U64.format(v=pdfj_tag)} % 5 AS INT) + 1] AS INT) AS x, "
        f"CAST(40 * gj.j + CAST(({_MD5U64.format(v=pdfj_tag)} // 5) % 21 AS INT) AS INT) AS y, "
        f"{_sent_sql(pdfj_s_tag)} AS s "
        f"FROM generate_series(0, {n_pdf - 1}) g(i) "
        "CROSS JOIN generate_series(0, 3) gj(j) "
        f"WHERE gj.j <= CAST({_MD5U64.format(v=pdf_nb_tag)} % 4 AS INT)), "
        "pdfj AS ("
        "SELECT i, '{\"blocks\": [' || "
        "string_agg('{\"text\": \"' || s || '\", \"x\": ' || x || ', \"y\": ' || y || '}', "
        "', ' ORDER BY j) || ']}' AS body FROM pdfb GROUP BY i), "
        "pdfk AS (SELECT p.i AS i, 'pdf:' || p.body || "
        f"CASE WHEN {_MD5U64.format(v=pdf_c_tag)} < {th} THEN ':C' ELSE '' END "
        "AS key FROM pdfj p), "
        "pdfr AS ("
        "SELECT printf('mem://pdf/%06d', i) AS ref, key FROM pdfk "
        "UNION ALL "
        "SELECT printf('mirror://pdf/%06d', i), key FROM pdfk WHERE i % 3 = 0), "
        "allr AS (SELECT * FROM imgr UNION ALL SELECT * FROM pdfr) "
        "SELECT MIN(ref) AS keeper_ref, CAST(COUNT(*) AS BIGINT) AS n_refs "
        "FROM allr GROUP BY key ORDER BY keeper_ref"
    )


_ANN_TOPK_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
    "ORDER BY vec_id LIMIT 3) "
    "SELECT q.query_id AS query_id, e.vec_id AS vec_id FROM q CROSS JOIN embeddings e "
    "QUALIFY row_number() OVER (PARTITION BY q.query_id "
    "ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) <= 10"
)


_CCNET_BUCKET_SQL = (
    # replay of analytics.ccnet_bucket_counts: shared tokenizer, per-token
    # whole bits via the bit_length identity, mean-millibit floor-div
    # score, per-lang ceil(n/3)/ceil(2n/3) order-statistic thresholds via
    # row_number, bucket CASE, zero-count buckets kept by the base frame
    "WITH tok AS (SELECT doc_id, lang, "
    "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
    "FROM documents), "
    "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1), "
    "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok), "
    "d AS (SELECT t.doc_id, t.lang, "
    "SUM(length(bin((SELECT n FROM nt) // c.c)) - 1) AS total_bits, "
    "CAST(COUNT(*) AS BIGINT) AS n_tokens "
    "FROM tok t JOIN c ON c.token = t.token GROUP BY 1, 2), "
    "s AS (SELECT doc_id, lang, total_bits * 1000 // n_tokens AS score FROM d), "
    "r AS (SELECT lang, score, "
    "row_number() OVER (PARTITION BY lang ORDER BY score) AS rn, "
    "COUNT(*) OVER (PARTITION BY lang) AS n FROM s), "
    "th AS (SELECT lang, "
    "MAX(CASE WHEN rn = (n + 2) // 3 THEN score END) AS t1, "
    "MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN score END) AS t2 "
    "FROM r GROUP BY lang), "
    "b AS (SELECT s.lang, CASE WHEN s.score <= th.t1 THEN 'head' "
    "WHEN s.score <= th.t2 THEN 'middle' ELSE 'tail' END AS bucket "
    "FROM s JOIN th ON th.lang = s.lang), "
    "base AS (SELECT lang, unnest(['head', 'middle', 'tail']) AS bucket FROM th) "
    "SELECT base.lang, base.bucket, "
    "CAST(COALESCE(COUNT(b.lang), 0) AS BIGINT) AS n_docs "
    "FROM base LEFT JOIN b ON b.lang = base.lang AND b.bucket = base.bucket "
    "GROUP BY 1, 2 ORDER BY 1, 2"
)


def _filter_impact_sql(threshold_ppm: int = 400_000,
                       four_fifths_ppm: int = 800_000) -> str:
    """Replay of ``analytics.filter_impact_audit``: the shared quality
    CTEs, the >= threshold gate, per-lang floor-div pass rates, the
    max-rate impact ratio and the four-fifths flag (uniform-rejection
    degenerate case pinned to ratio 1e6 / flag 0 on both sides)."""
    return (
        f"WITH {_quality_ctes('lang')}, "
        f"q AS (SELECT lang, {_QPPM_EXPR} AS qp FROM r), "
        "g AS (SELECT lang, COUNT(*) AS n_docs, "
        f"SUM(CASE WHEN qp >= {threshold_ppm} THEN 1 ELSE 0 END) AS n_pass "
        "FROM q GROUP BY 1), "
        "g2 AS (SELECT lang, n_docs, n_pass, "
        "n_pass * 1000000 // n_docs AS pass_rate_ppm FROM g), "
        "m AS (SELECT MAX(pass_rate_ppm) AS mr FROM g2) "
        "SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(n_pass AS BIGINT) AS n_pass, "
        "CAST(pass_rate_ppm AS BIGINT) AS pass_rate_ppm, "
        "CAST(CASE WHEN (SELECT mr FROM m) = 0 THEN 1000000 "
        "ELSE pass_rate_ppm * 1000000 // (SELECT mr FROM m) END AS BIGINT) "
        "AS impact_ratio_ppm, "
        "CAST(CASE WHEN (SELECT mr FROM m) = 0 THEN 0 "
        f"WHEN pass_rate_ppm * 1000000 // (SELECT mr FROM m) < {four_fifths_ppm} "
        "THEN 1 ELSE 0 END AS BIGINT) AS flag_disparate "
        "FROM g2 ORDER BY lang"
    )


_TEXTTILING_SQL = (
    # replay of analytics.texttiling_boundaries: shared tokenizer,
    # position -> 20-token block fold, adjacent-block integer dot/norms,
    # squared-cosine ppm (squaring removes the sqrt), < 250k boundary
    # rule, one-block docs pinned to (0 gaps, 0 boundaries, 1e6)
    "WITH d0 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') "
    "AS ts FROM documents), "
    "d1 AS (SELECT doc_id, ts FROM d0 WHERE len(ts) > 0), "
    "mx AS (SELECT MAX(len(ts)) AS m FROM d1), "
    "dims AS (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS i), "
    "tok AS (SELECT doc_id, ts[i] AS token, (i - 1) // 20 AS block "
    "FROM d1, dims WHERE i <= len(ts)), "
    "cnt AS (SELECT doc_id, block, token, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM tok GROUP BY 1, 2, 3), "
    "norms AS (SELECT doc_id, block, SUM(c * c) AS norm FROM cnt GROUP BY 1, 2), "
    "nb AS (SELECT doc_id, MAX(block) + 1 AS n_blocks FROM norms GROUP BY 1), "
    "dots AS (SELECT a.doc_id, a.block, SUM(a.c * b.c) AS dot FROM cnt a "
    "JOIN cnt b ON b.doc_id = a.doc_id AND b.block = a.block + 1 "
    "AND b.token = a.token GROUP BY 1, 2), "
    "gaps AS (SELECT n1.doc_id, n1.block, COALESCE(d.dot, 0) AS dot, "
    "n1.norm AS na, n2.norm AS nbm FROM norms n1 "
    "JOIN norms n2 ON n2.doc_id = n1.doc_id AND n2.block = n1.block + 1 "
    "LEFT JOIN dots d ON d.doc_id = n1.doc_id AND d.block = n1.block), "
    "sc AS (SELECT doc_id, dot * dot * 1000000 // (na * nbm) AS cos2 FROM gaps), "
    "per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
    "CAST(MIN(cos2) AS BIGINT) AS min_c, "
    "CAST(SUM(CASE WHEN cos2 < 250000 THEN 1 ELSE 0 END) AS BIGINT) AS n_b "
    "FROM sc GROUP BY 1) "
    "SELECT nb.doc_id, CAST(nb.n_blocks AS BIGINT) AS n_blocks, "
    "CAST(COALESCE(per.n_gaps, 0) AS BIGINT) AS n_gaps, "
    "CAST(COALESCE(per.n_b, 0) AS BIGINT) AS n_boundaries, "
    "CAST(COALESCE(per.min_c, 1000000) AS BIGINT) AS min_cos2_ppm "
    "FROM nb LEFT JOIN per ON per.doc_id = nb.doc_id ORDER BY 1"
)


def _quality_neardup_auc_sql() -> str:
    """Replay of ``analytics.quality_neardup_auc``: MinHash pair CTEs
    (the default sub-linear ground truth, est >= 0.5) -> positive id
    set, quality CTEs -> per-doc score, (score, label) histogram,
    cumulative-negatives 2U fold, floor-div ppm with the single-class
    500000 pin."""
    return (
        f"WITH {_minhash_ctes(threshold=0.5)}, "
        "posids AS (SELECT doc_a AS i FROM mpairs UNION SELECT doc_b FROM mpairs), "
        f"{_quality_ctes()}, "
        f"lab AS (SELECT {_QPPM_EXPR} AS s, "
        "CASE WHEN r.doc_id IN (SELECT i FROM posids) THEN 1 ELSE 0 END AS pos "
        "FROM r), "
        "h AS (SELECT s, SUM(pos) AS np, SUM(1 - pos) AS nn FROM lab GROUP BY s), "
        "w AS (SELECT s, np, nn, COALESCE(SUM(nn) OVER (ORDER BY s "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt FROM h), "
        "t AS (SELECT SUM(np) AS tp, SUM(nn) AS tn, "
        "SUM(np * (2 * cumlt + nn)) AS u2 FROM w) "
        "SELECT CAST(tp AS BIGINT) AS n_pos, CAST(tn AS BIGINT) AS n_neg, "
        "CAST(CASE WHEN tp = 0 OR tn = 0 THEN 500000 "
        "ELSE u2 * 1000000 // (2 * tp * tn) END AS BIGINT) AS auc_ppm FROM t"
    )


def _nb_source_classifier_sql(train_mod: int = 10, train_lt: int = 8) -> str:
    """Replay of ``analytics.nb_source_classifier``: the md5-prefix
    train/test split, (source, token) train counts under the shared
    ``[a-z0-9]+`` lowered tokenizer, add-one-smoothed whole-bit token
    costs via ``length(bin((N_s + V) // (c + 1))) - 1``, whole-bit
    priors, argmin prediction with the (score, source) tie-break, and
    the (actual, predicted) confusion fold. Candidate labels are
    sources with >= 1 train token (ns), matching the engine."""
    split = _MD5U64.format(v="CAST(doc_id AS VARCHAR) || ':nbsplit'")
    return (
        "WITH tr AS (SELECT doc_id, source, lower(text) AS txt FROM documents "
        f"WHERE {split} % {train_mod} < {train_lt}), "
        "te AS (SELECT doc_id, source, lower(text) AS txt FROM documents "
        f"WHERE {split} % {train_mod} >= {train_lt}), "
        "trtok AS (SELECT source, unnest(regexp_extract_all(txt, '[a-z0-9]+')) "
        "AS token FROM tr), "
        "ct AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM trtok GROUP BY 1, 2), "
        "ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nt FROM trtok GROUP BY 1), "
        "vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM trtok), "
        "prior AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd FROM tr GROUP BY 1), "
        "ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tr), "
        "tetok AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM "
        "(SELECT doc_id, unnest(regexp_extract_all(txt, '[a-z0-9]+')) AS token "
        "FROM te) GROUP BY 1, 2), "
        "sc AS (SELECT t.doc_id, s.source, SUM(t.cnt * "
        "(length(bin((s.nt + (SELECT v FROM vocab)) // (COALESCE(c.c, 0) + 1))) - 1)) "
        "AS tokbits FROM tetok t CROSS JOIN ns s "
        "LEFT JOIN ct c ON c.source = s.source AND c.token = t.token GROUP BY 1, 2), "
        "fl AS (SELECT sc.doc_id, sc.source, sc.tokbits + "
        "(length(bin((SELECT n FROM ndt) // p.nd)) - 1) AS score "
        "FROM sc JOIN prior p ON p.source = sc.source), "
        "pred AS (SELECT doc_id, source AS predicted FROM fl "
        "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score, source) = 1) "
        "SELECT te.source AS actual, p.predicted AS predicted, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs "
        "FROM pred p JOIN te ON te.doc_id = p.doc_id GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _hybrid_sql(k: int = 10, rrf_k: int = 60) -> str:
    """Replay of ``analytics.hybrid_topk``: the BM25 oracle and the
    brute-force cosine ranking as CTEs, per-system 1-based ranks with the
    engine's tie-breaks, integer ``1_000_000 // (rrf_k + rank)`` points,
    union + grouped sum, per-query top-k on (rrf_score desc, doc_id asc)."""
    return (
        f"WITH sparse AS ({_bm25_sql()}), "
        "spts AS (SELECT query_id, doc_id, 1000000 // (" + str(rrf_k) + " + "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) "
        "AS BIGINT)) AS pts FROM sparse), "
        "dq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        "ORDER BY vec_id LIMIT 3), "
        "dense AS (SELECT dq.query_id AS query_id, e.vec_id AS doc_id, "
        "CAST(row_number() OVER (PARTITION BY dq.query_id "
        "ORDER BY list_cosine_similarity(dq.qe, e.embedding) DESC, e.vec_id) AS BIGINT) AS rnk "
        f"FROM dq CROSS JOIN embeddings e QUALIFY rnk <= {k}), "
        f"dpts AS (SELECT query_id, doc_id, 1000000 // ({rrf_k} + rnk) AS pts FROM dense), "
        "fused AS (SELECT query_id, doc_id, CAST(SUM(pts) AS BIGINT) AS rrf_score FROM "
        "(SELECT * FROM spts UNION ALL SELECT * FROM dpts) GROUP BY query_id, doc_id) "
        "SELECT query_id, doc_id, rrf_score FROM fused "
        f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) <= {k}"
    )


def _edges_ctes() -> str:
    """Shared CTE prefix replaying ``analytics.derived_link_edges`` (the
    md5-derived citation graph; deg fixed BEFORE the self-loop drop)."""
    deg_h = _MD5U64.format(v="CAST(doc_id AS VARCHAR) || ':deg'")
    lnk_h = _MD5U64.format(v="CAST(src AS VARCHAR) || ':link:' || CAST(j AS VARCHAR)")
    return (
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
        f"degs AS (SELECT doc_id AS src, CAST(1 + {deg_h} % 3 AS BIGINT) AS deg FROM documents), "
        "lnk AS (SELECT src, deg, unnest(range(deg)) AS j FROM degs), "
        f"edges AS (SELECT src, deg, dst FROM (SELECT src, deg, CAST({lnk_h} % nn.n AS BIGINT) "
        "AS dst FROM lnk, nn) WHERE dst <> src)"
    )


def _lpa_cte_parts(rounds: int = 4) -> list:
    """Shared CTE chain for the LPA replays (communities + modularity):
    distinct undirected edges from the citation-graph CTEs, then
    ``rounds`` synchronous voting rounds -- self-vote unioned with
    neighbor labels, modal vote with QUALIFY (n DESC, lab) = 1. Chained
    CTEs MATERIALIZED (same exponential-inlining hazard as
    _kcenter_sql)."""
    parts = [
        f"WITH {_edges_ctes()}, "
        "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges), "
        "sym AS MATERIALIZED (SELECT a AS node, b AS nbr FROM und "
        "UNION ALL SELECT b, a FROM und), "
        "l0 AS MATERIALIZED (SELECT doc_id AS node, "
        "CAST(doc_id AS BIGINT) AS lab FROM documents)"
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT s.node, l.lab FROM sym s "
            f"JOIN l{t - 1} l ON l.node = s.nbr "
            f"UNION ALL SELECT node, lab FROM l{t - 1})"
        )
        parts.append(
            f"l{t} AS MATERIALIZED (SELECT node, lab FROM "
            f"(SELECT node, lab, COUNT(*) AS n FROM v{t} GROUP BY 1, 2) "
            "QUALIFY row_number() OVER (PARTITION BY node "
            "ORDER BY n DESC, lab) = 1)"
        )
    return parts


def _lpa_sql(rounds: int = 4) -> str:
    """Replay of ``analytics.lpa_communities`` (chain: _lpa_cte_parts)."""
    return (
        ", ".join(_lpa_cte_parts(rounds))
        + f" SELECT node AS doc_id, lab AS community FROM l{rounds} "
        "ORDER BY doc_id"
    )


def _lpa_modularity_sql(rounds: int = 4) -> str:
    """Replay of ``analytics.lpa_modularity``: the shared LPA chain, both
    endpoint communities joined onto the distinct undirected edges, the
    per-community (degree mass, within-edges) fold, and
    Q = sum(4*m*e_c - d_c^2) / (4*m^2) in HUGEINT with the sign-split
    truncating ppm."""
    parts = _lpa_cte_parts(rounds)
    parts.append(
        f"la AS MATERIALIZED (SELECT fa.lab AS ca, fb.lab AS cb FROM und u "
        f"JOIN l{rounds} fa ON fa.node = u.a "
        f"JOIN l{rounds} fb ON fb.node = u.b)"
    )
    parts.append("mm AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM la)")
    parts.append(
        "pc AS MATERIALIZED (SELECT c, SUM(deg) AS d_c, SUM(w) AS e_c FROM "
        "(SELECT ca AS c, 1 AS deg, CASE WHEN ca = cb THEN 1 ELSE 0 END AS w "
        "FROM la UNION ALL SELECT cb, 1, 0 FROM la) GROUP BY 1)"
    )
    parts.append(
        "ag AS (SELECT SUM(4 * (SELECT m FROM mm) * CAST(e_c AS HUGEINT) - "
        "CAST(d_c AS HUGEINT) * d_c) AS num, COUNT(*) AS nc FROM pc)"
    )
    return (
        ", ".join(parts)
        + " SELECT CAST((SELECT m FROM mm) AS BIGINT) AS m_edges, "
        "CAST((SELECT nc FROM ag) AS BIGINT) AS n_communities, "
        "CAST(CASE WHEN (SELECT m FROM mm) = 0 THEN 0 "
        "WHEN (SELECT num FROM ag) >= 0 THEN ((SELECT num FROM ag) * 1000000) "
        "// (4 * (SELECT m FROM mm) * (SELECT m FROM mm)) "
        "ELSE -((-(SELECT num FROM ag) * 1000000) "
        "// (4 * (SELECT m FROM mm) * (SELECT m FROM mm))) END AS BIGINT) "
        "AS modularity_ppm"
    )


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Replay of ``analytics.kcore_nodes``: distinct undirected edges,
    then ``rounds`` unrolled peel iterations -- surviving-subgraph degree
    via a double semi-join, threshold >= k. Chained CTEs MATERIALIZED."""
    parts = [
        f"WITH {_edges_ctes()}, "
        "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges), "
        "sym AS MATERIALIZED (SELECT a AS node, b AS nbr FROM und "
        "UNION ALL SELECT b, a FROM und), "
        "s0 AS MATERIALIZED (SELECT doc_id AS node FROM documents)"
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT e.node, COUNT(*) AS dg FROM sym e "
            f"JOIN s{t - 1} x ON x.node = e.node "
            f"JOIN s{t - 1} y ON y.node = e.nbr GROUP BY 1)"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT node FROM d{t} WHERE dg >= {k})"
        )
    return (
        ", ".join(parts)
        + f" SELECT CAST(node AS BIGINT) AS doc_id FROM s{rounds} "
        "ORDER BY doc_id"
    )


def _hits_sql(rounds: int = 3, topn: int = 20, scale: int = 1_000_000) -> str:
    """Replay of ``analytics.hits_scores``: the shared edge CTEs, then
    ``rounds`` unrolled half-step pairs -- authority = grouped HUGEINT sum
    of hub over in-edges then ``(s * scale) // MAX(s)``, hub likewise over
    out-edges -- and the (auth DESC, id) top-n with hub attached by LEFT
    JOIN (absent hub = 0). All chained CTEs MATERIALIZED."""
    parts = [
        f"WITH {_edges_ctes()}, "
        "e AS MATERIALIZED (SELECT src, dst FROM edges), "
        "h0 AS MATERIALIZED (SELECT doc_id AS node, "
        f"CAST({scale} AS BIGINT) AS v FROM documents)"
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"ar{t} AS MATERIALIZED (SELECT e.dst AS node, SUM(h.v) AS s "
            f"FROM e JOIN h{t - 1} h ON h.node = e.src GROUP BY 1)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT node, (s * {scale}) // "
            f"(SELECT MAX(s) FROM ar{t}) AS v FROM ar{t})"
        )
        parts.append(
            f"hr{t} AS MATERIALIZED (SELECT e.src AS node, SUM(a.v) AS s "
            f"FROM e JOIN a{t} a ON a.node = e.dst GROUP BY 1)"
        )
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT node, (s * {scale}) // "
            f"(SELECT MAX(s) FROM hr{t}) AS v FROM hr{t})"
        )
    return (
        ", ".join(parts)
        + f" SELECT CAST(t.node AS BIGINT) AS doc_id, "
        "CAST(t.v AS BIGINT) AS auth_scaled, "
        "CAST(COALESCE(hh.v, 0) AS BIGINT) AS hub_scaled "
        f"FROM (SELECT node, v FROM a{rounds} ORDER BY v DESC, node "
        f"LIMIT {topn}) t LEFT JOIN h{rounds} hh ON hh.node = t.node "
        "ORDER BY t.v DESC, t.node"
    )


def _triangle_sql() -> str:
    """Replay of ``analytics.triangle_count``: canonical a<b distinct edges,
    wedge at the smallest vertex, closing-edge probe."""
    return (
        f"WITH {_edges_ctes()}, "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM und e1 "
        "JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b "
        "JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b"
    )


def _pagerank_sql(iters: int = 4, damping_pct: int = 85, topn: int = 20) -> str:
    """Unrolled-CTE replay of ``analytics.pagerank_top``: md5-derived edges
    (deg fixed BEFORE self-loop drop), integer rank recurrence
    ``r' = BASE + (damping * SUM(r//deg)) // 100``. Every quantity is a
    non-negative integer, so DuckDB's truncating ``//`` == Python floor
    division throughout."""
    parts = [
        f"WITH {_edges_ctes()}, ",
        "consts AS (SELECT n, 1000000000000 // n AS r0, "
        f"((100 - {damping_pct}) * (1000000000000 // n)) // 100 AS base FROM nn), ",
        "r0 AS (SELECT doc_id AS node, (SELECT r0 FROM consts) AS rank FROM documents), ",
    ]
    for t in range(iters):
        parts.append(
            f"r{t + 1} AS (SELECT d.doc_id AS node, CAST((SELECT base FROM consts) + "
            f"({damping_pct} * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS rank "
            "FROM documents d LEFT JOIN ("
            "SELECT e.dst AS node, SUM(r.rank // e.deg) AS inc "
            f"FROM edges e JOIN r{t} r ON r.node = e.src GROUP BY e.dst"
            ") i ON i.node = d.doc_id), "
        )
    body = "".join(parts).rstrip().rstrip(",")
    return (
        f"{body} SELECT node AS doc_id, rank AS rank_scaled FROM r{iters} "
        f"ORDER BY rank DESC, node LIMIT {topn}"
    )


def _ppr_sql(iters: int = 4, damping_pct: int = 85, topn: int = 20,
             topic_lang: str = "en") -> str:
    """Replay of ``analytics.ppr_top``: the pagerank recurrence with the
    teleport concentrated on the topic slice -- r0 and the per-node base
    are CASE-gated on lang, mass S // nT; all quantities non-negative
    ints so ``//`` parity holds throughout."""
    s = 1_000_000_000_000
    parts = [
        f"WITH {_edges_ctes()}, ",
        f"tt AS (SELECT COUNT(*) AS nt FROM documents WHERE lang = '{topic_lang}'), ",
        f"cc AS (SELECT nt, {s} // nt AS r0, "
        f"((100 - {damping_pct}) * ({s} // nt)) // 100 AS bt FROM tt), ",
        f"bt AS (SELECT doc_id AS node, CASE WHEN lang = '{topic_lang}' "
        "THEN (SELECT bt FROM cc) ELSE 0 END AS base FROM documents), ",
        f"r0 AS (SELECT doc_id AS node, CAST(CASE WHEN lang = '{topic_lang}' "
        "THEN (SELECT r0 FROM cc) ELSE 0 END AS BIGINT) AS rank "
        "FROM documents), ",
    ]
    for t in range(iters):
        parts.append(
            f"r{t + 1} AS (SELECT b.node, CAST(b.base + "
            f"({damping_pct} * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS rank "
            "FROM bt b LEFT JOIN ("
            "SELECT e.dst AS node, SUM(r.rank // e.deg) AS inc "
            f"FROM edges e JOIN r{t} r ON r.node = e.src GROUP BY e.dst"
            ") i ON i.node = b.node), "
        )
    body = "".join(parts).rstrip().rstrip(",")
    return (
        f"{body} SELECT node AS doc_id, rank AS rank_scaled FROM r{iters} "
        f"ORDER BY rank DESC, node LIMIT {topn}"
    )


def _kmeans_assign_ctes(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """Unrolled-CTE replay of the shared Lloyd fit (``analytics._kmeans_fit``
    + final assignment): long-form integer-quantized vectors, md5-key
    seeding, then per iteration the (exact-int distance -> argmin assign
    with (d, cid) tie-break -> floor-rounded integer mean with
    empty-cluster carry) CTE triple, ending at the per-vector ``aF``
    assignment CTE. Integer and identically-rounded float64 ops only --
    bit-exact vs the numpy engine (quantization parity verified on the
    testdata). Consumed by _kmeans_sql and _semdedup_sql."""
    hkey = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,16))::UBIGINT"
    parts = [
        "WITH vlong AS (SELECT vec_id, "
        "unnest(range(len(embedding))) AS dim, "
        f"CAST(floor(CAST(unnest(embedding) AS DOUBLE)*{scale} + 0.5) AS BIGINT) AS val "
        "FROM embeddings), ",
        "seeds AS (SELECT vec_id, "
        f"CAST(row_number() OVER (ORDER BY {hkey}, vec_id) - 1 AS BIGINT) AS cid "
        f"FROM embeddings QUALIFY row_number() OVER (ORDER BY {hkey}, vec_id) <= {k}), ",
        "c0 AS (SELECT s.cid, v.dim, v.val FROM seeds s JOIN vlong v USING (vec_id)), ",
    ]
    for t in range(iters):
        parts += [
            f"d{t} AS (SELECT v.vec_id, c.cid, SUM((v.val - c.val)*(v.val - c.val)) AS d "
            f"FROM vlong v JOIN c{t} c USING (dim) GROUP BY v.vec_id, c.cid), ",
            f"a{t} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
            f"row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d{t}) "
            "WHERE rn = 1), ",
            f"n{t} AS (SELECT a.cid, v.dim, "
            "CAST(floor(CAST(SUM(v.val) AS DOUBLE)/COUNT(*) + 0.5) AS BIGINT) AS val "
            f"FROM a{t} a JOIN vlong v USING (vec_id) GROUP BY a.cid, v.dim), ",
            f"c{t + 1} AS (SELECT c.cid, c.dim, COALESCE(n.val, c.val) AS val "
            f"FROM c{t} c LEFT JOIN n{t} n ON n.cid = c.cid AND n.dim = c.dim), ",
        ]
    parts += [
        f"dF AS (SELECT v.vec_id, c.cid, SUM((v.val - c.val)*(v.val - c.val)) AS d "
        f"FROM vlong v JOIN c{iters} c USING (dim) GROUP BY v.vec_id, c.cid), ",
        "aF AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM dF) "
        "WHERE rn = 1) ",
    ]
    return "".join(parts)


def _cluster_balanced_sample_sql(k: int = 8, iters: int = 3,
                                per_cluster: int = 8,
                                scale: int = 1000) -> str:
    """Replay of ``analytics.cluster_balanced_sample``: the shared Lloyd
    assignment CTEs ending at aF, then a per-cluster QUALIFY over the
    sampling family's md5-prefix roll with (roll, vec_id) ties."""
    roll = "('0x' || substr(md5('cbs:' || CAST(vec_id AS VARCHAR)), 1, 16))::UBIGINT"
    return _kmeans_assign_ctes(k=k, iters=iters, scale=scale) + (
        "SELECT cid AS cluster_id, vec_id FROM aF "
        f"QUALIFY row_number() OVER (PARTITION BY cid ORDER BY {roll}, vec_id) "
        f"<= {per_cluster} ORDER BY cluster_id, vec_id"
    )


def _kmeans_sql(k: int = 8, iters: int = 3, scale: int = 1000) -> str:
    """Cluster fingerprint on top of the shared assignment CTEs."""
    return _kmeans_assign_ctes(k=k, iters=iters, scale=scale) + (
        "SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        "CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id FROM aF GROUP BY cid ORDER BY cluster_id"
    )


def _semdedup_sql(k: int = 8, iters: int = 3, scale: int = 1000,
                  threshold: float = 0.4) -> str:
    """Replay of analytics.semdedup_keepers: the shared kmeans assignment
    CTEs, then the dominance rule — a vector survives iff NO smaller-id
    vector in its cluster has cosine >= threshold. The engine computes
    cosine on float64 copies of the float32 lists; DuckDB's
    list_cosine_similarity agrees far inside the 1.3e-4 pair-to-threshold
    margin measured on the testdata."""
    return _kmeans_assign_ctes(k=k, iters=iters, scale=scale) + (
        "SELECT a.vec_id, a.cid AS cluster_id FROM aF a "
        "WHERE NOT EXISTS (SELECT 1 FROM aF b "
        "JOIN embeddings ea ON ea.vec_id = a.vec_id "
        "JOIN embeddings eb ON eb.vec_id = b.vec_id "
        "WHERE b.cid = a.cid AND b.vec_id < a.vec_id "
        f"AND list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}) "
        "ORDER BY vec_id"
    )


_BPE_MERGE_SQL = (
    # replay of analytics.bpe_merge_candidates: [a-z0-9]+ tokens of the
    # lowered text -> word frequencies -> adjacent char pairs via
    # unnest(range) -> weighted sum -> top-50 (n DESC, pair ASC)
    "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w "
    "FROM documents), "
    "wf AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY w), "
    "ex AS (SELECT w, f, unnest(range(1, length(w))) AS g FROM wf), "
    "pc AS (SELECT substr(w, CAST(g AS INT), 2) AS pair, SUM(f) AS n "
    "FROM ex GROUP BY 1) "
    "SELECT pair, CAST(n AS BIGINT) AS n FROM pc ORDER BY n DESC, pair LIMIT 50"
)


def _leading_ones16(u: str) -> str:
    """SQL for the leading-ones count of a 16-bit integer expression: a
    sum of 16 monotone threshold indicators (>= j leading ones iff
    u >= 2^16 - 2^(16-j)) -- mirrors analytics._md5_leading_ones16."""
    terms = " + ".join(
        f"(CASE WHEN {u} >= {65536 - (1 << (16 - j))} THEN 1 ELSE 0 END)"
        for j in range(1, 17)
    )
    return f"({terms})"


def _dp_geometric_sql() -> str:
    u1 = "CAST(('0x' || substr(md5('dp1:' || lang), 1, 4)) AS INTEGER)"
    u2 = "CAST(('0x' || substr(md5('dp1:' || lang), 5, 4)) AS INTEGER)"
    return (
        # replay of analytics.dp_geometric_counts: noise = G1 - G2, each a
        # geometric(1/2) draw as the leading-ones count of 16 md5 bits
        "WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY lang), "
        f"h AS (SELECT lang, n, {u1} AS u1, {u2} AS u2 FROM c) "
        f"SELECT lang, n, CAST({_leading_ones16('u1')} - {_leading_ones16('u2')} "
        "AS BIGINT) AS noise, "
        f"CAST(n + {_leading_ones16('u1')} - {_leading_ones16('u2')} AS BIGINT) "
        "AS dp_count FROM h ORDER BY lang"
    )


_DOW_ADJUSTED_SPIKES_SQL = (
    # replay of analytics.dow_adjusted_spikes: day cents -> dow floor-mean
    # (all-positive: // truncation == floor) -> residuals -> lower-median
    # MAD (quantile_disc 0.5) -> |resid| > 3*MAD, day ASC. pyarrow
    # day_of_week is Monday=0 -> isodow - 1.
    "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, "
    "CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev "
    "FROM orders GROUP BY 1), "
    "p AS (SELECT isodow(day) - 1 AS dow, SUM(rev) // COUNT(*) AS dm "
    "FROM d GROUP BY 1), "
    "r AS (SELECT d.day, p.dow, d.rev, d.rev - p.dm AS resid "
    "FROM d JOIN p ON isodow(d.day) - 1 = p.dow), "
    "m AS (SELECT quantile_disc(abs(resid), 0.5) AS mad FROM r) "
    "SELECT strftime(r.day, '%Y-%m-%d') AS day, CAST(r.dow AS BIGINT) AS dow, "
    "r.rev AS revenue_cents, CAST(r.resid AS BIGINT) AS resid_cents "
    "FROM r, m WHERE abs(r.resid) > 3 * m.mad ORDER BY r.day"
)


# shared CTE body for the boundary-overlap pair family (k=2, cap=40):
# [a-z0-9]+ token windows, cap CTE drops boilerplate boundaries (> cap
# docs on either side), join tail(a) = head(b), a <> b
_BOUNDARY_CTES = (
    "bt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr "
    "FROM documents), "
    "bw AS (SELECT doc_id, array_to_string(list_slice(arr, 1, 2), ' ') AS head, "
    "array_to_string(list_slice(arr, len(arr)-1, len(arr)), ' ') AS tail "
    "FROM bt WHERE len(arr) >= 2), "
    "bbad AS (SELECT head AS s FROM bw GROUP BY 1 HAVING COUNT(*) > 40 "
    "UNION SELECT tail AS s FROM bw GROUP BY 1 HAVING COUNT(*) > 40), "
    "bpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bw a JOIN bw b ON a.tail = b.head AND a.doc_id <> b.doc_id "
    "WHERE a.tail NOT IN (SELECT s FROM bbad))"
)

_BOUNDARY_OVERLAP_SQL = (
    # replay of analytics.boundary_overlap_pairs over the shared CTE body
    f"WITH {_BOUNDARY_CTES} SELECT doc_a, doc_b FROM bpairs"
)

_BOUNDARY_CHAINS_SQL = (
    # replay of analytics.boundary_stitch_chains: symmetric closure over
    # the boundary edges (recursive reach, the ngram-CC construction),
    # min-id components, chain-size histogram
    f"WITH RECURSIVE {_BOUNDARY_CTES}, "
    "bedges AS (SELECT doc_a AS a, doc_b AS b FROM bpairs "
    "UNION SELECT doc_b, doc_a FROM bpairs), "
    "breach AS (SELECT a, b FROM bedges "
    "UNION SELECT r.a, e.b FROM breach r JOIN bedges e ON r.b = e.a), "
    "bcl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
    "FROM breach GROUP BY a), "
    "bsz AS (SELECT cluster_id, COUNT(*) AS n FROM bcl GROUP BY 1) "
    "SELECT CAST(n AS BIGINT) AS chain_size, CAST(COUNT(*) AS BIGINT) AS n_chains "
    "FROM bsz GROUP BY n ORDER BY chain_size"
)


_ATTRIBUTION_LAST_TOUCH_SQL = (
    # replay of relational.attribution_last_touch: LAG over (user, ts, id)
    # names the prior touch; purchases fold value-cents per channel
    "WITH s AS (SELECT event_type, "
    "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
    "FROM events) "
    "SELECT COALESCE(prev, '(none)') AS channel, "
    "CAST(COUNT(*) AS BIGINT) AS n_conversions, "
    "CAST(SUM(c) AS BIGINT) AS value_cents "
    "FROM s WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
)


_L_DIVERSITY_SQL = (
    # replay of analytics.l_diversity_audit: (event_type, day) cells,
    # COUNT DISTINCT users, at_risk flag below l=5
    "WITH c AS (SELECT event_type, "
    "strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM events GROUP BY 1, 2) "
    "SELECT event_type, day, n_events, n_users, "
    "CAST(CASE WHEN n_users < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk "
    "FROM c ORDER BY event_type, day"
)


_PADDING_WASTE_SQL = (
    # replay of analytics.padding_waste_by_bucket: RE2 \\S token count,
    # power-of-two CASE ladder (16..8192, long docs clamp into the top),
    # GREATEST-0 bucket waste, truncating ppm over all-positive ints
    "WITH n AS (SELECT len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')) AS nt "
    "FROM documents), "
    "b AS (SELECT CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128 WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512 WHEN nt <= 1024 THEN 1024 WHEN nt <= 2048 THEN 2048 WHEN nt <= 4096 THEN 4096 ELSE 8192 END AS bucket, nt FROM n), "
    "g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM b GROUP BY 1) "
    "SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, sum_tokens, "
    "CAST(GREATEST(bucket*n_docs - sum_tokens, 0) AS BIGINT) AS waste_tokens, "
    "CAST(GREATEST(bucket*n_docs - sum_tokens, 0) * 1000000 "
    "// GREATEST(bucket*n_docs, 1) AS BIGINT) AS waste_ppm "
    "FROM g ORDER BY bucket"
)


_ORDER_RECON_SQL = (
    # replay of analytics.order_total_reconciliation: detail sums via the
    # proven left-assoc float chain, LEFT JOIN (detail-less orders diff
    # against 0), per-status exact/abs-diff fold
    "WITH ls AS (SELECT l_orderkey, "
    "SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS BIGINT)) AS lc "
    "FROM lineitem GROUP BY 1), "
    "o AS (SELECT o_orderkey, o_orderstatus, "
    "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS oc FROM orders), "
    "d AS (SELECT o.o_orderstatus, o.oc - COALESCE(ls.lc, 0) AS diff "
    "FROM o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey) "
    "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(COUNT(*) FILTER (diff = 0) AS BIGINT) AS n_exact, "
    "CAST(SUM(ABS(diff)) AS BIGINT) AS sum_abs_diff_cents, "
    "CAST(MAX(ABS(diff)) AS BIGINT) AS max_abs_diff_cents "
    "FROM d GROUP BY 1 ORDER BY 1"
)


_CHAO1_SQL = (
    # replay of analytics.chao1_vocab_estimate: word-frequency CTE ->
    # singleton/doubleton folds, bias-corrected Chao1 and Good-Turing
    # coverage in pure BIGINT floor arithmetic
    "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w "
    "FROM documents), "
    "wf AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY w) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS v_obs, "
    "CAST(COUNT(*) FILTER (f = 1) AS BIGINT) AS f1, "
    "CAST(COUNT(*) FILTER (f = 2) AS BIGINT) AS f2, "
    "CAST(COUNT(*) + (COUNT(*) FILTER (f = 1)) * (COUNT(*) FILTER (f = 1) - 1) "
    "// (2 * (COUNT(*) FILTER (f = 2) + 1)) AS BIGINT) AS v_chao1, "
    "CAST((COALESCE(SUM(f), 0) - COUNT(*) FILTER (f = 1)) * 1000000 "
    "// GREATEST(COALESCE(SUM(f), 0), 1) AS BIGINT) AS coverage_ppm "
    "FROM wf"
)


_VOCAB_PRUNING_SQL = (
    # replay of analytics.vocab_pruning_plan: word-frequency CTE x the
    # threshold list, FILTER folds, truncating ppm on all-positive ints
    "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w "
    "FROM documents), "
    "wf AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY w), "
    "tot AS (SELECT CAST(SUM(f) AS BIGINT) AS t_occ, "
    "CAST(COUNT(*) AS BIGINT) AS t_types FROM wf), "
    "th AS (SELECT unnest([1, 2, 5, 10, 100]) AS min_count) "
    "SELECT CAST(th.min_count AS BIGINT) AS min_count, "
    "CAST(COUNT(*) FILTER (wf.f >= th.min_count) AS BIGINT) AS kept_types, "
    "CAST(tot.t_types - COUNT(*) FILTER (wf.f >= th.min_count) AS BIGINT) AS oov_types, "
    "CAST(COALESCE(SUM(wf.f) FILTER (wf.f >= th.min_count), 0) AS BIGINT) "
    "AS kept_occurrences, "
    "CAST((tot.t_occ - COALESCE(SUM(wf.f) FILTER (wf.f >= th.min_count), 0)) "
    "* 1000000 // GREATEST(tot.t_occ, 1) AS BIGINT) AS oov_ppm "
    "FROM th CROSS JOIN wf CROSS JOIN tot "
    "GROUP BY th.min_count, tot.t_occ, tot.t_types ORDER BY min_count"
)


def _dedup_family_agreement_sql() -> str:
    """Replay of ``analytics.dedup_family_agreement``: the minhash body,
    simhash and winnow pair replays nested whole (the default family set
    is the three sub-linear generators -- exact ngram is an opt-in audit
    since VERDICT r4 #1), then three UNION ALL rows of set arithmetic
    with the empty-union 1e6 pin."""
    combos = [("minhash", "fm"), ("simhash", "fs"), ("winnow", "fw")]
    rows = []
    for i, (na, ta) in enumerate(combos):
        for nb, tb in combos[i + 1:]:
            rows.append(
                f"SELECT '{na}' AS family_a, '{nb}' AS family_b, "
                f"(SELECT COUNT(*) FROM {ta}) AS n_a, "
                f"(SELECT COUNT(*) FROM {tb}) AS n_b, "
                f"(SELECT COUNT(*) FROM {ta} JOIN {tb} USING (doc_a, doc_b)) "
                "AS n_common, 0 AS jaccard_ppm"
            )
    body = " UNION ALL ".join(rows)
    return (
        f"WITH {_minhash_ctes()}, "
        f"sp AS ({_simhash_pairs_sql()}), "
        f"wp AS ({_winnow_sql()}), "
        "fm AS (SELECT doc_a, doc_b FROM mpairs), "
        "fs AS (SELECT doc_a, doc_b FROM sp), "
        "fw AS (SELECT doc_a, doc_b FROM wp), "
        f"fam6 AS ({body}) "
        "SELECT family_a, family_b, CAST(n_a AS BIGINT) AS n_a, "
        "CAST(n_b AS BIGINT) AS n_b, CAST(n_common AS BIGINT) AS n_common, "
        "CAST(CASE WHEN n_a + n_b - n_common = 0 THEN 1000000 "
        "ELSE n_common * 1000000 // (n_a + n_b - n_common) END AS BIGINT) "
        "AS jaccard_ppm FROM fam6 ORDER BY family_a, family_b"
    )


_UNIGRAM_POWER_SQL = (
    # replay of analytics.unigram_power_sample_plan: shared tokenizer,
    # grouped counts, w = FLOOR(SQRT(n * FLOOR(SQRT(n)))) (ieee-correctly-
    # rounded on both sides), whole-vocab share ppm, top-30 ranked cut
    "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
    "AS token FROM documents), "
    "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
    "w AS (SELECT token, n, CAST(FLOOR(SQRT(n * FLOOR(SQRT(CAST(n AS DOUBLE))))) "
    "AS BIGINT) AS weight FROM c), "
    "t AS (SELECT SUM(weight) AS sw FROM w) "
    "SELECT token, n, weight, "
    "CAST(weight * 1000000 // (SELECT sw FROM t) AS BIGINT) AS target_share_ppm "
    "FROM w QUALIFY row_number() OVER (ORDER BY weight DESC, token) <= 30 "
    "ORDER BY weight DESC, token"
)


def _ams_f2_sql(k_est: int = 17) -> str:
    """Replay of ``analytics.ams_f2_audit``: shared tokenizer, grouped
    counts, md5-parity signs per (estimator, token), per-estimator sums,
    ordered squares with the single-row median pick (odd k), exact F2
    and floor-div err ppm."""
    h = _MD5U64.format(v="'ams:' || CAST(j AS VARCHAR) || ':' || token")
    return (
        "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS token FROM documents), "
        "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
        "ex AS (SELECT CAST(SUM(n * n) AS BIGINT) AS f2 FROM c), "
        f"seeds AS (SELECT unnest(generate_series(0, {k_est - 1})) AS j), "
        f"sj AS (SELECT s.j, SUM(CASE WHEN {h} % 2 = 1 THEN c.n ELSE -c.n END) "
        "AS sv FROM c CROSS JOIN seeds s GROUP BY s.j), "
        "sq AS (SELECT sv * sv AS s2 FROM sj), "
        "med AS (SELECT s2 FROM sq QUALIFY row_number() OVER (ORDER BY s2) "
        f"= {k_est // 2 + 1}) "
        "SELECT CAST(ex.f2 AS BIGINT) AS f2_exact, "
        "CAST(med.s2 AS BIGINT) AS f2_est, "
        "CAST(CASE WHEN ex.f2 = 0 THEN 0 ELSE "
        "CAST(abs(med.s2 - ex.f2) AS HUGEINT) * 1000000 // ex.f2 END "
        "AS BIGINT) AS err_ppm FROM ex, med"
    )


def _winnow_clusters_sql() -> str:
    """Connected components over the SQL-replayed winnow pair graph --
    the shared recursive-closure pattern, pair replay nested as a CTE."""
    return (
        f"WITH RECURSIVE wp AS ({_winnow_sql()}), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM wp "
        "UNION SELECT doc_b, doc_a FROM wp), "
        "reach AS (SELECT a, b FROM edges "
        "UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), "
        "cl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY a) "
        "SELECT doc_id, cluster_id FROM cl"
    )


def _winnow_sql(k: int = 20, w: int = 8, cap: int = 40, min_shared: int = 5) -> str:
    from distributed_system___ocr_ray.pipelines.analytics import _CDC_B, _CDC_M

    terms = " + ".join(
        f"CAST(ascii(substr(s, CAST(pos + {j} AS INT), 1)) AS BIGINT) "
        f"* {pow(_CDC_B, k - 1 - j, _CDC_M)}"
        for j in range(k)
    )
    return (
        # replay of analytics.winnow_fingerprint_pairs: k-grams of the
        # lowered text hashed by the cdc polynomial (generated term list,
        # int64-safe), packed (31-bit hash, reversed clamped pos) winnowing
        # keys, trailing-w window MIN (prefix windows included), distinct
        # fingerprints, hot-print cap, pair counts
        "WITH t AS (SELECT doc_id, lower(text) AS s FROM documents), "
        f"g0 AS (SELECT doc_id, unnest(range(1, greatest(length(s) - {k - 2}, 1))) "
        "AS pos, s FROM t), "
        "g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"({terms}) % {_CDC_M} AS hv FROM g0), "
        "kk AS (SELECT doc_id, pos, CAST(hv AS BIGINT) * 1048576 "
        "+ (1048575 - LEAST(pos - 1, 1048575)) AS key FROM g), "
        "sel AS (SELECT DISTINCT doc_id, MIN(key) OVER "
        f"(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN {w - 1} PRECEDING "
        "AND CURRENT ROW) AS sk FROM kk), "
        "f AS (SELECT DISTINCT doc_id, sk // 1048576 AS hh FROM sel), "
        f"hot AS (SELECT hh FROM f GROUP BY hh HAVING COUNT(*) > {cap}), "
        "fp AS (SELECT * FROM f WHERE hh NOT IN (SELECT hh FROM hot)), "
        "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM fp a JOIN fp b ON a.hh = b.hh AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        f"SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= {min_shared}"
    )


_CDC_CHUNK_SQL = (
    # replay of analytics.cdc_chunk_dedup: 16-term polynomial rolling
    # hash mod 2^31-1 over codepoints (int64-safe, generated term list),
    # boundaries where hv % 64 == 0 at window ends plus end-of-doc,
    # LAG reconstructs chunks, DISTINCT on chunk strings (engine: md5-u64)
    "WITH t AS (SELECT doc_id, text AS s FROM documents), "
    "p AS (SELECT doc_id, s, unnest(range(1, greatest(length(s) - 14, 1))) "
    "AS pos FROM t), "
    "h AS (SELECT doc_id, s, CAST(pos AS BIGINT) AS pos, "
    "(CAST(ascii(substr(s, CAST(pos + 0 AS INT), 1)) AS BIGINT) * 1079017218 + CAST(ascii(substr(s, CAST(pos + 1 AS INT), 1)) AS BIGINT) * 330081243 + CAST(ascii(substr(s, CAST(pos + 2 AS INT), 1)) AS BIGINT) * 1346595130 + CAST(ascii(substr(s, CAST(pos + 3 AS INT), 1)) AS BIGINT) * 1150007217 + CAST(ascii(substr(s, CAST(pos + 4 AS INT), 1)) AS BIGINT) * 1090750511 + CAST(ascii(substr(s, CAST(pos + 5 AS INT), 1)) AS BIGINT) * 1775709275 + CAST(ascii(substr(s, CAST(pos + 6 AS INT), 1)) AS BIGINT) * 483199522 + CAST(ascii(substr(s, CAST(pos + 7 AS INT), 1)) AS BIGINT) * 1213495441 + CAST(ascii(substr(s, CAST(pos + 8 AS INT), 1)) AS BIGINT) * 623063367 + CAST(ascii(substr(s, CAST(pos + 9 AS INT), 1)) AS BIGINT) * 336663071 + CAST(ascii(substr(s, CAST(pos + 10 AS INT), 1)) AS BIGINT) * 168429323 + CAST(ascii(substr(s, CAST(pos + 11 AS INT), 1)) AS BIGINT) * 67503107 + CAST(ascii(substr(s, CAST(pos + 12 AS INT), 1)) AS BIGINT) * 16974593 + CAST(ascii(substr(s, CAST(pos + 13 AS INT), 1)) AS BIGINT) * 66049 + CAST(ascii(substr(s, CAST(pos + 14 AS INT), 1)) AS BIGINT) * 257 + CAST(ascii(substr(s, CAST(pos + 15 AS INT), 1)) AS BIGINT) * 1) % 2147483647 AS hv FROM p), "
    "b AS (SELECT doc_id, s, pos + 15 AS cut FROM h WHERE hv % 64 = 0 "
    "UNION SELECT doc_id, s, length(s) AS cut FROM t WHERE length(s) > 0), "
    "c AS (SELECT doc_id, cut, COALESCE(LAG(cut) OVER "
    "(PARTITION BY doc_id ORDER BY cut), 0) AS prev "
    "FROM (SELECT DISTINCT doc_id, cut FROM b)), "
    "ch AS (SELECT t.doc_id, substr(t.s, CAST(c.prev + 1 AS INT), "
    "CAST(c.cut - c.prev AS INT)) AS chunk "
    "FROM c JOIN t ON t.doc_id = c.doc_id WHERE c.cut > c.prev), "
    "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks, "
    "CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct_chunks, "
    "CAST(SUM(length(chunk)) AS BIGINT) AS total_chars FROM ch), "
    "st AS (SELECT CAST(SUM(length(chunk)) AS BIGINT) AS stored_chars "
    "FROM (SELECT DISTINCT chunk FROM ch)) "
    "SELECT agg.n_chunks, agg.n_distinct_chunks, agg.total_chars, st.stored_chars, "
    "CAST((agg.total_chars - st.stored_chars) * 1000000 "
    "// GREATEST(agg.total_chars, 1) AS BIGINT) AS saving_ppm FROM agg, st"
)


def _gdpr_sql(mod: int = 50) -> str:
    def one(tbl: str, col: str) -> str:
        h = _MD5U64.format(v=f"'gdpr:' || CAST({col} AS VARCHAR)")
        return (
            f"SELECT '{tbl}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows_to_erase, "
            f"CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_users_to_erase "
            f"FROM {tbl} WHERE {h} % {mod} = 0"
        )

    # replay of analytics.gdpr_erasure_plan: the same md5 cohort
    # predicate per table, rows + distinct subjects
    return (
        one("customer", "c_custkey")
        + " UNION ALL " + one("orders", "o_custkey")
        + " UNION ALL " + one("events", "user_id")
        + " ORDER BY tbl"
    )


def _max_coverage_sql(k: int = 5) -> str:
    # replay of analytics.max_coverage_select: distinct (doc, bigram)
    # table, k unrolled greedy rounds -- each picks argmax uncovered
    # count (g DESC, doc_id LIMIT 1) and folds its bigrams into c{r}
    parts = [
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents), "
        "ex AS (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i FROM toks), "
        "dt AS (SELECT DISTINCT doc_id, arr[CAST(i AS INT)] || ' ' || "
        "arr[CAST(i AS INT) + 1] AS w FROM ex)"
    ]
    for r in range(1, k + 1):
        if r == 1:
            parts.append("w1 AS (SELECT doc_id, COUNT(*) AS g FROM dt GROUP BY doc_id)")
        else:
            parts.append(
                f"w{r} AS (SELECT doc_id, COUNT(*) AS g FROM dt "
                f"WHERE w NOT IN (SELECT w FROM c{r - 1}) GROUP BY doc_id)"
            )
        parts.append(f"p{r} AS (SELECT doc_id, g FROM w{r} ORDER BY g DESC, doc_id LIMIT 1)")
        if r == 1:
            parts.append(
                "c1 AS (SELECT DISTINCT w FROM dt "
                "WHERE doc_id IN (SELECT doc_id FROM p1))"
            )
        else:
            parts.append(
                f"c{r} AS (SELECT w FROM c{r - 1} UNION SELECT w FROM dt "
                f"WHERE doc_id IN (SELECT doc_id FROM p{r}))"
            )
    rounds = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, doc_id, CAST(g AS BIGINT) AS gain, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM c{r}) AS covered_total FROM p{r}"
        for r in range(1, k + 1)
    )
    return ", ".join(parts) + " " + rounds + " ORDER BY round"


def _blocklist_sql() -> str:
    from distributed_system___ocr_ray.pipelines.analytics import SCREEN_CATEGORIES

    # replay of analytics.blocklist_screen: per category, whole-token
    # hits via tokenize + list_contains (the stopword-kernel parity
    # construction), zero cells preserved by grouping over ALL docs
    parts = []
    for cat, words in SCREEN_CATEGORIES.items():
        lst = ", ".join(f"'{w}'" for w in sorted(words))
        hits = (
            "len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
            f"x -> list_contains([{lst}], x)))"
        )
        parts.append(
            f"SELECT '{cat}' AS category, lang, "
            "CAST(COUNT(*) FILTER (h > 0) AS BIGINT) AS n_docs, "
            "CAST(SUM(h) AS BIGINT) AS n_hits "
            f"FROM (SELECT lang, {hits} AS h FROM documents) GROUP BY lang"
        )
    return " UNION ALL ".join(parts) + " ORDER BY category, lang"


def _pseudonym_sql(space_bits: int = 16) -> str:
    h = _MD5U64.format(v="'pseud:' || CAST(user_id AS VARCHAR)")
    mod = 1 << space_bits
    return (
        # replay of analytics.pseudonym_collision_audit over events
        f"WITH s AS (SELECT DISTINCT user_id, CAST({h} % {mod} AS BIGINT) AS p "
        "FROM events), "
        "a AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(COUNT(DISTINCT p) AS BIGINT) AS n_pseudonyms FROM s) "
        "SELECT n_users, n_pseudonyms, n_users - n_pseudonyms AS n_collisions, "
        "CAST((n_users - n_pseudonyms) * 1000000 // GREATEST(n_users, 1) AS BIGINT) "
        "AS collision_ppm FROM a"
    )


def _code_switch_sql(min_hits: int = 2) -> str:
    from distributed_system___ocr_ray.functions.textstats import LANG_ORDER, STOPWORDS

    # replay of analytics.code_switch_rate_by_source over the proven
    # per-language stopword membership construction
    flags = " + ".join(
        f"(CASE WHEN {_sql_stop_hits(STOPWORDS[lang])} >= {min_hits} "
        "THEN 1 ELSE 0 END)"
        for lang in LANG_ORDER
    )
    return (
        f"WITH d AS (SELECT source, CASE WHEN ({flags}) >= 2 THEN 1 ELSE 0 END AS f "
        "FROM documents) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(f) AS BIGINT) AS n_code_switch, "
        "CAST(SUM(f) * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT) "
        "AS code_switch_ppm FROM d GROUP BY source ORDER BY source"
    )


_WATERFILL_SQL = (
    # replay of analytics.token_budget_waterfill: supply-ascending window
    # cumsum, per-row level candidate (B - s_{i-1}) // (n-i+1), valid
    # where cand >= previous supply (a_0 = 0), L = MAX(valid), allot =
    # LEAST(a, L). B = total * 2 // 5, all integer.
    "WITH s AS (SELECT source, "
    "CAST(SUM(len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+'))) AS BIGINT) AS a "
    "FROM documents GROUP BY source), "
    "t AS (SELECT CAST(SUM(a) AS BIGINT) AS total, COUNT(*) AS n FROM s), "
    "b AS (SELECT total * 2 // 5 AS B, n FROM t), "
    "o AS (SELECT source, a, ROW_NUMBER() OVER (ORDER BY a, source) AS i, "
    "SUM(a) OVER (ORDER BY a, source ROWS UNBOUNDED PRECEDING) AS s_i, "
    "COALESCE(LAG(a) OVER (ORDER BY a, source), 0) AS prev FROM s), "
    "cand AS (SELECT (b.B - (o.s_i - o.a)) // (b.n - o.i + 1) AS c, o.prev "
    "FROM o, b), "
    "lvl AS (SELECT MAX(c) AS L FROM cand WHERE c >= prev) "
    "SELECT s.source, s.a AS available_tokens, "
    "CAST(LEAST(s.a, lvl.L) AS BIGINT) AS allotted_tokens, "
    "CAST(CASE WHEN s.a > lvl.L THEN 1 ELSE 0 END AS BIGINT) AS capped "
    "FROM s, lvl ORDER BY s.source"
)


def _random_walks_sql(n_seeds: int = 16, walks_per_seed: int = 4,
                      walk_len: int = 3) -> str:
    seed_h = _MD5U64.format(v="'rwseed:' || CAST(doc_id AS VARCHAR)")
    # replay of analytics.random_walks over the shared edge CTEs:
    # sorted-adjacency lists, md5-arithmetic hop picks, walks end at
    # sink nodes via the step JOIN
    parts = [
        f"{_edges_ctes()}, "
        "de AS (SELECT DISTINCT src, dst FROM edges), "
        "adj AS (SELECT src, list(dst ORDER BY dst) AS arr FROM de GROUP BY src), "
        f"sh AS (SELECT doc_id AS v, {seed_h} AS h FROM documents), "
        f"seeds AS (SELECT v FROM sh ORDER BY h, v LIMIT {n_seeds}), "
        "s0 AS (SELECT v AS seed, CAST(unnest(range("
        f"{walks_per_seed})) AS BIGINT) AS w, v FROM seeds)"
    ]
    for t in range(walk_len):
        hop_h = _MD5U64.format(
            v="'walk:' || CAST(s.seed AS VARCHAR) || ':' || CAST(s.w AS VARCHAR) "
            f"|| ':{t}:' || CAST(s.v AS VARCHAR)"
        )
        parts.append(
            f"s{t + 1} AS (SELECT s.seed, s.w, "
            f"adj.arr[CAST(1 + {hop_h} % len(adj.arr) AS INT)] AS v "
            f"FROM s{t} s JOIN adj ON adj.src = s.v)"
        )
    union = " UNION ALL ".join(
        f"SELECT seed, w AS walk_id, CAST({t} AS BIGINT) AS step, v AS node FROM s{t}"
        for t in range(walk_len + 1)
    )
    return (
        "WITH " + ", ".join(parts) + " "
        + "SELECT seed, walk_id, step, CAST(node AS BIGINT) AS node FROM ("
        + union + ") ORDER BY seed, walk_id, step"
    )


def _kwic_sql(terms=("merge", "vector", "stream"), window: int = 3, k: int = 20) -> str:
    lst = ", ".join(f"'{t}'" for t in terms)
    return (
        # replay of analytics.kwic_snippets: 1-based token positions,
        # +-window list_slice snippet, first k per term by (doc_id, pos)
        "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') "
        "AS arr FROM documents), "
        "e AS (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i FROM t), "
        "h AS (SELECT arr[CAST(i AS INT)] AS term, doc_id, CAST(i AS BIGINT) AS pos, "
        f"array_to_string(list_slice(arr, greatest(CAST(i AS INT) - {window}, 1), "
        f"least(CAST(i AS INT) + {window}, len(arr))), ' ') AS snippet "
        f"FROM e WHERE arr[CAST(i AS INT)] IN ({lst})) "
        "SELECT term, doc_id, pos, snippet FROM h "
        f"QUALIFY row_number() OVER (PARTITION BY term ORDER BY doc_id, pos) <= {k} "
        "ORDER BY term, doc_id, pos"
    )


def _leakage_split_sql(train_pct: int = 8) -> str:
    hd = _MD5U64.format(v="'lsplit:' || CAST(doc_id AS VARCHAR)")
    hc = _MD5U64.format(v="'lsplit:' || CAST(c AS VARCHAR)")
    # replay of analytics.leakage_free_split_audit over the green
    # MinHash recursive-closure body: per-doc cluster (singleton = own
    # id), md5 split predicates, per-cluster straddle flags
    return (
        f"WITH RECURSIVE {_minhash_ctes()}, "
        "ledges AS (SELECT doc_a AS a, doc_b AS b FROM mpairs "
        "UNION SELECT doc_b, doc_a FROM mpairs), "
        "lreach AS (SELECT a, b FROM ledges "
        "UNION SELECT r.a, e.b FROM lreach r JOIN ledges e ON r.b = e.a), "
        "lcl AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id "
        "FROM lreach GROUP BY a), "
        "d AS (SELECT dd.doc_id, COALESCE(lcl.cluster_id, dd.doc_id) AS c "
        "FROM documents dd LEFT JOIN lcl ON dd.doc_id = lcl.doc_id), "
        f"s AS (SELECT c, CASE WHEN {hd} % 10 < {train_pct} THEN 1 ELSE 0 END AS nt, "
        f"CASE WHEN {hc} % 10 < {train_pct} THEN 1 ELSE 0 END AS ct FROM d), "
        "pc AS (SELECT c, COUNT(*) AS n, SUM(nt) AS nt, SUM(ct) AS ct "
        "FROM s GROUP BY c), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nd, "
        "CAST(SUM(nt) AS BIGINT) AS naive_tr, CAST(SUM(ct) AS BIGINT) AS clus_tr, "
        "CAST(COUNT(*) FILTER (n > 1 AND nt > 0 AND nt < n) AS BIGINT) AS nstr, "
        "CAST(COUNT(*) FILTER (n > 1 AND ct > 0 AND ct < n) AS BIGINT) AS cstr "
        "FROM pc) "
        "SELECT 'by_cluster' AS method, clus_tr AS n_train, nd - clus_tr AS n_val, "
        "cstr AS straddling_clusters FROM tot "
        "UNION ALL SELECT 'by_doc', naive_tr, nd - naive_tr, nstr FROM tot "
        "ORDER BY method"
    )


_TEXT_SOURCE_DAILY_SQL = (
    # replay of analytics.text_source_daily: the export is a pure
    # projection (cents + day strings), so the oracle aggregates the
    # original parquet directly
    "SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
)


def _matryoshka_sql(trunc_dim: int = 16, k: int = 10) -> str:
    return (
        # replay of analytics.matryoshka_recall_audit: both rankings via
        # list_cosine_similarity (full and list_slice prefix), overlap
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        "ORDER BY vec_id LIMIT 3), "
        "full_r AS (SELECT q.query_id, e.vec_id FROM q CROSS JOIN embeddings e "
        "QUALIFY row_number() OVER (PARTITION BY q.query_id "
        f"ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) <= {k}), "
        "tr AS (SELECT q.query_id, e.vec_id FROM q CROSS JOIN embeddings e "
        "QUALIFY row_number() OVER (PARTITION BY q.query_id "
        f"ORDER BY list_cosine_similarity(list_slice(q.qe, 1, {trunc_dim}), "
        f"list_slice(e.embedding, 1, {trunc_dim})) DESC, e.vec_id) <= {k}), "
        "ov AS (SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap "
        "FROM full_r f JOIN tr USING (query_id, vec_id) GROUP BY f.query_id) "
        "SELECT q.query_id, COALESCE(ov.n_overlap, 0) AS n_overlap, "
        f"CAST(COALESCE(ov.n_overlap, 0) * 1000000 // {k} AS BIGINT) AS recall_ppm "
        "FROM q LEFT JOIN ov USING (query_id) ORDER BY q.query_id"
    )


def _mmr_sql(k: int = 5, pool: int = 50, lam: float = 0.7) -> str:
    # replay of analytics.mmr_diverse_topk: top-pool candidates with
    # embeddings, k unrolled greedy steps, penalty = GREATEST cosine to
    # the already-selected set, ties to smallest vec_id
    parts = [
        "q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        "ORDER BY vec_id LIMIT 3), "
        "pool AS (SELECT q.query_id, e.vec_id, e.embedding AS emb, "
        "list_cosine_similarity(q.qe, e.embedding) AS cq "
        "FROM q CROSS JOIN embeddings e "
        "QUALIFY row_number() OVER (PARTITION BY q.query_id "
        f"ORDER BY cq DESC, e.vec_id) <= {pool})"
    ]
    for r in range(1, k + 1):
        joins = " ".join(
            f"JOIN s{i} ON s{i}.query_id = p.query_id AND s{i}.vec_id <> p.vec_id"
            for i in range(1, r)
        )
        if r == 1:
            score = f"{lam} * p.cq"
        else:
            pens = ", ".join(
                f"list_cosine_similarity(p.emb, s{i}.emb)" for i in range(1, r)
            )
            pen = pens if r == 2 else f"GREATEST({pens})"
            score = f"{lam} * p.cq - {1 - lam} * ({pen})"
        parts.append(
            f"s{r} AS (SELECT p.query_id, p.vec_id, p.emb FROM pool p {joins} "
            "QUALIFY row_number() OVER (PARTITION BY p.query_id "
            f"ORDER BY {score} DESC, p.vec_id) = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT query_id, CAST({r} AS BIGINT) AS rank, vec_id FROM s{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH " + ", ".join(parts) + " SELECT * FROM (" + union
        + ") ORDER BY query_id, rank"
    )


_BINARY_HAMMING_SQL = (
    # replay of analytics.binary_hamming_topk: sign bits on RAW floats,
    # per-dim mismatch Hamming, milli-int exact L2 (pq convention,
    # unit-norm inputs so L2 order is cosine order), both rankings at
    # (dist, vec_id), overlap in ppm
    "WITH q0 AS (SELECT vec_id, embedding AS e, list_transform(embedding, "
    "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv "
    "FROM embeddings), "
    "qry AS (SELECT vec_id AS query_id, e AS qe, qv AS qm FROM q0 "
    "ORDER BY vec_id LIMIT 3), "
    "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
    "ham AS (SELECT qry.query_id, q0.vec_id, "
    "SUM(CASE WHEN (qry.qe[i] > 0) <> (q0.e[i] > 0) THEN 1 ELSE 0 END) AS h "
    "FROM qry, q0, dims GROUP BY 1, 2), "
    "bink AS (SELECT query_id, vec_id FROM ham "
    "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY h, vec_id) <= 10), "
    "l2 AS (SELECT qry.query_id, q0.vec_id, "
    "SUM((qry.qm[i] - q0.qv[i]) * (qry.qm[i] - q0.qv[i])) AS d "
    "FROM qry, q0, dims GROUP BY 1, 2), "
    "exk AS (SELECT query_id, vec_id FROM l2 "
    "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) <= 10) "
    "SELECT b.query_id, CAST(COUNT(e.vec_id) AS BIGINT) AS n_overlap, "
    "CAST(COUNT(e.vec_id) * 1000000 // 10 AS BIGINT) AS recall_ppm "
    "FROM bink b LEFT JOIN exk e ON e.query_id = b.query_id "
    "AND e.vec_id = b.vec_id GROUP BY 1 ORDER BY 1"
)


def _sq8_sql(k: int = 10, quant: int = 1000, levels: int = 255) -> str:
    """Replay of ``analytics.sq8_recall_audit``: milli-int embeddings,
    per-dim (min, span) grid, non-negative integer floor-division codes,
    squared-L2 rankings in BOTH spaces with (dist, vec_id) ties, and the
    top-k overlap fold. Queries are the first 3 vectors by vec_id."""
    return (
        "WITH mi AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(FLOOR(x * {quant} + 0.5) AS BIGINT)) AS v FROM embeddings), "
        "ex AS (SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS x "
        "FROM mi), "
        "dims AS (SELECT d, MIN(x) AS mn, GREATEST(MAX(x) - MIN(x), 1) AS span "
        "FROM ex GROUP BY d), "
        "code AS (SELECT e.vec_id, e.d, e.x, "
        f"(e.x - m.mn) * {levels} // m.span AS c "
        "FROM ex e JOIN dims m USING (d)), "
        "q AS (SELECT vec_id AS qid, "
        "CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS query_id "
        "FROM embeddings ORDER BY vec_id LIMIT 3), "
        "dsq AS (SELECT q.query_id, a.vec_id, "
        "SUM((a.c - b.c) * (a.c - b.c)) AS dist "
        "FROM code a CROSS JOIN q "
        "JOIN code b ON b.vec_id = q.qid AND b.d = a.d GROUP BY 1, 2), "
        "dex AS (SELECT q.query_id, a.vec_id, "
        "SUM((a.x - b.x) * (a.x - b.x)) AS dist "
        "FROM code a CROSS JOIN q "
        "JOIN code b ON b.vec_id = q.qid AND b.d = a.d GROUP BY 1, 2), "
        "tsq AS (SELECT query_id, vec_id FROM dsq "
        f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= {k}), "
        "tex AS (SELECT query_id, vec_id FROM dex "
        f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= {k}) "
        "SELECT t.query_id AS query_id, "
        "CAST(COUNT(x.vec_id) AS BIGINT) AS n_overlap, "
        f"CAST(COUNT(x.vec_id) * 1000000 // {k} AS BIGINT) AS recall_ppm "
        "FROM tsq t LEFT JOIN tex x USING (query_id, vec_id) "
        "GROUP BY 1 ORDER BY 1"
    )


def _pq_sql(n_sub: int = 8, n_codes: int = 16, k: int = 10,
            quant: int = 1000, dim: int = 64) -> str:
    """Replay of analytics.pq_recall_audit, step for step: milli-int
    quantization, md5-elected seeds (ORDER BY h, vec_id LIMIT n_codes),
    one assignment step with (d, c) tie order, truncating-div integer
    centroids with empty clusters keeping their seed, encode, the ADC
    sum over per-subspace lookup distances, exact integer L2, both
    top-k at (dist, vec_id) order, overlap in ppm."""
    h = _MD5U64.format(v="'pqseed:' || CAST(vec_id AS VARCHAR)")
    dsub = dim // n_sub
    return (
        "WITH q0 AS (SELECT vec_id, list_transform(embedding, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS qv "
        "FROM embeddings), "
        f"dims AS (SELECT unnest(generate_series(1, {dim})) AS i), "
        f"u AS (SELECT vec_id, i, qv[i] AS x, (i - 1) // {dsub} AS s "
        "FROM q0, dims), "
        f"hsh AS (SELECT vec_id, qv, {h} AS hv FROM q0), "
        "seeds AS (SELECT vec_id, qv, "
        "ROW_NUMBER() OVER (ORDER BY hv, vec_id) - 1 AS c FROM hsh "
        f"QUALIFY ROW_NUMBER() OVER (ORDER BY hv, vec_id) <= {n_codes}), "
        f"su AS (SELECT c, i, qv[i] AS x, (i - 1) // {dsub} AS s "
        "FROM seeds, dims), "
        "ad AS (SELECT u.vec_id, u.s, su.c, "
        "SUM((u.x - su.x) * (u.x - su.x)) AS d "
        "FROM u JOIN su ON su.i = u.i GROUP BY 1, 2, 3), "
        "asg AS (SELECT vec_id, s, c FROM ad "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) = 1), "
        "csum AS (SELECT a.s, a.c, u.i, SUM(u.x) AS sx, COUNT(*) AS n "
        "FROM asg a JOIN u ON u.vec_id = a.vec_id AND u.s = a.s "
        "GROUP BY 1, 2, 3), "
        "cent AS (SELECT su.s, su.c, su.i, "
        "COALESCE(cs.sx // cs.n, su.x) AS cx FROM su "
        "LEFT JOIN csum cs ON cs.s = su.s AND cs.c = su.c AND cs.i = su.i), "
        "ed2 AS (SELECT u.vec_id, u.s, ct.c, "
        "SUM((u.x - ct.cx) * (u.x - ct.cx)) AS d "
        "FROM u JOIN cent ct ON ct.i = u.i GROUP BY 1, 2, 3), "
        "code AS (SELECT vec_id, s, c FROM ed2 "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) = 1), "
        "qry AS (SELECT vec_id AS query_id, qv FROM q0 ORDER BY vec_id LIMIT 3), "
        f"qu AS (SELECT query_id, i, qv[i] AS x, (i - 1) // {dsub} AS s "
        "FROM qry, dims), "
        "lut AS (SELECT qu.query_id, qu.s, ct.c, "
        "SUM((qu.x - ct.cx) * (qu.x - ct.cx)) AS d "
        "FROM qu JOIN cent ct ON ct.i = qu.i GROUP BY 1, 2, 3), "
        "appx AS (SELECT l.query_id, cd.vec_id, SUM(l.d) AS adist "
        "FROM code cd JOIN lut l ON l.s = cd.s AND l.c = cd.c GROUP BY 1, 2), "
        "atop AS (SELECT query_id, vec_id FROM appx "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, vec_id) <= {k}), "
        "exd AS (SELECT qu.query_id, u.vec_id, "
        "SUM((qu.x - u.x) * (qu.x - u.x)) AS edist "
        "FROM qu JOIN u ON u.i = qu.i GROUP BY 1, 2), "
        "etop AS (SELECT query_id, vec_id FROM exd "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY edist, vec_id) <= {k}), "
        "ov AS (SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap "
        "FROM atop a JOIN etop USING (query_id, vec_id) GROUP BY 1) "
        "SELECT qry.query_id, COALESCE(ov.n_overlap, 0) AS n_overlap, "
        f"CAST(COALESCE(ov.n_overlap, 0) * 1000000 // {k} AS BIGINT) AS recall_ppm "
        "FROM qry LEFT JOIN ov USING (query_id) ORDER BY qry.query_id"
    )


def _bootstrap_ci_sql(n_resamples: int = 64, seed: int = 7,
                      lo_pct: int = 25, hi_pct: int = 975) -> str:
    """Replay of analytics.bootstrap_ci_mean: the SAME (a_b, b_b) affine
    literals and Poisson(1) integer CDF ladder (both from
    analytics.bootstrap_constants -- one source of truth), u =
    ((pa*h + pb) % 2^64) % Mersenne61 via HUGEINT, weight = CASE rung,
    per-resample mean = floor((SUM(w*cents)*100) / SUM(w)) with zero-weight
    resamples dropped on both sides, percentile pick by ROW_NUMBER at the
    engine's integer rank formulas."""
    from distributed_system___ocr_ray.pipelines import analytics

    a, b, thr = analytics.bootstrap_constants(n_resamples, seed)
    perms = ", ".join(
        f"({i}, {int(x)}, {int(y)})" for i, (x, y) in enumerate(zip(a, b))
    )
    ladder = "CASE " + " ".join(
        f"WHEN u < {int(t)} THEN {k}" for k, t in enumerate(thr)
    ) + f" ELSE {len(thr)} END"
    h = _MD5U64.format(v="CAST(o_orderkey AS VARCHAR)")
    return (
        f"WITH base AS (SELECT {h} AS h, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders), "
        f"perm(b, pa, pb) AS (VALUES {perms}), "
        "u AS (SELECT p.b, ((CAST(p.pa AS HUGEINT) * base.h + p.pb) "
        "% 18446744073709551616) % 2305843009213693951 AS u, base.cents "
        "FROM base CROSS JOIN perm p), "
        f"w AS (SELECT b, {ladder} AS w, cents FROM u), "
        "mn AS (SELECT b, CAST((SUM(w * cents) * 100) // SUM(w) AS BIGINT) "
        "AS mean FROM w GROUP BY b HAVING SUM(w) > 0), "
        "r AS (SELECT mean, ROW_NUMBER() OVER (ORDER BY mean) AS rn, "
        "COUNT(*) OVER () AS m FROM mn), "
        "pt AS (SELECT CAST((SUM(cents) * 100) // COUNT(*) AS BIGINT) "
        "AS mean_c100 FROM base) "
        "SELECT pt.mean_c100, "
        f"(SELECT mean FROM r WHERE rn = ({lo_pct} * m) // 1000 + 1) AS ci_lo_c100, "
        f"(SELECT mean FROM r WHERE rn = ({hi_pct} * m + 999) // 1000) AS ci_hi_c100, "
        "(SELECT CAST(MAX(m) AS BIGINT) FROM r) AS n_resamples FROM pt"
    )


def oracle_sql() -> dict[str, str]:
    from distributed_system___ocr_ray.functions.textstats import (
        PUNCT_PATTERN as _TS_PUNCT,
        WS_PATTERN as _TS_WS,
    )
    from distributed_system___ocr_ray.pipelines.analytics import (
        ENC_CTRL_PATTERN as _ENC_CTRL,
        ENC_MOJIBAKE_PATTERN as _ENC_MOJI,
        ENC_NONASCII_PATTERN as _ENC_NONASCII,
    )

    return {
        "extract_interleaved": _interleaved_sql(),
        # byte-identical output contract: the salted skew path answers to
        # the SAME exact oracle as the plain reassembly
        "extract_salted": _interleaved_sql(),
        # the sharded zero-shuffle plan must produce the SAME closed-form
        # span table as the shuffle plan
        "extract_sharded": _interleaved_sql(),
        "extract_flat_identity": (
            "SELECT doc_id, text AS extracted_text FROM documents WHERE trim(text) <> ''"
        ),
        "span_kind_counts": (
            "SELECT * FROM ("
            "SELECT 'text' AS kind, CAST(COUNT(*) AS BIGINT) AS n_spans FROM documents "
            "UNION ALL "
            "SELECT 'image' AS kind, CAST(SUM(1 + doc_id % 2) AS BIGINT) AS n_spans FROM documents "
            "UNION ALL "
            "SELECT 'pdf' AS kind, CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_spans FROM documents)"
        ),
        "media_ref_counts": (
            "SELECT media_ref, COUNT(*) AS n_refs FROM ("
            "SELECT printf('mem://img/%06d', (doc_id*7) % 500) AS media_ref "
            "FROM documents WHERE doc_id % 20 <> 0 "
            "UNION ALL "
            "SELECT printf('mem://img/%06d', (doc_id*7+3) % 500) AS media_ref "
            "FROM documents WHERE doc_id % 2 = 1 AND (doc_id+1) % 20 <> 0"
            ") GROUP BY media_ref"
        ),
        "extract_status_counts": _status_counts_sql(),
        "doc_completeness_by_lang": _doc_completeness_sql(),
        "retry_plan": _retry_plan_sql(),
        "span_profile_by_kind": (
            # aggregate over the same closed-form allspans replay that backs
            # extract_interleaved: per-kind span counts + character totals
            f"WITH {_interleaved_ctes()} "
            "SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_spans, "
            "CAST(SUM(length(out)) AS BIGINT) AS total_chars, "
            "CAST(SUM(length(out)) * 1000 // COUNT(*) AS BIGINT) "
            "AS mean_chars_milli FROM allspans GROUP BY kind"
        ),
        "media_metadata": _media_metadata_sql(),
        "media_dedup_groups": _media_dedup_sql(),
        "orphan_media_audit": (
            # non-broken referenced indices per kind (wrap.py:76-93), as
            # DISTINCT sets; orphans = full store range minus them. The
            # store's kind labels are 'image'/'pdf' (corpus.MEDIA_SCHEMA).
            "WITH refimg AS ("
            "SELECT DISTINCT (doc_id * 7) % 500 AS s FROM documents "
            "WHERE doc_id % 20 <> 0 "
            "UNION "
            "SELECT DISTINCT (doc_id * 7 + 3) % 500 FROM documents "
            "WHERE doc_id % 2 = 1 AND (doc_id + 1) % 20 <> 0), "
            "refpdf AS ("
            "SELECT DISTINCT (doc_id * 11) % 250 AS s FROM documents "
            "WHERE doc_id % 2 = 0 AND doc_id % 40 <> 10) "
            "SELECT 'image' AS kind, CAST(500 AS BIGINT) AS n_store, "
            "CAST((SELECT COUNT(*) FROM refimg) AS BIGINT) AS n_referenced, "
            "CAST(500 - (SELECT COUNT(*) FROM refimg) AS BIGINT) AS n_orphans "
            "UNION ALL "
            "SELECT 'pdf', CAST(250 AS BIGINT), "
            "CAST((SELECT COUNT(*) FROM refpdf) AS BIGINT), "
            "CAST(250 - (SELECT COUNT(*) FROM refpdf) AS BIGINT) "
            "ORDER BY kind"
        ),
        "dangling_ref_audit": (
            # replay of the wrap's ref plan (sources/wrap.py:76-93): image
            # span k=0 for every doc + k=1 for odd docs, broken iff
            # (i+k)%20==0; pdf span for even docs, broken iff i%40==10;
            # non-broken refs always resolve (modulo the full store range)
            "WITH img AS ("
            "SELECT doc_id AS i, 0 AS k FROM documents "
            "UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 2 = 1), "
            "imgr AS (SELECT CASE WHEN (i + k) % 20 = 0 "
            "THEN printf('mem://img/missing-%06d', i) "
            "ELSE printf('mem://img/%06d', (i * 7 + k * 3) % 500) END AS ref, "
            "(i + k) % 20 = 0 AS dangling, 'image' AS kind FROM img), "
            "pdfr AS (SELECT CASE WHEN doc_id % 40 = 10 "
            "THEN printf('mem://pdf/missing-%06d', doc_id) "
            "ELSE printf('mem://pdf/%06d', (doc_id * 11) % 250) END AS ref, "
            "doc_id % 40 = 10 AS dangling, 'pdf' AS kind FROM documents "
            "WHERE doc_id % 2 = 0), "
            "allr AS (SELECT * FROM imgr UNION ALL SELECT * FROM pdfr) "
            "SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_refs, "
            "CAST(COUNT(DISTINCT ref) AS BIGINT) AS n_distinct_refs, "
            "CAST(SUM(CASE WHEN dangling THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dangling, "
            "CAST(COUNT(DISTINCT CASE WHEN dangling THEN ref END) AS BIGINT) "
            "AS n_dangling_distinct "
            "FROM allr GROUP BY kind ORDER BY kind"
        ),
        "render_html": _render_html_sql(),
        "ngram_jaccard_pairs": _NGRAM_PAIRS_SQL,
        "ngram_dup_clusters": _NGRAM_CLUSTERS_SQL,
        "ngram_dedup_keepers": _NGRAM_KEEPERS_SQL,
        "quality_by_lang": _quality_by_lang_sql(),
        "median_order_value": _MEDIAN_ORDER_SQL,
        "weighted_median_price": _WEIGHTED_MEDIAN_PRICE_SQL,
        "pps_sample": _PPS_SAMPLE_SQL,
        "profile_documents": _PROFILE_DOCUMENTS_SQL,
        "top_tokens": _TOP_TOKENS_SQL,
        "training_corpus_counts": _training_corpus_sql(),
        "ingest_increment_counts": _ingest_increment_sql(),
        "corpus_report": _corpus_report_sql(),
        "median_value_by_event_type": _MEDIAN_BY_TYPE_SQL,
        "user_median_value_sketch": _USER_MEDIAN_SKETCH_SQL,
        "debounce_events": _DEBOUNCE_SQL,
        "tfidf_keywords": _TFIDF_SQL,
        "embedding_neardup": _EMBEDDING_NEARDUP_SQL,
        "extract_embed_neardup": _extract_embed_neardup_sql(),
        "minhash_pairs": _minhash_pairs_sql(),
        "minhash_recall_audit": _minhash_recall_audit_sql(),
        "minhash_dup_clusters": _minhash_clusters_sql(),
        "simhash_dup_clusters": _simhash_clusters_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "approx_distinct_users": _approx_distinct_sql(),
        "hll_error_audit": (
            # composes the register-exact HLL replay with COUNT(DISTINCT);
            # abs error floor-divides on both sides (both operands >= 0)
            f"WITH a AS ({_approx_distinct_sql()}), "
            "e AS (SELECT COUNT(DISTINCT user_id) AS n FROM events) "
            "SELECT CAST(e.n AS BIGINT) AS exact_distinct, "
            "CAST(a.approx_distinct_users AS BIGINT) AS approx_distinct, "
            "CAST(abs(a.approx_distinct_users - e.n) * 1000000 // e.n AS BIGINT) "
            "AS abs_err_ppm FROM a, e"
        ),
        "approx_users_by_type": _approx_distinct_by_type_sql(),
        "bm25_topk": _bm25_sql(),
        "bm25_prf_topk": _bm25_prf_sql(),
        "docs_by_lang": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
        "doc_stats_by_source": (
            "SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY source"
        ),
        "filter_project_documents": (
            "SELECT doc_id, lang FROM documents WHERE n_chars >= 100 AND n_chars <= 20000"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
            "COUNT(*) AS n_rows "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "revenue_by_nation": (
            "SELECT n.n_name, "
            "CAST(SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "COUNT(*) AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        "events_daily": (
            "SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
            "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents, "
            "COUNT(*) AS n_events FROM events GROUP BY 1, 2"
        ),
        # replays relational.daily_activity_full_outer: two independent
        # daily aggregates reconciled with FULL OUTER + COALESCE zeros
        "daily_activity": (
            "WITH od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1), "
            "ed AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1) "
            "SELECT COALESCE(od.day, ed.day) AS day, "
            "COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders, "
            "COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events "
            "FROM od FULL OUTER JOIN ed ON od.day = ed.day"
        ),
        # replays relational.ols_trend_by_priority: HUGEINT normal
        # equations, sign-split so both // operands are non-negative
        # (truncation == floor on both engines)
        "ols_trend": (
            "WITH o AS (SELECT o_orderpriority AS pri, "
            "CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) "
            "AS HUGEINT) AS x, "
            "CAST(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS HUGEINT) AS y "
            "FROM orders), "
            "s AS (SELECT pri, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, "
            "SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM o GROUP BY pri), "
            "c AS (SELECT pri, n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS den FROM s) "
            "SELECT pri AS o_orderpriority, CAST(n AS BIGINT) AS n_orders, "
            "CAST(CASE WHEN num >= 0 THEN (1000000*num) // den "
            "ELSE -((1000000*(-num)) // den) END AS BIGINT) AS slope_ppm FROM c"
        ),
        "top_users_by_value": (
            "SELECT user_id, CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS total_value_cents FROM events GROUP BY user_id "
            "ORDER BY total_value_cents DESC, user_id LIMIT 10"
        ),
        "order_lineitem_join": (
            "SELECT o.o_orderpriority, "
            "CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_cents, COUNT(*) AS n_items "
            "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey GROUP BY 1"
        ),
        "last_order_before_event": (
            "SELECT e.event_id, strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_day "
            "FROM events e ASOF JOIN orders o "
            "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "session_windows": (
            "WITH d AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS session_id FROM d) "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS session_value_cents "
            "FROM s GROUP BY 1, 2"
        ),
        "sliding_windows": (
            # every event is in exactly width/hop = 4 windows, so a constant
            # series works (DuckDB's generate_series rejects lateral column args)
            "SELECT event_type, "
            "CAST(900 * (floor(epoch(e.ts) / 900) - j.j) AS BIGINT) AS window_start, "
            "COUNT(*) AS n_events FROM events e "
            "CROSS JOIN generate_series(0, 3) AS j(j) GROUP BY 1, 2"
        ),
        "top_orders_per_segment": (
            "SELECT c.c_mktsegment, o.o_orderkey, "
            "CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS price_cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment "
            "ORDER BY price_cents DESC, o.o_orderkey) <= 3"
        ),
        "language_id": _lang_id_sql(),
        "langid_confusion": (
            # wraps the char-for-char language_id replay; the label joins in
            f"WITH pred AS ({_lang_id_sql()}) "
            "SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM pred p JOIN documents d USING (doc_id) GROUP BY 1, 2"
        ),
        "kmv_distinct_audit": (
            # replay of analytics.kmv_distinct_audit: 'kmv:' md5-u64 over
            # DISTINCT user ids, bottom-256, (k-1)*2^64 // m_k in HUGEINT;
            # under-filled sketch ships its own size exactly
            "WITH h AS (SELECT DISTINCT CAST(('0x' || substr(md5('kmv:' || "
            "CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv "
            "FROM events), "
            "n AS (SELECT COUNT(*) AS exact FROM h), "
            "bk AS (SELECT hv FROM h ORDER BY hv LIMIT 256), "
            "kth AS (SELECT MAX(hv) AS mk, COUNT(*) AS nk FROM bk), "
            "est AS (SELECT CASE WHEN (SELECT nk FROM kth) < 256 THEN "
            "CAST((SELECT nk FROM kth) AS HUGEINT) ELSE "
            "(255 * CAST(18446744073709551616 AS HUGEINT)) // "
            "CAST((SELECT mk FROM kth) AS HUGEINT) END AS e) "
            "SELECT CAST((SELECT exact FROM n) AS BIGINT) AS exact_distinct, "
            "CAST((SELECT e FROM est) AS BIGINT) AS kmv_distinct, "
            "CAST(CASE WHEN (SELECT exact FROM n) = 0 THEN 0 ELSE "
            "abs((SELECT e FROM est) - (SELECT exact FROM n)) * 1000000 // "
            "(SELECT exact FROM n) END AS BIGINT) AS abs_err_ppm"
        ),
        "langid_kappa": (
            # replay of analytics.langid_kappa: the shared language_id
            # replay -> confusion cells -> Cohen's kappa on HUGEINT
            # marginals, sign-split truncating ppm
            f"WITH pred AS ({_lang_id_sql()}), "
            "cm AS (SELECT d.lang, p.pred_lang, COUNT(*) AS n FROM pred p "
            "JOIN documents d USING (doc_id) GROUP BY 1, 2), "
            "tot AS (SELECT SUM(CAST(n AS HUGEINT)) AS nn FROM cm), "
            "ag AS (SELECT COALESCE(SUM(CAST(n AS HUGEINT)), 0) AS a "
            "FROM cm WHERE lang = pred_lang), "
            "rm AS (SELECT lang, SUM(CAST(n AS HUGEINT)) AS r FROM cm "
            "GROUP BY 1), "
            "cg AS (SELECT pred_lang, SUM(CAST(n AS HUGEINT)) AS c FROM cm "
            "GROUP BY 1), "
            "pe AS (SELECT COALESCE(SUM(rm.r * cg.c), 0) AS e FROM rm "
            "JOIN cg ON cg.pred_lang = rm.lang), "
            "nd AS (SELECT (SELECT nn FROM tot) * (SELECT a FROM ag) - "
            "(SELECT e FROM pe) AS num, (SELECT nn FROM tot) * "
            "(SELECT nn FROM tot) - (SELECT e FROM pe) AS den) "
            "SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n_docs, "
            "CAST((SELECT a FROM ag) AS BIGINT) AS agree, "
            "CAST(CASE WHEN den = 0 THEN 0 WHEN num >= 0 THEN "
            "(num * 1000000) // den ELSE -(((-num) * 1000000) // den) END "
            "AS BIGINT) AS kappa_ppm FROM nd"
        ),
        "quality_scores": _quality_sql(),
        "fingerprints": _fingerprint_sql(),
        "token_count_by_lang": (
            "SELECT lang, CAST(SUM(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) "
            "AS n_ws_tokens FROM documents GROUP BY lang"
        ),
        "exact_dedup_groups": (
            "SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies FROM documents GROUP BY text"
        ),
        "exact_dedup_rows": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)"
        ),
        "novel_docs": (
            "SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0 "
            "AND text NOT IN (SELECT text FROM documents WHERE doc_id % 5 != 0)"
        ),
        # identical semantics through the Bloom-prefilter path: exactness
        # comes from hit re-verification, so the oracle is shared verbatim
        "novel_docs_bloom": (
            "SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0 "
            "AND text NOT IN (SELECT text FROM documents WHERE doc_id % 5 != 0)"
        ),
        # full SQL replay of functions/bloom.BloomFilter: one md5 over the
        # sha256-hex key, h1/h2 = big-endian digest halves (h2 | 1),
        # Kirsch-Mitzenmacher probes (h1 + i*h2) % m for i in 0..6,
        # m = GREATEST(64, 16 * n_distinct_corpus_keys); a row is a bloom
        # hit iff all 7 probe positions are set by some corpus key
        "bloom_fp_audit": (
            "WITH newb AS (SELECT doc_id, sha256(text) AS h FROM documents "
            "WHERE doc_id % 5 = 0), "
            "corp AS (SELECT DISTINCT sha256(text) AS h FROM documents "
            "WHERE doc_id % 5 != 0), "
            "mm AS (SELECT GREATEST(64, 16 * COUNT(*)) AS m FROM corp), "
            "ch AS (SELECT CAST(('0x' || substr(md5(h), 1, 16)) AS UBIGINT) AS h1, "
            "(CAST(('0x' || substr(md5(h), 17, 16)) AS UBIGINT) | 1) AS h2 FROM corp), "
            "bits AS (SELECT DISTINCT CAST((CAST(h1 AS HUGEINT) + g.i * CAST(h2 AS HUGEINT)) "
            "% (SELECT m FROM mm) AS BIGINT) AS pos "
            "FROM ch CROSS JOIN generate_series(0, 6) g(i)), "
            "nh AS (SELECT doc_id, h, CAST(('0x' || substr(md5(h), 1, 16)) AS UBIGINT) AS h1, "
            "(CAST(('0x' || substr(md5(h), 17, 16)) AS UBIGINT) | 1) AS h2 FROM newb), "
            "npp AS (SELECT doc_id, h, CAST((CAST(h1 AS HUGEINT) + g.i * CAST(h2 AS HUGEINT)) "
            "% (SELECT m FROM mm) AS BIGINT) AS pos "
            "FROM nh CROSS JOIN generate_series(0, 6) g(i)), "
            "hitrows AS (SELECT doc_id, h, "
            "SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS kset "
            "FROM npp LEFT JOIN bits b USING (pos) GROUP BY doc_id, h), "
            "agg AS (SELECT COUNT(*) AS n_new, "
            "SUM(CASE WHEN kset = 7 THEN 1 ELSE 0 END) AS n_hits, "
            "SUM(CASE WHEN h IN (SELECT h FROM corp) THEN 1 ELSE 0 END) AS n_true "
            "FROM hitrows) "
            "SELECT CAST(n_new AS BIGINT) AS n_new, "
            "CAST(n_hits AS BIGINT) AS n_bloom_hits, "
            "CAST(n_true AS BIGINT) AS n_true_dups, "
            "CAST(n_hits - n_true AS BIGINT) AS n_false_pos, "
            "CAST(CASE WHEN n_new - n_true = 0 THEN 0 ELSE "
            "(n_hits - n_true) * 1000000 // (n_new - n_true) END AS BIGINT) AS fp_ppm "
            "FROM agg"
        ),
        "dedup_stats": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct FROM documents"
        ),
        "dup_size_histogram": (
            # text equality == the engine's sha256 equality (dedup family's
            # documented collision odds); same every-7th planted-dup UNION
            "WITH u AS (SELECT text FROM documents UNION ALL "
            "SELECT text FROM documents WHERE doc_id % 7 = 0), "
            "g AS (SELECT text, COUNT(*) AS n FROM u GROUP BY text) "
            "SELECT CAST(n AS BIGINT) AS group_size, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups FROM g GROUP BY n"
        ),
        "clean_corpus_keepers": (
            "SELECT MIN(doc_id) AS keeper_doc_id FROM documents "
            "WHERE n_chars >= 100 AND n_chars <= 20000 GROUP BY text"
        ),
        "sample_docs": (
            # threshold = format(int(0.25 * 0xFFFFFFFF), '08x') = '3fffffff'
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '3fffffff'"
        ),
        "dataset_split_counts": (
            "SELECT CASE WHEN h < '19999999' THEN 'val' "
            "WHEN h < '33333333' THEN 'test' ELSE 'train' END AS split, "
            "COUNT(*) AS n_docs FROM "
            "(SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM documents) "
            "GROUP BY 1"
        ),
        "stratified_sample": (
            # thresholds = format(int(f * 0xFFFFFFFF), '08x') for 0.5/0.25/0.1
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            "CASE lang WHEN 'en' THEN '7fffffff' WHEN 'de' THEN '3fffffff' "
            "ELSE '19999999' END"
        ),
        "repetition_stats": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), "
            "'[^ \t\n\f\r]+') AS toks FROM documents), "
            "tok AS (SELECT doc_id, unnest(toks) AS tok, "
            "generate_subscripts(toks, 1) AS i FROM t), "
            "cnt AS (SELECT doc_id, tok, COUNT(*) c FROM tok GROUP BY 1, 2), "
            "top AS (SELECT doc_id, CAST(FLOOR(MAX(c) * 1e6 / SUM(c) + 0.5) AS BIGINT) "
            "top_token_ppm FROM cnt GROUP BY 1), "
            "bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram FROM tok a "
            "JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
            "dup AS (SELECT doc_id, CAST(FLOOR((COUNT(*) - COUNT(DISTINCT bigram)) "
            "* 1e6 / COUNT(*) + 0.5) AS BIGINT) dup_2gram_ppm FROM bg GROUP BY 1) "
            "SELECT t.doc_id, COALESCE(top.top_token_ppm, 0) AS top_token_ppm, "
            "COALESCE(dup.dup_2gram_ppm, 0) AS dup_2gram_ppm "
            "FROM t LEFT JOIN top USING(doc_id) LEFT JOIN dup USING(doc_id)"
        ),
        "redact_pii": _redact_pii_sql(),
        "contamination_flags": _contamination_sql(_CONTAM_EVAL_RATE, _CONTAM_K),
        "pack_sequences": _pack_sequences_sql(512),
        "budget_select": _budget_select_sql(_BUDGET_TOKENS),
        "mixture_sample": _mixture_sample_sql(_MIX_SHARES, _MIX_TARGET),
        "cms_top_tokens": _cms_top_tokens_sql(20),
        "cms_error_audit": _cms_error_audit_sql(20),
        "join_size_audit": (
            # replay of analytics.join_size_audit: exact = sum of per-key
            # count products (never the join), estimate = min over CMS rows
            # of the counter inner product (identical md5 bucket hashes)
            "WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1), "
            "cb AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1), "
            "ex AS (SELECT COALESCE(SUM(CAST(ca.c AS HUGEINT) * cb.c), 0) AS n "
            "FROM ca JOIN cb USING (k)), "
            "rows_ AS (SELECT CAST(r AS INTEGER) AS r FROM range(4) t(r)), "
            "ska AS (SELECT r, "
            + _MD5U64.format(v="'cms' || CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
            + " % 8192 AS b, SUM(c) AS c FROM ca CROSS JOIN rows_ GROUP BY 1, 2), "
            "skb AS (SELECT r, "
            + _MD5U64.format(v="'cms' || CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
            + " % 8192 AS b, SUM(c) AS c FROM cb CROSS JOIN rows_ GROUP BY 1, 2), "
            "ip AS (SELECT a.r, SUM(CAST(a.c AS HUGEINT) * b.c) AS s "
            "FROM ska a JOIN skb b ON a.r = b.r AND a.b = b.b GROUP BY a.r), "
            "est AS (SELECT MIN(s) AS e FROM ip) "
            "SELECT CAST(ex.n AS BIGINT) AS exact_rows, "
            "CAST(est.e AS BIGINT) AS cms_estimate, "
            "CAST(CASE WHEN ex.n = 0 THEN 0 ELSE (est.e - ex.n) * 1000000 // ex.n END "
            "AS BIGINT) AS over_ppm FROM ex, est"
        ),
        "epoch_shuffle": _epoch_shuffle_sql(3),
        "sample_exact_n": _sample_exact_n_sql(60),
        "line_dedup": _line_dedup_sql(8),
        "chunk_documents": _chunk_documents_sql(64, 16),
        "novel_docs_minhash": _novel_docs_minhash_sql(_FUZZY_NOVEL_THRESHOLD),
        "sample_n_per_group": _sample_n_per_group_sql(15),
        "zscore_by_lang": _zscore_by_lang_sql(),
        "funnel_counts": _funnel_counts_sql(_FUNNEL_STEPS),
        "domain_counts": _domain_counts_sql(10),
        "retention_cohorts": _retention_cohorts_sql(),
        "sample_by_quality": _sample_by_quality_sql(),
        "value_histogram": _value_histogram_sql(32),
        # replays _q_pruned_range_read's [3N/10, 11N/20) doc_id range with the
        # same integer arithmetic; the engine's zone-map pruning must be
        # invisible in the result (pruning changes cost, never rows)
        "pruned_range_read": (
            f"WITH {_RANGE_CTE} "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents, b WHERE doc_id >= b.lo AND doc_id < b.hi GROUP BY lang"
        ),
        # replays _q_running_totals: deterministic total order via the
        # orderkey tie-break; integer cents
        "running_totals": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) "
            "AS cum_cents FROM orders"
        ),
        # replays _q_robust_outliers: ceil-rank median (the engine's
        # exact_quantile convention), then ceil-rank median of |dev|, then
        # the all-integer dev > 2*MAD flag
        "robust_outliers": (
            "WITH s AS (SELECT lang, n_chars, "
            "row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
            "COUNT(*) OVER (PARTITION BY lang) AS n FROM documents), "
            "med AS (SELECT lang, n_chars AS med FROM s "
            "WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)), "
            "d AS (SELECT doc_id, d0.lang, ABS(d0.n_chars - med.med) AS dev "
            "FROM documents d0 JOIN med ON d0.lang = med.lang), "
            "s2 AS (SELECT lang, dev, "
            "row_number() OVER (PARTITION BY lang ORDER BY dev) AS rn, "
            "COUNT(*) OVER (PARTITION BY lang) AS n FROM d), "
            "mad AS (SELECT lang, dev AS mad FROM s2 "
            "WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)) "
            "SELECT d.doc_id, d.lang, CAST(d.dev AS BIGINT) AS dev, "
            "CAST(2 * mad.mad AS BIGINT) AS cutoff "
            "FROM d JOIN mad ON d.lang = mad.lang WHERE d.dev > 2 * mad.mad"
        ),
        # replays _q_collocations: shared [a-z0-9]+ tokenizer, consecutive
        # in-doc pairs, HUGEINT-exact score, (score DESC, bigram) top-50
        "collocations": (
            "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            "FROM documents), "
            "uni AS (SELECT unnest(t) AS w FROM toks), "
            "nx AS (SELECT w, COUNT(*) AS n FROM uni GROUP BY w), "
            "nn AS (SELECT COUNT(*) AS n FROM uni), "
            "big AS (SELECT t[i] AS x, t[i+1] AS y FROM toks, "
            "UNNEST(generate_series(1, len(t) - 1)) AS u(i)), "
            "nxy AS (SELECT x, y, COUNT(*) AS n_xy FROM big GROUP BY x, y "
            "HAVING COUNT(*) >= 5), "
            "sc AS (SELECT x || ' ' || y AS bigram, n_xy, "
            "CAST((1000000::HUGEINT * n_xy * nn.n) // (a.n * b.n) AS BIGINT) AS score_ppm "
            "FROM nxy JOIN nx a ON a.w = x JOIN nx b ON b.w = y, nn) "
            "SELECT bigram, CAST(n_xy AS BIGINT) AS n_xy, score_ppm FROM sc "
            "ORDER BY score_ppm DESC, bigram LIMIT 50"
        ),
        # replays _q_postings_lookup: the shared [a-z0-9]+ tokenizer,
        # per-doc distinct terms, counts for the fixed query terms — the
        # engine's sort/commit/prune path must be invisible in the result
        "postings_lookup": (
            "WITH toks AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents) "
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks "
            f"WHERE term IN ({', '.join(repr(t) for t in _POSTINGS_TERMS)}) "
            "GROUP BY term"
        ),
        # replays _q_customer_order_counts: LEFT JOIN + zero fill
        "customer_order_counts": (
            "SELECT c_custkey, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_orders "
            "FROM customer LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt "
            "FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey"
        ),
        # replays _q_distinct_users_by_type
        "distinct_users_by_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_distinct FROM events GROUP BY event_type"
        ),
        # replays _q_last_event_per_user: argmax by (ts, type, cents) DESC
        "last_event_per_user": (
            "WITH s AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
            "event_type DESC, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DESC) AS rn "
            "FROM events) "
            "SELECT user_id, ts_us, event_type, value_cents FROM s WHERE rn = 1"
        ),
        # replays _q_events_pivot_daily: same day floor + n_{type} names
        "events_pivot_daily": (
            "SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error, CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup, CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view "
            "FROM events GROUP BY 1"
        ),
        # replays _q_events_unpivot_daily: DuckDB UNPIVOT over the SAME
        # pivot subquery, n_ prefix stripped back to the event type
        "events_unpivot_daily": (
            "WITH p AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day, CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error, CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup, CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view "
            "FROM events GROUP BY 1) "
            "SELECT day, replace(et, 'n_', '') AS event_type, CAST(n AS BIGINT) AS n "
            "FROM p UNPIVOT (n FOR et IN (n_click, n_error, n_purchase, n_signup, n_view))"
        ),
        # replays _q_benford_first_digit: string-route first digit, exact
        # integer cents, floor-div ppm shares
        "benford_first_digit": (
            "WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) "
            "AS cents FROM orders), "
            "d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) "
            "AS digit FROM c WHERE cents > 0), "
            "a AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit) "
            "SELECT digit, n, CAST(n * 1000000 // (SELECT SUM(n) FROM a) AS BIGINT) "
            "AS share_ppm FROM a"
        ),
        # replays _q_zipf_bits_audit: identical ranking (n DESC, tk ASC),
        # floor(log2) via length(bin(n))-1, octave drop via lag()
        "zipf_bits_audit": (
            "WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS tk FROM documents), "
            "c AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tk), "
            "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tk ASC) AS rnk FROM c), "
            "p AS (SELECT rnk, n AS freq, CAST(length(bin(n)) - 1 AS BIGINT) AS freq_bits "
            "FROM r WHERE rnk IN (1,2,4,8,16,32,64,128,256,512,1024,2048,4096)) "
            "SELECT CAST(rnk AS BIGINT) AS rank, freq, freq_bits, "
            "CAST(COALESCE(lag(freq_bits) OVER (ORDER BY rnk) - freq_bits, 0) AS BIGINT) "
            "AS drop_bits FROM p"
        ),
        # replays _q_hapax_rate_by_source: per-source (token, n) counts,
        # vocab = distinct tokens, hapax = n==1 tokens, floor-div ppm
        "hapax_rate_by_source": (
            "WITH tok AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents), "
            "c AS (SELECT source, tk, COUNT(*) AS n FROM tok GROUP BY source, tk) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) "
            "AS hapax_ppm FROM c GROUP BY source"
        ),
        # replays _q_source_tv_distance: floor-div ppm per (source, token),
        # pair x token grid with two LEFT JOINs, SUM(ABS(diff)) // 2
        "source_tv_distance": (
            "WITH tok AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents), "
            "c AS (SELECT source, tk, COUNT(*) AS n FROM tok GROUP BY source, tk), "
            "t AS (SELECT source, SUM(n) AS total FROM c GROUP BY source), "
            "p AS (SELECT c.source, c.tk, CAST(c.n * 1000000 // t.total AS BIGINT) AS ppm "
            "FROM c JOIN t USING (source)), "
            "s AS (SELECT DISTINCT source FROM c), "
            "d AS (SELECT DISTINCT tk FROM c), "
            "grid AS (SELECT a.source AS sa, b.source AS sb, d.tk "
            "FROM s a JOIN s b ON a.source < b.source CROSS JOIN d), "
            "j AS (SELECT g.sa, g.sb, "
            "COALESCE(pa.ppm, 0) - COALESCE(pb.ppm, 0) AS diff FROM grid g "
            "LEFT JOIN p pa ON pa.source = g.sa AND pa.tk = g.tk "
            "LEFT JOIN p pb ON pb.source = g.sb AND pb.tk = g.tk) "
            "SELECT sa AS source_a, sb AS source_b, "
            "CAST(SUM(ABS(diff)) // 2 AS BIGINT) AS tv_ppm FROM j GROUP BY sa, sb"
        ),
        # replays _q_token_burstiness: cf = COUNT(*), df = COUNT(DISTINCT
        # doc) per token, top-k (cf DESC, tk ASC), milli floor-div
        "token_burstiness": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents), "
            "c AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS cf, "
            "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY tk), "
            "top AS (SELECT * FROM c ORDER BY cf DESC, tk ASC LIMIT 20) "
            "SELECT tk AS token, cf, df, CAST(cf * 1000 // df AS BIGINT) "
            "AS per_doc_milli FROM top"
        ),
        # replays _q_graph_reciprocity: shared edge CTEs, DISTINCT directed
        # edges, EXISTS probe for the reverse edge, floor-div ppm
        "graph_reciprocity": (
            f"WITH {_edges_ctes()}, "
            "e AS (SELECT DISTINCT src, dst FROM edges), "
            "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total, "
            "CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e x "
            "WHERE x.src = e.dst AND x.dst = e.src) THEN 1 ELSE 0 END) AS BIGINT) "
            "AS recip FROM e) "
            "SELECT total AS directed_edges, recip AS reciprocal_edges, "
            "CAST(CASE WHEN total = 0 THEN 0 ELSE recip * 1000000 // total END "
            "AS BIGINT) AS reciprocity_ppm FROM t"
        ),
        # replays _q_docs_rollup: ROLLUP levels with 'ALL' sentinels
        "docs_rollup": (
            "SELECT COALESCE(lang, 'ALL') AS lang, "
            "COALESCE(source, 'ALL') AS source, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            "GROUP BY ROLLUP(lang, source)"
        ),
        # replays _q_docs_cube: every grouping set with 'ALL' sentinels
        "docs_cube": (
            "SELECT COALESCE(lang, 'ALL') AS lang, "
            "COALESCE(source, 'ALL') AS source, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            "GROUP BY CUBE(lang, source)"
        ),
        # replays _q_dedup_keep_best: shared quality CTE, then per-content
        # argmax via the (quality DESC, doc_id ASC) window
        "dedup_keep_best": (
            f"WITH {_quality_ctes()}, "
            "q AS (SELECT r.doc_id, d.text, "
            f"{_QPPM_EXPR} AS quality_ppm "
            "FROM r JOIN documents d USING (doc_id)), "
            "w AS (SELECT doc_id, text, quality_ppm, "
            "row_number() OVER (PARTITION BY text "
            "ORDER BY quality_ppm DESC, doc_id) AS rn, "
            "COUNT(*) OVER (PARTITION BY text) AS n_copies FROM q) "
            "SELECT doc_id AS keeper_doc_id, quality_ppm, "
            "CAST(n_copies AS BIGINT) AS n_copies FROM w WHERE rn = 1"
        ),
        # replays _q_shipments_within_7d: LEFT range join, exact us bounds
        "shipments_within_7d": (
            "SELECT o_orderkey, CAST(COUNT(l.l_shipdate) AS BIGINT) AS n_shipped "
            "FROM orders o LEFT JOIN lineitem l "
            "ON l.l_shipdate >= o.o_orderdate "
            "AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
            "GROUP BY o_orderkey"
        ),
        # replays _q_cow_delete_counts: the complement of the deleted range
        "cow_delete_counts": (
            f"WITH {_RANGE_CTE} "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents, b WHERE doc_id < b.lo OR doc_id >= b.hi GROUP BY lang"
        ),
        "mor_delete_counts": (
            # same complement as the COW twin: MOR changes the WRITE
            # amplification, not the visible rows
            f"WITH {_RANGE_CTE} "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents, b WHERE doc_id < b.lo OR doc_id >= b.hi GROUP BY lang"
        ),
        "wap_publish_counts": (
            # the audited-and-published snapshot is exactly the in-range
            # slice: WAP changes WHO can observe the rows, not the rows
            f"WITH {_RANGE_CTE} "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents, b WHERE doc_id >= b.lo AND doc_id < b.hi GROUP BY lang"
        ),
        # replays _q_merge_upsert_counts: MERGE == target-minus-matched
        # UNION ALL updated UNION ALL inserted, then the lang aggregate
        "merge_upsert_counts": (
            f"WITH {_RANGE_CTE}, nn AS (SELECT COUNT(*) AS n FROM documents), "
            "upd AS (SELECT doc_id, 'xx' AS lang, n_chars + 1000 AS n_chars "
            "FROM documents, b WHERE doc_id >= b.lo AND doc_id < b.hi "
            "AND doc_id % 5 = 0), "
            "merged AS ("
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT doc_id FROM upd) "
            "UNION ALL SELECT doc_id, lang, n_chars FROM upd "
            "UNION ALL SELECT doc_id + nn.n AS doc_id, 'new' AS lang, n_chars "
            "FROM documents, nn WHERE doc_id % 97 = 0) "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM merged GROUP BY lang"
        ),
        # replays _q_change_feed_counts: the three mutation rules' key sets
        "change_feed_counts": (
            f"WITH {_RANGE_CTE} "
            "SELECT 'deleted' AS change, CAST(COUNT(*) AS BIGINT) AS n_keys "
            "FROM documents, b "
            "WHERE doc_id >= b.hi AND doc_id < b.hi + (b.hi - b.lo) // 2 "
            "UNION ALL SELECT 'inserted', CAST(COUNT(*) AS BIGINT) "
            "FROM documents WHERE doc_id % 97 = 0 "
            "UNION ALL SELECT 'updated', CAST(COUNT(*) AS BIGINT) "
            "FROM documents, b "
            "WHERE doc_id >= b.lo AND doc_id < b.hi AND doc_id % 5 = 0"
        ),
        # replays _q_percent_rank_by_lang: RANK tie-min + integer ppm scale
        "percent_rank_by_lang": (
            "WITH s AS (SELECT doc_id, lang, "
            "RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
            "COUNT(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT doc_id, lang, CAST(CASE WHEN n = 1 THEN 0 "
            "ELSE (rn - 1) * 1000000 // (n - 1) END AS BIGINT) AS rank_ppm FROM s"
        ),
        "quantize_embeddings": (
            "WITH s AS (SELECT vec_id, embedding, CASE WHEN "
            "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0 THEN "
            "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 "
            "ELSE 1.0 END AS scale FROM embeddings), "
            "q AS (SELECT vec_id, list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS qv FROM s) "
            "SELECT vec_id, CAST(list_sum(qv) AS BIGINT) AS q_sum, "
            "CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1, "
            "CAST(list_max(qv) AS BIGINT) AS q_max FROM q"
        ),
        "ann_topk": _ANN_TOPK_SQL,
        # same exact brute-force oracle: IVF probing achieves exact recall on
        # this dataset (pytest-held recall test; see _q_ivf_topk docstring)
        "ivf_topk": _ANN_TOPK_SQL,
        # same exhaustive-probe construction through the PERSISTED index
        "ivf_indexed_topk": _ANN_TOPK_SQL,
        "kmeans_clusters": _kmeans_sql(k=8, iters=3, scale=1000),
        "semdedup_keepers": _semdedup_sql(k=8, iters=3, scale=1000, threshold=0.4),
        "pagerank_top": _pagerank_sql(iters=4, damping_pct=85, topn=20),
        "ppr_top": _ppr_sql(iters=4, damping_pct=85, topn=20),
        "nb_source_classifier": _nb_source_classifier_sql(),
        "quality_neardup_auc": _quality_neardup_auc_sql(),
        "texttiling_boundaries": _TEXTTILING_SQL,
        "filter_impact_audit": _filter_impact_sql(),
        "binary_hamming_topk": _BINARY_HAMMING_SQL,
        "soft_dedup_weights": (
            "WITH c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY text) "
            "SELECT d.doc_id, c.n AS cluster_size, CAST(1000000 // c.n AS BIGINT) AS weight_ppm "
            "FROM documents d JOIN c ON c.text = d.text ORDER BY d.doc_id"
        ),
        "ccnet_bucket_counts": _CCNET_BUCKET_SQL,
        "bfs_levels": _bfs_levels_sql(max_rounds=8),
        "anf_effective_diameter": _anf_sql(),
        "rnn_pairs": _RNN_PAIRS_SQL,
        "kmeans_inertia": _kmeans_inertia_sql(k=8, iters=3),
        "cluster_balanced_sample": _cluster_balanced_sample_sql(),
        "hybrid_topk": _hybrid_sql(k=10, rrf_k=60),
        "triangle_count": _triangle_sql(),
        "lpa_communities": _lpa_sql(rounds=4),
        "hits_scores": _hits_sql(rounds=3),
        "kcore_nodes": _kcore_sql(k=2, rounds=4),
        "local_clustering_topk": (
            # replay of analytics.local_clustering_topk: distinct
            # undirected edges, apex-carrying wedge probe, 3-way triangle
            # credit, degree over the symmetrized list, exact truncating
            # ppm, (lcc DESC, doc_id) top-20
            f"WITH {_edges_ctes()}, "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
            "GREATEST(src, dst) AS b FROM edges), "
            "wed AS (SELECT e1.a AS a, e1.b AS b1, e2.b AS b2 FROM und e1 "
            "JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b), "
            "tri AS (SELECT w.a, w.b1, w.b2 FROM wed w "
            "JOIN und u ON u.a = w.b1 AND u.b = w.b2), "
            "tv AS (SELECT a AS v FROM tri UNION ALL SELECT b1 FROM tri "
            "UNION ALL SELECT b2 FROM tri), "
            "tc AS (SELECT v, COUNT(*) AS n_tri FROM tv GROUP BY 1), "
            "sym AS (SELECT a AS node, b AS nbr FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "dg AS (SELECT node, COUNT(*) AS deg FROM sym GROUP BY 1), "
            "x AS (SELECT dg.node AS doc_id, dg.deg, "
            "COALESCE(tc.n_tri, 0) AS n_tri FROM dg "
            "LEFT JOIN tc ON tc.v = dg.node WHERE dg.deg >= 2) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(deg AS BIGINT) AS deg, CAST(n_tri AS BIGINT) AS n_tri, "
            "CAST((2 * n_tri * 1000000) // (deg * (deg - 1)) AS BIGINT) "
            "AS lcc_ppm FROM x "
            "QUALIFY row_number() OVER (ORDER BY lcc_ppm DESC, doc_id) <= 20"
        ),
        "degree_assortativity": (
            # replay of analytics.degree_assortativity: distinct undirected
            # edges, symmetrized votes, degree join both ends, HUGEINT
            # moments, sign-split truncating ppm
            f"WITH {_edges_ctes()}, "
            "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
            "GREATEST(src, dst) AS b FROM edges), "
            "sym AS (SELECT a AS node, b AS nbr FROM und "
            "UNION ALL SELECT b, a FROM und), "
            "dg AS (SELECT node, COUNT(*) AS deg FROM sym GROUP BY 1), "
            "ed AS (SELECT dx.deg AS x, dy.deg AS y FROM sym s "
            "JOIN dg dx ON dx.node = s.node JOIN dg dy ON dy.node = s.nbr), "
            "mo AS (SELECT COUNT(*) AS m, SUM(CAST(x AS HUGEINT)) AS sx, "
            "SUM(CAST(x AS HUGEINT) * x) AS sxx, "
            "SUM(CAST(x AS HUGEINT) * y) AS sxy FROM ed), "
            "nd AS (SELECT m, m * sxy - sx * sx AS num, "
            "m * sxx - sx * sx AS den FROM mo) "
            "SELECT CAST(m AS BIGINT) AS m_votes, "
            "CAST(CASE WHEN den = 0 THEN 0 WHEN num >= 0 THEN "
            "(num * 1000000) // den ELSE -(((-num) * 1000000) // den) END "
            "AS BIGINT) AS r_ppm FROM nd"
        ),
        "in_degree_histogram": (
            # replay of analytics.in_degree_histogram: shared edge CTEs,
            # multi-edges counted, LEFT JOIN puts never-cited nodes at 0
            f"WITH {_edges_ctes()}, "
            "ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_degree "
            "FROM edges GROUP BY dst), "
            "alln AS (SELECT COALESCE(i.in_degree, 0) AS in_degree "
            "FROM documents d LEFT JOIN ind i ON i.dst = d.doc_id) "
            "SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_nodes "
            "FROM alln GROUP BY in_degree"
        ),
        "table_checksum": (
            # replay of analytics.table_checksum: identical chr(31)-joined
            # CAST serialization (NULL -> chr(0)), md5-prefix UBIGINT row
            # hash, commutative wrap-sum mod 2^64 via HUGEINT
            "WITH s AS (SELECT "
            "COALESCE(CAST(doc_id AS VARCHAR), chr(0)) || chr(31) || "
            "COALESCE(text, chr(0)) || chr(31) || "
            "COALESCE(lang, chr(0)) || chr(31) || "
            "COALESCE(source, chr(0)) || chr(31) || "
            "COALESCE(CAST(n_chars AS VARCHAR), chr(0)) AS row_s "
            "FROM documents), "
            f"h AS (SELECT {_MD5U64.format(v='row_s')} AS h64 FROM s) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(CAST(SUM(CAST(h64 AS HUGEINT)) % 18446744073709551616 "
            "AS UBIGINT) AS VARCHAR) AS checksum FROM h"
        ),
        "phrase_doc_counts": (
            # replay of analytics.phrase_doc_counts: same '[a-z0-9]+'
            # lowered tokenization, shifted-index bigram containment
            "WITH t AS (SELECT lang, regexp_extract_all(lower(text), "
            "'[a-z0-9]+') AS toks FROM documents) "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM t "
            "WHERE len(toks) >= 2 AND len(list_filter(range(1, len(toks)), "
            "i -> toks[i] = 'order' AND toks[i+1] = 'fast')) > 0 "
            "GROUP BY lang"
        ),
        "dup_shingle_rate": _DUP_SHINGLE_SQL,
        "doc_boilerplate": _DOC_BOILERPLATE_SQL,
        "dup_spans": _DUP_SPANS_SQL,
        "ks_priority_drift": _KS_PRIORITY_SQL,
        "sampled_quantile_audit": _SAMPLED_QUANTILE_SQL,
        "revenue_time_rollup": (
            # replay of analytics.revenue_time_rollup: GROUPING SETS with
            # GROUPING() mapped to the engine's -1 sentinel and level tag
            "WITH v AS (SELECT year(o_orderdate) AS y, "
            "quarter(o_orderdate) AS q, month(o_orderdate) AS m, "
            "CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c FROM orders) "
            "SELECT CASE WHEN GROUPING(m) = 0 THEN 'month' "
            "WHEN GROUPING(q) = 0 THEN 'quarter' ELSE 'year' END AS level, "
            "CAST(y AS BIGINT) AS y, "
            "CAST(CASE WHEN GROUPING(q) = 0 THEN q ELSE -1 END AS BIGINT) AS q, "
            "CAST(CASE WHEN GROUPING(m) = 0 THEN m ELSE -1 END AS BIGINT) AS m, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(c) AS BIGINT) AS revenue_cents "
            "FROM v GROUP BY GROUPING SETS ((y), (y, q), (y, q, m))"
        ),
        "two_hop_reach": (
            # replay of analytics.two_hop_reach over the shared edge CTE:
            # distinct edges, top-20 by (in_deg DESC, dst), double join +
            # COUNT DISTINCT, COALESCE 0 for citer-less citers
            f"WITH {_edges_ctes()}, "
            "de AS (SELECT DISTINCT src, dst FROM edges), "
            "ind AS (SELECT dst, COUNT(*) AS in_deg FROM de GROUP BY dst), "
            "seeds AS (SELECT dst AS seed, in_deg FROM ind "
            "ORDER BY in_deg DESC, dst LIMIT 20), "
            "r2 AS (SELECT s.seed, COUNT(DISTINCT e2.src) AS reach2 "
            "FROM seeds s JOIN de e1 ON e1.dst = s.seed "
            "JOIN de e2 ON e2.dst = e1.src GROUP BY s.seed) "
            "SELECT s.seed, CAST(s.in_deg AS BIGINT) AS in_deg, "
            "CAST(COALESCE(r2.reach2, 0) AS BIGINT) AS reach2 "
            "FROM seeds s LEFT JOIN r2 USING (seed)"
        ),
        "negative_samples": (
            # replay of analytics.negative_samples: md5-u64 big-endian
            # prefix % n_parts candidates, NOT EXISTS anti-join
            "WITH np AS (SELECT COUNT(*) AS n FROM part), "
            "inter AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey), "
            "cand AS (SELECT c_custkey AS c, "
            "unnest(generate_series(1, 8)) AS j FROM customer), "
            "cp AS (SELECT c, j, CAST(('0x' || substr(md5(CAST(c AS VARCHAR) "
            "|| ':' || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % "
            "(SELECT n FROM np) AS BIGINT) AS p FROM cand) "
            "SELECT c AS custkey, CAST(j AS BIGINT) AS neg_idx, p AS partkey "
            "FROM cp WHERE NOT EXISTS (SELECT 1 FROM inter "
            "WHERE inter.c = cp.c AND inter.p = cp.p)"
        ),
        "span_corruption_plan": (
            # replay of analytics.span_corruption_plan: nw = \S+ count,
            # nw//20 spans of 3, md5-u64 start % (nw-2) + 1
            "WITH d AS (SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS nw FROM documents), "
            "s AS (SELECT doc_id, nw, "
            "unnest(generate_series(1, nw // 20)) AS i FROM d "
            "WHERE nw // 20 >= 1 AND nw >= 3) "
            "SELECT doc_id, CAST(i AS BIGINT) AS span_idx, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
            "CAST(i AS VARCHAR)), 1, 16))::UBIGINT % (nw - 2) AS BIGINT) + 1 "
            "AS start_tok, CAST(3 AS BIGINT) AS span_len FROM s"
        ),
        "doc_bigram_surprisal_topk": (
            # replay of analytics.doc_bigram_surprisal_topk: token pairs
            # via lead window over the shared [a-z0-9]+ tokenization,
            # whole-bit surprisal via length(bin(N//c))-1
            "WITH t AS (SELECT doc_id, lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok, "
            "unnest(generate_series(1, len(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')))) AS i FROM documents), "
            "pairs AS (SELECT doc_id, lang, tok || ' ' || "
            "lead(tok, 1) OVER win AS bg FROM t "
            "WINDOW win AS (PARTITION BY doc_id ORDER BY i) "
            "QUALIFY lead(tok, 1) OVER win IS NOT NULL), "
            "c AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY bg), "
            "nn AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM c), "
            "b AS (SELECT bg, CAST(length(bin((SELECT ntot FROM nn) // n)) - 1 "
            "AS BIGINT) AS bits FROM c), "
            "d AS (SELECT p.doc_id, any_value(p.lang) AS lang, "
            "CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
            "CAST(SUM(b.bits) AS BIGINT) AS total_bits "
            "FROM pairs p JOIN b USING (bg) GROUP BY p.doc_id) "
            "SELECT doc_id, lang, n_bigrams, total_bits, "
            "CAST(total_bits * 1000 // n_bigrams AS BIGINT) AS mean_millibits "
            "FROM d ORDER BY mean_millibits DESC, doc_id ASC LIMIT 50"
        ),
        "first_event_after_order": (
            # replay of relational.first_event_after_order: forward as-of =
            # MIN(e.ts) over the strictly-after join, day-derived outputs
            "WITH j AS (SELECT o.o_orderkey AS k, o.o_orderdate AS od, "
            "MIN(e.ts) AS nts FROM orders o JOIN events e "
            "ON e.user_id = o.o_custkey AND e.ts > o.o_orderdate "
            "GROUP BY 1, 2) "
            "SELECT k AS o_orderkey, "
            "strftime(date_trunc('day', nts), '%Y-%m-%d') AS next_event_day, "
            "CAST(date_diff('day', date_trunc('day', od), "
            "date_trunc('day', nts)) AS BIGINT) AS gap_days FROM j"
        ),
        "dow_revenue_profile": (
            "WITH a AS (SELECT isodow(o_orderdate) AS isodow, "
            "COUNT(*) AS n_orders, "
            "SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS rev "
            "FROM orders GROUP BY 1), "
            "t AS (SELECT SUM(rev) AS tot FROM a) "
            "SELECT CAST(isodow AS BIGINT) AS isodow, "
            "CAST(n_orders AS BIGINT) AS n_orders, "
            "CAST(rev AS BIGINT) AS revenue_cents, "
            "CAST(rev * 1000000 // t.tot AS BIGINT) AS share_ppm FROM a, t"
        ),
        "completeness_audit": (
            "WITH a AS ("
            "SELECT 'text' AS col, COUNT(*) AS nr, "
            "COUNT(*) - COUNT(text) AS nn, "
            "COUNT(*) FILTER (text = '') AS ne FROM documents "
            "UNION ALL SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), "
            "COUNT(*) FILTER (lang = '') FROM documents "
            "UNION ALL SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), "
            "COUNT(*) FILTER (source = '') FROM documents) "
            "SELECT col AS \"column\", CAST(nr AS BIGINT) AS n_rows, "
            "CAST(nn AS BIGINT) AS n_null, CAST(ne AS BIGINT) AS n_empty, "
            "CAST((nn + ne) * 1000000 // nr AS BIGINT) AS missing_ppm FROM a"
        ),
        "order_backlog_daily": (
            # replay of analytics.order_backlog_daily: per-order MAX ship,
            # inner join, +1 on order day / -1 the day after last shipment,
            # running sum over the change-day grid
            "WITH ls AS (SELECT l_orderkey AS k, MAX(l_shipdate) AS last_ship "
            "FROM lineitem GROUP BY 1), "
            "j AS (SELECT o.o_orderdate AS od, ls.last_ship FROM orders o "
            "JOIN ls ON ls.k = o.o_orderkey), "
            "d AS (SELECT strftime(date_trunc('day', od), '%Y-%m-%d') AS day, "
            "1 AS delta FROM j "
            "UNION ALL SELECT strftime(date_trunc('day', last_ship) + "
            "INTERVAL 1 DAY, '%Y-%m-%d'), -1 FROM j), "
            "g AS (SELECT day, SUM(delta) AS net FROM d GROUP BY day) "
            "SELECT day, CAST(net AS BIGINT) AS net_delta, "
            "CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_orders FROM g"
        ),
        "doclen_deciles_by_source": (
            # replay of analytics.doclen_deciles_by_source: ROW_NUMBER per
            # source, integer rank (n-1)*k//10 + 1 (= quantile_disc)
            "WITH n AS (SELECT source, COUNT(*) AS n FROM documents "
            "GROUP BY source), "
            "r AS (SELECT source, n_chars, ROW_NUMBER() OVER "
            "(PARTITION BY source ORDER BY n_chars) AS rn FROM documents), "
            "q AS (SELECT unnest(generate_series(1, 9)) AS decile) "
            "SELECT r.source, CAST(q.decile AS BIGINT) AS decile, "
            "CAST(r.n_chars AS BIGINT) AS n_chars "
            "FROM q CROSS JOIN n JOIN r ON r.source = n.source "
            "AND r.rn = (n.n - 1) * q.decile // 10 + 1"
        ),
        "value_moments_by_type": (
            # replay of analytics.value_moments_by_type: HUGEINT power sums;
            # DuckDB // truncates toward zero, engine matches on the signed
            # third moment
            "WITH v AS (SELECT event_type, "
            "CAST(FLOOR(value*100 + 0.5) AS HUGEINT) AS c FROM events), "
            "a AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, "
            "SUM(c*c) AS s2, SUM(c*c*c) AS s3 FROM v GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(s1 // n AS BIGINT) AS mean_cents, "
            "CAST((n*s2 - s1*s1) // (n*n) AS BIGINT) AS var_cents2, "
            "CAST((n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1) // (n*n*n) AS BIGINT) "
            "AS m3_cents3 FROM a"
        ),
        "key_density_audit": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct, "
            "CAST(MIN(o_orderkey) AS BIGINT) AS min_key, "
            "CAST(MAX(o_orderkey) AS BIGINT) AS max_key, "
            "CAST(COUNT(DISTINCT o_orderkey) * 1000000 // "
            "(MAX(o_orderkey) - MIN(o_orderkey) + 1) AS BIGINT) AS density_ppm, "
            "CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_rows "
            "FROM orders"
        ),
        "rolling_median_daily": (
            # replay of analytics.rolling_median_daily: windowed
            # quantile_disc(0.5) over 7 ROWS = lower median rank (w+1)//2
            "WITH d AS (SELECT strftime(date_trunc('day', o_orderdate), "
            "'%Y-%m-%d') AS day, "
            "SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS v "
            "FROM orders GROUP BY 1) "
            "SELECT day, CAST(v AS BIGINT) AS value_cents, "
            "CAST(quantile_disc(v, 0.5) OVER (ORDER BY day "
            "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS med7_cents "
            "FROM d"
        ),
        "bigram_surprisal_by_source": (
            # replay of analytics.bigram_surprisal_by_source: chars via
            # (?s)-dotall extraction, adjacent pairs via a lead window,
            # whole-bit surprisal via the length(bin(m//n))-1 identity
            "WITH ch AS (SELECT doc_id, source, "
            "unnest(regexp_extract_all(text, '(?s).')) AS c, "
            "unnest(generate_series(1, length(text))) AS i "
            "FROM documents WHERE length(text) >= 2), "
            "g AS (SELECT source, c AS c1, c || lead(c, 1) OVER win AS bg "
            "FROM ch WINDOW win AS (PARTITION BY doc_id ORDER BY i) "
            "QUALIFY lead(c, 1) OVER win IS NOT NULL), "
            "n12 AS (SELECT source, c1, bg, COUNT(*) AS n FROM g GROUP BY 1, 2, 3), "
            "n1 AS (SELECT source, c1, SUM(n) AS m FROM n12 GROUP BY 1, 2), "
            "b AS (SELECT n12.source, n12.n, "
            "CAST(length(bin(n1.m // n12.n)) - 1 AS BIGINT) AS bits "
            "FROM n12 JOIN n1 ON n12.source = n1.source AND n12.c1 = n1.c1), "
            "a AS (SELECT source, SUM(n) AS nb, SUM(n * bits) AS tb "
            "FROM b GROUP BY source) "
            "SELECT source, CAST(nb AS BIGINT) AS n_bigrams, "
            "CAST(tb AS BIGINT) AS total_bits, "
            "CAST(tb * 1000 // nb AS BIGINT) AS mean_millibits FROM a"
        ),
        "cusum_changepoints": (
            # replay of analytics.cusum_changepoints: recursive CTE walks
            # s_d = max(0, s + x - mu - mu//20) over ROW_NUMBER'd days
            "WITH RECURSIVE d AS (SELECT strftime(date_trunc('day', ts), "
            "'%Y-%m-%d') AS day, SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) "
            "AS v FROM events GROUP BY 1), "
            "o AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d), "
            "p AS (SELECT SUM(v) // COUNT(*) AS mu FROM d), "
            "c AS (SELECT o.rn, o.day, o.v, GREATEST(0, o.v - p.mu - p.mu // 20) "
            "AS s FROM o, p WHERE o.rn = 1 "
            "UNION ALL SELECT o.rn, o.day, o.v, "
            "GREATEST(0, c.s + o.v - p.mu - p.mu // 20) "
            "FROM c JOIN o ON o.rn = c.rn + 1, p) "
            "SELECT day, CAST(v AS BIGINT) AS value_cents, "
            "CAST(s AS BIGINT) AS cusum_cents, "
            "CAST(CASE WHEN s > (SELECT mu FROM p) THEN 1 ELSE 0 END AS BIGINT) "
            "AS flagged FROM c"
        ),
        "shingle_containment": (
            # replay of analytics.shingle_containment: distinct (source, s)
            # over the shared shingle CTE; self-join diagonal = |S_a|
            f"WITH {_SHINGLE_CTES}, "
            "ss AS (SELECT DISTINCT d.source, sh.s FROM sh "
            "JOIN documents d USING (doc_id)), "
            "pr AS (SELECT a.source AS source_a, b.source AS source_b, "
            "COUNT(*) AS n FROM ss a JOIN ss b ON a.s = b.s GROUP BY 1, 2) "
            "SELECT p.source_a, p.source_b, CAST(sz.n AS BIGINT) AS n_a, "
            "CAST(p.n AS BIGINT) AS n_inter, "
            "CAST(p.n * 1000000 // sz.n AS BIGINT) AS containment_ppm "
            "FROM pr p JOIN pr sz ON sz.source_a = p.source_a "
            "AND sz.source_b = p.source_a WHERE p.source_a <> p.source_b"
        ),
        "compaction_bins": (
            # replay of analytics.compaction_bins: exclusive window
            # prefix-sum over (rows DESC, key) order, floor-div capacity 100
            "WITH p AS (SELECT source, lang, COUNT(*) AS n_rows "
            "FROM documents GROUP BY 1, 2), "
            "w AS (SELECT source, lang, n_rows, "
            "COALESCE(SUM(n_rows) OVER (ORDER BY n_rows DESC, source, lang "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bf FROM p) "
            "SELECT source, lang, CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(bf // 100 AS BIGINT) AS bin FROM w"
        ),
        "token_diversity_by_lang": _TOKEN_DIVERSITY_SQL,
        "doc_surprisal_topk": _DOC_SURPRISAL_SQL,
        "sentence_stats_by_lang": _SENTENCE_STATS_SQL,
        "readability_by_lang": (
            # replay of analytics.readability_by_lang: shared regex counts
            # on lower(text), per-term floor-div FK milli grade
            "WITH s AS (SELECT lang, "
            "len(regexp_extract_all(lower(text), '[.!?]+')) AS ns, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw, "
            "len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy "
            "FROM documents), "
            "a AS (SELECT lang, COUNT(*) AS n_docs, SUM(nw) AS n_words, "
            "SUM(ns) AS n_sentences, SUM(sy) AS n_syllables FROM s "
            "GROUP BY lang) "
            "SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(n_words AS BIGINT) AS n_words, "
            "CAST(n_sentences AS BIGINT) AS n_sentences, "
            "CAST(n_syllables AS BIGINT) AS n_syllables, "
            "CAST(390 * n_words // GREATEST(n_sentences, 1) "
            "+ 11800 * n_syllables // GREATEST(n_words, 1) - 15590 "
            "AS BIGINT) AS fk_grade_milli FROM a"
        ),
        "top_revenue_suppliers": (
            # replay of relational.top_revenue_suppliers (Q15 shape): same
            # per-row FLOOR(price*(1-disc)*100+0.5) cents as the join family
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) "
            "AS rev FROM lineitem GROUP BY l_suppkey), "
            "m AS (SELECT MAX(rev) AS mx FROM r) "
            "SELECT s.s_suppkey, s.s_name, CAST(r.rev AS BIGINT) AS revenue_cents "
            "FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey, m "
            "WHERE r.rev = m.mx"
        ),
        "big_volume_orders": (
            # replay of relational.big_volume_orders (Q18 shape): the
            # HAVING boundary compares integer quantity cents exactly
            "WITH q AS (SELECT l_orderkey, "
            "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS tq "
            "FROM lineitem GROUP BY l_orderkey) "
            "SELECT o.o_orderkey, CAST(q.tq AS BIGINT) AS total_qty_cents, "
            "CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS price_cents "
            "FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey "
            "WHERE q.tq > 15000"
        ),
        "trimmed_mean_price": (
            # replay of relational.trimmed_mean_by_group: trimming k rows
            # per side depends only on the value multiset, so any
            # row_number tie order yields the same sum
            "WITH o AS (SELECT o_orderpriority, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders), "
            "r AS (SELECT o_orderpriority, cents, row_number() OVER "
            "(PARTITION BY o_orderpriority ORDER BY cents) AS rn, "
            "COUNT(*) OVER (PARTITION BY o_orderpriority) AS n FROM o), "
            "t AS (SELECT o_orderpriority, cents FROM r "
            "WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100) "
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_used, "
            "CAST(SUM(cents) AS BIGINT) AS trimmed_sum_cents, "
            "CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents "
            "FROM t GROUP BY o_orderpriority"
        ),
        "session_paths": (
            # replay of relational.session_paths: the same 30-min gap break
            # as session_windows, with the (ts, event_id) tie order the
            # trigram content requires
            "WITH d AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > "
            "INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM d), "
            "t AS (SELECT event_type AS e1, lead(event_type, 1) OVER w2 AS e2, "
            "lead(event_type, 2) OVER w2 AS e3 FROM s "
            "WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)) "
            "SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths FROM t "
            "WHERE e3 IS NOT NULL GROUP BY 1, 2, 3"
        ),
        "oov_rate_by_lang": (
            # replay of analytics.oov_rate_by_lang: identical vocabulary
            # selection (count DESC, token ASC LIMIT 512) and floor-div ppm
            "WITH t AS (SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS tok FROM documents), "
            "c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok), "
            "v AS (SELECT tok FROM c ORDER BY n DESC, tok ASC LIMIT 512), "
            "s AS (SELECT lang, COUNT(*) AS n_tokens, "
            "SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS n_oov "
            "FROM t GROUP BY lang) "
            "SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(n_oov AS BIGINT) AS n_oov, "
            "CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm FROM s"
        ),
        "decayed_user_value": (
            "WITH mx AS (SELECT epoch_us(max(ts)) AS m FROM events), "
            "e AS (SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents, "
            "((SELECT m FROM mx) - epoch_us(ts)) // 86400000000 AS age_days FROM events) "
            "SELECT user_id, "
            "CAST(SUM(cents >> CAST(LEAST(age_days // 7, 62) AS INTEGER)) AS BIGINT) "
            "AS decayed_cents, CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM e GROUP BY user_id"
        ),
        "skyline_orders": _SKYLINE_ORDERS_SQL,
        "mode_event_type": _MODE_EVENT_TYPE_SQL,
        "fk_orphan_audit": _FK_ORPHAN_AUDIT_SQL,
        "longest_streak": _LONGEST_STREAK_SQL,
        "user_active_coverage": _USER_ACTIVE_COVERAGE_SQL,
        "peak_concurrent_sessions": _PEAK_CONCURRENT_SQL,
        "basket_pairs": _BASKET_PAIRS_SQL,
        "basket_lift": _BASKET_LIFT_SQL,
        "corr_qty_price": _CORR_QTY_PRICE_SQL,
        "forward_fill_daily": _FORWARD_FILL_DAILY_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "scd2_history": _SCD2_HISTORY_SQL,
        "order_part_list": _ORDER_PART_LIST_SQL,
        "rolling_7d_sum": _ROLLING_7D_SUM_SQL,
        "conversion_within": _CONVERSION_WITHIN_SQL,
        "rolling_active_users": _ROLLING_ACTIVE_USERS_SQL,
        "pit_value_join": _PIT_VALUE_JOIN_SQL,
        "order_decile_stats": _ORDER_DECILE_STATS_SQL,
        "order_value_gini": _ORDER_VALUE_GINI_SQL,
        "weekly_revenue_wow": _WEEKLY_REVENUE_WOW_SQL,
        "fulfillment_latency": _FULFILLMENT_LATENCY_SQL,
        "session_durations": (
            # replay of relational.session_duration_quantiles: the
            # session_windows break rule, MIN/MAX per session, whole-second
            # floor-div, cumulative-count quantile read
            "WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM d), "
            "per AS (SELECT user_id, sid, "
            "(epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur "
            "FROM s GROUP BY 1, 2), "
            "c AS (SELECT dur, COUNT(*) AS n FROM per GROUP BY 1), "
            "w2 AS (SELECT dur, SUM(n) OVER (ORDER BY dur) AS cum, "
            "SUM(n) OVER () AS tot FROM c) "
            "SELECT CAST(MAX(tot) AS BIGINT) AS n_sessions, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN dur END) AS BIGINT) AS p50_sec, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN dur END) AS BIGINT) AS p90_sec "
            "FROM w2"
        ),
        "trailing_rows_sum": (
            # replay of relational.trailing_rows_sum: ROWS frame, same
            # (ts, event_id) deterministic order, integer cents
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_cents "
            "FROM events"
        ),
        "small_qty_revenue": (
            # replay of relational.small_qty_revenue (Q17 shape): same
            # qty-cents chain and cross-multiplied 1/5-average compare
            "WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'), "
            "q AS (SELECT l_partkey, "
            "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS sum_q, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem JOIN bp ON p_partkey = l_partkey GROUP BY 1) "
            "SELECT CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT)), 0) "
            "AS BIGINT) AS revenue_cents, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM lineitem l JOIN q ON q.l_partkey = l.l_partkey "
            "WHERE CAST(FLOOR(l.l_quantity*100 + 0.5) AS BIGINT) * 5 * q.n < 1 * q.sum_q"
        ),
        "supplier_count_by_part": (
            # replay of relational.supplier_count_by_part_attrs (Q16 shape
            # over the observed lineitem relation)
            "WITH pf AS (SELECT p_partkey, p_brand, p_type, p_size FROM part "
            "WHERE p_brand <> 'Brand#13' AND p_size IN (1, 5, 10, 15, 20, 25)) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN pf ON p_partkey = l_partkey GROUP BY 1, 2, 3"
        ),
        "waiting_suppliers": (
            # replay of relational.waiting_suppliers (Q21 shape): same
            # 60-day lateness in epoch-us and exactly-one-late predicate
            "WITH l AS (SELECT l_orderkey, l_suppkey, "
            "MAX(epoch_us(l_shipdate)) AS ship_us FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS od_us FROM orders "
            "WHERE o_orderstatus = 'F'), "
            "m AS (SELECT l.l_orderkey, l.l_suppkey, "
            "(l.ship_us > o.od_us + 5184000000000) AS late "
            "FROM l JOIN o ON o.o_orderkey = l.l_orderkey), "
            "st AS (SELECT l_orderkey, COUNT(*) AS n_supp, "
            "SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late FROM m GROUP BY 1), "
            "c AS (SELECT m.l_suppkey FROM m JOIN st USING (l_orderkey) "
            "WHERE m.late AND st.n_supp >= 2 AND st.n_late = 1) "
            "SELECT c.l_suppkey AS s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM c JOIN supplier s ON s.s_suppkey = c.l_suppkey GROUP BY 1, 2"
        ),
        "product_profit": (
            # replay of relational.product_profit (Q9 shape): same integer
            # profit chain, 10% retail unit cost, order-year key
            "WITH pf AS (SELECT p_partkey, "
            "CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS retail "
            "FROM part WHERE p_type = 'ECONOMY'), "
            "l AS (SELECT l_orderkey, s_nationkey AS nat, "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) "
            "- (CAST(FLOOR(l_quantity + 0.5) AS BIGINT) * retail * 10) // 100 AS profit "
            "FROM lineitem JOIN pf ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey) "
            "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "CAST(SUM(profit) AS BIGINT) AS profit_cents "
            "FROM l JOIN orders ON o_orderkey = l_orderkey "
            "JOIN nation ON n_nationkey = nat GROUP BY 1, 2"
        ),
        "order_priority_check": (
            # replay of relational.order_priority_check (Q4 shape): same
            # quarter window, 30-day lateness in epoch-us, EXISTS-as-max
            "WITH o AS (SELECT o_orderkey, o_orderpriority, "
            "epoch_us(o_orderdate) AS od FROM orders "
            "WHERE o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1996-04-01'), "
            "l AS (SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS mx "
            "FROM lineitem GROUP BY 1) "
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
            "FROM o JOIN l ON l.l_orderkey = o.o_orderkey "
            "WHERE l.mx > o.od + 2592000000000 GROUP BY 1"
        ),
        "line_priority_counts": (
            # replay of relational.line_priority_counts (Q12 shape): same
            # ship-year window and high-priority class set
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_count "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1997-01-01' GROUP BY 1"
        ),
        "customer_order_distribution": (
            # replay of relational.customer_order_distribution (Q13 shape):
            # LEFT JOIN zero bin, same priority exclusion
            "WITH o AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c_count "
            "FROM orders WHERE o_orderpriority <> '5-LOW' GROUP BY 1) "
            "SELECT COALESCE(o.c_count, 0) AS c_count, "
            "CAST(COUNT(*) AS BIGINT) AS custdist "
            "FROM customer LEFT JOIN o ON o.o_custkey = customer.c_custkey "
            "GROUP BY 1"
        ),
        "nation_trade_volume": (
            # replay of relational.nation_trade_volume (Q7 shape): same
            # ship-year window, cents chain, same-nation pairs dropped
            "WITH s AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE n_name IN ('NATION_1', 'NATION_2')), "
            "c AS (SELECT c_custkey, n_name AS cust_nation FROM customer "
            "JOIN nation ON n_nationkey = c_nationkey "
            "WHERE n_name IN ('NATION_1', 'NATION_2')), "
            "l AS (SELECT l_orderkey, l_suppkey, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01') "
            "SELECT s.supp_nation, c.cust_nation, l.l_year, "
            "CAST(SUM(l.rev) AS BIGINT) AS revenue_cents "
            "FROM l JOIN s ON s.s_suppkey = l.l_suppkey "
            "JOIN orders ON o_orderkey = l.l_orderkey "
            "JOIN c ON c.c_custkey = o_custkey "
            "WHERE s.supp_nation <> c.cust_nation GROUP BY 1, 2, 3"
        ),
        "market_share": (
            # replay of relational.market_share (Q8 shape): same PROMO /
            # ASIA / NATION_5 legs and integer-ppm share
            "WITH l AS (SELECT l_orderkey, "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev, "
            "CASE WHEN n_name = 'NATION_5' THEN "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) "
            "ELSE 0 END AS nat "
            "FROM lineitem JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO' "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey), "
            "o AS (SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y "
            "FROM orders JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'ASIA') "
            "SELECT o.y AS o_year, CAST(SUM(l.nat) AS BIGINT) AS nation_cents, "
            "CAST(SUM(l.rev) AS BIGINT) AS total_cents, "
            "CAST(SUM(l.nat) * 1000000 // GREATEST(SUM(l.rev), 1) AS BIGINT) AS share_ppm "
            "FROM l JOIN o ON o.o_orderkey = l.l_orderkey GROUP BY 1"
        ),
        "shipping_priority": (
            # replay of relational.shipping_priority (Q3 shape): identical
            # cents chain and (rev desc, date, orderkey) tie order
            "WITH rev AS (SELECT l_orderkey, "
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS r "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-30' GROUP BY 1), "
            "o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders "
            "JOIN customer ON c_custkey = o_custkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-30') "
            "SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, "
            "CAST(rev.r AS BIGINT) AS revenue_cents "
            "FROM o JOIN rev ON rev.l_orderkey = o.o_orderkey "
            "ORDER BY revenue_cents DESC, o.o_orderdate, o.o_orderkey LIMIT 10"
        ),
        "returned_items": (
            # replay of relational.returned_items_topk (Q10 shape): same
            # quarter window, returnflag filter, (rev desc, custkey) ties
            "WITH rev AS (SELECT l_orderkey, "
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS r "
            "FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1), "
            "o AS (SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-10-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01'), "
            "per AS (SELECT o.o_custkey AS c_custkey, SUM(rev.r) AS r "
            "FROM o JOIN rev ON rev.l_orderkey = o.o_orderkey GROUP BY 1) "
            "SELECT p.c_custkey, c.c_name, CAST(p.r AS BIGINT) AS revenue_cents "
            "FROM per p JOIN customer c ON c.c_custkey = p.c_custkey "
            "ORDER BY p.r DESC, p.c_custkey LIMIT 20"
        ),
        "forecast_revenue_delta": (
            # replay of relational.forecast_revenue_delta (Q6 shape):
            # integer-percent discount band, identical per-row cents chain
            "SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) "
            "AS BIGINT)), 0) AS BIGINT) AS revenue_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        "promo_revenue": (
            # replay of relational.promo_revenue (Q14 shape): same month
            # window, rev chain and integer-ppm share
            "WITH m AS (SELECT l_partkey, "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-09-01' "
            "AND l_shipdate < TIMESTAMP '1996-10-01'), "
            "j AS (SELECT rev, (p_type = 'PROMO') AS promo FROM m "
            "JOIN part ON p_partkey = l_partkey) "
            "SELECT CAST(COALESCE(SUM(CASE WHEN promo THEN rev END), 0) AS BIGINT) AS promo_cents, "
            "CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS total_cents, "
            "CAST(COALESCE(SUM(CASE WHEN promo THEN rev END), 0) * 1000000 // "
            "GREATEST(COALESCE(SUM(rev), 0), 1) AS BIGINT) AS promo_ppm FROM j"
        ),
        "disjunctive_revenue": (
            # replay of relational.disjunctive_revenue (Q19 shape): the
            # same three OR-ed (brand, size, qty) clauses
            "WITH j AS (SELECT l_quantity AS q, p_brand AS b, p_size AS s, "
            "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev "
            "FROM lineitem JOIN part ON p_partkey = l_partkey) "
            "SELECT CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS revenue_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows FROM j WHERE "
            "(b = 'Brand#13' AND s BETWEEN 1 AND 5 AND q BETWEEN 1 AND 11) OR "
            "(b = 'Brand#20' AND s BETWEEN 1 AND 10 AND q BETWEEN 10 AND 20) OR "
            "(b = 'Brand#9' AND s BETWEEN 1 AND 15 AND q BETWEEN 20 AND 30)"
        ),
        "source_vocab_overlap": (
            # replay of analytics.source_vocab_overlap: distinct token-md5
            # per source, equi-join intersections, exact Jaccard ppm
            "WITH tokexp AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents), "
            f"tok AS (SELECT DISTINCT source, {_MD5U64.format(v='tk')} AS h FROM tokexp), "
            "sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
            "inter AS (SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_common FROM tok a "
            "JOIN tok b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2) "
            "SELECT i.source_a, i.source_b, i.n_common, "
            "CAST(CAST(i.n_common AS HUGEINT) * 1000000 // "
            "(sa.n + sb.n - i.n_common) AS BIGINT) AS jaccard_ppm "
            "FROM inter i JOIN sz sa ON sa.source = i.source_a "
            "JOIN sz sb ON sb.source = i.source_b"
        ),
        "dominant_suppliers": (
            # replay of relational.dominant_suppliers (Q20 flavor): both
            # levels + the 100*q > pct*t strict compare
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS q "
            "FROM lineitem GROUP BY 1, 2), "
            "tot AS (SELECT l_partkey, SUM(q) AS t FROM ps GROUP BY 1), "
            "dom AS (SELECT ps.l_suppkey FROM ps JOIN tot USING (l_partkey) "
            "WHERE 100 * ps.q > 15 * tot.t) "
            "SELECT d.l_suppkey AS s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS n_dominated_parts "
            "FROM dom d JOIN supplier s ON s.s_suppkey = d.l_suppkey GROUP BY 1, 2"
        ),
        "out_of_order_audit": (
            # replay of relational.out_of_order_audit: LAG in event_id
            # order per user, strict time regressions only
            "WITH d AS (SELECT user_id, ts, LAG(ts) OVER "
            "(PARTITION BY user_id ORDER BY event_id) AS prev FROM events), "
            "p AS (SELECT epoch_us(prev) - epoch_us(ts) AS late FROM d "
            "WHERE prev IS NOT NULL) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, "
            "CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions, "
            "CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) * 1000000 // "
            "GREATEST(COUNT(*), 1) AS BIGINT) AS inv_ppm, "
            "CAST(COALESCE(MAX(CASE WHEN late > 0 THEN late END), 0) AS BIGINT) AS max_late_us "
            "FROM p"
        ),
        "normalized_dedup": (
            # replay of analytics.normalized_dedup_stats: identical
            # lower -> punct-strip -> ws-collapse -> trim chain (patterns
            # shared char-for-char) and the md5-u64 hash grouping
            "WITH nrm AS (SELECT trim(regexp_replace(regexp_replace(lower(text), "
            f"'{_TS_PUNCT}', '', 'g'), '{_TS_WS}', ' ', 'g')) AS t FROM documents), "
            f"hh AS (SELECT {_MD5U64.format(v='t')} AS h FROM nrm), "
            "g AS (SELECT h, COUNT(*) AS c FROM hh GROUP BY 1) "
            "SELECT CAST(SUM(c) AS BIGINT) AS n_docs, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
            "CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs, "
            "CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups "
            "FROM g"
        ),
        "cheapest_supplier": (
            # replay of relational.cheapest_supplier_per_part (Q2 shape):
            # identical float64 unit-price chain, (unit, suppkey) tie order
            "WITH pf AS (SELECT p_partkey FROM part WHERE p_size = 10), "
            "u AS (SELECT l_partkey, l_suppkey, "
            "MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS unit_cents "
            "FROM lineitem JOIN pf ON p_partkey = l_partkey GROUP BY 1, 2), "
            "sel AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, unit_cents, "
            "ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY unit_cents, l_suppkey) AS rn "
            "FROM u) "
            "SELECT s.p_partkey, s.s_suppkey, sup.s_name, s.unit_cents "
            "FROM sel s JOIN supplier sup ON sup.s_suppkey = s.s_suppkey WHERE rn = 1"
        ),
        "lang_source_chi2": (
            # replay of analytics.categorical_independence_chi2: per-cell
            # floored HUGEINT terms over the FULL cross product
            "WITH o AS (SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS o "
            "FROM documents GROUP BY 1, 2), "
            "l AS (SELECT lang, CAST(COUNT(*) AS HUGEINT) AS r FROM documents GROUP BY 1), "
            "s AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS c FROM documents GROUP BY 1), "
            "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents), "
            "cells AS (SELECT l.lang, s.source, l.r, s.c, COALESCE(o.o, 0) AS o "
            "FROM l CROSS JOIN s LEFT JOIN o ON o.lang = l.lang AND o.source = s.source) "
            "SELECT CAST(MAX(n) AS BIGINT) AS n_rows, "
            "CAST((SELECT COUNT(*) FROM l) AS BIGINT) AS n_a, "
            "CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_b, "
            "CAST(((SELECT COUNT(*) FROM l) - 1) * ((SELECT COUNT(*) FROM s) - 1) AS BIGINT) AS dof, "
            "CAST(SUM(((n*o - r*c)*(n*o - r*c) * 1000000) // (n*r*c)) AS BIGINT) AS chi2_ppm "
            "FROM cells, nn"
        ),
        "shuffle_mix_audit": (
            # replay of analytics.shuffle_mix_audit: the epoch_shuffle md5
            # rank, LAG adjacency, exact exchangeability expectation
            "WITH p AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY "
            + _MD5U64.format(v="'epoch0:' || CAST(doc_id AS VARCHAR)")
            + ", doc_id) - 1 AS BIGINT) AS pos FROM documents), "
            "j AS (SELECT p.pos, d.source FROM p JOIN documents d USING (doc_id)), "
            "adj AS (SELECT source, LAG(source) OVER (ORDER BY pos) AS prev FROM j), "
            "obs AS (SELECT CAST(SUM(CASE WHEN source = prev THEN 1 ELSE 0 END) "
            "AS HUGEINT) AS same FROM adj), "
            "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents), "
            "cs AS (SELECT SUM(CAST(c AS HUGEINT) * (CAST(c AS HUGEINT) - 1)) AS num "
            "FROM (SELECT COUNT(*) AS c FROM documents GROUP BY source)) "
            "SELECT CAST(n AS BIGINT) AS n_rows, CAST(same AS BIGINT) AS n_adjacent_same, "
            "CAST(same * 1000000 // (n - 1) AS BIGINT) AS obs_same_ppm, "
            "CAST(num * 1000000 // (n * (n - 1)) AS BIGINT) AS expected_same_ppm "
            "FROM obs, nn, cs"
        ),
        "quality_length_corr": (
            # replay of analytics.quality_length_corr: shared quality CTEs,
            # HUGEINT sufficient statistics, the engine's exact
            # sign * cov^2 // max((vx*vy)//1e6, 1) scoring
            f"WITH {_quality_ctes('lang')}, "
            f"q AS (SELECT lang, CAST(n_chars AS HUGEINT) AS x, "
            f"CAST({_QPPM_EXPR} AS HUGEINT) AS y FROM r), "
            "s AS (SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, "
            "SUM(y) AS sy, SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy "
            "FROM q GROUP BY 1), "
            "c AS (SELECT lang, n, n*sxy - sx*sy AS cov, n*sxx - sx*sx AS vx, "
            "n*syy - sy*sy AS vy FROM s) "
            "SELECT lang, CAST(n AS BIGINT) AS n_docs, "
            "CAST(CASE WHEN vx = 0 OR vy = 0 THEN 0 ELSE "
            "(CASE WHEN cov < 0 THEN -1 ELSE 1 END) * "
            "((cov*cov) // greatest((vx*vy) // 1000000, 1)) END AS BIGINT) "
            "AS r2_signed_ppm FROM c"
        ),
        "encoding_audit": (
            # replay of analytics.encoding_audit: identical plants (chr
            # codepoints match the engine's literal chars) and identical
            # RE2/Python-re pattern strings
            "WITH planted AS (SELECT source, "
            "text || CASE WHEN doc_id % 17 = 3 THEN chr(65533) ELSE '' END "
            "|| CASE WHEN doc_id % 23 = 5 THEN chr(7) ELSE '' END "
            "|| CASE WHEN doc_id % 29 = 7 THEN chr(233) ELSE '' END AS t "
            "FROM documents) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            f"CAST(SUM(CASE WHEN regexp_matches(t, '{_ENC_MOJI}') THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake, "
            f"CAST(SUM(CASE WHEN regexp_matches(t, '{_ENC_CTRL}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl, "
            f"CAST(SUM(CASE WHEN regexp_matches(t, '{_ENC_NONASCII}') THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii "
            "FROM planted GROUP BY 1"
        ),
        "cross_source_dups": (
            # replay of analytics.cross_source_dup_matrix: the green minhash
            # pair CTEs + two source joins + LEAST/GREATEST unordered fold
            f"WITH {_minhash_ctes()}, "
            "dsrc AS (SELECT doc_id, source FROM documents), "
            "lab AS (SELECT LEAST(sa.source, sb.source) AS source_a, "
            "GREATEST(sa.source, sb.source) AS source_b FROM mpairs p "
            "JOIN dsrc sa ON sa.doc_id = p.doc_a "
            "JOIN dsrc sb ON sb.doc_id = p.doc_b) "
            "SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs "
            "FROM lab GROUP BY 1, 2"
        ),
        "link_prediction_topk": (
            # replay of analytics.common_neighbor_pairs: shared edge CTEs,
            # canonical undirected dedup, center-vertex wedge join,
            # null-test anti-join vs edges, deterministic (n desc, a, b) cut
            f"WITH {_edges_ctes()}, "
            "und AS (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM edges), "
            "dir AS (SELECT a AS w, b AS v FROM und UNION ALL SELECT b, a FROM und), "
            "wed AS (SELECT e1.v AS a, e2.v AS b FROM dir e1 "
            "JOIN dir e2 ON e1.w = e2.w AND e1.v < e2.v), "
            "cn AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common FROM wed GROUP BY 1, 2), "
            "ne AS (SELECT cn.a, cn.b, cn.n_common FROM cn "
            "LEFT JOIN und ON und.a = cn.a AND und.b = cn.b WHERE und.a IS NULL) "
            "SELECT a AS doc_a, b AS doc_b, n_common FROM ne "
            "ORDER BY n_common DESC, a, b LIMIT 20"
        ),
        "vocab_growth": (
            # replay of analytics.vocab_growth: integer-ppm thresholds of
            # max(doc_id)+1, per-token MIN first doc, counts below each
            # threshold; token rule shared with _TOP_TOKENS_SQL
            "WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents), "
            "cp AS (SELECT unnest([250000,500000,750000,1000000]) AS ppm), "
            "th AS (SELECT ppm, (ppm * n) // 1000000 AS d FROM cp, mx), "
            "tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tk "
            "FROM documents), "
            "firsts AS (SELECT tk, MIN(doc_id) AS fid FROM tok GROUP BY 1) "
            "SELECT th.ppm AS frac_ppm, "
            "CAST((SELECT COUNT(*) FROM documents dd WHERE dd.doc_id < th.d) AS BIGINT) AS n_docs, "
            "CAST((SELECT COUNT(*) FROM firsts f WHERE f.fid < th.d) AS BIGINT) AS vocab_size "
            "FROM th"
        ),
        "interval_overlap_pairs": (
            # replay of relational.overlap_pairs over _activity_intervals:
            # same WHERE e > s empty-interval drop, ROW_NUMBER ids dedup the
            # unordered pair, half-open overlap predicate
            f"WITH {_ACTIVITY_IV_CTE}, "
            "ivr AS (SELECT user_id, s, e, ROW_NUMBER() OVER () AS rid "
            "FROM iv WHERE e > s) "
            "SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs "
            "FROM ivr a JOIN ivr b ON a.user_id = b.user_id AND a.rid < b.rid "
            "AND a.s < b.e AND b.s < a.e GROUP BY 1"
        ),
        "important_parts": (
            # replay of relational.revenue_concentrated_parts (Q11 shape):
            # per-part revenue in the engine's cents convention, the
            # cross-multiplied HUGEINT share compare, the ppm floor division
            "WITH r AS (SELECT l_partkey, "
            "SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem GROUP BY 1), "
            "tot AS (SELECT SUM(rev) AS t FROM r) "
            "SELECT l_partkey, CAST(rev AS BIGINT) AS revenue_cents, "
            "CAST(CAST(rev AS HUGEINT)*1000000 // t AS BIGINT) AS share_ppm "
            "FROM r, tot WHERE CAST(rev AS HUGEINT)*1000000 > 700*t"
        ),
        "inactive_high_balance": (
            # replay of relational.inactive_high_balance (Q22 shape):
            # positive-balance membership on the SAME rounded cents rule,
            # cross-multiplied average compare, NOT EXISTS since the cutoff
            "WITH pos AS (SELECT SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) AS s, "
            "COUNT(*) AS n FROM customer "
            "WHERE CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT) > 0) "
            "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs, "
            "CAST(SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) AS BIGINT) AS total_bal_cents "
            "FROM customer JOIN nation ON n_nationkey = c_nationkey, pos "
            "WHERE CAST(FLOOR(c_acctbal*100+0.5) AS HUGEINT) * n > s "
            "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY 1"
        ),
        "split_skew_audit": (
            # replay of analytics.split_skew_audit: dataset_split_counts'
            # md5 split thresholds, 256-wide buckets, cross-multiplied TVD
            "WITH s AS (SELECT n_chars, CASE WHEN h < '19999999' THEN 'val' "
            "WHEN h < '33333333' THEN 'test' ELSE 'train' END AS split FROM "
            "(SELECT n_chars, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h "
            "FROM documents)), "
            "c AS (SELECT split, n_chars // 256 AS b, COUNT(*) AS n FROM s "
            "WHERE split IN ('train', 'test') GROUP BY 1, 2), "
            "tr AS (SELECT b, n FROM c WHERE split = 'train'), "
            "te AS (SELECT b, n FROM c WHERE split = 'test'), "
            "nt AS (SELECT (SELECT COALESCE(SUM(n), 0) FROM tr) AS n0, "
            "(SELECT COALESCE(SUM(n), 0) FROM te) AS n1), "
            "u AS (SELECT COALESCE(tr.n, 0) AS a, COALESCE(te.n, 0) AS bb "
            "FROM tr FULL OUTER JOIN te ON tr.b = te.b) "
            "SELECT CAST(nt.n0 AS BIGINT) AS n_train, CAST(nt.n1 AS BIGINT) AS n_test, "
            "CAST(SUM(abs(CAST(a AS HUGEINT) * nt.n1 - CAST(bb AS HUGEINT) * nt.n0)) "
            "* 1000000 // (2 * CAST(nt.n0 AS HUGEINT) * nt.n1) AS BIGINT) AS tvd_ppm "
            "FROM u, nt GROUP BY nt.n0, nt.n1"
        ),
        "first_last_order": (
            # replay of relational.first_last_order: the same whole-day /
            # orderkey total order, first and last via row_number both ways
            "WITH o AS (SELECT o_custkey, o_orderkey, "
            "CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders), "
            "f AS (SELECT o_custkey, cents FROM o QUALIFY row_number() OVER "
            "(PARTITION BY o_custkey ORDER BY day, o_orderkey) = 1), "
            "l AS (SELECT o_custkey, cents FROM o QUALIFY row_number() OVER "
            "(PARTITION BY o_custkey ORDER BY day DESC, o_orderkey DESC) = 1) "
            "SELECT f.o_custkey AS c_custkey, f.cents AS first_cents, "
            "l.cents AS last_cents, l.cents - f.cents AS delta_cents "
            "FROM f JOIN l ON f.o_custkey = l.o_custkey"
        ),
        "top_prices_with_ties": (
            # replay of relational.top_prices_with_ties: DENSE_RANK keeps
            # every tied order, unlike top_orders_per_segment's row_number
            "SELECT c.c_mktsegment, o.o_orderkey, "
            "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, "
            "CAST(dense_rank() OVER (PARTITION BY c.c_mktsegment "
            "ORDER BY CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC) "
            "AS BIGINT) AS price_rank "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "QUALIFY price_rank <= 3"
        ),
        "k_anonymity": (
            # replay of analytics.k_anonymity_audit over (lang, source):
            # grouping by the columns == grouping by the chr(31) key
            "WITH g AS (SELECT lang, source, COUNT(*) AS n FROM documents "
            "GROUP BY 1, 2), "
            "a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COUNT(*) FILTER (n < 10) AS BIGINT) AS n_small_groups, "
            "CAST(COALESCE(SUM(n) FILTER (n < 10), 0) AS BIGINT) AS n_rows_at_risk "
            "FROM g) "
            "SELECT n_rows, n_groups, n_small_groups, n_rows_at_risk, "
            "CAST(n_rows_at_risk * 1000000 // n_rows AS BIGINT) AS risk_ppm FROM a"
        ),
        "revenue_share_by_nation": (
            # replay of relational.revenue_share_by_nation: inner-join
            # semantics, same cents, SUM OVER region + floor-div ppm
            "WITH j AS (SELECT r.r_name, n.n_name, "
            "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey), "
            "g AS (SELECT r_name, n_name, SUM(cents) AS rev FROM j GROUP BY 1, 2) "
            "SELECT r_name, n_name, CAST(rev AS BIGINT) AS revenue_cents, "
            "CAST(rev * 1000000 // SUM(rev) OVER (PARTITION BY r_name) AS BIGINT) "
            "AS share_ppm FROM g"
        ),
        "supplier_hhi": (
            # replay of relational.supplier_hhi: same per-row revenue cents,
            # HUGEINT square sums, floor-div ppm over total^2
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) "
            "AS rev FROM lineitem GROUP BY l_suppkey), "
            "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(rev AS HUGEINT)) AS s, "
            "SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS s2 FROM r) "
            "SELECT n AS n_suppliers, CAST(s AS BIGINT) AS total_cents, "
            "CAST(CASE WHEN s = 0 THEN 0 ELSE s2 * 1000000 // (s * s) END AS BIGINT) "
            "AS hhi_ppm FROM a"
        ),
        "rfm_segments": (
            # replay of relational.rfm_segments: same day/cents integers,
            # type-1 boundaries at rank CEIL(q*n), ties take the lower score
            "WITH o AS (SELECT o_custkey, "
            "CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders), "
            "pc AS (SELECT o_custkey AS c_custkey, MAX(day) AS last_day, "
            "CAST(COUNT(*) AS BIGINT) AS f_orders, "
            "CAST(SUM(cents) AS BIGINT) AS m_cents FROM o GROUP BY 1), "
            "mx AS (SELECT MAX(last_day) AS m FROM pc), "
            "p AS (SELECT c_custkey, (SELECT m FROM mx) - last_day AS r_days, "
            "f_orders, m_cents FROM pc), "
            "nn AS (SELECT COUNT(*) AS n FROM p), "
            "rb AS (SELECT r_days AS v, row_number() OVER (ORDER BY r_days) AS rn FROM p), "
            "fb AS (SELECT f_orders AS v, row_number() OVER (ORDER BY f_orders) AS rn FROM p), "
            "mb AS (SELECT m_cents AS v, row_number() OVER (ORDER BY m_cents) AS rn FROM p), "
            "rq AS (SELECT "
            "MAX(CASE WHEN rn = CAST(CEIL(0.25 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b1, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.5 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b2, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.75 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b3 "
            "FROM rb), "
            "fq AS (SELECT "
            "MAX(CASE WHEN rn = CAST(CEIL(0.25 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b1, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.5 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b2, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.75 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b3 "
            "FROM fb), "
            "mq AS (SELECT "
            "MAX(CASE WHEN rn = CAST(CEIL(0.25 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b1, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.5 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b2, "
            "MAX(CASE WHEN rn = CAST(CEIL(0.75 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b3 "
            "FROM mb) "
            "SELECT p.c_custkey, CAST(p.r_days AS BIGINT) AS r_days, "
            "p.f_orders, p.m_cents, "
            "CAST(1 + CAST(p.r_days > rq.b1 AS INT) + CAST(p.r_days > rq.b2 AS INT) "
            "+ CAST(p.r_days > rq.b3 AS INT) AS BIGINT) AS r_score, "
            "CAST(1 + CAST(p.f_orders > fq.b1 AS INT) + CAST(p.f_orders > fq.b2 AS INT) "
            "+ CAST(p.f_orders > fq.b3 AS INT) AS BIGINT) AS f_score, "
            "CAST(1 + CAST(p.m_cents > mq.b1 AS INT) + CAST(p.m_cents > mq.b2 AS INT) "
            "+ CAST(p.m_cents > mq.b3 AS INT) AS BIGINT) AS m_score "
            "FROM p, rq, fq, mq"
        ),
        "interarrival_quantiles": (
            # replay of relational.interarrival_quantiles: same
            # (ts, event_id) tie order, whole-second floor-div gaps, and
            # the fulfillment_latency cumulative-count quantile read
            "WITH d AS (SELECT event_type, (epoch_us(ts) - lag(epoch_us(ts)) "
            "OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)) "
            "// 1000000 AS ds FROM events), "
            "v AS (SELECT event_type, ds FROM d WHERE ds IS NOT NULL), "
            "c AS (SELECT event_type, ds, COUNT(*) AS n FROM v GROUP BY 1, 2), "
            "w AS (SELECT event_type, ds, "
            "SUM(n) OVER (PARTITION BY event_type ORDER BY ds) AS cum, "
            "SUM(n) OVER (PARTITION BY event_type) AS tot FROM c) "
            "SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_gaps, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN ds END) AS BIGINT) AS p50_sec, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN ds END) AS BIGINT) AS p90_sec "
            "FROM w GROUP BY event_type"
        ),
        # replays relational.key_skew_report: per-key sizes, size-count
        # table, smallest-size-with-cum>=ceil(q*n_keys) exact quantiles
        "key_skew": (
            "WITH g AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY 1), "
            "c AS (SELECT n AS sz, CAST(COUNT(*) AS BIGINT) AS k FROM g "
            "GROUP BY 1), "
            "w AS (SELECT sz, k, SUM(k) OVER (ORDER BY sz) AS cum, "
            "SUM(k) OVER () AS tot FROM c) "
            "SELECT CAST(MAX(tot) AS BIGINT) AS n_keys, "
            "CAST(SUM(sz * k) AS BIGINT) AS n_rows, "
            "CAST(MAX(sz) AS BIGINT) AS max_n, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN sz END) "
            "AS BIGINT) AS p50_n, "
            "CAST(MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN sz END) "
            "AS BIGINT) AS p99_n FROM w"
        ),
        "spike_days": _SPIKE_DAYS_SQL,
        "order_rank_global": _ORDER_RANK_GLOBAL_SQL,
        "new_users_daily": _NEW_USERS_DAILY_SQL,
        "bucketed_join_revenue": _BUCKETED_JOIN_REVENUE_SQL,
        "label_centroids": _LABEL_CENTROIDS_SQL,
        "incremental_daily_totals": _INCREMENTAL_DAILY_TOTALS_SQL,
        "late_orders_by_priority": _LATE_ORDERS_BY_PRIORITY_SQL,
        "time_travel_counts": _TIME_TRAVEL_COUNTS_SQL,
        "star_join_revenue": _STAR_JOIN_REVENUE_SQL,
        "zorder_2d_prune": _ZORDER_2D_PRUNE_SQL,
        "evolved_schema_counts": _EVOLVED_SCHEMA_COUNTS_SQL,
        "typo_pairs": _TYPO_PAIRS_SQL,
        "event_type_stationary": _stationary_sql(),
        "lpa_modularity": _lpa_modularity_sql(rounds=4),
        "revenue_acf": (
            # replay of analytics.revenue_acf: daily cents fold, n-scaled
            # integer demeaning (no fractional mean), lag self-join,
            # sign-split truncating ppm; HUGEINT mid-chain
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
            "SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS c "
            "FROM orders GROUP BY 1), "
            "o AS (SELECT row_number() OVER (ORDER BY day) AS t, "
            "CAST(c AS HUGEINT) AS c FROM d), "
            "st AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM o), "
            "dm AS (SELECT t, (SELECT n FROM st) * c - (SELECT s FROM st) "
            "AS v FROM o), "
            "dn AS (SELECT SUM(v * v) AS den FROM dm), "
            "lg AS (SELECT unnest(generate_series(1, 7)) AS lag), "
            "nm AS (SELECT l.lag, COALESCE(SUM(a.v * b.v), 0) AS num "
            "FROM lg l LEFT JOIN dm a ON 1 = 1 "
            "LEFT JOIN dm b ON b.t = a.t + l.lag GROUP BY 1) "
            "SELECT CAST(lag AS BIGINT) AS lag, "
            "CAST(CASE WHEN (SELECT den FROM dn) = 0 THEN 0 "
            "WHEN num >= 0 THEN (num * 1000000) // (SELECT den FROM dn) "
            "ELSE -(((-num) * 1000000) // (SELECT den FROM dn)) END "
            "AS BIGINT) AS acf_ppm FROM nm ORDER BY lag"
        ),
        "encoding_advisor": (
            # replay of analytics.encoding_advisor: exact byte arithmetic,
            # index width = bytes to index the dictionary via length(bin())
            "WITH "
            + " UNION ALL ".join(
                "SELECT '{c}' AS col, COUNT(*) AS n_rows, "
                "COUNT(DISTINCT {c}) AS n_distinct, "
                "SUM(length({c})) AS plain, "
                "(SELECT SUM(length(v)) FROM "
                "(SELECT DISTINCT {c} AS v FROM documents)) AS dlen "
                "FROM documents".format(c=c)
                for c in ("lang", "source", "text")
            ).join(["s AS (", ") "])
            + "SELECT col AS \"column\", CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(n_distinct AS BIGINT) AS n_distinct, "
            "CAST(plain AS BIGINT) AS plain_bytes, "
            "CAST(dlen + n_rows * GREATEST(1, (length(bin(GREATEST("
            "n_distinct - 1, 1))) + 7) // 8) AS BIGINT) AS dict_bytes, "
            "CAST(CASE WHEN dlen + n_rows * GREATEST(1, (length(bin("
            "GREATEST(n_distinct - 1, 1))) + 7) // 8) < plain THEN 1 "
            "ELSE 0 END AS BIGINT) AS dict_wins FROM s ORDER BY col"
        ),
        "bloom_pruned_join_revenue": (
            # replay of analytics.bloom_pruned_join_revenue: the Bloom
            # prefilter is traffic-only (the exact join removes its false
            # positives), so the oracle is the PLAIN join aggregate with
            # the shared cents chain
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "WHERE o.o_orderpriority = '1-URGENT'"
        ),
        "hive_partition_prune_daily": (
            # replay of analytics.hive_partition_prune_daily: the same day
            # derivation, cents quantization, and [lo, hi) day range the
            # partition filter prunes to
            "WITH x AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') "
            "AS day, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c "
            "FROM events) "
            "SELECT day, CAST(SUM(c) AS BIGINT) AS value_cents, "
            "COUNT(*) AS n_events FROM x "
            "WHERE day >= '2024-01-10' AND day < '2024-01-20' "
            "GROUP BY 1 ORDER BY 1"
        ),
        "entity_dedupe_keepers": (
            # replay of analytics.entity_dedupe_keepers: the shared
            # levenshtein-1 pair CTE, symmetric recursive min-label
            # closure, LEFT JOIN back onto the distinct vocabulary
            "WITH RECURSIVE v AS (SELECT DISTINCT c_name AS tk "
            "FROM customer), "
            "e AS (SELECT a.tk AS ta, b.tk AS tb FROM v a JOIN v b "
            "ON a.tk < b.tk AND levenshtein(a.tk, b.tk) = 1), "
            "sym AS (SELECT ta AS x, tb AS y FROM e "
            "UNION SELECT tb, ta FROM e), "
            "reach AS (SELECT x, y FROM sym UNION "
            "SELECT r.x, s.y FROM reach r JOIN sym s ON s.x = r.y), "
            "canon AS (SELECT x, LEAST(x, MIN(y)) AS root FROM reach "
            "GROUP BY x) "
            "SELECT v.tk AS name, COALESCE(c.root, v.tk) AS canonical "
            "FROM v LEFT JOIN canon c ON c.x = v.tk ORDER BY name"
        ),
        "json_field_stats": _JSON_FIELD_STATS_SQL,
        "audience_overlap": _AUDIENCE_OVERLAP_SQL,
        "customers_without_orders": _CUSTOMERS_WITHOUT_ORDERS_SQL,
        "order_count_distribution": _ORDER_COUNT_DISTRIBUTION_SQL,
        "bpe_merge_candidates": _BPE_MERGE_SQL,
        "dp_geometric_counts": _dp_geometric_sql(),
        "dow_adjusted_spikes": _DOW_ADJUSTED_SPIKES_SQL,
        "boundary_overlap_pairs": _BOUNDARY_OVERLAP_SQL,
        "attribution_last_touch": _ATTRIBUTION_LAST_TOUCH_SQL,
        "l_diversity_audit": _L_DIVERSITY_SQL,
        "padding_waste_by_bucket": _PADDING_WASTE_SQL,
        "order_total_reconciliation": _ORDER_RECON_SQL,
        "chao1_vocab_estimate": _CHAO1_SQL,
        "corpus_datacard": _corpus_datacard_sql(),
        "gopher_quality_flags": _gopher_flags_sql(),
        "mattr_by_lang": _MATTR_SQL,
        "real_png_roundtrip": ("SELECT doc_id, CASE WHEN length(text) >= 32 THEN substr(text, 1, (length(text) // 32) * 32) ELSE text END AS text_out FROM documents WHERE lang = 'en'"),
        "real_pdf_roundtrip": ("SELECT doc_id, text AS text_out FROM documents WHERE lang = 'en'"),
        "vocab_pruning_plan": _VOCAB_PRUNING_SQL,
        "winnow_fingerprint_pairs": _winnow_sql(),
        "winnow_dup_clusters": _winnow_clusters_sql(),
        "ams_f2_audit": _ams_f2_sql(),
        "unigram_power_sample_plan": _UNIGRAM_POWER_SQL,
        "dedup_family_agreement": _dedup_family_agreement_sql(),
        "cdc_chunk_dedup": _CDC_CHUNK_SQL,
        "gdpr_erasure_plan": _gdpr_sql(),
        "max_coverage_select": _max_coverage_sql(),
        "blocklist_screen": _blocklist_sql(),
        "boundary_stitch_chains": _BOUNDARY_CHAINS_SQL,
        "pseudonym_collision_audit": _pseudonym_sql(),
        "code_switch_rate_by_source": _code_switch_sql(),
        "token_budget_waterfill": _WATERFILL_SQL,
        "random_walks": _random_walks_sql(),
        "kwic_snippets": _kwic_sql(),
        "leakage_free_split_audit": _leakage_split_sql(),
        "jsonl_source_daily": _TEXT_SOURCE_DAILY_SQL,
        "csv_source_daily": _TEXT_SOURCE_DAILY_SQL,
        "matryoshka_recall_audit": _matryoshka_sql(),
        "mmr_diverse_topk": _mmr_sql(),
        "bootstrap_ci_mean": _bootstrap_ci_sql(),
        "embedding_covariance_topk": (
            # replay of analytics.embedding_covariance_topk: identical
            # milli-unit quantization (floor(x*1000+0.5) -- the
            # quantize_embeddings convention), 1-based dim indexing via
            # q[i], exact integer cov_num = n*S_ab - s_a*s_b in HUGEINT
            "WITH e AS (SELECT vec_id, list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q "
            "FROM embeddings), "
            "dims AS (SELECT unnest(generate_series(1, len(q))) AS i, vec_id, q "
            "FROM e), "
            "u AS (SELECT vec_id, i, q[i] AS x FROM dims), "
            "n AS (SELECT COUNT(*) AS n FROM e), "
            "s AS (SELECT i, SUM(x) AS s FROM u GROUP BY i), "
            "g AS (SELECT a.i AS dim_a, b.i AS dim_b, SUM(a.x * b.x) AS sab "
            "FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i < b.i "
            "GROUP BY 1, 2) "
            "SELECT CAST(g.dim_a AS BIGINT) AS dim_a, "
            "CAST(g.dim_b AS BIGINT) AS dim_b, "
            "CAST(n.n * g.sab - sa.s * sb.s AS BIGINT) AS cov_num "
            "FROM g, n JOIN s sa ON sa.i = g.dim_a JOIN s sb ON sb.i = g.dim_b "
            "ORDER BY abs(n.n * g.sab - sa.s * sb.s) DESC, g.dim_a, g.dim_b "
            "LIMIT 20"
        ),
        "t_closeness_audit": (
            # replay of analytics.t_closeness_audit: same clamped $10 bins
            # (LEAST(GREATEST(cents,0)//1000, 9)), zero-filled grid so
            # cumulative sums cross empty bins identically, exact integer
            # cross-product EMD floor-divided to ppm
            "WITH c AS (SELECT event_type AS qi, "
            "LEAST(GREATEST(CAST(ROUND(value * 100) AS BIGINT), 0) // 1000, 9) "
            "AS bin FROM events), "
            "grid AS (SELECT q.qi, b.bin FROM (SELECT DISTINCT qi FROM c) q, "
            "(SELECT unnest(generate_series(0, 9)) AS bin) b), "
            "cnt AS (SELECT qi, bin, COUNT(*) AS n FROM c GROUP BY 1, 2), "
            "filled AS (SELECT g.qi, g.bin, COALESCE(cnt.n, 0) AS n FROM grid g "
            "LEFT JOIN cnt ON cnt.qi = g.qi AND cnt.bin = g.bin), "
            "cum AS (SELECT qi, bin, SUM(n) OVER (PARTITION BY qi ORDER BY bin) "
            "AS cc FROM filled), "
            "gcum AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cg FROM "
            "(SELECT bin, SUM(n) AS n FROM filled GROUP BY bin)), "
            "tot AS (SELECT COUNT(*) AS N FROM c), "
            "nc AS (SELECT qi, COUNT(*) AS n FROM c GROUP BY qi), "
            "emd AS (SELECT cum.qi, CAST(nc.n AS BIGINT) AS n_events, "
            "CAST((1000000 * SUM(ABS(cum.cc * tot.N - gcum.cg * nc.n))) "
            "// (nc.n * tot.N * 9) AS BIGINT) AS t_ppm "
            "FROM cum JOIN gcum ON gcum.bin = cum.bin "
            "JOIN nc ON nc.qi = cum.qi CROSS JOIN tot "
            "WHERE cum.bin < 9 GROUP BY cum.qi, nc.n, tot.N) "
            "SELECT qi, n_events, t_ppm, "
            "CAST(CASE WHEN t_ppm > 150000 THEN 1 ELSE 0 END AS BIGINT) "
            "AS at_risk FROM emd"
        ),
        "pq_recall_audit": _pq_sql(),
        "sq8_recall_audit": _sq8_sql(),
        "embedding_outliers_topk": (
            # replay of analytics.embedding_outliers_topk: milli-int
            # quantization, floor-div per-label centroids, exact integer
            # squared L2, (dist DESC, vec_id) total order
            "WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q "
            "FROM embeddings), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
            "u AS (SELECT vec_id, label, i, q[i] AS x FROM e, dims), "
            "c AS (SELECT label, i, SUM(x) // COUNT(*) AS cx FROM u "
            "GROUP BY 1, 2), "
            "d AS (SELECT u.vec_id, u.label, "
            "SUM((u.x - c.cx) * (u.x - c.cx)) AS dist FROM u "
            "JOIN c ON c.label = u.label AND c.i = u.i GROUP BY 1, 2) "
            "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
            "CAST(label AS BIGINT) AS label, CAST(dist AS BIGINT) AS dist "
            "FROM d ORDER BY dist DESC, vec_id LIMIT 20"
        ),
        "centroid_separation_audit": (
            # replay of analytics.centroid_separation_audit: milli-int
            # quantization, truncating-div centroids, exact integer within-
            # SSD and centroid pair distances, (dist, label) nearest
            # tie-break, floor-div ratio ppm
            "WITH e AS (SELECT label, list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q "
            "FROM embeddings), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
            "u AS (SELECT label, i, q[i] AS x FROM e, dims), "
            "c AS (SELECT label, i, SUM(x) // COUNT(*) AS cx FROM u "
            "GROUP BY 1, 2), "
            "cnt AS (SELECT label, COUNT(*) AS n_vecs FROM e GROUP BY 1), "
            "w AS (SELECT u.label, SUM((u.x - c.cx) * (u.x - c.cx)) AS ssd "
            "FROM u JOIN c ON c.label = u.label AND c.i = u.i GROUP BY 1), "
            "pd AS (SELECT a.label AS la, b.label AS lb, "
            "SUM((a.cx - b.cx) * (a.cx - b.cx)) AS dist FROM c a "
            "JOIN c b ON a.i = b.i AND a.label <> b.label GROUP BY 1, 2), "
            "nn AS (SELECT la, lb, dist, ROW_NUMBER() OVER "
            "(PARTITION BY la ORDER BY dist, lb) AS rn FROM pd) "
            "SELECT CAST(w.label AS BIGINT) AS label, "
            "CAST(cnt.n_vecs AS BIGINT) AS n_vecs, "
            "CAST(w.ssd // cnt.n_vecs AS BIGINT) AS within_msd, "
            "CAST(nn.lb AS BIGINT) AS nn_label, "
            "CAST(nn.dist AS BIGINT) AS nn_dist, "
            "CAST(nn.dist * 1000000 // GREATEST(w.ssd // cnt.n_vecs, 1) "
            "AS BIGINT) AS separation_ppm "
            "FROM w JOIN cnt ON cnt.label = w.label "
            "JOIN nn ON nn.la = w.label AND nn.rn = 1 ORDER BY w.label"
        ),
        "source_centroid_geometry": (
            # replay of analytics.source_centroid_geometry: vec_id=doc_id
            # join, milli-int quantization, truncating-div per-source
            # centroids, exact integer pairwise dot products + squared norms
            "WITH e AS (SELECT d.source AS source, list_transform("
            "m.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) "
            "AS BIGINT)) AS q FROM embeddings m "
            "JOIN documents d ON d.doc_id = m.vec_id), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
            "u AS (SELECT source, i, q[i] AS x FROM e, dims), "
            "c AS (SELECT source, i, SUM(x) // COUNT(*) AS cx FROM u "
            "GROUP BY 1, 2), "
            "n AS (SELECT source, SUM(cx * cx) AS nsq FROM c GROUP BY 1), "
            "p AS (SELECT a.source AS source_a, b.source AS source_b, "
            "SUM(a.cx * b.cx) AS dot_num FROM c a "
            "JOIN c b ON a.i = b.i AND a.source < b.source GROUP BY 1, 2) "
            "SELECT p.source_a, p.source_b, "
            "CAST(p.dot_num AS BIGINT) AS dot_num, "
            "CAST(na.nsq AS BIGINT) AS normsq_a, "
            "CAST(nb.nsq AS BIGINT) AS normsq_b "
            "FROM p JOIN n na ON na.source = p.source_a "
            "JOIN n nb ON nb.source = p.source_b "
            "ORDER BY p.source_a, p.source_b"
        ),
        "bitext_mining_topk": (
            # replay of analytics.bitext_mining_topk: milli quantization,
            # cross-slice integer dot grid, (dot DESC, id) top-2, absolute
            # margin, (margin DESC, src_id) top-20
            "WITH e AS (SELECT m.vec_id AS id, d.lang AS lang, "
            "list_transform(m.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) "
            "* 1000 + 0.5) AS BIGINT)) AS v FROM embeddings m "
            "JOIN documents d ON d.doc_id = m.vec_id), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
            "u AS (SELECT id, lang, i, v[i] AS x FROM e, dims "
            "WHERE v[i] IS NOT NULL), "
            "dots AS (SELECT a.id AS src_id, b.id AS tgt_id, "
            "SUM(a.x * b.x) AS dot FROM u a JOIN u b ON a.i = b.i "
            "AND a.lang = 'en' AND b.lang = 'de' GROUP BY 1, 2), "
            "rk AS (SELECT src_id, tgt_id, dot, row_number() OVER "
            "(PARTITION BY src_id ORDER BY dot DESC, tgt_id) AS rn "
            "FROM dots), "
            "pr AS (SELECT r1.src_id, r1.tgt_id, r1.dot AS dot_num, "
            "r1.dot - COALESCE(r2.dot, r1.dot) AS margin_num FROM rk r1 "
            "LEFT JOIN rk r2 ON r2.src_id = r1.src_id AND r2.rn = 2 "
            "WHERE r1.rn = 1) "
            "SELECT CAST(src_id AS BIGINT) AS src_id, "
            "CAST(tgt_id AS BIGINT) AS tgt_id, "
            "CAST(dot_num AS BIGINT) AS dot_num, "
            "CAST(margin_num AS BIGINT) AS margin_num FROM pr "
            "QUALIFY row_number() OVER (ORDER BY margin_num DESC, src_id) "
            "<= 20"
        ),
        "kcenter_coreset": _kcenter_sql(k=8),
        "pca_top_component": _pca_sql(),
        "dsir_importance_weights": (
            # replay of analytics.dsir_importance_weights: shared
            # tokenization, 'dsir:<tok>' md5-u64 % 1024 buckets, wb =
            # bits(nt+1) - bits(nr+1) via length(bin())-1, sign-split
            # truncating milli mean per doc
            "WITH tok AS (SELECT doc_id, lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk "
            "FROM documents), "
            "bk AS (SELECT doc_id, lang, CAST(CAST(('0x' || "
            "substr(md5('dsir:' || tk), 1, 16)) AS UBIGINT) % 1024 "
            "AS BIGINT) AS b FROM tok), "
            "cnt AS (SELECT b, COUNT(*) AS nr, "
            "COUNT(*) FILTER (WHERE lang = 'en') AS nt FROM bk GROUP BY 1), "
            "w AS (SELECT b, (length(bin(nt + 1)) - 1) - "
            "(length(bin(nr + 1)) - 1) AS wb FROM cnt), "
            "s AS (SELECT doc_id, SUM(wb) AS num, COUNT(*) AS ntok "
            "FROM bk JOIN w USING (b) GROUP BY 1) "
            "SELECT doc_id, CAST(ntok AS BIGINT) AS n_tok, "
            "CAST(CASE WHEN num >= 0 THEN (num * 1000) // ntok "
            "ELSE -(((-num) * 1000) // ntok) END AS BIGINT) AS score_milli "
            "FROM s ORDER BY doc_id"
        ),
        "rendezvous_routing_balance": (
            # replay of analytics.rendezvous_routing_balance: the same
            # 'hrw:<id>:<worker>' md5-u64 score grid, argmax by (score
            # DESC, worker), trunc-div ppm share of the total
            "WITH wk AS (SELECT 'w' || lpad(CAST(i AS VARCHAR), 2, '0') AS "
            "worker FROM (SELECT unnest(generate_series(0, 15)) AS i)), "
            "a AS (SELECT doc_id, worker, CAST(('0x' || substr(md5('hrw:' "
            "|| CAST(doc_id AS VARCHAR) || ':' || worker), 1, 16)) AS "
            "UBIGINT) AS h FROM documents, wk), "
            "asn AS (SELECT doc_id, worker FROM a QUALIFY row_number() "
            "OVER (PARTITION BY doc_id ORDER BY h DESC, worker) = 1), "
            "cnt AS (SELECT worker, COUNT(*) AS n_docs FROM asn GROUP BY 1) "
            "SELECT worker, CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST((n_docs * 1000000) // (SELECT SUM(n_docs) FROM cnt) "
            "AS BIGINT) AS share_ppm FROM cnt ORDER BY worker"
        ),
        "nearest_centroid_confusion": (
            # replay of analytics.nearest_centroid_confusion: milli-int
            # quantization, truncating-div centroids, exact integer squared
            # L2 to EVERY centroid, (dist, label) argmin tie-break, floor-div
            # per-true-label share ppm
            "WITH e AS (SELECT ROW_NUMBER() OVER () AS rid, label, "
            "list_transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q "
            "FROM embeddings), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS i), "
            "u AS (SELECT rid, label, i, q[i] AS x FROM e, dims), "
            "c AS (SELECT label, i, SUM(x) // COUNT(*) AS cx FROM u "
            "GROUP BY 1, 2), "
            "cnt AS (SELECT label, COUNT(*) AS n_total FROM e GROUP BY 1), "
            "d AS (SELECT u.rid, u.label, c.label AS cl, "
            "SUM((u.x - c.cx) * (u.x - c.cx)) AS dist FROM u "
            "JOIN c ON c.i = u.i GROUP BY 1, 2, 3), "
            "p AS (SELECT rid, label, cl, ROW_NUMBER() OVER "
            "(PARTITION BY rid ORDER BY dist, cl) AS rn FROM d), "
            "m AS (SELECT label, cl AS pred_label, COUNT(*) AS n_vecs "
            "FROM p WHERE rn = 1 GROUP BY 1, 2) "
            "SELECT CAST(m.label AS BIGINT) AS label, "
            "CAST(m.pred_label AS BIGINT) AS pred_label, "
            "CAST(m.n_vecs AS BIGINT) AS n_vecs, "
            "CAST(m.n_vecs * 1000000 // cnt.n_total AS BIGINT) AS share_ppm "
            "FROM m JOIN cnt ON cnt.label = m.label "
            "ORDER BY m.label, m.pred_label"
        ),
        "watermark_late_counts": (
            # replay of relational.watermark_late_counts: exclusive running
            # max over arrival (event_id) order, strict 300s lateness, hour
            # buckets of EVENT time
            "WITH e AS (SELECT event_id, ts, epoch_us(ts) AS us FROM events), "
            "p AS (SELECT ts, us, MAX(us) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM e), "
            "l AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hour, "
            "CASE WHEN pmax IS NOT NULL AND pmax - us > 300000000 "
            "THEN 1 ELSE 0 END AS late FROM p) "
            "SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(late) AS BIGINT) AS n_late, "
            "CAST(SUM(late) * 1000000 // COUNT(*) AS BIGINT) AS late_ppm "
            "FROM l GROUP BY hour"
        ),
        "quality_dup_calibration": (
            # replay of analytics.quality_dup_calibration: quality CTEs +
            # the same 64-bit md5-prefix text group key (so a 2^-64
            # collision would merge the SAME groups on both sides), clamped
            # 100k-ppm bins, floor-div rate
            f"WITH {_quality_ctes('text')}, "
            f"qd AS (SELECT doc_id, LEAST({_QPPM_EXPR} // 100000, 9) AS qbin, "
            f"{_MD5U64.format(v='text')} AS h FROM r), "
            "g AS (SELECT h, COUNT(*) AS n FROM qd GROUP BY h), "
            "j AS (SELECT qd.qbin, CASE WHEN g.n >= 2 THEN 1 ELSE 0 END "
            "AS dup FROM qd JOIN g USING (h)) "
            "SELECT qbin, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(dup) AS BIGINT) AS n_dup_docs, "
            "CAST(SUM(dup) * 1000000 // COUNT(*) AS BIGINT) AS dup_rate_ppm "
            "FROM j GROUP BY qbin"
        ),
        "lang_temperature_plan": (
            # replay of analytics.lang_temperature_plan: FLOOR(SQRT(n))
            # (ieee-correctly-rounded on both sides) and floor-div ppm
            "WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents "
            "GROUP BY lang), "
            "w AS (SELECT lang, n_docs, "
            "CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight "
            "FROM c), "
            "t AS (SELECT SUM(weight) AS sum_w, SUM(n_docs) AS N FROM w) "
            "SELECT w.lang, w.n_docs, w.weight, "
            "CAST(w.weight * 1000000 // t.sum_w AS BIGINT) AS target_share_ppm, "
            "CAST(w.weight * t.N * 1000000 // (t.sum_w * w.n_docs) AS BIGINT) "
            "AS resample_factor_ppm FROM w, t ORDER BY w.lang"
        ),
    }
