"""End-to-end pipeline tests: Ray output == single-process oracle, per row.

The north-rule invariant is span-sequence equality on
``(kind, text, media_ref, order)`` per document.
"""

import pyarrow as pa
import pytest

from distributed_system___ocr_ray import corpus, oracle
from distributed_system___ocr_ray.pipelines import extract as pipeline


def _sorted_output(ds) -> pa.Table:
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    order = pa.compute.sort_indices(tbl.column("doc_id"))
    return tbl.take(order).select(["doc_id", "spans"])


def _assert_span_equality(got: pa.Table, expected: pa.Table):
    assert got.num_rows == expected.num_rows
    g_ids = got.column("doc_id").to_pylist()
    e_ids = expected.column("doc_id").to_pylist()
    assert g_ids == e_ids
    g_spans = got.column("spans").to_pylist()
    e_spans = expected.column("spans").to_pylist()
    for did, g, e in zip(g_ids, g_spans, e_spans):
        g_norm = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g]
        e_norm = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in e]
        assert g_norm == e_norm, f"span mismatch in {did}"


@pytest.mark.usefixtures("ray_session")
class TestExtractionPipeline:
    def test_fused_matches_oracle(self, small_corpus):
        docs, store = small_corpus
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = pipeline.extract_dataset(docs, store, num_partitions=8)
        _assert_span_equality(_sorted_output(out), expected)

    def test_split_union_matches_oracle(self, small_corpus):
        docs, store = small_corpus
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = pipeline.extract_dataset(docs, store, num_partitions=8, mode="split")
        _assert_span_equality(_sorted_output(out), expected)

    def test_partitioning_invariance(self, small_corpus):
        """Output is identical at different partition counts (determinism
        across parallelism levels -- SURVEY.md #7.3)."""
        docs, store = small_corpus
        a = _sorted_output(pipeline.extract_dataset(docs, store, num_partitions=3))
        b = _sorted_output(pipeline.extract_dataset(docs, store, num_partitions=16))
        _assert_span_equality(a, b)

    def test_reference_shaped_doc(self):
        docs, store = corpus.build_reference_shaped_doc()
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = _sorted_output(pipeline.extract_dataset(docs, store, num_partitions=2))
        _assert_span_equality(out, expected)
        # exactly-once per input span: 24 spans, 1:1 with the golden's blocks
        assert len(out.column("spans")[0].as_py()) == 24

    def test_kind_imbalanced_corpus_both_modes(self):
        """Bursty / kind-imbalanced load (SURVEY #4 skew row, the reference's
        30 s load-balance daemon analogue, Manager.java:169-201): a corpus
        that is ~90% image spans must not starve the text branch in either
        routing. Split mode uses per-kind AUTOSCALING pools -- an idle branch
        scales to its floor while the hot branch takes the CPUs (resource-
        based rebalancing replaces the daemon); fused mode rebalances by
        construction. Both must equal the oracle exactly."""
        import random

        rng = random.Random(99)
        spans_col, ids = [], []
        for i in range(120):
            spans = []
            offset = 1
            # 10 image spans per doc, 1 text span on every 10th doc
            for k in range(10):
                spans.append({"kind": "image", "text": "",
                              "media_ref": corpus.media_ref_img(rng.randrange(50)),
                              "offset": offset})
                offset += rng.randint(1, 9)
            if i % 10 == 0:
                spans.append({"kind": "text", "text": f"tiny text {i}",
                              "media_ref": "", "offset": offset})
            ids.append(f"doc-imb-{i:05d}")
            spans_col.append(spans)
        docs = pa.table({"doc_id": ids, "spans": spans_col}, schema=corpus.DOC_SCHEMA)
        store = corpus.build_media_store(n_img=50, n_pdf=0, seed=99)
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        fused = _sorted_output(pipeline.extract_dataset(docs, store, num_partitions=8))
        split = _sorted_output(
            pipeline.extract_dataset(docs, store, num_partitions=8, mode="split")
        )
        _assert_span_equality(fused, expected)
        _assert_span_equality(split, expected)

    def test_explode_cardinality(self, small_corpus):
        docs, _ = small_corpus
        ds = pipeline.exploded_dataset(docs, num_partitions=4)
        n_in = sum(len(r) for r in docs.column("spans").to_pylist())
        n_empty = sum(
            1
            for r in docs.column("spans").to_pylist()
            for s in r
            if s["kind"] == "text" and not s["text"].strip()
        )
        assert ds.count() == n_in - n_empty

    def test_lance_source(self, small_corpus, tmp_path):
        """Same result when reading from the Lance-style on-disk table."""
        docs, store = small_corpus
        from distributed_system___ocr_ray.sources import lance_like

        lance_like.write_table(docs, str(tmp_path / "docs"), rows_per_fragment=17)
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = pipeline.extract_dataset(str(tmp_path / "docs"), store, num_partitions=8)
        _assert_span_equality(_sorted_output(out), expected)


@pytest.mark.usefixtures("ray_session")
class TestCheckpoint:
    def test_run_commit_and_resume(self, small_corpus, tmp_path):
        docs, store = small_corpus
        out_dir = str(tmp_path / "out")
        m1 = pipeline.run_extraction(docs, store, out_dir, num_partitions=8)
        assert m1["partitions_skipped_prior"] == 0
        assert m1["docs_out"] == docs.num_rows
        # full resume: nothing recomputed
        m2 = pipeline.run_extraction(docs, store, out_dir, num_partitions=8)
        assert m2["partitions_run"] == 0
        assert m2["docs_out"] == docs.num_rows

    def test_partial_resume_identical_output(self, small_corpus, tmp_path):
        """Kill-after-K-partitions simulation: commit a subset, resume, and
        the final output equals an uninterrupted run byte-for-byte."""
        from distributed_system___ocr_ray.state.checkpoint import CheckpointManifest

        docs, store = small_corpus
        full_dir = str(tmp_path / "full")
        pipeline.run_extraction(docs, store, full_dir, num_partitions=8)

        part_dir = str(tmp_path / "partial")
        pipeline.run_extraction(docs, store, part_dir, num_partitions=8)
        # simulate a crash that lost half the partitions
        import os
        import shutil

        man = CheckpointManifest(part_dir)
        for p in list(man.committed())[::2]:
            os.remove(os.path.join(man.dir, f"part-{p}.json"))
            shutil.rmtree(os.path.join(part_dir, f"part={p}"))
        m = pipeline.run_extraction(docs, store, part_dir, num_partitions=8)
        assert m["partitions_skipped_prior"] == 4
        a = _sorted_output(pipeline.load_output(full_dir))
        b = _sorted_output(pipeline.load_output(part_dir))
        _assert_span_equality(a, b)

    def test_lineage_counts(self, small_corpus, tmp_path):
        docs, store = small_corpus
        out_dir = str(tmp_path / "out")
        m = pipeline.run_extraction(docs, store, out_dir, num_partitions=8)
        n_in = sum(len(r) for r in docs.column("spans").to_pylist())
        n_empty = sum(
            1
            for r in docs.column("spans").to_pylist()
            for s in r
            if s["kind"] == "text" and not s["text"].strip()
        )
        assert m["rows_in"] == n_in - n_empty
        assert sum(m["status_counts"].values()) == m["rows_in"]


@pytest.mark.usefixtures("ray_session")
class TestSkew:
    def test_skewed_doc(self):
        """One 10k-span doc + a ~5 MB text span among 200 small docs."""
        docs = corpus.build_skew_documents(n_small=200, big_spans=2000)
        store = corpus.build_media_store(n_img=200, n_pdf=100, seed=42)
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = _sorted_output(pipeline.extract_dataset(docs, store, num_partitions=8))
        _assert_span_equality(out, expected)


@pytest.mark.usefixtures("ray_session")
class TestShardedMediaStore:
    def test_bucketed_media_path_matches_broadcast(self, small_corpus, tmp_path):
        """Extraction against a hash-bucketed media table (the 100 TB media
        routing: per-actor lazy bucket fetch + LRU) must be row-identical
        to the broadcast-dict run."""
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like

        docs, store = small_corpus
        media_dir = str(tmp_path / "media")
        lance_like.write_bucketed(rd.from_arrow(store), media_dir, "media_ref", 4)
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = pipeline.extract_dataset(docs, media_dir, num_partitions=8)
        _assert_span_equality(_sorted_output(out), expected)

    def test_lru_bound_and_misses(self, small_corpus, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like
        from distributed_system___ocr_ray.stages.extractors import ShardedMediaStore

        _, store = small_corpus
        media_dir = str(tmp_path / "media")
        lance_like.write_bucketed(rd.from_arrow(store), media_dir, "media_ref", 8)
        s = ShardedMediaStore(media_dir, max_buckets=2)
        refs = store.column("media_ref").to_pylist()
        payloads = store.column("payload").to_pylist()
        for r, p in zip(refs, payloads):
            assert s.get(r) == p
        assert len(s._cache) <= 2  # LRU bound held across all buckets
        assert s.get("no-such-ref") is None
        assert s.get("no-such-ref", b"dflt") == b"dflt"

    def test_non_media_bucketed_table_raises(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like
        from distributed_system___ocr_ray.stages.extractors import ShardedMediaStore

        t = pa.table({"other": pa.array([1, 2], pa.int64())})
        lance_like.write_bucketed(rd.from_arrow(t), str(tmp_path / "x"), "other", 2)
        with pytest.raises(ValueError, match="bucketed by media_ref"):
            ShardedMediaStore(str(tmp_path / "x"))


class TestAttributionLastTouch:
    def test_hand_built_stream(self, tmp_path):
        import datetime

        from distributed_system___ocr_ray.pipelines import relational

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            # user 1: view -> purchase(10) -> click -> purchase(20)
            (1, t0, "view", 1, 0.0),
            (1, t0 + datetime.timedelta(hours=1), "purchase", 2, 10.0),
            (1, t0 + datetime.timedelta(hours=2), "click", 3, 0.0),
            (1, t0 + datetime.timedelta(hours=3), "purchase", 4, 20.0),
            # user 2: purchase with no prior touch
            (2, t0, "purchase", 5, 5.0),
        ]
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "event_id": pa.array([r[3] for r in rows], pa.int64()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        out = relational.attribution_last_touch(str(tmp_path))
        got = {
            r["channel"]: (r["n_conversions"], r["value_cents"])
            for _, r in out.iterrows()
        }
        assert got == {"(none)": (1, 500), "view": (1, 1000), "click": (1, 2000)}


class TestDocCompleteness:
    def test_invariants_and_known_incomplete(self):
        from distributed_system___ocr_ray.pipelines import compose

        out = compose.doc_completeness_by_lang(
            "/root/testdata/sf0.001").to_pandas()
        # every sf0.001 doc lands in exactly one lang row
        assert int(out["n_docs"].sum()) == 500
        assert (out["n_complete"] <= out["n_docs"]).all()
        # broken refs exist by construction (doc_id % 20 == 0 download
        # errors), so completeness is strictly below 100% overall
        assert int(out["n_complete"].sum()) < 500
        for _, r in out.iterrows():
            assert int(r["complete_ppm"]) == (
                int(r["n_complete"]) * 1_000_000 // int(r["n_docs"]))


class TestSpanProfile:
    def test_kinds_and_mean_math(self):
        from distributed_system___ocr_ray.pipelines import compose

        out = compose.span_profile_by_kind(
            "/root/testdata/sf0.001").to_pandas()
        kinds = set(out["kind"])
        assert kinds == {"text", "image", "pdf"}
        # every doc has exactly one text span; image spans = 1 + (i % 2)
        n = out.set_index("kind")["n_spans"]
        assert int(n.loc["text"]) == 500
        assert int(n.loc["image"]) == 500 + 250  # 250 odd doc_ids get 2
        assert int(n.loc["pdf"]) == 250  # even doc_ids only
        for _, r in out.iterrows():
            assert int(r["mean_chars_milli"]) == (
                int(r["total_chars"]) * 1000 // int(r["n_spans"]))


class TestRetryPlan:
    def test_statuses_and_counts(self):
        from distributed_system___ocr_ray.pipelines import compose

        out = compose.retry_plan("/root/testdata/sf0.001").to_pandas()
        assert set(out["status"]) <= {"download_error", "ocr_error",
                                      "parse_error"}
        assert (out["n_spans"] >= 1).all()
        # every 20th doc's first image ref is broken by construction:
        # 25 download_error missing-img sentinels from the k=0 spans alone
        miss = out[out["media_ref"].str.startswith("mem://img/missing-")]
        assert (miss["status"] == "download_error").all()
        assert len(miss) >= 25
        # sentinels are per-doc, so each appears exactly once
        assert (miss["n_spans"] == 1).all()
