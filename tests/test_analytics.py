"""Tests for dedup / similarity / textstats / relational operators at sf0.001,
cross-checked against DuckDB or numpy brute force."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(ds):
    return ds.to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_pricing_summary_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.pricing_summary(SF))
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS sum_qty_cents,
                   SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS sum_base_cents,
                   COUNT(*) AS n_rows
            FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert got["sum_qty_cents"].tolist() == exp["sum_qty_cents"].tolist()
        assert got["sum_base_cents"].tolist() == exp["sum_base_cents"].tolist()
        assert got["n_rows"].tolist() == exp["n_rows"].tolist()

    def test_revenue_by_nation_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.revenue_by_nation(SF)).sort_values("n_name").reset_index(drop=True)
        exp = duckdb.sql(
            f"""
            SELECT n.n_name,
                   SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert got["n_name"].tolist() == exp["n_name"].tolist()
        assert got["revenue_cents"].tolist() == exp["revenue_cents"].tolist()
        assert got["n_orders"].tolist() == exp["n_orders"].tolist()

    def test_events_daily_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.events_daily(SF)).sort_values(["event_type", "day"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS value_cents,
                   COUNT(*) AS n_events
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert got["day"].tolist() == exp["day"].tolist()
        assert got["value_cents"].tolist() == exp["value_cents"].tolist()

    def test_top_users_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.top_users_by_value(SF, k=10))
        exp = duckdb.sql(
            f"""
            SELECT user_id, SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS total_value_cents
            FROM '{SF}/events.parquet' GROUP BY 1
            ORDER BY total_value_cents DESC, user_id LIMIT 10
            """
        ).df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["total_value_cents"].tolist() == exp["total_value_cents"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup_groups_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            _pdf(analytics.exact_dedup_groups(ds))
            .sort_values(["keeper_doc_id"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies "
            f"FROM '{SF}/documents.parquet' GROUP BY text ORDER BY 1"
        ).df()
        assert got["keeper_doc_id"].tolist() == exp["keeper_doc_id"].tolist()
        assert got["n_copies"].tolist() == exp["n_copies"].tolist()

    def test_dangling_ref_audit_hand_fixture(self):
        """2 image refs resolvable, 1 image ref dangling (twice), 1 pdf
        dangling; text spans ignored; distinct vs total counted right."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        rows = [
            ("text", ""), ("image", "a"), ("image", "b"),
            ("image", "GONE"), ("image", "GONE"), ("pdf", "NOPE"),
        ]
        ds = rd.from_arrow(pa.table({
            "kind": pa.array([k for k, _ in rows]),
            "media_ref": pa.array([r for _, r in rows]),
        }))
        got = analytics.dangling_ref_audit(ds, {"a", "b", "p1"})
        got = got.set_index("kind")
        assert got.loc["image"].tolist() == [4, 3, 2, 1]
        assert got.loc["pdf"].tolist() == [1, 1, 1, 1]

    def test_orphan_media_audit_hand_fixture(self):
        """Store of 3 images + 1 pdf; spans reference 2 images (one
        twice) and nothing else -> 1 image orphan, 1 pdf orphan;
        out-of-store span refs never count as referenced."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        store = pa.table({
            "media_ref": pa.array(["i1", "i2", "i3", "p1"]),
            "kind": pa.array(["image", "image", "image", "pdf"]),
        })
        spans = rd.from_arrow(pa.table({
            "kind": pa.array(["image", "image", "image", "text"]),
            "media_ref": pa.array(["i1", "i1", "i2", ""]),
        }))
        got = analytics.orphan_media_audit(spans, store).set_index("kind")
        assert got.loc["image"].tolist() == [3, 2, 1]
        assert got.loc["pdf"].tolist() == [1, 0, 1]

    def test_media_dedup_groups_mirrors(self):
        """Exact payload dedup: a CDN-mirror replica set resolves to one
        keeper per content group with the mirror counted; distinct
        payloads stay singletons; the binary never crosses the shuffle
        (digest + ref only)."""
        import ray.data as rd

        from distributed_system___ocr_ray import corpus
        from distributed_system___ocr_ray.pipelines import analytics

        store = corpus.build_media_store(n_img=30, n_pdf=15, seed=42)
        refs = store.column("media_ref").to_pylist()
        payloads = store.column("payload").to_pylist()
        mirror_refs = ["mirror://" + r[len("mem://"):] for r in refs[:10]]
        full = pa.table({
            "media_ref": pa.array(refs + mirror_refs),
            "payload": pa.array(payloads + payloads[:10], pa.binary()),
        })
        got = _pdf(analytics.media_dedup_groups(rd.from_arrow(full)))
        assert len(got) == 45  # one group per distinct payload
        by_keeper = dict(zip(got["keeper_ref"], got["n_refs"]))
        for r in refs[:10]:
            assert by_keeper[r] == 2  # mem:// sorts before mirror://
        for r in refs[10:]:
            assert by_keeper[r] == 1

    def test_exact_dedup_rows(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = _pdf(analytics.exact_dedup(ds))
        n_distinct = duckdb.sql(
            f"SELECT COUNT(DISTINCT text) FROM '{SF}/documents.parquet'"
        ).fetchone()[0]
        assert len(got) == n_distinct

    def test_exact_dedup_semifilter_both_paths(self):
        """Semi-filter variant == single-pass exact_dedup, on both the
        broadcast fast path and the forced bucketed-join scale path."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        def read():
            return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])

        exp = (
            _pdf(analytics.exact_dedup(read()))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for cap in (256 << 20, 0):  # broadcast path, then forced join path
            got = (
                _pdf(analytics.exact_dedup_semifilter(read(), broadcast_keepers_bytes=cap))
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert got["doc_id"].tolist() == exp["doc_id"].tolist(), f"cap={cap}"
            assert got["lang"].tolist() == exp["lang"].tolist(), f"cap={cap}"
            assert got["text"].tolist() == exp["text"].tolist(), f"cap={cap}"

    def test_minhash_finds_planted_neardups(self, planted_dups):
        from distributed_system___ocr_ray.pipelines import analytics

        ds, expected_pairs = planted_dups
        got = _pdf(analytics.minhash_lsh_pairs(ds, threshold=0.6))
        found = {tuple(sorted((a, b))) for a, b in zip(got["doc_a"], got["doc_b"])}
        for pair in expected_pairs:
            assert pair in found, f"missed planted near-dup {pair}"

    def test_simhash_finds_planted_neardups(self, planted_dups):
        from distributed_system___ocr_ray.pipelines import analytics

        ds, expected_pairs = planted_dups
        got = _pdf(analytics.simhash_pairs(ds, max_hamming=6))
        found = {tuple(sorted((a, b))) for a, b in zip(got["doc_a"], got["doc_b"])}
        for pair in expected_pairs:
            assert pair in found

    def test_ngram_jaccard_finds_planted_neardups(self, planted_dups):
        from distributed_system___ocr_ray.pipelines import analytics

        ds, expected_pairs = planted_dups
        got = _pdf(analytics.ngram_jaccard_pairs(ds, threshold=0.5))
        found = {tuple(sorted((a, b))) for a, b in zip(got["doc_a"], got["doc_b"])}
        for pair in expected_pairs:
            assert pair in found

    def test_embedding_neardup_planted(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # testdata embeddings have no true near-dups (max pairwise cos 0.48),
        # so plant 5: vec_id 1000+j is vec j plus tiny noise
        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        vecs = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
        ids = list(tbl.column("vec_id").to_pylist())
        rng = np.random.RandomState(5)
        planted = []
        rows_v, rows_i = list(vecs), list(ids)
        for j in range(5):
            rows_v.append(vecs[j] + rng.randn(vecs.shape[1]) * 0.01)
            rows_i.append(1000 + j)
            planted.append((ids[j], 1000 + j))
        df = pd.DataFrame({"vec_id": rows_i, "embedding": [np.asarray(v, np.float32) for v in rows_v]})
        ds = rd.from_pandas(df)
        got = _pdf(analytics.embedding_neardup_pairs(ds, threshold=0.95))
        found = {tuple(sorted((a, b))) for a, b in zip(got["vec_a"], got["vec_b"])}
        for pair in planted:
            assert tuple(sorted(pair)) in found, f"missed planted near-dup {pair}"
        # reported sims are real: verify against brute force
        idx = {v: i for i, v in enumerate(rows_i)}
        unit = np.stack(rows_v)
        unit = unit / np.linalg.norm(unit, axis=1, keepdims=True)
        for a, b, s in zip(got["vec_a"], got["vec_b"], got["cos_sim"]):
            assert abs(float(unit[idx[a]] @ unit[idx[b]]) - s) < 1e-4


@pytest.fixture(scope="session")
def planted_dups(ray_session):
    """60 distinct docs + 3 planted near-duplicate pairs (small edits)."""
    import ray.data as rd

    import pandas as pd
    import random

    rng = random.Random(99)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(words) for _ in range(80))
        rows.append({"doc_id": i, "text": text})
    expected = set()
    for j, base in enumerate([3, 17, 42]):
        t = rows[base]["text"].split()
        t[5] = "CHANGED"
        rows.append({"doc_id": 100 + j, "text": " ".join(t)})
        expected.add((base, 100 + j))
    return rd.from_pandas(pd.DataFrame(rows)), expected


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def _brute(self, q, k=10):
        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        vecs = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
        ids = np.array(tbl.column("vec_id").to_pylist())
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = qn @ unit.T
        out = []
        for row in sims:
            order = np.lexsort((ids, -row))[:k]
            out.append(ids[order].tolist())
        return out

    def test_ann_topk_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        q = np.stack(tbl.column("embedding").to_pylist()[:3]).astype(np.float64)
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = _pdf(analytics.ann_topk(ds, q, k=10))
        exp = self._brute(q, k=10)
        for qi in range(3):
            g = got[got["query_id"] == qi]["vec_id"].tolist()
            assert g == exp[qi], f"query {qi}: {g} != {exp[qi]}"

    def test_ivf_topk_recall(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        q = np.stack(tbl.column("embedding").to_pylist()[:3]).astype(np.float64)
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = _pdf(analytics.ivf_topk(ds, q, k=10, n_centroids=8, n_probe=4))
        exp = self._brute(q, k=10)
        for qi in range(3):
            g = set(got[got["query_id"] == qi]["vec_id"].tolist())
            recall = len(g & set(exp[qi])) / 10
            assert recall >= 0.6, f"query {qi} recall {recall}"


@pytest.mark.usefixtures("ray_session")
class TestTextStats:
    def test_token_count_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.token_count_by_key(ds, key="lang")).sort_values("lang").reset_index(drop=True)
        exp = duckdb.sql(
            f"""
            SELECT lang, SUM(length(regexp_extract_all(text, '\\S+'))) AS n_ws_tokens
            FROM '{SF}/documents.parquet' GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert got["lang"].tolist() == exp["lang"].tolist()
        assert got["n_ws_tokens"].tolist() == [int(x) for x in exp["n_ws_tokens"]]

    def test_top_orders_skewed_segments_and_misses(self, tmp_path):
        """10x-skewed segment + custkeys absent from customer: the partial
        top-k path must stay exact (vs DuckDB) and misses must DROP
        (inner-join semantics), not crash the task."""
        import pandas as pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from distributed_system___ocr_ray.pipelines import relational

        rng = np.random.RandomState(9)
        cust = pd.DataFrame(
            {"c_custkey": np.arange(1, 301),
             "c_mktsegment": ["BIG"] * 100 + ["MID"] * 100 + ["SML"] * 100}
        )
        n_big, n_other = 20000, 2000  # 10x skew into BIG
        custkeys = np.concatenate(
            [rng.randint(1, 101, n_big), rng.randint(101, 301, n_other),
             np.full(50, 9999)]  # 50 orders with custkey absent from customer
        )
        orders = pd.DataFrame(
            {"o_orderkey": np.arange(len(custkeys)), "o_custkey": custkeys,
             "o_totalprice": rng.uniform(10, 1e6, len(custkeys)).round(2)}
        )
        sf = str(tmp_path)
        _pq.write_table(_pa.Table.from_pandas(cust), f"{sf}/customer.parquet")
        _pq.write_table(_pa.Table.from_pandas(orders), f"{sf}/orders.parquet", row_group_size=512)
        got = (
            _pdf(relational.top_orders_per_segment(sf, k=3))
            .sort_values(["c_mktsegment", "o_orderkey"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT c.c_mktsegment, o.o_orderkey,
                   CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
            FROM '{sf}/orders.parquet' o JOIN '{sf}/customer.parquet' c
              ON o.o_custkey = c.c_custkey
            QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
              ORDER BY price_cents DESC, o.o_orderkey) <= 3
            ORDER BY 1, 2
            """
        ).df()
        assert got["c_mktsegment"].tolist() == exp["c_mktsegment"].tolist()
        assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
        assert got["price_cents"].tolist() == exp["price_cents"].tolist()

    def test_ws_tokenization_matches_re2_on_unicode_whitespace(self):
        """The kernels tokenize with the RE2-\\S-equivalent ASCII class, so a
        doc with NBSP / vertical tab splits identically to DuckDB's '\\S+'
        (latent-parity guard: shipped corpora are pure ASCII)."""
        import pandas as pd

        from distributed_system___ocr_ray.functions import dedup as dk
        from distributed_system___ocr_ray.functions import textstats as ts

        tricky = "a\xa0b c\x0bd e"  # NBSP and \v are TOKEN chars in RE2
        exp = duckdb.sql("SELECT len(regexp_extract_all(?, '\\S+'))", params=[tricky]).fetchone()[0]
        got = ts.token_counts(pd.Series([tricky]))["n_ws_tokens"].iloc[0]
        assert got == exp == 3
        # shingle tokenization uses the same class
        exp_words = duckdb.sql(
            "SELECT regexp_extract_all(?, '\\S+')", params=[tricky]
        ).fetchone()[0]
        assert len(dk.shingle_hashes(tricky, k=3)) == max(1, len(exp_words) - 2)

    def test_exact_quantile_vs_duckdb(self):
        """Histogram-bisection quantile == the rank-k element (several q
        values; tiny pull_limit forces multiple distributed rounds)."""
        import math

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["value"])
        n = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/events.parquet'").fetchone()[0]
        for q in (0.1, 0.5, 0.9, 0.99):
            got = analytics.exact_quantile(ds, "value", q=q, bins=64, pull_limit=50)
            k = max(1, math.ceil(q * n))
            exp = duckdb.sql(
                f"SELECT value FROM '{SF}/events.parquet' ORDER BY value LIMIT 1 OFFSET {k - 1}"
            ).fetchone()[0]
            assert got == exp, (q, got, exp)
        # constant column edge
        import pandas as pd

        const = rd.from_pandas(pd.DataFrame({"v": [7.5] * 100}))
        assert analytics.exact_quantile(const, "v", q=0.5) == 7.5

    def test_quality_and_langid_and_fingerprint(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        q = _pdf(analytics.quality_scores(ds))
        assert ((q["quality_ppm"] >= 0) & (q["quality_ppm"] <= 1_000_000)).all()
        li = _pdf(analytics.language_id(ds))
        assert set(li["pred_lang"]) <= {"en", "de", "fr", "es", "zh", "unknown"}
        fp = _pdf(analytics.fingerprints(ds))
        assert fp["fingerprint"].str.len().eq(16).all()
        # md5-prefix kernel: spot-check one row against hashlib directly
        import hashlib

        doc0 = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet' WHERE doc_id = 0").fetchone()[0]
        norm = " ".join(doc0.split())
        expected0 = hashlib.md5(norm.encode()).hexdigest()[:16]
        assert fp.set_index("doc_id").loc[0, "fingerprint"] == expected0
        # fingerprint is deterministic: same text -> same fingerprint
        fp2 = _pdf(analytics.fingerprints(ds))
        assert fp.sort_values("doc_id")["fingerprint"].tolist() == fp2.sort_values("doc_id")["fingerprint"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestDedupClusters:
    def test_min_label_propagation_chain(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: two components
        pairs = rd.from_pandas(
            pd.DataFrame({"doc_a": [1, 2, 3, 10], "doc_b": [2, 3, 4, 11]})
        )
        out = analytics.dedup_clusters(pairs).to_pandas().set_index("doc_id")["cluster_id"]
        assert out.loc[[1, 2, 3, 4]].tolist() == [1, 1, 1, 1]
        assert out.loc[[10, 11]].tolist() == [10, 10]

    def test_long_chain_converges_with_int_labels(self):
        """Regression (code-review finding): a 10-node chain is ONE component
        and labels stay int64 (no float upcast through the join padding)."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        pairs = rd.from_pandas(
            pd.DataFrame({"doc_a": list(range(1, 10)), "doc_b": list(range(2, 11))})
        )
        out = analytics.dedup_clusters(pairs).to_pandas()
        assert out["cluster_id"].dtype.kind == "i", out.dtypes
        assert set(out["cluster_id"]) == {1}, out

    def test_clusters_from_planted_minhash(self, planted_dups):
        from distributed_system___ocr_ray.pipelines import analytics

        ds, expected_pairs = planted_dups
        pairs = analytics.minhash_lsh_pairs(ds, threshold=0.6)
        out = analytics.dedup_clusters(pairs).to_pandas()
        labels = dict(zip(out["doc_id"], out["cluster_id"]))
        for a, b in expected_pairs:
            assert labels[a] == labels[b]


@pytest.mark.usefixtures("ray_session")
class TestSketches:
    def test_hll_accuracy_vs_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.sketches import approx_distinct

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        est = approx_distinct(ds, "user_id")
        exact = duckdb.sql(f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'").fetchone()[0]
        assert abs(est - exact) / max(exact, 1) < 0.10, (est, exact)

    def test_hll_merge_equals_single(self):
        from distributed_system___ocr_ray.functions.sketches import HyperLogLog

        vals = [f"v{i}" for i in range(10_000)]
        one = HyperLogLog().add_many(vals)
        a = HyperLogLog().add_many(vals[:5000])
        b = HyperLogLog().add_many(vals[5000:])
        merged = a.merge(b)
        assert (merged.registers == one.registers).all()
        est = merged.estimate()
        assert abs(est - 10_000) / 10_000 < 0.05, est

    def test_hll_roundtrip_bytes(self):
        from distributed_system___ocr_ray.functions.sketches import HyperLogLog

        h = HyperLogLog().add_many([b"a", b"b", 42, "c"])
        h2 = HyperLogLog.from_bytes(h.to_bytes())
        assert (h2.registers == h.registers).all()


@pytest.mark.usefixtures("ray_session")
class TestComposedPipeline:
    def test_extract_embed_neardup_finds_duplicated_docs(self, small_corpus):
        import pyarrow as pa

        from distributed_system___ocr_ray import corpus as cg
        from distributed_system___ocr_ray.pipelines.compose import extract_embed_neardup

        docs, store = small_corpus
        # plant 4 duplicate documents (same spans, new ids)
        dup_ids = [f"dup-{i}" for i in range(4)]
        dups = pa.table(
            {"doc_id": dup_ids, "spans": [docs.column("spans")[i].as_py() for i in range(4)]},
            schema=cg.DOC_SCHEMA,
        )
        all_docs = pa.concat_tables([docs, dups]).combine_chunks()
        pairs = extract_embed_neardup(all_docs, store, threshold=0.999).to_pandas()
        found = {tuple(sorted((a, b))) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
        for i, d in enumerate(dup_ids):
            orig = docs.column("doc_id")[i].as_py()
            assert tuple(sorted((orig, d))) in found, f"missed planted duplicate {orig}~{d}"


class TestBM25:
    def test_bm25_ranking_and_oracle_parity(self, ray_session):
        """Hand-checkable corpus: the rare term ranks its one holder first;
        docs missing every query term are excluded; k caps the result; and
        the DuckDB oracle (same tokenization/idf/ppm arithmetic) agrees
        exactly."""
        import duckdb
        import pandas as pd
        import ray.data as rd

        import __ray_entry__ as entry_mod
        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "zebra apple apple apple",       # doc 0: only holder of 'zebra'
            "apple apple apple apple",       # doc 1: high tf of common term
            "apple banana",                  # doc 2
            "banana banana cherry",          # doc 3: no query term -> excluded
            "apple",                         # doc 4: short doc, low tf
        ]
        docs = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
        # query 2's term never occurs: it must vanish from BOTH outputs
        # (df=0 only reaches idf through matched rows, of which there are none)
        queries = ["zebra apple", "cherry", "zzzqqq"]
        out = (
            analytics.bm25_topk(rd.from_pandas(docs), queries, k=3)
            .to_pandas()
            .sort_values(["query_id", "score_ppm", "doc_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        q0 = out[out.query_id == 0]
        assert list(q0.doc_id)[0] == 0, "the only zebra holder must rank first"
        assert 3 not in set(q0.doc_id), "doc without any query term must be excluded"
        assert len(q0) == 3, "k must cap the per-query result"
        q1 = out[out.query_id == 1]
        assert list(q1.doc_id) == [3], "'cherry' matches exactly doc 3"
        assert 2 not in set(out.query_id), "a query matching nothing emits no rows"

        con = duckdb.connect()
        con.register("documents", docs)
        sql = entry_mod._bm25_sql(queries, k=3)
        odf = (
            con.execute(sql).df()
            .sort_values(["query_id", "score_ppm", "doc_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        assert out[["query_id", "doc_id", "score_ppm"]].astype(int).values.tolist() == \
            odf[["query_id", "doc_id", "score_ppm"]].astype(int).values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestCorpusHygiene:
    """Round-3 hygiene ops: PII redaction, decontamination, stratified
    sampling, sequence packing."""

    def test_redact_pii_kernel_edges(self):
        import pandas as pd

        from distributed_system___ocr_ray.functions import scrub

        s = pd.Series(
            [
                "mail me at a.b-c%d@ex-ample.co.uk now",
                "see https://x.y/z?a=1&u=someone@example.com trailing",
                "call +1-555-0042 or (030)123456 done",
                "no pii here",
                None,
            ]
        )
        got = scrub.redact_pii(s).tolist()
        assert got[0] == "mail me at <EMAIL> now"
        # the URL (including its embedded @) is consumed by the URL pass
        assert got[1] == "see <URL> trailing"
        assert got[2] == "call <PHONE> or <PHONE> done"
        assert got[3] == "no pii here"
        assert got[4] == ""

    def test_contamination_planted(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        eval_texts = ["alpha beta gamma delta epsilon zeta eta theta tail words"]
        corpus = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # contains the eval probe (first 8 tokens), extra WS + case
                    "prefix ALPHA  beta\tgamma delta epsilon zeta eta THETA suffix",
                    "completely unrelated text with many words in it",
                    "alpha beta gamma delta epsilon zeta eta",  # only 7 tokens of it
                ],
            }
        )
        out = (
            analytics.contamination_flags(
                rd.from_pandas(corpus),
                rd.from_pandas(pd.DataFrame({"doc_id": [9], "text": eval_texts})),
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_hits"].tolist() == [1, 0, 0]

    def test_stratified_sample_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
        got = (
            analytics.stratified_sample(ds, key="lang", fractions={"en": 0.5}, default=0.1)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"SELECT doc_id, lang FROM '{SF}/documents.parquet' "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            "CASE lang WHEN 'en' THEN '7fffffff' ELSE '19999999' END ORDER BY doc_id"
        ).df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()

    def test_pack_sequences_vs_duckdb_window(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        # small ranges force multi-range prefix-sum composition
        got = (
            analytics.pack_sequences(ds, seq_len=256, ranges=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            "SELECT doc_id, CAST(FLOOR((SUM(len(regexp_extract_all(text, '\\S+'))) "
            "OVER (ORDER BY doc_id) - len(regexp_extract_all(text, '\\S+'))) / 256) AS BIGINT) "
            f"AS pack_id FROM '{SF}/documents.parquet' ORDER BY doc_id"
        ).df()
        assert got["pack_id"].tolist() == exp["pack_id"].tolist()
        # packs are contiguous in doc order and start at 0
        assert got["pack_id"].iloc[0] == 0
        assert (got["pack_id"].diff().dropna() >= 0).all()

    def test_repetition_stats_edges_and_parity(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        planted = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "spam spam spam spam spam",  # one token 100%, all bigrams dup
                    "all distinct tokens in here",
                    "one",  # no bigrams
                    "",  # no tokens at all
                ],
            }
        )
        got = (
            analytics.repetition_stats(rd.from_pandas(planted))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["top_token_ppm"].tolist() == [1000000, 200000, 1000000, 0]
        # 4 bigram occurrences, 1 distinct -> 750000 ppm
        assert got["dup_2gram_ppm"].tolist() == [750000, 0, 0, 0]

        # corpus parity vs the SQL replay
        got2 = (
            analytics.repetition_stats(
                rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\f\r]+') AS toks
                       FROM '{SF}/documents.parquet'),
            tok AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i FROM t),
            cnt AS (SELECT doc_id, tok, COUNT(*) c FROM tok GROUP BY 1, 2),
            top AS (SELECT doc_id, CAST(FLOOR(MAX(c) * 1e6 / SUM(c) + 0.5) AS BIGINT) top_token_ppm
                    FROM cnt GROUP BY 1),
            bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram FROM tok a
                   JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            dup AS (SELECT doc_id, CAST(FLOOR((COUNT(*) - COUNT(DISTINCT bigram)) * 1e6
                    / COUNT(*) + 0.5) AS BIGINT) dup_2gram_ppm FROM bg GROUP BY 1)
            SELECT t.doc_id, COALESCE(top.top_token_ppm, 0) top_token_ppm,
                   COALESCE(dup.dup_2gram_ppm, 0) dup_2gram_ppm
            FROM t LEFT JOIN top USING(doc_id) LEFT JOIN dup USING(doc_id) ORDER BY doc_id
            """
        ).df()
        assert got2["top_token_ppm"].tolist() == exp["top_token_ppm"].tolist()
        assert got2["dup_2gram_ppm"].tolist() == exp["dup_2gram_ppm"].tolist()

    def test_quantize_embeddings_roundtrip(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        out = analytics.quantize_embeddings(ds).to_pandas().sort_values("vec_id")
        orig = (
            pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
            .to_pandas()
            .sort_values("vec_id")
        )
        Q = np.stack(out["q_embedding"].to_numpy())
        V = np.stack(orig["embedding"].to_numpy()).astype(np.float64)
        assert Q.dtype == np.int8
        # dequantization error is bounded by half a quantization step
        scale = out["scale"].to_numpy()
        err = np.abs(Q.astype(np.float64) * scale[:, None] - V)
        assert (err <= scale[:, None] / 2 + 1e-12).all()
        # scale really is max|v|/127 (non-degenerate vectors)
        assert np.allclose(scale, np.abs(V).max(axis=1) / 127.0)

    def test_novel_docs_both_paths(self):
        """Novelty filter drops planted overlap and keeps the rest, on the
        broadcast path and the forced bucketed-anti-join path."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        corpus = pd.DataFrame(
            {
                "doc_id": list(range(100, 110)),
                "text": [f"committed corpus document number {i}" for i in range(10)],
            }
        )
        new = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": [
                    "committed corpus document number 0",  # dup of corpus
                    "a genuinely fresh crawl document",
                    "committed corpus document number 7",  # dup of corpus
                    "another fresh one entirely",
                    "committed corpus document number 9",  # dup of corpus
                    "third novel document text",
                ],
            }
        )
        for cap in (256 << 20, 0):
            got = (
                analytics.novel_docs(
                    rd.from_pandas(new), rd.from_pandas(corpus), broadcast_hashes_bytes=cap
                )
                .to_pandas()
                .sort_values("doc_id")["doc_id"]
                .tolist()
            )
            assert got == [2, 4, 6], f"cap={cap}"


@pytest.mark.usefixtures("ray_session")
class TestIngestIncrement:
    def test_two_increments_grow_corpus_once(self, tmp_path):
        """Daily-ingest composition: hygiene drop, in-batch dedup, novelty
        vs the growing corpus, append versioning."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        corpus_dir = str(tmp_path / "corpus")
        good = "the and of to in is a good long document " * 8  # passes quality
        day1 = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    good + "alpha",
                    good + "alpha",  # in-batch duplicate
                    good + "beta",
                    "x",  # fails the length/quality gate
                ],
            }
        )
        s1 = compose.ingest_increment(rd.from_pandas(day1), corpus_dir)
        assert s1["rows_in"] == 4
        assert s1["after_hygiene"] == 3  # 'x' dropped
        assert s1["after_dedup"] == 2  # alpha-dup collapsed
        assert s1["after_novelty"] == 2  # empty corpus: all novel
        assert s1["corpus_version"] == 1 and s1["corpus_rows"] == 2

        day2 = pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    good + "alpha",  # already committed on day 1
                    good + "gamma",  # genuinely new
                    "spam " * 50,  # fails the repetition gate
                ],
            }
        )
        s2 = compose.ingest_increment(rd.from_pandas(day2), corpus_dir)
        assert s2["after_hygiene"] == 2
        assert s2["after_novelty"] == 1  # alpha rejected by the corpus
        assert s2["corpus_version"] == 2 and s2["corpus_rows"] == 3

        texts = sorted(lance_like.read_arrow(corpus_dir).column("text").to_pylist())
        assert texts == sorted([good + "alpha", good + "beta", good + "gamma"])

    def test_compaction_trigger(self, tmp_path):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        corpus_dir = str(tmp_path / "corpus")
        good = "the and of to in is a good long document " * 8
        last = {}
        for day in range(4):
            inc = pd.DataFrame(
                {
                    "doc_id": [day * 10 + j for j in range(3)],
                    "text": [good + f"day{day} doc{j}" for j in range(3)],
                }
            )
            last = compose.ingest_increment(
                rd.from_pandas(inc), corpus_dir, compact_over_fragments=3
            )
        assert last["compacted"]
        man = lance_like.read_manifest(corpus_dir)
        assert len(man["fragments"]) <= 3  # small fragments merged
        assert sum(f["rows"] for f in man["fragments"]) == 12


@pytest.mark.usefixtures("ray_session")
class TestGroupedQuantile:
    def test_matches_partitioned_rank_sql(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        for q in (0.5, 0.9):
            got = analytics.grouped_quantile(
                lambda: rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"]),
                key="event_type", col="value", q=q,
            ).sort_values("event_type").reset_index(drop=True)
            exp = duckdb.sql(
                f"""
                WITH s AS (SELECT event_type, value AS v,
                  row_number() OVER (PARTITION BY event_type ORDER BY value) rn,
                  COUNT(*) OVER (PARTITION BY event_type) n FROM '{SF}/events.parquet')
                SELECT event_type, v FROM s WHERE rn = CAST(CEIL({q} * n) AS BIGINT)
                ORDER BY event_type
                """
            ).df()
            assert got["event_type"].tolist() == exp["event_type"].tolist()
            assert np.allclose(got["q_value"].to_numpy(), exp["v"].to_numpy())

    def test_sketch_error_bounded_by_bin_width(self):
        """Unbounded-key sketch: estimate within one bin width of the exact
        per-key median, and exact when a key's values are constant."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "k": np.repeat(np.arange(20), 50),
                "v": np.concatenate(
                    [rng.uniform(i, i + 10, 50) for i in range(20)]
                ),
            }
        )
        df.loc[df["k"] == 0, "v"] = 42.0  # constant-value key
        got = (
            analytics.grouped_quantile_sketch(rd.from_pandas(df), key="k", col="v", q=0.5)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        exact = df.groupby("k")["v"].quantile(0.5, interpolation="lower").to_numpy()
        width = (df["v"].max() - df["v"].min()) / 256
        assert (np.abs(got["q_value"].to_numpy() - exact) <= width + 1e-9).all()
        assert got.loc[got["k"] == 0, "q_value"].iloc[0] <= 42.0 + width


@pytest.mark.usefixtures("ray_session")
class TestDebounce:
    def test_planted_bursts(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = np.datetime64("2024-01-01T00:00:00")
        rows = []
        # user 1 / click: burst of 4 events 10 s apart -> only the first kept
        for j in range(4):
            rows.append((j, 1, "click", base + np.timedelta64(10 * j, "s")))
        # user 1 / view: events 120 s apart -> all kept
        for j in range(3):
            rows.append((10 + j, 1, "view", base + np.timedelta64(120 * j, "s")))
        # user 2 / click: same times as user 1's burst -> independent key
        rows.append((20, 2, "click", base))
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
        got = (
            relational.debounce_events(rd.from_pandas(df), min_gap_seconds=60)
            .to_pandas()
            .sort_values("event_id")["event_id"]
            .tolist()
        )
        assert got == [0, 10, 11, 12, 20]

    def test_matches_lag_sql(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(
            f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
        )
        got = sorted(
            relational.debounce_events(ds, min_gap_seconds=86_400).to_pandas()["event_id"]
        )
        exp = duckdb.sql(
            f"""
            WITH s AS (SELECT event_id, ts,
              LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) pts
              FROM '{SF}/events.parquet')
            SELECT event_id FROM s WHERE pts IS NULL OR ts - pts >= INTERVAL 86400 SECOND
            ORDER BY event_id
            """
        ).df()["event_id"].tolist()
        assert got == exp


@pytest.mark.usefixtures("ray_session")
class TestTfidfKeywords:
    def test_planted_salient_term(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        common = "the quick brown fox jumps over the lazy dog"
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    common + " zyzzyva zyzzyva zyzzyva",  # rare term, high tf
                    common,
                    common,
                ],
            }
        )
        got = analytics.tfidf_keywords(rd.from_pandas(docs), k=1).to_pandas()
        top1 = got[got["doc_id"] == 1].iloc[0]
        assert top1["term"] == "zyzzyva"

    def test_matches_sql_replay(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            analytics.tfidf_keywords(
                rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]), k=3
            )
            .to_pandas()
            .sort_values(["doc_id", "score_ppm", "term"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) term
                         FROM '{SF}/documents.parquet'),
            tf AS (SELECT doc_id, term, COUNT(*) tf FROM tok GROUP BY 1, 2),
            df AS (SELECT term, COUNT(DISTINCT doc_id) df FROM tok GROUP BY 1),
            n AS (SELECT COUNT(*) n FROM '{SF}/documents.parquet'),
            sc AS (SELECT tf.doc_id, tf.term, CAST(FLOOR(tf.tf * ln((n.n + 1.0)/(df.df + 1.0))
                   * 1000000.0 + 0.5) AS BIGINT) score_ppm FROM tf JOIN df USING(term), n)
            SELECT doc_id, term, score_ppm FROM sc
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, term) <= 3
            ORDER BY doc_id, score_ppm DESC, term
            """
        ).df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["term"].tolist() == exp["term"].tolist()
        assert got["score_ppm"].tolist() == exp["score_ppm"].tolist()


class TestBudgetSelect:
    """Token-budget corpus selection (quality-DESC greedy prefix)."""

    def _oracle(self, src: str, budget: int) -> "pd.DataFrame":
        import __ray_entry__ as entry

        sql = entry._budget_select_sql(budget).replace("FROM documents", f"FROM {src}")
        return duckdb.sql(sql).df().sort_values("doc_id").reset_index(drop=True)

    def test_vs_duckdb_window(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = (
            analytics.budget_select(ds, 10_000)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = self._oracle(f"'{SF}/documents.parquet'", 10_000)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["n_tokens"].tolist() == exp["n_tokens"].tolist()
        assert int(got["n_tokens"].sum()) <= 10_000

    def test_whole_corpus_fits(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = analytics.budget_select(ds, 10**9)
        assert got.count() == 500  # budget above total: everything selected

    def test_tie_group_and_zero_token_edges(self):
        """Planted corpus: identical texts force one big quality tie group
        (resolved in doc_id order by the prefix sum) and empty docs carry
        zero tokens (kept at the crossing, dropped after it — same monotone
        prefix semantics as the SQL window)."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        same = "the quick brown fox jumps over the lazy dog and runs away fast"
        docs = pd.DataFrame(
            {
                "doc_id": list(range(1, 41)),
                # 30 identical docs (one tie group), 10 empty (zero tokens)
                "text": [same] * 30 + [""] * 10,
            }
        )
        n_tok = len(same.split())
        budget = n_tok * 7 + 3  # mid-tie-group crossing: 7 tie docs fit
        got = (
            analytics.budget_select(rd.from_pandas(docs), budget)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        duckdb.register("planted_budget_docs", docs)
        exp = self._oracle("planted_budget_docs", budget)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        # the 7 lowest-doc_id tie members fit; empty docs rank below the
        # tie quality and sit after the overflow point, so none are kept
        assert got["doc_id"].tolist() == list(range(1, 8))

    def test_zero_budget(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "d e"]})
        got = analytics.budget_select(rd.from_pandas(docs), 0).to_pandas()
        assert len(got) == 0


class TestMixtureSample:
    """Two-pass self-calibrating data mixing."""

    def test_vs_duckdb_and_calibration(self):
        import ray.data as rd

        import __ray_entry__ as entry
        from distributed_system___ocr_ray.pipelines import analytics

        shares = {"src0": 500_000, "src1": 300_000, "src2": 200_000}
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
        got = (
            analytics.mixture_sample(ds, shares, 40)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        sql = entry._mixture_sample_sql(shares, 40).replace(
            "FROM documents", f"FROM '{SF}/documents.parquet'"
        ).replace("documents d", f"'{SF}/documents.parquet' d")
        exp = duckdb.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        # only listed sources appear; no unlisted source leaks through
        assert set(got["source"]) <= set(shares)

    def test_self_calibrating_rates(self):
        """Skewed planted sources: rates adapt to observed counts — a source
        with exactly 'want' docs gets rate 1e6 (all kept), an over-supplied
        source is thinned toward its target, an unlisted source is dropped."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": list(range(1000)),
                "source": ["tiny"] * 10 + ["big"] * 900 + ["other"] * 90,
            }
        )
        # target 100 docs: tiny wants 10 (has 10 -> keep all), big wants 90
        shares = {"tiny": 100_000, "big": 900_000}
        got = analytics.mixture_sample(rd.from_pandas(docs), shares, 100).to_pandas()
        by_src = got["source"].value_counts().to_dict()
        assert by_src.get("tiny", 0) == 10  # rate saturates at 100%
        assert "other" not in by_src  # unlisted source dropped
        # md5 sampling is approximate: realized 'big' count near its want
        assert 60 <= by_src.get("big", 0) <= 120


class TestCmsTopTokens:
    """Count-Min sketch frequency estimates."""

    def test_overestimate_and_sql_parity(self):
        import ray.data as rd

        import __ray_entry__ as entry
        from distributed_system___ocr_ray.pipelines import analytics

        docs = f"'{SF}/documents.parquet'"
        cands_tbl = analytics.top_tokens(
            rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]), k=20
        ).to_pandas()
        got = analytics.cms_token_counts(
            rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]),
            candidates=cands_tbl["token"].tolist(),
        ).to_pandas()
        exp = duckdb.sql(
            entry._cms_top_tokens_sql(20).replace("FROM documents", f"FROM {docs}")
        ).df()
        m = got.merge(exp, on="token", suffixes=("_got", "_exp")).merge(
            cands_tbl.rename(columns={"n": "n_exact"}), on="token"
        )
        assert len(m) == 20
        assert (m["n_cms_got"] == m["n_cms_exp"]).all()
        assert (m["n_cms_got"] >= m["n_exact"]).all()  # CMS never undercounts

    def test_discovery_mode_finds_planted_heavy_hitter(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": range(200),
                "text": ["zzzheavy common" + str(i % 7) for i in range(200)],
            }
        )
        got = analytics.cms_token_counts(rd.from_pandas(docs), k=3).to_pandas()
        assert got["token"].iloc[0] == "zzzheavy"
        assert int(got["n_cms"].iloc[0]) >= 200

    def test_tree_merge_multi_round(self):
        """Many tiny blocks force >1 merge round; totals must still match a
        single-sketch build exactly (merge is pure counter addition)."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.functions.sketches import CountMinSketch
        from distributed_system___ocr_ray.pipelines import analytics

        texts = [f"tok{i % 11} filler" for i in range(300)]
        ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(50)
        got = analytics.cms_token_counts(
            ds, candidates=["filler", "tok0"], merge_group=4
        ).to_pandas()
        ref = CountMinSketch().add_counts(["filler"], [300])
        # 'filler' appears exactly 300x; estimate >= 300 and equals the
        # single-sketch bucket values (same md5 buckets, pure addition)
        row = got.set_index("token")["n_cms"]
        assert int(row["filler"]) >= 300
        assert int(row["tok0"]) >= 300 // 11


class TestEpochShuffle:
    """Deterministic epoch shuffle (md5-order dense ranks)."""

    def test_vs_duckdb_rownumber(self):
        import ray.data as rd

        import __ray_entry__ as entry
        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        # tiny ranges force multi-range offset composition
        got = (
            analytics.epoch_shuffle(ds, epoch=1, ranges=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            entry._epoch_shuffle_sql(1).replace(
                "FROM documents", f"FROM '{SF}/documents.parquet'"
            )
            + " ORDER BY doc_id"
        ).df()
        assert got["pos"].tolist() == exp["pos"].tolist()
        # dense permutation 0..n-1
        assert sorted(got["pos"]) == list(range(len(got)))

    def test_layout_invariance_and_epoch_independence(self):
        """The permutation must not depend on block layout (1 block vs 32),
        and different epochs give different permutations."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame({"doc_id": list(range(400))})
        one = (
            analytics.epoch_shuffle(rd.from_pandas(docs), epoch=5)
            .to_pandas().sort_values("doc_id")["pos"].tolist()
        )
        many = (
            analytics.epoch_shuffle(rd.from_pandas(docs).repartition(32), epoch=5, ranges=7)
            .to_pandas().sort_values("doc_id")["pos"].tolist()
        )
        other_epoch = (
            analytics.epoch_shuffle(rd.from_pandas(docs), epoch=6)
            .to_pandas().sort_values("doc_id")["pos"].tolist()
        )
        assert one == many  # layout- and fan-out-invariant
        assert one != other_epoch  # epochs decorrelated


class TestSampleN:
    def test_exact_size_layout_invariant_and_stable_under_append(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame({"doc_id": list(range(500)), "lang": ["en"] * 500})
        a = analytics.sample_n(rd.from_pandas(docs), 50).to_pandas()
        b = analytics.sample_n(rd.from_pandas(docs).repartition(32), 50).to_pandas()
        assert len(a) == 50 and sorted(a.doc_id) == sorted(b.doc_id)
        # sample larger than the corpus: everything, once
        full = analytics.sample_n(rd.from_pandas(docs.head(10)), 50).to_pandas()
        assert sorted(full.doc_id) == list(range(10))
        # append-stability: growing the corpus only re-cuts the global
        # cutoff; rows sampled from the old corpus that survive keep their
        # membership decided by the same per-row key
        grown = pd.concat(
            [docs, pd.DataFrame({"doc_id": range(500, 1000), "lang": ["de"] * 500})]
        )
        g = analytics.sample_n(rd.from_pandas(grown), 50).to_pandas()
        assert set(g.doc_id) & set(a.doc_id) == set(g.doc_id[g.doc_id < 500])


class TestLineDedup:
    """C4-style corpus-level keep-first line dedup."""

    def _planted(self):
        import pandas as pd

        boiler = "subscribe to our newsletter"
        return pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    f"unique alpha line one\n{boiler}\nad",
                    f"{boiler}\nunique beta line two\n{boiler}",
                    boiler,  # fully-deduped doc -> ''
                    "short\nrepeat me exactly\nrepeat me exactly",  # in-doc dup
                ],
            }
        )

    def _expected(self):
        # keep-first global order: doc1 keeps the boiler (pack (1,1) is the
        # global min); every later occurrence (2,0), (2,2), (3,0) drops;
        # in-doc duplicate keeps only its first occurrence; short lines stay
        return {
            1: "unique alpha line one\nsubscribe to our newsletter\nad",
            2: "unique beta line two",
            3: "",
            4: "short\nrepeat me exactly",
        }

    def test_broadcast_path(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            analytics.line_dedup(rd.from_pandas(self._planted()), min_line_chars=6)
            .to_pandas()
            .set_index("doc_id")["text"]
            .to_dict()
        )
        assert got == self._expected()

    def test_bucketed_join_path_equal(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            analytics.line_dedup(
                rd.from_pandas(self._planted()).repartition(3),
                min_line_chars=6,
                broadcast_dups_bytes=0,  # force the scale path
                join_buckets=4,
            )
            .to_pandas()
            .set_index("doc_id")["text"]
            .to_dict()
        )
        assert got == self._expected()

    def test_no_dups_identity(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {"doc_id": [7, 8], "text": ["totally unique first", "another unique text"]}
        )
        got = analytics.line_dedup(rd.from_pandas(docs)).to_pandas()
        assert got.set_index("doc_id")["text"].to_dict() == {
            7: "totally unique first",
            8: "another unique text",
        }


class TestNovelDocsBloom:
    """Bloom-prefiltered novelty: exact output, FP-proof via verification."""

    def test_equals_novel_docs_even_with_forced_fps(self):
        """A deliberately TINY bloom (2 bits/key, k=1) floods the hit path
        with false positives; output must still equal novel_docs exactly —
        correctness may never depend on the FP rate."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        corpus = pd.DataFrame(
            {"doc_id": range(100), "text": [f"corpus text {i}" for i in range(100)]}
        )
        new = pd.DataFrame(
            {
                "doc_id": range(100, 160),
                # 20 dups of corpus content, 40 novel
                "text": [f"corpus text {i}" for i in range(20)]
                + [f"fresh text {i}" for i in range(40)],
            }
        )
        exact = sorted(
            analytics.novel_docs(rd.from_pandas(new), rd.from_pandas(corpus))
            .to_pandas()["doc_id"]
        )
        bloomy = sorted(
            analytics.novel_docs_bloom(
                rd.from_pandas(new), rd.from_pandas(corpus), bits_per_key=2
            )
            .to_pandas()["doc_id"]
        )
        assert bloomy == exact == list(range(120, 160))

    def test_bloom_broadcast_is_smaller(self):
        from distributed_system___ocr_ray.functions.bloom import BloomFilter

        n = 100_000
        bloom_bytes = len(BloomFilter.for_keys(n, 16).to_bytes())
        hex_bytes = n * 64  # the raw sha256-hex broadcast
        assert bloom_bytes * 20 < hex_bytes


class TestChunkDocuments:
    def test_windows_overlap_and_edges(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    " ".join(f"t{i}" for i in range(10)),  # 10 toks: 3 chunks
                    "a b c",  # shorter than one chunk
                    "",  # zero tokens -> zero chunks
                ],
            }
        )
        got = (
            analytics.chunk_documents(rd.from_pandas(docs), chunk_tokens=4, overlap=1)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        d1 = got[got.doc_id == 1]
        assert d1["text"].tolist() == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9",
        ]
        assert d1["n_tokens"].tolist() == [4, 4, 4, 1]
        # consecutive chunks share exactly `overlap` tokens
        assert d1["text"].iloc[0].split()[-1] == d1["text"].iloc[1].split()[0]
        assert got[got.doc_id == 2]["text"].tolist() == ["a b c"]
        assert (got.doc_id == 3).sum() == 0

    def test_rejects_bad_overlap(self):
        import pandas as pd
        import ray.data as rd

        import pytest as _pytest

        from distributed_system___ocr_ray.pipelines import analytics

        with _pytest.raises(ValueError):
            analytics.chunk_documents(
                rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]})),
                chunk_tokens=4,
                overlap=4,
            )


class TestNovelDocsMinhash:
    def test_planted_neardup_dropped_exact_and_fresh_handled(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = (
            "the quick brown fox jumps over the lazy dog while the rain "
            "falls gently on the quiet old town square near the river bank"
        )
        corpus = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [base, "completely different corpus content about engines"],
            }
        )
        new = pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    base.replace("lazy", "sleepy"),  # near-dup -> dropped
                    base,  # exact dup -> dropped
                    "entirely fresh text with nothing shared at all here "
                    "and plenty of novel words to stay under threshold",
                ],
            }
        )
        kept = sorted(
            analytics.novel_docs_minhash(
                rd.from_pandas(new), rd.from_pandas(corpus), threshold=0.5
            )
            .to_pandas()["doc_id"]
        )
        assert kept == [12]

    def test_new_vs_new_neardups_not_dropped(self):
        """In-batch duplicates are minhash_dup_clusters' job — the novelty
        gate only compares against the committed corpus."""
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        corpus = pd.DataFrame({"doc_id": [1], "text": ["unrelated corpus doc text"]})
        twin = (
            "twin texts that duplicate each other inside the new batch "
            "should both survive the corpus novelty gate"
        )
        new = pd.DataFrame({"doc_id": [10, 11], "text": [twin, twin]})
        kept = sorted(
            analytics.novel_docs_minhash(
                rd.from_pandas(new), rd.from_pandas(corpus), threshold=0.5
            )
            .to_pandas()["doc_id"]
        )
        assert kept == [10, 11]


class TestSampleNPerGroup:
    def test_exact_group_sizes_and_layout_invariance(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": range(300),
                "lang": ["en"] * 200 + ["de"] * 95 + ["fr"] * 5,
            }
        )
        a = analytics.sample_n_per_group(rd.from_pandas(docs), 10).to_pandas()
        sizes = a["lang"].value_counts().to_dict()
        assert sizes == {"en": 10, "de": 10, "fr": 5}  # min(n, group size)
        b = analytics.sample_n_per_group(
            rd.from_pandas(docs).repartition(16), 10
        ).to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)


class TestZscoreByGroup:
    def test_group_stats_and_degenerate_group(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": range(6),
                "lang": ["en", "en", "en", "de", "de", "fr"],
                "text": [
                    "a short one",
                    "a much longer document with many common the and of words " * 4,
                    "medium text with the usual words in it",
                    "identical de text here",
                    "identical de text here",  # de: two identical -> std 0
                    "solo fr document",  # singleton group -> std 0
                ],
            }
        )
        got = (
            analytics.zscore_by_group(rd.from_pandas(docs))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # degenerate groups (zero variance) pin z to 0
        assert got[got.lang == "de"]["z_ppm"].tolist() == [0, 0]
        assert got[got.lang == "fr"]["z_ppm"].tolist() == [0]
        en = got[got.lang == "en"]["z_ppm"]
        # per-group z-scores of 3 values sum to ~0 (floor rounding only)
        assert abs(int(en.sum())) <= 2
        assert en.abs().max() > 100_000  # spread is actually normalized


class TestFunnelCounts:
    def test_planted_funnel_strict_ordering(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ts = pd.to_datetime(
            ["2026-01-01 10:00", "2026-01-01 11:00", "2026-01-01 12:00"]
        )
        rows = []
        # user 1: full funnel in order
        rows += [(1, ts[0], "view"), (1, ts[1], "click"), (1, ts[2], "purchase")]
        # user 2: click BEFORE first view -> stops at view
        rows += [(2, ts[1], "view"), (2, ts[0], "click")]
        # user 3: view+click, purchase at SAME ts as click (not strictly
        # after) -> stops at click
        rows += [(3, ts[0], "view"), (3, ts[1], "click"), (3, ts[1], "purchase")]
        # user 4: never views
        rows += [(4, ts[0], "click"), (4, ts[1], "purchase")]
        ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        got = (
            analytics.funnel_counts(
                rd.from_pandas(ev), ["view", "click", "purchase"], buckets=3
            )
            .to_pandas()
            .sort_values("step")
        )
        assert got["users"].tolist() == [3, 2, 1]


class TestDomainCounts:
    def test_hostname_reduction_and_ranking(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "see https://A.EX.org/path and http://a.ex.org:443/other",
                    "plain doc without links",
                    "ref https://b.ex.org https://a.ex.org/z?q=1",
                ],
            }
        )
        got = analytics.domain_counts(rd.from_pandas(docs), k=5).to_pandas()
        top = dict(zip(got["domain"], got["n"]))
        # case-folded, port and path stripped, counted per occurrence
        assert top == {"a.ex.org": 3, "b.ex.org": 1}


class TestRetentionCohorts:
    def test_planted_triangle(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        W = 604800
        base = pd.Timestamp("2026-01-05")  # week boundary-agnostic
        rows = []
        # user 1: weeks 0, 1, 2 ; user 2: weeks 0, 2 ; user 3: week 1 only
        for u, wks in [(1, [0, 1, 2]), (2, [0, 2]), (3, [1])]:
            for w in wks:
                rows.append((u, base + pd.Timedelta(seconds=w * W + u)))
                rows.append((u, base + pd.Timedelta(seconds=w * W + u + 5)))  # dup week
        ev = pd.DataFrame(rows, columns=["user_id", "ts"])
        got = analytics.retention_cohorts(rd.from_pandas(ev), buckets=2).to_pandas()
        cw0 = int(got["cohort_week"].min())
        m = {
            (int(r.cohort_week) - cw0, int(r.week_offset)): int(r.users)
            for r in got.itertuples()
        }
        # cohort 0 = users 1,2 ; cohort 1 = user 3
        assert m == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


class TestSampleByWeightAndHistogram:
    def test_weight_extremes(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        rows = pd.DataFrame(
            {
                "doc_id": range(400),
                "quality_ppm": [0] * 100 + [1_000_000] * 100 + [500_000] * 200,
            }
        )
        got = analytics.sample_by_weight(rd.from_pandas(rows), "quality_ppm").to_pandas()
        kept = set(got.doc_id)
        assert not kept & set(range(100))  # weight 0: never kept
        assert set(range(100, 200)) <= kept  # weight 1e6: always kept
        mid = len(kept & set(range(200, 400)))
        assert 60 <= mid <= 140  # ~50% of the mid-weight rows

    def test_histogram_counts_sum_and_edges(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vals = pd.DataFrame({"v": [float(x) for x in range(100)]})
        got = (
            analytics.value_histogram(rd.from_pandas(vals), "v", bins=10)
            .to_pandas()
            .sort_values("bin")
        )
        assert int(got["n"].sum()) == 100
        assert got["n"].tolist() == [10] * 9 + [10]  # max clips into last bin
        assert got["lo_cents"].iloc[0] == 0 and got["hi_cents"].iloc[-1] == 9900


@pytest.mark.usefixtures("ray_session")
class TestRunningTotals:
    def test_cumsum_with_date_ties(self, tmp_path):
        import pandas as pd
        import pyarrow as pa

        from distributed_system___ocr_ray.pipelines import relational

        # cust 1: two orders on the SAME date -- orderkey breaks the tie;
        # cust 2: out-of-date-order rows in the file
        t = pa.table(
            {
                "o_orderkey": [10, 11, 12, 20, 21],
                "o_custkey": [1, 1, 1, 2, 2],
                "o_orderdate": pa.array(
                    pd.to_datetime(
                        ["2024-01-02", "2024-01-01", "2024-01-01", "2024-03-01", "2024-02-01"]
                    ),
                    pa.timestamp("us"),
                ),
                "o_totalprice": [5.0, 1.0, 2.0, 10.0, 0.5],
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = (
            relational.running_totals(str(tmp_path))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        # cust 1 order: key 11 (1.00) -> 12 (2.00) -> 10 (5.00)
        assert dict(zip(got["o_orderkey"], got["cum_cents"])) == {
            11: 100, 12: 300, 10: 800, 21: 50, 20: 1050,
        }


@pytest.mark.usefixtures("ray_session")
class TestRobustOutliers:
    def test_planted_outlier_and_tight_group(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # group a: values 100..108 plus one wild 10000 -> med 104, MAD 2
        # (devs 0..4 + wild; ceil-rank median of [0,1,1,2,2,3,3,4,4,9896] = 2),
        # cutoff 3*2=6 flags only the wild row.
        # group b: constant -> MAD 0, everything equals the median, no flags.
        a_vals = list(range(100, 109)) + [10000]
        rows = {
            "doc_id": list(range(len(a_vals))) + [100, 101, 102],
            "lang": ["a"] * len(a_vals) + ["b"] * 3,
            "n_chars": a_vals + [7, 7, 7],
        }
        t = pa.table(rows)
        out = analytics.robust_outliers(
            lambda: rd.from_arrow(t), key="lang", col="n_chars", k_mad=3
        ).to_pandas()
        assert out["doc_id"].tolist() == [9]
        assert out["dev"].tolist() == [10000 - 104]
        assert out["cutoff"].tolist() == [6]


@pytest.mark.usefixtures("ray_session")
class TestCollocations:
    def test_planted_phrase_scores_exactly(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 6 docs of "alpha beta", 6 fillers; doc boundaries must NOT form
        # bigrams ("beta gamma" across docs would be a bug)
        docs = ["alpha beta"] * 6 + ["gamma delta epsilon"] * 6
        t = pa.table({"text": docs})
        out = analytics.collocations(
            rd.from_arrow(t), k=3, min_count=5
        ).to_pandas()
        # N = 6*2 + 6*3 = 30 tokens; n(alpha)=n(beta)=6, n_xy(alpha beta)=6
        # score = 1e6 * 6 * 30 // 36 = 5_000_000
        top = dict(zip(out["bigram"], out["score_ppm"]))
        assert top["alpha beta"] == 5_000_000
        # gamma delta: 1e6 * 6 * 30 // (6*6) = same; delta epsilon same
        assert sorted(out["bigram"]) == ["alpha beta", "delta epsilon", "gamma delta"]
        assert "beta gamma" not in top and "epsilon alpha" not in top


@pytest.mark.usefixtures("ray_session")
class TestPercentRank:
    def test_ties_and_single_row_group(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6, 7],
                "lang": ["a", "a", "a", "a", "b", "b", "c"],
                "n_chars": [5, 5, 7, 9, 1, 1, 3],
            }
        )
        got = dict(
            (r["doc_id"], r["rank_ppm"])
            for r in relational.percent_rank_by_group(rd.from_arrow(t)).take_all()
        )
        # lang a: ties 5,5 share rank 0; 7 -> 2/3; 9 -> 3/3
        # lang b: both tied at 0; lang c: single row pins to 0
        assert got == {1: 0, 2: 0, 3: 666666, 4: 1000000, 5: 0, 6: 0, 7: 0}


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_boundaries_and_zero_counts(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        W = 100  # window in fake "us"
        left = pa.table(
            {
                "id": [1, 2, 3],
                "lts": pa.array([1000, 1050, 5000], pa.int64()),
            }
        )
        # right rows: at lo (counted), at hi (excluded), straddling the
        # bucket boundary of id 2's window [1050, 1150) -> bucket 10 and 11
        right = pa.table(
            {"rts": pa.array([1000, 1100, 1149, 1150, 999, 2000], pa.int64())}
        )
        got = dict(
            (r["id"], r["n_in_window"])
            for r in relational.range_join_counts(
                rd.from_arrow(left), rd.from_arrow(right), "lts", "rts", "id", W
            ).take_all()
        )
        # id1 [1000,1100): 1000 yes, 1100 no (hi-exclusive), 999 no -> 1
        # id2 [1050,1150): 1100, 1149 yes (1149 is in bucket 11: cross-bucket), 1150 no -> 2
        # id3 [5000,5100): nothing -> 0 survives
        assert got == {1: 1, 2: 2, 3: 0}


@pytest.mark.usefixtures("ray_session")
class TestRollupAndKeepBest:
    def test_rollup_levels_sum(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table(
            {
                "lang": ["en", "en", "en", "fr"],
                "source": ["a", "a", "b", "a"],
            }
        )
        rows = analytics.rollup_counts(rd.from_arrow(t), ["lang", "source"]).take_all()
        got = {(r["lang"], r["source"]): r["n"] for r in rows}
        assert got == {
            ("en", "a"): 2, ("en", "b"): 1, ("fr", "a"): 1,
            ("en", "ALL"): 3, ("fr", "ALL"): 1, ("ALL", "ALL"): 4,
        }

    def test_cube_all_grouping_sets(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table(
            {
                "lang": ["en", "en", "en", "fr"],
                "source": ["a", "a", "b", "a"],
            }
        )
        rows = analytics.cube_counts(rd.from_arrow(t), ["lang", "source"]).take_all()
        got = {(r["lang"], r["source"]): r["n"] for r in rows}
        # rollup sets PLUS the source-only set rollup cannot produce
        assert got == {
            ("en", "a"): 2, ("en", "b"): 1, ("fr", "a"): 1,
            ("en", "ALL"): 3, ("fr", "ALL"): 1,
            ("ALL", "a"): 3, ("ALL", "b"): 1,
            ("ALL", "ALL"): 4,
        }

    def test_keep_best_prefers_quality_then_min_id(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # same text twice -> one group with n_copies 2; distinct texts keep
        # their own rows. doc 2 and 5 share content; equal quality (same
        # text) so min id 2 wins.
        t = pa.table(
            {
                "doc_id": [5, 2, 9],
                "text": ["the same clean text here.", "the same clean text here.", "x"],
            }
        )
        rows = sorted(
            analytics.dedup_keep_best(rd.from_arrow(t)).take_all(),
            key=lambda r: r["keeper_doc_id"],
        )
        assert [(r["keeper_doc_id"], r["n_copies"]) for r in rows] == [(2, 2), (9, 1)]


@pytest.mark.usefixtures("ray_session")
class TestDistinctAndArgmax:
    def test_grouped_distinct_cross_batch(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # the same (a, 1) pair in two different blocks must count ONCE
        t1 = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 1]})
        t2 = pa.table({"k": ["a", "b", "b"], "v": [1, 1, 3]})
        ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
        got = {
            r["k"]: r["n_distinct"]
            for r in analytics.grouped_distinct_count(ds, "k", "v").take_all()
        }
        assert got == {"a": 2, "b": 2}

    def test_latest_record_ties_and_cross_batch(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t1 = pa.table({"u": [1, 1], "t": [10, 20], "p": ["x", "y"]})
        t2 = pa.table({"u": [1, 2], "t": [20, 5], "p": ["z", "q"]})
        ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
        rows = sorted(
            analytics.latest_record_per_key(ds, "u", "t", ["p"]).take_all(),
            key=lambda r: r["u"],
        )
        # user 1: two rows tie at t=20 across batches -> max payload "z" wins
        assert [(r["u"], r["t"], r["p"]) for r in rows] == [(1, 20, "z"), (2, 5, "q")]


@pytest.mark.usefixtures("ray_session")
class TestPivot:
    def test_pivot_fills_absent_combinations(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table({"k": [1, 1, 2], "c": ["a", "a", "b"]})
        rows = sorted(
            analytics.pivot_counts(rd.from_arrow(t), "k", "c", ["a", "b", "z"]).take_all(),
            key=lambda r: r["k"],
        )
        assert rows[0] == {"k": 1, "n_a": 2, "n_b": 0, "n_z": 0}
        assert rows[1] == {"k": 2, "n_a": 0, "n_b": 1, "n_z": 0}


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_kmeans_matches_numpy_reference(self):
        """Single-process numpy replay of the exact integer Lloyd rules."""
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        k, iters, scale = 8, 3, 1000
        t = pq.read_table(f"{SF}/embeddings.parquet")
        ids = t.column("vec_id").to_numpy()
        Q = np.floor(
            np.stack(t.column("embedding").to_pylist()).astype(np.float64) * scale + 0.5
        ).astype(np.int64)

        keys = np.array([md5_u64(str(int(i)).encode()) for i in ids], dtype=np.uint64)
        seed_idx = np.lexsort((ids, keys))[:k]
        C = Q[seed_idx].copy()
        for _ in range(iters):
            d = (Q * Q).sum(1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(1)[None, :]
            lab = np.argmin(d, axis=1)
            counts = np.bincount(lab, minlength=k)
            S = np.zeros_like(C)
            np.add.at(S, lab, Q)
            nz = counts > 0
            C[nz] = np.floor(S[nz].astype(np.float64) / counts[nz][:, None] + 0.5).astype(
                np.int64
            )
        d = (Q * Q).sum(1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(1)[None, :]
        lab = np.argmin(d, axis=1)
        exp = {
            c: (int((lab == c).sum()), int(ids[lab == c].sum()))
            for c in range(k)
            if (lab == c).any()
        }

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = _pdf(analytics.kmeans_clusters(ds, k=k, iters=iters, scale=scale))
        got = got.sort_values("cluster_id").reset_index(drop=True)
        assert {
            int(r.cluster_id): (int(r.n_vecs), int(r.sum_vec_id)) for r in got.itertuples()
        } == exp

    def test_kmeans_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        a = _pdf(
            analytics.kmeans_clusters(rd.read_parquet(f"{SF}/embeddings.parquet"), k=5, iters=2)
        ).sort_values("cluster_id").reset_index(drop=True)
        b = _pdf(
            analytics.kmeans_clusters(
                rd.read_parquet(f"{SF}/embeddings.parquet").repartition(13), k=5, iters=2
            )
        ).sort_values("cluster_id").reset_index(drop=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestPageRank:
    def _reference(self, ids, iters, damping=85, topn=10):
        from distributed_system___ocr_ray.functions.dedup import md5_u64

        N = len(ids)
        r0 = 10**12 // N
        base = ((100 - damping) * r0) // 100
        edges = []
        for u in ids:
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % N
                if t != u:
                    edges.append((u, t, d))
        r = {u: r0 for u in ids}
        for _ in range(iters):
            inc = {u: 0 for u in ids}
            for u, t, d in edges:
                inc[t] += r[u] // d
            r = {u: base + (damping * inc[u]) // 100 for u in ids}
        return sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]

    def test_pagerank_matches_reference(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = _pdf(analytics.pagerank_top(ds, iters=3, topn=10))
        ids = sorted(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        exp = self._reference(ids, iters=3)
        assert [(int(a), int(b)) for a, b in zip(got["doc_id"], got["rank_scaled"])] == [
            (int(a), int(b)) for a, b in exp
        ]

    def test_pagerank_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        a = _pdf(analytics.pagerank_top(base, iters=2, topn=15))
        b = _pdf(analytics.pagerank_top(base.repartition(11), iters=2, topn=15))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestHybridTopK:
    def test_hybrid_matches_manual_fusion(self):
        """RRF-fuse the two retrievers' own outputs by hand and compare."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        queries = ["hash join table", "window agg stream"]
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        order = np.argsort(t.column("vec_id").to_numpy())[:2]
        qv = np.stack([t.column("embedding")[int(i)].as_py() for i in order]).astype(np.float64)

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        k = 5
        sparse = _pdf(analytics.bm25_topk(docs, queries, k=k))
        dense = _pdf(analytics.ann_topk(emb, qv, k=k))

        pts = {}
        for qid, grp in sparse.groupby("query_id"):
            grp = grp.sort_values(["score_ppm", "doc_id"], ascending=[False, True])
            for r, did in enumerate(grp["doc_id"], start=1):
                pts[(int(qid), int(did))] = pts.get((int(qid), int(did)), 0) + 1_000_000 // (60 + r)
        for qid, grp in dense.groupby("query_id"):
            grp = grp.sort_values(["sim", "vec_id"], ascending=[False, True])
            for r, did in enumerate(grp["vec_id"], start=1):
                pts[(int(qid), int(did))] = pts.get((int(qid), int(did)), 0) + 1_000_000 // (60 + r)
        exp = {}
        for qid in {q for q, _ in pts}:
            rows = sorted(
                ((d, s) for (q, d), s in pts.items() if q == qid),
                key=lambda kv: (-kv[1], kv[0]),
            )[:k]
            exp[qid] = rows

        got = _pdf(
            analytics.hybrid_topk(docs, emb, queries, qv, k=k)
        )
        got_by_q = {
            int(qid): [(int(r.doc_id), int(r.rrf_score)) for r in grp.itertuples()]
            for qid, grp in got.groupby("query_id")
        }
        assert got_by_q == exp


@pytest.mark.usefixtures("ray_session")
class TestGraphAndDecay:
    def test_triangle_count_matches_bruteforce(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        ids = sorted(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        N = len(ids)
        und = set()
        for u in ids:
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % N
                if t != u:
                    und.add((min(u, t), max(u, t)))
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = sum(
            1
            for a, b in und
            for c in adj[a]
            if c > b and (b, c) in und
        )

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = _pdf(analytics.triangle_count(ds))
        assert int(got["n_triangles"].iloc[0]) == exp

    def test_decayed_user_value_matches_pandas(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
        df = t.to_pandas()
        m_us = df["ts"].max().value // 1000
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        age = (m_us - ts_us) // 86_400_000_000
        shift = np.minimum(age // 7, 62).astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df["dec"] = cents >> shift
        exp = (
            df.groupby("user_id")
            .agg(decayed_cents=("dec", "sum"), n_events=("dec", "size"))
            .reset_index()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
        got = (
            _pdf(analytics.decayed_user_value(ds))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["decayed_cents"].tolist() == exp["decayed_cents"].tolist()
        assert got["n_events"].astype(int).tolist() == exp["n_events"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestSkylineOrders:
    def _brute(self, pts):
        """O(n^2) dominance check: survive iff nobody is >= on both, > on one."""
        out = []
        for i, (p, t) in enumerate(pts):
            dominated = any(
                (q >= p and u >= t and (q > p or u > t)) for j, (q, u) in enumerate(pts) if j != i
            )
            if not dominated:
                out.append(i)
        return out

    def test_skyline_matches_bruteforce(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"]
        )
        got = _pdf(analytics.skyline_orders(ds))

        t = pq.read_table(f"{SF}/orders.parquet")
        price = np.floor(np.asarray(t.column("o_totalprice")) * 100.0 + 0.5).astype(np.int64)
        day = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ).view(np.int64)
        keys = np.asarray(t.column("o_orderkey"))
        keep = self._brute(list(zip(price.tolist(), day.tolist())))
        exp = sorted(int(keys[i]) for i in keep)
        assert got["o_orderkey"].astype(int).tolist() == exp
        # frontier rows carry the exact integer coords they were judged on
        by_key = {int(k): (int(p), int(d)) for k, p, d in zip(keys, price, day)}
        for k, p, d in zip(got["o_orderkey"], got["price_cents"], got["date_day"]):
            assert by_key[int(k)] == (int(p), int(d))

    def test_skyline_partition_invariant_and_ties(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # hand-built table with both-axis ties (must ALL survive), equal-price
        # dominance and equal-date dominance
        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "o_totalprice": pa.array([10.0, 10.0, 10.0, 9.0, 11.0, 11.0]),
                "o_orderdate": pa.array(
                    np.array(
                        ["2024-01-05", "2024-01-05", "2024-01-02", "2024-01-05", "2024-01-01", "2024-01-01"],
                        dtype="datetime64[us]",
                    )
                ),
            }
        )
        ds = rd.from_arrow(t)
        got = _pdf(analytics.skyline_orders(ds))
        # 1,2 tie on both axes at the frontier; 3 dominated by 1 (same price,
        # earlier date); 4 dominated by 1 (lower price, same date); 5,6 tie at
        # the max-price corner
        assert got["o_orderkey"].astype(int).tolist() == [1, 2, 5, 6]
        a = _pdf(analytics.skyline_orders(ds.repartition(5)))
        assert a.values.tolist() == got.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestModeAndOrphanAudit:
    def test_mode_by_key_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
        got = (
            _pdf(relational.mode_by_key(ds, "user_id", "event_type"))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM '{SF}/events.parquet' GROUP BY 1, 2),
            r AS (SELECT *, ROW_NUMBER() OVER
                  (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rk FROM c)
            SELECT user_id, event_type AS mode_value, CAST(n AS BIGINT) AS n_rows
            FROM r WHERE rk = 1 ORDER BY user_id
            """
        ).df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["mode_value"].tolist() == exp["mode_value"].tolist()
        assert got["n_rows"].astype(int).tolist() == exp["n_rows"].astype(int).tolist()

    def test_mode_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
        a = _pdf(relational.mode_by_key(base, "user_id", "event_type")).sort_values(
            "user_id").reset_index(drop=True)
        b = _pdf(relational.mode_by_key(base.repartition(13), "user_id", "event_type")
                 ).sort_values("user_id").reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()

    def test_orphan_audit_counts_planted_orphans(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        child = pa.table(
            {"fk": pa.array([1, 1, 2, 3, 3, 3, 9, 9, 42], pa.int64())}
        )
        parent = pa.table({"pk": pa.array([1, 2, 5], pa.int64())})
        got = _pdf(
            relational.orphan_audit(
                rd.from_arrow(child).repartition(4), "fk",
                rd.from_arrow(parent).repartition(2), "pk", "child->parent",
            )
        )
        assert len(got) == 1
        r = got.iloc[0]
        assert r["relation"] == "child->parent"
        assert int(r["n_child_rows"]) == 9
        # orphans: 3 (x3), 9 (x2), 42 (x1) = 6 rows over 3 distinct keys
        assert int(r["n_orphan_rows"]) == 6
        assert int(r["n_orphan_keys"]) == 3

    def test_orphan_audit_clean_relation(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        lineitem = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
        orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
        got = _pdf(relational.orphan_audit(lineitem, "l_orderkey", orders, "o_orderkey", "li->o"))
        n = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
        assert int(got.iloc[0]["n_child_rows"]) == int(n)
        assert int(got.iloc[0]["n_orphan_rows"]) == 0
        assert int(got.iloc[0]["n_orphan_keys"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestSemDeDup:
    def test_semdedup_matches_bruteforce(self):
        """Reference: assign via the engine's own integer kmeans (fit is
        tested against SQL elsewhere), then brute-force the dominance rule."""
        import ray
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tau = 0.4
        ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        got = (
            _pdf(analytics.semdedup_keepers(ds, k=8, iters=3, threshold=tau))
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(t.column("vec_id")).astype(np.int64)
        V = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        qds = analytics._kmeans_quantize(
            rd.from_arrow(t), "vec_id", "embedding", 1000
        ).materialize()
        C = analytics._kmeans_fit(qds, k=8, iters=3, id_col="vec_id")
        Q = np.floor(V * 1000.0 + 0.5).astype(np.int64)
        d = (Q * Q).sum(1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(1)[None, :]
        lab = np.argmin(d, axis=1)
        U = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = U @ U.T
        exp = []
        order = np.argsort(ids)
        for i in order:
            dominated = any(
                lab[j] == lab[i] and ids[j] < ids[i] and S[i, j] >= tau
                for j in range(len(ids))
                if j != i
            )
            if not dominated:
                exp.append((int(ids[i]), int(lab[i])))
        assert list(zip(got["vec_id"].astype(int), got["cluster_id"].astype(int))) == exp
        assert len(exp) < len(ids)  # the removal path actually fired

    def test_semdedup_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        a = _pdf(analytics.semdedup_keepers(base, k=4, iters=2, threshold=0.4)).sort_values(
            "vec_id").reset_index(drop=True)
        b = _pdf(
            analytics.semdedup_keepers(base.repartition(9), k=4, iters=2, threshold=0.4)
        ).sort_values("vec_id").reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()

    def test_semdedup_max_cluster_guard(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        with pytest.raises(Exception, match="max_cluster"):
            _pdf(analytics.semdedup_keepers(base, k=2, iters=1, threshold=0.4, max_cluster=10))


@pytest.mark.usefixtures("ray_session")
class TestLongestStreak:
    def test_hand_built_streaks(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        days = {
            # user 1: days 0,1,2, 5,6 -> longest 3, active 5
            1: [0, 0, 1, 2, 5, 6],
            # user 2: single day (twice) -> longest 1, active 1
            2: [10, 10],
            # user 3: 7,8,9,10 -> longest 4, active 4
            3: [7, 8, 9, 10],
        }
        users, ts = [], []
        for u, ds_ in days.items():
            for d in ds_:
                users.append(u)
                ts.append(np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
                          + np.timedelta64(u * 3600, "s"))
        t = pa.table({"user_id": pa.array(users, pa.int64()),
                      "ts": pa.array(np.array(ts, dtype="datetime64[us]"))})
        got = (
            relational.longest_streak(rd.from_arrow(t).repartition(4), "user_id", "ts")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 2, 3]
        assert got["longest_streak_days"].tolist() == [3, 1, 4]
        assert got["n_active_days"].tolist() == [5, 1, 4]

    def test_streak_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        got = (
            relational.longest_streak(ds, "user_id", "ts")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT DISTINCT user_id,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
                       FROM '{SF}/events.parquet'),
            r AS (SELECT user_id, day, day - ROW_NUMBER() OVER
                  (PARTITION BY user_id ORDER BY day) AS grp FROM d),
            s AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2)
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest,
                   CAST(SUM(len) AS BIGINT) AS active
            FROM s GROUP BY user_id ORDER BY user_id
            """
        ).df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["longest_streak_days"].tolist() == exp["longest"].astype(int).tolist()
        assert got["n_active_days"].tolist() == exp["active"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestIntervalCoverage:
    def _run(self, rows, parts=1):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "s_us": pa.array([r[1] for r in rows], pa.int64()),
                "e_us": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        return (
            relational.interval_coverage(ds, "user_id", "s_us", "e_us")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    def test_hand_built_islands(self):
        rows = [
            # user 1: [0,10) + [5,20) overlap -> [0,20); [30,40) disjoint;
            # [32,35) contained -> covered 30, 2 islands
            (1, 0, 10), (1, 5, 20), (1, 30, 40), (1, 32, 35),
            # user 2: touching intervals [0,10)+[10,20) merge (half-open
            # adjacency: start == running max end) -> covered 20, 1 island
            (2, 0, 10), (2, 10, 20),
            # user 3: isolated zero-length interval -> covered 0, 1 island
            (3, 7, 7),
        ]
        got = self._run(rows)
        assert got["user_id"].tolist() == [1, 2, 3]
        assert got["covered_us"].tolist() == [30, 20, 0]
        assert got["n_islands"].tolist() == [2, 1, 1]

    def test_partition_invariant(self):
        rng = np.random.RandomState(7)
        rows = []
        for _ in range(500):
            u = int(rng.randint(0, 12))
            s = int(rng.randint(0, 1000))
            rows.append((u, s, s + int(rng.randint(0, 80))))
        a = self._run(rows, parts=1)
        b = self._run(rows, parts=13)
        assert a.equals(b)

    def test_matches_brute_force(self):
        rng = np.random.RandomState(11)
        rows = []
        for _ in range(300):
            u = int(rng.randint(0, 8))
            s = int(rng.randint(0, 400))
            rows.append((u, s, s + int(rng.randint(0, 50))))
        got = self._run(rows, parts=5)
        # brute force: per user, mark covered integer points in [s, e)
        exp = {}
        for u in sorted({r[0] for r in rows}):
            cov = np.zeros(500, dtype=bool)
            for uu, s, e in rows:
                if uu == u:
                    cov[s:e] = True
            # islands = runs of covered points, but zero-length intervals
            # also form islands -- count via the operator's own merge rule
            exp[u] = int(cov.sum())
        assert dict(zip(got["user_id"], got["covered_us"])) == exp

    def test_end_before_start_raises(self):
        with pytest.raises(Exception, match="end < start"):
            self._run([(1, 10, 5)])


@pytest.mark.usefixtures("ray_session")
class TestPeakConcurrency:
    def _run(self, rows, parts=1):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "s_us": pa.array([r[1] for r in rows], pa.int64()),
                "e_us": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        return (
            relational.peak_concurrency(ds, "user_id", "s_us", "e_us")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    def test_hand_built_peaks(self):
        rows = [
            # user 1: [0,10) [5,20) [8,12) -> 3 concurrent from t=8
            (1, 0, 10), (1, 5, 20), (1, 8, 12),
            # user 2: half-open back-to-back [0,10) [10,20): end settles
            # before start at t=10 -> peak 1 first reached at t=0
            (2, 0, 10), (2, 10, 20),
            # user 3: two disjoint singles -> peak 1 at the first start
            (3, 100, 110), (3, 200, 210),
        ]
        got = self._run(rows)
        assert got["user_id"].tolist() == [1, 2, 3]
        assert got["peak"].tolist() == [3, 1, 1]
        assert got["peak_at_us"].tolist() == [8, 0, 100]

    def test_partition_invariant_and_brute_force(self):
        rng = np.random.RandomState(3)
        rows = []
        for _ in range(400):
            u = int(rng.randint(0, 10))
            s = int(rng.randint(0, 300))
            rows.append((u, s, s + int(rng.randint(1, 60))))
        a = self._run(rows, parts=1)
        b = self._run(rows, parts=11)
        assert a.equals(b)
        # brute force: count open intervals at every integer instant
        for u in a["user_id"]:
            depth = np.zeros(400, dtype=np.int64)
            for uu, s, e in rows:
                if uu == u:
                    depth[s:e] += 1
            row = a[a["user_id"] == u].iloc[0]
            assert row["peak"] == depth.max()
            assert row["peak_at_us"] == int(np.argmax(depth))


@pytest.mark.usefixtures("ray_session")
class TestBasketPairs:
    def test_hand_built_baskets(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # orders: 1:{A,B,C} 2:{A,B} 3:{A,B} 4:{B,C} 5:{A,D} (+ dup row A in 1)
        A, B, C, D = 10, 20, 30, 40
        rows = [(1, A), (1, A), (1, B), (1, C), (2, A), (2, B),
                (3, A), (3, B), (4, B), (4, C), (5, A), (5, D)]
        t = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        # min_support=2 prunes D (freq 1); A row-freq 5, B 4, C 2
        got = analytics.basket_pairs_topk(
            rd.from_arrow(t).repartition(5), min_support=2, topk=10
        ).to_pandas()
        # pair counts: (A,B)=3, (A,C)=1, (B,C)=2
        assert list(map(tuple, got.values.tolist())) == [
            (A, B, 3), (B, C, 2), (A, C, 1),
        ]

    def test_topk_truncation_and_tiebreak(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # three pairs all with count 1 -> tie broken by (part_a, part_b)
        rows = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 3),
                (4, 1), (5, 2), (6, 3)]
        t = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        got = analytics.basket_pairs_topk(
            rd.from_arrow(t).repartition(3), min_support=1, topk=2
        ).to_pandas()
        assert list(map(tuple, got.values.tolist())) == [(1, 2, 1), (1, 3, 1)]

    def test_matches_duckdb_on_lineitem(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        got = analytics.basket_pairs_topk(ds, min_support=5, topk=15).to_pandas()
        exp = duckdb.sql(
            f"""
            WITH f AS (SELECT l_partkey FROM (SELECT l_partkey, COUNT(*) AS c
                       FROM '{SF}/lineitem.parquet' GROUP BY 1) WHERE c >= 5),
            li AS (SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'
                   WHERE l_partkey IN (SELECT l_partkey FROM f)),
            p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  CAST(COUNT(*) AS BIGINT) AS n_orders FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2)
            SELECT * FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT 15
            """
        ).df()
        assert got.values.tolist() == exp.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestCorrStats:
    def test_corr_matches_numpy(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
        got = analytics.corr_stats(ds, "l_quantity", "l_extendedprice").to_pandas()
        t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
        x = np.floor(np.asarray(t.column("l_quantity")) * 100.0 + 0.5)
        y = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0 + 0.5)
        ref = np.corrcoef(x, y)[0, 1]
        assert int(got["n"].iloc[0]) == len(x)
        assert int(got["sum_x_cents"].iloc[0]) == int(x.sum())
        # ppm value within 1 ulp-of-ppm of numpy's (different summation order)
        assert abs(int(got["corr_ppm"].iloc[0]) - round(ref * 1e6)) <= 1

    def test_corr_partition_invariant_and_exact_bigint(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
        a = analytics.corr_stats(base, "l_quantity", "l_extendedprice").to_pandas()
        b = analytics.corr_stats(
            base.repartition(17), "l_quantity", "l_extendedprice"
        ).to_pandas()
        # sufficient statistics are exact integers: bit-identical at any layout
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestForwardFillDaily:
    def test_hand_built_fill(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # user 1: day 0 (two events, later wins), day 3 -> span 0..3, fill 1,2
        # user 2: single day -> span of 1, no fill
        rows = [
            # (user, day, sec_in_day, event_id, value)
            (1, 0, 10, 100, 5.00),
            (1, 0, 10, 101, 7.00),   # same ts, higher id wins -> 700 cents
            (1, 3, 0, 102, 9.00),
            (2, 8, 5, 200, 1.25),
        ]
        ts = [np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
              + np.timedelta64(s, "s") for (_, d, s, _, _) in rows]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        })
        got = (
            relational.forward_fill_daily(rd.from_arrow(t).repartition(3))
            .to_pandas()
            .sort_values(["user_id", "day"])
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 1, 1, 1, 2]
        assert got["value_cents"].tolist() == [700, 700, 700, 900, 125]
        assert got["observed"].tolist() == [1, 0, 0, 1, 1]

    def test_fill_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
        )
        got = (
            relational.forward_fill_daily(ds)
            .to_pandas()
            .sort_values(["user_id", "day"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents, ts, event_id
                       FROM '{SF}/events.parquet'),
            o AS (SELECT user_id, day, cents FROM (SELECT user_id, day, cents,
                  ROW_NUMBER() OVER (PARTITION BY user_id, day
                                     ORDER BY ts DESC, event_id DESC) AS rn FROM e)
                  WHERE rn = 1),
            s AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM o GROUP BY 1),
            g AS (SELECT user_id, UNNEST(generate_series(d0, d1)) AS day FROM s),
            j AS (SELECT g.user_id, g.day, o.cents FROM g LEFT JOIN o
                  ON g.user_id = o.user_id AND g.day = o.day)
            SELECT user_id, day, CAST(last_value(cents IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS value_cents,
                   CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed
            FROM j ORDER BY user_id, day
            """
        ).df()
        assert got["value_cents"].tolist() == exp["value_cents"].astype(int).tolist()
        assert got["observed"].tolist() == exp["observed"].astype(int).tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
        )
        a = (
            relational.forward_fill_daily(base.repartition(1), buckets=3)
            .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
        )
        b = (
            relational.forward_fill_daily(base.repartition(13), buckets=64)
            .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
        )
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestEventTransitions:
    def test_hand_built_bigrams(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # user 1: A -> B -> A ; user 2: B (no pair). Ties on ts break by id.
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-01T00:00:00", "2024-01-01T00:00:01",
                          "2024-01-01T00:00:01", "2024-01-01T00:00:05"],
                         dtype="datetime64[us]")),
            "event_id": pa.array([1, 3, 2, 4], pa.int64()),  # id 2 before 3 at same ts
            "event_type": pa.array(["A", "B", "A", "B"]),
        })
        got = (
            relational.event_transitions(rd.from_arrow(t).repartition(2))
            .to_pandas().sort_values(["prev_type", "next_type"]).reset_index(drop=True)
        )
        # order by (ts, id): A(id1) -> A(id2) -> B(id3)
        assert got[["prev_type", "next_type"]].values.tolist() == [["A", "A"], ["A", "B"]]
        assert got["n"].tolist() == [1, 1]

    def test_transitions_match_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
        )
        got = (
            relational.event_transitions(ds)
            .to_pandas().sort_values(["prev_type", "next_type"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH t AS (SELECT user_id, event_type, LAG(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                       FROM '{SF}/events.parquet')
            SELECT prev AS prev_type, event_type AS next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert got["prev_type"].tolist() == exp["prev_type"].tolist()
        assert got["next_type"].tolist() == exp["next_type"].tolist()
        assert got["n"].tolist() == exp["n"].astype(int).tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
        )
        a = (relational.event_transitions(base.repartition(1), buckets=3)
             .to_pandas().sort_values(["prev_type", "next_type"]).reset_index(drop=True))
        b = (relational.event_transitions(base.repartition(17), buckets=64)
             .to_pandas().sort_values(["prev_type", "next_type"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestScd2History:
    def test_hand_built_intervals(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # user 1: day0=500, day1=500 (no change), day3=700 -> two intervals
        rows = [
            (1, 0, 100, 5.00),
            (1, 1, 101, 5.00),
            (1, 3, 102, 7.00),
            (2, 8, 200, 1.25),
        ]
        ts = [np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
              for (_, d, _, _) in rows]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        })
        got = (
            relational.scd2_history(rd.from_arrow(t).repartition(2))
            .to_pandas().sort_values(["user_id", "valid_from_day"]).reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 1, 2]
        assert got["value_cents"].tolist() == [500, 700, 125]
        assert got["valid_to_day"].tolist()[1:] == [-1, -1]
        # first interval closes at the change day
        assert got["valid_to_day"].tolist()[0] == got["valid_from_day"].tolist()[1]

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
        )
        a = (relational.scd2_history(base.repartition(1), buckets=3)
             .to_pandas().sort_values(["user_id", "valid_from_day"]).reset_index(drop=True))
        b = (relational.scd2_history(base.repartition(11), buckets=64)
             .to_pandas().sort_values(["user_id", "valid_from_day"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()

    def test_scd2_consistent_with_forward_fill(self):
        """Densified reconstruction from the SCD2 intervals must equal
        forward_fill_daily on the same input (the two operators are duals)."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
        )
        ff = (relational.forward_fill_daily(base)
              .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True))
        scd = relational.scd2_history(base).to_pandas()
        # reconstruct: for each (user, day) in ff, the covering interval's value
        scd = scd.sort_values(["user_id", "valid_from_day"])
        import numpy as _np
        users = scd["user_id"].to_numpy(_np.int64)
        froms = scd["valid_from_day"].to_numpy(_np.int64)
        vals = scd["value_cents"].to_numpy(_np.int64)
        width = max(ff["day"].max(), froms.max()) + 2
        comp = users * width + froms
        q = ff["user_id"].to_numpy(_np.int64) * width + ff["day"].to_numpy(_np.int64)
        idx = _np.searchsorted(comp, q, side="right") - 1
        assert (users[idx] == ff["user_id"].to_numpy(_np.int64)).all()
        assert vals[idx].tolist() == ff["value_cents"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestCollectSortedList:
    def test_hand_built_collect(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table({
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([30, 10, 10, 7, 5], pa.int64()),  # dup 10 collapses
        })
        got = (
            relational.collect_sorted_list(rd.from_arrow(t).repartition(3), "k", "v", "csv")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert got["k"].tolist() == [1, 2]
        assert got["n_values"].tolist() == [2, 2]
        assert got["csv"].tolist() == ["10,30", "5,7"]

    def test_collect_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        got = (
            relational.collect_sorted_list(ds, "l_orderkey", "l_partkey", "parts_csv")
            .to_pandas().sort_values("l_orderkey").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM '{SF}/lineitem.parquet')
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_values,
                   STRING_AGG(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey)
                   AS parts_csv
            FROM d GROUP BY l_orderkey ORDER BY l_orderkey
            """
        ).df()
        assert got["n_values"].tolist() == exp["n_values"].astype(int).tolist()
        assert got["parts_csv"].tolist() == exp["parts_csv"].tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        a = (relational.collect_sorted_list(base.repartition(1), "l_orderkey", "l_partkey", "c", buckets=3)
             .to_pandas().sort_values("l_orderkey").reset_index(drop=True))
        b = (relational.collect_sorted_list(base.repartition(9), "l_orderkey", "l_partkey", "c", buckets=64)
             .to_pandas().sort_values("l_orderkey").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestRollingRangeSum:
    def test_hand_built_windows(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # user 1: days 0,1,8 -> window(8) excludes 0 and 1 (8-6=2 > 1)
        rows = [(1, 0, 1.00), (1, 0, 2.00), (1, 1, 4.00), (1, 8, 8.00), (2, 3, 0.50)]
        ts = [np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
              for (_, d, _) in rows]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        })
        got = (
            relational.rolling_range_sum(rd.from_arrow(t).repartition(3), window_days=7)
            .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
        )
        assert got["day_cents"].tolist() == [300, 400, 800, 50]
        assert got["sum_window_cents"].tolist() == [300, 700, 800, 50]

    def test_rolling_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
        got = (
            relational.rolling_range_sum(ds, window_days=7)
            .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
                       FROM '{SF}/events.parquet'),
            d AS (SELECT user_id, day, SUM(cents) AS c FROM e GROUP BY 1, 2)
            SELECT user_id, day, CAST(c AS BIGINT) AS day_cents,
                   CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY day
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS sum_window_cents
            FROM d ORDER BY user_id, day
            """
        ).df()
        assert got["day_cents"].tolist() == exp["day_cents"].astype(int).tolist()
        assert got["sum_window_cents"].tolist() == exp["sum_window_cents"].astype(int).tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
        a = (relational.rolling_range_sum(base.repartition(1), window_days=3, buckets=3)
             .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True))
        b = (relational.rolling_range_sum(base.repartition(15), window_days=3, buckets=64)
             .to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestConversionWithin:
    def test_hand_built_attribution(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # user 1: clicks at h0 and h1; purchases at h2 and h200 (outside a
        # 24h window of the h1 click only for h200). user 2: click, no buy.
        base = np.datetime64("2024-01-01T00:00:00", "us")
        h = np.timedelta64(3600, "s").astype("timedelta64[us]")
        rows = [
            (1, 0, "click"), (1, 1, "click"), (1, 2, "purchase"),
            (1, 200, "purchase"), (2, 0, "click"), (3, 0, "purchase"),
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([base + r[1] * h for r in rows],
                                    dtype="datetime64[us]")),
            "event_type": pa.array([r[2] for r in rows]),
        })
        got = (
            relational.conversion_within(
                rd.from_arrow(t).repartition(3), window_us=86_400_000_000)
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        # user 3 has no click -> absent; user 1: both clicks convert via the
        # h2 purchase (h200 is > 24h after both); 2 qualifying pairs total.
        assert got["user_id"].tolist() == [1, 2]
        assert got["n_from"].tolist() == [2, 1]
        assert got["n_converted"].tolist() == [2, 0]
        assert got["n_pairs"].tolist() == [2, 0]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_type"])
        got = (
            relational.conversion_within(ds, window_us=7 * 86_400_000_000)
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH c AS (SELECT user_id, epoch_us(ts) AS t,
                       ROW_NUMBER() OVER () AS rid
                       FROM '{SF}/events.parquet' WHERE event_type = 'click'),
            p AS (SELECT user_id, epoch_us(ts) AS t
                  FROM '{SF}/events.parquet' WHERE event_type = 'purchase'),
            per AS (SELECT c.user_id, c.rid, COUNT(p.t) AS m FROM c
                    LEFT JOIN p ON p.user_id = c.user_id
                    AND p.t > c.t AND p.t <= c.t + 604800000000
                    GROUP BY c.user_id, c.rid)
            SELECT user_id, COUNT(*) AS n_from,
                   SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS n_converted,
                   SUM(m) AS n_pairs
            FROM per GROUP BY user_id ORDER BY user_id
            """
        ).df()
        assert got["n_from"].tolist() == exp["n_from"].astype(int).tolist()
        assert got["n_converted"].tolist() == exp["n_converted"].astype(int).tolist()
        assert got["n_pairs"].tolist() == exp["n_pairs"].astype(int).tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
        a = (relational.conversion_within(base.repartition(1), buckets=3)
             .to_pandas().sort_values("user_id").reset_index(drop=True))
        b = (relational.conversion_within(base.repartition(15), buckets=64)
             .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestFulfillmentLatency:
    def test_matches_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            relational.fulfillment_latency(SF)
            .to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH per AS (SELECT o.o_orderpriority AS pri,
                 MAX(CAST(FLOOR(epoch(l.l_shipdate)) AS BIGINT) // 86400) -
                 CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS lat
                 FROM '{SF}/orders.parquet' o
                 JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
                 GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate),
            c AS (SELECT pri, lat, COUNT(*) AS n FROM per GROUP BY 1, 2),
            w AS (SELECT pri, lat,
                  SUM(n) OVER (PARTITION BY pri ORDER BY lat) AS cum,
                  SUM(n) OVER (PARTITION BY pri) AS tot FROM c)
            SELECT pri, MAX(tot) AS n_orders,
                   MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN lat END) AS p50,
                   MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN lat END) AS p90
            FROM w GROUP BY pri ORDER BY pri
            """
        ).df()
        assert got["o_orderpriority"].tolist() == exp["pri"].tolist()
        assert got["n_orders"].tolist() == exp["n_orders"].astype(int).tolist()
        assert got["p50_days"].tolist() == exp["p50"].astype(int).tolist()
        assert got["p90_days"].tolist() == exp["p90"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestSpikeDays:
    def test_hand_built_spike(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        day_us = 86_400_000_000
        # 8 quiet days at 1.00, then day 8 at 10.00: spikes (np=8 >= 3,
        # 1000*8 > 2*800). Day 2 (np=2 < min_prev) never flags.
        ts, vals = [], []
        for d in range(8):
            ts.append(d * day_us)
            vals.append(1.00)
        ts.append(8 * day_us)
        vals.append(10.00)
        t = pa.table({"ts": pa.array(ts, pa.int64()),
                      "value": pa.array(vals, pa.float64())})
        got = (
            relational.spike_days(rd.from_arrow(t).repartition(3), "ts",
                                  "value", window=28, min_prev=3, mult=2)
            .to_pandas().sort_values("day").reset_index(drop=True)
        )
        assert got["spike"].tolist() == [0] * 8 + [1]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
        got = (relational.spike_days(ds).to_pandas()
               .sort_values("day").reset_index(drop=True))
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
                 SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS rev
                 FROM '{SF}/events.parquet' GROUP BY 1),
            w AS (SELECT day, rev, COALESCE(SUM(rev) OVER (ORDER BY day
                  ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING), 0) AS sp,
                  COUNT(rev) OVER (ORDER BY day
                  ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING) AS np FROM d)
            SELECT day, rev, CASE WHEN np >= 7 AND rev * np > 2 * sp
                   THEN 1 ELSE 0 END AS spike FROM w ORDER BY day
            """
        ).df()
        assert got["rev_cents"].tolist() == exp["rev"].astype(int).tolist()
        assert got["spike"].tolist() == exp["spike"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestKmeansInertia:
    def test_consistent_with_kmeans_clusters_and_numpy(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics
        from distributed_system___ocr_ray.pipelines.analytics import (
            _kmeans_fit, _kmeans_quantize)

        base = rd.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
        got = (
            analytics.kmeans_inertia(base, k=4, iters=2)
            .to_pandas().sort_values("cluster_id").reset_index(drop=True)
        )
        # sizes must agree with the fingerprint query's clustering
        sizes = (
            analytics.kmeans_clusters(base, k=4, iters=2)
            .to_pandas().sort_values("cluster_id").reset_index(drop=True)
        )
        assert got["cluster_id"].tolist() == sizes["cluster_id"].tolist()
        assert got["n_vecs"].tolist() == sizes["n_vecs"].tolist()
        # numpy reference inertia over the same quantized projection
        qds = _kmeans_quantize(base, "vec_id", "embedding", 1000)
        Q = np.stack(qds.to_pandas()["q"].tolist()).astype(np.int64)
        C = _kmeans_fit(qds.materialize(), k=4, iters=2, id_col="vec_id")
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d, axis=1)
        ref = {c: int(d[cid == c, c].sum()) for c in np.unique(cid)}
        assert {int(r.cluster_id): int(r.inertia)
                for r in got.itertuples()} == ref


@pytest.mark.usefixtures("ray_session")
class TestRnnPairs:
    def test_hand_built_mutuality(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 2-D toy: 0 and 1 are each other's NN (mutual); 2's NN is 0 but
        # 0's NN is 1 -- with k=1 only (0,1) survives.
        t = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.99, 0.14], [0.2, 0.98]],
                                  pa.list_(pa.float32())),
        })
        got = (
            analytics.rnn_pairs(rd.from_arrow(t).repartition(2), k=1)
            .to_pandas().sort_values(["vec_id_a", "vec_id_b"])
        )
        assert list(zip(got["vec_id_a"], got["vec_id_b"])) == [(0, 1)]

    def test_matches_duckdb_and_symmetry(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        got = (
            analytics.rnn_pairs(ds, k=4)
            .to_pandas().sort_values(["vec_id_a", "vec_id_b"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH knn AS (SELECT a.vec_id AS src, b.vec_id AS nbr
                 FROM '{SF}/embeddings.parquet' a
                 CROSS JOIN '{SF}/embeddings.parquet' b
                 WHERE a.vec_id <> b.vec_id
                 QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 list_cosine_similarity(a.embedding, b.embedding) DESC,
                 b.vec_id) <= 4)
            SELECT k1.src AS a, k1.nbr AS b FROM knn k1
            JOIN knn k2 ON k2.src = k1.nbr AND k2.nbr = k1.src
            WHERE k1.src < k1.nbr ORDER BY a, b
            """
        ).df()
        assert got["vec_id_a"].tolist() == exp["a"].astype(int).tolist()
        assert got["vec_id_b"].tolist() == exp["b"].astype(int).tolist()
        assert (got["vec_id_a"] < got["vec_id_b"]).all()


@pytest.mark.usefixtures("ray_session")
class TestPeriodOverPeriod:
    def test_hand_built_gap_periods_skip(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        day_us = 86_400_000_000
        # periods 0, 0, 2 (period 1 empty): LAG skips the gap
        t = pa.table({
            "ts": pa.array([0, 3 * day_us, 15 * day_us], pa.int64()),
            "v": pa.array([1.00, 2.00, 10.00]),
        })
        got = (
            relational.period_over_period(rd.from_arrow(t).repartition(2),
                                          "ts", "v", period_days=7)
            .to_pandas().sort_values("period").reset_index(drop=True)
        )
        assert got["period"].tolist() == [0, 2]
        assert got["rev_cents"].tolist() == [300, 1000]
        assert got["prev_cents"].tolist() == [0, 300]
        assert got["delta_cents"].tolist() == [300, 700]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])
        got = (
            relational.period_over_period(ds, period_days=7)
            .to_pandas().sort_values("period").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH w AS (SELECT CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 604800
                       AS period,
                       SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS rev
                       FROM '{SF}/orders.parquet' GROUP BY 1)
            SELECT period, rev,
                   COALESCE(LAG(rev) OVER (ORDER BY period), 0) AS prev
            FROM w ORDER BY period
            """
        ).df()
        assert got["rev_cents"].tolist() == exp["rev"].astype(int).tolist()
        assert got["prev_cents"].tolist() == exp["prev"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestProfileTable:
    def test_hand_built_with_nulls_and_dupes(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table({
            "a": pa.array([1, 1, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "x", "y"], pa.string()),
        })
        got = (
            analytics.profile_table(rd.from_arrow(t).repartition(3),
                                    ["a", "b"], buckets=4)
            .sort_values("col").reset_index(drop=True)
        )
        assert got["col"].tolist() == ["a", "b"]
        assert got["n_rows"].tolist() == [5, 5]
        assert got["n_nulls"].tolist() == [1, 2]
        assert got["n_distinct"].tolist() == [3, 2]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            analytics.profile_table(
                rd.read_parquet(f"{SF}/documents.parquet"),
                ["doc_id", "text", "lang", "source", "n_chars"])
            .sort_values("col").reset_index(drop=True)
        )
        exp = duckdb.sql(
            " UNION ALL ".join(
                f"SELECT '{c}' AS col, COUNT(*) AS n_rows, "
                f"COUNT(*) - COUNT({c}) AS n_nulls, "
                f"COUNT(DISTINCT {c}) AS n_distinct "
                f"FROM '{SF}/documents.parquet'"
                for c in ["doc_id", "text", "lang", "source", "n_chars"])
            + " ORDER BY col"
        ).df()
        for c in ["n_rows", "n_nulls", "n_distinct"]:
            assert got[c].tolist() == exp[c].astype(int).tolist(), c


@pytest.mark.usefixtures("ray_session")
class TestBasketLift:
    def test_hand_built_lift_separates_popular_from_associated(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 8 baskets. items 1,2 co-occur ONLY together (perfect assoc,
        # support 4 each, pair 4): lift = 4*8/(4*4) = 2.0.
        # items 3,4 are popular but only partly together (support 5 each,
        # pair 3: baskets 3,5,6): lift = 3*8/(5*5) = 0.96.
        baskets = [
            (1, [1, 2, 3]), (2, [1, 2, 4]), (3, [1, 2, 3, 4]), (4, [1, 2]),
            (5, [3, 4]), (6, [3, 4]), (7, [3]), (8, [4]),
        ]
        rows_o, rows_i = [], []
        for o, its in baskets:
            for i in its:
                rows_o.append(o)
                rows_i.append(i)
        t = pa.table({"l_orderkey": pa.array(rows_o, pa.int64()),
                      "l_partkey": pa.array(rows_i, pa.int64())})

        got = analytics.basket_lift_topk(
            lambda: rd.from_arrow(t).repartition(3),
            min_support=1, topk=10, buckets=4)
        lift = got.set_index(["part_a", "part_b"])["lift_ppm"]
        assert lift.loc[(1, 2)] == 2_000_000
        assert lift.loc[(3, 4)] == (3 * 8 * 1_000_000) // (5 * 5)
        assert lift.loc[(1, 2)] > lift.loc[(3, 4)]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        got = analytics.basket_lift_topk(
            lambda: rd.read_parquet(f"{SF}/lineitem.parquet",
                                    columns=["l_orderkey", "l_partkey"]),
            min_support=5, topk=15,
        ).reset_index(drop=True)
        exp = duckdb.sql(
            f"""
            WITH f AS (SELECT l_partkey FROM (SELECT l_partkey, COUNT(*) AS c
                 FROM '{SF}/lineitem.parquet' GROUP BY 1) WHERE c >= 5),
            li AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{SF}/lineitem.parquet'
                   WHERE l_partkey IN (SELECT l_partkey FROM f)),
            p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  COUNT(*) AS n_orders FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2),
            p2 AS (SELECT * FROM p ORDER BY n_orders DESC, part_a, part_b
                   LIMIT 15),
            s AS (SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS c
                  FROM '{SF}/lineitem.parquet' WHERE l_partkey IN
                  (SELECT part_a FROM p2 UNION SELECT part_b FROM p2)
                  GROUP BY 1),
            nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n
                   FROM '{SF}/lineitem.parquet')
            SELECT part_a, part_b, n_orders,
                   CAST((n_orders * nb.n * 1000000) // (sa.c * sb.c) AS BIGINT)
                   AS lift_ppm
            FROM p2 JOIN s sa ON sa.l_partkey = p2.part_a
            JOIN s sb ON sb.l_partkey = p2.part_b, nb
            ORDER BY n_orders DESC, part_a, part_b
            """
        ).df()
        assert got["part_a"].tolist() == exp["part_a"].astype(int).tolist()
        assert got["lift_ppm"].tolist() == exp["lift_ppm"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestBfsLevels:
    def test_matches_recursive_sql_and_monotone(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = (
            analytics.bfs_levels(ds, source=0, max_rounds=5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # replay BFS in plain python over the same md5-derived edges
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
        adj: dict[int, list[int]] = {}
        frontier, lvl = {0}, {0: 0}
        for r in range(5):
            nxt = set()
            for u in frontier:
                if u not in adj:
                    d = 1 + md5_u64(f"{u}:deg".encode()) % 3
                    adj[u] = [t for j in range(d)
                              if (t := md5_u64(f"{u}:link:{j}".encode()) % n) != u]
                for v in adj[u]:
                    if v not in lvl:
                        lvl[v] = r + 1
                        nxt.add(v)
            frontier = nxt
        exp = sorted(lvl.items())
        assert list(zip(got["doc_id"], got["level"])) == exp
        assert got["level"].min() == 0 and got["level"].max() <= 5


@pytest.mark.usefixtures("ray_session")
class TestGiniPpm:
    def test_hand_built_known_values(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # all equal -> 0; extreme concentration [0,0,0,1] -> G=(n-1)/n=0.75
        eq = pa.table({"v": pa.array([5.0, 5.0, 5.0, 5.0])})
        assert relational.gini_ppm(rd.from_arrow(eq).repartition(2), "v",
                                   buckets=4) == 0
        conc = pa.table({"v": pa.array([0.0, 0.0, 0.0, 1.0])})
        assert relational.gini_ppm(rd.from_arrow(conc).repartition(2), "v",
                                   buckets=4) == 750_000

    def test_matches_duckdb_and_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
        got = relational.gini_ppm(base, "o_totalprice")
        exp = duckdb.sql(
            f"""
            WITH r AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c,
                       ROW_NUMBER() OVER (ORDER BY
                       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS rn
                       FROM '{SF}/orders.parquet'),
            s AS (SELECT SUM(CAST(rn AS HUGEINT) * c) AS s2,
                  SUM(CAST(c AS HUGEINT)) AS s1,
                  CAST(COUNT(*) AS HUGEINT) AS n FROM r)
            SELECT CAST((2*s2 - (n+1)*s1) * 1000000 // (n * s1) AS BIGINT) FROM s
            """
        ).fetchone()[0]
        assert got == int(exp)
        assert relational.gini_ppm(base.repartition(13), "o_totalprice",
                                   buckets=7) == got


@pytest.mark.usefixtures("ray_session")
class TestPpsSystematicSample:
    def test_hand_built_hits_sum_to_k(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # W=100, k=10 -> one boundary per 10 weight units. id 3 (w=55)
        # spans several boundaries (certainty unit); id 4 (w=0) never drawn.
        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "w": pa.array([5, 20, 55, 0, 20], pa.int64()),
        })
        got = (
            analytics.pps_systematic_sample(
                rd.from_arrow(t).repartition(3), "id", "w", k=10, buckets=4)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert got["n_hits"].sum() == 10
        assert 4 not in got["id"].tolist()
        # heaviest row must carry the most hits
        assert got.set_index("id")["n_hits"].idxmax() == 3

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "n_chars"])
        got = (
            analytics.pps_systematic_sample(ds, "doc_id", "n_chars", k=137)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                       SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id)
                       AS cw FROM '{SF}/documents.parquet'),
            tot AS (SELECT SUM(CAST(n_chars AS BIGINT)) AS w
                    FROM '{SF}/documents.parquet'),
            h AS (SELECT doc_id, n_chars, CAST((cw * 137) // w -
                  ((cw - n_chars) * 137) // w AS BIGINT) AS n_hits FROM c, tot)
            SELECT doc_id, n_chars, n_hits FROM h WHERE n_hits > 0
            ORDER BY doc_id
            """
        ).df()
        assert got["doc_id"].tolist() == exp["doc_id"].astype(int).tolist()
        assert got["n_hits"].tolist() == exp["n_hits"].astype(int).tolist()
        assert got["n_hits"].sum() == 137

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "n_chars"])
        a = (analytics.pps_systematic_sample(base.repartition(1), "doc_id",
                                             "n_chars", k=50, buckets=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (analytics.pps_systematic_sample(base.repartition(17), "doc_id",
                                             "n_chars", k=50, buckets=64)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestWeightedQuantile:
    def test_hand_built_heavy_weight_pulls_median(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # unweighted median of [1, 2, 3] is 2; weight 10 on the 3.00 row
        # drags the weighted median to 3.00 (total W=12, k=6 lands in 3's
        # cumulative weight range 3..12).
        t = pa.table({
            "v": pa.array([1.0, 2.0, 3.0]),
            "w": pa.array([1.0, 1.0, 10.0]),
        })
        got = analytics.weighted_quantile_cents(
            rd.from_arrow(t).repartition(2), "v", "w", q=0.5)
        assert got == 300

    def test_matches_duckdb_multiple_q(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_extendedprice", "l_quantity"])
        for q in (0.25, 0.5, 0.9):
            got = analytics.weighted_quantile_cents(
                ds, "l_extendedprice", "l_quantity", q=q, pull_limit=500)
            exp = duckdb.sql(
                f"""
                WITH t AS (SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                           AS cents, CAST(l_quantity AS BIGINT) AS w
                           FROM '{SF}/lineitem.parquet'),
                tot AS (SELECT SUM(w) AS tw FROM t),
                c AS (SELECT cents, SUM(w) OVER (ORDER BY cents) AS cw FROM t)
                SELECT MIN(cents) FROM c, tot WHERE cw >= CEIL({q} * tw)
                """
            ).fetchone()[0]
            assert got == int(exp), q

    def test_pull_limit_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_extendedprice", "l_quantity"])
        a = analytics.weighted_quantile_cents(
            ds, "l_extendedprice", "l_quantity", q=0.5, pull_limit=100_000)
        b = analytics.weighted_quantile_cents(
            ds, "l_extendedprice", "l_quantity", q=0.5, pull_limit=1,
            bins=16)
        assert a == b


@pytest.mark.usefixtures("ray_session")
class TestGlobalNtile:
    def test_hand_built_remainder_distribution(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # 7 rows, 3 tiles: SQL NTILE gives sizes 3, 2, 2; ties (30.0) break
        # by id so the duplicate value straddles tiles deterministically.
        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 30.0, 50.0, 60.0, 70.0]),
        })
        got = (
            relational.global_ntile(rd.from_arrow(t).repartition(3), "v", "id",
                                    n_tiles=3, buckets=4)
            .to_pandas().sort_values("tile").reset_index(drop=True)
        )
        assert got["tile"].tolist() == [1, 2, 3]
        assert got["n_rows"].tolist() == [3, 2, 2]
        assert got["min_cents"].tolist() == [1000, 3000, 6000]
        assert got["max_cents"].tolist() == [3000, 5000, 7000]
        assert got["sum_cents"].tolist() == [6000, 8000, 13000]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
        got = (
            relational.global_ntile(ds, "o_totalprice", "o_orderkey", n_tiles=10)
            .to_pandas().sort_values("tile").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH r AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                       AS cents, NTILE(10) OVER (ORDER BY
                       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT),
                       o_orderkey) AS tile FROM '{SF}/orders.parquet')
            SELECT tile, COUNT(*) AS n_rows, MIN(cents) AS min_cents,
                   MAX(cents) AS max_cents, SUM(cents) AS sum_cents
            FROM r GROUP BY tile ORDER BY tile
            """
        ).df()
        for c in ["tile", "n_rows", "min_cents", "max_cents", "sum_cents"]:
            assert got[c].tolist() == exp[c].astype(int).tolist(), c

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice"])
        a = (relational.global_ntile(base.repartition(1), "o_totalprice",
                                     "o_orderkey", n_tiles=7, buckets=5)
             .to_pandas().sort_values("tile").reset_index(drop=True))
        b = (relational.global_ntile(base.repartition(13), "o_totalprice",
                                     "o_orderkey", n_tiles=7, buckets=64)
             .to_pandas().sort_values("tile").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestPitValueJoin:
    def test_matches_duckdb_and_covers_every_purchase(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            relational.pit_value_join(SF, event_type="purchase")
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400
                       AS day, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
                       ts, event_id FROM '{SF}/events.parquet'),
            o AS (SELECT user_id, day, cents FROM (SELECT user_id, day, cents,
                  ROW_NUMBER() OVER (PARTITION BY user_id, day
                  ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
            c AS (SELECT user_id, day, cents, LAG(cents) OVER
                  (PARTITION BY user_id ORDER BY day) AS prev FROM o),
            k AS (SELECT user_id, day AS valid_from_day, cents FROM c
                  WHERE prev IS NULL OR cents != prev),
            v AS (SELECT user_id, valid_from_day, COALESCE(LEAD(valid_from_day)
                  OVER (PARTITION BY user_id ORDER BY valid_from_day),
                  CAST(-1 AS BIGINT)) AS valid_to_day, cents AS value_cents FROM k),
            p AS (SELECT event_id, user_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
                  FROM '{SF}/events.parquet' WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id, p.day, v.value_cents FROM p JOIN v
            ON v.user_id = p.user_id AND v.valid_from_day <= p.day
            AND (v.valid_to_day = -1 OR p.day < v.valid_to_day)
            ORDER BY event_id
            """
        ).df()
        # every purchase is covered exactly once (first version starts at
        # the user's first event day, versions are contiguous)
        n_purchases = duckdb.sql(
            f"SELECT COUNT(*) FROM '{SF}/events.parquet' "
            "WHERE event_type = 'purchase'"
        ).fetchone()[0]
        assert len(got) == n_purchases == len(exp)
        assert got["event_id"].tolist() == exp["event_id"].astype(int).tolist()
        assert got["value_cents"].tolist() == exp["value_cents"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestRollingActiveUsers:
    def test_hand_built_gap_days(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # W=3: user 1 active day 0 and day 10 (two islands, gap days 3-7
        # have ZERO active users); user 2 active days 1 and 2 (one island).
        day_us = 86_400_000_000
        rows = [(1, 0), (1, 10), (2, 1), (2, 2)]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * day_us + 5 for r in rows], pa.int64()),
        })
        got = (
            relational.rolling_active_users(
                rd.from_arrow(t).repartition(3), window_days=3, buckets=4)
            .to_pandas().sort_values("day").reset_index(drop=True)
        )
        assert got["day"].tolist() == list(range(0, 11))
        #        day: 0  1  2  3  4  5  6  7  8  9 10
        assert got["active_users"].tolist() == [1, 2, 2, 1, 1, 0, 0, 0, 0, 0, 1]

    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        got = (
            relational.rolling_active_users(ds, window_days=30)
            .to_pandas().sort_values("day").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH ud AS (SELECT DISTINCT user_id,
                        CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d
                        FROM '{SF}/events.parquet'),
            b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ud),
            cal AS (SELECT UNNEST(range(lo, hi + 1)) AS day FROM b)
            SELECT cal.day AS day, COUNT(DISTINCT ud.user_id) AS active_users
            FROM cal LEFT JOIN ud ON ud.d BETWEEN cal.day - 29 AND cal.day
            GROUP BY cal.day ORDER BY day
            """
        ).df()
        assert got["day"].tolist() == exp["day"].astype(int).tolist()
        assert got["active_users"].tolist() == exp["active_users"].astype(int).tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        a = (relational.rolling_active_users(base.repartition(1), window_days=7,
                                             buckets=3)
             .to_pandas().sort_values("day").reset_index(drop=True))
        b = (relational.rolling_active_users(base.repartition(15), window_days=7,
                                             buckets=64)
             .to_pandas().sort_values("day").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestGlobalRank:
    def test_hand_built_ranks_with_ties(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([3.00, 1.00, 3.00, 2.00, 0.50], pa.float64()),
        })
        got = (
            relational.global_rank(rd.from_arrow(t).repartition(3), "v", "id", buckets=4)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        # sorted values: 50,100,200,300,300 -> ranks 0,1,2,3,3 (tie-min)
        assert dict(zip(got["id"], got["rank0"])) == {5: 0, 2: 1, 4: 2, 1: 3, 3: 3}

    def test_rank_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        got = (
            relational.global_rank(ds, "o_totalprice", "o_orderkey")
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT o_orderkey,
                   CAST(RANK() OVER (ORDER BY CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)) - 1
                        AS BIGINT) AS rank0
            FROM '{SF}/orders.parquet' ORDER BY o_orderkey
            """
        ).df()
        assert got["rank0"].tolist() == exp["rank0"].astype(int).tolist()

    def test_bucket_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        a = (relational.global_rank(base, "o_totalprice", "o_orderkey", buckets=2)
             .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
        b = (relational.global_rank(base, "o_totalprice", "o_orderkey", buckets=97)
             .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestApproxDistinctByKey:
    def test_grouped_estimates_near_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.sketches import approx_distinct_by_key

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
        got = approx_distinct_by_key(ds, "event_type", "user_id", p=10)
        exp = duckdb.sql(
            f"""SELECT event_type, COUNT(DISTINCT user_id) AS n
                FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).df()
        assert got["event_type"].tolist() == exp["event_type"].tolist()
        for a, e in zip(got["approx_distinct"], exp["n"]):
            assert abs(a - e) <= max(5, 0.1 * e), (a, e)

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.sketches import approx_distinct_by_key

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
        a = approx_distinct_by_key(base.repartition(1), "event_type", "user_id", p=10)
        b = approx_distinct_by_key(base.repartition(13), "event_type", "user_id", p=10)
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestNewUsersDaily:
    def test_hand_built_curve(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # first days: u1->0, u2->0, u3->2, u4->5
        rows = [(1, 0), (1, 3), (2, 0), (3, 2), (3, 2), (4, 5)]
        ts = [np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
              for (_, d) in rows]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        })
        got = (
            relational.new_users_daily(rd.from_arrow(t).repartition(3))
            .to_pandas().sort_values("day").reset_index(drop=True)
        )
        assert got["new_users"].tolist() == [2, 1, 1]
        assert got["cum_users"].tolist() == [2, 3, 4]

    def test_matches_duckdb_and_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        a = (relational.new_users_daily(base.repartition(1), buckets=3)
             .to_pandas().sort_values("day").reset_index(drop=True))
        b = (relational.new_users_daily(base.repartition(9), buckets=64)
             .to_pandas().sort_values("day").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()
        exp = duckdb.sql(
            f"""
            WITH f AS (SELECT user_id,
                       MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS day
                       FROM '{SF}/events.parquet' GROUP BY 1)
            SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f
            GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert a["new_users"].tolist() == exp["new_users"].astype(int).tolist()
        assert a["cum_users"].tolist() == exp["new_users"].astype(int).cumsum().tolist()


@pytest.mark.usefixtures("ray_session")
class TestBucketedZipJoin:
    def _write_pair(self, root, n_buckets_a=8, n_buckets_b=8):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like

        orders = rd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_orderpriority"])
        items = rd.read_parquet(f"{SF}/lineitem.parquet",
                                columns=["l_orderkey", "l_quantity"])
        lance_like.write_bucketed(orders, f"{root}/orders", "o_orderkey", n_buckets_a)
        lance_like.write_bucketed(items, f"{root}/lineitem", "l_orderkey", n_buckets_b)

    def test_zip_join_matches_sql_join(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import relational

        self._write_pair(str(tmp_path))
        got = (
            relational.zip_join_bucketed(
                f"{tmp_path}/orders", f"{tmp_path}/lineitem",
                "o_orderkey", "l_orderkey")
            .to_pandas()
            .sort_values(["o_orderkey", "l_quantity"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT o_orderkey, o_orderpriority, l_quantity
            FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
            ON o_orderkey = l_orderkey
            ORDER BY o_orderkey, l_quantity
            """
        ).df()
        assert len(got) == len(exp)
        assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
        assert got["l_quantity"].tolist() == exp["l_quantity"].tolist()

    def test_spec_mismatch_raises(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import relational

        self._write_pair(str(tmp_path), n_buckets_a=8, n_buckets_b=4)
        with pytest.raises(ValueError, match="specs differ"):
            relational.zip_join_bucketed(
                f"{tmp_path}/orders", f"{tmp_path}/lineitem",
                "o_orderkey", "l_orderkey")

    def test_non_bucketed_table_raises(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like

        ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
        lance_like.write_dataset(ds, f"{tmp_path}/plain")
        with pytest.raises(ValueError, match="not a bucketed"):
            lance_like.bucket_paths(f"{tmp_path}/plain")


@pytest.mark.usefixtures("ray_session")
class TestLabelCentroidSums:
    def test_matches_numpy_reference(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
        got = (analytics.label_centroid_sums(ds)
               .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
        import pyarrow.parquet as pq
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        v = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        labels = t.column("label").to_numpy().astype(np.int64)
        for lab in np.unique(labels):
            sel = got[got["label"] == lab]
            assert sel["sum_micros"].tolist() == v[labels == lab].sum(axis=0).tolist()
            assert (sel["n_vecs"] == (labels == lab).sum()).all()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
        a = (analytics.label_centroid_sums(base.repartition(1))
             .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
        b = (analytics.label_centroid_sums(base.repartition(7))
             .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestRefreshDailyAgg:
    def test_incremental_equals_full(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        root = str(tmp_path / "events")
        base = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "value"])
        import pyarrow.compute as pc

        def part(keep: bool):
            def f(b: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), 0)
                return b.filter(m if keep else pc.invert(m)).select(["ts", "value"])
            return f

        lance_like.write_dataset(base.map_batches(part(False), batch_format="pyarrow"),
                                 root, rows_per_fragment=512)
        agg1, v1 = compose.refresh_daily_agg(root)
        lance_like.write_dataset(base.map_batches(part(True), batch_format="pyarrow"),
                                 root, mode="append", rows_per_fragment=512)
        inc, v2 = compose.refresh_daily_agg(root, agg1, v1)
        full, v2b = compose.refresh_daily_agg(root)
        assert v2 == v2b
        assert inc.values.tolist() == full.values.tolist()

    def test_removed_fragments_raise(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        root = str(tmp_path / "events")
        base = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
        lance_like.write_dataset(base, root, rows_per_fragment=256)
        agg1, v1 = compose.refresh_daily_agg(root)
        lance_like.compact(root, target_rows_per_fragment=4096)
        with pytest.raises(ValueError, match="removed fragments"):
            compose.refresh_daily_agg(root, agg1, v1)

    def test_empty_increment_returns_prior(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        root = str(tmp_path / "events")
        base = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
        lance_like.write_dataset(base, root)
        agg1, v1 = compose.refresh_daily_agg(root)
        again, v2 = compose.refresh_daily_agg(root, agg1, v1)
        assert v2 == v1
        assert again.values.tolist() == agg1.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestSemiJoinAgg:
    def test_hand_built_semi_join(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        fact = pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "g": pa.array(["a", "a", "b", "b"]),
        })
        probe = pa.table({"pk": pa.array([2, 2, 4, 9], pa.int64())})
        got = (
            relational.semi_join_agg(
                rd.from_arrow(fact).repartition(2),
                rd.from_arrow(probe).repartition(2), "k", "pk", "g")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        assert got["g"].tolist() == ["a", "b"]
        assert got["n_matching"].tolist() == [1, 1]

    def test_broadcast_cap_raises(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        fact = pa.table({"k": pa.array([1], pa.int64()), "g": pa.array(["a"])})
        probe = pa.table({"pk": pa.array(list(range(100)), pa.int64())})
        with pytest.raises(ValueError, match="broadcast cap"):
            relational.semi_join_agg(
                rd.from_arrow(fact), rd.from_arrow(probe), "k", "pk", "g",
                broadcast_cap_bytes=8)


@pytest.mark.usefixtures("ray_session")
class TestStarJoinRevenue:
    def test_matches_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (relational.star_join_revenue(SF)
               .to_pandas().sort_values(["p_brand", "n_name"]).reset_index(drop=True))
        exp = duckdb.sql(
            f"""
            SELECT p_brand, n_name,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM '{SF}/lineitem.parquet'
            JOIN '{SF}/part.parquet' ON l_partkey = p_partkey
            JOIN '{SF}/supplier.parquet' ON l_suppkey = s_suppkey
            JOIN '{SF}/nation.parquet' ON s_nationkey = n_nationkey
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert got["p_brand"].tolist() == exp["p_brand"].tolist()
        assert got["n_name"].tolist() == exp["n_name"].tolist()
        assert got["revenue_cents"].tolist() == exp["revenue_cents"].astype(int).tolist()
        assert got["n_rows"].tolist() == exp["n_rows"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestZOrder:
    def test_morton_kernel_reference(self):
        from distributed_system___ocr_ray.sources.lance_like import _morton2

        a = np.array([0, 1, 0, 3], dtype=np.uint64)
        b = np.array([0, 0, 1, 3], dtype=np.uint64)
        # bit-interleave reference: a odd positions, b even
        def ref(x, y):
            out = 0
            for i in range(16):
                out |= ((x >> i) & 1) << (2 * i + 1)
                out |= ((y >> i) & 1) << (2 * i)
            return out
        got = _morton2(a, b)
        assert got.tolist() == [ref(x, y) for x, y in zip(a.tolist(), b.tolist())]

    def test_zorder_prunes_both_dims(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like

        root = str(tmp_path / "ev")
        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])

        def derive(batch: pa.Table) -> pa.Table:
            day = batch.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
            return pa.table({
                "user_id": batch.column("user_id"),
                "day": pa.array(day, pa.int64()),
                "value": batch.column("value"),
            })

        # 64-row fragments -> ~16 z-squares over the 1000-row table: coarse
        # 256-row fragments made the pruning geometry razor-thin (sort
        # block boundaries shift under load; observed 5 fragments whose
        # minmax boxes all overlapped a quarter band -> flake)
        res = lance_like.write_zordered(
            base.map_batches(derive, batch_format="pyarrow"),
            root, "user_id", "day", rows_per_fragment=64,
        )
        (ulo, uhi) = res["bounds"]["user_id"]
        (dlo, dhi) = res["bounds"]["day"]
        u1, u2 = ulo + (uhi - ulo) // 4, ulo + (uhi - ulo) // 2
        d1, d2 = dlo + (dhi - dlo) // 4, dlo + (dhi - dlo) // 2
        # pruning on EITHER dim alone must skip fragments (z-order clusters both)
        for preds in (
            [("user_id", "between", (u1, u2))],
            [("day", "between", (d1, d2))],
            [("user_id", "between", (u1, u2)), ("day", "between", (d1, d2))],
        ):
            paths, total = lance_like.pruned_fragment_paths(root, preds)
            assert 0 < len(paths) < total, (preds, len(paths), total)
        # and the pruned read returns exactly the WHERE rows
        got = lance_like.read_dataset(
            root, predicates=[("user_id", "between", (u1, u2)),
                              ("day", "between", (d1, d2))]
        ).to_pandas()
        exp = duckdb.sql(
            f"""
            WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
                       FROM '{SF}/events.parquet')
            SELECT COUNT(*) AS n FROM e
            WHERE user_id BETWEEN {u1} AND {u2} AND day BETWEEN {d1} AND {d2}
            """
        ).df()
        assert len(got) == int(exp["n"].iloc[0])


@pytest.mark.usefixtures("ray_session")
class TestSchemaEvolution:
    def _build(self, root):
        import ray.data as rd

        import pyarrow.compute as pc

        from distributed_system___ocr_ray.sources import lance_like

        base = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])

        def cohort(new: bool):
            def f(b: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0)
                out = b.filter(m if new else pc.invert(m))
                if new:
                    out = out.append_column("tier", pa.array([7] * out.num_rows, pa.int64()))
                return out
            return f

        lance_like.write_dataset(base.map_batches(cohort(False), batch_format="pyarrow"), root)
        lance_like.evolve_add_column(root, "tier", "int64", 0)
        lance_like.write_dataset(base.map_batches(cohort(True), batch_format="pyarrow"),
                                 root, mode="append")
        return lance_like

    def test_default_fill_and_physical_cohorts(self, tmp_path):
        root = str(tmp_path / "docs")
        lance_like = self._build(root)
        df = lance_like.read_evolved(root).to_pandas()
        odd = df[df["doc_id"] % 2 == 1]
        even = df[df["doc_id"] % 2 == 0]
        assert (odd["tier"] == 0).all()      # metadata default
        assert (even["tier"] == 7).all()     # physical values
        import duckdb as dk
        n = dk.sql(f"SELECT COUNT(*) n FROM '{SF}/documents.parquet'").df()["n"][0]
        assert len(df) == int(n)

    def test_double_evolve_raises(self, tmp_path):
        root = str(tmp_path / "docs")
        lance_like = self._build(root)
        with pytest.raises(ValueError, match="already evolved"):
            lance_like.evolve_add_column(root, "tier", "int64", 0)

    def test_old_shape_append_still_allowed(self, tmp_path):
        import ray.data as rd

        root = str(tmp_path / "docs")
        lance_like = self._build(root)
        base = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
        lance_like.write_dataset(base.limit(10), root, mode="append")
        df = lance_like.read_evolved(root).to_pandas()
        assert (df[df.duplicated("doc_id", keep=False)].groupby("doc_id").size() >= 1).all()

    def test_column_projection(self, tmp_path):
        root = str(tmp_path / "docs")
        lance_like = self._build(root)
        df = lance_like.read_evolved(root, columns=["lang", "tier"]).to_pandas()
        assert sorted(df.columns) == ["lang", "tier"]


@pytest.mark.usefixtures("ray_session")
class TestTypoPairs:
    def test_hand_built_families(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # cat~bat (substitution), cat~cats and ba~bat (insertion), dog
        # isolated, ab~ba must NOT pair (distance 2, the transposition trap)
        t = pa.table({"s": pa.array(["cat", "bat", "cats", "dog", "ab", "ba",
                                     "cat", "bat"])})  # dups collapse
        got = (
            analytics.typo_pairs(rd.from_arrow(t).repartition(3), "s")
            .to_pandas().sort_values(["tok_a", "tok_b"]).values.tolist()
        )
        assert got == [["ba", "bat"], ["bat", "cat"], ["cat", "cats"]]

    def test_matches_levenshtein_oracle(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_name"])
        got = (analytics.typo_pairs(ds, "c_name")
               .to_pandas().sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
        exp = duckdb.sql(
            f"""
            WITH v AS (SELECT DISTINCT c_name AS tk FROM '{SF}/customer.parquet')
            SELECT a.tk AS tok_a, b.tk AS tok_b FROM v a
            JOIN v b ON a.tk < b.tk AND levenshtein(a.tk, b.tk) = 1 ORDER BY 1, 2
            """
        ).df()
        assert got["tok_a"].tolist() == exp["tok_a"].tolist()
        assert got["tok_b"].tolist() == exp["tok_b"].tolist()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_name"])
        a = (analytics.typo_pairs(base.repartition(1), "c_name", buckets=3)
             .to_pandas().sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
        b = (analytics.typo_pairs(base.repartition(7), "c_name", buckets=64)
             .to_pandas().sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
class TestJsonFieldStats:
    def test_matches_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["props", "event_type"])
        got = (relational.json_field_stats(ds)
               .to_pandas().sort_values("event_type").reset_index(drop=True))
        exp = duckdb.sql(
            f"""
            WITH x AS (SELECT event_type,
                       CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
                       FROM '{SF}/events.parquet'
                       WHERE regexp_extract(props, '"k":\\s*(\\d+)', 1) <> '')
            SELECT event_type, COUNT(*) AS n_rows, SUM(k) AS sum_k,
                   MIN(k) AS min_k, MAX(k) AS max_k
            FROM x GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert got["event_type"].tolist() == exp["event_type"].tolist()
        for c in ("n_rows", "sum_k", "min_k", "max_k"):
            assert got[c].tolist() == exp[c].astype(int).tolist(), c

    def test_missing_field_rows_drop(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table({
            "props": pa.array(['{"k": 3}', '{"other": 1}', '{"k": 7}']),
            "event_type": pa.array(["a", "a", "a"]),
        })
        got = relational.json_field_stats(rd.from_arrow(t)).to_pandas()
        assert got["n_rows"].tolist() == [2]
        assert got["sum_k"].tolist() == [10]


@pytest.mark.usefixtures("ray_session")
class TestCooccurrenceCounts:
    def test_hand_built_overlap(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["a", "b", "b", "a", "c", "a"]),
        })
        got = (relational.cooccurrence_counts(rd.from_arrow(t).repartition(3))
               .to_pandas().sort_values(["type_a", "type_b"]).values.tolist())
        assert got == [["a", "b", 1], ["a", "c", 1]]

    def test_matches_duckdb_and_partition_invariant(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        base = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
        a = (relational.cooccurrence_counts(base.repartition(1), buckets=3)
             .to_pandas().sort_values(["type_a", "type_b"]).reset_index(drop=True))
        b = (relational.cooccurrence_counts(base.repartition(9), buckets=64)
             .to_pandas().sort_values(["type_a", "type_b"]).reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT DISTINCT user_id, event_type FROM '{SF}/events.parquet')
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_ids FROM d a
            JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert a["n_ids"].tolist() == exp["n_ids"].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestAntiJoinAgg:
    def test_anti_flips_the_mask(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        fact = pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "g": pa.array(["a", "a", "b", "b"]),
        })
        probe = pa.table({"pk": pa.array([2, 4], pa.int64())})
        semi = (relational.semi_join_agg(rd.from_arrow(fact), rd.from_arrow(probe),
                                         "k", "pk", "g")
                .to_pandas().sort_values("g"))
        anti = (relational.semi_join_agg(rd.from_arrow(fact), rd.from_arrow(probe),
                                         "k", "pk", "g", anti=True)
                .to_pandas().sort_values("g"))
        assert semi["n_matching"].tolist() == [1, 1]
        assert anti["n_matching"].tolist() == [1, 1]
        # semi + anti partition the fact table
        assert semi["n_matching"].sum() + anti["n_matching"].sum() == 4


@pytest.mark.usefixtures("ray_session")
class TestInDegreeHistogram:
    def test_vs_python_replay(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = _pdf(analytics.in_degree_histogram(ds)).sort_values("in_degree")

        ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
        n = len(ids)
        indeg = {int(u): 0 for u in ids}
        for u in ids:
            u = int(u)
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % n
                if t != u:
                    indeg[t] += 1
        exp: dict[int, int] = {}
        for v in indeg.values():
            exp[v] = exp.get(v, 0) + 1
        assert dict(zip(got["in_degree"], got["n_nodes"])) == exp
        # histogram accounts for every node exactly once
        assert int(got["n_nodes"].sum()) == n

    def test_zero_row_present(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = _pdf(analytics.in_degree_histogram(ds))
        # ~e^-2 of nodes get no citations at deg ~2: the 0 row must exist
        assert 0 in set(got["in_degree"])


@pytest.mark.usefixtures("ray_session")
class TestTableChecksum:
    COLS = ["doc_id", "text", "lang", "source", "n_chars"]

    def _engine(self, tbl: pa.Table):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        df = _pdf(analytics.table_checksum(rd.from_arrow(tbl), self.COLS))
        return int(df["n_rows"].iloc[0]), df["checksum"].iloc[0]

    def test_order_and_partition_invariant(self):
        tbl = pq.read_table(f"{SF}/documents.parquet", columns=self.COLS)
        n1, c1 = self._engine(tbl)
        # row-permuted copy: same content, different order/blocking
        perm = np.random.RandomState(7).permutation(tbl.num_rows)
        n2, c2 = self._engine(tbl.take(pa.array(perm)))
        assert (n1, c1) == (n2, c2)
        assert n1 == tbl.num_rows

    def test_detects_single_value_change(self):
        tbl = pq.read_table(f"{SF}/documents.parquet", columns=self.COLS)
        _, c1 = self._engine(tbl)
        langs = tbl["lang"].to_pylist()
        langs[3] = langs[3] + "x"
        mutated = tbl.set_column(
            tbl.schema.get_field_index("lang"), "lang", pa.array(langs, pa.string())
        )
        _, c2 = self._engine(mutated)
        assert c1 != c2

    def test_matches_duckdb_fold(self):
        tbl = pq.read_table(f"{SF}/documents.parquet", columns=self.COLS)
        _, got = self._engine(tbl)
        exp = duckdb.sql(
            f"""
            WITH s AS (SELECT CAST(doc_id AS VARCHAR) || chr(31) || text ||
              chr(31) || lang || chr(31) || source || chr(31) ||
              CAST(n_chars AS VARCHAR) AS row_s
              FROM '{SF}/documents.parquet'),
            h AS (SELECT CAST(('0x' || substr(md5(row_s), 1, 16)) AS UBIGINT)
                  AS h64 FROM s)
            SELECT CAST(CAST(SUM(CAST(h64 AS HUGEINT)) % 18446744073709551616
                   AS UBIGINT) AS VARCHAR) AS checksum FROM h
            """
        ).df()["checksum"].iloc[0]
        assert got == exp

    def test_null_serialization(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "a": pa.array([1, None, 3], pa.int64()),
                "b": pa.array(["x", "y", None], pa.string()),
            }
        )
        df = _pdf(analytics.table_checksum(rd.from_arrow(tbl), ["a", "b"]))
        exp = duckdb.sql(
            """
            WITH s AS (SELECT COALESCE(CAST(a AS VARCHAR), chr(0)) || chr(31)
              || COALESCE(b, chr(0)) AS row_s FROM tbl),
            h AS (SELECT CAST(('0x' || substr(md5(row_s), 1, 16)) AS UBIGINT)
                  AS h64 FROM s)
            SELECT CAST(CAST(SUM(CAST(h64 AS HUGEINT)) % 18446744073709551616
                   AS UBIGINT) AS VARCHAR) AS checksum FROM h
            """
        ).df()["checksum"].iloc[0]
        assert df["checksum"].iloc[0] == exp


@pytest.mark.usefixtures("ray_session")
class TestPhraseDocCounts:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "lang": pa.array(["en", "en", "de", "de", "fr"], pa.string()),
                "text": pa.array(
                    [
                        "The Order FAST path",  # case-folded hit
                        "order slow fast order",  # no adjacent pair
                        "x order fast y order fast",  # two hits, counts once
                        "order, fast!",  # punctuation splits tokens: hit
                        "fast order",  # reversed: miss
                    ],
                    pa.string(),
                ),
            }
        )
        got = _pdf(analytics.phrase_doc_counts(rd.from_arrow(tbl), "order", "fast"))
        assert dict(zip(got["lang"], got["n_docs"])) == {"en": 1, "de": 2}

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.phrase_doc_counts(ds, "order", "fast"))
        exp = duckdb.sql(
            f"""
            WITH t AS (SELECT lang, regexp_extract_all(lower(text),
              '[a-z0-9]+') AS toks FROM '{SF}/documents.parquet')
            SELECT lang, COUNT(*) AS n_docs FROM t
            WHERE len(toks) >= 2 AND len(list_filter(range(1, len(toks)),
              i -> toks[i] = 'order' AND toks[i+1] = 'fast')) > 0
            GROUP BY lang
            """
        ).df()
        assert dict(zip(got["lang"], got["n_docs"])) == dict(
            zip(exp["lang"], exp["n_docs"])
        )


@pytest.mark.usefixtures("ray_session")
class TestDailyActivityAndOls:
    def test_daily_activity_zero_sides(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.daily_activity_full_outer(SF))
        # events span ~150 days inside the orders calendar; every events
        # day must also carry that day's order count, and order-only days
        # must appear with n_events == 0
        assert (got["n_orders"] + got["n_events"] > 0).all()
        assert (got["n_events"] == 0).any()
        exp = duckdb.sql(
            f"""
            WITH od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
              COUNT(*) n FROM '{SF}/orders.parquet' GROUP BY 1),
            ed AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) n
              FROM '{SF}/events.parquet' GROUP BY 1)
            SELECT COALESCE(od.day, ed.day) AS day,
              COALESCE(od.n, 0) AS n_orders, COALESCE(ed.n, 0) AS n_events
            FROM od FULL OUTER JOIN ed ON od.day = ed.day
            """
        ).df()
        g = got.sort_values("day").reset_index(drop=True)
        e = exp.sort_values("day").reset_index(drop=True)
        assert g["day"].tolist() == e["day"].tolist()
        assert g["n_orders"].tolist() == e["n_orders"].astype(int).tolist()
        assert g["n_events"].tolist() == e["n_events"].astype(int).tolist()

    def test_ols_known_slope(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # y = 100 cents/day exactly: slope_ppm must be 100_000_000
        days = ["1992-01-01", "1992-01-02", "1992-01-03", "1992-01-04"]
        t = pa.table(
            {
                "o_orderpriority": ["1-URGENT"] * 4,
                "o_orderdate": pa.array(
                    [np.datetime64(d + "T00:00:00", "us") for d in days],
                    pa.timestamp("us"),
                ),
                "o_totalprice": [10.0, 11.0, 12.0, 13.0],
            }
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            pq.write_table(t, os.path.join(td, "orders.parquet"))
            got = _pdf(relational.ols_trend_by_priority(td))
        assert got["slope_ppm"].tolist() == [100 * 10**6]
        assert got["n_orders"].tolist() == [4]

    def test_ols_vs_duckdb_regr_slope(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.ols_trend_by_priority(SF)).set_index("o_orderpriority")
        exp = duckdb.sql(
            f"""
            SELECT o_orderpriority,
              regr_slope(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT),
                datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)))
                AS slope
            FROM '{SF}/orders.parquet' GROUP BY 1
            """
        ).df().set_index("o_orderpriority")
        for pri in got.index:
            # float reference within one ppm-quantum of the exact integer
            assert abs(got.loc[pri, "slope_ppm"] / 1e6 - exp.loc[pri, "slope"]) < 1e-3


@pytest.mark.usefixtures("ray_session")
class TestKeySkewReport:
    def test_hand_built_hot_key(self):
        import pyarrow as pa
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # 99 singleton keys + one 100x hot key: p50=p99=1, max=100
        keys = list(range(99)) + [999] * 100
        t = pa.table({"k": pa.array(keys, pa.int64())})
        got = _pdf(relational.key_skew_report(rd.from_arrow(t), "k"))
        assert got.iloc[0].to_dict() == {
            "n_keys": 100, "n_rows": 199, "max_n": 100, "p50_n": 1, "p99_n": 1,
        }

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_suppkey"])
        got = _pdf(relational.key_skew_report(ds, "l_suppkey"))
        exp = duckdb.sql(
            f"""
            WITH g AS (SELECT l_suppkey, COUNT(*) AS n
              FROM '{SF}/lineitem.parquet' GROUP BY 1),
            c AS (SELECT n AS sz, COUNT(*) AS k FROM g GROUP BY 1),
            w AS (SELECT sz, k, SUM(k) OVER (ORDER BY sz) AS cum,
              SUM(k) OVER () AS tot FROM c)
            SELECT MAX(tot) AS n_keys, SUM(sz*k) AS n_rows, MAX(sz) AS max_n,
              MIN(CASE WHEN cum >= CEIL(0.5*tot) THEN sz END) AS p50_n,
              MIN(CASE WHEN cum >= CEIL(0.99*tot) THEN sz END) AS p99_n
            FROM w
            """
        ).df()
        assert got.iloc[0].astype(int).tolist() == exp.iloc[0].astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
class TestOovRateByLang:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # token counts: the=4, cat=4, dog=2, ran=1; vocab_k=2 keeps
        # {cat, the} (tie at 4 breaks token ASC, both survive). en: 7
        # tokens, oov = dog + ran -> 2; de: 4 tokens, oov = dog -> 1.
        tbl = pa.table(
            {
                "lang": pa.array(["en", "en", "de"], pa.string()),
                "text": pa.array(
                    ["The cat the DOG", "the cat ran", "the cat dog, cat"],
                    pa.string(),
                ),
            }
        )
        got = _pdf(analytics.oov_rate_by_lang(rd.from_arrow(tbl), vocab_k=2))
        out = {r.lang: (r.n_tokens, r.n_oov, r.oov_ppm) for r in got.itertuples()}
        assert out == {
            "en": (7, 2, 2 * 1_000_000 // 7),
            "de": (4, 1, 250_000),
        }

    def test_vocab_tie_break_token_asc(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 'aa' and 'zz' both count 2; vocab_k=1 must keep 'aa' (count DESC,
        # token ASC), so both 'zz' tokens are OOV
        tbl = pa.table(
            {
                "lang": pa.array(["en", "en"], pa.string()),
                "text": pa.array(["aa zz", "zz aa"], pa.string()),
            }
        )
        got = _pdf(analytics.oov_rate_by_lang(rd.from_arrow(tbl), vocab_k=1))
        assert got["n_tokens"].iloc[0] == 4 and got["n_oov"].iloc[0] == 2

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.oov_rate_by_lang(ds, vocab_k=64)).sort_values("lang")
        exp = duckdb.sql(
            f"""
            WITH t AS (SELECT lang, unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS tok FROM '{SF}/documents.parquet'),
            c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok),
            v AS (SELECT tok FROM c ORDER BY n DESC, tok ASC LIMIT 64),
            s AS (SELECT lang, COUNT(*) AS n_tokens,
              SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS n_oov
              FROM t GROUP BY lang)
            SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(n_oov AS BIGINT) AS n_oov,
              CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
            FROM s ORDER BY lang
            """
        ).df()
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestDupShingleRate:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # doc1/doc2 share the 3-shingle 'a b c'; doc3 (other source) is
        # all-unique; doc4 is a <3-word doc whose fallback shingle 'x y'
        # appears nowhere else
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": pa.array(["s1", "s1", "s2", "s2"], pa.string()),
                "text": pa.array(
                    [
                        "a b c d",  # shingles: 'a b c', 'b c d'
                        "a b c",  # shingle: 'a b c' (shared with doc1)
                        "p q r s",  # 'p q r', 'q r s' (unique)
                        "x y",  # fallback shingle 'x y' (unique)
                    ],
                    pa.string(),
                ),
            }
        )
        got = _pdf(analytics.dup_shingle_rate(rd.from_arrow(tbl), buckets=4))
        out = {
            r.source: (r.n_shingles, r.n_shared, r.shared_ppm) for r in got.itertuples()
        }
        assert out == {
            "s1": (3, 2, 2 * 1_000_000 // 3),
            "s2": (3, 0, 0),
        }

    def test_within_doc_repeat_not_shared(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 'a b c a b c a b c' repeats 'a b c' within ONE doc only: per-doc
        # distinctness means nothing is cross-doc shared
        tbl = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "source": pa.array(["s1"], pa.string()),
                "text": pa.array(["a b c a b c a b c"], pa.string()),
            }
        )
        got = _pdf(analytics.dup_shingle_rate(rd.from_arrow(tbl), buckets=2))
        assert got["n_shared"].iloc[0] == 0

    def test_doc_boilerplate_hand_built_and_mass(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # same corpus as test_hand_built, resolved per doc: doc1 has one of
        # its two shingles shared, doc2's single shingle is shared, docs
        # 3/4 are clean
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["a b c d", "a b c", "p q r s", "x y"], pa.string()
                ),
            }
        )
        got = (
            _pdf(analytics.doc_boilerplate_score(rd.from_arrow(tbl), buckets=4))
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [1, 2, 3, 4]
        assert list(got["n_shingles"]) == [2, 1, 2, 1]
        assert list(got["n_shared"]) == [1, 1, 0, 0]
        assert list(got["boilerplate_ppm"]) == [500_000, 1_000_000, 0, 0]
        # per-doc folds must conserve dup_shingle_rate's aggregate mass
        agg = _pdf(
            analytics.dup_shingle_rate(
                rd.from_arrow(tbl.append_column(
                    "source", pa.array(["s"] * 4, pa.string()))),
                buckets=4,
            )
        )
        assert got["n_shingles"].sum() == agg["n_shingles"].sum()
        assert got["n_shared"].sum() == agg["n_shared"].sum()

    def test_doc_boilerplate_bucket_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        a = (
            _pdf(analytics.doc_boilerplate_score(ds, buckets=3))
            .sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            _pdf(analytics.doc_boilerplate_score(ds, buckets=17))
            .sort_values("doc_id").reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        got = _pdf(analytics.dup_shingle_rate(ds)).sort_values("source")
        exp = duckdb.sql(
            f"""
            WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
              FROM '{SF}/documents.parquet'),
            base AS (SELECT doc_id, len(w) AS nw, w FROM ws),
            tok AS (SELECT doc_id, unnest(w) AS tk,
              unnest(generate_series(1, len(w))) AS i FROM base WHERE nw >= 3),
            sh3 AS (SELECT DISTINCT doc_id, tk || ' ' || lead(tk, 1) OVER win
              || ' ' || lead(tk, 2) OVER win AS s FROM tok
              WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY lead(tk, 2) OVER win IS NOT NULL),
            shsmall AS (SELECT doc_id, array_to_string(w, ' ') AS s FROM base
              WHERE nw < 3),
            sh AS (SELECT * FROM sh3 UNION ALL SELECT * FROM shsmall),
            g AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s),
            j AS (SELECT d.source, CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END AS shared
              FROM sh JOIN g USING (s)
              JOIN '{SF}/documents.parquet' d USING (doc_id)),
            a AS (SELECT source, COUNT(*) AS n_shingles, SUM(shared) AS n_shared
              FROM j GROUP BY source)
            SELECT source, CAST(n_shingles AS BIGINT) AS n_shingles,
              CAST(n_shared AS BIGINT) AS n_shared,
              CAST(n_shared * 1000000 // n_shingles AS BIGINT) AS shared_ppm
            FROM a ORDER BY source
            """
        ).df()
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestSessionPaths:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        def t(m):
            return np.datetime64(f"2024-01-01T00:{m:02d}:00", "us")

        # user 1: a,b,c,d within one session -> trigrams abc, bcd; then a
        # 31-min gap starts a session with only 2 events (no trigram).
        # user 2: equal-ts events ordered by event_id -> trigram abc.
        tbl = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 2, 2], pa.int64()),
                "ts": pa.array(
                    [t(0), t(1), t(2), t(3), t(35), t(36), t(0), t(0), t(0)],
                    pa.timestamp("us"),
                ),
                "event_id": pa.array([1, 2, 3, 4, 5, 6, 12, 11, 10], pa.int64()),
                "event_type": pa.array(
                    ["a", "b", "c", "d", "x", "y", "c", "b", "a"], pa.string()
                ),
            }
        )
        got = _pdf(relational.session_paths(rd.from_arrow(tbl), partitions=4))
        out = {(r.e1, r.e2, r.e3): r.n_paths for r in got.itertuples()}
        assert out == {("a", "b", "c"): 2, ("b", "c", "d"): 1}

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        events = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
        )
        got = (
            _pdf(relational.session_paths(events))
            .sort_values(["e1", "e2", "e3"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT user_id, ts, event_id, event_type,
              CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >
              INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
              FROM '{SF}/events.parquet'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM d),
            t AS (SELECT event_type AS e1, lead(event_type, 1) OVER w2 AS e2,
              lead(event_type, 2) OVER w2 AS e3 FROM s
              WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
            SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths FROM t
            WHERE e3 IS NOT NULL GROUP BY 1, 2, 3 ORDER BY e1, e2, e3
            """
        ).df()
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestPairSetAudit:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        exact = rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([1, 1, 2, 5], pa.int64()),
                    "doc_b": pa.array([2, 3, 3, 6], pa.int64()),
                    "jaccard_ppm": pa.array([9, 9, 9, 9], pa.int64()),
                }
            )
        )
        approx = rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([1, 2, 7], pa.int64()),
                    "doc_b": pa.array([2, 3, 8], pa.int64()),
                }
            )
        )
        got = _pdf(analytics.pair_set_audit(exact, approx)).iloc[0]
        # intersection {(1,2),(2,3)}: recall 2/4, precision 2/3
        assert (
            got["n_exact"],
            got["n_approx"],
            got["n_both"],
            got["recall_ppm"],
            got["precision_ppm"],
        ) == (4, 3, 2, 500_000, 666_666)

    def test_sf_recall_vs_duckdb_exact(self):
        from distributed_system___ocr_ray.pipelines import analytics

        import ray.data as rd

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        exact = analytics.ngram_jaccard_pairs(docs, threshold=0.5)
        approx = analytics.minhash_lsh_pairs(
            rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]),
            threshold=0.6,
        )
        got = _pdf(analytics.pair_set_audit(exact, approx)).iloc[0]
        assert got["n_both"] <= min(got["n_exact"], got["n_approx"])
        assert 0 <= got["recall_ppm"] <= 1_000_000
        assert 0 <= got["precision_ppm"] <= 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestTrimmedMean:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # group A: values 1..20 dollars, trim 5% -> k=1 -> keep 2..19:
        # sum 189 dollars = 18900 cents over 18 rows
        tbl = pa.table(
            {
                "g": pa.array(["A"] * 20 + ["B"] * 3, pa.string()),
                "v": pa.array([float(i) for i in range(1, 21)] + [5.0, 7.0, 9.0]),
            }
        )
        got = _pdf(relational.trimmed_mean_by_group(rd.from_arrow(tbl), "g", "v"))
        out = {
            r.g: (r.n_used, r.trimmed_sum_cents, r.trimmed_mean_cents)
            for r in got.itertuples()
        }
        # group B: n=3, k=0 -> nothing trimmed
        assert out == {"A": (18, 18900, 1050), "B": (3, 2100, 700)}

    def test_all_trimmed_group_vanishes(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # trim_pct=50 -> k = n//2; group C with n=2 keeps rn in (1, 1]:
        # nothing -> absent, exactly like the SQL replay
        tbl = pa.table(
            {
                "g": pa.array(["C", "C", "D", "D", "D"], pa.string()),
                "v": pa.array([1.0, 2.0, 1.0, 2.0, 3.0]),
            }
        )
        got = _pdf(
            relational.trimmed_mean_by_group(rd.from_arrow(tbl), "g", "v", trim_pct=50)
        )
        assert list(got["g"]) == ["D"] and got["n_used"].iloc[0] == 1

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
        )
        got = (
            _pdf(relational.trimmed_mean_by_group(ds, "o_orderpriority", "o_totalprice"))
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH o AS (SELECT o_orderpriority,
              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM '{SF}/orders.parquet'),
            r AS (SELECT o_orderpriority, cents, row_number() OVER
              (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
              COUNT(*) OVER (PARTITION BY o_orderpriority) AS n FROM o),
            t AS (SELECT o_orderpriority, cents FROM r
              WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100)
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_used,
              CAST(SUM(cents) AS BIGINT) AS trimmed_sum_cents,
              CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
            FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority
            """
        ).df()
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestQ15Q18Shapes:
    def test_top_revenue_suppliers_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.top_revenue_suppliers(SF))
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH r AS (SELECT l_suppkey,
              SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS rev FROM '{SF}/lineitem.parquet' GROUP BY l_suppkey),
            m AS (SELECT MAX(rev) AS mx FROM r)
            SELECT s.s_suppkey, s.s_name, CAST(r.rev AS BIGINT) AS revenue_cents
            FROM r JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = r.l_suppkey, m
            WHERE r.rev = m.mx ORDER BY s.s_suppkey
            """
        ).df()
        assert got.equals(exp) and len(got) >= 1

    def test_big_volume_orders_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.big_volume_orders(SF))
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH q AS (SELECT l_orderkey,
              SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS tq
              FROM '{SF}/lineitem.parquet' GROUP BY l_orderkey)
            SELECT o.o_orderkey, CAST(q.tq AS BIGINT) AS total_qty_cents,
              CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
            FROM q JOIN '{SF}/orders.parquet' o ON o.o_orderkey = q.l_orderkey
            WHERE q.tq > 15000 ORDER BY o.o_orderkey
            """
        ).df()
        assert got.equals(exp) and len(got) >= 1


@pytest.mark.usefixtures("ray_session")
class TestHllErrorAudit:
    def test_vs_duckdb_exact_side(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        events = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        got = analytics.hll_error_audit(events, "user_id").iloc[0]
        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
        ).fetchone()[0]
        assert got["exact_distinct"] == exact
        # p=12 HLL standard error is ~1.6%; assert a loose 10% band so the
        # test checks plumbing, not sketch luck
        assert abs(got["approx_distinct"] - exact) <= max(5, exact * 0.10)
        assert got["abs_err_ppm"] == abs(got["approx_distinct"] - exact) * 1_000_000 // exact

    def test_hand_built_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table({"user_id": pa.array([1, 1, 2, 3, 3, 3], pa.int64())})
        got = analytics.hll_error_audit(rd.from_arrow(tbl), "user_id").iloc[0]
        assert got["exact_distinct"] == 3


@pytest.mark.usefixtures("ray_session")
class TestBloomFpAudit:
    def test_hand_built_identities(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        corpus = rd.from_arrow(
            pa.table({"text": pa.array([f"doc {i}" for i in range(50)], pa.string())})
        )
        # 3 true dups + 2 novel rows
        new = rd.from_arrow(
            pa.table(
                {"text": pa.array(["doc 1", "doc 2", "doc 3", "xx", "yy"], pa.string())}
            )
        )
        got = analytics.bloom_fp_audit(new, corpus).iloc[0]
        assert got["n_new"] == 5
        assert got["n_true_dups"] == 3
        # every true dup must be a bloom hit (no false negatives)
        assert got["n_bloom_hits"] >= got["n_true_dups"]
        assert got["n_false_pos"] == got["n_bloom_hits"] - got["n_true_dups"]

    def test_vs_duckdb_replay(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = f"{SF}/documents.parquet"

        def side(want_zero):
            def fn(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                mask = (ids % 5 == 0) if want_zero else (ids % 5 != 0)
                return batch.filter(pa.array(mask))

            return fn

        base = rd.read_parquet(docs, columns=["doc_id", "text"])
        got = analytics.bloom_fp_audit(
            base.map_batches(side(True), batch_format="pyarrow"),
            base.map_batches(side(False), batch_format="pyarrow"),
        ).iloc[0]
        exp = duckdb.sql(
            f"""
            WITH newb AS (SELECT doc_id, sha256(text) AS h FROM '{docs}'
              WHERE doc_id % 5 = 0),
            corp AS (SELECT DISTINCT sha256(text) AS h FROM '{docs}'
              WHERE doc_id % 5 != 0),
            mm AS (SELECT GREATEST(64, 16 * COUNT(*)) AS m FROM corp),
            ch AS (SELECT CAST(('0x' || substr(md5(h), 1, 16)) AS UBIGINT) AS h1,
              (CAST(('0x' || substr(md5(h), 17, 16)) AS UBIGINT) | 1) AS h2 FROM corp),
            bits AS (SELECT DISTINCT CAST((CAST(h1 AS HUGEINT) + g.i * CAST(h2 AS HUGEINT))
              % (SELECT m FROM mm) AS BIGINT) AS pos
              FROM ch CROSS JOIN generate_series(0, 6) g(i)),
            nh AS (SELECT doc_id, h, CAST(('0x' || substr(md5(h), 1, 16)) AS UBIGINT) AS h1,
              (CAST(('0x' || substr(md5(h), 17, 16)) AS UBIGINT) | 1) AS h2 FROM newb),
            npp AS (SELECT doc_id, h, CAST((CAST(h1 AS HUGEINT) + g.i * CAST(h2 AS HUGEINT))
              % (SELECT m FROM mm) AS BIGINT) AS pos
              FROM nh CROSS JOIN generate_series(0, 6) g(i)),
            hitrows AS (SELECT doc_id, h,
              SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS kset
              FROM npp LEFT JOIN bits b USING (pos) GROUP BY doc_id, h)
            SELECT COUNT(*) AS n_new,
              SUM(CASE WHEN kset = 7 THEN 1 ELSE 0 END) AS n_hits,
              SUM(CASE WHEN h IN (SELECT h FROM corp) THEN 1 ELSE 0 END) AS n_true
            FROM hitrows
            """
        ).df().iloc[0]
        assert got["n_new"] == exp["n_new"]
        assert got["n_bloom_hits"] == exp["n_hits"]
        assert got["n_true_dups"] == exp["n_true"]


@pytest.mark.usefixtures("ray_session")
class TestCmsErrorAudit:
    def test_overestimate_invariant_and_exact_side(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        ds2 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = analytics.cms_error_audit(ds1, ds2, k=10)
        assert len(got) == 10
        # CMS never underestimates
        assert (got["n_cms"] >= got["n_exact"]).all()
        assert (got["over_ppm"] >= 0).all()
        exp = duckdb.sql(
            f"""
            SELECT unnest(regexp_extract_all(text, '\\S+')) AS tk
            FROM '{SF}/documents.parquet'
            """
        ).df()["tk"].value_counts()
        for t, n in zip(got["token"], got["n_exact"]):
            assert exp[t] == n


@pytest.mark.usefixtures("ray_session")
class TestDupSizeHistogram:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {"text": pa.array(["a", "a", "a", "b", "b", "c"], pa.string())}
        )
        got = _pdf(analytics.dup_size_histogram(rd.from_arrow(tbl)))
        out = dict(zip(got["group_size"], got["n_groups"]))
        assert out == {3: 1, 2: 1, 1: 1}

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = (
            _pdf(analytics.dup_size_histogram(ds))
            .sort_values("group_size")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH g AS (SELECT text, COUNT(*) AS n
              FROM '{SF}/documents.parquet' GROUP BY text)
            SELECT CAST(n AS BIGINT) AS group_size,
              CAST(COUNT(*) AS BIGINT) AS n_groups FROM g GROUP BY n ORDER BY 1
            """
        ).df()
        assert got.equals(exp)
        # invariant: sum(group_size * n_groups) == corpus rows
        assert int((got["group_size"] * got["n_groups"]).sum()) == ds.count()


@pytest.mark.usefixtures("ray_session")
class TestJoinSizeAudit:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        left = rd.from_arrow(
            pa.table({"a": pa.array([1, 1, 2, 3], pa.int64())})
        )
        right = rd.from_arrow(
            pa.table({"b": pa.array([1, 2, 2, 2, 9], pa.int64())})
        )
        got = analytics.join_size_audit(left, right, "a", "b").iloc[0]
        # exact: key 1 -> 2*1, key 2 -> 1*3, key 3/9 unmatched = 5
        assert got["exact_rows"] == 5
        # CMS inner product never underestimates
        assert got["cms_estimate"] >= 5
        assert got["over_ppm"] >= 0

    def test_vs_duckdb_exact_join(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
        lineitem = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
        got = analytics.join_size_audit(orders, lineitem, "o_orderkey", "l_orderkey").iloc[0]
        exp = duckdb.sql(
            f"""
            SELECT COUNT(*) FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey
            """
        ).fetchone()[0]
        assert got["exact_rows"] == exp
        assert got["cms_estimate"] >= exp


@pytest.mark.usefixtures("ray_session")
class TestInterarrivalQuantiles:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        def t(s):
            return np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(s, "s")

        # user 1 type a at 0, 10, 40 -> gaps 10, 30; user 2 type a at
        # 0, 100 -> gap 100; type b: single events only -> absent
        tbl = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2, 1], pa.int64()),
                "ts": pa.array([t(0), t(10), t(40), t(0), t(100), t(7)], pa.timestamp("us")),
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "a", "a", "b"], pa.string()),
            }
        )
        got = _pdf(relational.interarrival_quantiles(rd.from_arrow(tbl), partitions=4))
        assert list(got["event_type"]) == ["a"]
        r = got.iloc[0]
        # gaps sorted: 10, 30, 100 -> p50 = 30, p90 = 100
        assert (r["n_gaps"], r["p50_sec"], r["p90_sec"]) == (3, 30, 100)

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        events = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
        )
        got = (
            _pdf(relational.interarrival_quantiles(events))
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT event_type, (epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id))
              // 1000000 AS ds FROM '{SF}/events.parquet'),
            v AS (SELECT event_type, ds FROM d WHERE ds IS NOT NULL),
            c AS (SELECT event_type, ds, COUNT(*) AS n FROM v GROUP BY 1, 2),
            w AS (SELECT event_type, ds,
              SUM(n) OVER (PARTITION BY event_type ORDER BY ds) AS cum,
              SUM(n) OVER (PARTITION BY event_type) AS tot FROM c)
            SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_gaps,
              CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN ds END) AS BIGINT) AS p50_sec,
              CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN ds END) AS BIGINT) AS p90_sec
            FROM w GROUP BY event_type ORDER BY event_type
            """
        ).df()
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestRfmSegments:
    def test_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.rfm_segments(SF))
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH o AS (SELECT o_custkey,
              CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM '{SF}/orders.parquet'),
            pc AS (SELECT o_custkey AS c_custkey, MAX(day) AS last_day,
              CAST(COUNT(*) AS BIGINT) AS f_orders,
              CAST(SUM(cents) AS BIGINT) AS m_cents FROM o GROUP BY 1),
            mx AS (SELECT MAX(last_day) AS m FROM pc),
            p AS (SELECT c_custkey, (SELECT m FROM mx) - last_day AS r_days,
              f_orders, m_cents FROM pc),
            nn AS (SELECT COUNT(*) AS n FROM p),
            mb AS (SELECT m_cents AS v, row_number() OVER (ORDER BY m_cents) AS rn FROM p),
            mq AS (SELECT
              MAX(CASE WHEN rn = CAST(CEIL(0.25 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b1,
              MAX(CASE WHEN rn = CAST(CEIL(0.5 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b2,
              MAX(CASE WHEN rn = CAST(CEIL(0.75 * (SELECT n FROM nn)) AS BIGINT) THEN v END) AS b3
              FROM mb)
            SELECT p.c_custkey, CAST(p.r_days AS BIGINT) AS r_days, p.f_orders,
              p.m_cents,
              CAST(1 + CAST(p.m_cents > mq.b1 AS INT) + CAST(p.m_cents > mq.b2 AS INT)
              + CAST(p.m_cents > mq.b3 AS INT) AS BIGINT) AS m_score
            FROM p, mq ORDER BY p.c_custkey
            """
        ).df()
        assert got[["c_custkey", "r_days", "f_orders", "m_cents", "m_score"]].equals(exp)
        # quartile scores roughly balance (ties can skew, never empty)
        for col in ("r_score", "f_score", "m_score"):
            assert set(got[col].unique()) <= {1, 2, 3, 4}
            assert got[col].nunique() >= 2


@pytest.mark.usefixtures("ray_session")
class TestLangidConfusion:
    def test_mass_conservation_and_diagonal(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.langid_confusion(ds))
        assert int(got["n_docs"].sum()) == ds.count()
        # the det corpus's text is English-word sentences whatever the lang
        # LABEL says -- the matrix exposes exactly that (this audit's point)
        assert set(got["pred_lang"].unique()) <= {"en", "de", "fr", "es", "zh", "unknown"}
        en_mass = got[got["pred_lang"] == "en"]["n_docs"].sum()
        assert en_mass > got["n_docs"].sum() // 2

    def test_matches_language_id_query(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        per_doc = _pdf(analytics.language_id(docs))
        labels = duckdb.sql(
            f"SELECT doc_id, lang FROM '{SF}/documents.parquet'"
        ).df()
        j = per_doc.merge(labels, on="doc_id")
        exp = (
            j.groupby(["lang", "pred_lang"]).size().rename("n_docs").reset_index()
        )
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.langid_confusion(ds))
        g = got.sort_values(["lang", "pred_lang"]).reset_index(drop=True)
        e = exp.sort_values(["lang", "pred_lang"]).reset_index(drop=True)
        assert g["n_docs"].tolist() == e["n_docs"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestSupplierHhi:
    def test_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = relational.supplier_hhi(SF).iloc[0]
        exp = duckdb.sql(
            f"""
            WITH r AS (SELECT l_suppkey,
              SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS rev FROM '{SF}/lineitem.parquet' GROUP BY l_suppkey),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              SUM(CAST(rev AS HUGEINT)) AS s,
              SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS s2 FROM r)
            SELECT n, CAST(s AS BIGINT) AS s,
              CAST(s2 * 1000000 // (s * s) AS BIGINT) AS hhi FROM a
            """
        ).df().iloc[0]
        assert got["n_suppliers"] == exp["n"]
        assert got["total_cents"] == exp["s"]
        assert got["hhi_ppm"] == exp["hhi"]
        # HHI bounds: 1e6/n (perfectly even) <= hhi <= 1e6 (monopoly)
        assert 1_000_000 // got["n_suppliers"] <= got["hhi_ppm"] <= 1_000_000

    def test_monopoly_bound(self):
        # pure-python fold identity on a monopoly-like distribution
        revs = [100, 0, 0]
        total = sum(revs)
        s2 = sum(v * v for v in revs)
        assert s2 * 1_000_000 // (total * total) == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestRevenueShareByNation:
    def test_vs_duckdb_and_shares_sum(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.revenue_share_by_nation(SF))
            .sort_values(["r_name", "n_name"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH j AS (SELECT r.r_name, n.n_name,
              CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM '{SF}/orders.parquet' o
              JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
              JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
              JOIN '{SF}/region.parquet' r ON n.n_regionkey = r.r_regionkey),
            g AS (SELECT r_name, n_name, SUM(cents) AS rev FROM j GROUP BY 1, 2)
            SELECT r_name, n_name, CAST(rev AS BIGINT) AS revenue_cents,
              CAST(rev * 1000000 // SUM(rev) OVER (PARTITION BY r_name) AS BIGINT)
              AS share_ppm FROM g ORDER BY r_name, n_name
            """
        ).df()
        assert got.equals(exp)
        # per region, shares sum to 1e6 minus at most (nations-1) floor loss
        for r, g in got.groupby("r_name"):
            s = int(g["share_ppm"].sum())
            assert 1_000_000 - (len(g) - 1) <= s <= 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestContinuationPartitionInvariance:
    """The new bucketed operators must be exchange-layout-invariant: a
    different bucket count is a different physical plan for the same
    logical result (the house partition-invariance regression)."""

    def test_session_paths_partitions(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        events = rd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
        )
        a = (
            _pdf(relational.session_paths(events, partitions=3))
            .sort_values(["e1", "e2", "e3"])
            .reset_index(drop=True)
        )
        b = (
            _pdf(relational.session_paths(events, partitions=17))
            .sort_values(["e1", "e2", "e3"])
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_trimmed_mean_buckets(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        ds = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
        )
        a = (
            _pdf(relational.trimmed_mean_by_group(ds, "o_orderpriority", "o_totalprice", buckets=7))
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        b = (
            _pdf(relational.trimmed_mean_by_group(ds, "o_orderpriority", "o_totalprice", buckets=129))
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_dup_shingle_rate_buckets(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        a = (
            _pdf(analytics.dup_shingle_rate(ds, buckets=5))
            .sort_values("source")
            .reset_index(drop=True)
        )
        b = (
            _pdf(analytics.dup_shingle_rate(ds, buckets=64))
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestKAnonymity:
    def test_hand_built_with_nulls(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "a": pa.array(["x", "x", "x", "y", None, None], pa.string()),
                "b": pa.array(["1", "1", "1", "2", "3", "3"], pa.string()),
            }
        )
        got = analytics.k_anonymity_audit(rd.from_arrow(tbl), ["a", "b"], k=3).iloc[0]
        # groups: (x,1)=3, (y,2)=1, (NULL,3)=2 -> two groups under k=3,
        # 3 rows at risk; NULLs group together (chr(0) serialization)
        assert (
            got["n_rows"],
            got["n_groups"],
            got["n_small_groups"],
            got["n_rows_at_risk"],
            got["risk_ppm"],
        ) == (6, 3, 2, 3, 500_000)

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source"])
        got = analytics.k_anonymity_audit(ds, ["lang", "source"], k=10).iloc[0]
        exp = duckdb.sql(
            f"""
            WITH g AS (SELECT lang, source, COUNT(*) AS n
              FROM '{SF}/documents.parquet' GROUP BY 1, 2)
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(COUNT(*) FILTER (n < 10) AS BIGINT) AS n_small,
              CAST(COALESCE(SUM(n) FILTER (n < 10), 0) AS BIGINT) AS at_risk
            FROM g
            """
        ).df().iloc[0]
        assert got["n_rows"] == exp["n_rows"]
        assert got["n_groups"] == exp["n_groups"]
        assert got["n_small_groups"] == exp["n_small"]
        assert got["n_rows_at_risk"] == exp["at_risk"]


@pytest.mark.usefixtures("ray_session")
class TestTopPricesWithTies:
    def test_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.top_prices_with_ties(SF, k=3))
            .sort_values(["c_mktsegment", "o_orderkey"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            SELECT c.c_mktsegment, o.o_orderkey,
              CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
              CAST(dense_rank() OVER (PARTITION BY c.c_mktsegment
              ORDER BY CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC)
              AS BIGINT) AS price_rank
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
            QUALIFY price_rank <= 3 ORDER BY c_mktsegment, o_orderkey
            """
        ).df()
        assert got.equals(exp)

    def test_tie_kept(self):
        # at k=1 with a planted tie, BOTH orders must surface (the exact
        # semantics row_number-based topk cannot express)
        import ray
        import tempfile, os
        import pyarrow.parquet as pq_mod

        from distributed_system___ocr_ray.pipelines import relational

        with tempfile.TemporaryDirectory() as d:
            pq_mod.write_table(
                pa.table(
                    {
                        "c_custkey": pa.array([1, 2], pa.int64()),
                        "c_mktsegment": pa.array(["S", "S"], pa.string()),
                    }
                ),
                os.path.join(d, "customer.parquet"),
            )
            pq_mod.write_table(
                pa.table(
                    {
                        "o_custkey": pa.array([1, 2, 1], pa.int64()),
                        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                        "o_totalprice": pa.array([9.99, 9.99, 1.0]),
                    }
                ),
                os.path.join(d, "orders.parquet"),
            )
            got = _pdf(relational.top_prices_with_ties(d, k=1))
            assert sorted(got["o_orderkey"]) == [10, 11]
            assert set(got["price_rank"]) == {1}


@pytest.mark.usefixtures("ray_session")
class TestFirstLastAndSplitSkew:
    def test_first_last_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.first_last_order(SF))
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH o AS (SELECT o_custkey, o_orderkey,
              CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM '{SF}/orders.parquet'),
            f AS (SELECT o_custkey, cents FROM o QUALIFY row_number() OVER
              (PARTITION BY o_custkey ORDER BY day, o_orderkey) = 1),
            l AS (SELECT o_custkey, cents FROM o QUALIFY row_number() OVER
              (PARTITION BY o_custkey ORDER BY day DESC, o_orderkey DESC) = 1)
            SELECT f.o_custkey AS c_custkey, f.cents AS first_cents,
              l.cents AS last_cents, l.cents - f.cents AS delta_cents
            FROM f JOIN l ON f.o_custkey = l.o_custkey ORDER BY c_custkey
            """
        ).df()
        assert got.equals(exp)

    def test_split_skew_identical_distributions_zero(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # all rows share one n_chars value -> both splits see one bucket
        # with all their mass -> TVD must be exactly 0
        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(200)), pa.int64()),
                "n_chars": pa.array([100] * 200, pa.int64()),
            }
        )
        got = analytics.split_skew_audit(rd.from_arrow(tbl)).iloc[0]
        assert got["tvd_ppm"] == 0
        assert got["n_train"] + got["n_test"] <= 200

    def test_split_skew_bounds_on_sf(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
        got = analytics.split_skew_audit(ds).iloc[0]
        assert 0 <= got["tvd_ppm"] <= 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestSessionDurations:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        def t(m):
            return np.datetime64(f"2024-01-01T00:{m:02d}:00", "us")

        # user 1: session [0..10] (600 s) then gap -> singleton (0 s);
        # user 2: singleton (0 s). durations sorted: 0, 0, 600
        tbl = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "ts": pa.array([t(0), t(5), t(10), t(50), t(3)], pa.timestamp("us")),
            }
        )
        got = _pdf(relational.session_duration_quantiles(rd.from_arrow(tbl), partitions=4)).iloc[0]
        assert (got["n_sessions"], got["p50_sec"], got["p90_sec"]) == (3, 0, 600)

    def test_vs_duckdb(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        events = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        got = _pdf(relational.session_duration_quantiles(events)).iloc[0]
        exp = duckdb.sql(
            f"""
            WITH d AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
              FROM '{SF}/events.parquet'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sid FROM d),
            per AS (SELECT user_id, sid,
              (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur
              FROM s GROUP BY 1, 2),
            c AS (SELECT dur, COUNT(*) AS n FROM per GROUP BY 1),
            w2 AS (SELECT dur, SUM(n) OVER (ORDER BY dur) AS cum,
              SUM(n) OVER () AS tot FROM c)
            SELECT CAST(MAX(tot) AS BIGINT) AS n_sessions,
              CAST(MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN dur END) AS BIGINT) AS p50,
              CAST(MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN dur END) AS BIGINT) AS p90
            FROM w2
            """
        ).df().iloc[0]
        assert got["n_sessions"] == exp["n_sessions"]
        assert got["p50_sec"] == exp["p50"]
        assert got["p90_sec"] == exp["p90"]


@pytest.mark.usefixtures("ray_session")
class TestQ11Q22Shapes:
    def test_important_parts_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.revenue_concentrated_parts(SF, share_ppm=700))
            .sort_values("l_partkey")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH r AS (SELECT l_partkey,
              SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS rev
              FROM '{SF}/lineitem.parquet' GROUP BY 1),
            tot AS (SELECT SUM(rev) AS t FROM r)
            SELECT l_partkey, CAST(rev AS BIGINT) AS revenue_cents,
              CAST(CAST(rev AS HUGEINT)*1000000 // t AS BIGINT) AS share_ppm
            FROM r, tot WHERE CAST(rev AS HUGEINT)*1000000 > 700*t ORDER BY 1
            """
        ).df()
        assert len(got) > 0
        assert got.astype(str).equals(exp.astype(str))

    def test_important_parts_threshold_math(self):
        # the pre-divided threshold must be EXACTLY equivalent to the
        # cross-multiplied compare at the boundary: rev*1e6 > ppm*total
        # <=> rev > (ppm*total)//1e6, checked over adversarial remainders
        for total in (999_999, 1_000_000, 1_000_001, 123_456_789):
            for ppm in (1, 700, 999_999):
                thr = (ppm * total) // 1_000_000
                for rev in (thr - 1, thr, thr + 1):
                    assert (rev * 1_000_000 > ppm * total) == (rev > thr)

    def test_inactive_high_balance_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.inactive_high_balance(SF, cutoff="2000-01-01"))
            .sort_values("n_name")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH pos AS (SELECT SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) AS s,
              COUNT(*) AS n FROM '{SF}/customer.parquet'
              WHERE CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT) > 0)
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
              CAST(SUM(CAST(FLOOR(c_acctbal*100+0.5) AS BIGINT)) AS BIGINT) AS total_bal_cents
            FROM '{SF}/customer.parquet' JOIN '{SF}/nation.parquet' ON n_nationkey = c_nationkey, pos
            WHERE CAST(FLOOR(c_acctbal*100+0.5) AS HUGEINT) * n > s
              AND NOT EXISTS (SELECT 1 FROM '{SF}/orders.parquet' o
                              WHERE o.o_custkey = c_custkey
                              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert got.astype(str).equals(exp.astype(str))


@pytest.mark.usefixtures("ray_session")
class TestOverlapPairs:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # key 1: [0,10),[5,8),[10,20): only ([0,10),[5,8)) overlap (touching
        # at 10 does NOT); key 2: all three of [0,5),[1,6),[2,7) overlap;
        # key 3: a zero-length [0,0) drops, leaving one interval -> no row
        tbl = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
                "s": pa.array([0, 5, 10, 0, 1, 2, 0, 0], pa.int64()),
                "e": pa.array([10, 8, 20, 5, 6, 7, 0, 9], pa.int64()),
            }
        )
        got = (
            _pdf(relational.overlap_pairs(rd.from_arrow(tbl), "k", "s", "e", buckets=4))
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"k": 1, "n_overlap_pairs": 1},
            {"k": 2, "n_overlap_pairs": 3},
        ]

    def test_vs_duckdb_and_bucket_invariance(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.overlap_pairs(em._activity_intervals(SF), "user_id", "s_us", "e_us"))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH iv0 AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) +
              (CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % 60000) * 10000 AS e
              FROM '{SF}/events.parquet'),
            iv AS (SELECT user_id, s, e, ROW_NUMBER() OVER () AS rid FROM iv0 WHERE e > s)
            SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
            FROM iv a JOIN iv b ON a.user_id = b.user_id AND a.rid < b.rid
              AND a.s < b.e AND b.s < a.e
            GROUP BY 1 ORDER BY 1
            """
        ).df()
        assert got.astype(str).equals(exp.astype(str))
        few = (
            _pdf(relational.overlap_pairs(em._activity_intervals(SF), "user_id", "s_us", "e_us", buckets=3))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got.equals(few)


@pytest.mark.usefixtures("ray_session")
class TestVocabGrowth:
    def test_vs_duckdb(self):
        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            _pdf(analytics.vocab_growth(SF))
            .sort_values("frac_ppm")
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM '{SF}/documents.parquet'),
            cp AS (SELECT unnest([250000,500000,750000,1000000]) AS ppm),
            th AS (SELECT ppm, (ppm * n) // 1000000 AS d FROM cp, mx),
            tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tk
              FROM '{SF}/documents.parquet'),
            firsts AS (SELECT tk, MIN(doc_id) AS fid FROM tok GROUP BY 1)
            SELECT th.ppm AS frac_ppm,
              CAST((SELECT COUNT(*) FROM '{SF}/documents.parquet' dd WHERE dd.doc_id < th.d) AS BIGINT) AS n_docs,
              CAST((SELECT COUNT(*) FROM firsts f WHERE f.fid < th.d) AS BIGINT) AS vocab_size
            FROM th ORDER BY 1
            """
        ).df()
        assert got.astype(str).equals(exp.astype(str))

    def test_monotone_and_bucket_invariance(self):
        from distributed_system___ocr_ray.pipelines import analytics

        got = (
            _pdf(analytics.vocab_growth(SF, buckets=3))
            .sort_values("frac_ppm")
            .reset_index(drop=True)
        )
        # curve must be nondecreasing in both docs and vocab
        assert got["n_docs"].is_monotonic_increasing
        assert got["vocab_size"].is_monotonic_increasing
        wide = (
            _pdf(analytics.vocab_growth(SF, buckets=64))
            .sort_values("frac_ppm")
            .reset_index(drop=True)
        )
        assert got.equals(wide)


@pytest.mark.usefixtures("ray_session")
class TestCommonNeighborPairs:
    def test_vs_python_bruteforce(self):
        import itertools

        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        n = 120
        docs = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
        got = _pdf(analytics.common_neighbor_pairs(docs, k=15)).reset_index(drop=True)

        und = set()
        for u in range(n):
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % n
                if t != u:
                    und.add((min(u, t), max(u, t)))
        nbrs = {}
        for a, b in und:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        scores = []
        for a, b in itertools.combinations(sorted(nbrs), 2):
            if (a, b) in und:
                continue
            c = len(nbrs[a] & nbrs[b])
            if c:
                scores.append((a, b, c))
        scores.sort(key=lambda r: (-r[2], r[0], r[1]))
        exp = pd.DataFrame(scores[:15], columns=["doc_a", "doc_b", "n_common"])
        assert got.astype(int).values.tolist() == exp.astype(int).values.tolist()

    def test_vs_duckdb(self):
        import __ray_entry__ as em

        got = em.queries()["link_prediction_topk"](SF)
        got = _pdf(got).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["link_prediction_topk"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert g.astype(str).equals(e.astype(str))


@pytest.mark.usefixtures("ray_session")
class TestCrossSourceDups:
    def test_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        got = _pdf(analytics.cross_source_dup_matrix(SF, threshold=0.6))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["cross_source_dups"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert g.astype(str).equals(e.astype(str))

    def test_mass_conservation(self):
        # total cross+within pair mass must equal the pair-set size
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        mat = _pdf(analytics.cross_source_dup_matrix(SF, threshold=0.6))
        n_pairs = len(em.queries()["minhash_pairs"](SF))
        assert int(mat["n_pairs"].sum()) == n_pairs


@pytest.mark.usefixtures("ray_session")
class TestEncodingAudit:
    def test_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        got = _pdf(analytics.encoding_audit(SF))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["encoding_audit"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert g.astype(str).equals(e.astype(str))
        # the plants guarantee at least one hit in each class corpus-wide
        assert got["n_mojibake"].sum() > 0
        assert got["n_ctrl"].sum() > 0
        assert got["n_nonascii"].sum() > 0

    def test_mojibake_is_nonascii(self):
        # U+FFFD is itself non-ASCII: every mojibake doc counts in both
        from distributed_system___ocr_ray.pipelines import analytics

        got = _pdf(analytics.encoding_audit(SF))
        assert (got["n_nonascii"] >= got["n_mojibake"]).all()
        assert (got["n_docs"] >= got[["n_mojibake", "n_ctrl", "n_nonascii"]].max(axis=1)).all()


@pytest.mark.usefixtures("ray_session")
class TestQualityLengthCorr:
    def test_vs_duckdb(self):
        import ray.data as rd

        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = _pdf(analytics.quality_length_corr(docs))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["quality_length_corr"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert g.astype(str).equals(e.astype(str))

    def test_known_correlations(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # y == x (after the quality pipeline maps length monotonically in
        # [0, 500]) gives r2 ~ 1e6; constant-length rows give vx == 0 -> 0
        perfect = pa.table(
            {
                "lang": pa.array(["p"] * 50, pa.string()),
                # lengths 1..50: len_score = n/500, no punct, no stopwords
                "text": pa.array(["a" * (i + 1) for i in range(50)], pa.string()),
            }
        )
        got = _pdf(analytics.quality_length_corr(rd.from_arrow(perfect))).iloc[0]
        assert got["r2_signed_ppm"] > 990_000
        const = pa.table(
            {
                "lang": pa.array(["c"] * 10, pa.string()),
                "text": pa.array(["word"] * 10, pa.string()),
            }
        )
        got2 = _pdf(analytics.quality_length_corr(rd.from_arrow(const))).iloc[0]
        assert got2["r2_signed_ppm"] == 0


@pytest.mark.usefixtures("ray_session")
class TestShuffleMixAudit:
    def test_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        got = analytics.shuffle_mix_audit(SF, epoch=0)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["shuffle_mix_audit"]).df()
        assert got.astype(str).equals(exp.astype(str))

    def test_small_window_invariance(self):
        # adjacency coverage must survive windows smaller than the corpus
        from distributed_system___ocr_ray.pipelines import analytics

        full = analytics.shuffle_mix_audit(SF, epoch=1)
        tiny = analytics.shuffle_mix_audit(SF, epoch=1, window=64)
        assert full.equals(tiny)


@pytest.mark.usefixtures("ray_session")
class TestQ2AndChi2:
    def test_cheapest_supplier_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.cheapest_supplier_per_part(SF, p_size=10))
        con = duckdb.connect()
        for t in ["lineitem", "part", "supplier"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        exp = con.execute(em.oracle_sql()["cheapest_supplier"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert len(g) > 0
        assert g.astype(str).equals(e.astype(str))

    def test_chi2_vs_duckdb_and_independence_zero(self):
        import ray.data as rd  # noqa: F401

        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        got = _pdf(analytics.categorical_independence_chi2(SF))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["lang_source_chi2"]).df()
        assert got.astype(str).equals(exp.astype(str))
        assert int(got["chi2_ppm"].iloc[0]) >= 0

    def test_chi2_perfectly_dependent(self, tmp_path):
        # b == a gives the maximal statistic ~ n*(k-1)*1e6; b constant -> 0
        import pyarrow.parquet as pqt

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table(
            {
                "lang": pa.array(["x", "y"] * 50, pa.string()),
                "source": pa.array(["x", "y"] * 50, pa.string()),
            }
        )
        d = tmp_path / "dep"
        d.mkdir()
        pqt.write_table(t, str(d / "documents.parquet"))
        got = _pdf(analytics.categorical_independence_chi2(str(d))).iloc[0]
        # chi2 for perfect 2x2 dependence = n * 1e6 (per-cell floors exact here)
        assert got["chi2_ppm"] == 100 * 1_000_000
        t2 = pa.table(
            {
                "lang": pa.array(["x", "y"] * 50, pa.string()),
                "source": pa.array(["s"] * 100, pa.string()),
            }
        )
        d2 = tmp_path / "const"
        d2.mkdir()
        pqt.write_table(t2, str(d2 / "documents.parquet"))
        got2 = _pdf(analytics.categorical_independence_chi2(str(d2))).iloc[0]
        assert got2["chi2_ppm"] == 0 and got2["dof"] == 0


@pytest.mark.usefixtures("ray_session")
class TestNormalizedDedup:
    def test_vs_duckdb(self):
        import ray.data as rd

        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = _pdf(analytics.normalized_dedup_stats(docs))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["normalized_dedup"]).df()
        assert got.astype(str).equals(exp.astype(str))

    def test_planted_variants_collapse(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t = pa.table(
            {
                "text": pa.array(
                    [
                        "Hello, World!",
                        "hello world",
                        "hello   world.",
                        "HELLO\tWORLD",
                        "something else entirely",
                    ],
                    pa.string(),
                )
            }
        )
        got = _pdf(analytics.normalized_dedup_stats(rd.from_arrow(t))).iloc[0]
        assert (
            got["n_docs"],
            got["n_distinct"],
            got["n_dup_docs"],
            got["n_dup_groups"],
        ) == (5, 2, 4, 1)


@pytest.mark.usefixtures("ray_session")
class TestOutOfOrderAudit:
    def test_vs_duckdb(self):
        import ray.data as rd

        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import relational

        ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"])
        got = relational.out_of_order_audit(ev)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        exp = con.execute(em.oracle_sql()["out_of_order_audit"]).df()
        assert got.astype(str).equals(exp.astype(str))

    def test_planted_inversions(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        def t(sec):
            return np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(sec, "s")

        # user 1 arrival order (by event_id): times 0, 50, 30, 40 ->
        # one inversion (50 -> 30, 20 s late); user 2 in order
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array([t(0), t(50), t(30), t(40), t(5), t(9)], pa.timestamp("us")),
            }
        )
        got = relational.out_of_order_audit(rd.from_arrow(tbl), partitions=4).iloc[0]
        assert (got["n_pairs"], got["n_inversions"], got["max_late_us"]) == (4, 1, 20_000_000)


@pytest.mark.usefixtures("ray_session")
class TestDominantSuppliers:
    def test_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import relational

        got = _pdf(relational.dominant_suppliers(SF, threshold_pct=15))
        con = duckdb.connect()
        for t in ["lineitem", "supplier"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        exp = con.execute(em.oracle_sql()["dominant_suppliers"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert len(g) > 0
        assert g.astype(str).equals(e.astype(str))

    def test_threshold_monotone(self):
        from distributed_system___ocr_ray.pipelines import relational

        lo = _pdf(relational.dominant_suppliers(SF, threshold_pct=10))
        hi = _pdf(relational.dominant_suppliers(SF, threshold_pct=30))
        assert lo["n_dominated_parts"].sum() >= hi["n_dominated_parts"].sum()


@pytest.mark.usefixtures("ray_session")
class TestSourceVocabOverlap:
    def test_vs_duckdb(self):
        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import analytics

        got = analytics.source_vocab_overlap(SF)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
        exp = con.execute(em.oracle_sql()["source_vocab_overlap"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert len(g) > 0
        assert g.astype(str).equals(e.astype(str))

    def test_jaccard_bounds_and_symmetric_input(self):
        from distributed_system___ocr_ray.pipelines import analytics

        got = analytics.source_vocab_overlap(SF)
        assert ((got["jaccard_ppm"] >= 0) & (got["jaccard_ppm"] <= 1_000_000)).all()
        assert (got["source_a"] < got["source_b"]).all()


@pytest.mark.usefixtures("ray_session")
class TestTrailingRowsSum:
    def test_vs_duckdb(self):
        import ray.data as rd

        import __ray_entry__ as em
        from distributed_system___ocr_ray.pipelines import relational

        ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
        got = _pdf(relational.trailing_rows_sum(ev, k=5))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
        exp = con.execute(em.oracle_sql()["trailing_rows_sum"]).df()
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert g.astype(str).equals(e.astype(str))

    def test_hand_built_frame_edges(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        def t(sec):
            return np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(sec, "s")

        # user 1 values 1,2,3,4 with k=2: frames 1, 1+2, 2+3, 3+4;
        # user 2 single row: its own value (frame clipped at segment start)
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "ts": pa.array([t(0), t(1), t(2), t(3), t(0)], pa.timestamp("us")),
                "value": pa.array([0.01, 0.02, 0.03, 0.04, 0.99], pa.float64()),
            }
        )
        got = (
            _pdf(relational.trailing_rows_sum(rd.from_arrow(tbl), k=2, partitions=4))
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert got["trail_cents"].tolist() == [1, 3, 5, 7, 99]


@pytest.mark.usefixtures("ray_session")
class TestTpchLateFamilyEdges:
    """Hand-built boundary pins for the Q4/Q13/Q21 shapes (the driver
    contract blanket-checks them vs DuckDB at sf0.001; these pin the exact
    edge semantics the oracles could mask if both sides drifted together)."""

    def _write(self, tmp_path, **tables):
        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        for name, df in tables.items():
            _pq.write_table(_pa.Table.from_pandas(_pd.DataFrame(df)), f"{tmp_path}/{name}.parquet")
        return str(tmp_path)

    def test_order_priority_check_strict_boundary(self, tmp_path):
        import pandas as pd

        from distributed_system___ocr_ray.pipelines import relational

        d = pd.Timestamp("1996-02-01")
        sf = self._write(
            tmp_path,
            orders={
                "o_orderkey": [1, 2, 3, 4],
                "o_orderdate": [d, d, d, pd.Timestamp("1995-01-01")],
                "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "1-URGENT"],
            },
            lineitem={
                # order 1: ship EXACTLY od+30d -- NOT late (strict >)
                # order 2: od+30d+1s -- late
                # order 3: no lineitems at all -- drops (inner semantics)
                # order 4: out of window, wildly late -- excluded
                "l_orderkey": [1, 2, 4],
                "l_shipdate": [
                    d + pd.Timedelta(days=30),
                    d + pd.Timedelta(days=30, seconds=1),
                    pd.Timestamp("1996-06-01"),
                ],
            },
        )
        got = _pdf(relational.order_priority_check(sf, late_days=30))
        assert got.to_dict("records") == [
            {"o_orderpriority": "1-URGENT", "order_count": 1}
        ]

    def test_customer_order_distribution_zero_bin(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import relational

        # c1: two qualifying orders; c2: one; c3: only an EXCLUDED-priority
        # order (-> zero bin); c4: no orders at all (-> zero bin)
        sf = self._write(
            tmp_path,
            customer={"c_custkey": [1, 2, 3, 4]},
            orders={
                "o_custkey": [1, 1, 2, 3],
                "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
            },
        )
        got = (
            _pdf(relational.customer_order_distribution(sf))
            .sort_values("c_count").reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"c_count": 0, "custdist": 2},
            {"c_count": 1, "custdist": 1},
            {"c_count": 2, "custdist": 1},
        ]

    def test_customer_order_distribution_no_zero_row_when_all_active(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import relational

        sf = self._write(
            tmp_path,
            customer={"c_custkey": [1, 2]},
            orders={
                "o_custkey": [1, 2, 2],
                "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
            },
        )
        got = _pdf(relational.customer_order_distribution(sf))
        # the SQL LEFT JOIN emits no 0 bin when every customer qualifies
        assert 0 not in set(got["c_count"])
        assert got["custdist"].sum() == 2

    def test_waiting_suppliers_exactly_one_late(self, tmp_path):
        import pandas as pd

        from distributed_system___ocr_ray.pipelines import relational

        d = pd.Timestamp("1995-01-01")
        late = d + pd.Timedelta(days=61)
        ok = d + pd.Timedelta(days=10)
        sf = self._write(
            tmp_path,
            orders={
                "o_orderkey": [10, 20, 30, 40],
                "o_orderstatus": ["F", "F", "F", "O"],
                "o_orderdate": [d, d, d, d],
            },
            lineitem={
                # order 10: s1 late, s2 on time -> s1 counted
                # order 20: BOTH late -> nobody (n_late == 2)
                # order 30: single-supplier late -> nobody (n_supp < 2)
                # order 40: open status, s1 late -> excluded map-side
                "l_orderkey": [10, 10, 20, 20, 30, 40],
                "l_suppkey": [1, 2, 1, 2, 1, 1],
                "l_shipdate": [late, ok, late, late, late, late],
            },
            supplier={"s_suppkey": [1, 2], "s_name": ["S1", "S2"]},
        )
        got = _pdf(relational.waiting_suppliers(sf, late_days=60))
        assert got.to_dict("records") == [
            {"s_suppkey": 1, "s_name": "S1", "numwait": 1}
        ]

    def test_waiting_suppliers_max_shipdate_rule(self, tmp_path):
        import pandas as pd

        from distributed_system___ocr_ray.pipelines import relational

        # s1 ships twice for one order: early AND late -- the adapted rule
        # says the supplier's LAST shipment decides, so s1 is late
        d = pd.Timestamp("1995-01-01")
        sf = self._write(
            tmp_path,
            orders={"o_orderkey": [10], "o_orderstatus": ["F"],
                    "o_orderdate": [d]},
            lineitem={
                "l_orderkey": [10, 10, 10],
                "l_suppkey": [1, 1, 2],
                "l_shipdate": [d + pd.Timedelta(days=5),
                               d + pd.Timedelta(days=90),
                               d + pd.Timedelta(days=6)],
            },
            supplier={"s_suppkey": [1, 2], "s_name": ["S1", "S2"]},
        )
        got = _pdf(relational.waiting_suppliers(sf, late_days=60))
        assert got.to_dict("records") == [
            {"s_suppkey": 1, "s_name": "S1", "numwait": 1}
        ]


@pytest.mark.usefixtures("ray_session")
class TestCorpusQualityStats:
    def _docs(self, rows):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows], pa.string()),
                    "text": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    def test_token_simpson_hand_built(self):
        from distributed_system___ocr_ray.pipelines import analytics

        ds = self._docs([(1, "en", "a a b"), (2, "de", "x x x")])
        got = (
            analytics.token_simpson_by_lang(ds)
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        # en: counts {a:2, b:1}, N=3, ssq=5 -> 1e6 - 5e6//9 = 444445
        # de: single type -> fully degenerate -> 0 ppm
        assert got.to_dict("records") == [
            {"lang": "de", "n_tokens": 3, "n_distinct": 1, "simpson_ppm": 0},
            {"lang": "en", "n_tokens": 3, "n_distinct": 2,
             "simpson_ppm": 1_000_000 - 5_000_000 // 9},
        ]

    def test_surprisal_bit_identity_property(self):
        # floor(log2(N/c)) == bit_length(N // c) - 1 for all 1 <= c <= N
        import math

        rng = np.random.default_rng(7)
        for _ in range(2000):
            n = int(rng.integers(1, 1 << 50))
            c = int(rng.integers(1, n + 1))
            assert (n // c).bit_length() - 1 == math.floor(math.log2(n / c))

    def test_doc_surprisal_hand_built(self):
        from distributed_system___ocr_ray.pipelines import analytics

        # counts: a=5, b=1, N=6; bits(a)=bit_length(6//5)-1=0,
        # bits(b)=bit_length(6)-1=2
        ds = self._docs([(1, "en", "a a a a"), (2, "en", "a b"), (3, "en", "!!!")])
        got = analytics.doc_surprisal_topk(ds, k=10).to_pandas()
        assert got.to_dict("records") == [
            {"doc_id": 2, "lang": "en", "n_tokens": 2, "total_bits": 2,
             "mean_millibits": 1000},
            {"doc_id": 1, "lang": "en", "n_tokens": 4, "total_bits": 0,
             "mean_millibits": 0},
        ]

    def test_doc_surprisal_empty_corpus(self):
        from distributed_system___ocr_ray.pipelines import analytics

        ds = self._docs([(1, "en", "!!!"), (2, "en", "??")])
        got = analytics.doc_surprisal_topk(ds, k=5)
        assert got.count() == 0
        # to_pandas() on a zero-row Dataset drops columns (the known Ray
        # empty-block quirk _pin_schema_if_empty exists for); the TYPED
        # schema survives at the Dataset level and is what we assert
        assert got.schema().names == [
            "doc_id", "lang", "n_tokens", "total_bits", "mean_millibits"
        ]

    def test_sentence_stats_hand_built(self):
        from distributed_system___ocr_ray.pipelines import analytics

        ds = self._docs(
            [(1, "en", "Hi there! How are you? Yes."), (2, "de", "no punct here")]
        )
        got = (
            analytics.sentence_stats_by_lang(ds)
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"lang": "de", "n_docs": 1, "n_sentences": 0, "n_words": 3,
             "mean_words_per_sentence_milli": 0},
            {"lang": "en", "n_docs": 1, "n_sentences": 3, "n_words": 6,
             "mean_words_per_sentence_milli": 2000},
        ]


@pytest.mark.usefixtures("ray_session")
class TestReshapeAndForensics:
    def test_melt_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        wide = rd.from_arrow(pa.table({
            "day": pa.array([1, 2], pa.int64()),
            "n_click": pa.array([3, 0], pa.int64()),
            "n_view": pa.array([5, 7], pa.int64()),
        }))
        got = (
            analytics.melt(wide, ["day"], ["n_click", "n_view"],
                           var_name="event_type", value_name="n",
                           strip_prefix="n_")
            .to_pandas()
            .sort_values(["day", "event_type"])
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"day": 1, "event_type": "click", "n": 3},
            {"day": 1, "event_type": "view", "n": 5},
            {"day": 2, "event_type": "click", "n": 0},
            {"day": 2, "event_type": "view", "n": 7},
        ]

    def test_benford_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # cents: 123, 4567, 89, 12, 999999 -> digits 1,4,8,1,9
        prices = [1.23, 45.67, 0.89, 0.12, 9999.99]
        ds = rd.from_arrow(pa.table({"o_totalprice": pa.array(prices, pa.float64())}))
        got = (
            analytics.benford_first_digit(ds)
            .to_pandas()
            .sort_values("digit")
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"digit": 1, "n": 2, "share_ppm": 400_000},
            {"digit": 4, "n": 1, "share_ppm": 200_000},
            {"digit": 8, "n": 1, "share_ppm": 200_000},
            {"digit": 9, "n": 1, "share_ppm": 200_000},
        ]


@pytest.mark.usefixtures("ray_session")
class TestLexicalCurveAudits:
    def test_zipf_bits_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # token counts: "a" x8, "b" x4, "c" x2, "d" x1 -> ranks 1,2,4
        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
        ds = rd.from_arrow(pa.table({"text": pa.array([text], pa.string())}))
        got = (
            analytics.zipf_bits_audit(ds, max_rank=4096)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        # rank 1 -> a(8, bits 3); rank 2 -> b(4, bits 2); rank 4 -> d(1, bits 0)
        assert got.to_dict("records") == [
            {"rank": 1, "freq": 8, "freq_bits": 3, "drop_bits": 0},
            {"rank": 2, "freq": 4, "freq_bits": 2, "drop_bits": 1},
            {"rank": 4, "freq": 1, "freq_bits": 0, "drop_bits": 2},
        ]

    def test_zipf_ties_break_token_asc(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # all counts equal: rank order must be token-ascending
        ds = rd.from_arrow(pa.table({"text": pa.array(["z y x w"], pa.string())}))
        got = (
            analytics.zipf_bits_audit(ds)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert got["rank"].tolist() == [1, 2, 4]
        assert got["freq"].tolist() == [1, 1, 1]

    def test_hapax_rate_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "source": pa.array(["s1", "s1", "s2"], pa.string()),
            # s1 vocab: {aa(2), bb(1), cc(1)} -> hapax 2/3; s2: {aa(1)} -> 1/1
            "text": pa.array(["aa bb", "aa cc", "aa"], pa.string()),
        }))
        got = (
            analytics.hapax_rate_by_source(ds)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"source": "s1", "vocab": 3, "hapax": 2, "hapax_ppm": 666_666},
            {"source": "s2", "vocab": 1, "hapax": 1, "hapax_ppm": 1_000_000},
        ]

    def test_source_tv_distance_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "source": pa.array(["s1", "s2"], pa.string()),
            # s1: a=666666ppm b=333333ppm; s2: a=500000 c=500000
            # L1 = 166666 + 333333 + 500000 = 999999 -> tv = 499999
            "text": pa.array(["a a b", "a c"], pa.string()),
        }))
        got = analytics.source_tv_distance(ds).to_pandas()
        assert got.to_dict("records") == [
            {"source_a": "s1", "source_b": "s2", "tv_ppm": 499_999}
        ]

    def test_source_tv_identical_sources_zero(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "source": pa.array(["s1", "s2"], pa.string()),
            "text": pa.array(["x y x", "x y x"], pa.string()),
        }))
        got = analytics.source_tv_distance(ds).to_pandas()
        assert got.to_dict("records") == [
            {"source_a": "s1", "source_b": "s2", "tv_ppm": 0}
        ]

    def test_token_burstiness_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            # "a": cf 4, df 2 -> 2000 milli; "b": cf 2, df 2 -> 1000;
            # "c": cf 1, df 1 -> 1000
            "text": pa.array(["a a a b", "a b c"], pa.string()),
        }))
        got = (
            analytics.token_burstiness(ds, k=3)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"token": "a", "cf": 4, "df": 2, "per_doc_milli": 2000},
            {"token": "b", "cf": 2, "df": 2, "per_doc_milli": 1000},
            {"token": "c", "cf": 1, "df": 1, "per_doc_milli": 1000},
        ]

    def test_graph_reciprocity_bounds(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(50), pa.int64())}))
        got = analytics.graph_reciprocity(ds).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert 0 <= row["reciprocal_edges"] <= row["directed_edges"]
        assert row["reciprocity_ppm"] == (
            int(row["reciprocal_edges"]) * 1_000_000 // int(row["directed_edges"])
        )

    def test_graph_reciprocity_matches_brute_force(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        n = 40
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
        edges = set(
            map(tuple, analytics.derived_link_edges(ds, n)
                .to_pandas()[["src", "dst"]].values)
        )
        recip = sum(1 for (s, d) in edges if (d, s) in edges)
        got = analytics.graph_reciprocity(ds).to_pandas().iloc[0]
        assert int(got["directed_edges"]) == len(edges)
        assert int(got["reciprocal_edges"]) == recip


class TestDupSpans:
    def test_hand_built_interval_union(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # doc1/doc2 share overlapping shingles (union, not sum); doc3's
        # "m m m" repeats WITHIN one doc only (distinct-doc rule keeps it
        # out) while "x y z" at pos 1 and 8 gives two disjoint spans;
        # doc5/doc6 share the <3-word whole-text shingle; doc7 is clean
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e f g h",
                        "a b c d",
                        "x y z m m m m x y z",
                        "x y z",
                        "q w",
                        "q w",
                        "lonely words here now",
                    ],
                    pa.string(),
                ),
            }
        )
        got = (
            _pdf(analytics.dup_spans(rd.from_arrow(tbl), buckets=4))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [1, 2, 3, 4, 5, 6, 7]
        assert list(got["nw"]) == [8, 4, 10, 3, 2, 2, 4]
        # doc1: [1,3]u[2,4] = 4; doc3: [1,3]u[8,10] = 6
        assert list(got["covered"]) == [4, 4, 6, 3, 2, 2, 0]
        assert list(got["dup_span_ppm"]) == [
            500_000,
            1_000_000,
            600_000,
            1_000_000,
            1_000_000,
            1_000_000,
            0,
        ]

    def test_whitespace_only_doc_excluded(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["  \t ", "a b", "a b"], pa.string()),
            }
        )
        got = (
            _pdf(analytics.dup_spans(rd.from_arrow(tbl), buckets=2))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [2, 3]
        assert list(got["dup_span_ppm"]) == [1_000_000, 1_000_000]

    def test_bucket_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        a = (
            _pdf(analytics.dup_spans(ds, buckets=3))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            _pdf(analytics.dup_spans(ds, buckets=17))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)
        # spans cover at least every doc with a shared shingle: covered
        # bounded by nw, and boilerplate-positive docs are span-positive
        assert (a["covered"] <= a["nw"]).all()


class TestKsPriorityDrift:
    def test_hand_built_exact_ks(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # A = {1,2,3,4}, B = {3,4,5,6} dollars: ECDFs diverge most at 2.00
        # (F_A=1/2, F_B=0) -> KS = 1/2; A vs C = {1,2,3,4} identical -> 0
        tbl = pa.table(
            {
                "o_orderpriority": pa.array(
                    ["A"] * 4 + ["B"] * 4 + ["C"] * 4, pa.string()
                ),
                "o_totalprice": pa.array(
                    [1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0, 1.0, 2.0, 3.0, 4.0],
                    pa.float64(),
                ),
            }
        )
        got = (
            _pdf(analytics.ks_priority_drift(rd.from_arrow(tbl)))
            .sort_values(["prio_a", "prio_b"])
            .reset_index(drop=True)
        )
        assert list(got["prio_a"]) == ["A", "A", "B"]
        assert list(got["prio_b"]) == ["B", "C", "C"]
        assert list(got["n_a"]) == [4, 4, 4]
        assert list(got["n_b"]) == [4, 4, 4]
        assert list(got["ks_ppm"]) == [500_000, 0, 500_000]

    def test_matches_brute_force_on_sf(self):
        import itertools

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
        )
        got = (
            _pdf(analytics.ks_priority_drift(ds))
            .set_index(["prio_a", "prio_b"])["ks_ppm"]
            .to_dict()
        )
        import pandas as pd

        df = pd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
        )
        df["c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        by_g = {g: np.sort(s["c"].to_numpy()) for g, s in df.groupby("o_orderpriority")}
        grid = np.unique(df["c"].to_numpy())
        for ga, gb in itertools.combinations(sorted(by_g), 2):
            a, b = by_g[ga], by_g[gb]
            ca = np.searchsorted(a, grid, side="right").astype(object)
            cb = np.searchsorted(b, grid, side="right").astype(object)
            dev = int(np.abs(ca * len(b) - cb * len(a)).max())
            assert got[(ga, gb)] == dev * 1_000_000 // (len(a) * len(b))


class TestSampledQuantileAudit:
    def test_permille_ranks_vs_numpy_both_paths(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
        import pandas as pd

        vals = np.sort(
            np.floor(
                pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])[
                    "o_totalprice"
                ].to_numpy()
                * 100
                + 0.5
            ).astype(np.int64)
        )
        n = len(vals)
        import pyarrow.compute as pc

        cents = ds.map_batches(
            lambda b: pa.table(
                {"c": pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0), 0.5))}
            ),
            batch_format="pyarrow",
        )
        want = {p: float(vals[max(1, (p * n + 999) // 1000) - 1]) for p in (100, 500, 900)}
        got_pull, n1 = analytics.exact_quantiles_permille(cents, "c", [100, 500, 900])
        # pull_limit=1 forces the histogram-bisection path at any size
        got_bis, n2 = analytics.exact_quantiles_permille(
            cents, "c", [100, 500, 900], bins=64, pull_limit=1
        )
        assert n1 == n2 == n
        assert got_pull == want
        assert got_bis == want

    def test_audit_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # ids chosen so md5(str(id))[:8] < '1fffffff' keeps a KNOWN subset
        import hashlib

        ids = list(range(1, 2001))
        kept = [
            i for i in ids if hashlib.md5(str(i).encode()).hexdigest()[:8] < "1fffffff"
        ]
        tbl = pa.table(
            {
                "o_orderkey": pa.array(ids, pa.int64()),
                # value = id dollars -> cents = id*100; quantiles are exact
                "o_totalprice": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        got = analytics.sampled_quantile_audit(rd.from_arrow(tbl)).set_index(
            "q_permille"
        )
        assert (got["sample_n"] == len(kept)).all()
        n, ks = len(ids), sorted(kept)
        for p in range(100, 1000, 100):
            est = ks[max(1, (p * len(ks) + 999) // 1000) - 1] * 100
            exact = ids[max(1, (p * n + 999) // 1000) - 1] * 100
            assert got.loc[p, "est_cents"] == est
            assert got.loc[p, "exact_cents"] == exact
            cle = sum(1 for i in ids if i * 100 <= est)
            assert got.loc[p, "rank_err_ppm"] == abs(cle * 1_000_000 // n - p * 1000)


class TestCompactionBins:
    def test_hand_built_packing(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # sizes desc: (s2,de)=5, (s1,en)=3, (s1,fr)=2, (s2,en)=2 ->
        # exclusive cumsums 0,5,8,10 -> bins 0,1,2,2 at capacity 4
        rows = (
            [("s1", "en")] * 3 + [("s1", "fr")] * 2 + [("s2", "en")] * 2 + [("s2", "de")] * 5
        )
        tbl = pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        got = (
            analytics.compaction_bins(rd.from_arrow(tbl), capacity=4)
            .sort_values(["source", "lang"])
            .reset_index(drop=True)
        )
        want = {
            ("s1", "en"): (3, 1),
            ("s1", "fr"): (2, 2),
            ("s2", "de"): (5, 0),
            ("s2", "en"): (2, 2),
        }
        for r in got.itertuples():
            assert want[(r.source, r.lang)] == (r.n_rows, r.bin)

    def test_mass_conserved_and_bin_sizes(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["source", "lang"])
        got = analytics.compaction_bins(ds, capacity=100)
        assert got["n_rows"].sum() == 500
        # every bin except possibly the last starts under capacity worth
        # of exclusive prefix -- bin ids are contiguous from 0
        bins = sorted(got["bin"].unique())
        assert bins == list(range(len(bins)))


class TestShingleContainment:
    def test_hand_built_directional(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # A's shingles: {a b c, b c d}; B's: {a b c, b c d, c d e, x y z}
        # (4 distinct) -> A in B = 2/2 = 1e6; B in A = 2/4 = 5e5
        tbl = pa.table(
            {
                "source": pa.array(["A", "A", "B", "B"], pa.string()),
                "text": pa.array(
                    ["a b c d", "a b c", "a b c d e", "x y z"], pa.string()
                ),
            }
        )
        got = (
            analytics.shingle_containment(rd.from_arrow(tbl), buckets=4)
            .set_index(["source_a", "source_b"])
        )
        assert got.loc[("A", "B"), "n_a"] == 2
        assert got.loc[("A", "B"), "n_inter"] == 2
        assert got.loc[("A", "B"), "containment_ppm"] == 1_000_000
        assert got.loc[("B", "A"), "n_a"] == 4
        assert got.loc[("B", "A"), "containment_ppm"] == 500_000

    def test_bucket_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
        import pandas as pd

        a = (
            analytics.shingle_containment(ds, buckets=3)
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        b = (
            analytics.shingle_containment(ds, buckets=17)
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestCusumChangepoints:
    def test_hand_built_level_shift(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # days 1-3 at 100c, day 4 jumps to 400c: tot=700, mu=175, k=8
        # s = [0, 0, 0, max(0, 400-183)=217]; 217 > mu -> flagged
        ts = [datetime.datetime(2024, 1, d, 12, 0) for d in (1, 2, 3, 4)]
        tbl = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array([1.0, 1.0, 1.0, 4.0], pa.float64()),
            }
        )
        got = analytics.cusum_changepoints(rd.from_arrow(tbl)).reset_index(drop=True)
        assert list(got["day"]) == [f"2024-01-0{d}" for d in (1, 2, 3, 4)]
        assert list(got["value_cents"]) == [100, 100, 100, 400]
        assert list(got["cusum_cents"]) == [0, 0, 0, 217]
        assert list(got["flagged"]) == [0, 0, 0, 1]

    def test_accumulates_sustained_shift(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # a sustained +60% shift accumulates: days 5-8 at 160c vs 100c
        # baseline; tot=1040, mu=130, k=6 -> s grows 24, 48, 72, 96
        ts = [datetime.datetime(2024, 2, d, 0, 0) for d in range(1, 9)]
        vals = [1.0] * 4 + [1.6] * 4
        tbl = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
            }
        )
        got = analytics.cusum_changepoints(rd.from_arrow(tbl))
        assert list(got["cusum_cents"]) == [0, 0, 0, 0, 24, 48, 72, 96]
        assert list(got["flagged"]) == [0] * 8


class TestBigramSurprisal:
    def test_hand_built_bits(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # source A = "aab": bigrams aa, ab; marginal n(a)=2; each pair
        # n=1 -> bits = bit_length(2//1)-1 = 1 -> total 2, mean 1000
        # source B = "zz zz": bigrams zz,'z ',' z',zz -> n(z.)=3: zz has
        # n=2 -> bits(3//2)=0; 'z ' n=1 -> bits(3)=1; ' z' n=1, n(' ')=1
        # -> bits(1)=0 -> total_bits=1, n=4, mean=250
        tbl = pa.table(
            {
                "source": pa.array(["A", "B"], pa.string()),
                "text": pa.array(["aab", "zz zz"], pa.string()),
            }
        )
        got = analytics.bigram_surprisal_by_source(rd.from_arrow(tbl)).set_index(
            "source"
        )
        assert got.loc["A", "n_bigrams"] == 2
        assert got.loc["A", "total_bits"] == 2
        assert got.loc["A", "mean_millibits"] == 1000
        assert got.loc["B", "n_bigrams"] == 4
        assert got.loc["B", "total_bits"] == 1
        assert got.loc["B", "mean_millibits"] == 250

    def test_cross_doc_pairs_excluded(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # two docs "ab" + "cd" must NOT form a 'bc' bigram; short/empty
        # docs contribute nothing
        tbl = pa.table(
            {
                "source": pa.array(["S"] * 4, pa.string()),
                "text": pa.array(["ab", "cd", "x", ""], pa.string()),
            }
        )
        got = analytics.bigram_surprisal_by_source(rd.from_arrow(tbl))
        assert list(got["n_bigrams"]) == [2]


class TestKeyDensityAudit:
    def test_hand_built(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # keys 10..19 minus 13, with 12 duplicated: n=10, distinct=9,
        # span=10 -> density 900000, dup_rows=1
        keys = [10, 11, 12, 12, 14, 15, 16, 17, 18, 19]
        tbl = pa.table({"o_orderkey": pa.array(keys, pa.int64())})
        got = analytics.key_density_audit(rd.from_arrow(tbl))
        assert got.loc[0, "n_rows"] == 10
        assert got.loc[0, "n_distinct"] == 9
        assert got.loc[0, "min_key"] == 10
        assert got.loc[0, "max_key"] == 19
        assert got.loc[0, "density_ppm"] == 900_000
        assert got.loc[0, "dup_rows"] == 1


class TestRollingMedianDaily:
    def test_hand_built_lower_median(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ts = [datetime.datetime(2024, 3, d) for d in range(1, 9)]
        vals = [8.0, 1.0, 6.0, 3.0, 5.0, 4.0, 7.0, 2.0]
        tbl = pa.table(
            {
                "o_orderdate": pa.array(ts, pa.timestamp("us")),
                "o_totalprice": pa.array(vals, pa.float64()),
            }
        )
        got = analytics.rolling_median_daily(tbl_ds := rd.from_arrow(tbl))
        cents = [int(v * 100) for v in vals]
        want = []
        for i in range(len(cents)):
            w = sorted(cents[max(0, i - 6) : i + 1])
            want.append(w[(len(w) + 1) // 2 - 1])
        assert list(got["med7_cents"]) == want


class TestDoclenDeciles:
    def test_hand_built_ranks(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # source S has lengths 10..100 step 10 (n=10): rank = 9k//10+1
        lens = list(range(10, 101, 10))
        tbl = pa.table(
            {
                "source": pa.array(["S"] * 10, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        )
        got = (
            _pdf(analytics.doclen_deciles_by_source(rd.from_arrow(tbl)))
            .sort_values("decile")
            .reset_index(drop=True)
        )
        want = [lens[(9 * k) // 10] for k in range(1, 10)]
        assert list(got["n_chars"]) == want

    def test_matches_numpy_on_sf(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
        got = _pdf(analytics.doclen_deciles_by_source(ds))
        import pandas as pd

        df = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
        for src, grp in df.groupby("source"):
            v = np.sort(grp["n_chars"].to_numpy())
            n = len(v)
            for k in range(1, 10):
                want = v[(n - 1) * k // 10]
                row = got[(got.source == src) & (got.decile == k)]
                assert int(row["n_chars"].iloc[0]) == want


class TestValueMoments:
    def test_hand_built_exact_moments(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # type A: cents [100, 200, 600]; n=3, s1=900, s2=410000, s3=2.25e8
        # mean=300, var=(3*410000-810000)//9=46666,
        # m3 num = 9*s3 - 3*3*900*410000 + 2*900^3 = 1ee? compute in test
        tbl = pa.table(
            {
                "event_type": pa.array(["A"] * 3 + ["B"] * 2, pa.string()),
                "value": pa.array([1.0, 2.0, 6.0, 1.0, 1.0], pa.float64()),
            }
        )
        got = _pdf(analytics.value_moments_by_type(rd.from_arrow(tbl))).set_index(
            "event_type"
        )
        c = [100, 200, 600]
        n, s1 = 3, sum(c)
        s2, s3 = sum(x * x for x in c), sum(x**3 for x in c)
        assert got.loc["A", "n"] == 3
        assert got.loc["A", "mean_cents"] == s1 // n
        assert got.loc["A", "var_cents2"] == (n * s2 - s1 * s1) // (n * n)
        num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        m3 = -((-num) // n**3) if num < 0 else num // n**3
        assert got.loc["A", "m3_cents3"] == m3
        # constant type B: zero variance and zero skew
        assert got.loc["B", "var_cents2"] == 0
        assert got.loc["B", "m3_cents3"] == 0

    def test_negative_skew_truncates_like_sql(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # left-skewed: [6, 6, 1] dollars -> negative third moment; must
        # TRUNCATE toward zero (DuckDB //), not floor
        tbl = pa.table(
            {
                "event_type": pa.array(["L"] * 3, pa.string()),
                "value": pa.array([6.0, 6.0, 1.0], pa.float64()),
            }
        )
        got = _pdf(analytics.value_moments_by_type(rd.from_arrow(tbl)))
        c = [600, 600, 100]
        n, s1 = 3, sum(c)
        s2, s3 = sum(x * x for x in c), sum(x**3 for x in c)
        num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        assert num < 0
        want = -((-num) // n**3)
        assert int(got["m3_cents3"].iloc[0]) == want
        assert want != num // n**3  # floor would disagree


class TestOrderBacklogDaily:
    def test_hand_built_step_function(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # order 1: placed Jan 1, last ship Jan 3 (open Jan 1-3)
        # order 2: placed Jan 2, last ship Jan 2 (open Jan 2)
        # order 3: placed Jan 2, NO lineitems -> never opens (inner join)
        orders = rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_orderdate": pa.array(
                        [
                            datetime.datetime(2024, 1, 1),
                            datetime.datetime(2024, 1, 2),
                            datetime.datetime(2024, 1, 2),
                        ],
                        pa.timestamp("us"),
                    ),
                }
            )
        )
        lineitem = rd.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                    "l_shipdate": pa.array(
                        [
                            datetime.datetime(2024, 1, 2),
                            datetime.datetime(2024, 1, 3),
                            datetime.datetime(2024, 1, 2),
                        ],
                        pa.timestamp("us"),
                    ),
                }
            )
        )
        got = analytics.order_backlog_daily(orders, lineitem, buckets=4)
        want = {
            "2024-01-01": (1, 1),
            "2024-01-02": (1, 2),
            "2024-01-03": (-1, 1),
            "2024-01-04": (-1, 0),
        }
        assert len(got) == 4
        for r in got.itertuples():
            assert want[r.day] == (r.net_delta, r.open_orders)

    def test_backlog_never_negative_and_closes(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        orders = rd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        lineitem = rd.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        got = analytics.order_backlog_daily(orders, lineitem)
        assert (got["open_orders"] >= 0).all()
        assert int(got["open_orders"].iloc[-1]) == 0  # everything ships
        assert int(got["net_delta"].sum()) == 0


class TestDowRevenueProfile:
    def test_hand_built_iso_weekdays(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 2024-08-19 is a Monday; 3 orders Mon/Mon/Sun
        tbl = pa.table(
            {
                "o_orderdate": pa.array(
                    [
                        datetime.datetime(2024, 8, 19),
                        datetime.datetime(2024, 8, 26),
                        datetime.datetime(2024, 8, 25),
                    ],
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array([1.0, 2.0, 1.0], pa.float64()),
            }
        )
        got = analytics.dow_revenue_profile(rd.from_arrow(tbl)).set_index("isodow")
        assert got.loc[1, "n_orders"] == 2
        assert got.loc[1, "revenue_cents"] == 300
        assert got.loc[1, "share_ppm"] == 750_000
        assert got.loc[7, "share_ppm"] == 250_000


class TestCompletenessAudit:
    def test_hand_built_null_and_empty(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["x", "", None, "y"], pa.string()),
                "lang": pa.array(["en", "en", "en", None], pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
            }
        )
        got = analytics.completeness_audit(rd.from_arrow(tbl)).set_index("column")
        assert got.loc["text", "n_null"] == 1
        assert got.loc["text", "n_empty"] == 1
        assert got.loc["text", "missing_ppm"] == 500_000
        assert got.loc["lang", "n_null"] == 1
        assert got.loc["lang", "missing_ppm"] == 250_000
        assert got.loc["source", "missing_ppm"] == 0


class TestFirstEventAfterOrder:
    def test_matches_pandas_brute_force(self):
        from distributed_system___ocr_ray.pipelines import relational

        got = (
            _pdf(relational.first_event_after_order(SF))
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        import pandas as pd

        orders = pd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
        )
        events = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        m = orders.merge(events, left_on="o_custkey", right_on="user_id")
        m = m[m["ts"] > m["o_orderdate"]]
        nxt = m.groupby("o_orderkey").agg(
            od=("o_orderdate", "first"), nts=("ts", "min")
        )
        assert len(got) == len(nxt)
        want_day = nxt["nts"].dt.strftime("%Y-%m-%d")
        want_gap = (
            nxt["nts"].dt.floor("D") - nxt["od"].dt.floor("D")
        ).dt.days.astype(np.int64)
        g = got.set_index("o_orderkey")
        for k in nxt.index:
            assert g.loc[k, "next_event_day"] == want_day.loc[k]
            assert g.loc[k, "gap_days"] == want_gap.loc[k]

    def test_strictly_after_excludes_exact(self):
        import datetime

        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines.relational import asof_join

        orders = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1], pa.int64()),
                    "ots": pa.array([datetime.datetime(2024, 1, 1)], pa.timestamp("us")),
                }
            )
        )
        events = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([1, 1], pa.int64()),
                    "ts": pa.array(
                        [datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 5)],
                        pa.timestamp("us"),
                    ),
                }
            )
        )
        out = _pdf(
            asof_join(
                orders, events, key="k", right_key="u", left_ts="ots", right_ts="ts",
                buckets=2, direction="forward", allow_exact=False,
            )
        )
        assert len(out) == 1
        assert out["ts"].iloc[0] == pd.Timestamp(2024, 1, 5)


class TestDocBigramSurprisal:
    def test_word_salad_outranks_template(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # docs 1-4 repeat the same sentence (common transitions); doc 5
        # uses THE SAME WORDS in a scrambled order (identical unigram
        # profile, rare transitions) and must rank first on bigram bits
        common = "the quick brown fox jumps over the lazy dog"
        salad = "dog the over quick lazy fox the jumps brown"
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "text": pa.array([common] * 4 + [salad], pa.string()),
            }
        )
        got = _pdf(analytics.doc_bigram_surprisal_topk(rd.from_arrow(tbl), k=5))
        assert int(got["doc_id"].iloc[0]) == 5
        assert int(got["mean_millibits"].iloc[0]) > int(got["mean_millibits"].iloc[1])
        # 8 bigrams per doc, none crossing docs
        assert (got["n_bigrams"] == 8).all()

    def test_short_docs_drop(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "lang": pa.array(["en", "en"], pa.string()),
                "text": pa.array(["single", "two words"], pa.string()),
            }
        )
        got = _pdf(analytics.doc_bigram_surprisal_topk(rd.from_arrow(tbl), k=5))
        assert list(got["doc_id"]) == [2]


class TestNegativeSamples:
    def test_hand_built_anti_join(self):
        import hashlib

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        orders = rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11], pa.int64()),
                    "o_custkey": pa.array([1, 2], pa.int64()),
                }
            )
        )
        lineitem = rd.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([10, 10, 11], pa.int64()),
                    "l_partkey": pa.array([0, 3, 1], pa.int64()),
                }
            )
        )
        customer = rd.from_arrow(
            pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())})
        )
        n_parts = 5
        got = (
            _pdf(analytics.negative_samples(orders, lineitem, customer, n_parts, k=4))
            .sort_values(["custkey", "neg_idx"])
            .reset_index(drop=True)
        )
        inter = {(1, 0), (1, 3), (2, 1)}
        want = []
        for c in (1, 2, 3):
            for j in range(1, 5):
                p = (
                    int.from_bytes(
                        hashlib.md5(f"{c}:{j}".encode()).digest()[:8], "big"
                    )
                    % n_parts
                )
                if (c, p) not in inter:
                    want.append((c, j, p))
        assert [tuple(r) for r in got.itertuples(index=False)] == want


class TestSpanCorruptionPlan:
    def test_hand_built_bounds_and_determinism(self):
        import hashlib

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        text = " ".join(f"w{i}" for i in range(45))  # nw=45 -> 2 spans
        tbl = pa.table(
            {
                "doc_id": pa.array([7, 8], pa.int64()),
                "text": pa.array([text, "too short"], pa.string()),
            }
        )
        got = (
            _pdf(analytics.span_corruption_plan(rd.from_arrow(tbl)))
            .sort_values(["doc_id", "span_idx"])
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [7, 7]
        for i, r in enumerate(got.itertuples(), start=1):
            h = int.from_bytes(
                hashlib.md5(f"7:{i}".encode()).digest()[:8], "big"
            )
            assert r.start_tok == h % (45 - 2) + 1
            assert 1 <= r.start_tok <= 43
            assert r.span_len == 3


class TestTwoHopReach:
    def test_matches_brute_force(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics
        from distributed_system___ocr_ray.functions.dedup import md5_u64

        n = 120
        tbl = pa.table({"doc_id": pa.array(range(n), pa.int64())})
        got = (
            analytics.two_hop_reach(rd.from_arrow(tbl), topn=10)
            .sort_values("seed")
            .reset_index(drop=True)
        )
        # brute-force replay of derived_link_edges
        de = set()
        for u in range(n):
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % n
                if t != u:
                    de.add((u, t))
        from collections import Counter, defaultdict

        ind = Counter(t for _, t in de)
        order = sorted(ind.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        preds = defaultdict(set)
        for s, t in de:
            preds[t].add(s)
        assert len(got) == 10
        for seed, deg in order:
            row = got[got.seed == seed]
            assert int(row["in_deg"].iloc[0]) == deg
            want = set()
            for u in preds[seed]:
                want |= preds[u]
            assert int(row["reach2"].iloc[0]) == len(want)


class TestRevenueTimeRollup:
    def test_hand_built_levels(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ts = [
            datetime.datetime(2023, 1, 15),
            datetime.datetime(2023, 2, 15),
            datetime.datetime(2023, 7, 1),
            datetime.datetime(2024, 1, 1),
        ]
        tbl = pa.table(
            {
                "o_orderdate": pa.array(ts, pa.timestamp("us")),
                "o_totalprice": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
            }
        )
        got = analytics.revenue_time_rollup(rd.from_arrow(tbl))
        g = got.set_index(["level", "y", "q", "m"])
        assert g.loc[("month", 2023, 1, 1), "revenue_cents"] == 100
        assert g.loc[("quarter", 2023, 1, -1), "revenue_cents"] == 300
        assert g.loc[("quarter", 2023, 3, -1), "revenue_cents"] == 400
        assert g.loc[("year", 2023, -1, -1), "revenue_cents"] == 700
        assert g.loc[("year", 2024, -1, -1), "n_orders"] == 1
        # level row counts: 4 months, 3 quarters, 2 years
        assert got.groupby("level").size().to_dict() == {
            "month": 4, "quarter": 3, "year": 2,
        }
        # mass conservation across levels
        lv = got.groupby("level")["revenue_cents"].sum()
        assert lv["month"] == lv["quarter"] == lv["year"] == 1500


class TestBpeMergeCandidates:
    def test_hand_corpus(self):
        import ray.data as rd
        from collections import Counter

        from distributed_system___ocr_ray.pipelines import analytics

        texts = ["aba ab Cab", "abba! x7y", ""]
        tbl = pa.table({"text": pa.array(texts, pa.string())})
        got = analytics.bpe_merge_candidates(rd.from_arrow(tbl), k=100).take_all()
        got = {(r["pair"]): r["n"] for r in got}
        # brute-force: [a-z0-9]+ tokens of lowered text, adjacent char pairs
        import re

        exp = Counter()
        for t in texts:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                for i in range(len(w) - 1):
                    exp[w[i : i + 2]] += 1
        assert got == dict(exp)

    def test_topk_order_and_ties(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table({"text": pa.array(["zz aa zz", "aa bb"], pa.string())})
        out = analytics.bpe_merge_candidates(rd.from_arrow(tbl), k=2).take_all()
        # counts: zz=2, aa=2, bb=1 -> top-2 by (n DESC, pair ASC) = aa, zz
        assert [(r["pair"], r["n"]) for r in out] == [("aa", 2), ("zz", 2)]


class TestDpGeometricCounts:
    def test_noise_matches_md5_draws(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics
        from distributed_system___ocr_ray.pipelines.analytics import (
            _md5_leading_ones16,
        )

        tbl = pa.table({"lang": pa.array(["en"] * 7 + ["de"] * 3, pa.string())})
        out = analytics.dp_geometric_counts(rd.from_arrow(tbl))
        assert list(out["lang"]) == ["de", "en"]
        assert list(out["n"]) == [3, 7]
        for _, r in out.iterrows():
            g1, g2 = _md5_leading_ones16(f"dp1:{r['lang']}")
            assert r["noise"] == g1 - g2
            assert r["dp_count"] == r["n"] + g1 - g2

    def test_leading_ones_kernel(self):
        from distributed_system___ocr_ray.pipelines.analytics import (
            _md5_leading_ones16,
        )
        import hashlib

        # independent bit-string reimplementation
        for s in ["dp1:en", "dp1:fr", "x", "q:9"]:
            h = hashlib.md5(s.encode()).hexdigest()
            want = []
            for lo, hi in [(0, 4), (4, 8)]:
                bits = bin(int(h[lo:hi], 16))[2:].zfill(16)
                n = len(bits) - len(bits.lstrip("1"))
                want.append(n)
            assert _md5_leading_ones16(s) == tuple(want)


class TestDowAdjustedSpikes:
    def test_hand_built_spike(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 4 Mondays at 100.00, one Monday at 1000.00 -> spike; Tuesdays flat
        days, vals = [], []
        base = datetime.datetime(2024, 1, 1)  # a Monday
        for wk in range(5):
            days.append(base + datetime.timedelta(weeks=wk))
            vals.append(100.0 if wk < 4 else 1000.0)
            days.append(base + datetime.timedelta(weeks=wk, days=1))
            vals.append(50.0)
        tbl = pa.table(
            {
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_totalprice": pa.array(vals, pa.float64()),
            }
        )
        out = analytics.dow_adjusted_spikes(rd.from_arrow(tbl))
        # monday mean = (4*10000 + 100000)//5 = 28000 cents; residuals
        # -18000 x4, +72000 x1; tuesday resid 0 x5 -> MAD (lower median
        # of sorted |resid|, rank (10+1)//2=5) = 0 -> every nonzero
        # residual day is flagged (all 5 Mondays)
        assert len(out) == 5
        assert list(out["dow"].unique()) == [0]
        spike = out[out["resid_cents"] > 0]
        assert len(spike) == 1 and spike.iloc[0]["day"] == "2024-01-29"
        assert spike.iloc[0]["resid_cents"] == 72000


class TestBoundaryOverlapPairs:
    def test_hand_built_stitch(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "alpha beta gamma delta",   # tail: "gamma delta"
            "gamma delta epsilon zeta", # head: "gamma delta" -> (0, 1)
            "unrelated words here now",
            "zeta omega alpha beta",    # head "zeta omega"; tail "alpha beta"
        ]
        # doc3 tail "alpha beta" == doc0 head -> (3, 0)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = sorted(
            (r["doc_a"], r["doc_b"])
            for r in analytics.boundary_overlap_pairs(rd.from_arrow(tbl)).take_all()
        )
        assert got == [(0, 1), (3, 0)]

    def test_cap_drops_boilerplate_boundary(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 5 docs ending "the end", 1 doc starting "the end": cap=3 drops
        # the hot window on the tail side entirely
        texts = [f"doc {i} body the end" for i in range(5)] + ["the end coda x"]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = analytics.boundary_overlap_pairs(rd.from_arrow(tbl), cap=3).take_all()
        assert got == []
        kept = analytics.boundary_overlap_pairs(rd.from_arrow(tbl), cap=5).take_all()
        assert sorted((r["doc_a"], r["doc_b"]) for r in kept) == [
            (i, 5) for i in range(5)
        ]

    def test_short_docs_skipped(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["one", "one"], pa.string()),
            }
        )
        assert analytics.boundary_overlap_pairs(rd.from_arrow(tbl)).take_all() == []


class TestLDiversityAudit:
    def test_hand_built_cells(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        t0 = datetime.datetime(2024, 3, 1)
        # cell (click, day0): users 1,1,2 -> n_events 3, n_users 2, at_risk
        # cell (view, day0): users 1..6 -> n_users 6, safe at l=5
        rows = [("click", t0, 1), ("click", t0, 1), ("click", t0, 2)] + [
            ("view", t0, u) for u in range(1, 7)
        ]
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        out = analytics.l_diversity_audit(rd.from_arrow(tbl))
        got = {
            (r["event_type"], r["day"]): (r["n_events"], r["n_users"], r["at_risk"])
            for _, r in out.iterrows()
        }
        assert got == {
            ("click", "2024-03-01"): (3, 2, 1),
            ("view", "2024-03-01"): (6, 6, 0),
        }

    def test_cross_batch_user_dedup(self):
        import datetime

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # the same (cell, user) appearing in MANY blocks must count once
        t0 = datetime.datetime(2024, 3, 1)
        tbl = pa.table(
            {
                "event_type": pa.array(["buy"] * 64, pa.string()),
                "ts": pa.array([t0] * 64, pa.timestamp("us")),
                "user_id": pa.array([7] * 64, pa.int64()),
            }
        )
        out = analytics.l_diversity_audit(rd.from_arrow(tbl).repartition(8))
        assert len(out) == 1
        assert out.iloc[0]["n_events"] == 64 and out.iloc[0]["n_users"] == 1


class TestPaddingWasteByBucket:
    def test_hand_built_buckets(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            " ".join(["w"] * 10),   # bucket 16, waste 6
            " ".join(["w"] * 16),   # bucket 16, waste 0
            " ".join(["w"] * 17),   # bucket 32, waste 15
        ]
        tbl = pa.table({"text": pa.array(texts, pa.string())})
        out = analytics.padding_waste_by_bucket(rd.from_arrow(tbl))
        got = {
            r["bucket"]: (r["n_docs"], r["sum_tokens"], r["waste_tokens"], r["waste_ppm"])
            for _, r in out.iterrows()
        }
        assert got == {
            16: (2, 26, 6, 6 * 1_000_000 // 32),
            32: (1, 17, 15, 15 * 1_000_000 // 32),
        }

    def test_clamp_above_top_bucket(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table({"text": pa.array([" ".join(["w"] * 9000)], pa.string())})
        out = analytics.padding_waste_by_bucket(rd.from_arrow(tbl))
        assert list(out["bucket"]) == [8192]
        assert out.iloc[0]["waste_tokens"] == 0  # GREATEST floor, not negative


class TestOrderTotalReconciliation:
    def test_hand_built_mismatch(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "O"], pa.string()),
                # order 1: matches its lines exactly; order 2: off by 5.00;
                # order 3: NO lines at all -> diff = full header total
                "o_totalprice": pa.array([30.0, 20.0, 7.5], pa.float64()),
            }
        )
        lineitem = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 15.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
                "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
            }
        )
        out = analytics.order_total_reconciliation(
            rd.from_arrow(orders), rd.from_arrow(lineitem), buckets=4
        )
        got = {
            r["o_orderstatus"]: (
                r["n_orders"], r["n_exact"], r["sum_abs_diff_cents"], r["max_abs_diff_cents"]
            )
            for _, r in out.iterrows()
        }
        assert got == {"F": (2, 1, 500, 500), "O": (1, 0, 750, 750)}

    def test_orphan_lineitems_dropped(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        orders = pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_orderstatus": pa.array(["O"], pa.string()),
                "o_totalprice": pa.array([10.0], pa.float64()),
            }
        )
        lineitem = pa.table(
            {
                "l_orderkey": pa.array([1, 99], pa.int64()),
                "l_extendedprice": pa.array([10.0, 5.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.0], pa.float64()),
                "l_tax": pa.array([0.0, 0.0], pa.float64()),
            }
        )
        out = analytics.order_total_reconciliation(
            rd.from_arrow(orders), rd.from_arrow(lineitem), buckets=4
        )
        assert len(out) == 1
        assert out.iloc[0]["n_orders"] == 1 and out.iloc[0]["n_exact"] == 1


class TestVocabPruningPlan:
    def test_hand_built_histogram_fold(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # freqs: aa=4, bb=2, cc=1, dd=1 -> total 8 occ, 4 types
        tbl = pa.table(
            {"text": pa.array(["aa aa bb cc", "aa aa bb dd"], pa.string())}
        )
        out = analytics.vocab_pruning_plan(rd.from_arrow(tbl), thresholds=(1, 2, 3))
        got = {
            r["min_count"]: (
                r["kept_types"], r["oov_types"], r["kept_occurrences"], r["oov_ppm"]
            )
            for _, r in out.iterrows()
        }
        assert got == {
            1: (4, 0, 8, 0),
            2: (2, 2, 6, 2 * 1_000_000 // 8),
            3: (1, 3, 4, 4 * 1_000_000 // 8),
        }

    def test_cross_block_counts_merge(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # the same token spread over many blocks must count as ONE type
        tbl = pa.table({"text": pa.array(["tok"] * 32, pa.string())})
        out = analytics.vocab_pruning_plan(
            rd.from_arrow(tbl).repartition(8), thresholds=(1, 33)
        )
        got = {r["min_count"]: (r["kept_types"], r["kept_occurrences"]) for _, r in out.iterrows()}
        assert got == {1: (1, 32), 33: (0, 0)}


class TestWinnowFingerprintPairs:
    def test_planted_copy_detected(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        import numpy as np

        rng = np.random.RandomState(3)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        base = "".join(rng.choice(list(alpha), 400))
        shared = "".join(rng.choice(list(alpha), 200))
        texts = [
            base[:200] + shared,            # doc 0: shares 200 chars with 1
            shared + base[200:],            # doc 1
            "".join(rng.choice(list(alpha), 400)),  # doc 2: unrelated
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = analytics.winnow_fingerprint_pairs(rd.from_arrow(tbl)).take_all()
        pairs = {(r["doc_a"], r["doc_b"]) for r in got}
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

    def test_guarantee_shared_substring(self):
        # winnowing guarantee: a shared substring of length >= k + w - 1
        # (27 here) yields at least one shared fingerprint
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        shared = "the quick brown fox jumps!"  # 26 chars < 27: may miss
        shared2 = "the quick brown fox jumps twice"  # 31 chars: guaranteed
        texts = [
            "AAAA" * 30 + shared2,
            shared2 + "BBBB" * 30,
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = analytics.winnow_fingerprint_pairs(
            rd.from_arrow(tbl), min_shared=1
        ).take_all()
        assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1)}

    def test_short_docs_emit_nothing(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["short text", "short text"], pa.string()),
            }
        )
        assert (
            analytics.winnow_fingerprint_pairs(rd.from_arrow(tbl)).take_all() == []
        )


class TestCdcChunkDedup:
    def test_shared_chunk_saves(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        import numpy as np

        rng = np.random.RandomState(11)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        shared = "".join(rng.choice(list(alpha), 300))
        a = "".join(rng.choice(list(alpha), 150)) + shared
        b = shared + "".join(rng.choice(list(alpha), 150))
        tbl = pa.table({"text": pa.array([a, b], pa.string())})
        out = analytics.cdc_chunk_dedup(rd.from_arrow(tbl))
        r = out.iloc[0]
        # a 300-char shared region must yield at least one duplicated chunk
        assert r["n_distinct_chunks"] < r["n_chunks"]
        assert r["stored_chars"] < r["total_chars"]
        assert r["saving_ppm"] > 0
        assert r["total_chars"] == len(a) + len(b)

    def test_matches_reference_chunker(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics
        from distributed_system___ocr_ray.pipelines.analytics import (
            _CDC_B, _CDC_M, _CDC_W, _CDC_MASK,
        )

        texts = ["the quick brown fox " * 20, "pack my box " * 30, "tiny"]

        def ref_chunks(s):
            W, M, MASK = _CDC_W, _CDC_M, _CDC_MASK
            cuts = set()
            for i in range(len(s) - W + 1):
                h = 0
                for j, ch in enumerate(s[i : i + W]):
                    h += ord(ch) * pow(_CDC_B, W - 1 - j, M)
                if (h % M) % (MASK + 1) == 0:
                    cuts.add(i + W)
            cuts.add(len(s))
            prev, out = 0, []
            for c in sorted(cuts):
                if c > prev:
                    out.append(s[prev:c])
                    prev = c
            return out

        all_chunks = [c for t in texts for c in ref_chunks(t)]
        tbl = pa.table({"text": pa.array(texts, pa.string())})
        out = analytics.cdc_chunk_dedup(rd.from_arrow(tbl)).iloc[0]
        assert out["n_chunks"] == len(all_chunks)
        assert out["n_distinct_chunks"] == len(set(all_chunks))
        assert out["total_chars"] == sum(len(c) for c in all_chunks)
        assert out["stored_chars"] == sum(len(c) for c in set(all_chunks))


class TestGdprErasurePlan:
    def test_predicate_and_zero_rows(self, tmp_path):
        import pyarrow.parquet as pq

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        custs = list(range(1, 401))
        hit = [c for c in custs if md5_u64(f"gdpr:{c}".encode()) % 50 == 0]
        assert hit, "need at least one cohort member for the test"
        pq.write_table(
            pa.table({"c_custkey": pa.array(custs, pa.int64())}),
            tmp_path / "customer.parquet",
        )
        # orders: 3 rows for the first cohort member, 2 for a non-member
        ok = [hit[0]] * 3 + [custs[0] if custs[0] not in hit else custs[1]] * 2
        pq.write_table(
            pa.table({"o_custkey": pa.array(ok, pa.int64())}),
            tmp_path / "orders.parquet",
        )
        # events: all users OUTSIDE the cohort -> zero row must appear
        nohit = [c for c in custs if c not in hit][:5]
        pq.write_table(
            pa.table({"user_id": pa.array(nohit, pa.int64())}),
            tmp_path / "events.parquet",
        )
        out = analytics.gdpr_erasure_plan(str(tmp_path))
        got = {
            r["tbl"]: (r["n_rows_to_erase"], r["n_users_to_erase"])
            for _, r in out.iterrows()
        }
        assert got["customer"] == (len(hit), len(hit))
        assert got["orders"] == (3, 1)
        assert got["events"] == (0, 0)


class TestMaxCoverageSelect:
    def test_hand_built_greedy(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "a b c d e f",        # 5 bigrams -> round-1 winner
            "a b c d",            # subset of doc 0: gain 0 after round 1
            "x y z w",            # 3 fresh bigrams
            "e f g",              # 1 fresh bigram (e f covered by doc 0)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = analytics.max_coverage_select(rd.from_arrow(tbl), k=4)
        got = [tuple(r) for r in out.itertuples(index=False)]
        # greedy: doc0 (5), doc2 (3, cum 8), doc3 (1: 'f g', cum 9), stop
        assert got == [(1, 0, 5, 5), (2, 2, 3, 8), (3, 3, 1, 9)]

    def test_tie_breaks_to_smallest_id(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array([5, 9], pa.int64()),
                "text": pa.array(["p q r", "s t u"], pa.string()),
            }
        )
        out = analytics.max_coverage_select(rd.from_arrow(tbl), k=1)
        assert list(out["doc_id"]) == [5]


class TestBlocklistScreen:
    def test_hand_built_categories(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "text": pa.array(
                    [
                        "the fast table is fast",   # speed 2 hits
                        "slow breakfast",           # 1 hit: 'breakfast' is NOT 'fast'
                        "nothing here",
                    ],
                    pa.string(),
                ),
                "lang": pa.array(["en", "en", "de"], pa.string()),
            }
        )
        out = analytics.blocklist_screen(
            rd.from_arrow(tbl), categories={"speed": ("fast", "slow")}
        )
        got = {
            (r["category"], r["lang"]): (r["n_docs"], r["n_hits"])
            for _, r in out.iterrows()
        }
        # whole-token: 'contrast' must NOT count; zero cell (de) kept
        assert got == {("speed", "en"): (2, 3), ("speed", "de"): (0, 0)}


class TestBoundaryStitchChains:
    def test_three_doc_chain(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "alpha beta gamma delta",       # -> doc1 (tail 'gamma delta')
            "gamma delta epsilon zeta",     # -> doc2 (tail 'epsilon zeta')
            "epsilon zeta omega psi",       # chain of 3
            "lonely words with no overlap", # singleton: not in any chain
            "pair one start tail mark",     # -> doc5 ('tail mark')
            "tail mark pair two finish",    # chain of 2
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = analytics.boundary_stitch_chains(rd.from_arrow(tbl))
        got = {r["chain_size"]: r["n_chains"] for _, r in out.iterrows()}
        assert got == {2: 1, 3: 1}


class TestPseudonymCollisionAudit:
    def test_tiny_space_forces_collisions(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        users = list(range(1, 60))
        tbl = pa.table({"user_id": pa.array(users * 3, pa.int64())})  # dups too
        out = analytics.pseudonym_collision_audit(
            rd.from_arrow(tbl), space_bits=4
        ).iloc[0]
        ps = {md5_u64(f"pseud:{u}".encode()) % 16 for u in users}
        assert out["n_users"] == 59
        assert out["n_pseudonyms"] == len(ps)
        assert out["n_collisions"] == 59 - len(ps) > 0
        assert out["collision_ppm"] == (59 - len(ps)) * 1_000_000 // 59


class TestCodeSwitchRateBySource:
    def test_mixed_language_flagged(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "the cat and the dog is in it",        # en only
            "the cat and der hund ist nicht mit",  # en + de -> flagged
            "la vie est pour les autres",          # fr only
        ]
        tbl = pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "source": pa.array(["s1", "s1", "s2"], pa.string()),
            }
        )
        out = analytics.code_switch_rate_by_source(rd.from_arrow(tbl))
        got = {
            r["source"]: (r["n_docs"], r["n_code_switch"], r["code_switch_ppm"])
            for _, r in out.iterrows()
        }
        assert got == {"s1": (2, 1, 500000), "s2": (1, 0, 0)}


class TestTokenBudgetWaterfill:
    def test_hand_built_levels(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # supplies: s1=2, s2=10, s3=20 -> total 32, B = 32*2//5 = 12
        # L: i=1: 12//3=4 >= 0 ok; i=2: (12-2)//2=5 >= 2 ok; i=3:
        # (12-12)//1=0 < 10 invalid -> L=5; allot = 2,5,5 (sum 12 = B)
        texts = (["w w"] * 1) + ["w w w w w w w w w w"] + ["w " * 19 + "w"]
        srcs = ["s1", "s2", "s3"]
        tbl = pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        out = analytics.token_budget_waterfill(rd.from_arrow(tbl))
        got = {
            r["source"]: (r["available_tokens"], r["allotted_tokens"], r["capped"])
            for _, r in out.iterrows()
        }
        assert got == {"s1": (2, 2, 0), "s2": (10, 5, 1), "s3": (20, 5, 1)}

    def test_budget_covers_everything(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "text": pa.array(["a b", "c d e"], pa.string()),
                "source": pa.array(["x", "y"], pa.string()),
            }
        )
        out = analytics.token_budget_waterfill(
            rd.from_arrow(tbl), budget_num=1, budget_den=1
        )
        assert list(out["allotted_tokens"]) == list(out["available_tokens"])
        assert list(out["capped"]) == [0, 0]


class TestRandomWalks:
    def test_structure_and_determinism(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table({"doc_id": pa.array(range(60), pa.int64())})
        out1 = analytics.random_walks(rd.from_arrow(tbl), n_seeds=4, walks_per_seed=2)
        out2 = analytics.random_walks(
            rd.from_arrow(tbl).repartition(7), n_seeds=4, walks_per_seed=2
        )
        # identical walks regardless of partitioning
        assert out1.equals(out2)
        # step-0 rows are exactly the (seed, walk) grid at the seed node
        s0 = out1[out1["step"] == 0]
        assert len(s0) == 8
        assert (s0["seed"] == s0["node"]).all()
        # every step-t+1 node is an out-neighbor of the step-t node
        from distributed_system___ocr_ray.functions.dedup import md5_u64

        n = 60
        adj = {}
        for u in range(n):
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            ts = sorted({md5_u64(f"{u}:link:{j}".encode()) % n for j in range(d)} - {u})
            adj[u] = ts
        for (seed, w), g in out1.groupby(["seed", "walk_id"]):
            g = g.sort_values("step")
            nodes = g["node"].tolist()
            for t in range(len(nodes) - 1):
                nbrs = adj[nodes[t]]
                idx = md5_u64(f"walk:{seed}:{w}:{t}:{nodes[t]}".encode()) % len(nbrs)
                assert nodes[t + 1] == nbrs[idx]


class TestKwicSnippets:
    def test_hand_built_snippets(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [
            "a b c target d e f",
            "target x y",
            "no hit here",
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = analytics.kwic_snippets(
            rd.from_arrow(tbl), terms=("target",), window=2, k=5
        )
        got = [(r["term"], r["doc_id"], r["pos"], r["snippet"]) for _, r in out.iterrows()]
        assert got == [
            ("target", 10, 4, "b c target d e"),
            ("target", 11, 1, "target x y"),
        ]

    def test_k_limit_and_order(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(["hit one two"] * 30, pa.string()),
            }
        )
        out = analytics.kwic_snippets(
            rd.from_arrow(tbl).repartition(6), terms=("hit",), k=7
        )
        assert len(out) == 7
        assert list(out["doc_id"]) == list(range(7))  # smallest doc_ids win


class TestLeakageFreeSplitAudit:
    def test_planted_dup_cluster_cannot_straddle(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 30 distinct docs + one near-dup FAMILY of 6 copies: by_cluster
        # must report 0 straddling; totals must cover all docs either way
        import numpy as np

        rng = np.random.RandomState(5)
        alpha = list("abcdefghij ")
        texts = ["".join(rng.choice(alpha, 120)) for _ in range(30)]
        dup = "the same duplicated document body repeated verbatim " * 4
        texts += [dup] * 6
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = analytics.leakage_free_split_audit(rd.from_arrow(tbl))
        got = {
            r["method"]: (r["n_train"], r["n_val"], r["straddling_clusters"])
            for _, r in out.iterrows()
        }
        n = len(texts)
        assert set(got) == {"by_cluster", "by_doc"}
        for m, (tr, va, _) in got.items():
            assert tr + va == n
        assert got["by_cluster"][2] == 0
        # the 6-copy cluster moves as one unit under by_cluster: its docs
        # are all-train or all-val
        assert abs(got["by_cluster"][0] - got["by_doc"][0]) >= 0  # sanity


class TestMatryoshkaRecallAudit:
    def test_prefix_identical_vectors_give_full_recall(self):
        import ray.data as rd

        import numpy as np

        from distributed_system___ocr_ray.pipelines import analytics

        rng = np.random.RandomState(2)
        # vectors whose informative mass is in the first 4 dims: the
        # truncated ranking must equal the full one
        base = rng.randn(20, 4)
        vecs = np.concatenate([base, np.zeros((20, 12))], axis=1)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        q = vecs[:2].astype(np.float64)
        out = analytics.matryoshka_recall_audit(
            rd.from_arrow(tbl), q, trunc_dim=4, k=5
        )
        assert list(out["recall_ppm"]) == [1_000_000, 1_000_000]
        assert list(out["n_overlap"]) == [5, 5]


class TestMmrDiverseTopk:
    def test_diversity_beats_redundancy(self):
        import ray.data as rd

        import numpy as np

        from distributed_system___ocr_ray.pipelines import analytics

        # cluster A: 3 near-copies (cq = 0.8, mutual sim ~1.0); vec 10:
        # slightly less relevant (cq = 0.75) but near-orthogonal to A
        # outside the query direction. At lam = 0.7: second copy scores
        # 0.7*0.8 - 0.3*1.0 = 0.26; vec 10 scores 0.7*0.75 - 0.3*0.6 =
        # 0.345 -> MMR must slot vec 10 in at rank 2.
        q = np.array([1.0, 0.0, 0.0, 0.0])
        a = np.array([0.8, 0.6, 0.0, 0.0])
        rows = {
            0: a,
            1: a + np.array([0.0, 0.001, 0.0, 0.0]),
            2: a + np.array([0.0, 0.002, 0.0, 0.0]),
            10: np.array([0.75, 0.0, 0.6614, 0.0]),
        }
        tbl = pa.table(
            {
                "vec_id": pa.array(list(rows), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in rows.values()],
                    pa.list_(pa.float32()),
                ),
            }
        )
        out = analytics.mmr_diverse_topk(
            rd.from_arrow(tbl), q.reshape(1, -1), k=3, pool=4
        )
        picked = list(out["vec_id"])
        assert picked[0] in (0, 1, 2)      # most relevant first
        assert 10 in picked[:3]            # diversity pulls in the orthogonal doc


class TestBootstrapCIMean:
    def test_hand_checked_weights_and_interval(self):
        import hashlib

        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ids = list(range(1, 501))
        tbl = pa.table(
            {
                "o_orderkey": pa.array(ids, pa.int64()),
                "o_totalprice": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        got = analytics.bootstrap_ci_mean(rd.from_arrow(tbl))
        assert list(got.columns) == [
            "mean_c100", "ci_lo_c100", "ci_hi_c100", "n_resamples",
        ]
        # point estimate: mean of 1..500 dollars = 250.50 -> cents*100
        assert int(got["mean_c100"].iloc[0]) == sum(ids) * 100 * 100 // len(ids)
        # replay one resample by hand (b=0) with the published constants
        a, b, thr = analytics.bootstrap_constants()
        M = (1 << 61) - 1
        sw = swx = 0
        for i in ids:
            h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
            u = ((int(a[0]) * h + int(b[0])) % (1 << 64)) % M
            w = sum(1 for t in thr if int(t) <= u)
            sw += w
            swx += w * i * 100
        mean0 = swx * 100 // sw
        # 64 resamples survive (every total weight positive at n=500)
        assert int(got["n_resamples"].iloc[0]) == 64
        lo = int(got["ci_lo_c100"].iloc[0])
        hi = int(got["ci_hi_c100"].iloc[0])
        assert lo <= mean0 <= hi or not (lo <= int(got["mean_c100"].iloc[0]) <= hi)
        # interval is ordered and brackets the point estimate at n=500
        assert lo <= int(got["mean_c100"].iloc[0]) <= hi

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ids = list(range(1, 301))
        tbl = pa.table(
            {
                "o_orderkey": pa.array(ids, pa.int64()),
                "o_totalprice": pa.array([float(1 + (i % 7)) for i in ids], pa.float64()),
            }
        )
        one = analytics.bootstrap_ci_mean(rd.from_arrow(tbl))
        many = analytics.bootstrap_ci_mean(rd.from_arrow(tbl).repartition(13))
        assert one.equals(many)


class TestEmbeddingCovariance:
    def test_hand_built_2d(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # three 3-dim vectors in whole milli-units; covariance by hand
        vecs = [[1.0, 2.0, 0.0], [2.0, 4.0, 0.0], [3.0, 6.0, 0.0]]
        tbl = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32()))})
        got = analytics.embedding_covariance_topk(rd.from_arrow(tbl), topk=3)
        q = [[1000, 2000, 0], [2000, 4000, 0], [3000, 6000, 0]]
        n = 3
        import itertools

        want = []
        for a, b in itertools.combinations(range(3), 2):
            sab = sum(r[a] * r[b] for r in q)
            sa = sum(r[a] for r in q)
            sb = sum(r[b] for r in q)
            want.append((a + 1, b + 1, n * sab - sa * sb))
        want.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
        assert list(map(tuple, got.itertuples(index=False))) == want
        # dims 1,2 are perfectly correlated -> their cov_num tops the list
        assert (got.iloc[0]["dim_a"], got.iloc[0]["dim_b"]) == (1, 2)

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        rng = [[((i * 7 + j * 3) % 11) / 10.0 for j in range(8)] for i in range(200)]
        tbl = pa.table({"embedding": pa.array(rng, pa.list_(pa.float32()))})
        one = analytics.embedding_covariance_topk(rd.from_arrow(tbl))
        many = analytics.embedding_covariance_topk(rd.from_arrow(tbl).repartition(9))
        assert one.equals(many)


class TestTCloseness:
    def test_hand_built_emd(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # cell A: all mass in bin 0 ($5); cell B: all in bin 9 ($95);
        # global: half/half -> each cell's EMD is 0.5 over 9 steps x 9
        # nonzero cumulative diffs
        vals = [5.0] * 10 + [95.0] * 10
        qi = ["A"] * 10 + ["B"] * 10
        tbl = pa.table({"event_type": pa.array(qi), "value": pa.array(vals)})
        got = analytics.t_closeness_audit(rd.from_arrow(tbl)).set_index("qi")
        # cum_A = 10 at every bin 0..8; cum_g = 10 at bins 0..8; N=20, n_c=10
        # |10*20 - 10*10| = 100 per bin x 9 bins = 900
        # t_ppm = 1e6*900 // (10*20*9) = 500_000
        assert int(got.loc["A", "t_ppm"]) == 500_000
        assert int(got.loc["B", "t_ppm"]) == 500_000
        assert (got["at_risk"] == 1).all()
        assert (got["n_events"] == 10).all()

    def test_identical_distribution_is_zero(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vals = [5.0, 15.0, 25.0] * 4
        qi = (["A"] * 3 + ["B"] * 3) * 2
        tbl = pa.table({"event_type": pa.array(qi), "value": pa.array(vals)})
        got = analytics.t_closeness_audit(rd.from_arrow(tbl))
        assert (got["t_ppm"] == 0).all()
        assert (got["at_risk"] == 0).all()


class TestPQRecallAudit:
    def test_self_query_and_bounds(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # deterministic synthetic vectors, 16 dims -> 4 subspaces of 4
        vecs = [[(((i * 13 + j * 5) % 17) - 8) / 8.0 for j in range(16)]
                for i in range(120)]
        tbl = pa.table({
            "vec_id": pa.array(list(range(120)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })
        q = np.asarray(vecs[:3], np.float64)
        got = analytics.pq_recall_audit(
            rd.from_arrow(tbl), q, n_sub=4, n_codes=8, k=5)
        assert list(got["query_id"]) == [0, 1, 2]
        assert ((got["n_overlap"] >= 0) & (got["n_overlap"] <= 5)).all()
        assert (got["recall_ppm"] == got["n_overlap"] * 1_000_000 // 5).all()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vecs = [[(((i * 7 + j * 11) % 23) - 11) / 11.0 for j in range(16)]
                for i in range(90)]
        tbl = pa.table({
            "vec_id": pa.array(list(range(90)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })
        q = np.asarray(vecs[:2], np.float64)
        one = analytics.pq_recall_audit(rd.from_arrow(tbl), q, n_sub=4, n_codes=8)
        many = analytics.pq_recall_audit(
            rd.from_arrow(tbl).repartition(7), q, n_sub=4, n_codes=8)
        assert one.equals(many)


@pytest.mark.usefixtures("ray_session")
class TestSq8RecallAudit:
    def _tbl(self, n=120, d=16, mod=17):
        vecs = [[(((i * 13 + j * 5) % mod) - mod // 2) / float(mod // 2)
                 for j in range(d)] for i in range(n)]
        return pa.table({
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }), vecs

    def test_self_query_and_bounds(self):
        """A SELF-query's nearest neighbor (itself: distance 0 in both
        code and exact space) is always recalled, so overlap >= 1; ppm
        arithmetic is the house floor-div."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl, vecs = self._tbl()
        q = np.asarray(vecs[:3], np.float64)
        got = analytics.sq8_recall_audit(rd.from_arrow(tbl), q, k=5)
        assert list(got["query_id"]) == [0, 1, 2]
        assert ((got["n_overlap"] >= 1) & (got["n_overlap"] <= 5)).all()
        assert (got["recall_ppm"] == got["n_overlap"] * 1_000_000 // 5).all()

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl, vecs = self._tbl(n=90, mod=23)
        q = np.asarray(vecs[:2], np.float64)
        one = analytics.sq8_recall_audit(rd.from_arrow(tbl), q, k=5)
        many = analytics.sq8_recall_audit(
            rd.from_arrow(tbl).repartition(7), q, k=5)
        assert one.equals(many)

    def test_coarse_grid_degrades_recall(self):
        """At levels=1 codes collapse to {0, 1} per dim: code-space
        ranking loses most ordering information, so recall cannot exceed
        the fine-grid recall -- the audit detects quantization damage."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl, vecs = self._tbl()
        q = np.asarray(vecs[10:11], np.float64)
        fine = analytics.sq8_recall_audit(rd.from_arrow(tbl), q, k=5)
        coarse = analytics.sq8_recall_audit(rd.from_arrow(tbl), q, k=5,
                                            levels=1)
        assert int(coarse["n_overlap"].iloc[0]) <= int(fine["n_overlap"].iloc[0])


class TestLangTemperaturePlan:
    def test_sqrt_weights_hand_checked(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        tbl = pa.table({"lang": pa.array(["en"] * 100 + ["fr"] * 25 + ["de"] * 4)})
        got = analytics.lang_temperature_plan(rd.from_arrow(tbl)).set_index("lang")
        assert got.loc["en", "weight"] == 10
        assert got.loc["fr", "weight"] == 5
        assert got.loc["de", "weight"] == 2
        sum_w, N = 17, 129
        assert got.loc["en", "target_share_ppm"] == 10 * 1_000_000 // sum_w
        assert got.loc["de", "resample_factor_ppm"] == 2 * N * 1_000_000 // (sum_w * 4)
        # sqrt temperature upsamples the tail, downsamples the head
        assert got.loc["de", "resample_factor_ppm"] > 1_000_000
        assert got.loc["en", "resample_factor_ppm"] < 1_000_000


class TestQualityDupCalibration:
    def test_dup_participation(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = ["the quick brown fox jumps over the lazy dog again today",
                 "the quick brown fox jumps over the lazy dog again today",
                 "an entirely different and unique sentence with its own words"]
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts),
        })
        got = analytics.quality_dup_calibration(rd.from_arrow(tbl))
        assert int(got["n_docs"].sum()) == 3
        assert int(got["n_dup_docs"].sum()) == 2
        assert (got["dup_rate_ppm"]
                == got["n_dup_docs"] * 1_000_000 // got["n_docs"]).all()


class TestWatermarkLateCounts:
    def test_hand_built_stream(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        # arrival order 1..5; event times (minutes): 0, 60, 2, 50, 59
        # watermark delay 300s=5min: event 3 (t=2min, prefix max 60min)
        # is 58min late -> dropped; event 4 (50min, max 60) 10min late ->
        # dropped; event 5 (59min, max 60) 1min late -> kept
        ts = pd.to_datetime([
            "2026-01-01 00:00:00", "2026-01-01 01:00:00",
            "2026-01-01 00:02:00", "2026-01-01 00:50:00",
            "2026-01-01 00:59:00"])
        tbl = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        got = relational.watermark_late_counts(rd.from_arrow(tbl)).set_index("hour")
        assert int(got.loc["2026-01-01 00", "n_events"]) == 4
        assert int(got.loc["2026-01-01 00", "n_late"]) == 2
        assert int(got.loc["2026-01-01 01", "n_late"]) == 0
        assert int(got.loc["2026-01-01 00", "late_ppm"]) == 500_000

    def test_partition_invariance(self):
        import pandas as pd
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import relational

        n = 500
        ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            [(i * 37) % 360 for i in range(n)], unit="m")
        tbl = pa.table({
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        one = relational.watermark_late_counts(rd.from_arrow(tbl))
        many = relational.watermark_late_counts(rd.from_arrow(tbl).repartition(11))
        assert one.equals(many)


class TestEmbeddingOutliers:
    def test_planted_outlier(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 30 near-identical vectors per label + one far outlier in label 0
        vecs, labels = [], []
        for L in range(2):
            for i in range(30):
                vecs.append([float(L)] * 8)
                labels.append(L)
        vecs.append([9.0] * 8)
        labels.append(0)
        tbl = pa.table({
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        got = analytics.embedding_outliers_topk(rd.from_arrow(tbl), topk=3)
        assert int(got.iloc[0]["vec_id"]) == len(vecs) - 1
        assert int(got.iloc[0]["label"]) == 0
        assert int(got.iloc[0]["dist"]) > int(got.iloc[1]["dist"])

    def test_partition_invariance_with_negatives(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vecs = [[(((i * 11 + j * 3) % 13) - 6) / 5.0 for j in range(8)]
                for i in range(150)]
        tbl = pa.table({
            "vec_id": pa.array(list(range(150)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(150)], pa.int32()),
        })
        one = analytics.embedding_outliers_topk(rd.from_arrow(tbl))
        many = analytics.embedding_outliers_topk(rd.from_arrow(tbl).repartition(8))
        assert one.equals(many)


class TestCentroidSeparation:
    def test_planted_geometry(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # label 0 tight at origin, label 1 tight at 10*ones, label 2 tight
        # at 20*ones: nn of 0 is 1, nn of 2 is 1, and separation >> 1e6
        vecs, labels = [], []
        for L, base in ((0, 0.0), (1, 10.0), (2, 20.0)):
            for i in range(20):
                vecs.append([base + (i % 3) * 0.001] * 4)
                labels.append(L)
        tbl = pa.table({
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        got = analytics.centroid_separation_audit(rd.from_arrow(tbl))
        assert got["label"].tolist() == [0, 1, 2]
        assert got["n_vecs"].tolist() == [20, 20, 20]
        assert got["nn_label"].tolist() == [1, 0, 1]
        # centroid gap 10*1000 milli per dim x 4 dims = 4e8 squared
        assert all(d > 3.9e8 for d in got["nn_dist"])
        assert all(s > 1_000_000 for s in got["separation_ppm"])

    def test_partition_invariance_with_negatives(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vecs = [[(((i * 11 + j * 3) % 13) - 6) / 5.0 for j in range(8)]
                for i in range(150)]
        tbl = pa.table({
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(150)], pa.int32()),
        })
        one = analytics.centroid_separation_audit(rd.from_arrow(tbl))
        many = analytics.centroid_separation_audit(
            rd.from_arrow(tbl).repartition(8))
        assert one.equals(many)


class TestReadability:
    def test_hand_computed_grade(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # "the cat sat." -> 3 words, 1 sentence, 2 vowel groups ("e","a"
        # in cat... actually: the(1) cat(1) sat(1) = 3 groups)
        tbl = pa.table({
            "lang": pa.array(["en", "en"]),
            "text": pa.array(["The cat sat.", "A big dog ran! It hid."]),
        })
        got = analytics.readability_by_lang(rd.from_arrow(tbl)).to_pandas()
        assert got["n_docs"].tolist() == [2]
        # doc1: 3 words / 1 sentence / 3 vowel groups
        # doc2: 6 words / 2 sentences / 6 vowel groups ("a","i","o","a","i","i")
        W, S, Y = 9, 3, 9
        assert got["n_words"].tolist() == [W]
        assert got["n_sentences"].tolist() == [S]
        assert got["n_syllables"].tolist() == [Y]
        expect = 390 * W // S + 11800 * Y // W - 15590
        assert got["fk_grade_milli"].tolist() == [expect]

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        texts = [f"Sentence number {i} is here. It has words!" for i in range(90)]
        tbl = pa.table({
            "lang": pa.array([("en", "fr", "de")[i % 3] for i in range(90)]),
            "text": pa.array(texts),
        })
        one = analytics.readability_by_lang(rd.from_arrow(tbl)).to_pandas()
        many = analytics.readability_by_lang(
            rd.from_arrow(tbl).repartition(7)).to_pandas()
        key = ["lang"]
        assert one.sort_values(key).reset_index(drop=True).equals(
            many.sort_values(key).reset_index(drop=True))


class TestNearestCentroidConfusion:
    def test_planted_confusion(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # label 0 tight at origin, label 1 tight at 10*ones -- except 5 of
        # label 0's vectors actually sit at 10*ones (mislabeled)
        vecs, labels = [], []
        for i in range(20):
            vecs.append([0.0] * 4 if i < 15 else [10.0] * 4)
            labels.append(0)
        for i in range(20):
            vecs.append([10.0] * 4)
            labels.append(1)
        tbl = pa.table({
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        got = analytics.nearest_centroid_confusion(rd.from_arrow(tbl))
        m = {(int(r["label"]), int(r["pred_label"])): int(r["n_vecs"])
             for _, r in got.iterrows()}
        assert m[(0, 0)] == 15 and m[(0, 1)] == 5 and m[(1, 1)] == 20
        s = {(int(r["label"]), int(r["pred_label"])): int(r["share_ppm"])
             for _, r in got.iterrows()}
        assert s[(0, 1)] == 5 * 1_000_000 // 20
        assert s[(1, 1)] == 1_000_000

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        vecs = [[(((i * 11 + j * 3) % 13) - 6) / 5.0 for j in range(8)]
                for i in range(150)]
        tbl = pa.table({
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(150)], pa.int32()),
        })
        one = analytics.nearest_centroid_confusion(rd.from_arrow(tbl))
        many = analytics.nearest_centroid_confusion(
            rd.from_arrow(tbl).repartition(8))
        assert one.equals(many)


    def test_negative_labels(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # two tight clusters under labels -5 and 3: confusion is diagonal
        vecs = [[0.0] * 4] * 10 + [[10.0] * 4] * 10
        labels = [-5] * 10 + [3] * 10
        tbl = pa.table({
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })
        got = analytics.nearest_centroid_confusion(rd.from_arrow(tbl))
        m = {(int(r["label"]), int(r["pred_label"])): int(r["n_vecs"])
             for _, r in got.iterrows()}
        assert m == {(-5, -5): 10, (3, 3): 10}


class TestSourceCentroidGeometry:
    def test_identity_and_symmetry_invariants(self, tmp_path):
        import pyarrow.parquet as pq

        from distributed_system___ocr_ray.pipelines import analytics

        # two sources with hand-built centroids: A at ones, B at 2*ones
        vecs = [[1.0] * 4] * 10 + [[2.0] * 4] * 10
        pq.write_table(pa.table({
            "vec_id": pa.array(list(range(20)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }), tmp_path / "embeddings.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "source": pa.array(["A"] * 10 + ["B"] * 10),
        }), tmp_path / "documents.parquet")
        out = analytics.source_centroid_geometry(str(tmp_path))
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["source_a"], r["source_b"]) == ("A", "B")
        # centroids (1000,)*4 and (2000,)*4 in milli
        assert int(r["dot_num"]) == 4 * 1000 * 2000
        assert int(r["normsq_a"]) == 4 * 1000 * 1000
        assert int(r["normsq_b"]) == 4 * 2000 * 2000


class TestKcenterCoreset:
    def test_farthest_first_hand_trace(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 1-D-ish points on a line: seed is min id, then the two farthest
        # (Gonzalez hand trace; id 5 beats id 4 on distance, id 3 last)
        vecs = [[0.0, 0.0], [0.001, 0.0], [10.0, 0.0], [25.0, 0.0],
                [25.0, 0.001]]
        t = pa.table({
            "vec_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })
        got = analytics.kcenter_coreset(rd.from_arrow(t), k=3)
        rows = [(int(r["sel_order"]), int(r["vec_id"]), int(r["distsq"]))
                for _, r in got.iterrows()]
        assert rows == [
            (1, 1, 0),
            (2, 5, 25000 * 25000 + 1),
            (3, 3, 10000 * 10000),
        ]

    def test_stops_early_and_never_reselects(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 2 points, k=5: exactly 2 rows come back, radii nonincreasing
        t = pa.table({
            "vec_id": pa.array([7, 9], pa.int64()),
            "embedding": pa.array([[1.0], [4.0]], pa.list_(pa.float32())),
        })
        got = analytics.kcenter_coreset(rd.from_arrow(t), k=5)
        assert got["vec_id"].tolist() == [7, 9]
        assert got["distsq"].tolist() == [0, 3000 * 3000]


class TestPcaTopComponent:
    def test_rank_one_cloud_recovers_direction(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # points t*(3,4): covariance is rank-1 along (3,4); the iteration's
        # exact fixed point is max-normalized (750000, 1000000)
        vecs = [[3.0 * t, 4.0 * t] for t in (1.0, 2.0, 3.0, 4.0)]
        t = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32()))})
        got = analytics.pca_top_component(rd.from_arrow(t))
        assert got["dim"].tolist() == [1, 2]
        assert got["v_scaled"].tolist() == [750000, 1000000]
        assert int(got["lambda_micro"].iloc[0]) > 0

    def test_single_dim_lambda_is_variance_micro(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # [0, 2]: n^2-scaled covariance 4e6; lambda_micro = 1e12 exactly
        t = pa.table({"embedding": pa.array([[0.0], [2.0]],
                                            pa.list_(pa.float32()))})
        got = analytics.pca_top_component(rd.from_arrow(t))
        assert got["v_scaled"].tolist() == [1000000]
        assert got["lambda_micro"].tolist() == [10 ** 12]


class TestRendezvousRoutingBalance:
    @staticmethod
    def _assign(ids, n_workers):
        from distributed_system___ocr_ray.functions.dedup import md5_u64

        names = [f"w{i:02d}" for i in range(n_workers)]
        return {
            d: max(names, key=lambda w: (md5_u64(b"hrw:%d:%s" % (d, w.encode())), -ord(w[-1])))
            for d in ids
        }

    def test_counts_match_reference_assignment(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ids = list(range(200))
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        got = analytics.rendezvous_routing_balance(rd.from_arrow(t), n_workers=4)
        exp = {}
        for w in self._assign(ids, 4).values():
            exp[w] = exp.get(w, 0) + 1
        assert dict(zip(got["worker"], got["n_docs"])) == exp
        assert int(got["n_docs"].sum()) == 200

    def test_growing_pool_moves_only_to_new_worker(self):
        # the HRW property the router exists for: W -> W+1 remaps a key
        # only when the NEW worker wins it
        ids = list(range(300))
        a4 = self._assign(ids, 4)
        a5 = self._assign(ids, 5)
        moved = {d for d in ids if a4[d] != a5[d]}
        assert moved, "some keys should move"
        assert all(a5[d] == "w04" for d in moved)


class TestDsirImportanceWeights:
    def test_target_like_docs_score_higher(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd  # noqa: F401 - ray session fixture side

        from distributed_system___ocr_ray.pipelines import analytics

        # target slice speaks 'alpha beta'; raw background speaks 'gamma
        # delta'; a fresh doc in each vocabulary must rank accordingly
        docs = (["alpha beta alpha beta"] * 8 + ["gamma delta gamma"] * 8
                + ["alpha beta", "gamma delta"])
        langs = ["en"] * 8 + ["de"] * 8 + ["fr", "fr"]
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(18)), pa.int64()),
            "lang": pa.array(langs),
            "text": pa.array(docs),
        }), tmp_path / "documents.parquet")
        out = analytics.dsir_importance_weights(str(tmp_path)).to_pandas()
        out = out.set_index("doc_id")
        assert len(out) == 18
        # the target-vocabulary probe outscores the background probe
        assert int(out.loc[16, "score_milli"]) > int(out.loc[17, "score_milli"])
        # length normalization: pure-target docs share one score
        assert out.loc[0, "score_milli"] == out.loc[16, "score_milli"]


class TestLpaCommunities:
    def test_two_triangles_with_bridge(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # triangles {0,1,2} and {3,4,5} joined by bridge 2-3: sync LPA
        # with self-vote and min-label ties converges to labels 0 and 3
        nodes = pa.table({"doc_id": pa.array(list(range(6)), pa.int64())})
        e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        edges = pa.table({
            "src": pa.array([a for a, _ in e], pa.int64()),
            "dst": pa.array([b for _, b in e], pa.int64()),
        })
        got = (
            analytics.lpa_communities(rd.from_arrow(nodes), rounds=4,
                                      edges=rd.from_arrow(edges))
            .to_pandas().sort_values("doc_id")
        )
        assert got["community"].tolist() == [0, 0, 0, 3, 3, 3]

    def test_isolated_node_keeps_own_label(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        nodes = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64())})
        edges = pa.table({"src": pa.array([0], pa.int64()),
                          "dst": pa.array([1], pa.int64())})
        got = (
            analytics.lpa_communities(rd.from_arrow(nodes), rounds=3,
                                      edges=rd.from_arrow(edges))
            .to_pandas().sort_values("doc_id")
        )
        assert got["community"].tolist() == [0, 0, 2]


class TestDegreeAssortativity:
    def test_star_graph_is_disassortative(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # star K1,3: every edge joins deg-3 hub to deg-1 leaf -> r = -1
        nodes = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
        edges = pa.table({
            "src": pa.array([0, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 3], pa.int64()),
        })
        got = analytics.degree_assortativity(
            rd.from_arrow(nodes), edges=rd.from_arrow(edges))
        assert int(got["m_votes"].iloc[0]) == 6
        assert int(got["r_ppm"].iloc[0]) == -1_000_000

    def test_regular_graph_ships_zero(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # triangle: all degrees equal -> zero variance -> r_ppm = 0
        nodes = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64())})
        edges = pa.table({
            "src": pa.array([0, 1, 2], pa.int64()),
            "dst": pa.array([1, 2, 0], pa.int64()),
        })
        got = analytics.degree_assortativity(
            rd.from_arrow(nodes), edges=rd.from_arrow(edges))
        assert int(got["r_ppm"].iloc[0]) == 0


class TestHitsScores:
    def test_bipartite_hub_authority_split(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # hubs {0,1} each point at authorities {2,3}; 3 gets an extra
        # in-link from 4 so it outranks 2; hubs have zero authority
        nodes = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64())})
        e = [(0, 2), (0, 3), (1, 2), (1, 3), (4, 3)]
        edges = pa.table({
            "src": pa.array([a for a, _ in e], pa.int64()),
            "dst": pa.array([b for _, b in e], pa.int64()),
        })
        got = analytics.hits_scores(rd.from_arrow(nodes), rounds=3, topn=3,
                                    edges=rd.from_arrow(edges))
        assert got["doc_id"].tolist()[:2] == [3, 2]
        assert int(got["auth_scaled"].iloc[0]) == 1_000_000
        # authorities point at nothing: their hub score is 0
        assert int(got["hub_scaled"].iloc[0]) == 0
        # the extra in-link strictly separates the two authorities
        assert got["auth_scaled"].tolist()[0] > got["auth_scaled"].tolist()[1]


class TestLangidKappa:
    def test_hand_confusion_arithmetic(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 8 docs, labels en/de; real heuristic is right on 6 (one doc per
        # label carries the other language's stopwords)
        en_txt = "the cat and the dog of it"
        de_txt = "der hund und die katze ist"
        t = pa.table({
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "lang": pa.array(["en"] * 4 + ["de"] * 4),
            "text": pa.array([en_txt, en_txt, en_txt, de_txt,
                              de_txt, de_txt, de_txt, en_txt]),
        })
        got = analytics.langid_kappa(rd.from_arrow(t))
        # N=8 A=6 E=4*4+4*4=32 -> kappa=(48-32)/(64-32)=0.5
        assert int(got["n_docs"].iloc[0]) == 8
        assert int(got["agree"].iloc[0]) == 6
        assert int(got["kappa_ppm"].iloc[0]) == 500_000

    def test_single_label_world_ships_zero(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # every label and prediction identical: den == 0 -> ships 0
        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": pa.array(["en", "en"]),
            "text": pa.array(["the cat and the dog"] * 2),
        })
        got = analytics.langid_kappa(rd.from_arrow(t))
        assert int(got["kappa_ppm"].iloc[0]) == 0


class TestKmvDistinctAudit:
    def test_underfilled_sketch_is_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 40 distinct values < k=256: the bottom set IS the population
        t = pa.table({"user_id": pa.array(list(range(40)) * 3, pa.int64())})
        got = analytics.kmv_distinct_audit(rd.from_arrow(t))
        assert int(got["exact_distinct"].iloc[0]) == 40
        assert int(got["kmv_distinct"].iloc[0]) == 40
        assert int(got["abs_err_ppm"].iloc[0]) == 0

    def test_filled_sketch_estimates_within_bound(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 5000 distinct >> k=256: estimator error ~1/sqrt(k) ~ 6%;
        # assert a generous 25% envelope (deterministic input, one value)
        t = pa.table({"user_id": pa.array(list(range(5000)), pa.int64())})
        got = analytics.kmv_distinct_audit(rd.from_arrow(t), k=256)
        est = int(got["kmv_distinct"].iloc[0])
        assert int(got["exact_distinct"].iloc[0]) == 5000
        assert 3750 <= est <= 6250


class TestKcoreNodes:
    def test_pendant_chain_peels_to_triangle(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # triangle {0,1,2} with pendant chain 2-3-4: peel 1 drops 4,
        # peel 2 drops 3; the 2-core is exactly the triangle
        nodes = pa.table({"doc_id": pa.array(list(range(5)), pa.int64())})
        e = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
        edges = pa.table({
            "src": pa.array([a for a, _ in e], pa.int64()),
            "dst": pa.array([b for _, b in e], pa.int64()),
        })
        got = (analytics.kcore_nodes(rd.from_arrow(nodes), k=2, rounds=4,
                                     edges=rd.from_arrow(edges))
               .to_pandas().sort_values("doc_id"))
        assert got["doc_id"].tolist() == [0, 1, 2]

    def test_tree_has_empty_two_core(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # a path graph is a tree: the 2-core is empty
        nodes = pa.table({"doc_id": pa.array(list(range(4)), pa.int64())})
        edges = pa.table({
            "src": pa.array([0, 1, 2], pa.int64()),
            "dst": pa.array([1, 2, 3], pa.int64()),
        })
        got = analytics.kcore_nodes(rd.from_arrow(nodes), k=2, rounds=4,
                                    edges=rd.from_arrow(edges)).to_pandas()
        assert len(got) == 0


class TestBoundaryStitchPaths:
    def test_driver_and_distributed_paths_agree(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # three records of one split page (A tail == B head == C head...)
        # plus an unrelated doc: one chain of 3
        docs = [
            "alpha bravo charlie delta echo",
            "delta echo foxtrot golf hotel",
            "golf hotel india juliet kilo",
            "zulu yankee xray whiskey victor",
        ]
        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(docs),
        })
        fast = analytics.boundary_stitch_chains(rd.from_arrow(t))
        slow = analytics.boundary_stitch_chains(rd.from_arrow(t),
                                                collect_cap_rows=0)
        assert fast.values.tolist() == [[3, 1]]
        assert slow.values.tolist() == fast.values.tolist()


class TestDedupClustersPaths:
    def test_driver_and_pointer_jumping_paths_agree(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # a 5-chain, a triangle, and a 2-cycle: min-id labels either path
        e = [(10, 11), (11, 12), (12, 13), (13, 14),
             (20, 21), (21, 22), (20, 22), (30, 31)]
        pairs = pa.table({
            "doc_a": pa.array([a for a, _ in e], pa.int64()),
            "doc_b": pa.array([b for _, b in e], pa.int64()),
        })
        fast = (analytics.dedup_clusters(rd.from_arrow(pairs))
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        slow = (analytics.dedup_clusters(rd.from_arrow(pairs),
                                         collect_cap_edges=0)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert fast["cluster_id"].tolist() == [10] * 5 + [20] * 3 + [30] * 2
        assert slow.values.tolist() == fast.values.tolist()


class TestEntityDedupeKeepers:
    def test_typo_neighborhood_canonicalizes(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # "smith"/"smyth"/"smiths" form one edit-1 neighborhood chain;
        # "jones" stands alone; canonical = lexicographic min member
        names = ["smith", "smyth", "smiths", "jones", "smith"]
        t = pa.table({"c_name": pa.array(names)})
        got = (analytics.entity_dedupe_keepers(rd.from_arrow(t), "c_name")
               .to_pandas().sort_values("name").reset_index(drop=True))
        m = dict(zip(got["name"], got["canonical"]))
        assert m == {"jones": "jones", "smith": "smith",
                     "smiths": "smith", "smyth": "smith"}


class TestHivePartitionPrune:
    def test_prunes_directories_and_matches_plain_scan(self, tmp_path):
        import datetime
        import os

        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.pipelines import analytics

        # 4 days of events, two in range; driver must see exactly those
        ts = pa.array([
            datetime.datetime(2024, 1, 9, 12), datetime.datetime(2024, 1, 10, 1),
            datetime.datetime(2024, 1, 19, 23), datetime.datetime(2024, 1, 20),
        ], pa.timestamp("us"))
        pq.write_table(pa.table({
            "ts": ts,
            "value": pa.array([1.0, 2.5, 3.0, 4.0]),
        }), tmp_path / "events.parquet")
        out = analytics.hive_partition_prune_daily(
            str(tmp_path), cache_root=str(tmp_path / "hive"))
        got = out.to_pandas().sort_values("day").reset_index(drop=True)
        assert got["day"].tolist() == ["2024-01-10", "2024-01-19"]
        assert got["value_cents"].tolist() == [250, 300]
        assert got["n_events"].tolist() == [1, 1]
        # the layout really is one directory per day
        root = tmp_path / "hive" / tmp_path.name / "events_by_day"
        days = sorted(d for d in os.listdir(root) if d.startswith("day="))
        assert len(days) == 4


class TestBloomPrunedJoin:
    def test_pruning_accounting_and_exactness(self, tmp_path):
        import pyarrow.parquet as pq
        import ray  # noqa: F401
        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.functions.bloom import BloomFilter
        from distributed_system___ocr_ray.pipelines import analytics

        # 3 urgent orders of 10; lineitems reference every order
        pq.write_table(pa.table({
            "o_orderkey": pa.array(list(range(10)), pa.int64()),
            "o_orderpriority": pa.array(
                ["1-URGENT" if i < 3 else "3-MEDIUM" for i in range(10)]),
        }), tmp_path / "orders.parquet")
        pq.write_table(pa.table({
            "l_orderkey": pa.array([i % 10 for i in range(40)], pa.int64()),
            "l_extendedprice": pa.array([100.0] * 40),
            "l_discount": pa.array([0.25] * 40),
        }), tmp_path / "lineitem.parquet")
        got = analytics.bloom_pruned_join_revenue(str(tmp_path))
        # 3 urgent orders x 4 lineitems each, 100 * 0.75 = 75.00 a line
        assert int(got["n_lineitems"].iloc[0]) == 12
        assert int(got["revenue_cents"].iloc[0]) == 12 * 7500
        # the filter really prunes: at 16 bits/key the 7 non-urgent keys
        # must not all pass (FP rate ~0.05%)
        bloom = BloomFilter.for_keys(3)
        bloom.add_many([str(i) for i in range(3)])
        hits = bloom.contains_many([str(i) for i in range(10)])
        assert hits[:3].all() and hits[3:].sum() == 0


class TestEncodingAdvisor:
    def test_exact_byte_arithmetic_and_verdicts(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # cat: 2 distinct 1-char values over 8 rows -> dict wins
        # uid: 8 unique 8-char values -> dict loses (dictionary overhead)
        t = pa.table({
            "cat": pa.array(["a", "b"] * 4),
            "uid": pa.array([f"uid{i:05d}" for i in range(8)]),
        })
        got = analytics.encoding_advisor(rd.from_arrow(t), ["cat", "uid"])
        g = got.set_index("column")
        assert int(g.loc["cat", "plain_bytes"]) == 8
        assert int(g.loc["cat", "dict_bytes"]) == 2 + 8 * 1
        assert int(g.loc["cat", "dict_wins"]) == 0  # 10 > 8: overhead
        assert int(g.loc["uid", "plain_bytes"]) == 64
        assert int(g.loc["uid", "dict_bytes"]) == 64 + 8 * 1
        assert int(g.loc["uid", "dict_wins"]) == 0


class TestLocalClusteringTopk:
    def test_hand_graph_coefficients(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # K4 on {0,1,2,3}: every node deg 3, 3 triangles each, lcc = 1.
        # Node 4 pends off 0: deg(0) grows to 4 with still 3 triangles.
        nodes = pa.table({"doc_id": pa.array(list(range(5)), pa.int64())})
        e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4)]
        edges_tbl = pa.table({
            "src": pa.array([a for a, _ in e], pa.int64()),
            "dst": pa.array([b for _, b in e], pa.int64()),
        })
        got = analytics.local_clustering_topk(
            rd.from_arrow(nodes), topn=5, edges=rd.from_arrow(edges_tbl))
        g = got.set_index("doc_id")
        assert int(g.loc[1, "lcc_ppm"]) == 1_000_000
        assert int(g.loc[1, "n_tri"]) == 3
        # node 0: 3 triangles over C(4,2)=6 wedge slots -> 500000 ppm
        assert int(g.loc[0, "deg"]) == 4
        assert int(g.loc[0, "lcc_ppm"]) == 500_000
        # node 4 (deg 1) is excluded
        assert 4 not in g.index


class TestRevenueAcf:
    def test_alternating_series_lag_signs(self, tmp_path):
        import datetime

        import pyarrow.parquet as pq
        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.pipelines import analytics

        # perfectly alternating daily revenue 1.00 / 3.00: acf(1) = -1,
        # acf(2) = +1 (up to the shrinking-overlap bias of the
        # full-series denominator), acf(k >= n) ships 0
        days = [datetime.date(2024, 1, d) for d in range(1, 7)]
        prices = [1.0, 3.0, 1.0, 3.0, 1.0, 3.0]
        pq.write_table(pa.table({
            "o_orderdate": pa.array(days, pa.date32()),
            "o_totalprice": pa.array(prices),
        }), tmp_path / "orders.parquet")
        got = analytics.revenue_acf(str(tmp_path), max_lag=6)
        g = dict(zip(got["lag"], got["acf_ppm"]))
        assert g[1] < -700_000 and g[2] > 600_000
        assert g[6] == 0  # no overlap at lag n
        # exact check of lag 1: d = n*x - S alternates +-6.00 (cents 600)
        # num = 5 * (-360000*100? ) -- rely on sign/magnitude envelope
        assert got["acf_ppm"].dtype == np.int64


class TestEventTypeStationary:
    def test_two_state_chain_converges_to_known_pi(self, tmp_path):
        import datetime

        import pyarrow.parquet as pq
        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.pipelines import analytics

        # one user's stream A A B A A B ...: transitions A->A, A->B, B->A
        # with counts giving P(A->A)=1/2, P(A->B)=1/2, P(B->A)=1 ->
        # stationary pi = (2/3, 1/3)
        seq = ["A", "A", "B"] * 20
        base = datetime.datetime(2024, 1, 1)
        pq.write_table(pa.table({
            "event_id": pa.array(list(range(len(seq))), pa.int64()),
            "ts": pa.array([base + datetime.timedelta(minutes=i)
                            for i in range(len(seq))], pa.timestamp("us")),
            "user_id": pa.array([1] * len(seq), pa.int64()),
            "event_type": pa.array(seq),
        }), tmp_path / "events.parquet")
        got = analytics.event_type_stationary(str(tmp_path))
        g = dict(zip(got["event_type"], got["pi_scaled"]))
        assert abs(int(g["A"]) - 666_666) <= 2_000
        assert abs(int(g["B"]) - 333_333) <= 2_000
        assert int(g["A"]) + int(g["B"]) <= 1_000_000


class TestLpaModularity:
    def test_two_cliques_score_high(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # two triangles joined by one bridge: LPA finds the two cliques;
        # hand arithmetic: m=7, communities d_c=(7,7), e_c=(3,3) ->
        # Q = (4*7*6 - 2*49) / (4*49) = 70/196 -> 357142 ppm
        nodes = pa.table({"doc_id": pa.array(list(range(6)), pa.int64())})
        e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        edges = pa.table({
            "src": pa.array([a for a, _ in e], pa.int64()),
            "dst": pa.array([b for _, b in e], pa.int64()),
        })
        got = analytics.lpa_modularity(rd.from_arrow(nodes),
                                       edges=rd.from_arrow(edges))
        assert int(got["m_edges"].iloc[0]) == 7
        assert int(got["n_communities"].iloc[0]) == 2
        assert int(got["modularity_ppm"].iloc[0]) == 357_142


class TestPprTop:
    def test_structure_and_topic_sensitivity(self, tmp_path):
        import pyarrow.parquet as pq
        import pytest
        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.pipelines import analytics

        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(120)), pa.int64()),
            "lang": pa.array(["en" if i % 3 == 0 else "de"
                              for i in range(120)]),
        }), tmp_path / "documents.parquet")
        en = analytics.ppr_top(str(tmp_path), topic_lang="en").to_pandas()
        de = analytics.ppr_top(str(tmp_path), topic_lang="de").to_pandas()
        for out in (en, de):
            assert len(out) == 20
            r = out["rank_scaled"].tolist()
            assert r == sorted(r, reverse=True)
            assert min(r) >= 0
        # different teleport sets rank differently (topic sensitivity)
        assert en["doc_id"].tolist() != de["doc_id"].tolist()
        with pytest.raises(ValueError):
            analytics.ppr_top(str(tmp_path), topic_lang="fr")


class TestBitextMining:
    def test_margin_separates_true_pairs_from_hubs(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd  # noqa: F401

        from distributed_system___ocr_ray.pipelines import analytics

        # en vec 0 has a clear de translation (1) and a far de (2);
        # en vec 3 sits exactly between two de vecs -> margin 0
        vecs = {
            0: [1.0, 0.0], 1: [0.9, 0.1], 2: [-1.0, 0.0],
            3: [0.0, 1.0], 4: [0.5, 1.0], 5: [-0.5, 1.0],
        }
        langs = {0: "en", 1: "de", 2: "de", 3: "en", 4: "de", 5: "de"}
        ids = sorted(vecs)
        pq.write_table(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([vecs[i] for i in ids],
                                  pa.list_(pa.float32())),
        }), tmp_path / "embeddings.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array([langs[i] for i in ids]),
        }), tmp_path / "documents.parquet")
        got = analytics.bitext_mining_topk(str(tmp_path))
        g = got.set_index("src_id")
        assert int(g.loc[0, "tgt_id"]) == 1
        # milli: dot(0,1)=900*1000... = 900000... margin vs best other
        assert int(g.loc[0, "margin_num"]) > 0
        # vec 3 dots: (4)->1e6, (5)->1e6 tie -> min id wins, margin 0
        assert int(g.loc[3, "tgt_id"]) == 4
        assert int(g.loc[3, "margin_num"]) == 0
        # ranking: the clear pair outranks the ambiguous one
        assert got["src_id"].tolist()[0] == 0


@pytest.mark.usefixtures("ray_session")
class TestNbSourceClassifier:
    def test_separable_micro_vs_pure_python(self, tmp_path):
        """Two perfectly separable sources; expected confusion computed by
        an independent pure-Python NB (same whole-bit formulas, no shared
        pipeline code beyond the md5 split kernel)."""
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        n = 40
        ids = list(range(n))
        src = ["a" if i % 2 == 0 else "b" for i in ids]
        txt = ["xx xx zq" if s == "a" else "yy yy zq" for s in src]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(src),
            "text": pa.array(txt),
        }))
        got = analytics.nb_source_classifier(ds)

        # independent replay
        train = [i for i in ids if md5_u64(f"{i}:nbsplit".encode()) % 10 < 8]
        test = [i for i in ids if i not in train]
        assert test, "deterministic split produced an empty test slice"
        from collections import Counter, defaultdict
        ct: dict[str, Counter] = defaultdict(Counter)
        nd = Counter()
        for i in train:
            nd[src[i]] += 1
            ct[src[i]].update(txt[i].split())
        vocab = sorted({t for c in ct.values() for t in c})
        V = len(vocab)
        labels = sorted(ct)
        conf = Counter()
        for i in test:
            toks = txt[i].split()
            best = None
            for s in labels:
                ns = sum(ct[s].values())
                cost = sum(((ns + V) // (ct[s].get(t, 0) + 1)).bit_length() - 1
                           for t in toks)
                cost += (len(train) // nd[s]).bit_length() - 1
                if best is None or (cost, s) < best:
                    best = (cost, s)
            conf[(src[i], best[1])] += 1
        exp = (
            pa.table({
                "actual": pa.array([k[0] for k in sorted(conf)]),
                "predicted": pa.array([k[1] for k in sorted(conf)]),
                "n_docs": pa.array([conf[k] for k in sorted(conf)], pa.int64()),
            }).to_pandas()
        )
        assert got.reset_index(drop=True).equals(exp)
        # separable corpus: every prediction is correct
        assert all(got["actual"] == got["predicted"])

    def test_vs_duckdb_replay_sf0001(self):
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        from distributed_system___ocr_ray.pipelines import analytics
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "source", "text"])
        got = analytics.nb_source_classifier(ds).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        exp = con.execute(
            entry_mod._nb_source_classifier_sql()).df()
        exp["n_docs"] = exp["n_docs"].astype(np.int64)
        assert got.equals(exp.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestCcnetBucketCounts:
    def test_hand_tertiles(self):
        """9 docs, one lang, scores forced distinct by token rarity;
        tertile thresholds split 3/3/3 by construction."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # doc i repeats a doc-unique token i times plus common filler so
        # mean bits strictly decreases with more common tokens; exact
        # per-doc scores are replayed below in pure python
        texts = [" ".join([f"u{i}"] + ["common"] * i) for i in range(9)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(9)), pa.int64()),
            "lang": pa.array(["en"] * 9),
            "text": pa.array(texts),
        }))
        got = analytics.ccnet_bucket_counts(ds)
        # pure-python replay
        toks = [t.split() for t in texts]
        from collections import Counter
        c = Counter(t for d in toks for t in d)
        N = sum(c.values())
        scores = sorted(
            (sum((N // c[t]).bit_length() - 1 for t in d) * 1000) // len(d)
            for d in toks)
        n = len(scores)
        t1 = scores[(n + 2) // 3 - 1]
        t2 = scores[(2 * n + 2) // 3 - 1]
        head = sum(s <= t1 for s in scores)
        mid = sum(t1 < s <= t2 for s in scores)
        exp = {"head": head, "middle": mid, "tail": n - head - mid}
        assert dict(zip(got["bucket"], got["n_docs"])) == exp
        assert list(got["lang"].unique()) == ["en"]
        assert int(got["n_docs"].sum()) == 9

    def test_vs_duckdb_replay_sf0001(self):
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
        got = analytics.ccnet_bucket_counts(ds)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        exp = con.execute(entry_mod._CCNET_BUCKET_SQL).df()
        exp["n_docs"] = exp["n_docs"].astype(np.int64)
        assert got.equals(exp.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestSoftDedupWeights:
    def test_planted_clusters_hand_weights(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # 3 copies of A, 2 of B, 1 of C -> weights 333333 / 500000 / 1000000
        txt = ["A", "A", "A", "B", "B", "C"]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(txt),
        }))
        got = analytics.soft_dedup_weights(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert got["cluster_size"].tolist() == [3, 3, 3, 2, 2, 1]
        assert got["weight_ppm"].tolist() == [333333] * 3 + [500000] * 2 + [1000000]
        # cluster contribution never exceeds one doc's worth
        assert (got["cluster_size"] * got["weight_ppm"] <= 1_000_000).all()

    def test_vs_duckdb_sf0001(self):
        import duckdb
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = analytics.soft_dedup_weights(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        exp = duckdb.sql(f"""
            WITH c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n
                       FROM read_parquet('{SF}/documents.parquet') GROUP BY text)
            SELECT d.doc_id, c.n AS cluster_size,
                   CAST(1000000 // c.n AS BIGINT) AS weight_ppm
            FROM read_parquet('{SF}/documents.parquet') d
            JOIN c ON c.text = d.text ORDER BY d.doc_id
        """).df()
        for c in ("doc_id", "cluster_size", "weight_ppm"):
            exp[c] = exp[c].astype(np.int64)
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestBinaryHammingTopk:
    def test_orthant_planted_recall(self):
        """Vectors planted in two orthants: sign bits separate them
        perfectly, so binary recall@k is 100% for a same-orthant query."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        rng = np.random.RandomState(5)
        d = 64
        # 10 vectors near +1 orthant, 30 near mixed random orthants
        plus = np.abs(rng.randn(10, d)) + 0.5
        noise = rng.randn(30, d) * 2
        E = np.vstack([plus, noise])
        E = E / np.linalg.norm(E, axis=1, keepdims=True)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(list(range(40)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in E],
                                  pa.list_(pa.float32())),
        }))
        q = E[:1]  # first planted vector queries its own cluster
        got = analytics.binary_hamming_topk(ds, q, k=10).to_pandas()
        assert len(got) == 1
        # all-positive query: binary + exact top-10 are both inside the
        # planted orthant -> perfect agreement
        assert int(got["recall_ppm"].iloc[0]) == 1_000_000
        assert int(got["n_overlap"].iloc[0]) == 10

    def test_vs_duckdb_sf0001(self):
        import sys

        import duckdb
        import ray.data as rd

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = analytics.binary_hamming_topk(
            ds, entry_mod._query_matrix(SF)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{SF}/embeddings.parquet')")
        exp = con.execute(entry_mod._BINARY_HAMMING_SQL).df()
        for c in exp.columns:
            exp[c] = exp[c].astype(np.int64)
        assert got.reset_index(drop=True).equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestFilterImpactAudit:
    def test_hand_built_disparity(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions import textstats as ts_mod
        from distributed_system___ocr_ray.pipelines import analytics

        # lang 'hi' docs pass, lang 'lo' docs fail: threshold between the
        # two measured scores -> impact ratio 0 for 'lo', flag raised
        good = "the and for with that this " * 30   # long, stopword-rich
        bad = "zz"                                   # short, no stopwords
        q_good = int(ts_mod.quality_features(
            __import__("pandas").Series([good]))["quality_ppm"].iloc[0])
        q_bad = int(ts_mod.quality_features(
            __import__("pandas").Series([bad]))["quality_ppm"].iloc[0])
        assert q_bad < q_good
        thr = (q_bad + q_good) // 2
        ds = rd.from_arrow(pa.table({
            "lang": pa.array(["hi"] * 4 + ["lo"] * 4),
            "text": pa.array([good] * 4 + [bad] * 4),
        }))
        got = analytics.filter_impact_audit(ds, threshold_ppm=thr)
        r = got.set_index("lang")
        assert r.loc["hi", "pass_rate_ppm"] == 1_000_000
        assert r.loc["hi", "impact_ratio_ppm"] == 1_000_000
        assert int(r.loc["hi", "flag_disparate"]) == 0
        assert r.loc["lo", "pass_rate_ppm"] == 0
        assert int(r.loc["lo", "flag_disparate"]) == 1

    def test_uniform_rejection_no_disparity(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "lang": pa.array(["a", "b"] * 3),
            "text": pa.array(["zz"] * 6),
        }))
        got = analytics.filter_impact_audit(ds, threshold_ppm=999_999)
        assert (got["pass_rate_ppm"] == 0).all()
        assert (got["impact_ratio_ppm"] == 1_000_000).all()
        assert (got["flag_disparate"] == 0).all()

    def test_vs_duckdb_sf0001(self):
        import sys

        import duckdb
        import ray.data as rd

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
        got = analytics.filter_impact_audit(ds)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        exp = con.execute(entry_mod._filter_impact_sql()).df()
        for c in exp.columns[1:]:
            exp[c] = exp[c].astype(np.int64)
        assert got.equals(exp.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestTexttilingBoundaries:
    def test_hand_built_topic_shift(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # doc 0: two 20-token blocks with DISJOINT vocab -> cos2 = 0,
        # one boundary. doc 1: identical blocks -> cos2 = 1e6, none.
        # doc 2: single short block -> no gaps, min pinned to 1e6.
        a = " ".join(["aa"] * 20 + ["bb"] * 20)
        b = " ".join(["cc"] * 40)
        c = "dd dd"
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([a, b, c]),
        }))
        got = analytics.texttiling_boundaries(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert got.loc[0].tolist() == [0, 2, 1, 1, 0]
        assert got.loc[1].tolist() == [1, 2, 1, 0, 1_000_000]
        assert got.loc[2].tolist() == [2, 1, 0, 0, 1_000_000]

    def test_half_overlap_exact_cos2(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # blocks [aa x10, bb x10] and [bb x10, cc x10]: dot = 100,
        # norms 200 each -> cos2 = 10000*1e6 // 40000 = 250000, NOT a
        # boundary at the strict < 250000 rule
        t = " ".join(["aa"] * 10 + ["bb"] * 20 + ["cc"] * 10)
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([7], pa.int64()), "text": pa.array([t])}))
        got = analytics.texttiling_boundaries(ds).to_pandas()
        assert int(got["min_cos2_ppm"].iloc[0]) == 250_000
        assert int(got["n_boundaries"].iloc[0]) == 0

    def test_vs_duckdb_sf0001(self):
        import sys

        import duckdb
        import ray.data as rd

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        got = analytics.texttiling_boundaries(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        exp = con.execute(entry_mod._TEXTTILING_SQL).df()
        for c in exp.columns:
            exp[c] = exp[c].astype(np.int64)
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestSimhashDupClusters:
    def test_planted_near_dups_cluster_together(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        base = ("the quick brown fox jumps over the lazy dog while the "
                "cat sleeps on the warm mat near the door frame today")
        near = base.replace("today", "tonight")
        other = ("completely different words about databases indexes "
                 "shuffles partitions and columnar storage engines here")
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, near, other]),
        }))
        pairs = analytics.simhash_pairs(ds, max_hamming=3)
        out = analytics.dedup_clusters(pairs).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got.get(1) == 1 and got.get(2) == 1
        assert 3 not in got  # no edges -> not in the pair graph


@pytest.mark.usefixtures("ray_session")
class TestAnfEffectiveDiameter:
    def test_directed_cycle_exact_growth(self, tmp_path):
        """Independent pure-python replay (hashlib + math only): true
        min-hop balls of the derived graph, HLL-estimated with the same
        register/estimator ladder -- checks propagation end to end."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        n = 12
        pq.write_table(pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}),
                       tmp_path / "documents.parquet")
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"),
                             columns=["doc_id"])
        got = analytics.anf_effective_diameter(ds, max_h=4)
        # independent truth: rebuild the derived edges, BFS every node
        edges: dict[int, set] = {u: set() for u in range(n)}
        for u in range(n):
            d = 1 + md5_u64(f"{u}:deg".encode()) % 3
            for j in range(d):
                t = md5_u64(f"{u}:link:{j}".encode()) % n
                if t != u:
                    edges[u].add(t)
        import hashlib
        import math

        def hll_est(members):
            # independent pure-python HLL (hashlib + math only)
            m = 64
            regs = [0] * m
            for u in members:
                h = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big")
                idx = h >> 58
                rest = ((h << 6) | 63) & ((1 << 64) - 1)
                regs[idx] = max(regs[idx], 64 - rest.bit_length() + 1)
            alpha = 0.7213 / (1 + 1.079 / m)
            num = sum(1 << (64 - r) for r in regs)
            est = alpha * m * m * 2.0 ** 64 / float(num)
            zeros = regs.count(0)
            if est <= 2.5 * m and zeros:
                est = m * math.log(m / zeros)
            return int(math.floor(est + 0.5))

        exp = []
        balls = {u: {u} for u in range(n)}
        exp.append(sum(hll_est(b) for b in balls.values()))
        for _ in range(4):
            balls = {u: balls[u] | set().union(*(balls[t] for t in edges[u]))
                     if edges[u] else set(balls[u]) for u in range(n)}
            exp.append(sum(hll_est(b) for b in balls.values()))
        assert got["pairs_est"].tolist() == exp
        assert int(got["pairs_est"].iloc[0]) == n  # 12 singleton balls, no
        # collision inside a 1-element sketch: h=0 is exact
        assert got["is_effective_diameter"].sum() == 1

    def test_monotone_and_flagged_knee(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        got = analytics.anf_effective_diameter(ds, max_h=3)
        v = got["pairs_est"].tolist()
        assert v == sorted(v)  # balls only grow
        assert int(got["frac_ppm"].iloc[-1]) == 1_000_000
        assert got.loc[got["is_effective_diameter"] == 1, "frac_ppm"].iloc[0] >= 0

    def test_fast_and_distributed_paths_agree(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        fast = analytics.anf_effective_diameter(ds, max_h=3)
        slow = analytics.anf_effective_diameter(ds, max_h=3,
                                                force_distributed=True)
        assert fast.equals(slow)


@pytest.mark.usefixtures("ray_session")
class TestQualityNeardupAuc:
    def test_hand_auc_with_ties(self):
        """Planted pairs + hand scores: AUC computed independently with
        the average-rank tie convention."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # scores (quality_ppm is monotone in n_chars here): make 2 docs
        # that pair (identical long text) and 3 singles of varying length
        dup = "the and for with that this " * 10
        texts = [dup, dup, "zz", "one two three four five six " * 5,
                 "seven eight nine ten eleven twelve " * 20]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "text": pa.array(texts),
        }))
        got = analytics.quality_neardup_auc(ds, threshold=0.5)
        assert int(got["n_pos"].iloc[0]) == 2
        assert int(got["n_neg"].iloc[0]) == 3
        # independent AUC: rank-sum with average ranks over exact scores
        from distributed_system___ocr_ray.functions import textstats as tsm
        import pandas as pd_

        s = tsm.quality_features(pd_.Series(texts))["quality_ppm"].tolist()
        lab = [1, 1, 0, 0, 0]
        import itertools
        u2 = 0
        for (si, li), (sj, lj) in itertools.product(zip(s, lab), repeat=2):
            if li == 1 and lj == 0:
                u2 += 2 if si > sj else (1 if si == sj else 0)
        exp = u2 * 1_000_000 // (2 * 2 * 3)
        assert int(got["auc_ppm"].iloc[0]) == exp

    def test_no_pairs_pins_uninformative(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["completely unrelated alpha words here",
                              "different beta tokens entirely now"]),
        }))
        got = analytics.quality_neardup_auc(ds)
        assert int(got["n_pos"].iloc[0]) == 0
        assert int(got["auc_ppm"].iloc[0]) == 500_000


@pytest.mark.usefixtures("ray_session")
class TestBm25PrfTopk:
    def test_expansion_recalls_synonym_doc(self):
        """A doc sharing NO query term but sharing expansion vocabulary
        with the feedback docs becomes retrievable only through PRF."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        docs = [
            "hash join table grace partitioning buckets",   # matches query
            "hash join table grace spill buckets",          # matches query
            "grace partitioning spill buckets algorithm",   # synonym doc: 0 query terms
            "flowers rain garden sunshine",
            "violin cello piano trumpet",
            "mountain river forest valley",
            "copper iron nickel zinc",
            "monday tuesday wednesday thursday",
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(docs),
        }))
        base = analytics.bm25_topk(ds, ["hash join table"], k=4).to_pandas()
        prf = analytics.bm25_prf_topk(ds, ["hash join table"], k=4,
                                      fb_docs=2, fb_terms=3).to_pandas()
        assert 2 not in set(base["doc_id"])   # invisible to plain BM25
        assert 2 in set(prf["doc_id"])        # recalled via expansion
        assert set(prf["doc_id"]) == {0, 1, 2}  # noise stays out

    def test_no_feedback_degenerates_to_plain_bm25(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta"]),
        }))
        prf = analytics.bm25_prf_topk(ds, ["zzz qqq"], k=2).to_pandas()
        base = analytics.bm25_topk(ds, ["zzz qqq"], k=2).to_pandas()
        assert prf.equals(base)

    def test_vs_duckdb_sf0001(self):
        import sys

        import duckdb

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        from distributed_system___ocr_ray.pipelines import analytics

        got = analytics.bm25_prf_topk(
            entry_mod._docs(SF, ["doc_id", "text"]),
            entry_mod._BM25_QUERIES).to_pandas().sort_values(
            ["query_id", "doc_id"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        exp = con.execute(entry_mod._bm25_prf_sql() +
                          " ORDER BY query_id, doc_id").df()
        for c in exp.columns:
            exp[c] = exp[c].astype(np.int64)
        for c in got.columns:
            got[c] = got[c].astype(np.int64)
        assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestClusterBalancedSample:
    def test_quota_and_coverage(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = analytics.cluster_balanced_sample(ds, per_cluster=8).to_pandas()
        per = got.groupby("cluster_id").size()
        assert (per <= 8).all()
        # the balanced draw covers every non-empty cluster
        clusters = analytics.kmeans_clusters(ds).to_pandas()
        assert set(per.index) == set(clusters["cluster_id"])
        # quota met wherever the cluster is big enough
        sizes = dict(zip(clusters["cluster_id"], clusters["n_vecs"]))
        for cid, n in per.items():
            assert n == min(8, sizes[cid])
        assert got["vec_id"].is_unique

    def test_partition_invariance(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds1 = rd.read_parquet(f"{SF}/embeddings.parquet")
        ds2 = rd.read_parquet(f"{SF}/embeddings.parquet",
                              override_num_blocks=7)
        a = analytics.cluster_balanced_sample(ds1).to_pandas()
        b = analytics.cluster_balanced_sample(ds2).to_pandas()
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
class TestWinnowDupClusters:
    def test_shared_passage_clusters(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        passage = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                   "lam mu nu xi omicron pi rho sigma tau upsilon phi chi "
                   "psi omega one two three four five six")
        a = passage + " seven eight nine ten"
        b = "intro words first " + passage
        c = " ".join(f"w{i}" for i in range(40))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([a, b, c]),
        }))
        pairs = analytics.winnow_fingerprint_pairs(ds)
        out = analytics.dedup_clusters(pairs).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got.get(1) == 1 and got.get(2) == 1
        assert 3 not in got


@pytest.mark.usefixtures("ray_session")
class TestDedupFamilyAgreement:
    def test_planted_dup_all_families_agree(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        words = [f"tok{i}" for i in range(120)]
        base = " ".join(words)
        near = " ".join(words + ["extra"])
        other = " ".join(f"q{i}" for i in range(120))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, near, other]),
        }))
        got = analytics.dedup_family_agreement(ds)
        # default family set is the three sub-linear generators (exact
        # ngram demoted to opt-in, VERDICT r4 #1) -> 3 combo rows
        assert len(got) == 3
        assert list(got.columns) == ["family_a", "family_b", "n_a", "n_b",
                                     "n_common", "jaccard_ppm"]
        assert "ngram" not in set(got["family_a"]) | set(got["family_b"])
        # the planted near-identical pair is found by every family, so
        # every combo agrees perfectly (or is vacuously empty-vs-empty)
        assert (got["jaccard_ppm"] == 1_000_000).all()
        assert (got["n_common"] >= 1).all()
        # opt-in exact audit restores the 4-family (6-row) comparison
        got6 = analytics.dedup_family_agreement(ds, include_ngram=True)
        assert len(got6) == 6
        assert "ngram" in set(got6["family_a"]) | set(got6["family_b"])
        assert (got6["jaccard_ppm"] == 1_000_000).all()

    def test_sf0001_structure(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = analytics.dedup_family_agreement(ds)
        assert len(got) == 3
        assert (got["n_common"] <= got[["n_a", "n_b"]].min(axis=1)).all()
        assert got["jaccard_ppm"].between(0, 1_000_000).all()

    def test_ngram_scale_guard_raises(self):
        """The exact AllPairs generator refuses corpora past its cap,
        naming the MinHash substitution (the collect_bounded loud-raise
        convention applied to compute scale)."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma delta", "alpha beta gamma"]),
        }))
        with pytest.raises(analytics.ExactPairScaleExceeded) as ei:
            analytics.ngram_jaccard_pairs(ds, max_corpus_docs=1)
        assert "minhash_lsh_pairs" in str(ei.value)
        # None opts out of the guard entirely
        analytics.ngram_jaccard_pairs(ds, max_corpus_docs=None)


@pytest.mark.usefixtures("ray_session")
class TestAmsF2Audit:
    def test_hand_arithmetic_and_error_envelope(self):
        import ray.data as rd

        from distributed_system___ocr_ray.functions.dedup import md5_u64
        from distributed_system___ocr_ray.pipelines import analytics

        # counts: aa x3, bb x2, cc x1 -> F2 = 9 + 4 + 1 = 14
        ds = rd.from_arrow(pa.table({
            "text": pa.array(["aa aa bb", "aa bb cc"]),
        }))
        got = analytics.ams_f2_audit(ds)
        assert int(got["f2_exact"].iloc[0]) == 14
        # independent replay of estimator 0..16 with hashlib-backed signs
        c = {"aa": 3, "bb": 2, "cc": 1}
        s2 = sorted(
            sum((1 if md5_u64(f"ams:{j}:{t}".encode()) % 2 == 1 else -1) * n
                for t, n in c.items()) ** 2
            for j in range(17))
        assert int(got["f2_est"].iloc[0]) == s2[8]
        assert int(got["err_ppm"].iloc[0]) == \
            abs(s2[8] - 14) * 1_000_000 // 14

    def test_single_token_stream_is_exact(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # one distinct token: every estimator is (+-n)^2 = n^2 = F2 exactly
        ds = rd.from_arrow(pa.table({"text": pa.array(["zz zz zz zz"])}))
        got = analytics.ams_f2_audit(ds)
        assert int(got["f2_exact"].iloc[0]) == 16
        assert int(got["f2_est"].iloc[0]) == 16
        assert int(got["err_ppm"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
class TestUnigramPowerSamplePlan:
    def test_hand_weights(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # counts: aa x16 -> w = floor(sqrt(16*4)) = 8; bb x4 -> floor(
        # sqrt(4*2)) = 2; cc x1 -> 1. shares over sum 11.
        ds = rd.from_arrow(pa.table({
            "text": pa.array(["aa " * 16 + "bb " * 4 + "cc"]),
        }))
        got = analytics.unigram_power_sample_plan(ds)
        r = got.set_index("token")
        assert r.loc["aa", "weight"] == 8
        assert r.loc["bb", "weight"] == 2
        assert r.loc["cc", "weight"] == 1
        assert r.loc["aa", "target_share_ppm"] == 8 * 1_000_000 // 11
        # smoothing: aa is 16x cc by count but only 8x by weight
        assert r.loc["aa", "n"] == 16 * r.loc["cc", "n"]
        assert r.loc["aa", "weight"] == 8 * r.loc["cc", "weight"]


@pytest.mark.usefixtures("ray_session")
class TestChao1:
    def test_hand_arithmetic(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # tokens: a x5, b x1, c x1, d x2, e x2, f x3
        texts = ["a a b", "a a d", "a c d e", "e f f f"]
        out = analytics.chao1_vocab_estimate(
            rd.from_items([{"text": t} for t in texts]))
        row = out.iloc[0]
        # counts: a=5 b=1 c=1 d=2 e=2 f=3 -> V=6, f1=2, f2=2, N=14
        assert row["v_obs"] == 6 and row["f1"] == 2 and row["f2"] == 2
        assert row["v_chao1"] == 6 + 2 * 1 // (2 * 3)  # == 6
        assert row["coverage_ppm"] == (14 - 2) * 10**6 // 14

    def test_all_singletons(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        out = analytics.chao1_vocab_estimate(
            rd.from_items([{"text": "q w e r t y"}]))
        row = out.iloc[0]
        # V=6, f1=6, f2=0 -> chao1 = 6 + 6*5//2 = 21; coverage 0
        assert row["v_chao1"] == 21 and row["coverage_ppm"] == 0


@pytest.mark.usefixtures("ray_session")
class TestGopherFlags:
    def test_hand_arithmetic(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        long_good = " ".join(["the"] * 5 + ["word"] * 55)  # 60 words, mwl fine
        short = "tiny the and doc"                          # 4 words: fails count
        symbolic = " ".join(["the", "and"] + ["#"] * 20 + ["pad"] * 50)
        ds = rd.from_items([
            {"doc_id": 1, "text": long_good},
            {"doc_id": 2, "text": short},
            {"doc_id": 3, "text": symbolic},
        ])
        out = (analytics.gopher_quality_flags(ds).to_pandas()
               .set_index("doc_id").sort_index())
        assert out.loc[1, "keep"] == 1
        assert out.loc[2, "f_word_count"] == 0 and out.loc[2, "keep"] == 0
        # 20 '#' among 72 words: 200 > 72 -> symbol flag fails
        assert out.loc[3, "f_symbol_ratio"] == 0 and out.loc[3, "keep"] == 0
        # mean word length: 60 words of lens (3*5 + 4*55)=235 chars -> 391 ok
        assert out.loc[1, "f_mean_word_len"] == 1


@pytest.mark.usefixtures("ray_session")
class TestMattr:
    def test_hand_arithmetic_small_and_windowed(self):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import analytics

        # doc A: 4 tokens, 3 distinct -> single window: 3e6 // 4 = 750000
        # doc B: 30 tokens of 'a b' repeated -> every 25-window has 2
        #        distinct -> sum = 2 * 6 windows; ppm = 12e6 // (25*6) = 80000
        ds = rd.from_items([
            {"lang": "en", "text": "a b a c"},
            {"lang": "en", "text": " ".join(["a b"] * 15)},
            {"lang": "zz", "text": ""},  # zero tokens: excluded entirely
        ])
        out = analytics.mattr_by_lang(ds).set_index("lang")
        assert "zz" not in out.index
        assert out.loc["en", "n_docs"] == 2
        assert out.loc["en", "mean_mattr_ppm"] == (750000 + 80000) // 2
