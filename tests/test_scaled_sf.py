"""tools/make_scaled_sf.py: the 10x/100x sweep corpus builder's invariants."""

import collections
import hashlib
import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SRC = "/root/testdata/sf0.001"


def _build(tmp_path, s=3):
    from make_scaled_sf import build_scaled_sf

    out = str(tmp_path / f"x{s}")
    build_scaled_sf(SRC, out, s)
    return out


class TestScaledSf:
    def test_row_counts_scale_exactly(self, tmp_path):
        out = _build(tmp_path)
        for t in ("customer", "orders", "lineitem", "events", "documents",
                  "embeddings", "supplier", "part"):
            src_n = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
            got_n = pq.read_metadata(os.path.join(out, f"{t}.parquet")).num_rows
            assert got_n == 3 * src_n, t
        for t in ("region", "nation"):  # fixed dimensions
            src_n = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
            assert pq.read_metadata(os.path.join(out, f"{t}.parquet")).num_rows == src_n

    def test_deterministic(self, tmp_path):
        a, b = _build(tmp_path / "a"), _build(tmp_path / "b")
        for t in ("documents", "embeddings", "lineitem"):
            ha = hashlib.md5(open(os.path.join(a, f"{t}.parquet"), "rb").read()).hexdigest()
            hb = hashlib.md5(open(os.path.join(b, f"{t}.parquet"), "rb").read()).hexdigest()
            assert ha == hb, t

    def test_token_counts_preserved_per_stratum(self, tmp_path):
        out = _build(tmp_path)
        src = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
        got = pq.read_table(os.path.join(out, "documents.parquet")).to_pandas()
        rep2 = got[(got.doc_id >= 2 * 10**8) & (got.doc_id < 3 * 10**8)]

        def vocab(df, lang, source):
            c = collections.Counter()
            for x in df[(df.lang == lang) & (df.source == source)]["text"]:
                c.update(x.split())
            return c

        # sf0.001 strata are tiny, so the builder widens to lang-only
        # strata: per-LANG token counts are the exact invariant here
        def lang_vocab(df, lang):
            c = collections.Counter()
            for x in df[df.lang == lang]["text"]:
                c.update(x.split())
            return c

        lang = src["lang"].iloc[0]
        assert lang_vocab(src, lang) == lang_vocab(rep2, lang)

    def test_embeddings_orthogonal_transform(self, tmp_path):
        out = _build(tmp_path)
        src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
        got = pq.read_table(os.path.join(out, "embeddings.parquet"))
        n = src.num_rows
        m0 = np.array(src.column("embedding").to_pylist())
        m1 = np.array(got.column("embedding").to_pylist()[n:2 * n])
        # norms (and hence all within-replica distances) preserved exactly
        assert np.allclose(np.linalg.norm(m0, axis=1),
                           np.linalg.norm(m1, axis=1), atol=1e-4)
        # but vectors themselves moved (no cosine-1.0 cross-replica pairs)
        cos = (m0 * m1).sum(1) / np.maximum(
            np.linalg.norm(m0, axis=1) * np.linalg.norm(m1, axis=1), 1e-9)
        assert np.max(np.abs(cos)) < 0.9

    def test_replicas_not_near_dups(self, tmp_path):
        out = _build(tmp_path)
        src = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
        got = pq.read_table(os.path.join(out, "documents.parquet")).to_pandas()
        rep1 = got[(got.doc_id >= 10**8) & (got.doc_id < 2 * 10**8)]

        def shingles(x):
            w = x.split()
            return set(tuple(w[i:i + 3]) for i in range(len(w) - 2))

        js = []
        for i in range(min(40, len(src))):
            a, b = shingles(src["text"].iloc[i]), shingles(rep1["text"].iloc[i])
            js.append(len(a & b) / max(1, len(a | b)))
        assert max(js) < 0.3  # replica-vs-origin stays below pair thresholds
