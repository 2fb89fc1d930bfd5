"""Deterministic S-times scale-up of a testdata sf directory.

Builds the input for the 10x scale-evidence sweep (VERDICT r3 "next round"
#1): every table grows by an integer factor S while the WORKLOAD SHAPE is
preserved, so the true output of each sweep query grows ~linearly and any
super-linear wall growth measured by tools/scale_sweep.py is attributable
to the ENGINE, not to the data construction. No external data: everything
derives from the source sf directory by arithmetic.

Per-table scheme (replica r = 0 is the original, byte-identical):

- region / nation: fixed dimensions, copied as-is (how TPC-H itself
  scales -- more facts, same small dimensions).
- customer / supplier / part / orders / lineitem / events: replica r adds
  disjoint key offsets (r * 10^k per key domain, offsets chosen as
  multiples of 40 so the wrap generator's doc_id-arithmetic branch rates
  -- i%2 pdf spans, (i+k)%20 broken refs, i%40 corruption -- are preserved
  exactly). Join fan-outs per key are therefore constant: S-times the
  orders, same lineitems per order, same events per user.
- embeddings: replica r applies a seeded orthogonal transform (dimension
  permutation + sign flips): norms and all WITHIN-replica pairwise
  distances are exactly preserved (same cluster geometry, S-times the
  clusters), while cross-replica vectors are generically far -- exact-copy
  replication would instead mint S^2 cosine-1.0 near-dup pairs per vector
  and blow up every embedding pair query super-linearly by construction.
- documents: replica r reassigns 8-word chunks across docs WITHIN each
  (lang, source) stratum via a stride permutation (perm(j) = (a_r*j + b_r)
  mod M with a_r coprime to M): per-stratum token counts are EXACTLY
  preserved (same chunk multiset) and each doc keeps its chunk count (same
  length distribution), but scattered chunks mean a replica doc shares at
  most a shingle-run or two with any other doc -- exact-copy replication
  would multiply duplicate-group sizes by S and grow shingle-pair outputs
  ~S^2, polluting the engine-growth signal with workload growth.

Usage::

    PYTHONPATH=/root/repo python tools/make_scaled_sf.py SRC_DIR OUT_DIR S
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES_COPY = ["region", "nation"]
# key offsets per replica: multiples of 40 (wrap branch-rate preservation)
KEY_OFFSETS = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7, "l_suppkey": 10**6},
    "events": {"event_id": 10**9, "user_id": 10**7},
}
DOC_ID_OFFSET = 10**8  # multiple of 40: parity/mod-20/mod-40 wrap rates survive
ROW_GROUP = 65536


def _offset_replicas(tbl: pa.Table, offsets: dict[str, int], s: int) -> pa.Table:
    import pyarrow.compute as pc

    reps = [tbl]
    for r in range(1, s):
        cols = []
        for name in tbl.column_names:
            c = tbl.column(name)
            if name in offsets:
                c = pc.add(c, offsets[name] * r)
            cols.append(c)
        reps.append(pa.table(dict(zip(tbl.column_names, cols))))
    return pa.concat_tables(reps)


def _scale_embeddings(tbl: pa.Table, s: int) -> pa.Table:
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    d = mat.shape[1]
    vec_ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    labels = tbl.column("label")
    reps = [tbl]
    for r in range(1, s):
        rng = np.random.RandomState(1000 + r)
        perm = rng.permutation(d)
        signs = rng.choice([-1.0, 1.0], size=d).astype(np.float32)
        m = mat[:, perm] * signs  # orthogonal: distances preserved in-replica
        reps.append(pa.table({
            "vec_id": pa.array(vec_ids + r * 10**7, pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": labels,
        }))
    return pa.concat_tables(reps)


def _chunks(words: list[str], k: int = 8) -> list[list[str]]:
    return [words[i:i + k] for i in range(0, len(words), k)] or [[]]


def _coprime_stride(m: int, r: int) -> int:
    import math

    a = max(2, (m * 2 // 3) + 2 * r + 1)
    while math.gcd(a, m) != 1:
        a += 1
    return a


def _scale_documents(tbl: pa.Table, s: int, min_stratum: int = 30) -> pa.Table:
    import pandas as pd

    df = tbl.to_pandas()
    # adaptive stratification: (lang, source) preserves per-source token
    # counts exactly, but a TINY stratum (few docs -> few chunks) lets the
    # stride permutation land a doc's chunks mostly back on itself,
    # minting near-dup replicas -- exactly what the scheme must avoid.
    # Below min_stratum docs per stratum, widen to lang-only strata
    # (per-LANG token counts stay exact; per-source approximate).
    sizes = df.groupby(["lang", "source"]).size()
    strata = ["lang", "source"] if sizes.min() >= min_stratum else ["lang"]
    reps = [tbl]
    for r in range(1, s):
        new_texts = np.empty(len(df), dtype=object)
        for _, idx in df.groupby(strata).groups.items():
            idx = np.asarray(idx)
            pool: list[list[str]] = []
            counts: list[int] = []
            for text in df["text"].iloc[idx]:
                cs = _chunks(text.split())
                pool.extend(cs)
                counts.append(len(cs))
            m = len(pool)
            a, b = _coprime_stride(m, r), (r * 17) % m
            order = [(a * j + b) % m for j in range(m)]
            pos = 0
            for row_i, n in zip(idx, counts):
                take = order[pos:pos + n]
                pos += n
                new_texts[row_i] = " ".join(
                    w for j in take for w in pool[j])
        rep = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64) + r * DOC_ID_OFFSET,
            "text": new_texts,
            "lang": df["lang"],
            "source": df["source"],
            "n_chars": [len(t) for t in new_texts],
        })
        reps.append(pa.Table.from_pandas(rep, preserve_index=False)
                    .cast(tbl.schema.remove_metadata()))
    return pa.concat_tables([t.replace_schema_metadata(None) for t in reps])


def build_scaled_sf(src_dir: str, out_dir: str, s: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES_COPY:
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(out_dir, f"{t}.parquet"))
    for t, offsets in KEY_OFFSETS.items():
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        pq.write_table(_offset_replicas(tbl, offsets, s),
                       os.path.join(out_dir, f"{t}.parquet"),
                       row_group_size=ROW_GROUP)
    emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    pq.write_table(_scale_embeddings(emb, s),
                   os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=ROW_GROUP)
    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    pq.write_table(_scale_documents(docs, s),
                   os.path.join(out_dir, "documents.parquet"),
                   row_group_size=ROW_GROUP)


def main() -> int:
    src, out, s = sys.argv[1], sys.argv[2], int(sys.argv[3])
    build_scaled_sf(src, out, s)
    for f in sorted(os.listdir(out)):
        m = pq.read_metadata(os.path.join(out, f))
        print(f, m.num_rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
