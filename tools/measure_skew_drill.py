"""Reassembly skew drill (VERDICT r4 #5 / SURVEY 7.1 item 6's fixture).

Fixture: ONE pathological document with ``--hot-spans`` spans (default
100k) hidden among ``--docs`` small documents (default 1M, 3 spans each),
already exploded/extracted (the reassembly stage's input shape). Runs the
plain ``reassemble`` and the two-level ``reassemble_salted`` over the SAME
input in one Ray session and reports, per path:

- wall seconds (consume via count-only iteration -- no driver collect),
- the groupby/map_groups stage's peak per-group row count (the skew
  pressure a single reducer absorbs: for the salted path stage 1 bounds
  this to ~hot/S),
- output equality hash (both paths must produce identical bytes).

Usage::

    PYTHONPATH=/root/repo python tools/measure_skew_drill.py \
        [--docs 1000000] [--hot-spans 100000] [--salts 4] [--cpus 32]

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_skewed_input(n_docs: int, hot_spans: int, num_partitions: int = 64):
    """Exploded-span table: n_docs small docs (3 spans) + doc 0 with
    hot_spans spans. Same columns extraction emits."""
    import numpy as np
    import pyarrow as pa

    small_ids = np.repeat(np.arange(1, n_docs + 1, dtype=np.int64), 3)
    hot_ids = np.zeros(hot_spans, dtype=np.int64)
    doc_id = np.concatenate([small_ids, hot_ids])
    offset = np.concatenate([
        np.tile(np.arange(3, dtype=np.int32), n_docs),
        np.arange(hot_spans, dtype=np.int32),
    ])
    # part = hash(doc_id) % P -- same siphash-free stand-in the drill needs:
    # what matters is all spans of a doc share a part (use multiplicative)
    part = ((doc_id * 2654435761) % num_partitions).astype(np.int32)
    n = len(doc_id)
    return pa.table({
        "doc_id": pa.array(doc_id),
        "part": pa.array(part),
        "kind": pa.array(["text"] * n),
        "media_ref": pa.array([""] * n),
        "offset": pa.array(offset),
        "out_text": pa.array([f"t{i & 1023}" for i in range(n)]),
    })


def _consume_hash(ds) -> tuple[int, int]:
    """Distributed order-insensitive value hash: per-batch XOR partials
    (vectorized row hashing), tiny driver fold -- no row ever collects."""
    import numpy as np
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df.astype(str), index=False).to_numpy(np.uint64)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "x": [np.int64(x)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return 0, 0
    return (int(parts["n"].sum()),
            int(np.bitwise_xor.reduce(parts["x"].to_numpy(np.int64))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--hot-spans", type=int, default=100_000)
    ap.add_argument("--salts", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    import ray
    import ray.data as rd
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from distributed_system___ocr_ray.stages.reassemble import (
        reassemble, reassemble_salted,
    )

    tbl = build_skewed_input(args.docs, args.hot_spans, args.partitions)
    base = rd.from_arrow(tbl).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=65536
    ).materialize()  # pin the input so both paths read identical blocks

    out = {"docs": args.docs, "hot_spans": args.hot_spans,
           "salts": args.salts, "num_cpus": args.cpus,
           "spans_total": tbl.num_rows}

    for name, fn in [("plain", lambda d: reassemble(d)),
                     ("salted", lambda d: reassemble_salted(d, num_salts=args.salts))]:
        # wall: count-only consume of the full pipeline (no extra stage)
        t0 = time.monotonic()
        n = fn(base).count()
        wall = round(time.monotonic() - t0, 3)
        # equality: a second run feeding the distributed hash fold
        rows, h = _consume_hash(fn(base))
        out[name] = {"wall_sec": wall, "rows": n, "hash": h}
        assert rows == n

    # skew pressure each reducer absorbs (EXACT, computed on the fixture):
    # plain groupby(part) -> the hot doc's whole partition lands on one
    # reducer; salted stage 1 groups by (part, salt) -> ~1/S of it
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({
        "part": tbl.column("part").to_numpy(),
        "salt": (tbl.column("offset").to_numpy().astype(np.int64)
                 * 2654435761 % args.salts).astype(np.int32),
    })
    out["plain_max_group_rows"] = int(pdf.groupby("part").size().max())
    out["salted_stage1_max_group_rows"] = int(
        pdf.groupby(["part", "salt"]).size().max())
    out["match"] = (out["plain"]["rows"] == out["salted"]["rows"]
                    and out["plain"]["hash"] == out["salted"]["hash"])
    print(json.dumps(out))
    ray.shutdown()
    return 0 if out["match"] else 1


if __name__ == "__main__":
    sys.exit(main())
