"""Query plan profiler: run one ``__ray_entry__.queries()`` entry and print
Ray Data's per-operator execution stats (``ds.stats()``) — the feedback loop
the scale tuning runs on (which stage dominates wall, where rows explode,
what a shuffle costs). Used to find the round-3 shape fixes (the
robust_outliers per-key execution storm and collocations' string
sort-shuffle showed up here before the rewrite).

Usage::

    PYTHONPATH=/root/repo python tools/explain.py <query> [sf_dir]

Prints the result row count, wall time, and the full stats tree for
Dataset-returning queries (pandas-returning composites print wall only —
their internals are multiple Datasets; time those with bench.py).
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)}")
        return 2
    t0 = time.perf_counter()
    res = qs[name](sf)
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
    else:
        df = res
    wall = time.perf_counter() - t0
    print(f"query={name} sf={sf} rows={len(df)} wall={wall:.2f}s")
    if hasattr(res, "stats"):
        print(res.stats())
    else:
        print("(pandas-returning composite: per-stage stats are internal; "
              "see bench.py for its wall)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
