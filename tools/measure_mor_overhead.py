"""Measure the merge-on-read delete-application overhead at bench scale.

Builds a 1M-row Lance-style table in /tmp, reads it three ways --
(a) no delete files, (b) 1 delete file / 1% keys deleted, (c) 5
compounded delete files / 5% keys -- and reports wall time per read and
the overhead vs (a). Evidence for BASELINE.md that the anti-filter
stage (sources/lance_like.read_dataset) prices reads at O(batch) is_in
probes against a broadcast key set, not a shuffle."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from distributed_system___ocr_ray.sources import lance_like as ll

    n = 1_000_000
    root = tempfile.mkdtemp(prefix="graft_mor_bench_") + "/tbl"
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([i % 1000 for i in range(n)], pa.int64()),
    })
    ll.write_dataset(rd.from_arrow(t), root, rows_per_fragment=50_000)

    def timed_read():
        # sum() forces a real scan on both paths (count() on a plain
        # parquet read is answered from footers and would make the
        # baseline metadata-only, not a read)
        t0 = time.perf_counter()
        s = ll.read_dataset(root).sum("v")
        return time.perf_counter() - t0, s

    timed_read()  # warm
    base_t, base_n = timed_read()
    print(f"baseline read: {base_n} sum in {base_t:.3f}s")

    ll.delete_where_mor(root, [("k", "<", n // 100)], "k")
    timed_read()
    one_t, one_n = timed_read()
    print(f"1 delete file (1% keys): {one_n} sum in {one_t:.3f}s "
          f"(+{(one_t / base_t - 1) * 100:.0f}%)")

    for i in range(4):
        lo = (i + 2) * (n // 100)
        ll.delete_where_mor(root, [("k", ">=", lo), ("k", "<", lo + n // 100)], "k")
    timed_read()
    five_t, five_n = timed_read()
    print(f"5 delete files (5% keys): {five_n} sum in {five_t:.3f}s "
          f"(+{(five_t / base_t - 1) * 100:.0f}%)")
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
