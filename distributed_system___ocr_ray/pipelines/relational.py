"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic wide-op toolbox the Ray-Data-first way:

- **partial aggregation**: ``pyarrow.Table.group_by`` inside ``map_batches``
  emits one row per key per batch; the following ``groupby`` shuffles only
  partials (SURVEY.md "Aggregation at scale").
- **broadcast hash join**: the small side is ``ray.put`` once and probed per
  batch with a numpy searchsorted/dict map inside ``map_batches`` -- no
  shuffle join for dimension tables (SURVEY.md #2.4: the reference's keyed
  in-memory lookups are exactly this pattern).
- **windowed aggregate**: event-time tumbling windows as
  ``groupby(key, window_start)`` after a vectorized truncation -- Ray Data
  has no event-time runtime, so windows are computed as columns
  (ray_guide: streaming-shaped workloads).

Money columns are summed as integer cents (``floor(x*100 + 0.5)``) so the
DuckDB oracle comparison is exact, not float-fuzzy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    x = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    v = np.floor(x.to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
    return pa.array(v, pa.int64())


def pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary (grouped aggregate with partial agg)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_cents": _cents(batch.column("l_quantity")),
                "base_cents": _cents(batch.column("l_extendedprice")),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("base_cents", "sum"), ("qty_cents", "count")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_cents_sum", alias_name="sum_qty_cents"),
            Sum("base_cents_sum", alias_name="sum_base_cents"),
            Sum("qty_cents_count", alias_name="n_rows"),
        )
    )


def revenue_by_nation(sf_dir: str):
    """orders |><| customer |><| nation via broadcast join (both small sides
    shipped once with ray.put), then partial + final aggregate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_names = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    cust_keys = cust.column("c_custkey").to_numpy()
    cust_order = np.argsort(cust_keys)
    lookup = {
        "keys": cust_keys[cust_order],
        "names": np.array(
            [nation_names[k] for k in cust.column("c_nationkey").to_numpy()[cust_order]], dtype=object
        ),
    }
    handle = ray.put(lookup)

    class Probe:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_numpy()
            pos = np.searchsorted(self.lk["keys"], keys)
            names = self.lk["names"][pos]
            t = pa.table(
                {"n_name": pa.array(names.tolist(), pa.string()), "rev_cents": _cents(batch.column("o_totalprice"))}
            )
            return t.group_by(["n_name"]).aggregate([("rev_cents", "sum"), ("rev_cents", "count")])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    return (
        ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("n_name")
        .aggregate(
            Sum("rev_cents_sum", alias_name="revenue_cents"),
            Sum("rev_cents_count", alias_name="n_orders"),
        )
    )


def events_daily(sf_dir: str):
    """Tumbling 1-day event-time window per event_type."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d")
        t = pa.table(
            {"event_type": batch.column("event_type"), "day": day, "value_cents": _cents(batch.column("value"))}
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("value_cents_sum", alias_name="value_cents"),
            Sum("value_cents_count", alias_name="n_events"),
        )
    )


def top_users_by_value(sf_dir: str, k: int = 10):
    """Global top-k after a grouped sum (sort + limit; deterministic
    tie-break on user_id)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"), "value_cents": _cents(batch.column("value"))})
        return t.group_by(["user_id"]).aggregate([("value_cents", "sum")])

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("value_cents_sum", alias_name="total_value_cents"))
    )
    # k is tiny: exact global top-k via sort on (total desc, user_id asc)
    return totals.sort(["total_value_cents", "user_id"], descending=[True, False]).limit(k)


def filter_project_documents(sf_dir: str, min_chars: int = 100, max_chars: int = 20000):
    """Predicate-pushdown filter + projection over documents (read prunes to
    the 3 needed columns; the n_chars filter runs as a row-group filter)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    return ds.filter(
        expr=f"n_chars >= {min_chars} and n_chars <= {max_chars}"
    ).select_columns(["doc_id", "lang"])


def docs_by_lang(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def doc_stats_by_source(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
