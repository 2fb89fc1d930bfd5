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

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class CollectCapExceeded(RuntimeError):
    """A documented bounded-driver collect found its bound violated at
    runtime. The message names the distributed alternative to switch to --
    the uniform loud-raise discipline of the broadcast caps (VERDICT r3
    "next round" #7): a cap that silently collects anyway is not a cap."""


def collect_bounded(out, *, what: str, alternative: str,
                    cap_bytes: int = 256 << 20, cap_rows: int | None = None):
    """Driver-side collect that ASSERTS its documented bound.

    Accepts a Ray ``Dataset``, Arrow table or pandas frame; returns a
    pandas frame. Raises :class:`CollectCapExceeded` (naming ``what`` blew
    the cap and which distributed ``alternative`` to use) instead of
    silently pulling an unbounded domain onto the driver. For a Dataset the
    size check runs on the materialized blocks BEFORE any driver transfer,
    so the raise happens while the data still lives in the object store."""

    def check(rows: int, nbytes: int) -> None:
        if nbytes > cap_bytes or (cap_rows is not None and rows > cap_rows):
            raise CollectCapExceeded(
                f"{what}: {rows} rows / {nbytes >> 20} MiB exceeds the "
                f"driver-collect cap ({cap_bytes >> 20} MiB"
                + (f" / {cap_rows} rows" if cap_rows is not None else "")
                + f"); use {alternative} instead"
            )

    if hasattr(out, "size_bytes"):  # Ray Dataset
        mat = out.materialize()
        check(mat.count(), mat.size_bytes() or 0)
        return mat.to_pandas()
    if isinstance(out, pa.Table):
        check(out.num_rows, out.nbytes)
        return out.to_pandas()
    check(len(out), int(out.memory_usage(deep=True).sum()))
    return out


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    x = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    v = np.floor(x.to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
    return pa.array(v, pa.int64())


def tiny_final_groupby(partials, keys, aggs, out_names):
    """Final merge for partial-aggregate plans whose key cardinality is tiny
    and bounded (flags, priorities, nations, days): coalesce the per-batch
    partial rows (a handful per block) into ONE block and finish with a
    single Arrow ``group_by`` task. This skips Ray's sort-based Aggregate,
    whose barrier + per-block boundary machinery costs ~3.5 s at ANY input
    size (measured on 384 partial rows, 64 blocks, 32 cpus) -- the shuffle
    would move kilobytes. NOT for unbounded keys: one block must hold
    ``n_keys x n_partial_blocks`` rows; use ``groupby().aggregate()`` there.

    ``aggs``: list of (column, fn) for ``pa.Table.group_by().aggregate``;
    ``out_names``: final column names for [*keys, *agg outputs].
    """

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(keys).aggregate(aggs)
        # arrow emits '<col>_<fn>' aggregate names with keys LAST; restore
        # [keys..., aggs...] order, then apply the caller's names
        agg_cols = [f"{c}_{fn}" for c, fn in aggs]
        out = out.select([*keys, *agg_cols])
        return out.rename_columns(out_names)

    return partials.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


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

    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("qty_cents_sum", "sum"), ("base_cents_sum", "sum"), ("qty_cents_count", "sum")],
        ["l_returnflag", "l_linestatus", "sum_qty_cents", "sum_base_cents", "n_rows"],
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
            # inner-join semantics: a custkey absent from customer must DROP,
            # not silently take a neighbor's nation (searchsorted returns the
            # insertion point for misses, and len(keys) past the end)
            pos_safe = np.clip(pos, 0, len(self.lk["keys"]) - 1)
            hit = self.lk["keys"][pos_safe] == keys
            names = self.lk["names"][pos_safe[hit]]
            t = pa.table(
                {
                    "n_name": pa.array(names.tolist(), pa.string()),
                    "rev_cents": _cents(batch.column("o_totalprice").filter(pa.array(hit))),
                }
            )
            return t.group_by(["n_name"]).aggregate([("rev_cents", "sum"), ("rev_cents", "count")])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    return tiny_final_groupby(
        ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4)),
        ["n_name"],
        [("rev_cents_sum", "sum"), ("rev_cents_count", "sum")],
        ["n_name", "revenue_cents", "n_orders"],
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

    # day x event_type cardinality is bounded (~150 at any sf): single-block final
    return tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        [("value_cents_sum", "sum"), ("value_cents_count", "sum")],
        ["event_type", "day", "value_cents", "n_events"],
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


# ---------------------------------------------------------------------------
# large-large joins, as-of joins, session windows, grouped top-k
# ---------------------------------------------------------------------------


def hash_bucket_column(batch: pa.Table, key: str, buckets: int, name: str = "__bucket") -> pa.Table:
    """Append the engine's ONE hash-partition column:
    ``pd.util.hash_array(key) % buckets`` as int32. Shared by the bucketed
    join, the as-of join and session windows so their plans partition
    identically -- and so a future change (salting hot keys, swapping the
    hash) happens in exactly one place."""
    import pandas as _pd

    keys = batch.column(key).to_numpy(zero_copy_only=False)
    bucket = _pd.util.hash_array(np.ascontiguousarray(keys)) % np.uint64(buckets)
    return batch.append_column(name, pa.array(bucket.astype(np.int32), pa.int32()))


def derive_buckets(n_rows: int, rows_per_bucket: int = 500_000, lo: int = 8, hi: int = 4096) -> int:
    """Size a join/as-of fan-out from the larger side's row count so one
    bucket's rows fit a worker heap regardless of input scale (a fixed B
    makes per-bucket memory linear in corpus size). ``Dataset.count()`` on a
    fresh parquet read is metadata-cheap, so callers derive B at plan time."""
    return max(lo, min(hi, n_rows // rows_per_bucket + 1))


def bucketed_grouped_sum(ds, key: str, sum_col: str, buckets: int = 64):
    """Grouped sum for UNBOUNDED (typically string) key domains:
    hash-bucket the key, shuffle on the int32 bucket, and pandas-sum each
    bucket in one vectorized call. Ray's native ``groupby(str_col)`` runs a
    sort-based shuffle ON THE STRINGS — measured 11.2 s vs 2.1 s for this
    formulation on the same 59k-row partial table (round-3 bench finding);
    the values are identical, only the exchange key changes. Callers
    pre-aggregate per batch first so the shuffle is key-domain-sized.
    ``buckets`` is the per-task memory knob: one bucket holds
    ~(batches x per-batch distinct keys) / buckets partial rows — raise it
    for corpus-scale vocabularies (same sizing rule as derive_buckets)."""
    import pandas as pd

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key, buckets)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, sort=False)[sum_col].sum().reset_index()

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_sum, batch_format="pandas")
    )


def bucketed_hash_join(
    left, right, left_key: str, right_key: str, *, buckets: int = 32, how: str = "inner"
):
    """Explicit partitioned hash join for two LARGE sides (ray_guide pattern:
    bucket = hash(key) % B on both sides -> union -> per-bucket pandas merge).

    Ray 2.49 also ships a native ``Dataset.join`` (hash-partitioned) built on
    the alpha hash-shuffle backend; this bucketed formulation is the portable
    fallback and makes the partitioning explicit (B is the knob: size so one
    bucket's rows from both sides fit a worker heap; salt hot keys by
    raising B). Column names must not collide across sides (checked).
    """
    import pandas as pd

    l_cols = left.schema().names
    r_cols = right.schema().names
    overlap = (set(l_cols) & set(r_cols)) - ({left_key} if left_key == right_key else set())
    if overlap:
        raise ValueError(f"column collision across join sides: {overlap}")

    def tag(side: str, key: str, other_cols: list[str]):
        def _fn(batch: pa.Table) -> pa.Table:
            batch = hash_bucket_column(batch, key, buckets)
            batch = batch.append_column("__side", pa.array([side] * batch.num_rows, pa.string()))
            # pad the other side's columns with nulls so the union schemas align
            for c, typ in other_cols:
                batch = batch.append_column(c, pa.nulls(batch.num_rows, typ))
            return batch

        return _fn

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = list(zip(l_schema.names, l_schema.types))
    r_types = list(zip(r_schema.names, r_schema.types))
    l_tagged = left.map_batches(
        tag("l", left_key, [(n, t) for n, t in r_types if n not in l_schema.names]),
        batch_format="pyarrow",
    )
    r_tagged = right.map_batches(
        tag("r", right_key, [(n, t) for n, t in l_types if n not in r_schema.names]),
        batch_format="pyarrow",
    )
    both = l_tagged.union(r_tagged)

    def join_bucket(group: pa.Table) -> pd.DataFrame:
        # split sides in Arrow BEFORE any pandas conversion: converting the
        # unioned block (which carries null padding in the other side's
        # columns) would silently upcast int64 -> float64 for every row
        lg = group.filter(pc.equal(group.column("__side"), "l")).select(
            [n for n, _ in l_types]
        ).to_pandas()
        rg = group.filter(pc.equal(group.column("__side"), "r")).select(
            [n for n, _ in r_types]
        ).to_pandas()
        return lg.merge(rg, left_on=left_key, right_on=right_key, how=how)

    return both.repartition(buckets).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def asof_join(
    left, right, key: str, right_key: str, left_ts: str, right_ts: str, *,
    buckets: int = 16, direction: str = "backward", allow_exact: bool = True,
    right_sort_extra: list | None = None,
):
    """As-of join: per key, the most recent ``right_ts`` <= ``left_ts``
    (``direction='backward'``, the default) or the FIRST ``right_ts`` >=
    ``left_ts`` (``'forward'``; with ``allow_exact=False`` strictly >/<).
    Bucket both sides by key hash, sort within bucket, ``pd.merge_asof``
    per bucket (ray_guide as-of pattern). Inner semantics: unmatched left
    rows drop.

    ``right_sort_extra``: extra right-side ASC sort keys after
    ``right_ts``. ``merge_asof`` resolves equal-timestamp right rows to
    the LAST in sort order, so the extra keys make that choice
    DETERMINISTIC: the row with the greatest extra-key tuple wins
    (input order is shuffle-dependent without this).
    """
    import pandas as pd

    def tag(side: str, k: str, pad: list):
        def _fn(batch: pa.Table) -> pa.Table:
            batch = hash_bucket_column(batch, k, buckets)
            batch = batch.append_column("__side", pa.array([side] * batch.num_rows, pa.string()))
            for c, typ in pad:
                batch = batch.append_column(c, pa.nulls(batch.num_rows, typ))
            return batch

        return _fn

    l_schema, r_schema = left.schema(), right.schema()
    l_types = list(zip(l_schema.names, l_schema.types))
    r_types = list(zip(r_schema.names, r_schema.types))
    l_tagged = left.map_batches(
        tag("l", key, [(n, t) for n, t in r_types if n not in l_schema.names]), batch_format="pyarrow"
    )
    r_tagged = right.map_batches(
        tag("r", right_key, [(n, t) for n, t in l_types if n not in r_schema.names]),
        batch_format="pyarrow",
    )

    def asof_bucket(group: pa.Table) -> pd.DataFrame:
        # Arrow-side split first (see join_bucket: avoids int->float upcast)
        lg = group.filter(pc.equal(group.column("__side"), "l")).select(
            [n for n, _ in l_types]
        ).to_pandas().sort_values(left_ts)
        rg = group.filter(pc.equal(group.column("__side"), "r")).select(
            [n for n, _ in r_types]
        ).to_pandas().sort_values([right_ts, *(right_sort_extra or [])])
        if lg.empty or rg.empty:
            # typed empty (object-dtype empties trip Ray's size estimation)
            out = lg.iloc[0:0].copy()
            for c in rg.columns:
                if c not in out.columns:
                    out[c] = pd.Series(dtype=rg.dtypes[c])
            return out
        out = pd.merge_asof(
            lg, rg, left_on=left_ts, right_on=right_ts, left_by=key, right_by=right_key,
            direction=direction, allow_exact_matches=allow_exact,
        )
        return out.dropna(subset=[right_ts])  # inner semantics

    return (
        l_tagged.union(r_tagged)
        .repartition(buckets)
        .groupby("__bucket")
        .map_groups(asof_bucket, batch_format="pyarrow")
    )


def last_order_before_event(sf_dir: str):
    """Per event: the most recent order date of that user at event time
    (as-of join events x orders on user_id = o_custkey)."""
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    buckets = derive_buckets(max(events.count(), orders.count()))
    joined = asof_join(events, orders, key="user_id", right_key="o_custkey",
                       left_ts="ts", right_ts="o_orderdate", buckets=buckets)

    def project(batch: pa.Table) -> pa.Table:
        # date-only format: pyarrow's %S appends fractional seconds, DuckDB's
        # does not; o_orderdate is midnight-aligned so the date is lossless
        day = pc.strftime(batch.column("o_orderdate"), format="%Y-%m-%d")
        eid = pc.cast(pc.round(batch.column("event_id")), pa.int64())
        return pa.table({"event_id": eid, "last_order_day": day})

    return joined.map_batches(project, batch_format="pyarrow")


def pit_value_join(sf_dir: str, event_type: str = "purchase"):
    """Point-in-time (PIT) join against a DERIVED SCD2 dimension -- the
    feature-store staple: each event joins the dimension VERSION that was
    valid at event time, never a later one (no feature leakage). Composes
    ``scd2_history`` (daily-last value stream -> change intervals) with
    the bucketed as-of join: versions are contiguous per key, so
    "greatest valid_from_day <= event day" IS the containing interval,
    and every event is covered (a key's first version starts at its first
    event day). Returns (event_id, user_id, day, value_cents).

    Scale shape: the dimension build is scd2_history's one activity-domain
    exchange; the join is the as-of bucket pattern (hash both sides on
    key, merge_asof per bucket) -- no range-join blowup, no per-key loop.
    """
    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
    )
    versions = scd2_history(ev, "user_id", "ts", "value", "event_id")

    raw = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def project(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), event_type))
        day = b.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table(
            {
                "event_id": b.column("event_id").cast(pa.int64()),
                "user_id": b.column("user_id").cast(pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        )

    probes = raw.map_batches(project, batch_format="pyarrow")
    joined = asof_join(
        probes, versions, key="user_id", right_key="user_id",
        left_ts="day", right_ts="valid_from_day", buckets=16,
    )
    return joined.select_columns(["event_id", "user_id", "day", "value_cents"])


def order_lineitem_join_stats(sf_dir: str):
    """Large-large bucketed hash join: orders |><| lineitem, then revenue per
    o_orderpriority (integer cents; fully SQL-checkable)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    buckets = derive_buckets(max(orders.count(), lineitem.count()))
    joined = bucketed_hash_join(orders, lineitem, "o_orderkey", "l_orderkey", buckets=buckets)

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {"o_orderpriority": batch.column("o_orderpriority"), "rev_cents": pa.array(rev, pa.int64())}
        )
        return t.group_by(["o_orderpriority"]).aggregate([("rev_cents", "sum"), ("rev_cents", "count")])

    return tiny_final_groupby(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("rev_cents_sum", "sum"), ("rev_cents_count", "sum")],
        ["o_orderpriority", "revenue_cents", "n_items"],
    )


def session_windows(sf_dir: str, gap_minutes: int = 30, partitions: int | None = None):
    """Session windows per user (gap > ``gap_minutes`` starts a new session):
    the streaming-shaped operator Ray Data has no runtime for.

    Partition-bucketed: users are grouped by ``hash(user_id) % P`` and each
    PARTITION is sessionized in ONE vectorized pass (sort by (user, ts),
    numpy diff/cumsum with per-user restarts) -- P Python calls total, not
    one per user (same discipline as stages/reassemble.py:12). Sessions are
    numbered 1..k per user in ts order, matching the SQL lag/sum-over
    formulation, so DuckDB checks it exactly."""
    import pandas as pd
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    if partitions is None:
        # parquet count is metadata-cheap; ~500k events per partition
        partitions = max(16, events.count() // 500_000 + 1)
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def sessionize_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap_brk = np.concatenate(([False], (ts[1:] - ts[:-1]) > gap))
        brk = new_user | gap_brk
        csum = np.cumsum(brk)
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, len(uid)))
        base = np.repeat(csum[starts] - 1, counts)  # session ids restart per user
        out = pd.DataFrame(
            {
                "user_id": uid,
                "session_id": (csum - base).astype("int64"),
                "value_cents": np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64),
            }
        )
        agg = out.groupby(["user_id", "session_id"], as_index=False, sort=False).agg(
            n_events=("value_cents", "size"), session_value_cents=("value_cents", "sum")
        )
        return agg[["user_id", "session_id", "n_events", "session_value_cents"]]

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessionize_partition, batch_format="pandas")
    )


def running_totals(sf_dir: str, partitions: int | None = None):
    """Per-customer running order spend (the cumulative-window op:
    ``SUM(cents) OVER (PARTITION BY custkey ORDER BY date, orderkey)``).

    Same partition-bucketed discipline as session_windows: customers are
    hash-bucketed, each bucket cumsum'd in ONE vectorized pass (mergesort
    by (cust, date, orderkey) for a deterministic total order -- the
    orderkey tie-break is what makes the running value exact, not
    order-dependent -- then per-customer cumsum via offset subtraction).
    Integer cents end-to-end, so the SQL window replay is exact."""
    import pandas as pd
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    if partitions is None:
        partitions = derive_buckets(orders.count())  # the module's one sizing rule

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "o_custkey", partitions)

    def cumsum_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        cust = g["o_custkey"].to_numpy()
        cents = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        csum = np.cumsum(cents)
        new_cust = np.concatenate(([True], cust[1:] != cust[:-1]))
        starts = np.flatnonzero(new_cust)
        counts = np.diff(np.append(starts, len(cust)))
        # value of csum just BEFORE each customer's first row, repeated
        base = np.repeat(csum[starts] - cents[starts], counts)
        return pd.DataFrame(
            {
                "o_custkey": cust,
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "cum_cents": csum - base,
            }
        )

    return (
        orders.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(cumsum_partition, batch_format="pandas")
    )


def count_in_window(lts: np.ndarray, sorted_rts: np.ndarray, window_us: int) -> np.ndarray:
    """Per left timestamp, how many of the SORTED right timestamps fall in
    ``[l, l + window_us)`` — the range join's per-bucket kernel (two
    vectorized searchsorted calls; property-tested against brute force)."""
    return np.searchsorted(sorted_rts, lts + window_us, side="left") - np.searchsorted(
        sorted_rts, lts, side="left"
    )


def range_join_counts(
    left, right, left_ts: str, right_ts: str, left_id: str,
    window_us: int, out_col: str = "n_in_window",
):
    """Band/range join without an equality key: for each LEFT row, count
    RIGHT rows whose timestamp falls in ``[l_ts, l_ts + window_us)`` —
    the non-equi join Ray Data has no native operator for.

    Scale shape (never all-pairs): both sides bucket by
    ``ts // window_us``; a left row's window spans AT MOST two buckets, so
    only the SMALL left side replicates 2×, the big right side ships once.
    Each bucket sorts its right timestamps once and answers every left row
    in it with two vectorized ``searchsorted`` calls; per-replica partial
    counts then sum per left id (zero counts survive: both replicas emit a
    row, so unmatched ids appear with 0). One shuffle per side + the
    id-bucketed count merge — at 100 TB the bucket width IS the window, so
    skew only arises if one window holds a corpus-scale burst; re-bucket by
    ``(bucket, salt)`` on the right side in that case."""
    _ls = left.schema()
    lid_type = dict(zip(_ls.names, _ls.types))[left_id]

    def tag_left(batch: pa.Table) -> pa.Table:
        ts = batch.column(left_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        dup = pa.array(np.tile(np.arange(n_rows, dtype=np.int64), 2))
        b0 = ts // window_us
        out_ts = np.concatenate([ts, ts])
        out_b = np.concatenate([b0, b0 + 1])
        return pa.table(
            {
                "__rbucket": pa.array(out_b, pa.int64()),
                left_id: batch.column(left_id).take(dup),
                "__lts": pa.array(out_ts, pa.int64()),
                "__rts": pa.nulls(2 * n_rows, pa.int64()),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        ts = batch.column(right_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__rbucket": pa.array(ts // window_us, pa.int64()),
                left_id: pa.nulls(batch.num_rows, lid_type),
                "__lts": pa.nulls(batch.num_rows, pa.int64()),
                "__rts": pa.array(ts, pa.int64()),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def count_bucket(group: pa.Table) -> pa.Table:
        # stay in Arrow: a pandas conversion would upcast the null-padded
        # int64 columns to float64, which corrupts microsecond timestamps
        # past 2^53 and silently shifts window boundaries
        lmask = pc.is_valid(group.column("__lts"))
        lrows = group.filter(lmask)
        rts = np.sort(
            group.filter(pc.invert(lmask)).column("__rts").to_numpy(zero_copy_only=False)
        )
        lts = lrows.column("__lts").to_numpy(zero_copy_only=False)
        # right rows in THIS bucket that fall in [l, l+W): the two-bucket
        # replication guarantees every (l, r) pair co-locates exactly once
        n = count_in_window(lts, rts, window_us)
        return pa.table(
            {
                left_id: lrows.column(left_id),
                out_col: pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    partials = both.groupby("__rbucket").map_groups(count_bucket, batch_format="pyarrow")
    return bucketed_grouped_sum(partials, left_id, out_col)


def percent_rank_by_group(
    ds, key: str = "lang", col: str = "n_chars", id_col: str = "doc_id",
    partitions: int | None = None,
):
    """Per-group percentile rank in integer ppm — the rank-window op
    (``RANK() OVER (PARTITION BY key ORDER BY col)``, scaled to
    ``(rank-1) * 1e6 // (n-1)``; single-row groups pin to 0). The
    curation use: "keep the top X% by quality WITHIN each language"
    without per-language thresholds.

    Hash-bucketing by key puts every row of a group in one partition
    (same discipline as session_windows); each partition ranks ALL its
    groups in one vectorized pass — mergesort by (key, col), tie-min
    ranks via first-occurrence propagation, no Python per-group loop.
    Integer arithmetic end-to-end, so the SQL window replay is exact.

    ``partitions`` defaults to ``derive_buckets(ds.count())`` so per-bucket
    frames stay worker-heap-sized at any scale; on a COMPUTED upstream that
    count re-executes the plan — pass partitions explicitly there."""
    import pandas as pd

    if partitions is None:
        partitions = derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key, partitions)

    def rank_partition(group: pd.DataFrame) -> pd.DataFrame:
        return rank_partition_frame(group, key, col, id_col)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(rank_partition, batch_format="pandas")
    )


def rank_partition_frame(group, key: str, col: str, id_col: str):
    """percent_rank_by_group's per-partition kernel (module-level so it is
    property-testable without Ray): sort by (key, col), RANK tie-min via
    boundary forward-fill, scale to ``(rank-1)*1e6 // (n-1)`` per key."""
    import pandas as pd

    g = group.sort_values([key, col], kind="mergesort")
    k_arr = g[key].to_numpy()
    v = g[col].to_numpy()
    n_rows = len(g)
    new_key = np.concatenate(([True], k_arr[1:] != k_arr[:-1]))
    starts = np.flatnonzero(new_key)
    counts = np.diff(np.append(starts, n_rows))
    pos = np.arange(n_rows) - np.repeat(starts, counts)  # 0-based within key
    # RANK() tie-min: a row's rank is the 0-based position of the FIRST
    # row sharing its (key, value) -- forward-fill the index of the last
    # boundary (key change or value change), then take ITS position
    new_val = new_key | np.concatenate(([True], v[1:] != v[:-1]))
    idx_of_first = np.maximum.accumulate(np.where(new_val, np.arange(n_rows), -1))
    rank = pos[idx_of_first]
    n_in_key = np.repeat(counts, counts)
    denom = np.maximum(n_in_key - 1, 1)  # single-row groups: rank is 0 anyway
    rank_ppm = (rank.astype(np.int64) * 1_000_000) // denom
    return pd.DataFrame(
        {id_col: g[id_col].to_numpy(), key: k_arr, "rank_ppm": rank_ppm}
    )


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (window-function analogue): top-k orders by totalprice
    per customer mktsegment. Scale-safe shape: the broadcast-tagging stage
    also takes a PARTIAL top-k per segment within each batch (the ann_topk
    pattern), so the final groupby(segment) merges <= k rows per segment per
    batch instead of materializing a whole segment (~1/5 of all orders) in
    one reducer. Custkeys absent from customer DROP (inner-join semantics,
    same as revenue_by_nation)."""
    import pandas as pd
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist()))
    handle = ray.put(seg)

    class TagPartialTopK:
        def __init__(self) -> None:
            self.seg = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "c_mktsegment": pd.Series(
                        batch.column("o_custkey").to_numpy(zero_copy_only=False)
                    ).map(self.seg),
                    "o_orderkey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                    "price_cents": _cents(batch.column("o_totalprice")).to_numpy(),
                }
            )
            df = df.dropna(subset=["c_mktsegment"])  # inner-join: misses drop
            df = df.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
            return df.groupby("c_mktsegment", sort=False).head(k)

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["price_cents", "o_orderkey"], ascending=[False, True]).head(k)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return (
        orders.map_batches(TagPartialTopK, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("c_mktsegment")
        .map_groups(topk, batch_format="pandas")
    )


def sliding_windows(sf_dir: str, width_s: int = 3600, hop_s: int = 900):
    """Sliding (hopping) event-time windows per event_type: each event lands
    in width/hop consecutive windows. Vectorized window explode inside
    ``map_batches`` (np.repeat over per-row window ranges) -> partial count
    -> small groupby. Window start is emitted as epoch seconds (BIGINT) so
    the DuckDB lateral-generate_series oracle compares exactly."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def explode_windows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy() // 1_000_000  # epoch sec
        first = (ts - width_s) // hop_s + 1  # smallest window index containing ts
        last = ts // hop_s  # largest
        counts = (last - first + 1).astype(np.int64)
        etypes = np.repeat(batch.column("event_type").to_numpy(zero_copy_only=False), counts)
        base = np.repeat(first, counts)
        offsets = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        ws = (base + offsets) * hop_s
        t = pa.table({"event_type": etypes.tolist(), "window_start": pa.array(ws, pa.int64())})
        return t.group_by(["event_type", "window_start"]).aggregate([("window_start", "count")])

    return (
        ds.map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("window_start_count", alias_name="n_events"))
    )


def debounce_events(
    ds,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gap_seconds: int = 60,
    partitions: int = 32,
):
    """Windowed stream dedup ("debounce"): within each key, ordered by
    (ts, id), drop an event that follows its predecessor by less than
    ``min_gap_seconds`` -- the standard telemetry/clickstream noise filter.

    Semantics are the pure LAG formulation (gap measured to the previous
    EVENT, kept or not), so one SQL window replays it exactly; the stateful
    previous-KEPT variant would be sequential per key and is a different
    operator. Partition-bucketed like session_windows: keys are grouped by
    ``hash(key) % P`` and each partition is debounced in ONE vectorized
    pass (sort + shifted-compare masks), P Python calls total."""
    import pandas as pd

    key_cols = key_cols or ["user_id", "event_type"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_cols[0], partitions)

    gap = np.timedelta64(min_gap_seconds, "s")

    def debounce_partition(group: pd.DataFrame) -> pd.DataFrame:
        return debounce_frame(group, key_cols, ts_col, id_col, gap)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(debounce_partition, batch_format="pandas")
    )


def debounce_frame(
    group: "pd.DataFrame", key_cols: list[str], ts_col: str, id_col: str, gap
) -> "pd.DataFrame":
    """One partition's debounce pass (module-level so the property tests
    exercise the exact production kernel): sort by (keys, ts, id), then one
    shifted-compare mask keeps rows that start a key or follow their
    predecessor by >= gap."""
    import pandas as pd  # noqa: F401  (callers pass pandas frames)

    g = group.sort_values([*key_cols, ts_col, id_col], kind="mergesort")
    same_key = np.ones(len(g), dtype=bool)
    for c in key_cols:
        v = g[c].to_numpy()
        same_key[1:] &= v[1:] == v[:-1]
    same_key[0] = False
    ts = g[ts_col].to_numpy()
    close = np.zeros(len(g), dtype=bool)
    close[1:] = (ts[1:] - ts[:-1]) < gap
    keep = ~(same_key & close)
    return g.loc[keep, [id_col, *key_cols]].reset_index(drop=True)


# ------------------------------------------------------------- mode / audit


def mode_by_key(ds, key_col: str, value_col: str, buckets: int = 64):
    """Grouped mode: the most frequent ``value_col`` per ``key_col``, ties
    broken by the smallest value (deterministic at any partitioning).

    Scale shape: per-batch partial counts collapse each block to at most one
    row per (key, value) it saw, so the ONE hash exchange moves the
    (key, value)-domain, never input rows; the per-bucket merge is a
    vectorized sort + head(1), not a per-group Python loop. Returns
    (key, mode_value, n_rows) where n_rows counts the winning value's rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, value_col]).to_pandas()
        c = df.groupby([key_col, value_col], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(c, preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        tot = (
            group.groupby([key_col, value_col], sort=False)["n"].sum().reset_index()
        )
        g = tot.sort_values(
            [key_col, "n", value_col], ascending=[True, False, True], kind="mergesort"
        )
        best = g.groupby(key_col, sort=False).head(1)
        return pd.DataFrame(
            {
                key_col: best[key_col].to_numpy(),
                "mode_value": best[value_col].to_numpy(),
                "n_rows": best["n"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def orphan_audit(child_ds, child_key: str, parent_ds, parent_key: str,
                 relation: str, buckets: int = 64):
    """Single-relation convenience wrapper over :func:`orphan_audit_multi`."""
    return orphan_audit_multi(
        [(child_ds, child_key, parent_ds, parent_key, relation)], buckets=buckets
    )


def orphan_audit_multi(specs, buckets: int = 64):
    """Referential-integrity audit: for each ``(child_ds, child_key,
    parent_ds, parent_key, relation)`` spec, counts child rows whose key has
    no match in the (possibly filtered) parent table -- the post-purge /
    post-delete data-ops check (did a retention sweep on the parent orphan
    live child rows?). Reference analogue: the manager's completion-ledger
    consistency sweep (Manager.java:406-460 cleans result rows whose parent
    job row was retired).

    Scale shape: every child collapses map-side to per-batch (key, n)
    partial counts and every parent to per-batch distinct keys -- tagged
    with their relation index -- so ALL relations share ONE key-domain-sized
    hash exchange and ONE tiny final sum, however many specs there are (the
    first cut ran one groupby barrier per relation: 3x the wall at sf0.1
    for pure barrier constants). Each bucket anti-joins vectorized per
    relation (pandas groupby + isin). Never broadcasts the parent -- works
    when both sides are too big for any worker's heap.

    Returns one row per relation:
    (relation, n_child_rows, n_orphan_rows, n_orphan_keys).
    """
    names = [s[4] for s in specs]
    if len(set(names)) != len(names):
        raise ValueError("relation labels must be unique")

    def child_partial(rel: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.select([key]).to_pandas()
            c = df.groupby(key, sort=False).size().rename("n").reset_index()
            return pa.table(
                {
                    "rel": pa.array(np.full(len(c), rel, np.int32), pa.int32()),
                    "key": pa.array(c[key].to_numpy(np.int64), pa.int64()),
                    "n": pa.array(c["n"].to_numpy(np.int64), pa.int64()),
                    "is_parent": pa.array(np.zeros(len(c), dtype=bool)),
                }
            )

        return fn

    def parent_partial(rel: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.unique(batch.column(key).to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "rel": pa.array(np.full(len(k), rel, np.int32), pa.int32()),
                    "key": pa.array(k.astype(np.int64), pa.int64()),
                    "n": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                    "is_parent": pa.array(np.ones(len(k), dtype=bool)),
                }
            )

        return fn

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "key", buckets)

    def audit_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rel, g in group.groupby("rel", sort=True):
            parents = g.loc[g["is_parent"], "key"].unique()
            child = g.loc[~g["is_parent"]]
            orphan = child.loc[~child["key"].isin(parents)]
            rows.append(
                (names[int(rel)], int(child["n"].sum()),
                 int(orphan["n"].sum()), int(orphan["key"].nunique()))
            )
        return pd.DataFrame(
            rows, columns=["relation", "n_child_rows", "n_orphan_rows", "n_orphan_keys"]
        )

    merged = None
    for rel, (child_ds, child_key, parent_ds, parent_key, _name) in enumerate(specs):
        c = child_ds.map_batches(child_partial(rel, child_key), batch_format="pyarrow")
        p = parent_ds.map_batches(parent_partial(rel, parent_key), batch_format="pyarrow")
        part = c.union(p)
        merged = part if merged is None else merged.union(part)

    partials = (
        # coalesce before the exchange: the union of 2x len(specs) streams
        # arrives as hundreds of kilobyte-sized blocks, and the sort-based
        # groupby pays ~50ms of boundary machinery PER INPUT BLOCK (measured
        # 20s on 384 blocks / 20MB at sf0.1); a shuffle-free repartition
        # folds them to `buckets` blocks first (the partials are key-domain
        # sized, so this is always cheap relative to the inputs)
        merged.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(buckets)
        .groupby("__bucket")
        .map_groups(audit_bucket, batch_format="pandas")
    )
    return tiny_final_groupby(
        partials,
        keys=["relation"],
        aggs=[("n_child_rows", "sum"), ("n_orphan_rows", "sum"), ("n_orphan_keys", "sum")],
        out_names=["relation", "n_child_rows", "n_orphan_rows", "n_orphan_keys"],
    )


def longest_streak(ds, key_col: str = "user_id", ts_col: str = "ts",
                   buckets: int = 64):
    """Gaps-and-islands: per key, the longest run of CONSECUTIVE active days
    (and the total distinct active days) from an event stream -- the
    engagement-streak query every activity dashboard runs.

    Scale shape: each batch collapses map-side to its distinct (key, day)
    pairs, so the ONE hash exchange is activity-domain sized (<= keys x
    days), never event-row sized; the per-bucket kernel is fully
    vectorized (sort once, then one run-length pass over day-diff breaks
    shared by ALL keys in the bucket -- no per-key loop). Day = floor
    epoch seconds // 86400, matching the SQL replay exactly.

    Returns (key, longest_streak_days, n_active_days).
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").view(np.int64)
        pairs = np.unique(np.stack([keys, day], axis=1), axis=0)
        return pa.table(
            {
                key_col: pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def streaks(group: pd.DataFrame) -> pd.DataFrame:
        d = group[[key_col, "day"]].drop_duplicates()
        arr = np.unique(
            np.stack([d[key_col].to_numpy(np.int64), d["day"].to_numpy(np.int64)], axis=1),
            axis=0,
        )
        k, day = arr[:, 0], arr[:, 1]
        # a new island starts at a key change or a day jump != 1
        brk = np.r_[True, (k[1:] != k[:-1]) | (day[1:] != day[:-1] + 1)]
        island = np.cumsum(brk) - 1
        lengths = np.bincount(island)
        island_key = k[brk]
        out = pd.DataFrame({key_col: island_key, "len": lengths})
        g = out.groupby(key_col, sort=True)["len"]
        res = pd.DataFrame(
            {
                key_col: g.max().index.to_numpy(np.int64),
                "longest_streak_days": g.max().to_numpy(np.int64),
                "n_active_days": g.sum().to_numpy(np.int64),
            }
        )
        return res

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(streaks, batch_format="pandas")
    )


def _union_islands(k: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Merge overlapping/adjacent half-open intervals per key: sort by
    (key, start, end), break where the key changes or start exceeds the
    key's running max end, return one (key, start, end) row per merged
    island. Requires e >= s. Island max-end == the grouped cummax at the
    island's last row: an island opens only when its first start exceeds
    every prior end in the key, so its own ends dominate the cummax from
    its first row on."""
    import pandas as _pd

    order = np.lexsort((e, s, k))
    k, s, e = k[order], s[order], e[order]
    cm = _pd.Series(e).groupby(_pd.Series(k)).cummax().to_numpy(np.int64)
    brk = np.r_[True, (k[1:] != k[:-1]) | (s[1:] > cm[:-1])]
    last = np.r_[brk[1:], True]
    return k[brk], s[brk], cm[last]


def interval_coverage(ds, key_col: str = "user_id", start_col: str = "s_us",
                      end_col: str = "e_us", buckets: int = 64):
    """Per key, the total length of the UNION of its half-open [start, end)
    intervals (overlaps merged, containments collapsed) and the number of
    disjoint merged islands -- total-active-time / coverage, the sweep
    query behind SLA uptime, ad-exposure and session-overlap reports.

    Scale shape: interval union is associative, so each batch collapses
    map-side to its MERGED islands first (_union_islands) -- the ONE hash
    exchange ships islands, never raw intervals (a key with 10k
    overlapping events exchanges a handful of rows); the per-bucket final
    pass re-merges across batches and aggregates with one vectorized
    sweep shared by all keys in the bucket (no per-key loop). Matches the
    SQL MAX-OVER-preceding islands replay exactly (integer microseconds).

    Returns (key, covered_us, n_islands).
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if e.size and (e < s).any():
            raise ValueError("interval_coverage: end < start interval")
        k, s, e = _union_islands(k, s, e)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "e": pa.array(e, pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def sweep(group: pd.DataFrame) -> pd.DataFrame:
        k, s, e = _union_islands(
            group[key_col].to_numpy(np.int64),
            group["s"].to_numpy(np.int64),
            group["e"].to_numpy(np.int64),
        )
        first = np.r_[True, k[1:] != k[:-1]]
        seg = np.cumsum(first) - 1
        return pd.DataFrame(
            {
                key_col: k[first],
                "covered_us": np.bincount(seg, weights=e - s).astype(np.int64),
                "n_islands": np.bincount(seg).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sweep, batch_format="pandas")
    )


def peak_concurrency(ds, key_col: str = "user_id", start_col: str = "s_us",
                     end_col: str = "e_us", buckets: int = 64):
    """Per key, the MAXIMUM number of simultaneously-open half-open
    [start, end) intervals and the first instant it is reached -- peak
    concurrent sessions / max parallel requests, the sweep-line dual of
    ``interval_coverage``.

    Half-open semantics: an interval ending at t does not overlap one
    starting at t, so at equal timestamps ends settle before starts --
    encoded by summing START(+1)/END(-1) deltas to ONE NET ROW per
    (key, t) map-side (the dip-then-rise within a timestamp never exceeds
    max(before, after), so the net-collapsed running max equals the
    uncollapsed one; net-0 rows are KEPT because they can still be where
    the peak time is first attained). The ONE hash exchange is therefore
    distinct-(key, t)-domain sized, never event-row sized; the per-bucket
    final pass re-nets across batches and runs one vectorized
    segment-cumsum sweep shared by all keys (no per-key loop).

    Returns (key, peak, peak_at_us) -- peak_at_us is the earliest t whose
    running count equals the peak, deterministic by construction.
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if e.size and (e < s).any():
            raise ValueError("peak_concurrency: end < start interval")
        kk = np.concatenate([k, k])
        tt = np.concatenate([s, e])
        dd = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        order = np.lexsort((tt, kk))
        kk, tt, dd = kk[order], tt[order], dd[order]
        first = np.r_[True, (kk[1:] != kk[:-1]) | (tt[1:] != tt[:-1])]
        idx = np.flatnonzero(first)
        net = np.add.reduceat(dd, idx)
        return pa.table(
            {
                key_col: pa.array(kk[first], pa.int64()),
                "t": pa.array(tt[first], pa.int64()),
                "d": pa.array(net, pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def sweep(group: pd.DataFrame) -> pd.DataFrame:
        kk = group[key_col].to_numpy(np.int64)
        tt = group["t"].to_numpy(np.int64)
        dd = group["d"].to_numpy(np.int64)
        order = np.lexsort((tt, kk))
        kk, tt, dd = kk[order], tt[order], dd[order]
        # re-net duplicate (key, t) rows arriving from different batches
        first = np.r_[True, (kk[1:] != kk[:-1]) | (tt[1:] != tt[:-1])]
        idx = np.flatnonzero(first)
        kk, tt = kk[first], tt[first]
        dd = np.add.reduceat(dd, idx)
        total = np.cumsum(dd)
        seg_first = np.r_[True, kk[1:] != kk[:-1]]
        seg_idx = np.flatnonzero(seg_first)
        counts = np.diff(np.r_[seg_idx, len(kk)])
        run = total - np.repeat(total[seg_idx] - dd[seg_idx], counts)
        peak = np.maximum.reduceat(run, seg_idx)
        at_peak = run == np.repeat(peak, counts)
        hit = np.flatnonzero(at_peak)
        seg_of_hit = np.repeat(np.arange(len(seg_idx)), counts)[hit]
        # t ascends within a key, so the first hit per segment is min t
        first_hit = np.unique(seg_of_hit, return_index=True)[1]
        return pd.DataFrame(
            {
                key_col: kk[seg_idx],
                "peak": peak,
                "peak_at_us": tt[hit[first_hit]],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sweep, batch_format="pandas")
    )


def _daily_last_partial(batch: pa.Table, key_col: str, ts_col: str,
                        val_col: str, id_col: str) -> pa.Table:
    """Map-side collapse shared by the daily-state operators
    (forward_fill_daily, scd2_history): ONE candidate row per (key, day) --
    the batch's argmax by (ts, id) -- with the value floored to integer
    cents. (ts_us, id) ride along so reducers can resolve the argmax
    across batches; the exchange is activity-domain sized."""
    keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ts_us = batch.column(ts_col).cast(pa.int64()).to_numpy()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    cents = np.floor(
        batch.column(val_col).to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    day = ts_us // 86_400_000_000
    # keep the last (ts, id) row per (key, day): lexsort ascending, a
    # (key, day) group's winner is its final row
    order = np.lexsort((ids, ts_us, day, keys))
    k, d, t, i, c = keys[order], day[order], ts_us[order], ids[order], cents[order]
    last = np.r_[(k[1:] != k[:-1]) | (d[1:] != d[:-1]), True]
    return pa.table(
        {
            key_col: pa.array(k[last], pa.int64()),
            "day": pa.array(d[last], pa.int64()),
            "ts_us": pa.array(t[last], pa.int64()),
            id_col: pa.array(i[last], pa.int64()),
            "cents": pa.array(c[last], pa.int64()),
        }
    )


def forward_fill_daily(ds, key_col: str = "user_id", ts_col: str = "ts",
                       val_col: str = "value", id_col: str = "event_id",
                       buckets: int = 64):
    """Calendar densification + forward fill: per key, the last observed
    value of each day (ties broken by event id), densified over the key's
    own [first_day, last_day] span with missing days carried forward --
    the state-reconstruction query behind every "daily balance" /
    "last-known-status per day" dashboard (reference analogue: the
    manager's per-URL counters are exactly last-write-wins state,
    Manager.java:49-60, rebuilt here as a calendar series).

    Scale shape: each batch collapses map-side to ONE candidate row per
    (key, day) -- argmax by (ts, id) inside the batch -- so the single
    hash exchange is activity-domain sized, never event-row sized. The
    per-bucket kernel is fully vectorized and shared by all keys in the
    bucket: resolve cross-batch argmax with one lexsort + keep-last, build
    every key's day grid with np.repeat/arange (the sliding_windows
    explode pattern), and fill via ONE np.searchsorted over an ordinal
    (key, day) composite -- no per-key loop. Output is bounded by
    sum(per-key day spans), the operator's contract; values are integer
    cents so the DuckDB IGNORE NULLS window oracle compares exactly.

    Returns (key, day, value_cents, observed) -- observed=1 where the day
    had a real event, 0 where the value was carried forward.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _daily_last_partial(batch, key_col, ts_col, val_col, id_col)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def fill(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        d = group["day"].to_numpy(np.int64)
        t = group["ts_us"].to_numpy(np.int64)
        i = group[id_col].to_numpy(np.int64)
        c = group["cents"].to_numpy(np.int64)
        # resolve the cross-batch argmax per (key, day)
        order = np.lexsort((i, t, d, k))
        k, d, c = k[order], d[order], c[order]
        last = np.r_[(k[1:] != k[:-1]) | (d[1:] != d[:-1]), True]
        k, d, c = k[last], d[last], c[last]
        # per-key spans -> dense grid (keys arrive sorted within the bucket)
        new_key = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_key)
        ends = np.r_[starts[1:], k.size] - 1
        d0, d1 = d[starts], d[ends]
        span = d1 - d0 + 1
        grid_key = np.repeat(k[starts], span)
        base = np.repeat(d0, span)
        off = np.arange(span.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(span)[:-1])), span
        )
        grid_day = base + off
        # ordinal composite: both sides sorted by (key, day), every grid day
        # >= its key's first observed day, so searchsorted-right-1 lands on
        # the last observation at-or-before each grid day
        u_ord = np.cumsum(new_key) - 1
        lo, hi = d.min(), d.max()
        width = hi - lo + 2
        obs_comp = u_ord * width + (d - lo)
        grid_comp = np.repeat(u_ord[starts], span) * width + (grid_day - lo)
        idx = np.searchsorted(obs_comp, grid_comp, side="right") - 1
        return pd.DataFrame(
            {
                key_col: grid_key,
                "day": grid_day,
                "value_cents": c[idx],
                "observed": (obs_comp[idx] == grid_comp).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fill, batch_format="pandas")
    )


def event_transitions(ds, key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", id_col: str = "event_id",
                      buckets: int = 64):
    """Markov transition counts: for each key's event stream ordered by
    (ts, id), count every consecutive (prev_type -> next_type) pair -- the
    clickstream LAG query behind next-action models and funnel diagnostics.

    Scale shape: LAG needs per-key order, so the narrow (key, ts, id, type)
    projection takes ONE key-domain exchange (the sessionize/debounce
    shape -- no map-side collapse exists for an ordering operator). Each
    bucket then runs one vectorized pass shared by all its keys (sort +
    shifted-compare mask + factorized bincount), emitting per-bucket
    partial counts; the final groupby merges <= |types|^2 rows per bucket,
    so the second exchange is vocabulary-sized, not event-sized.

    Returns (prev_type, next_type, n) over pairs within the same key.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(
            batch.select([key_col, ts_col, id_col, type_col]), key_col, buckets
        )

    def transitions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, id_col], kind="mergesort")
        k = g[key_col].to_numpy()
        t = g[type_col].to_numpy()
        same = k[1:] == k[:-1]
        prev, nxt = t[:-1][same], t[1:][same]
        if prev.size == 0:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "next_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        cats, codes_p = np.unique(prev, return_inverse=True)
        cats2, codes_n = np.unique(nxt, return_inverse=True)
        pair = codes_p.astype(np.int64) * len(cats2) + codes_n
        counts = np.bincount(pair, minlength=len(cats) * len(cats2))
        hit = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "prev_type": cats[hit // len(cats2)],
                "next_type": cats2[hit % len(cats2)],
                "n": counts[hit].astype(np.int64),
            }
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(transitions, batch_format="pandas")
    )
    return tiny_final_groupby(
        partials,
        keys=["prev_type", "next_type"],
        aggs=[("n", "sum")],
        out_names=["prev_type", "next_type", "n"],
    )


def scd2_history(ds, key_col: str = "user_id", ts_col: str = "ts",
                 val_col: str = "value", id_col: str = "event_id",
                 buckets: int = 64):
    """Slowly-changing-dimension type-2 compaction: per key, collapse the
    daily last-observed value stream into CHANGE intervals
    (valid_from_day, valid_to_day, value_cents) -- a new row only where the
    value actually changed, the open interval marked valid_to_day = -1.
    This is forward_fill_daily's compact dual: densify reconstructs state
    per day, SCD2 stores only the transitions (the warehouse history-table
    shape; reference analogue: the manager's last-write-wins counters,
    Manager.java:49-60, kept as versioned history instead).

    Scale shape: identical to forward_fill_daily -- the shared
    _daily_last_partial collapses each batch to one candidate per
    (key, day), ONE activity-domain exchange, then a vectorized
    change-mask + shifted-lookahead pass per bucket (no per-key loop).
    Output is bounded by the number of value CHANGES, <= observations.

    Returns (key, valid_from_day, valid_to_day, value_cents); an interval
    covers [valid_from_day, valid_to_day) in days, -1 = still current.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _daily_last_partial(batch, key_col, ts_col, val_col, id_col)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def compact(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        d = group["day"].to_numpy(np.int64)
        t = group["ts_us"].to_numpy(np.int64)
        i = group[id_col].to_numpy(np.int64)
        c = group["cents"].to_numpy(np.int64)
        # resolve the cross-batch argmax per (key, day)
        order = np.lexsort((i, t, d, k))
        k, d, c = k[order], d[order], c[order]
        last = np.r_[(k[1:] != k[:-1]) | (d[1:] != d[:-1]), True]
        k, d, c = k[last], d[last], c[last]
        # change rows: first observation of a key, or value != previous day's
        new_key = np.r_[True, k[1:] != k[:-1]]
        change = new_key | np.r_[True, c[1:] != c[:-1]]
        ck, cd, cc = k[change], d[change], c[change]
        # valid_to = next change's day within the same key, else -1 (open)
        nxt_day = np.r_[cd[1:], -1]
        nxt_same = np.r_[ck[1:] == ck[:-1], False]
        valid_to = np.where(nxt_same, nxt_day, -1)
        return pd.DataFrame(
            {
                key_col: ck,
                "valid_from_day": cd,
                "valid_to_day": valid_to,
                "value_cents": cc,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(compact, batch_format="pandas")
    )


def collect_sorted_list(ds, key_col: str, val_col: str, out_col: str,
                        buckets: int = 64):
    """Grouped ordered collect: per key, the DISTINCT values sorted
    ascending and joined with ',' -- the string_agg / collect_list surface
    (training-data analogue: concatenating a document's chunk ids in order;
    reference analogue: the manager's per-app result assembly,
    Manager.java:250-293, which concatenates per-URL blobs into one
    summary). Distinct-sorted semantics make the result deterministic at
    any partitioning even when the raw rows carry duplicates.

    Scale shape: each batch collapses map-side to its DISTINCT (key, value)
    pairs (np.unique on the pair matrix), so the ONE hash exchange is
    pair-domain sized; the per-bucket kernel re-uniques across batches in
    one vectorized pass and builds all keys' strings with a single
    pandas str-join per bucket (strings are Python objects -- the join is
    the operator's output payload, not avoidable compute).

    Returns (key, n_values, values_csv).
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([k, v], axis=1), axis=0)
        return pa.table(
            {
                key_col: pa.array(pairs[:, 0], pa.int64()),
                val_col: pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        arr = np.unique(
            np.stack(
                [group[key_col].to_numpy(np.int64), group[val_col].to_numpy(np.int64)],
                axis=1,
            ),
            axis=0,
        )
        k, v = arr[:, 0], arr[:, 1]
        df = pd.DataFrame({key_col: k, "v": v.astype(str)})
        g = df.groupby(key_col, sort=True)["v"]
        return pd.DataFrame(
            {
                key_col: g.count().index.to_numpy(np.int64),
                "n_values": g.count().to_numpy(np.int64),
                out_col: g.agg(",".join).to_numpy(object),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(collect, batch_format="pandas")
    )


def rolling_range_sum(ds, key_col: str = "user_id", ts_col: str = "ts",
                      val_col: str = "value", window_days: int = 7,
                      buckets: int = 64):
    """Trailing range-window aggregate: per key and active day, the sum of
    the key's daily totals over the last ``window_days`` calendar days
    (RANGE BETWEEN n-1 PRECEDING AND CURRENT ROW on the day axis) -- the
    rolling-7-day-spend query, computed WITHOUT densifying the calendar.

    Scale shape: each batch collapses map-side to per-(key, day) partial
    sums (activity-domain, integer cents), ONE key-domain exchange, then a
    per-bucket kernel shared by every key in the bucket: resolve daily
    sums with one np.add.reduceat pass, then answer all windows at once
    with a prefix-sum + ONE np.searchsorted over an ordinal (key, day)
    composite padded so a window can never cross a key boundary. No
    per-key loop, no calendar explode -- cost is O(active days), not
    O(span).

    Returns (key, day, day_cents, sum_window_cents).
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = batch.column(ts_col).cast(pa.int64()).to_numpy()
        c = np.floor(
            batch.column(val_col).to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        day = ts_us // 86_400_000_000
        order = np.lexsort((day, k))
        k, day, c = k[order], day[order], c[order]
        first = np.r_[True, (k[1:] != k[:-1]) | (day[1:] != day[:-1])]
        sums = np.add.reduceat(c, np.flatnonzero(first))
        return pa.table(
            {
                key_col: pa.array(k[first], pa.int64()),
                "day": pa.array(day[first], pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def roll(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        d = group["day"].to_numpy(np.int64)
        c = group["cents"].to_numpy(np.int64)
        order = np.lexsort((d, k))
        k, d, c = k[order], d[order], c[order]
        first = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
        k, d = k[first], d[first]
        c = np.add.reduceat(c, np.flatnonzero(first))
        # ordinal composite padded by the window width: a window's lower
        # bound can reach day - (w-1), which must still map inside the SAME
        # key's ordinal range
        new_key = np.r_[True, k[1:] != k[:-1]]
        u_ord = np.cumsum(new_key) - 1
        lo, hi = d.min(), d.max()
        width = (hi - lo + 1) + window_days + 1
        comp = u_ord * width + (d - lo) + window_days  # shift keeps lows positive
        start = np.searchsorted(comp, comp - (window_days - 1), side="left")
        prefix = np.cumsum(c)
        win = prefix - np.where(start > 0, prefix[start - 1], 0)
        # rows where start == 0 include everything from index 0 -- correct,
        # prefix[i] is already the inclusive sum from the bucket's first row
        return pd.DataFrame(
            {
                key_col: k,
                "day": d,
                "day_cents": c,
                "sum_window_cents": win,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(roll, batch_format="pandas")
    )


def conversion_within(ds, key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", from_type: str = "click",
                      to_type: str = "purchase",
                      window_us: int = 7 * 86_400_000_000, buckets: int = 64):
    """Time-constrained conversion attribution: per key, how many
    ``from_type`` events were FOLLOWED by a ``to_type`` event strictly
    later but within ``window_us`` -- the click->purchase-within-7-days
    query behind every attribution / conversion-rate report. Counts each
    from-event once toward ``n_converted`` (any qualifying to-event) and
    every qualifying (from, to) pair toward ``n_pairs``.

    Scale shape: only the two event types survive the map-side projection
    (everything else never leaves the scan); ONE key-domain hash exchange
    co-locates a key's events; the per-bucket kernel answers ALL
    from-events at once with two np.searchsorted calls over a
    window-padded (key, t) ordinal composite (the rolling_range_sum
    discipline: padding keeps a window from crossing a key boundary; a
    loud guard raises if keys x time-span would overflow the composite --
    the buckets knob is the fix). No per-key loop, no pair materialization.

    Returns (key, n_from, n_converted, n_pairs) for keys with >= 1
    from-event.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        types = batch.column(type_col)
        keep = pc.or_(pc.equal(types, from_type), pc.equal(types, to_type))
        b = batch.filter(keep)
        side = pc.equal(b.column(type_col), to_type)  # False=from, True=to
        return pa.table(
            {
                key_col: b.column(key_col).cast(pa.int64()),
                "t": b.column(ts_col).cast(pa.int64()),
                "side": side.combine_chunks().cast(pa.int8()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def kern(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        t = group["t"].to_numpy(np.int64)
        side = group["side"].to_numpy(np.int8)
        uk, inv = np.unique(k, return_inverse=True)
        lo = t.min()
        width = (t.max() - lo + 1) + window_us + 1
        if len(uk) and width > (2**62) // len(uk):
            raise ValueError(
                "conversion_within: key-count x time-span overflows the "
                "ordinal composite; raise `buckets`"
            )
        comp = inv.astype(np.int64) * width + (t - lo)
        is_from = side == 0
        to_comp = np.sort(comp[~is_from])
        fc = comp[is_from]
        # to-events strictly after t, at most window_us later
        m = (
            np.searchsorted(to_comp, fc + window_us, side="right")
            - np.searchsorted(to_comp, fc, side="right")
        )
        fk = inv[is_from]
        if not fk.size:  # bucket held only to-events: no keys to report
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=np.int64),
                    "n_from": pd.Series([], dtype=np.int64),
                    "n_converted": pd.Series([], dtype=np.int64),
                    "n_pairs": pd.Series([], dtype=np.int64),
                }
            )
        order = np.argsort(fk, kind="stable")
        fk, m = fk[order], m[order]
        first = np.r_[True, fk[1:] != fk[:-1]]
        idx = np.flatnonzero(first)
        return pd.DataFrame(
            {
                key_col: uk[fk[first]],
                "n_from": np.diff(np.r_[idx, len(fk)]).astype(np.int64),
                "n_converted": np.add.reduceat((m > 0).astype(np.int64), idx),
                "n_pairs": np.add.reduceat(m, idx),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kern, batch_format="pandas")
    )


def _range_offsets(ds, val_col: str, buckets: int | None):
    """Shared pass 1 of the global total-order operators (``global_rank``,
    ``global_ntile``): per-batch (min, max, count) partials give the value
    range; a fixed-width value-bin histogram's exclusive prefix sum is
    each bin's global row offset, broadcast ONCE via ``ray.put``. Ties
    share a value, hence a bin, so no ordered quantity ever crosses a
    partition. Returns (lo, width, n_rows, buckets, offsets ObjectRef).
    """
    import ray

    def minmax(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col)).to_numpy()
        return pa.table({"lo": [int(c.min())], "hi": [int(c.max())], "n": [len(c)]})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo, hi, n = int(mm["lo"].min()), int(mm["hi"].max()), int(mm["n"].sum())
    if buckets is None:
        buckets = derive_buckets(n)
    width = max(1, (hi - lo + buckets) // buckets)  # ceil; last bin holds hi

    def bin_counts(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col)).to_numpy()
        b = (c - lo) // width
        cnt = np.bincount(b, minlength=buckets)
        hit = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(hit, pa.int64()),
                         "n": pa.array(cnt[hit], pa.int64())})

    hist = (
        ds.map_batches(bin_counts, batch_format="pyarrow")
        .to_pandas().groupby("bin")["n"].sum()
    )
    offsets = np.zeros(buckets, dtype=np.int64)
    offsets[hist.index.to_numpy()] = hist.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    return lo, width, n, buckets, ray.put(offsets)


def global_rank(ds, val_col: str, id_col: str, buckets: int | None = None):
    """Global RANK() over the WHOLE table ordered by ``val_col`` (integer
    cents), 0-based, tie-min -- the total-order window no per-group
    bucketing can express (percent_rank_by_group co-locates a GROUP per
    bucket; here the single group IS the table).

    The distributed shape is two passes + range partitioning:

    1. pass 1 (narrow, cheap): per-batch (min, max, count) partials -> one
       tiny reduce gives the value range and row count;
    2. rows are range-partitioned into fixed-width value bins (ties share a
       value, hence a bin, so tie-min never crosses a partition); a
       per-batch bincount partial -> tiny reduce gives each bin's row
       count, whose exclusive prefix sum is each bin's global rank offset,
       broadcast once via ``ray.put``;
    3. pass 2: ONE range exchange, then each bin sorts locally and emits
       offset + local tie-min rank -- vectorized, no per-key loop.

    Fixed-width bins assume rough value uniformity; under heavy value skew
    the scale path re-splits hot bins from the same histogram (the
    derive_buckets discipline) -- documented, not needed on this data.
    ``ds`` is consumed twice; pass a cheap re-executable read (a parquet
    scan), not a computed pipeline.

    Returns (id_col, value_cents, rank0).
    """
    import ray

    lo, width, n, buckets, handle = _range_offsets(ds, val_col, buckets)

    def add_bin(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col))
        b = (c.to_numpy() - lo) // width
        return pa.table(
            {
                id_col: batch.column(id_col),
                "value_cents": c,
                "__bucket": pa.array(b.astype(np.int32), pa.int32()),
            }
        )

    def rank_bin(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)  # local object-store hit, zero-copy numpy
        v = group["value_cents"].to_numpy(np.int64)
        ids = group[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, v))
        v, ids = v[order], ids[order]
        # tie-min local rank: position of the first row sharing the value
        new_val = np.r_[True, v[1:] != v[:-1]]
        local = np.maximum.accumulate(np.where(new_val, np.arange(len(v)), -1))
        base = offs[int((v[0] - lo) // width)]
        return pd.DataFrame({id_col: ids, "value_cents": v, "rank0": base + local})

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(rank_bin, batch_format="pandas")
    )


def fulfillment_latency(sf_dir: str, buckets: int = 64):
    """Order-fulfillment SLA report: per order priority, the exact p50 and
    p90 of (last ship day - order day) in days -- the join-then-quantile
    every ops dashboard runs. The latency domain is small bounded integers
    (days), so the exact grouped quantile needs NO bisection or sort: a
    (priority, latency) count table IS the sufficient statistic.

    Scale shape: both tables project narrow map-side and co-locate with
    ONE orderkey-domain hash exchange (an order's lineitems land with its
    order row); the per-bucket kernel resolves each order's MAX ship day
    vectorized (factorize + maximum.at), subtracts the order day, and
    emits (priority, latency) COUNT partials -- the second exchange is the
    tiny bounded count table; the single final block reads quantiles off
    cumulative counts. Orders with no lineitems drop (inner semantics).

    Returns (o_orderpriority, n_orders, p50_days, p90_days).
    """
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "day": pa.array(
                    batch.column("o_orderdate").cast(pa.int64()).to_numpy()
                    // 86_400_000_000, pa.int64()),
                "pri": batch.column("o_orderpriority"),
                "side": pa.array([0] * batch.num_rows, pa.int8()),
            }
        )
        return hash_bucket_column(t, "okey", buckets)

    def tag_items(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "day": pa.array(
                    batch.column("l_shipdate").cast(pa.int64()).to_numpy()
                    // 86_400_000_000, pa.int64()),
                "pri": pa.nulls(batch.num_rows, pa.string()),
                "side": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )
        return hash_bucket_column(t, "okey", buckets)

    def latency_counts(group: pd.DataFrame) -> pd.DataFrame:
        side = group["side"].to_numpy(np.int8)
        ok = group["okey"].to_numpy(np.int64)
        day = group["day"].to_numpy(np.int64)
        is_o = side == 0
        o_key, o_day = ok[is_o], day[is_o]
        o_pri = group["pri"].to_numpy()[is_o]
        l_key, l_day = ok[~is_o], day[~is_o]
        # per-order max ship day, vectorized over all orders in the bucket
        uo = np.sort(np.unique(o_key))
        pos = np.searchsorted(uo, l_key)
        hit = (pos < len(uo)) & (uo[np.clip(pos, 0, len(uo) - 1)] == l_key)
        mx = np.full(len(uo), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, pos[hit], l_day[hit])
        opos = np.searchsorted(uo, o_key)
        lat = mx[opos] - o_day
        keep = mx[opos] != np.iinfo(np.int64).min  # orders with >= 1 item
        df = pd.DataFrame({"pri": o_pri[keep], "lat": lat[keep]})
        c = df.groupby(["pri", "lat"], sort=False).size().rename("n").reset_index()
        return c

    merged = (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(items.map_batches(tag_items, batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(latency_counts, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import math

        df = batch.to_pandas().groupby(["pri", "lat"], sort=True)["n"].sum().reset_index()
        out = {"o_orderpriority": [], "n_orders": [], "p50_days": [], "p90_days": []}
        for pri, g in df.groupby("pri", sort=True):
            lat = g["lat"].to_numpy(np.int64)
            cum = g["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            out["o_orderpriority"].append(pri)
            out["n_orders"].append(n)
            out["p50_days"].append(int(lat[np.searchsorted(cum, math.ceil(0.5 * n))]))
            out["p90_days"].append(int(lat[np.searchsorted(cum, math.ceil(0.9 * n))]))
        return pa.table(
            {
                "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
                "n_orders": pa.array(out["n_orders"], pa.int64()),
                "p50_days": pa.array(out["p50_days"], pa.int64()),
                "p90_days": pa.array(out["p90_days"], pa.int64()),
            }
        )

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None)


def period_over_period(ds, ts_col: str = "o_orderdate",
                       val_col: str = "o_totalprice", period_days: int = 7):
    """Period-over-period report: value summed per period (epoch-aligned
    ``period_days`` windows) with the previous EXISTING period's total and
    the delta -- the week-over-week growth table every dashboard opens
    with. Gap periods are skipped, matching SQL LAG over the aggregated
    rows (not a calendar join). All integer cents: no ratio, no float.

    Scale shape: per-batch (period, cents-sum) collapse -> the
    tiny-final-groupby merge (period domain is bounded: ~52 rows/year at
    ANY corpus size) -> single-block sort + shift for prev/delta.

    Returns (period, rev_cents, prev_cents, delta_cents); the first
    period's prev is 0 (COALESCE semantics).
    """
    period_us = 86_400_000_000 * int(period_days)

    def partial(batch: pa.Table) -> pa.Table:
        p = batch.column(ts_col).cast(pa.int64()).to_numpy() // period_us
        c = _cents(batch.column(val_col)).to_numpy()
        up, inv = np.unique(p, return_inverse=True)
        s = np.zeros(len(up), np.int64)
        np.add.at(s, inv, c)
        return pa.table({"period": pa.array(up, pa.int64()),
                         "rev": pa.array(s, pa.int64())})

    def lag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("period", sort=True)["rev"].sum()
        rev = df.to_numpy(np.int64)
        prev = np.r_[0, rev[:-1]]
        return pa.table(
            {
                "period": pa.array(df.index.to_numpy(np.int64), pa.int64()),
                "rev_cents": pa.array(rev, pa.int64()),
                "prev_cents": pa.array(prev, pa.int64()),
                "delta_cents": pa.array(rev - prev, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(lag, batch_format="pyarrow", batch_size=None)
    )


def spike_days(ds, ts_col: str = "ts", val_col: str = "value",
               window: int = 28, min_prev: int = 7, mult: int = 2):
    """Daily anomaly flags: a day is a SPIKE when its total exceeds
    ``mult`` x the mean of the previous up-to-``window`` observed days
    (at least ``min_prev`` of them, else no verdict) -- the monitoring
    alert behind every pipeline-health dashboard. The comparison is the
    cross-multiplied integer form ``rev * n_prev > mult * sum_prev``: no
    float mean, no rounding boundary.

    Scale shape: per-batch (day, cents) collapse -> bounded day domain ->
    single-block vectorized prefix-sum sliding window (ROWS semantics:
    previous OBSERVED days, matching SQL ROWS BETWEEN ... PRECEDING).

    Returns (day, rev_cents, spike 0/1).
    """

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column(ts_col).cast(pa.int64()).to_numpy() // 86_400_000_000
        c = _cents(batch.column(val_col)).to_numpy()
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), np.int64)
        np.add.at(s, inv, c)
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "rev": pa.array(s, pa.int64())})

    def flag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("day", sort=True)["rev"].sum()
        day = df.index.to_numpy(np.int64)
        rev = df.to_numpy(np.int64)
        cum = np.concatenate(([0], np.cumsum(rev)))
        i = np.arange(len(rev))
        lo = np.maximum(0, i - window)
        n_prev = i - lo
        sum_prev = cum[i] - cum[lo]
        spike = ((n_prev >= min_prev)
                 & (rev * n_prev > mult * sum_prev)).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "rev_cents": pa.array(rev, pa.int64()),
                "spike": pa.array(spike, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(flag, batch_format="pyarrow", batch_size=None)
    )


def gini_ppm(ds, val_col: str, buckets: int | None = None) -> int:
    """Gini coefficient of a value column in parts-per-million -- the
    inequality / concentration measure (how skewed is revenue across
    orders, token mass across documents). Uses the rank formulation
    ``G = (2 * sum(r_i * x_i) - (n + 1) * sum(x)) / (n * sum(x))`` with
    1-based ranks ``r_i`` over ascending values: every term is an INTEGER
    on cents, so the result is one exact floor-division -- no float
    anywhere, replayable verbatim in SQL (HUGEINT on the oracle side).

    Scale shape: the ``_range_offsets`` discipline -- the histogram prefix
    sum makes each row's global rank computable inside its value bin, so
    each bin emits ONE partial row: (sum of cents, sum of rank x cents).
    The rank-product sum passes 2^63 long before 100 TB does, so it is
    accumulated exactly as ``base * sum(v) + sum(local_rank * v)`` -- the
    base term in Python arbitrary precision, the local term vectorized
    int64 in 2^17-row chunks (max 2^17 * 2^45 < 2^63 per chunk) -- and
    shipped as a DECIMAL STRING column; the driver folds a handful of rows
    with Python ints. Rank ties share a value, hence a bin; within a bin
    ties take consecutive ranks, which the Gini sum is invariant to
    (equal x, consecutive r). Returns int ppm.
    """
    import ray

    lo, width, n, buckets, handle = _range_offsets(ds, val_col, buckets)

    def add_bin(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col))
        b = (c.to_numpy() - lo) // width
        return pa.table(
            {
                "value_cents": c,
                "__bucket": pa.array(b.astype(np.int32), pa.int32()),
            }
        )

    def bin_sums(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)
        v = np.sort(group["value_cents"].to_numpy(np.int64))
        base = int(offs[int((v[0] - lo) // width)])
        s1 = int(v.sum())
        local = np.arange(1, len(v) + 1, dtype=np.int64)
        s2 = (base) * s1  # Python int: base can be ~n
        for i in range(0, len(v), 1 << 17):
            s2 += int((local[i:i + (1 << 17)] * v[i:i + (1 << 17)]).sum())
        return pd.DataFrame({"s1": [s1], "s2": [str(s2)]})

    parts = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bin_sums, batch_format="pandas")
        .to_pandas()
    )
    s1 = int(parts["s1"].sum())
    s2 = sum(int(x) for x in parts["s2"])
    if s1 <= 0:
        raise ValueError("gini_ppm: non-positive value sum")
    return (2 * s2 - (n + 1) * s1) * 1_000_000 // (n * s1)


def global_ntile(ds, val_col: str, id_col: str, n_tiles: int = 10,
                 buckets: int | None = None):
    """Equi-depth global binning -- NTILE(n) OVER (ORDER BY value, id) --
    the decile/percentile bucketing behind feature quantization and
    monotone binning. A naive NTILE needs one global sort; the distributed
    shape reuses ``_range_offsets``: the histogram prefix sum makes every
    row's global ROW_NUMBER computable inside its value bin (ties break by
    id WITHIN a bin -- equal values never cross bins), and the NTILE tile
    is closed-form arithmetic on that row number (first ``n % n_tiles``
    tiles get the extra row, SQL semantics). Emits a per-bin per-tile
    partial (min/max/sum/count via one reduceat each -- tile ids ascend
    with the sorted values, so segments are contiguous) and merges in a
    single tiny final block: the exchange is ~buckets x n_tiles rows.

    Returns (tile 1-based, n_rows, min_cents, max_cents, sum_cents).
    """
    import ray

    if n_tiles < 1:
        raise ValueError("global_ntile: n_tiles must be >= 1")
    lo, width, n, buckets, handle = _range_offsets(ds, val_col, buckets)
    q, r = divmod(n, n_tiles)
    boundary = r * (q + 1)

    def add_bin(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col))
        b = (c.to_numpy() - lo) // width
        return pa.table(
            {
                id_col: batch.column(id_col),
                "value_cents": c,
                "__bucket": pa.array(b.astype(np.int32), pa.int32()),
            }
        )

    def tile_bin(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)
        v = group["value_cents"].to_numpy(np.int64)
        ids = group[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, v))
        v = v[order]
        base = offs[int((v[0] - lo) // width)]
        rn = base + np.arange(len(v), dtype=np.int64)  # global ROW_NUMBER, 0-based
        tile = np.where(
            rn < boundary,
            rn // (q + 1),
            r + (rn - boundary) // max(q, 1),  # q=0 => rn < boundary always
        )
        idx = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
        last = np.r_[idx[1:] - 1, len(v) - 1]
        return pd.DataFrame(
            {
                "tile": tile[idx] + 1,
                "n_rows": np.diff(np.r_[idx, len(v)]).astype(np.int64),
                "min_cents": v[idx],
                "max_cents": v[last],
                "sum_cents": np.add.reduceat(v, idx),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("tile", sort=True).agg(
            n_rows=("n_rows", "sum"), min_cents=("min_cents", "min"),
            max_cents=("max_cents", "max"), sum_cents=("sum_cents", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(df.astype(np.int64), preserve_index=False)

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(tile_bin, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def new_users_daily(ds, key_col: str = "user_id", ts_col: str = "ts",
                    buckets: int = 64):
    """Daily new-user counts + running cumulative distinct users -- the
    "new vs returning" growth curve. A naive COUNT(DISTINCT) per day
    re-scans every prior day; the distributed shape is first-touch: each
    key's FIRST-ever day is a per-key MIN (map-side collapsible), new
    users per day is then a count over first days, and the cumulative
    curve is a prefix sum over the bounded day domain.

    Scale shape: per-batch (key, min day) collapse -> ONE key-domain
    exchange -> per-bucket min resolve + day bincount partial (day-domain
    rows per bucket) -> single-block final merge + cumsum (day domain is
    bounded: ~365 rows/year at ANY corpus size).

    Returns (day, new_users, cum_users).
    """

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(ts_col).cast(pa.int64()).to_numpy() // 86_400_000_000
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        first = np.r_[True, k[1:] != k[:-1]]  # sorted: first row per key is min day
        return pa.table(
            {
                key_col: pa.array(k[first], pa.int64()),
                "day": pa.array(d[first], pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def day_counts(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        d = group["day"].to_numpy(np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        first = np.r_[True, k[1:] != k[:-1]]
        days, counts = np.unique(d[first], return_counts=True)
        return pd.DataFrame({"day": days, "new_users": counts.astype(np.int64)})

    def cumulate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("day", sort=True)["new_users"].sum()
        return pa.table(
            {
                "day": pa.array(df.index.to_numpy(np.int64), pa.int64()),
                "new_users": pa.array(df.to_numpy(np.int64), pa.int64()),
                "cum_users": pa.array(df.cumsum().to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(day_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(cumulate, batch_format="pyarrow", batch_size=None)
    )


def rolling_active_users(ds, key_col: str = "user_id", ts_col: str = "ts",
                         window_days: int = 30, buckets: int = 64):
    """Trailing-window distinct-key count per calendar day -- the
    "30-day active users" (MAU) curve: for every day d between the first
    and last event day, how many distinct keys had >= 1 event in
    [d - window_days + 1, d]. A naive COUNT(DISTINCT) per day re-scans a
    30-day slice of the corpus 365 times a year; the distributed shape is
    per-key coverage: an event on day a makes the key "active" for days
    [a, a + W - 1], so a key's contribution is a union of coverage
    islands (consecutive active days whose covers touch merge), and each
    island is just a +1/-1 delta pair on the day axis.

    Scale shape: per-batch distinct-(key, day) collapse (the exchange is
    activity-domain sized, never event-row sized) -> ONE key-domain hash
    exchange -> per-bucket island merge emitting netted (day, delta) rows
    (day-domain sized per bucket) -> single-block final cumsum + calendar
    expansion over the bounded day domain (~365 rows/year at ANY corpus
    size; a loud guard raises past 200k days). Zero-active gap days get
    explicit 0 rows, matching the calendar LEFT JOIN a warehouse writes.

    Returns (day, active_users) with day as epoch-days int64.
    """
    W = int(window_days)
    if W < 1:
        raise ValueError("rolling_active_users: window_days must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(ts_col).cast(pa.int64()).to_numpy() // 86_400_000_000
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
        return pa.table(
            {
                key_col: pa.array(k[keep], pa.int64()),
                "day": pa.array(d[keep], pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def deltas(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        d = group["day"].to_numpy(np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
        k, d = k[keep], d[keep]
        # covers [a, a+W-1] and [b, b+W-1] merge iff b <= a + W
        new_island = np.r_[True, (k[1:] != k[:-1]) | (d[1:] > d[:-1] + W)]
        isl_idx = np.flatnonzero(new_island)
        starts = d[isl_idx]
        last = np.r_[isl_idx[1:] - 1, len(d) - 1] if isl_idx.size else isl_idx
        ends = d[last] + W  # exclusive: first day no longer covered
        days = np.concatenate([starts, ends])
        dd = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        ud, inv = np.unique(days, return_inverse=True)
        net = np.bincount(inv, weights=dd).astype(np.int64)
        return pd.DataFrame({"day": ud, "delta": net})

    def cumulate(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "active_users": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        df = batch.to_pandas().groupby("day", sort=True)["delta"].sum()
        cd = df.index.to_numpy(np.int64)
        cum = df.to_numpy(np.int64).cumsum()
        # min delta day is the first active day; max is always a pure
        # exclusive end (= last active day + W), so the calendar is:
        lo, hi = cd[0], cd[-1] - W
        if hi - lo > 200_000:
            raise ValueError(
                "rolling_active_users: day span > 200k days -- check that "
                f"{ts_col} is a timestamp, not a raw integer"
            )
        days = np.arange(lo, hi + 1, dtype=np.int64)
        idx = np.searchsorted(cd, days, side="right") - 1
        return pa.table(
            {
                "day": pa.array(days, pa.int64()),
                "active_users": pa.array(cum[idx], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(deltas, batch_format="pandas")
        .repartition(1)
        .map_batches(cumulate, batch_format="pyarrow", batch_size=None)
    )


def zip_join_bucketed(dir_a: str, dir_b: str, key_a: str, key_b: str):
    """Zero-shuffle equi-join of two CO-PARTITIONED Lance-style tables
    (written by ``lance_like.write_bucketed`` with the same hash and
    ``n_buckets``): bucket i of A can only match bucket i of B, so the
    join is an embarrassingly parallel per-bucket-pair task -- NO exchange
    at query time; the one exchange was paid once at ingest and is
    amortized over every co-keyed join after it.

    Validates both bucketing specs (same hash fn, same n_buckets, keys as
    declared) and raises on mismatch rather than silently producing a
    wrong join. Buckets missing from either side inner-join to nothing
    and are skipped at plan time from the MANIFESTS alone.

    Returns a Dataset of A's columns + B's non-key columns (inner join);
    per-task memory is one bucket pair -- n_buckets at write time is the
    memory knob.
    """
    import ray.data as rd

    import pyarrow.parquet as _pq

    from ..sources import lance_like

    spec_a = lance_like.read_manifest(dir_a)["bucketing"]
    spec_b = lance_like.read_manifest(dir_b)["bucketing"]
    if spec_a["hash"] != spec_b["hash"] or spec_a["n_buckets"] != spec_b["n_buckets"]:
        raise ValueError(f"bucketing specs differ: {spec_a} vs {spec_b}")
    if spec_a["key"] != key_a or spec_b["key"] != key_b:
        raise ValueError("declared join keys do not match the tables' bucketing keys")
    paths_a = lance_like.bucket_paths(dir_a)
    paths_b = lance_like.bucket_paths(dir_b)
    shared = sorted(set(paths_a) & set(paths_b))
    items = [
        {"a": json.dumps(paths_a[b]), "b": json.dumps(paths_b[b])} for b in shared
    ]

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        out = []
        for _, row in batch.iterrows():  # batch_size=1: one bucket pair per task
            ta = pa.concat_tables([_pq.read_table(p) for p in json.loads(row["a"])])
            tb = pa.concat_tables([_pq.read_table(p) for p in json.loads(row["b"])])
            a = ta.to_pandas()
            b = tb.to_pandas()
            out.append(a.merge(b, left_on=key_a, right_on=key_b, how="inner"))
        df = pd.concat(out) if out else pd.DataFrame()
        if key_b != key_a and key_b in df.columns:
            df = df.drop(columns=[key_b])
        return pa.Table.from_pandas(df, preserve_index=False)

    return rd.from_items(items).map_batches(
        join_bucket, batch_format="pandas", batch_size=1
    )


def semi_join_agg(fact_ds, probe_ds, fact_key: str, probe_key: str,
                  group_col: str, broadcast_cap_bytes: int = 256 << 20,
                  anti: bool = False):
    """EXISTS semi-join + grouped count (TPC-H Q4 shape): count fact rows
    per ``group_col`` that have AT LEAST ONE match in the probe side;
    ``anti=True`` flips the mask to NOT EXISTS (rows with NO match --
    the "customers without orders" audit).
    The probe side never joins -- it collapses to its DISTINCT keys
    map-side (per-batch np.unique), is re-deduped in one driver fold, and
    ships ONCE via ``ray.put`` as a sorted int64 array probed with
    np.searchsorted per fact batch; the fact table streams.

    The distinct-key broadcast is capped (``broadcast_cap_bytes``, 8 B/key
    -- the same adaptive-cap discipline as the ngram verify path); past
    the cap the right shape is the bucketed anti/semi join
    (orphan_audit_multi's exchange) -- this raises loudly rather than
    silently OOMing the driver.

    Returns (group_col, n_matching).
    """
    import ray

    def distinct_keys(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(probe_key).to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(u, pa.int64())})

    parts = probe_ds.map_batches(distinct_keys, batch_format="pyarrow").to_pandas()
    keys = np.unique(parts["k"].to_numpy(np.int64))
    if keys.nbytes > broadcast_cap_bytes:
        raise ValueError(
            f"distinct probe keys {keys.nbytes >> 20} MB exceed the broadcast cap; "
            "use a bucketed semi-join (orphan_audit_multi shape) at this scale"
        )
    handle = ray.put(keys)

    class Probe:
        def __init__(self) -> None:
            self.keys = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            fk = batch.column(fact_key).to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.keys, fk)
            pos_safe = np.clip(pos, 0, len(self.keys) - 1)
            hit = self.keys[pos_safe] == fk
            if anti:
                hit = ~hit
            t = pa.table({group_col: batch.column(group_col).filter(pa.array(hit))})
            return t.group_by([group_col]).aggregate([([], "count_all")])

    partials = fact_ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 8))
    return tiny_final_groupby(
        partials,
        keys=[group_col],
        aggs=[("count_all", "sum")],
        out_names=[group_col, "n_matching"],
    )


def star_join_revenue(sf_dir: str):
    """Star-schema enrichment in ONE fact pass: lineitem joined to BOTH
    dimension tables (part -> brand, supplier -> nation name via the
    supplier->nation snowflake hop) inside a single ``map_batches`` stage
    -- two broadcast lookups per batch, zero shuffles for the joins, one
    bounded-domain exchange for the (brand, nation) aggregate. The
    snowflake hop is folded INTO the broadcast at build time (supplier
    rows carry the nation NAME), so the fact probe is exactly two
    searchsorted gathers regardless of dimension depth.

    Inner-join semantics on both dims: a fact row missing either key
    drops (consistent with revenue_by_nation). Returns
    (p_brand, n_name, revenue_cents, n_rows).
    """
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    n_names = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    pk = part.column("p_partkey").to_numpy()
    po = np.argsort(pk)
    sk = supp.column("s_suppkey").to_numpy()
    so = np.argsort(sk)
    lookup = {
        "p_keys": pk[po],
        "p_brand": np.array(part.column("p_brand").to_pylist(), dtype=object)[po],
        "s_keys": sk[so],
        # snowflake fold: supplier -> nation name resolved once at build
        "s_nation": np.array(
            [n_names[k] for k in supp.column("s_nationkey").to_numpy()[so]], dtype=object
        ),
    }
    handle = ray.put(lookup)

    class Probe:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lk = self.lk
            pkeys = batch.column("l_partkey").to_numpy()
            skeys = batch.column("l_suppkey").to_numpy()
            ppos = np.clip(np.searchsorted(lk["p_keys"], pkeys), 0, len(lk["p_keys"]) - 1)
            spos = np.clip(np.searchsorted(lk["s_keys"], skeys), 0, len(lk["s_keys"]) - 1)
            hit = (lk["p_keys"][ppos] == pkeys) & (lk["s_keys"][spos] == skeys)
            t = pa.table(
                {
                    "p_brand": pa.array(lk["p_brand"][ppos[hit]].tolist(), pa.string()),
                    "n_name": pa.array(lk["s_nation"][spos[hit]].tolist(), pa.string()),
                    "rev_cents": _cents(batch.column("l_extendedprice").filter(pa.array(hit))),
                }
            )
            return t.group_by(["p_brand", "n_name"]).aggregate(
                [("rev_cents", "sum"), ("rev_cents", "count")]
            )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    return tiny_final_groupby(
        ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 8)),
        ["p_brand", "n_name"],
        [("rev_cents_sum", "sum"), ("rev_cents_count", "sum")],
        ["p_brand", "n_name", "revenue_cents", "n_rows"],
    )


def json_field_stats(ds, json_col: str = "props", key: str = "k",
                     group_col: str = "event_type"):
    """Semi-structured extraction + grouped stats: pull integer field
    ``key`` out of a JSON-string column with ONE compiled vectorized regex
    per batch (pandas .str.extract -- C-speed, no per-row json.loads,
    the redact_pii discipline) and aggregate per group. The regex is
    shared character-for-character with the DuckDB regexp_extract oracle,
    so extraction semantics are pinned, not approximated. Rows where the
    field is absent drop (SQL NULL-group semantics would differ per
    engine; absence is data, not an error).

    Returns (group_col, n_rows, sum_k, min_k, max_k).
    """
    pattern = r'"' + key + r'":\s*(\d+)'

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[json_col].str.extract(pattern, expand=False)
        ok = v.notna()
        df = pd.DataFrame(
            {group_col: batch[group_col][ok], "k": v[ok].astype(np.int64)}
        )
        g = df.groupby(group_col, sort=False)["k"]
        return pd.DataFrame(
            {
                group_col: g.count().index,
                "n_rows": g.count().to_numpy(np.int64),
                "sum_k": g.sum().to_numpy(np.int64),
                "min_k": g.min().to_numpy(np.int64),
                "max_k": g.max().to_numpy(np.int64),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by([group_col]).aggregate(
            [("n_rows", "sum"), ("sum_k", "sum"), ("min_k", "min"), ("max_k", "max")]
        )
        out = out.select([group_col, "n_rows_sum", "sum_k_sum", "min_k_min", "max_k_max"])
        return out.rename_columns([group_col, "n_rows", "sum_k", "min_k", "max_k"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def cooccurrence_counts(ds, id_col: str = "user_id", cat_col: str = "event_type",
                        buckets: int = 64):
    """Audience overlap: for every unordered pair of categories, the count
    of ids that appear under BOTH (users who click AND purchase) -- the
    set-intersection matrix marketing/funnel analysis runs, computed
    without materializing any per-category id set.

    Scale shape: per-batch distinct (id, cat) collapse -> ONE id-domain
    exchange -> per-bucket vectorized pair generation over each id's
    category set (the basket_pairs size-class triu kernel on factorized
    category codes -- set sizes are bounded by |categories|, so fan-out is
    at most |cats| choose 2 per id) -> final merge of <= |cats|^2 rows per
    bucket. Returns (type_a, type_b, n_ids) with type_a < type_b.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cats = batch.column(cat_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({id_col: ids, cat_col: cats}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, id_col, buckets)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[[id_col, cat_col]].drop_duplicates()
        cats, codes = np.unique(g[cat_col].to_numpy(object), return_inverse=True)
        ids = g[id_col].to_numpy(np.int64)
        order = np.lexsort((codes, ids))
        ids, codes = ids[order], codes[order]
        brk = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, len(ids)])
        acc = np.zeros(len(cats) * len(cats), dtype=np.int64)
        for m in np.unique(sizes):
            if m < 2:
                continue
            sel = starts[sizes == m]
            M = codes[(sel[:, None] + np.arange(m)[None, :])]  # (G, m) sorted sets
            iu, ju = np.triu_indices(int(m), k=1)
            pair_code = M[:, iu].ravel() * len(cats) + M[:, ju].ravel()
            acc += np.bincount(pair_code, minlength=acc.size)
        hit = np.flatnonzero(acc)
        return pd.DataFrame(
            {
                "type_a": cats[hit // len(cats)],
                "type_b": cats[hit % len(cats)],
                "n_ids": acc[hit],
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return tiny_final_groupby(
        partials,
        keys=["type_a", "type_b"],
        aggs=[("n_ids", "sum")],
        out_names=["type_a", "type_b", "n_ids"],
    )


def daily_activity_full_outer(sf_dir: str):
    """FULL OUTER join of two independent daily aggregates -- the
    "activity calendar" reconciliation (orders/day vs events/day, zeros
    where one side is silent). Neither side ships rows to the other: each
    aggregates to its bounded day domain map-side (per-batch partials
    carrying BOTH count columns, the absent one as 0), the union of
    partials is one tiny final block, and the outer-join semantics fall
    out of the shared groupby -- no join operator, no null handling.

    Returns (day, n_orders, n_events)."""
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_partial(col: str, as_orders: bool):
        def partial(batch: pa.Table) -> pa.Table:
            day = pc.strftime(
                pc.floor_temporal(batch.column(col), unit="day"), format="%Y-%m-%d"
            )
            t = pa.table({"day": day}).group_by(["day"]).aggregate([([], "count_all")])
            n = t.column("count_all").cast(pa.int64())
            zero = pa.array([0] * t.num_rows, pa.int64())
            return pa.table(
                {
                    "day": t.column("day"),
                    "o": n if as_orders else zero,
                    "e": zero if as_orders else n,
                }
            )

        return partial

    partials = orders.map_batches(
        day_partial("o_orderdate", True), batch_format="pyarrow"
    ).union(events.map_batches(day_partial("ts", False), batch_format="pyarrow"))
    return tiny_final_groupby(
        partials, ["day"], [("o", "sum"), ("e", "sum")], ["day", "n_orders", "n_events"]
    )


def ols_trend_by_priority(sf_dir: str, epoch: str = "1992-01-01"):
    """Exact distributed simple linear regression (OLS slope of order
    value over time, per priority) -- the classic one-pass parallel
    regression: each batch ships the five sufficient statistics
    (n, Sx, Sy, Sxy, Sxx) as integer partials, the bounded-key final
    block folds them with PYTHON ints (arbitrary precision -- the fold is
    where n*Sxy - Sx*Sy leaves int64 at scale) and emits
    ``slope_ppm = sign * (1e6*|num|) // den`` -- both operands
    non-negative so truncating division is floor division in numpy,
    Python and DuckDB alike, no float anywhere.

    int64 partial safety: x = days since ``epoch`` (< 2^12), y = integer
    cents (< 2^27 for TPC-H totalprice), so per-batch Sxy < rows * 2^39;
    the explicit ``batch_size=16384`` caps that at 2^53 -- the guard that
    makes int64 partials exact no matter how large read blocks are.

    Returns (o_orderpriority, n_orders, slope_ppm); ppm of cents/day.
    """
    from datetime import date

    import ray.data as rd

    epoch_days = (date.fromisoformat(epoch) - date(1970, 1, 1)).days
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = (
            pc.cast(pc.cast(batch.column("o_orderdate"), pa.date32()), pa.int32())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            - epoch_days
        )
        y = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "pri": batch.column("o_orderpriority"),
                "one": pa.array(np.ones(len(x), np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "xy": pa.array(x * y),
                "xx": pa.array(x * x),
            }
        )
        return t.group_by(["pri"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum")]
        )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for pri, g in df.groupby("pri", sort=False):
            # Python-int fold: exact past int64 regardless of group size
            n = int(g["one_sum"].sum())
            sx, sy = int(g["x_sum"].sum()), int(g["y_sum"].sum())
            sxy, sxx = int(g["xy_sum"].sum()), int(g["xx_sum"].sum())
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            q = (10**6 * abs(num)) // den
            rows.append((pri, n, q if num >= 0 else -q))
        out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders", "slope_ppm"])
        out["n_orders"] = out["n_orders"].astype("int64")
        out["slope_ppm"] = out["slope_ppm"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def key_skew_report(ds, key_col: str):
    """Join-key skew pre-flight: the one-row report (n_keys, n_rows,
    max_n, p50_n, p99_n of per-key group size) you run BEFORE a groupby /
    join on ``key_col`` to decide whether the key needs salting -- the
    explicit skew-handling discipline the flagship applies to huge
    documents, packaged as a reusable diagnostic.

    Scale shape: per-batch ``value_counts`` partials -> ONE key-domain
    groupby-sum (the only real exchange; payload is (key, count), never
    rows) -> per-batch (size, n_keys) count partials -- the distinct
    group-SIZE domain is tiny for any real distribution -- -> single
    final block reads max and exact quantiles off cumulative counts
    (same smallest-value-with-cum>=ceil(q*n) convention as
    ``fulfillment_latency``). No sort, no bisection, no row movement.

    Returns one row: (n_keys, n_rows, max_n, p50_n, p99_n)."""
    import math

    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def key_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(key_col).combine_chunks())
        return pa.table(
            {
                "key": vc.field("values"),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    sizes = (
        ds.map_batches(key_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="n"))
    )

    def size_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("n").combine_chunks())
        return pa.table(
            {
                "sz": vc.field("values").cast(pa.int64()),
                "k": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = tiny_final_groupby(
        sizes.map_batches(size_partial, batch_format="pyarrow"),
        ["sz"], [("k", "sum")], ["sz", "k"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("sz")
        sz = df["sz"].to_numpy(np.int64)
        k = df["k"].to_numpy(np.int64)
        cum = k.cumsum()
        n_keys = int(cum[-1])
        return pa.table(
            {
                "n_keys": pa.array([n_keys], pa.int64()),
                "n_rows": pa.array([int((sz * k).sum())], pa.int64()),
                "max_n": pa.array([int(sz[-1])], pa.int64()),
                "p50_n": pa.array(
                    [int(sz[np.searchsorted(cum, math.ceil(0.5 * n_keys))])],
                    pa.int64(),
                ),
                "p99_n": pa.array(
                    [int(sz[np.searchsorted(cum, math.ceil(0.99 * n_keys))])],
                    pa.int64(),
                ),
            }
        )

    return hist.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def session_paths(
    events, gap_minutes: int = 30, partitions: int | None = None
):
    """Session path mining: counts of every consecutive event-type TRIGRAM
    inside a session (gap > ``gap_minutes`` starts a new one) -- the
    behavioral-sequence op behind "what do users do next" funnels, one
    level up from ``event_transitions``' bigrams.

    Same partition-bucketed discipline as ``session_windows``, with one
    addition the aggregates there don't need: a DETERMINISTIC total order.
    Trigram CONTENT depends on tie order (equal ts), so both sides sort by
    (ts, event_id) -- the unique event_id makes the sequence, and therefore
    the counts, partition-invariant and exactly SQL-replayable.

    Per partition (ONE user-domain exchange, one vectorized pass): sort by
    (user_id, ts, event_id), break sessions via the shared diff/cumsum
    formulation, then the trigram mask is csum[i]==csum[i+2] (csum is
    nondecreasing, so equality pins rows i..i+2 to one session); shifted
    slices + one groupby-size yield the partial counts. The event-type
    domain is bounded, so |types|^3 bounds the partial rows and licenses
    ``tiny_final_groupby``. Returns (e1, e2, e3, n_paths), every observed
    trigram -- callers top-k the tiny result if they want a leaderboard."""
    import pandas as pd

    if partitions is None:
        partitions = derive_buckets(events.count())
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def paths_partition(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(uid) < 3:
            return pd.DataFrame(
                {"e1": [], "e2": [], "e3": [], "n": []}
            ).astype({"e1": str, "e2": str, "e3": str, "n": np.int64})
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap_brk = np.concatenate(([False], (ts[1:] - ts[:-1]) > gap))
        csum = np.cumsum(new_user | gap_brk)
        mask = csum[2:] == csum[:-2]
        tri = pd.DataFrame(
            {"e1": et[:-2][mask], "e2": et[1:-1][mask], "e3": et[2:][mask]}
        )
        out = tri.groupby(["e1", "e2", "e3"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    return tiny_final_groupby(
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(paths_partition, batch_format="pandas"),
        ["e1", "e2", "e3"],
        [("n", "sum")],
        ["e1", "e2", "e3", "n_paths"],
    )


def trimmed_mean_by_group(
    ds, group_col: str, val_col: str, trim_pct: int = 5, buckets: int | None = None
):
    """Exact per-group trimmed mean (drop the ``trim_pct``% lowest and
    highest ROWS, mean the rest in integer cents) -- the robust-aggregate
    dual of ``robust_outliers``: instead of flagging the tails, it reports
    the center without them.

    Grouped extension of the ``_range_offsets`` discipline (global_rank /
    global_ntile / gini_ppm): trimming k rows off a sorted multiset only
    depends on the MULTISET (tied rows have equal value, so WHICH tied row
    is dropped cannot change the sum) -- so no global sort is needed:

    1. pass 1 (narrow): per-batch (group, min, max, count) partials -> the
       bounded group domain gives per-group n and the global cents range
       at the driver;
    2. pass 2 (narrow): per-batch (group, value-bin, count) partials ->
       the (groups x bins)-bounded histogram's per-group exclusive prefix
       sum is each (group, bin)'s starting per-group row rank, broadcast
       ONCE via ``ray.put``;
    3. pass 3: ONE bin-range exchange; each bin sorts locally per group,
       ranks rows rank0 = offset + local position, keeps rows with
       k < rn <= n - k (k = n * trim_pct // 100, per group), and emits
       (group, n_used, sum_cents) partials -> ``tiny_final_groupby``.

    Ties share a value hence a bin, so no ordered quantity crosses a
    partition. ``ds`` is consumed three times: pass a cheap re-executable
    parquet scan, not a computed pipeline (global_rank's documented rule).
    Groups whose rows are ALL trimmed (n <= 2k) vanish, exactly like the
    SQL replay's GROUP BY over an empty keep set.

    Returns (group, n_used, trimmed_sum_cents, trimmed_mean_cents)."""
    import ray

    def mm_partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col)).to_numpy()
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "c": c})
        p = df.groupby("g", sort=False)["c"].agg(["min", "max", "size"]).reset_index()
        return pa.table(
            {
                group_col: pa.array(p["g"]),
                "lo": pa.array(p["min"].to_numpy(np.int64), pa.int64()),
                "hi": pa.array(p["max"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(p["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    n_by_g = mm.groupby(group_col)["n"].sum().to_dict()
    k_by_g = {g: int(n) * trim_pct // 100 for g, n in n_by_g.items()}
    n_total = int(sum(n_by_g.values()))
    if buckets is None:
        buckets = derive_buckets(n_total)
    width = max(1, (hi - lo + buckets) // buckets)

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col)).to_numpy()
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "b": (c - lo) // width})
        p = df.groupby(["g", "b"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                group_col: pa.array(p["g"]),
                "bin": pa.array(p["b"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(p["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    hist = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = hist.groupby([group_col, "bin"])["n"].sum().reset_index()
    offsets: dict = {}
    for g, sub in hist.groupby(group_col):
        per_bin = np.zeros(buckets, dtype=np.int64)
        per_bin[sub["bin"].to_numpy()] = sub["n"].to_numpy()
        offsets[g] = np.concatenate(([0], np.cumsum(per_bin)[:-1]))
    handle = ray.put(offsets)

    def add_bin(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(val_col))
        b = (c.to_numpy() - lo) // width
        return pa.table(
            {
                group_col: batch.column(group_col),
                "cents": c,
                "__bucket": pa.array(b.astype(np.int32), pa.int32()),
            }
        )

    def trim_bin(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(handle)
        b = int(group["__bucket"].iloc[0])
        g = group[group_col].to_numpy()
        v = group["cents"].to_numpy(np.int64)
        codes, uniques = pd.factorize(g, sort=True)
        order = np.lexsort((v, codes))
        codes, v = codes[order], v[order]
        starts = np.r_[True, codes[1:] != codes[:-1]]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(len(v)), -1))
        pos = np.arange(len(v)) - run_start
        base = np.array([offs[u][b] for u in uniques], dtype=np.int64)
        rn = base[codes] + pos + 1
        nn = np.array([n_by_g[u] for u in uniques], dtype=np.int64)[codes]
        kk = np.array([k_by_g[u] for u in uniques], dtype=np.int64)[codes]
        keep = (rn > kk) & (rn <= nn - kk)
        if not keep.any():
            return pd.DataFrame({group_col: [], "n_used": [], "sum_cents": []}).astype(
                {group_col: object, "n_used": np.int64, "sum_cents": np.int64}
            )
        kept = pd.DataFrame({group_col: g[order][keep], "c": v[keep]})
        p = kept.groupby(group_col, sort=False)["c"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                group_col: p[group_col],
                "n_used": p["size"].to_numpy(np.int64),
                "sum_cents": p["sum"].to_numpy(np.int64),
            }
        )

    partials = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(trim_bin, batch_format="pandas")
    )

    # Python-int final fold (ols_trend's discipline): the per-bucket int64
    # partial sums are safe (rows/bucket x max cents < 2^63 under the
    # derive_buckets caps), but their TOTAL per group is not at 10^12 rows
    def final(batch: pa.Table) -> pa.Table:
        gs = batch.column(group_col).to_pylist()
        nu = batch.column("n_used").to_pylist()
        sc = batch.column("sum_cents").to_pylist()
        agg: dict = {}
        for g, n, s in zip(gs, nu, sc):
            a = agg.setdefault(g, [0, 0])
            a[0] += int(n)
            a[1] += int(s)
        keys = sorted(agg)
        return pa.table(
            {
                group_col: pa.array(keys),
                "n_used": pa.array([agg[g][0] for g in keys], pa.int64()),
                "trimmed_sum_cents": pa.array([agg[g][1] for g in keys], pa.int64()),
                "trimmed_mean_cents": pa.array(
                    [agg[g][1] // agg[g][0] for g in keys], pa.int64()
                ),
            }
        )

    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def top_revenue_suppliers(sf_dir: str):
    """TPC-H Q15 shape (argmax over an aggregate): revenue per supplier,
    then ONLY the supplier(s) hitting the global maximum -- the
    self-referential HAVING-MAX no single GROUP BY expresses.

    Plan: map-side revenue partials -> ``bucketed_grouped_sum`` on the
    suppkey domain (the one exchange; moves (key, cents) partials) ->
    the per-supplier table is supplier-domain bounded, so it is
    ``materialize()``-d (two consumers: the global max and the filter;
    re-deriving it would re-scan lineitem) -> per-block max partials give
    the global max at the driver (one row per block, bounded) -> map-side
    equality filter -> supplier names resolved from the broadcast small
    side (``ray.put`` once, revenue_by_nation's pattern).

    Returns (s_suppkey, s_name, revenue_cents); ties all surface, exactly
    like the SQL replay."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {"l_suppkey": batch.column("l_suppkey"), "rev": pa.array(rev, pa.int64())}
        )
        return t.group_by(["l_suppkey"]).aggregate([("rev", "sum")])

    per_supp = bucketed_grouped_sum(
        lineitem.map_batches(partial, batch_format="pyarrow"), "l_suppkey", "rev_sum"
    ).materialize()

    def block_max(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"m": pa.array([pc.max(batch.column("rev_sum")).as_py()])})

    mx = int(
        per_supp.map_batches(block_max, batch_format="pyarrow").to_pandas()["m"].max()
    )

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    names = ray.put(dict(zip(supp.column("s_suppkey").to_pylist(),
                             supp.column("s_name").to_pylist())))

    def filter_max(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev_sum").to_numpy()
        keep = rev == mx
        keys = batch.column("l_suppkey").to_numpy()[keep]
        nm = ray.get(names)
        return pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "s_name": pa.array([nm[int(k)] for k in keys], pa.string()),
                "revenue_cents": pa.array(rev[keep], pa.int64()),
            }
        )

    return per_supp.map_batches(filter_max, batch_format="pyarrow")


def big_volume_orders(sf_dir: str, min_qty_cents: int = 150_00):
    """TPC-H Q18 shape (HAVING then join back): orders whose TOTAL lineitem
    quantity exceeds a threshold, with the order's price attached -- the
    aggregate-filter-rejoin that trips naive plans into re-scanning.

    Plan: map-side (orderkey, qty_cents) partials -> ``bucketed_grouped_sum``
    (orderkey-domain exchange) -> map-side threshold filter (the survivor
    set is tiny by construction) -> ONE bucketed hash join back to the
    narrow orders projection. Quantities compare in integer cents, so the
    HAVING boundary is exact on both sides.

    Returns (o_orderkey, total_qty_cents, price_cents)."""
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        q = _cents(batch.column("l_quantity"))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "q": q})
        return t.group_by(["l_orderkey"]).aggregate([("q", "sum")])

    per_order = bucketed_grouped_sum(
        lineitem.map_batches(partial, batch_format="pyarrow"), "l_orderkey", "q_sum"
    )

    def over(batch: pa.Table) -> pa.Table:
        q = batch.column("q_sum").to_numpy()
        keep = q > min_qty_cents
        return pa.table(
            {
                "l_orderkey": pa.array(batch.column("l_orderkey").to_numpy()[keep], pa.int64()),
                "total_qty_cents": pa.array(q[keep], pa.int64()),
            }
        )

    big = per_order.map_batches(over, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def price_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "price_cents": _cents(batch.column("o_totalprice")),
            }
        )

    joined = bucketed_hash_join(
        big,
        orders.map_batches(price_cents, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        buckets=16,
    )
    return joined.select_columns(["o_orderkey", "total_qty_cents", "price_cents"])


def interarrival_quantiles(events, partitions: int | None = None):
    """Inter-arrival latency profile: per event type, the exact p50/p90 of
    the whole-second gap between CONSECUTIVE same-user events of that type
    -- the behavioral cadence metric (how often does a user click / buy)
    that feeds session-gap and debounce threshold choices.

    Scale shape: ONE user-domain exchange (session_windows' bucketing);
    each bucket sorts by (user, type, ts, event_id) -- the unique event_id
    tie-break makes gap CONTENT deterministic -- and emits
    (type, gap_seconds) COUNT partials off one vectorized diff; the
    second exchange is the count table (bounded by observed distinct
    gaps, not rows -- gaps concentrate on a few cadences in practice;
    the single final block reads quantiles off cumulative counts, the
    fulfillment_latency kernel).

    Returns (event_type, n_gaps, p50_sec, p90_sec)."""
    import math

    import pandas as pd

    if partitions is None:
        partitions = derive_buckets(events.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def gap_counts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(uid) < 2:
            return pd.DataFrame({"event_type": [], "gap": [], "n": []}).astype(
                {"event_type": str, "gap": np.int64, "n": np.int64}
            )
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gaps = (us[1:] - us[:-1])[same] // 1_000_000
        df = pd.DataFrame({"event_type": et[1:][same], "gap": gaps})
        c = df.groupby(["event_type", "gap"], sort=False).size().rename("n").reset_index()
        return c

    merged = (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(gap_counts, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import math

        df = batch.to_pandas().groupby(["event_type", "gap"], sort=True)["n"].sum().reset_index()
        out = {"event_type": [], "n_gaps": [], "p50_sec": [], "p90_sec": []}
        for et, g in df.groupby("event_type", sort=True):
            gap = g["gap"].to_numpy(np.int64)
            cum = g["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            out["event_type"].append(et)
            out["n_gaps"].append(n)
            out["p50_sec"].append(int(gap[np.searchsorted(cum, math.ceil(0.5 * n))]))
            out["p90_sec"].append(int(gap[np.searchsorted(cum, math.ceil(0.9 * n))]))
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "n_gaps": pa.array(out["n_gaps"], pa.int64()),
                "p50_sec": pa.array(out["p50_sec"], pa.int64()),
                "p90_sec": pa.array(out["p90_sec"], pa.int64()),
            }
        )

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def rfm_segments(sf_dir: str, buckets: int = 64):
    """RFM segmentation -- per customer: Recency (days since their last
    order, against the corpus max day), Frequency (order count), Monetary
    (total cents), each scored 1-4 against the EXACT quartile boundaries
    of the customer population. The classic marketing/feature-store
    segmentation, done with exact integers end-to-end.

    Scale shape: per-batch (cust, max-day, count, sum) partials -> ONE
    custkey exchange folds the per-customer table (customer-domain
    bounded; materialized for its several consumers) -> the 9 quartile
    boundaries come from ``analytics.exact_quantiles``'s histogram
    bisection (log-round passes, no sort, no big collect) -> one map-side
    scoring pass against the 9 broadcast scalars.

    Scoring: score = 1 + [v > b25] + [v > b50] + [v > b75] with type-1
    boundaries (rank CEIL(q*n)); ties at a boundary take the LOWER score
    on both sides (this is quantile-scoring, not equi-depth NTILE -- tied
    values never split). Boundary scalars pass through float64 exactly
    (integer-valued, far under 2^53).

    Returns (c_custkey, r_days, f_orders, m_cents, r_score, f_score,
    m_score)."""
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("o_orderdate").cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = _cents(batch.column("o_totalprice")).to_numpy()
        df = pd.DataFrame(
            {
                "c": batch.column("o_custkey").to_numpy(zero_copy_only=False),
                "day": day,
                "cents": cents,
            }
        )
        p = df.groupby("c", sort=False).agg(
            last_day=("day", "max"), f_orders=("day", "size"), m_cents=("cents", "sum")
        ).reset_index()
        t = pa.table(
            {
                "c_custkey": pa.array(p["c"].to_numpy(np.int64), pa.int64()),
                "last_day": pa.array(p["last_day"].to_numpy(np.int64), pa.int64()),
                "f_orders": pa.array(p["f_orders"].to_numpy(np.int64), pa.int64()),
                "m_cents": pa.array(p["m_cents"].to_numpy(np.int64), pa.int64()),
            }
        )
        return hash_bucket_column(t, "c_custkey", buckets)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g.groupby("c_custkey", sort=False).agg(
            last_day=("last_day", "max"),
            f_orders=("f_orders", "sum"),
            m_cents=("m_cents", "sum"),
        ).reset_index()
        return p.astype(np.int64)

    percust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .materialize()
    )

    def block_max(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"m": pa.array([pc.max(batch.column("last_day")).as_py()])})

    ref_day = int(
        percust.map_batches(block_max, batch_format="pyarrow").to_pandas()["m"].max()
    )

    def add_r(batch: pa.Table) -> pa.Table:
        r = ref_day - batch.column("last_day").to_numpy()
        return batch.append_column("r_days", pa.array(r, pa.int64())).drop_columns(
            ["last_day"]
        )

    feat = percust.map_batches(add_r, batch_format="pyarrow").materialize()

    from .analytics import exact_quantiles

    # one stats pass + one bounded pull per column (vs 2 executions per
    # boundary): exact_quantiles shares them across the three targets
    bounds = {
        col: [int(v) for _, v in sorted(
            exact_quantiles(feat, col, (0.25, 0.5, 0.75)).items()
        )]
        for col in ("r_days", "f_orders", "m_cents")
    }

    def score(batch: pa.Table) -> pa.Table:
        out = {name: batch.column(name) for name in batch.schema.names}
        for col, sname in (
            ("r_days", "r_score"),
            ("f_orders", "f_score"),
            ("m_cents", "m_score"),
        ):
            v = batch.column(col).to_numpy()
            b1, b2, b3 = bounds[col]
            out[sname] = pa.array(
                1 + (v > b1).astype(np.int64) + (v > b2) + (v > b3), pa.int64()
            )
        return pa.table(out)

    return feat.map_batches(score, batch_format="pyarrow")


def supplier_hhi(sf_dir: str):
    """Supplier revenue concentration as the Herfindahl-Hirschman index in
    ppm: HHI = sum_i share_i^2 with share_i = rev_i / total -- the
    market-concentration dual of ``gini_ppm`` (gini ranks the whole
    distribution; HHI weights the top). Exact integers end-to-end:
    hhi_ppm = floor(10^6 * sum(rev_i^2) / total^2), folded in Python ints
    (rev^2 at 10^13-cent suppliers is ~10^26 -- past int64, fine for
    Python and for the oracle's HUGEINT).

    Scale shape: per-batch (suppkey, cents) partials -> ONE suppkey-domain
    exchange (``bucketed_grouped_sum``) -> per-bucket (sum rev, sum rev^2,
    n) partials as decimal STRINGS (the table_checksum transport trick:
    rev^2 sums exceed int64, so they ship exact as text) -> tiny driver
    fold.

    Returns ONE row (n_suppliers, total_cents, hhi_ppm)."""
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {"l_suppkey": batch.column("l_suppkey"), "rev": pa.array(rev, pa.int64())}
        )
        return t.group_by(["l_suppkey"]).aggregate([("rev", "sum")])

    per_supp = bucketed_grouped_sum(
        lineitem.map_batches(partial, batch_format="pyarrow"), "l_suppkey", "rev_sum"
    )

    def sq_partial(batch: pd.DataFrame) -> pd.DataFrame:
        revs = [int(v) for v in batch["rev_sum"]]
        return pd.DataFrame(
            {
                "n": pd.array([len(revs)], dtype="int64"),
                "s": [str(sum(revs))],
                "s2": [str(sum(v * v for v in revs))],
            }
        )

    parts = per_supp.map_batches(sq_partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    total = sum(int(x) for x in parts["s"])
    s2 = sum(int(x) for x in parts["s2"])
    hhi = s2 * 1_000_000 // (total * total) if total else 0
    return pd.DataFrame(
        {
            "n_suppliers": pd.array([n], dtype="int64"),
            "total_cents": pd.array([total], dtype="int64"),
            "hhi_ppm": pd.array([hhi], dtype="int64"),
        }
    )


def revenue_share_by_nation(sf_dir: str):
    """Ratio-to-report window: each nation's order revenue plus its share
    (ppm) of its REGION's total -- ``SUM() OVER (PARTITION BY region)`` as
    a distributed plan. revenue_by_nation's broadcast-probe stage carries
    the region through (the (custkey -> nation, region) lookup ships ONCE
    via ray.put), and the window itself folds inside the single tiny final
    block: the (nation x region) domain is bounded, so the 'window' costs
    one pandas transform, never an exchange.

    Returns (r_name, n_name, revenue_cents, share_ppm)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rnames = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    nnames = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    nregion = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()))
    ck = cust.column("c_custkey").to_numpy()
    order = np.argsort(ck)
    cn = cust.column("c_nationkey").to_numpy()[order]
    lookup = {
        "keys": ck[order],
        "nation": np.array([nnames[k] for k in cn], dtype=object),
        "region": np.array([rnames[nregion[k]] for k in cn], dtype=object),
    }
    handle = ray.put(lookup)

    class Probe:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_numpy()
            pos = np.searchsorted(self.lk["keys"], keys)
            pos_safe = np.clip(pos, 0, len(self.lk["keys"]) - 1)
            hit = self.lk["keys"][pos_safe] == keys
            t = pa.table(
                {
                    "r_name": pa.array(self.lk["region"][pos_safe[hit]].tolist(), pa.string()),
                    "n_name": pa.array(self.lk["nation"][pos_safe[hit]].tolist(), pa.string()),
                    "rev_cents": _cents(batch.column("o_totalprice").filter(pa.array(hit))),
                }
            )
            return t.group_by(["r_name", "n_name"]).aggregate([("rev_cents", "sum")])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    folded = tiny_final_groupby(
        ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 4)),
        ["r_name", "n_name"],
        [("rev_cents_sum", "sum")],
        ["r_name", "n_name", "revenue_cents"],
    )

    def add_share(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tot = df.groupby("r_name")["revenue_cents"].transform("sum")
        share = [
            int(c) * 1_000_000 // int(t) for c, t in zip(df["revenue_cents"], tot)
        ]
        df["share_ppm"] = pd.array(share, dtype="int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return folded.map_batches(add_share, batch_format="pyarrow", batch_size=None)


def top_prices_with_ties(sf_dir: str, k: int = 3):
    """Grouped top-k WITH TIES (the DENSE_RANK <= k window semantics):
    ALL orders whose price is among the top-``k`` DISTINCT prices of their
    market segment -- unlike ``top_orders_per_segment``'s row_number cut,
    a price tie never splits arbitrarily.

    Two passes over the orders read:

    1. boundary mining: per batch, each present segment's top-k DISTINCT
       prices (np.unique tail) -- the global i-th-highest distinct price
       is inside the per-batch top-k of any batch containing it (at most
       i-1 distinct prices exceed it anywhere), so one tiny merge block
       yields each segment's distinct top-k list exactly;
    2. a map-side filter against the broadcast per-segment boundary
       (lowest qualifying price), emitting the dense rank as the match
       position in the segment's sorted top-k list.

    The segment lookup broadcasts once (top_orders_per_segment's probe);
    custkeys absent from customer DROP (inner-join semantics). Returns
    (c_mktsegment, o_orderkey, price_cents, price_rank 1-based)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist()))
    handle = ray.put(seg)

    class SegTag:
        def __init__(self) -> None:
            self.seg = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "c_mktsegment": pd.Series(
                        batch.column("o_custkey").to_numpy(zero_copy_only=False)
                    ).map(self.seg),
                    "o_orderkey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                    "price_cents": _cents(batch.column("o_totalprice")).to_numpy(),
                }
            )
            return df.dropna(subset=["c_mktsegment"])

    def batch_topk_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for s, g in batch.groupby("c_mktsegment", sort=False):
            top = np.unique(g["price_cents"].to_numpy(np.int64))[-k:]
            out.append(pd.DataFrame({"c_mktsegment": s, "price_cents": top}))
        return pd.concat(out) if out else pd.DataFrame(
            {"c_mktsegment": [], "price_cents": []}
        ).astype({"c_mktsegment": str, "price_cents": np.int64})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    tagged = orders.map_batches(SegTag, batch_format="pyarrow", concurrency=(1, 4))
    tops = (
        tagged.map_batches(batch_topk_distinct, batch_format="pandas")
        .repartition(1)
        .map_batches(batch_topk_distinct, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    # per segment: DESC-sorted distinct top-k list (rank 1 = highest)
    top_lists = {
        s: np.sort(g["price_cents"].to_numpy(np.int64))[::-1]
        for s, g in tops.groupby("c_mktsegment")
    }
    lists_handle = ray.put(top_lists)

    class FilterRank:
        def __init__(self) -> None:
            self.seg = ray.get(handle)
            self.tops = ray.get(lists_handle)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "c_mktsegment": pd.Series(
                        batch.column("o_custkey").to_numpy(zero_copy_only=False)
                    ).map(self.seg),
                    "o_orderkey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                    "price_cents": _cents(batch.column("o_totalprice")).to_numpy(),
                }
            )
            df = df.dropna(subset=["c_mktsegment"])
            keep, rank = [], []
            for s, g in df.groupby("c_mktsegment", sort=False):
                tl = self.tops.get(s)
                if tl is None or len(tl) == 0:
                    continue
                v = g["price_cents"].to_numpy(np.int64)
                m = v >= tl[-1]
                # dense rank = position in the DESC distinct list
                pos = np.searchsorted(-tl, -v[m]) + 1
                sub = g[m].copy()
                sub["price_rank"] = pos.astype(np.int64)
                keep.append(sub)
            if not keep:
                return pd.DataFrame(
                    {
                        "c_mktsegment": [],
                        "o_orderkey": [],
                        "price_cents": [],
                        "price_rank": [],
                    }
                ).astype(
                    {
                        "c_mktsegment": str,
                        "o_orderkey": np.int64,
                        "price_cents": np.int64,
                        "price_rank": np.int64,
                    }
                )
            return pd.concat(keep)

    return orders.map_batches(FilterRank, batch_format="pyarrow", concurrency=(1, 4))


def first_last_order(sf_dir: str, buckets: int = 64):
    """FIRST_VALUE / LAST_VALUE window semantics: per customer, the price
    of their FIRST and LAST order under the deterministic
    (order day, orderkey) total order, plus the delta -- the
    first-touch/last-touch comparison behind "did spend grow".

    Associative argmin/argmax shape: each batch emits per customer ONLY
    its local first- and last-candidate rows (two rows per customer per
    batch), the custkey exchange co-locates candidates, and the bucket
    kernel repeats the same reduction -- no sort ever sees more than a
    bucket, and the exchange carries 2 x |customers-per-batch| rows.

    Returns (c_custkey, first_cents, last_cents, delta_cents)."""
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def candidates(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_custkey": batch.column("o_custkey").to_numpy(zero_copy_only=False),
                "day": batch.column("o_orderdate").cast(pa.int64()).to_numpy()
                // 86_400_000_000,
                "okey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                "cents": _cents(batch.column("o_totalprice")).to_numpy(),
            }
        )
        g = df.sort_values(["c_custkey", "day", "okey"], kind="mergesort")
        first = g.groupby("c_custkey", sort=False).head(1)
        last = g.groupby("c_custkey", sort=False).tail(1)
        out = pd.concat([first, last])
        t = pa.Table.from_pandas(out, preserve_index=False)
        return hash_bucket_column(t, "c_custkey", buckets)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["c_custkey", "day", "okey"], kind="mergesort")
        first = g.groupby("c_custkey", sort=False).head(1)
        last = g.groupby("c_custkey", sort=False).tail(1)
        out = pd.DataFrame(
            {
                "c_custkey": first["c_custkey"].to_numpy(np.int64),
                "first_cents": first["cents"].to_numpy(np.int64),
                "last_cents": last["cents"].to_numpy(np.int64),
            }
        )
        out["delta_cents"] = out["last_cents"] - out["first_cents"]
        return out

    return (
        orders.map_batches(candidates, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )


def session_duration_quantiles(events, gap_minutes: int = 30, partitions: int | None = None):
    """Session-length profile: exact p50/p90 of session DURATION in whole
    seconds (last event minus first, per session) plus the session count --
    the engagement metric next to session_windows' per-session aggregates.

    Same one-exchange shape as session_windows (sessions never span
    user-hash partitions), then the (duration, count) table is the
    quantiles' sufficient statistic (fulfillment_latency's kernel).
    Duration is tie-order-free: equal timestamps cannot move a session's
    min or max. Zero-gap single-event sessions count with duration 0.

    Returns ONE row (n_sessions, p50_sec, p90_sec)."""
    import math

    if partitions is None:
        partitions = derive_buckets(events.count())
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def dur_counts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        us = ts.astype("datetime64[us]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap_brk = np.concatenate(([False], (ts[1:] - ts[:-1]) > gap))
        brk = new_user | gap_brk
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:] - 1, len(us) - 1]
        dur = (us[ends] - us[starts]) // 1_000_000
        vc = pd.Series(dur).value_counts()
        return pd.DataFrame(
            {
                "dur": vc.index.to_numpy(np.int64),
                "n": vc.to_numpy(np.int64),
            }
        )

    merged = (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dur_counts, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import math

        df = batch.to_pandas().groupby("dur", sort=True)["n"].sum().reset_index()
        dur = df["dur"].to_numpy(np.int64)
        cum = df["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return pa.table(
            {
                "n_sessions": pa.array([n], pa.int64()),
                "p50_sec": pa.array(
                    [int(dur[np.searchsorted(cum, math.ceil(0.5 * n))])], pa.int64()
                ),
                "p90_sec": pa.array(
                    [int(dur[np.searchsorted(cum, math.ceil(0.9 * n))])], pa.int64()
                ),
            }
        )

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def revenue_concentrated_parts(sf_dir: str, share_ppm: int = 700):
    """TPC-H Q11 shape (group vs GLOBAL-total filter): parts whose total
    lineitem revenue exceeds ``share_ppm`` parts-per-million of the whole
    table's revenue -- the "important stock" screen whose HAVING threshold
    is itself an aggregate of the same data.

    Plan: map-side revenue partials -> ``bucketed_grouped_sum`` on the
    partkey domain (the one exchange) -> the per-part table is
    ``materialize()``-d (two consumers: the global total and the filter)
    -> per-block sum partials fold to the global total at the driver as a
    PYTHON int (exact past int64 at any scale) -> the ppm comparison
    ``rev * 1e6 > share_ppm * total`` is pre-divided into an integer
    threshold (``rev > (share_ppm*total)//1e6``, provably equivalent for
    integers) so the map-side filter stays an int64 vector compare.

    Returns (l_partkey, revenue_cents, share_ppm) -- the share recomputed
    per survivor with Python-int floor division, matching the HUGEINT
    oracle digit-for-digit."""
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {"l_partkey": batch.column("l_partkey"), "rev": pa.array(rev, pa.int64())}
        )
        return t.group_by(["l_partkey"]).aggregate([("rev", "sum")])

    per_part = bucketed_grouped_sum(
        lineitem.map_batches(partial, batch_format="pyarrow"), "l_partkey", "rev_sum"
    ).materialize()

    def block_sum(batch: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array([int(pc.sum(batch.column("rev_sum")).as_py())])})

    total = int(
        per_part.map_batches(block_sum, batch_format="pyarrow").to_pandas()["s"].sum()
    )
    # rev*1e6 > ppm*total  <=>  rev > (ppm*total)//1e6  (integers: write
    # ppm*total = q*1e6 + r, both sides reduce to rev >= q+1). Clamp so the
    # int64 vector compare can't overflow when the threshold exceeds any
    # representable per-part revenue.
    threshold = min((share_ppm * total) // 1_000_000, (1 << 63) - 2)

    def over(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev_sum").to_numpy()
        keep = rev > threshold
        keys = batch.column("l_partkey").to_numpy()[keep]
        survivors = rev[keep]
        share = [(int(r) * 1_000_000) // total for r in survivors]
        return pa.table(
            {
                "l_partkey": pa.array(keys, pa.int64()),
                "revenue_cents": pa.array(survivors, pa.int64()),
                "share_ppm": pa.array(share, pa.int64()),
            }
        )

    return per_part.map_batches(over, batch_format="pyarrow")


def inactive_high_balance(sf_dir: str, cutoff: str = "2000-01-01",
                          broadcast_cap_bytes: int = 256 << 20):
    """TPC-H Q22 shape (global-scalar threshold + anti-join + group): per
    nation, the count and total balance of customers whose account balance
    beats the average over positive-balance customers AND who placed no
    order since ``cutoff`` -- the "wealthy but drifting away" screen.

    Plan: one narrow customer pass folds (sum, count) of positive balances
    to the driver (one row per block); the above-average test is the exact
    cross-multiplied integer compare ``bal_cents * n_pos > sum_pos`` (no
    division, no float; positive-balance membership uses cents > 0 -- the
    SAME rounded rule as the SQL replay). Recent orderers collapse to
    DISTINCT custkeys map-side and ship ONCE via ray.put (semi_join_agg's
    capped-broadcast discipline -- loud raise past the cap, where the
    bucketed anti-join is the shape); the second customer pass filters
    map-side and emits bounded per-nation (count, sum) partials. Nation
    names resolve from a broadcast dict in the single final block.

    Returns (n_name, n_custs, total_bal_cents)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal")).to_numpy()
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())]), "n": pa.array([len(pos)])})

    folded = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    sum_pos, n_pos = int(folded["s"].sum()), int(folded["n"].sum())

    cutoff_ts = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def recent_keys(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch.column("o_orderdate"), cutoff_ts))
        u = np.unique(batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(u, pa.int64())})

    keys = np.unique(
        orders.map_batches(recent_keys, batch_format="pyarrow").to_pandas()["k"].to_numpy(np.int64)
    )
    if keys.nbytes > broadcast_cap_bytes:
        raise ValueError(
            f"distinct recent-orderer keys {keys.nbytes >> 20} MB exceed the broadcast "
            "cap; use a bucketed anti-join (orphan_audit_multi shape) at this scale"
        )
    handle = ray.put(keys)

    class Screen:
        def __init__(self) -> None:
            self.keys = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = _cents(batch.column("c_acctbal")).to_numpy()
            ck = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            rich = cents * n_pos > sum_pos
            pos = np.searchsorted(self.keys, ck)
            pos_safe = np.clip(pos, 0, max(len(self.keys) - 1, 0))
            active = (self.keys[pos_safe] == ck) if len(self.keys) else np.zeros(len(ck), bool)
            keep = rich & ~active
            t = pa.table(
                {
                    "c_nationkey": batch.column("c_nationkey").filter(pa.array(keep)),
                    "bal": pa.array(cents[keep], pa.int64()),
                }
            )
            return t.group_by(["c_nationkey"]).aggregate([("bal", "sum"), ("bal", "count")])

    partials = cust.map_batches(Screen, batch_format="pyarrow", concurrency=(1, 8))
    per_nation = tiny_final_groupby(
        partials,
        keys=["c_nationkey"],
        aggs=[("bal_count", "sum"), ("bal_sum", "sum")],
        out_names=["c_nationkey", "n_custs", "total_bal_cents"],
    )

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))

    def attach(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([names[int(k)] for k in nk], pa.string()),
                "n_custs": batch.column("n_custs"),
                "total_bal_cents": batch.column("total_bal_cents"),
            }
        )

    return per_nation.map_batches(attach, batch_format="pyarrow")


def overlap_pairs(intervals, key_col: str, s_col: str, e_col: str, buckets: int = 64):
    """Per-key count of OVERLAPPING interval pairs (half-open [s, e);
    a pair overlaps iff ``max(s) < min(e)``) -- the double-booking /
    conflicting-session audit that complements interval_coverage (union
    length) and peak_concurrency (max simultaneous) over the same
    intervals.

    Never materializes a pair: within each key,
    ``overlap(i) = #{s_j < e_i} - #{e_j <= s_i} - 1`` (the subtracted sets
    nest, self is excluded; exact for non-empty intervals), so the pair
    count is ``sum(overlap)/2`` off TWO np.searchsorted calls over the
    (key, time) ordinal composite (conversion_within's kernel; the
    per-key segment offset localizes the global searchsorted). Empty
    intervals (e <= s) drop map-side as data -- the SQL replay repeats
    the same WHERE so the overlap predicate is unambiguous.

    ONE key-domain exchange; per-key outputs are disjoint across buckets
    so bucket outputs union without a second exchange. Returns
    (key, n_overlap_pairs) for keys with at least one overlapping pair."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch.column(e_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = e > s
        return pa.table(
            {
                key_col: pa.array(
                    batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)[keep],
                    pa.int64(),
                ),
                "s": pa.array(s[keep], pa.int64()),
                "e": pa.array(e[keep], pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, key_col, buckets)

    def kern(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key_col].to_numpy(np.int64)
        s = group["s"].to_numpy(np.int64)
        e = group["e"].to_numpy(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        lo = s.min()
        width = (e.max() - lo) + 2
        if len(uk) and width > (2**62) // len(uk):
            raise ValueError(
                "overlap_pairs: key-count x time-span overflows the ordinal "
                "composite; raise `buckets`"
            )
        comp_s = inv.astype(np.int64) * width + (s - lo)
        comp_e = inv.astype(np.int64) * width + (e - lo)
        sorted_s = np.sort(comp_s)
        sorted_e = np.sort(comp_e)
        counts = np.bincount(inv)
        seg_start = np.r_[0, np.cumsum(counts)[:-1]]
        a = np.searchsorted(sorted_s, comp_e, side="left") - seg_start[inv]
        b = np.searchsorted(sorted_e, comp_s, side="right") - seg_start[inv]
        ov = a - b - 1  # per-interval overlap degree, >= 0
        per_key = np.bincount(inv, weights=ov).astype(np.int64) // 2
        hit = per_key > 0
        return pd.DataFrame(
            {key_col: uk[hit], "n_overlap_pairs": per_key[hit]}
        )

    return (
        intervals.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kern, batch_format="pandas")
    )


def cheapest_supplier_per_part(sf_dir: str, p_size: int = 10,
                               broadcast_cap_bytes: int = 256 << 20):
    """TPC-H Q2 shape (grouped argmin with join-back): for every part of a
    given size class, the supplier offering the MINIMUM observed unit
    price -- the "who do I buy from" screen whose answer is an argmin over
    an aggregate, not the aggregate itself.

    Plan: the part filter collapses to a sorted key array broadcast ONCE
    (dimension-side, capped with a loud raise); the lineitem scan filters
    map-side (98% of rows never reach the exchange at the default size
    class) and emits per-batch (partkey, suppkey, min unit_cents)
    partials; ONE partkey-bucketed exchange repeats the (part, supp) min
    and picks each part's winner vectorized (unit asc, suppkey asc
    tie-break -- deterministic, shared with the replay); supplier names
    resolve from a broadcast dict. Unit price is
    ``floor(price/qty*100+0.5)`` -- identical float64 chain both sides.

    Returns (p_partkey, s_suppkey, s_name, unit_cents)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    keep = pc.equal(part.column("p_size"), p_size)
    pkeys = np.sort(part.filter(keep).column("p_partkey").to_numpy().astype(np.int64))
    if pkeys.nbytes > broadcast_cap_bytes:
        raise ValueError("part filter keys exceed the broadcast cap; bucket-join the filter")
    pk_handle = ray.put(pkeys)

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    class Partial:
        def __init__(self) -> None:
            self.pkeys = ray.get(pk_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.pkeys, lp)
            pos_safe = np.clip(pos, 0, max(len(self.pkeys) - 1, 0))
            hit = (self.pkeys[pos_safe] == lp) if len(self.pkeys) else np.zeros(len(lp), bool)
            b = batch.filter(pa.array(hit))
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
            unit = np.floor(price / qty * 100.0 + 0.5).astype(np.int64)
            t = pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "l_suppkey": b.column("l_suppkey"),
                    "unit": pa.array(unit, pa.int64()),
                }
            )
            return t.group_by(["l_partkey", "l_suppkey"]).aggregate([("unit", "min")])

    partials = lineitem.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "l_partkey", 32)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(), supp.column("s_name").to_pylist()))

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby(["l_partkey", "l_suppkey"], sort=False)["unit_min"]
            .min()
            .reset_index()
            .sort_values(["l_partkey", "unit_min", "l_suppkey"], kind="mergesort")
            .drop_duplicates("l_partkey", keep="first")
        )
        return pd.DataFrame(
            {
                "p_partkey": m["l_partkey"].to_numpy(np.int64),
                "s_suppkey": m["l_suppkey"].to_numpy(np.int64),
                "s_name": [names[int(s)] for s in m["l_suppkey"]],
                "unit_cents": m["unit_min"].to_numpy(np.int64),
            }
        )

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(winners, batch_format="pandas")
    )


def out_of_order_audit(events, partitions: int | None = None):
    """Streaming disorder audit: in per-user ARRIVAL order (ascending
    event_id -- the ingest sequence), how many adjacent event pairs go
    BACKWARD in event time, and by how much at worst -- the measurement
    that sizes watermark delay / reorder buffers before any event-time
    windowing is trusted.

    session_windows' one user-hash exchange; each bucket sorts by
    (user_id, event_id) and takes one vectorized diff masked at user
    boundaries; per-bucket (pairs, inversions, max_lateness) partials fold
    into ONE row. Equal timestamps are IN order (strict regression only).

    Returns ONE row (n_pairs, n_inversions, inv_ppm, max_late_us)."""
    if partitions is None:
        partitions = derive_buckets(events.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = uid[1:] == uid[:-1]
        late = (us[:-1] - us[1:])[same]  # >0 means time went backward
        inv = late > 0
        return pd.DataFrame(
            {
                "n_pairs": [int(same.sum())],
                "n_inv": [int(inv.sum())],
                "max_late": [int(late[inv].max()) if inv.any() else 0],
            }
        )

    folded = (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kern, batch_format="pandas")
        .to_pandas()
    )
    n_pairs = int(folded["n_pairs"].sum())
    n_inv = int(folded["n_inv"].sum())
    return pd.DataFrame(
        {
            "n_pairs": [n_pairs],
            "n_inversions": [n_inv],
            "inv_ppm": [(n_inv * 1_000_000) // max(n_pairs, 1)],
            "max_late_us": [int(folded["max_late"].max()) if len(folded) else 0],
        }
    )


def dominant_suppliers(sf_dir: str, threshold_pct: int = 15):
    """TPC-H Q20 flavor (two-level aggregate with cross-level compare):
    suppliers shipping MORE than ``threshold_pct`` percent of some part's
    total quantity -- the supply-chain concentration screen ("who could
    hold a part hostage"), per supplier counting the parts they dominate.

    Scale shape: ONE partkey-bucketed exchange of per-batch
    (part, supplier, qty) partials co-locates each part's full history,
    so BOTH aggregation levels (per-(part,supp) and per-part totals) and
    the strict cross-multiplied compare ``100*ps > pct*total`` fold
    vectorized inside the bucket -- no second shuffle, no join between
    the levels; the bounded supplier-domain final counts dominated parts
    and resolves names from a broadcast dict.

    Returns (s_suppkey, s_name, n_dominated_parts)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "q": _cents(batch.column("l_quantity")),
            }
        )
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "l_partkey", 32)

    def dominate(g: pd.DataFrame) -> pd.DataFrame:
        ps = (
            g.groupby(["l_partkey", "l_suppkey"], sort=False)["q_sum"].sum().reset_index()
        )
        tot = ps.groupby("l_partkey")["q_sum"].transform("sum")
        win = ps[100 * ps["q_sum"] > threshold_pct * tot]
        vc = win["l_suppkey"].value_counts()
        return pd.DataFrame(
            {
                "s_suppkey": vc.index.to_numpy(np.int64),
                "n_dominated_parts": vc.to_numpy(np.int64),
            }
        )

    partials = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dominate, batch_format="pandas")
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(), supp.column("s_name").to_pylist()))

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch.groupby("s_suppkey", sort=True)["n_dominated_parts"].sum().reset_index()
        m["s_name"] = [names[int(k)] for k in m["s_suppkey"]]
        return m[["s_suppkey", "s_name", "n_dominated_parts"]].astype(
            {"s_suppkey": "int64", "n_dominated_parts": "int64"}
        )

    return partials.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def trailing_rows_sum(events, k: int = 5, partitions: int | None = None):
    """ROWS-frame trailing window (SUM OVER ... ROWS BETWEEN k-1 PRECEDING
    AND CURRENT ROW): per user, each event's value-cents sum over its last
    ``k`` events in (ts, event_id) order -- the moving-average primitive
    whose frame counts ROWS, not a calendar range (the dual of
    rolling_range_sum, which this deliberately does not reuse: a row frame
    needs no day collapse and no window padding, just a shifted cumsum).

    ONE user-hash exchange; each bucket sorts once by (user, ts,
    event_id) -- the unique event_id makes frame CONTENT deterministic --
    and answers every row with ``cumsum - shift(cumsum, k)`` masked at
    user boundaries (rows closer than k to their user's start sum what
    exists). Output is event-domain sized, exact int64 cents.

    Returns (event_id, user_id, trail_cents)."""
    if partitions is None:
        partitions = derive_buckets(events.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "user_id", partitions)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        cents = np.floor(g["value"].to_numpy(np.float64) * 100.0 + 0.5).astype(np.int64)
        cum = np.cumsum(cents)
        # per-user row index: position since the user's first row
        brk = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(brk)
        seg = np.repeat(starts, np.diff(np.r_[starts, len(uid)]))
        # frame start (exclusive prefix index): k rows back, clipped to the
        # user's segment start; rows before index 0 contribute 0
        lo = np.maximum(np.arange(len(uid)) - k, seg - 1)
        trail = cum - np.where(lo >= 0, cum[np.maximum(lo, 0)], 0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": uid,
                "trail_cents": trail,
            }
        )

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kern, batch_format="pandas")
    )


def forecast_revenue_delta(sf_dir: str, year: int = 1996, disc_lo: int = 5,
                           disc_hi: int = 7, max_qty: float = 24.0):
    """TPC-H Q6 shape (what-if revenue filter): total discount revenue that
    would be recovered by dropping a discount band for one shipping year --
    a pure filtered global aggregate, the cheapest possible distributed
    plan: predicate pushdown at the read, one map-side partial per batch,
    ONE final row. No exchange moves more than a handful of partial rows.

    Discounts are compared in integer percent (``floor(d*100 + 0.5)``) so
    the band edges are exact, never float-fuzzy; revenue is per-row
    ``floor(extprice * discount * 100 + 0.5)`` cents (identical chain in
    the SQL replay).

    Returns ONE row (revenue_cents, n_rows)."""
    import ray.data as rd

    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        dpct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        keep = (
            (sd >= lo) & (sd < hi) & (dpct >= disc_lo) & (dpct <= disc_hi) & (qty < max_qty)
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(price * disc[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "__k": pa.array([0], pa.int64()),
                "rev": pa.array([int(rev.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    out = tiny_final_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["__k"],
        [("rev", "sum"), ("n", "sum")],
        ["__k", "revenue_cents", "n_rows"],
    )
    return out.drop_columns(["__k"])


def promo_revenue(sf_dir: str, year: int = 1996, month: int = 9,
                  promo_type: str = "PROMO"):
    """TPC-H Q14 shape (promotion effect): the share of one month's gross
    revenue earned by parts of a promotional type. The part dimension
    collapses to a broadcast membership pair (sorted partkeys + is-promo
    bitmap, shipped ONCE with ray.put); lineitem is scanned with a
    map-side month filter and emits per-batch (promo_cents, total_cents)
    partials -- the exchange moves two ints per block, then ONE final row
    computes the ppm share in integer arithmetic.

    Returns ONE row (promo_cents, total_cents, promo_ppm)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    lo_m = np.datetime64(f"{year}-{month:02d}", "M")
    lo, hi = lo_m.astype("datetime64[us]"), (lo_m + 1).astype("datetime64[us]")

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    order = np.argsort(pk)
    lookup = {
        "keys": pk[order],
        "promo": pc.equal(part.column("p_type"), promo_type).to_numpy(zero_copy_only=False)[order],
    }
    handle = ray.put(lookup)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    class Partial:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            b = batch.filter(pa.array((sd >= lo) & (sd < hi)))
            lp = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keys = self.lk["keys"]
            pos = np.searchsorted(keys, lp)
            pos_safe = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (keys[pos_safe] == lp) if len(keys) else np.zeros(len(lp), bool)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)[hit]
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)[hit]
            rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            promo = self.lk["promo"][pos_safe[hit]]
            return pa.table(
                {
                    "__k": pa.array([0], pa.int64()),
                    "promo": pa.array([int(rev[promo].sum())], pa.int64()),
                    "total": pa.array([int(rev.sum())], pa.int64()),
                }
            )

    partials = ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))
    out = tiny_final_groupby(
        partials,
        ["__k"],
        [("promo", "sum"), ("total", "sum")],
        ["__k", "promo_cents", "total_cents"],
    )

    def ppm(batch: pa.Table) -> pa.Table:
        p = batch.column("promo_cents").to_numpy()
        t = batch.column("total_cents").to_numpy()
        share = (p * 1_000_000) // np.maximum(t, 1)
        return pa.table(
            {
                "promo_cents": batch.column("promo_cents"),
                "total_cents": batch.column("total_cents"),
                "promo_ppm": pa.array(share.astype(np.int64), pa.int64()),
            }
        )

    return out.map_batches(ppm, batch_format="pyarrow")


def disjunctive_revenue(sf_dir: str,
                        clauses: tuple = (("Brand#13", 1, 5, 1.0, 11.0),
                                          ("Brand#20", 1, 10, 10.0, 20.0),
                                          ("Brand#9", 1, 15, 20.0, 30.0))):
    """TPC-H Q19 shape (disjunctive multi-attribute predicate join): gross
    revenue from lineitems matching ANY of several (brand, size-range,
    quantity-range) clauses. The classic optimizer trap -- an OR of
    conjunctions across two tables -- becomes trivial map-side work here:
    the part dimension broadcasts ONCE as (sorted partkeys, brand codes,
    sizes); every lineitem batch evaluates all clauses vectorized and
    emits a 2-int partial. No exchange carries row data at all.

    ``clauses``: (brand, size_lo, size_hi, qty_lo, qty_hi) tuples, OR-ed.

    Returns ONE row (revenue_cents, n_rows)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    order = np.argsort(pk)
    brands = sorted({c[0] for c in clauses})
    code = {b: i for i, b in enumerate(brands)}
    bcol = part.column("p_brand").to_pylist()
    lookup = {
        "keys": pk[order],
        # brands outside any clause code to -1: one int compare per clause
        "brand": np.array([code.get(b, -1) for b in bcol], dtype=np.int64)[order],
        "size": part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)[order],
    }
    handle = ray.put(lookup)
    coded_clauses = [(code[b], slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in clauses]

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    class Partial:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keys = self.lk["keys"]
            pos = np.searchsorted(keys, lp)
            pos_safe = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (keys[pos_safe] == lp) if len(keys) else np.zeros(len(lp), bool)
            brand = np.where(hit, self.lk["brand"][pos_safe], -2)
            size = np.where(hit, self.lk["size"][pos_safe], -1)
            qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
            keep = np.zeros(len(lp), bool)
            for bc, slo, shi, qlo, qhi in coded_clauses:
                keep |= (brand == bc) & (size >= slo) & (size <= shi) & (qty >= qlo) & (qty <= qhi)
            price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
            rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "__k": pa.array([0], pa.int64()),
                    "rev": pa.array([int(rev.sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

    out = tiny_final_groupby(
        ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8)),
        ["__k"],
        [("rev", "sum"), ("n", "sum")],
        ["__k", "revenue_cents", "n_rows"],
    )
    return out.drop_columns(["__k"])


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1997-06-30", k: int = 10, buckets: int = 32):
    """TPC-H Q3 shape (unshipped-order revenue screen): the k highest-value
    orders from one market segment that were placed before a cutoff but
    still have lineitems shipping after it.

    Plan: the customer segment filter collapses to a broadcast sorted
    custkey array (dimension side, ray.put once); orders are pruned
    map-side to (orderkey, orderdate, priority); lineitem batches
    pre-aggregate revenue per orderkey BEFORE the exchange (the combiner --
    only (orderkey, partial_rev) rows move); ONE orderkey-bucketed exchange
    joins the two sides, sums revenue per order, and keeps a per-bucket
    top-k; the <= k x buckets survivors merge in a single final block.
    Ties break (revenue desc, orderdate asc, orderkey asc) -- deterministic
    and shared with the SQL replay.

    Returns (o_orderkey, o_orderdate, o_orderpriority, revenue_cents), the
    global top k."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cut = np.datetime64(cutoff).astype("datetime64[us]")

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ck = np.sort(
        cust.filter(pc.equal(cust.column("c_mktsegment"), segment))
        .column("c_custkey").to_numpy().astype(np.int64)
    )
    ck_handle = ray.put(ck)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    class OrderSide:
        def __init__(self) -> None:
            self.ck = ray.get(ck_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            od = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            oc = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.ck, oc)
            pos_safe = np.clip(pos, 0, max(len(self.ck) - 1, 0))
            hit = (self.ck[pos_safe] == oc) if len(self.ck) else np.zeros(len(oc), bool)
            b = batch.filter(pa.array((od < cut) & hit))
            t = pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "od_us": pa.array(
                        b.column("o_orderdate").to_numpy(zero_copy_only=False)
                        .astype("datetime64[us]").astype(np.int64),
                        pa.int64(),
                    ),
                    "prio": b.column("o_orderpriority"),
                    "rev": pa.nulls(b.num_rows, pa.int64()),
                    "__side": pa.array(["o"] * b.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        b = batch.filter(pa.array(sd > cut))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"o_orderkey": b.column("l_orderkey"), "rev": pa.array(rev, pa.int64())})
        g = t.group_by(["o_orderkey"]).aggregate([("rev", "sum")])
        t = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "od_us": pa.nulls(g.num_rows, pa.int64()),
                "prio": pa.nulls(g.num_rows, pa.string()),
                "rev": g.column("rev_sum"),
                "__side": pa.array(["l"] * g.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = orders.map_batches(OrderSide, batch_format="pyarrow", concurrency=(1, 4)).union(
        lineitem.map_batches(line_side, batch_format="pyarrow")
    )

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"]
        rev = l.groupby("o_orderkey", sort=False)["rev"].sum().reset_index()
        o = g.loc[g["__side"] == "o", ["o_orderkey", "od_us", "prio"]]
        m = o.merge(rev, on="o_orderkey", how="inner")
        m = m.sort_values(
            ["rev", "od_us", "o_orderkey"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
                "od_us": m["od_us"].to_numpy(np.int64),
                "o_orderpriority": m["prio"].astype(str),
                "revenue_cents": m["rev"].to_numpy(np.int64),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["revenue_cents", "od_us", "o_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64), pa.int64()),
                "o_orderdate": pa.array(
                    df["od_us"].to_numpy(np.int64).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(df["o_orderpriority"].tolist(), pa.string()),
                "revenue_cents": pa.array(df["revenue_cents"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        both.repartition(buckets)
        .groupby("__bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


def returned_items_topk(sf_dir: str, date_lo: str = "1996-10-01",
                        date_hi: str = "1997-01-01", k: int = 20, buckets: int = 32):
    """TPC-H Q10 shape (returned-item reporting): the k customers who
    returned the most revenue in one order quarter -- a two-level join
    (lineitem |><| orders |><| customer) where the FACT-FACT leg is an
    orderkey-bucketed exchange and the dimension leg is a broadcast dict
    applied to only k final rows.

    Lineitem pre-aggregates returned revenue per orderkey map-side (the
    combiner); orders prune to the quarter map-side; per orderkey-bucket
    the join emits (custkey, rev) partials, which a SECOND custkey-bucketed
    exchange folds per customer with a per-bucket top-k; <= k x buckets
    rows reach the final merge, where customer names resolve from a
    broadcast dict. Ties break (revenue desc, custkey asc).

    Returns (c_custkey, c_name, revenue_cents), the global top k."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    lo = np.datetime64(date_lo).astype("datetime64[us]")
    hi = np.datetime64(date_hi).astype("datetime64[us]")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        b = batch.filter(pa.array((od >= lo) & (od < hi)))
        t = pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "cust": b.column("o_custkey"),
                "rev": pa.nulls(b.num_rows, pa.int64()),
                "__side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    def line_side(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"o_orderkey": b.column("l_orderkey"), "rev": pa.array(rev, pa.int64())})
        g = t.group_by(["o_orderkey"]).aggregate([("rev", "sum")])
        t = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "cust": pa.nulls(g.num_rows, pa.int64()),
                "rev": g.column("rev_sum"),
                "__side": pa.array(["l"] * g.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lineitem.map_batches(line_side, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"]
        rev = l.groupby("o_orderkey", sort=False)["rev"].sum().reset_index()
        o = g.loc[g["__side"] == "o", ["o_orderkey", "cust"]]
        m = o.merge(rev, on="o_orderkey", how="inner")
        per_cust = m.groupby("cust", sort=False)["rev"].sum().reset_index()
        out = pd.DataFrame(
            {
                "c_custkey": per_cust["cust"].to_numpy(np.int64),
                "rev": per_cust["rev"].to_numpy(np.int64),
            }
        )
        return out

    joined = (
        both.repartition(buckets).groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
    )

    def add_cust_bucket(batch: pa.Table) -> pa.Table:
        return hash_bucket_column(batch, "c_custkey", buckets)

    def cust_topk(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("c_custkey", sort=False)["rev"].sum().reset_index()
        per = per.sort_values(["rev", "c_custkey"], ascending=[False, True], kind="mergesort").head(k)
        return per

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    names = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist()))

    def final_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["rev", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.table(
            {
                "c_custkey": pa.array(df["c_custkey"].to_numpy(np.int64), pa.int64()),
                "c_name": pa.array([names[int(c)] for c in df["c_custkey"]], pa.string()),
                "revenue_cents": pa.array(df["rev"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        joined.map_batches(add_cust_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(cust_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys)
    return keys[order], vals[order]


def _probe_sorted(keys: np.ndarray, probe: np.ndarray):
    """Vectorized membership probe against a sorted key array: returns the
    hit mask and the (clipped) positions -- inner-join semantics, misses
    never take a neighbor's payload."""
    pos = np.searchsorted(keys, probe)
    pos_safe = np.clip(pos, 0, max(len(keys) - 1, 0))
    hit = (keys[pos_safe] == probe) if len(keys) else np.zeros(len(probe), bool)
    return hit, pos_safe


def nation_trade_volume(sf_dir: str, nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2", year_lo: int = 1996,
                        year_hi: int = 1997, buckets: int = 32):
    """TPC-H Q7 shape (bi-national trade volume): revenue shipped between
    two nations per direction per year -- supplier nation from the
    lineitem leg, customer nation from the orders leg, so the nation pair
    only exists AFTER the fact-fact join.

    Both dimension legs collapse to broadcast sorted arrays filtered to
    the two nations (ray.put once); lineitem pre-aggregates
    (orderkey, supp_nation, year) -> rev map-side; ONE orderkey-bucketed
    exchange joins in the customer nation, drops same-nation pairs, and
    folds per (supp_nation, cust_nation, year); a tiny final merges the
    bounded key space (2 directions x years).

    Returns (supp_nation, cust_nation, l_year, revenue_cents)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = {
        n: k for k, n in zip(
            nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()
        )
    }
    pair_keys = np.array([nkeys[nation_a], nkeys[nation_b]], dtype=np.int64)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    s_in = np.isin(sn, pair_keys)
    s_keys, s_code = _sorted_lookup(
        supp.column("s_suppkey").to_numpy().astype(np.int64)[s_in],
        (sn[s_in] == pair_keys[1]).astype(np.int8),  # 0 -> nation_a, 1 -> nation_b
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cn = cust.column("c_nationkey").to_numpy().astype(np.int64)
    c_in = np.isin(cn, pair_keys)
    c_keys, c_code = _sorted_lookup(
        cust.column("c_custkey").to_numpy().astype(np.int64)[c_in],
        (cn[c_in] == pair_keys[1]).astype(np.int8),
    )
    handle = ray.put({"s_keys": s_keys, "s_code": s_code, "c_keys": c_keys, "c_code": c_code})

    lo = np.datetime64(f"{year_lo}-01-01").astype("datetime64[us]")
    hi = np.datetime64(f"{year_hi + 1}-01-01").astype("datetime64[us]")

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    class LineSide:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sd = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            b = batch.filter(pa.array((sd >= lo) & (sd < hi)))
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, pos = _probe_sorted(self.lk["s_keys"], sk)
            b = b.filter(pa.array(hit))
            scode = self.lk["s_code"][pos[hit]].astype(np.int64)
            year = (
                b.column("l_shipdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970
            )
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            t = pa.table(
                {
                    "o_orderkey": b.column("l_orderkey"),
                    "scode": pa.array(scode, pa.int64()),
                    "year": pa.array(year, pa.int64()),
                    "rev": pa.array(rev, pa.int64()),
                }
            )
            g = t.group_by(["o_orderkey", "scode", "year"]).aggregate([("rev", "sum")])
            t = pa.table(
                {
                    "o_orderkey": g.column("o_orderkey"),
                    "scode": g.column("scode"),
                    "year": g.column("year"),
                    "rev": g.column("rev_sum"),
                    "ccode": pa.nulls(g.num_rows, pa.int64()),
                    "__side": pa.array(["l"] * g.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    class OrderSide:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, pos = _probe_sorted(self.lk["c_keys"], ck)
            b = batch.filter(pa.array(hit))
            ccode = self.lk["c_code"][pos[hit]].astype(np.int64)
            t = pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "scode": pa.nulls(b.num_rows, pa.int64()),
                    "year": pa.nulls(b.num_rows, pa.int64()),
                    "rev": pa.nulls(b.num_rows, pa.int64()),
                    "ccode": pa.array(ccode, pa.int64()),
                    "__side": pa.array(["o"] * b.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    both = lineitem.map_batches(LineSide, batch_format="pyarrow", concurrency=(1, 8)).union(
        orders.map_batches(OrderSide, batch_format="pyarrow", concurrency=(1, 4))
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", ["o_orderkey", "scode", "year", "rev"]]
        o = g.loc[g["__side"] == "o", ["o_orderkey", "ccode"]]
        m = l.merge(o, on="o_orderkey", how="inner")
        m = m[m["scode"] != m["ccode"]]
        per = m.groupby(["scode", "ccode", "year"], sort=False)["rev"].sum().reset_index()
        return pd.DataFrame(
            {
                "scode": per["scode"].to_numpy(np.int64),
                "ccode": per["ccode"].to_numpy(np.int64),
                "l_year": per["year"].to_numpy(np.int64),
                "rev": per["rev"].to_numpy(np.int64),
            }
        )

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )
    names = {0: nation_a, 1: nation_b}

    # NOTE: with zero qualifying rows the pipeline yields ZERO blocks and
    # Ray Data drops the schema entirely; callers needing a stable empty
    # schema must pin it driver-side (see __ray_entry__._pin_schema_if_empty)
    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["scode", "ccode", "l_year"]).aggregate([("rev", "sum")])
        return pa.table(
            {
                "supp_nation": pa.array(
                    [names[int(s)] for s in out.column("scode").to_pylist()], pa.string()
                ),
                "cust_nation": pa.array(
                    [names[int(c)] for c in out.column("ccode").to_pylist()], pa.string()
                ),
                "l_year": out.column("l_year"),
                "revenue_cents": out.column("rev_sum"),
            }
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def market_share(sf_dir: str, nation: str = "NATION_5", region: str = "ASIA",
                 p_type: str = "PROMO", buckets: int = 32):
    """TPC-H Q8 shape (national market share): per order-year, the ppm
    share of one nation's suppliers in the revenue of one part type sold
    to customers of one region.

    Three dimension legs collapse to broadcasts (promo partkeys; suppkey ->
    is-target-nation; region custkeys via the nation |><| region snowflake
    resolved driver-side -- 25 rows); lineitem emits per-orderkey
    (nation_rev, total_rev) combiner partials; the orderkey-bucketed
    exchange attaches the order year and folds per year; a tiny final
    computes integer-ppm shares over the bounded year space.

    Returns (o_year, nation_cents, total_cents, share_ppm)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {
        r: k for k, r in zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist())
    }[region]
    region_nations = np.array(
        [
            k for k, rk in zip(
                nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()
            )
            if rk == rkey
        ],
        dtype=np.int64,
    )
    nation_key = {
        n: k for k, n in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }[nation]

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pkeys = np.sort(
        part.filter(pc.equal(part.column("p_type"), p_type))
        .column("p_partkey").to_numpy().astype(np.int64)
    )
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s_keys, s_is_nat = _sorted_lookup(
        supp.column("s_suppkey").to_numpy().astype(np.int64),
        (supp.column("s_nationkey").to_numpy().astype(np.int64) == nation_key).astype(np.int8),
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    c_in = np.isin(cust.column("c_nationkey").to_numpy().astype(np.int64), region_nations)
    ckeys = np.sort(cust.column("c_custkey").to_numpy().astype(np.int64)[c_in])
    handle = ray.put({"pkeys": pkeys, "s_keys": s_keys, "s_is_nat": s_is_nat, "ckeys": ckeys})

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    class LineSide:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, _ = _probe_sorted(self.lk["pkeys"], lp)
            b = batch.filter(pa.array(hit))
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            s_hit, s_pos = _probe_sorted(self.lk["s_keys"], sk)
            is_nat = np.where(s_hit, self.lk["s_is_nat"][s_pos], 0).astype(bool)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            t = pa.table(
                {
                    "o_orderkey": b.column("l_orderkey"),
                    "nat": pa.array(np.where(is_nat, rev, 0), pa.int64()),
                    "tot": pa.array(rev, pa.int64()),
                }
            )
            g = t.group_by(["o_orderkey"]).aggregate([("nat", "sum"), ("tot", "sum")])
            t = pa.table(
                {
                    "o_orderkey": g.column("o_orderkey"),
                    "nat": g.column("nat_sum"),
                    "tot": g.column("tot_sum"),
                    "year": pa.nulls(g.num_rows, pa.int64()),
                    "__side": pa.array(["l"] * g.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    class OrderSide:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, _ = _probe_sorted(self.lk["ckeys"], ck)
            b = batch.filter(pa.array(hit))
            year = (
                b.column("o_orderdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970
            )
            t = pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "nat": pa.nulls(b.num_rows, pa.int64()),
                    "tot": pa.nulls(b.num_rows, pa.int64()),
                    "year": pa.array(year, pa.int64()),
                    "__side": pa.array(["o"] * b.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    both = lineitem.map_batches(LineSide, batch_format="pyarrow", concurrency=(1, 8)).union(
        orders.map_batches(OrderSide, batch_format="pyarrow", concurrency=(1, 4))
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", ["o_orderkey", "nat", "tot"]]
        o = g.loc[g["__side"] == "o", ["o_orderkey", "year"]]
        m = l.merge(o, on="o_orderkey", how="inner")
        per = m.groupby("year", sort=False)[["nat", "tot"]].sum().reset_index()
        return pd.DataFrame(
            {
                "o_year": per["year"].to_numpy(np.int64),
                "nat": per["nat"].to_numpy(np.int64),
                "tot": per["tot"].to_numpy(np.int64),
            }
        )

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["o_year"]).aggregate([("nat", "sum"), ("tot", "sum")])
        nat_ = out.column("nat_sum").to_numpy()
        tot = out.column("tot_sum").to_numpy()
        ppm = (nat_ * 1_000_000) // np.maximum(tot, 1)
        return pa.table(
            {
                "o_year": out.column("o_year"),
                "nation_cents": pa.array(nat_.astype(np.int64), pa.int64()),
                "total_cents": pa.array(tot.astype(np.int64), pa.int64()),
                "share_ppm": pa.array(ppm.astype(np.int64), pa.int64()),
            }
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def small_qty_revenue(sf_dir: str, brand: str = "Brand#13", frac_num: int = 1,
                      frac_den: int = 5, broadcast_cap_bytes: int = 256 << 20):
    """TPC-H Q17 shape (small-quantity-order revenue): gross revenue from
    lineitems of one brand whose quantity is below ``frac`` of that part's
    average quantity -- a correlated per-group average turned into TWO
    broadcast-joined scans with ZERO row shuffle.

    Pass 1 folds per-part (sum_qty_cents, n) combiner partials for the
    brand's parts into one small table (1/|brands| of the part dimension;
    capped with a loud raise); pass 2 re-scans lineitem with the averages
    broadcast and tests ``qty * den * n < num * sum_qty`` in exact integer
    arithmetic (no float division on either side -- the SQL replay shares
    the cross-multiplied compare).

    Returns ONE row (revenue_cents, n_rows)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pkeys = np.sort(
        part.filter(pc.equal(part.column("p_brand"), brand))
        .column("p_partkey").to_numpy().astype(np.int64)
    )
    pk_handle = ray.put(pkeys)

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    class QtyPartial:
        def __init__(self) -> None:
            self.pkeys = ray.get(pk_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, _ = _probe_sorted(self.pkeys, lp)
            b = batch.filter(pa.array(hit))
            qty = np.floor(
                b.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            t = pa.table(
                {
                    "pk": b.column("l_partkey"),
                    "q": pa.array(qty, pa.int64()),
                    "n": pa.array(np.ones(len(qty), np.int64), pa.int64()),
                }
            )
            return t.group_by(["pk"]).aggregate([("q", "sum"), ("n", "sum")])

    # pass 1: per-part qty sums -- the combiner keeps this to one row per
    # (part, batch); the driver folds the small result and re-broadcasts
    partials = lineitem.map_batches(QtyPartial, batch_format="pyarrow", concurrency=(1, 8))
    folded = tiny_final_groupby(
        partials, ["pk"], [("q_sum", "sum"), ("n_sum", "sum")], ["pk", "sum_q", "n"]
    ).to_pandas()
    avg_keys = folded["pk"].to_numpy(np.int64)
    order = np.argsort(avg_keys)
    avgs = {
        "keys": avg_keys[order],
        "sum_q": folded["sum_q"].to_numpy(np.int64)[order],
        "n": folded["n"].to_numpy(np.int64)[order],
    }
    if avgs["keys"].nbytes * 3 > broadcast_cap_bytes:
        raise ValueError("per-part average table exceeds the broadcast cap; bucket-join pass 2")
    avg_handle = ray.put(avgs)

    class Pass2:
        def __init__(self) -> None:
            self.lk = ray.get(avg_handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, pos = _probe_sorted(self.lk["keys"], lp)
            b = batch.filter(pa.array(hit))
            qty = np.floor(
                b.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            sum_q = self.lk["sum_q"][pos[hit]]
            n = self.lk["n"][pos[hit]]
            # qty < (num/den) * avg  <=>  qty * den * n < num * sum_q
            keep = qty * frac_den * n < frac_num * sum_q
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            rev = np.floor(price * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "__k": pa.array([0], pa.int64()),
                    "rev": pa.array([int(rev.sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

    out = tiny_final_groupby(
        lineitem.map_batches(Pass2, batch_format="pyarrow", concurrency=(1, 8)),
        ["__k"],
        [("rev", "sum"), ("n", "sum")],
        ["__k", "revenue_cents", "n_rows"],
    )
    return out.drop_columns(["__k"])


def supplier_count_by_part_attrs(sf_dir: str, exclude_brand: str = "Brand#13",
                                 sizes: tuple = (1, 5, 10, 15, 20, 25),
                                 buckets: int = 32):
    """TPC-H Q16 shape (supplier breadth per part class, adapted to the
    observed lineitem relation in place of partsupp): how many DISTINCT
    suppliers ship each (brand, type, size) class, excluding one brand and
    restricted to a size list.

    The part dimension broadcasts as (sorted qualifying partkeys, attr
    codes); every lineitem batch maps partkey -> attr code and emits
    batch-distinct (attr, suppkey) pairs (the combiner -- duplicate
    shipments never leave the scan); ONE suppkey-bucketed exchange makes
    the pairs globally distinct (a suppkey lives in exactly one bucket)
    and folds per-attr counts; a tiny final sums the bounded attr space.

    Returns (p_brand, p_type, p_size, supplier_cnt)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )
    keep = pc.and_(
        pc.not_equal(part.column("p_brand"), exclude_brand),
        pc.is_in(part.column("p_size"), value_set=pa.array(list(sizes), pa.int64())),
    )
    part = part.filter(keep)
    # encode (brand, type, size) combos once; codes ship instead of strings
    # (separator is \x1f, NOT \x00 -- numpy's fixed-width unicode dtype
    # silently drops embedded NULs when np.unique casts object -> U)
    combo = pd.DataFrame(
        {
            "brand": part.column("p_brand").to_pylist(),
            "type": part.column("p_type").to_pylist(),
            "size": part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64),
        }
    )
    attrs, codes = np.unique(
        (combo["brand"] + "\x1f" + combo["type"] + "\x1f" + combo["size"].astype(str)).to_numpy(),
        return_inverse=True,
    )
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    order = np.argsort(pk)
    lookup = {"keys": pk[order], "code": codes.astype(np.int64)[order]}
    handle = ray.put(lookup)

    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])

    class Pairs:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, pos = _probe_sorted(self.lk["keys"], lp)
            code = self.lk["code"][pos[hit]]
            supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)[hit]
            pairs = np.unique(np.stack([code, supp], axis=1), axis=0)
            t = pa.table(
                {
                    "code": pa.array(pairs[:, 0], pa.int64()),
                    "supp": pa.array(pairs[:, 1], pa.int64()),
                }
            )
            return hash_bucket_column(t, "supp", buckets)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["code", "supp"]].drop_duplicates()
        per = d.groupby("code", sort=False).size().reset_index(name="cnt")
        return pd.DataFrame(
            {"code": per["code"].to_numpy(np.int64), "cnt": per["cnt"].to_numpy(np.int64)}
        )

    folded = (
        lineitem.map_batches(Pairs, batch_format="pyarrow", concurrency=(1, 8))
        .repartition(buckets)
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
    )

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["code"]).aggregate([("cnt", "sum")])
        code = out.column("code").to_numpy()
        parts = [attrs[int(c)].split("\x1f") for c in code]
        return pa.table(
            {
                "p_brand": pa.array([p[0] for p in parts], pa.string()),
                "p_type": pa.array([p[1] for p in parts], pa.string()),
                "p_size": pa.array([int(p[2]) for p in parts], pa.int64()),
                "supplier_cnt": out.column("cnt_sum"),
            }
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def waiting_suppliers(sf_dir: str, late_days: int = 60, status: str = "F",
                      buckets: int = 32):
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted to the
    available columns: "late" means the supplier's LAST shipment left more
    than ``late_days`` after the order date): per supplier, the number of
    finished multi-supplier orders where that supplier was the ONLY late
    one -- the classic EXISTS / NOT-EXISTS double-correlation.

    Lineitem folds per-(orderkey, suppkey) max-shipdate combiner partials
    map-side; orders prune to the status map-side; ONE orderkey-bucketed
    exchange re-folds the max, joins the order date, and evaluates the
    exactly-one-late / at-least-two-suppliers predicate vectorized per
    order; per-bucket per-supplier counts fold in a tiny final with the
    supplier names broadcast.

    Returns (s_suppkey, s_name, numwait) for suppliers with numwait >= 1."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("o_orderstatus"), status))
        od = (
            b.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        t = pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "supp": pa.nulls(b.num_rows, pa.int64()),
                "ship_us": pa.nulls(b.num_rows, pa.int64()),
                "od_us": pa.array(od, pa.int64()),
                "__side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    def line_side(batch: pa.Table) -> pa.Table:
        ship = (
            batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        t = pa.table(
            {
                "o_orderkey": batch.column("l_orderkey"),
                "supp": batch.column("l_suppkey"),
                "ship_us": pa.array(ship, pa.int64()),
            }
        )
        g = t.group_by(["o_orderkey", "supp"]).aggregate([("ship_us", "max")])
        t = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "supp": g.column("supp"),
                "ship_us": g.column("ship_us_max"),
                "od_us": pa.nulls(g.num_rows, pa.int64()),
                "__side": pa.array(["l"] * g.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lineitem.map_batches(line_side, batch_format="pyarrow")
    )
    late_us = np.int64(late_days) * 86_400_000_000

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", ["o_orderkey", "supp", "ship_us"]]
        per = l.groupby(["o_orderkey", "supp"], sort=False)["ship_us"].max().reset_index()
        o = g.loc[g["__side"] == "o", ["o_orderkey", "od_us"]]
        m = per.merge(o, on="o_orderkey", how="inner")
        m["late"] = m["ship_us"] > m["od_us"] + late_us
        st = m.groupby("o_orderkey", sort=False).agg(
            n_supp=("supp", "size"), n_late=("late", "sum")
        )
        ok = st[(st["n_supp"] >= 2) & (st["n_late"] == 1)].index
        culprit = m[m["late"] & m["o_orderkey"].isin(ok)]
        per_supp = culprit.groupby("supp", sort=False).size().reset_index(name="numwait")
        return pd.DataFrame(
            {
                "supp": per_supp["supp"].to_numpy(np.int64),
                "numwait": per_supp["numwait"].to_numpy(np.int64),
            }
        )

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(), supp.column("s_name").to_pylist()))

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["supp"]).aggregate([("numwait", "sum")])
        sk = out.column("supp").to_pylist()
        return pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pa.array([names[int(s)] for s in sk], pa.string()),
                "numwait": out.column("numwait_sum"),
            }
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def product_profit(sf_dir: str, p_type: str = "ECONOMY", cost_pct: int = 10,
                   buckets: int = 32):
    """TPC-H Q9 shape (product-type profit by nation and year, with
    ``cost_pct`` percent of the part's retail price per unit standing in
    for the absent partsupp supplycost): profit = discounted revenue minus
    quantity x unit cost, folded per (supplier nation, order year).

    Part (retail cents for the type's parts) and supplier (nation code)
    broadcast once; lineitem emits per-(orderkey, nation) integer profit
    combiner partials; ONE orderkey-bucketed exchange attaches the order
    year and folds; a tiny final resolves nation names over the bounded
    (25 x years) key space.

    Returns (n_name, o_year, profit_cents)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_retailprice"])
    part = part.filter(pc.equal(part.column("p_type"), p_type))
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    order = np.argsort(pk)
    retail_cents = np.floor(
        part.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s_keys, s_nat = _sorted_lookup(
        supp.column("s_suppkey").to_numpy().astype(np.int64),
        supp.column("s_nationkey").to_numpy().astype(np.int64),
    )
    handle = ray.put(
        {"pkeys": pk[order], "retail": retail_cents[order], "s_keys": s_keys, "s_nat": s_nat}
    )

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])

    class LineSide:
        def __init__(self) -> None:
            self.lk = ray.get(handle)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hit, pos = _probe_sorted(self.lk["pkeys"], lp)
            b = batch.filter(pa.array(hit))
            retail = self.lk["retail"][pos[hit]]
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            s_hit, s_pos = _probe_sorted(self.lk["s_keys"], sk)
            nat = np.where(s_hit, self.lk["s_nat"][s_pos], -1)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            qty = np.floor(
                b.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
            ).astype(np.int64)
            rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            profit = rev - qty * retail * cost_pct // 100
            t = pa.table(
                {
                    "o_orderkey": b.column("l_orderkey"),
                    "nat": pa.array(nat, pa.int64()),
                    "profit": pa.array(profit, pa.int64()),
                }
            )
            g = t.group_by(["o_orderkey", "nat"]).aggregate([("profit", "sum")])
            t = pa.table(
                {
                    "o_orderkey": g.column("o_orderkey"),
                    "nat": g.column("nat"),
                    "profit": g.column("profit_sum"),
                    "year": pa.nulls(g.num_rows, pa.int64()),
                    "__side": pa.array(["l"] * g.num_rows, pa.string()),
                }
            )
            return hash_bucket_column(t, "o_orderkey", buckets)

    def order_side(batch: pa.Table) -> pa.Table:
        year = (
            batch.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        t = pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "nat": pa.nulls(batch.num_rows, pa.int64()),
                "profit": pa.nulls(batch.num_rows, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "__side": pa.array(["o"] * batch.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = lineitem.map_batches(LineSide, batch_format="pyarrow", concurrency=(1, 8)).union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", ["o_orderkey", "nat", "profit"]]
        o = g.loc[g["__side"] == "o", ["o_orderkey", "year"]]
        m = l.merge(o, on="o_orderkey", how="inner")
        per = m.groupby(["nat", "year"], sort=False)["profit"].sum().reset_index()
        return pd.DataFrame(
            {
                "nat": per["nat"].to_numpy(np.int64),
                "o_year": per["year"].to_numpy(np.int64),
                "profit": per["profit"].to_numpy(np.int64),
            }
        )

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nnames = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["nat", "o_year"]).aggregate([("profit", "sum")])
        return pa.table(
            {
                "n_name": pa.array(
                    [nnames[int(n)] for n in out.column("nat").to_pylist()], pa.string()
                ),
                "o_year": out.column("o_year"),
                "profit_cents": out.column("profit_sum"),
            }
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def order_priority_check(sf_dir: str, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01", late_days: int = 30,
                         buckets: int = 32):
    """TPC-H Q4 shape (order-priority checking, adapted: "late" = some
    lineitem shipped more than ``late_days`` after the order date, since the
    observed lineitem relation carries no commit/receipt dates): per
    priority class, how many orders placed in [date_lo, date_hi) have AT
    LEAST ONE late lineitem.

    The EXISTS turns into a per-orderkey MAX-shipdate combiner (exists a
    late ship <=> max ship is late), so the lineitem side of the ONE
    orderkey-bucketed exchange is one row per (order, batch). The lineitem
    scan prunes to ``l_shipdate > date_lo``: a qualifying ship satisfies
    ship > orderdate + late_days >= date_lo, so the filter is lossless for
    the existence test while skipping most of history at 100 TB.

    Returns (o_orderpriority, order_count)."""
    import ray.data as rd

    lo_us = np.datetime64(date_lo, "us").astype(np.int64)
    hi_us = np.datetime64(date_hi, "us").astype(np.int64)
    late_us = np.int64(late_days) * 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        od = (
            batch.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = (od >= lo_us) & (od < hi_us)
        b = batch.filter(pa.array(keep))
        t = pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "prio": b.column("o_orderpriority"),
                "us": pa.array(od[keep], pa.int64()),
                "__side": pa.array(["o"] * b.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    def line_side(batch: pa.Table) -> pa.Table:
        ship = (
            batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = ship > lo_us  # lossless prune: see docstring
        t = pa.table(
            {
                "o_orderkey": batch.column("l_orderkey").filter(pa.array(keep)),
                "us": pa.array(ship[keep], pa.int64()),
            }
        )
        g = t.group_by(["o_orderkey"]).aggregate([("us", "max")])
        t = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "prio": pa.nulls(g.num_rows, pa.string()),
                "us": g.column("us_max"),
                "__side": pa.array(["l"] * g.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lineitem.map_batches(line_side, batch_format="pyarrow")
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["__side"] == "o", ["o_orderkey", "prio", "us"]]
        l = g.loc[g["__side"] == "l", ["o_orderkey", "us"]]
        mx = l.groupby("o_orderkey", sort=False)["us"].max()
        m = o.merge(mx.rename("mx"), left_on="o_orderkey", right_index=True, how="inner")
        late = m[m["mx"] > m["us"] + late_us]
        per = late.groupby("prio", sort=False).size().reset_index(name="n")
        return pd.DataFrame({"prio": per["prio"], "n": per["n"].to_numpy(np.int64)})

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )
    return tiny_final_groupby(
        folded, ["prio"], [("n", "sum")], ["o_orderpriority", "order_count"]
    )


def line_priority_counts(sf_dir: str, year: int = 1996, buckets: int = 32):
    """TPC-H Q12 shape (shipping-class vs order priority, adapted: the
    observed lineitem relation has no ship mode, so l_returnflag is the
    class axis): for lineitems shipped in ``year``, per return flag, how
    many came from high-priority orders (1-URGENT / 2-HIGH) vs the rest.

    Lineitem emits per-(orderkey, flag) count combiner partials after the
    year prune; orders carry one (orderkey, is_high) bit; ONE
    orderkey-bucketed exchange folds (flag, high, low) partials and the
    bounded-flag final sums them.

    Returns (l_returnflag, high_count, low_count)."""
    import ray.data as rd

    lo_us = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi_us = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )

    def order_side(batch: pa.Table) -> pa.Table:
        prio = batch.column("o_orderpriority")
        hi = pc.or_(pc.equal(prio, "1-URGENT"), pc.equal(prio, "2-HIGH"))
        t = pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "flag": pa.nulls(batch.num_rows, pa.string()),
                "n": pa.nulls(batch.num_rows, pa.int64()),
                "hi": hi.combine_chunks() if isinstance(hi, pa.ChunkedArray) else hi,
                "__side": pa.array(["o"] * batch.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    def line_side(batch: pa.Table) -> pa.Table:
        ship = (
            batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = (ship >= lo_us) & (ship < hi_us)
        b = batch.filter(pa.array(keep))
        t = pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "flag": b.column("l_returnflag"),
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(["o_orderkey", "flag"]).aggregate([("n", "sum")])
        t = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "flag": g.column("flag"),
                "n": g.column("n_sum"),
                "hi": pa.nulls(g.num_rows, pa.bool_()),
                "__side": pa.array(["l"] * g.num_rows, pa.string()),
            }
        )
        return hash_bucket_column(t, "o_orderkey", buckets)

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lineitem.map_batches(line_side, batch_format="pyarrow")
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", ["o_orderkey", "flag", "n"]]
        o = g.loc[g["__side"] == "o", ["o_orderkey", "hi"]]
        m = l.merge(o, on="o_orderkey", how="inner")
        m["high"] = np.where(m["hi"].to_numpy(bool), m["n"].to_numpy(np.int64), 0)
        m["low"] = m["n"].to_numpy(np.int64) - m["high"].to_numpy(np.int64)
        per = m.groupby("flag", sort=False)[["high", "low"]].sum().reset_index()
        return pd.DataFrame(
            {
                "flag": per["flag"],
                "high": per["high"].to_numpy(np.int64),
                "low": per["low"].to_numpy(np.int64),
            }
        )

    folded = (
        both.repartition(buckets).groupby("__bucket").map_groups(fold_bucket, batch_format="pandas")
    )
    return tiny_final_groupby(
        folded,
        ["flag"],
        [("high", "sum"), ("low", "sum")],
        ["l_returnflag", "high_count", "low_count"],
    )


def customer_order_distribution(sf_dir: str, exclude_priority: str = "5-LOW",
                                buckets: int = 32):
    """TPC-H Q13 shape (customer order-count distribution, with one
    priority class excluded standing in for the comment anti-filter): how
    many customers placed exactly c_count qualifying orders -- INCLUDING
    the zero bin (customers with no qualifying orders at all).

    Orders emit per-batch per-custkey count partials; ONE custkey-bucketed
    exchange folds exact per-customer totals and collapses each bucket to
    its (c_count -> n_customers) histogram, so the final merge is
    bounded by the max order count, not the customer count. The zero bin
    is total customers (parquet metadata count -- no scan) minus the
    histogram mass; qualifying-order custkeys are assumed to be a subset
    of the customer table (holds for the testdata; the SQL replay's LEFT
    JOIN encodes the same assumption).

    Returns (c_count, custdist)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    total_customers = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch.column("o_orderpriority"), exclude_priority))
        t = pa.table(
            {
                "ck": b.column("o_custkey"),
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(["ck"]).aggregate([("n", "sum")])
        g = g.rename_columns(["ck", "n"])
        return hash_bucket_column(g, "ck", buckets)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("ck", sort=False)["n"].sum()
        hist = per.value_counts()
        return pd.DataFrame(
            {
                "c_count": hist.index.to_numpy(np.int64),
                "custdist": hist.to_numpy(np.int64),
            }
        )

    folded = (
        orders.map_batches(partial, batch_format="pyarrow")
        .repartition(buckets)
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
    )

    def final(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["c_count"]).aggregate([("custdist", "sum")])
        cc = out.column("c_count").to_numpy(zero_copy_only=False).astype(np.int64)
        cd = out.column("custdist_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        zero = total_customers - int(cd.sum())
        if zero > 0:  # the SQL replay's LEFT JOIN emits a 0 bin only when occupied
            cc = np.concatenate([cc, [0]])
            cd = np.concatenate([cd, [zero]])
        return pa.table(
            {"c_count": pa.array(cc, pa.int64()), "custdist": pa.array(cd, pa.int64())}
        )

    return folded.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def first_event_after_order(sf_dir: str):
    """FORWARD as-of join: for each order, the customer's FIRST event
    STRICTLY after the order timestamp and the gap in days -- the
    time-to-next-touch operational join (did the purchase trigger
    activity?), the mirror of ``last_order_before_event``'s backward
    lookup. Same bucketed merge_asof plan, ``direction='forward'`` with
    exact matches excluded; inner semantics (orders whose customer never
    acts again drop).

    Returns (o_orderkey, next_event_day, gap_days)."""
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    buckets = derive_buckets(max(orders.count(), events.count()))
    joined = asof_join(
        orders, events, key="o_custkey", right_key="user_id",
        left_ts="o_orderdate", right_ts="ts", buckets=buckets,
        direction="forward", allow_exact=False,
    )

    def project(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy() // 86_400_000_000
        nd = batch.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        day = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d")
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "next_event_day": day,
                "gap_days": pa.array((nd - od).astype(np.int64), pa.int64()),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def attribution_last_touch(sf_dir: str, conversion_type: str = "purchase",
                           buckets: int = 64):
    """Last-touch attribution: each CONVERSION event (``event_type ==
    'purchase'``) is credited to the event_type of the same user's
    immediately preceding event in (ts, event_id) order — '(none)' when
    the conversion is the user's first touch. The marketing-analytics
    staple ("which touch gets the credit?"), value-weighted: the
    conversion's own ``value`` (exact cents) accrues to the credited
    channel. (The orders table cannot play the conversion role here:
    TPC-H order dates 1992-98 all PRECEDE the events' time range, so an
    order's strictly-prior event never exists — measured, not assumed.)

    Scale shape: LAG needs per-user order, so the narrow (user, ts, id,
    type, cents) projection takes ONE user-bucketed exchange (the
    event_transitions plan); each bucket runs one vectorized
    sort + shifted-compare pass and folds to a bounded (channel) partial,
    so the second exchange is channel-vocabulary-sized. Output
    (channel, n_conversions, value_cents), channel ASC."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id", "value"],
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "c": _cents(batch.column("value")),
            }
        )
        return hash_bucket_column(t, "user_id", buckets)

    def attribute(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        prev = np.empty(len(g), dtype=object)
        prev[0:1] = "(none)"
        if len(g) > 1:
            same = u[1:] == u[:-1]
            prev[1:] = np.where(same, t[:-1], "(none)")
        conv = t == conversion_type
        out = pd.DataFrame(
            {"channel": prev[conv], "c": g["c"].to_numpy(np.int64)[conv]}
        )
        agg = out.groupby("channel", sort=False).agg(
            n_conversions=("c", "size"), value_cents=("c", "sum")
        ).reset_index()
        return agg.astype({"n_conversions": "int64", "value_cents": "int64"})

    out = (
        tiny_final_groupby(
            events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(attribute, batch_format="pandas"),
            ["channel"],
            [("n_conversions", "sum"), ("value_cents", "sum")],
            ["channel", "n_conversions", "value_cents"],
        )
        .to_pandas()
        .sort_values("channel")
        .reset_index(drop=True)
    )
    for c in ("n_conversions", "value_cents"):
        out[c] = out[c].astype(np.int64)
    return out


def grouped_pair_fold(ds, key_cols, agg: dict, buckets: int = 16):
    """Grouped aggregate on a MULTI-column integer key (pair tables)
    via a derived int64 partition key + per-bucket pandas groupby.
    Ray's native ``groupby(["a","b"]).aggregate(...)`` sort aggregate
    measured 25 s on 107k partial rows (winnow_fingerprint_pairs) where
    this fold takes under a second, and the same swap took
    ngram_jaccard_pairs 17.2 → 7.8 s — both are pair partials emitted
    by a ``map_groups`` stage. The swap is NOT universally right:
    on triangle_count / link_prediction's edge dedupe (a low-block-count
    ``map_batches`` Arrow table) the native aggregate measured FASTER
    (3.2/4.3 s native vs 5.5/7.0 s folded on identical inputs), so those
    keep the native path. Rule of thumb from the four measurements:
    fold pair partials that come out of a grouped/bucketed stage;
    leave plain map-stage pair tables on the native aggregate — and
    measure, the boundary is empirical. The derived key (wraparound
    multiply-add) is ONLY ever a partition key — the true multi-column
    groupby runs inside each bucket, so collisions cost nothing.

    ``agg``: {out_name: (value_col, fn)} with pandas agg fns
    ('sum'/'min'/'max'/'size'/...). Key columns must be integral."""
    import pandas as pd

    def add_pk(batch: pa.Table) -> pa.Table:
        arrs = [
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in key_cols
        ]
        with np.errstate(over="ignore"):
            key = arrs[0].copy()
            for a in arrs[1:]:
                key = key * np.int64(1000003) + a
        batch = batch.append_column("__pk", pa.array(key, pa.int64()))
        return hash_bucket_column(batch, "__pk", buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(list(key_cols), sort=False).agg(
            **{name: (col, fn) for name, (col, fn) in agg.items()}
        ).reset_index()
        return out

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )


def watermark_late_counts(events, delay_us: int = 300_000_000,
                          partitions: int = 32):
    """Watermark / allowed-lateness audit: replaying the stream in ARRIVAL
    order (ascending event_id), the watermark after each event is the
    running MAX event time minus ``delay_us``; an arriving event whose
    event time is already below the watermark -- strictly
    ``prefix_max - ts > delay_us`` -- would be dropped (or side-output) by
    any event-time window with that allowed lateness. Counts per tumbling
    HOUR of event time: how many events, how many late -- the number that
    tells you what lateness budget a streaming deployment of these windows
    actually needs (out_of_order_audit measures per-user disorder; this is
    the GLOBAL single-watermark semantics engines like Flink/Beam apply).

    Scale shape: the global prefix max distributes by block-carry --
    ONE map-side pass takes per-(arrival-range, batch) time maxima (no
    exchange; a bounded partial per batch), the driver folds them into an
    exclusive carry-in per range (bounded), and ONE range-bucketed
    exchange lets each group finish its prefix max locally from its
    carry. Per-group output is (hour, n, n_late) partials into a bounded
    tiny fold. Arrival ranges are value ranges of event_id (contiguous,
    ordered), so the carry composition is exact, not heuristic.

    Returns (hour, n_events, n_late, late_ppm) ordered by hour."""
    import ray

    span_src = events.map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b.column("event_id")).as_py()], pa.int64()),
            "hi": pa.array([pc.max(b.column("event_id")).as_py()], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    lo, hi = int(span_src["lo"].min()), int(span_src["hi"].max())
    span = max(1, (hi - lo + partitions) // partitions)

    def rng(ids: np.ndarray) -> np.ndarray:
        return (ids - lo) // span

    # pass 1 (map-side, no exchange): per-(range, batch) event-time maxima
    def range_max(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        r = rng(ids)
        df = pd.DataFrame({"r": r, "us": us}).groupby("r", as_index=False)["us"].max()
        return pa.Table.from_pandas(df.astype(np.int64), preserve_index=False)

    rmax = events.map_batches(range_max, batch_format="pyarrow").to_pandas()
    rmax = rmax.groupby("r")["us"].max().sort_index()
    carry: dict[int, int] = {}
    run = None
    for r in range(partitions + 1):
        carry[r] = run if run is not None else -(1 << 62)
        if r in rmax.index:
            run = max(run, int(rmax[r])) if run is not None else int(rmax[r])
    carry_h = ray.put(carry)

    def add_range(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(rng(ids).astype(np.int32), pa.int32()))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        c = ray.get(carry_h)[int(g["__bucket"].iloc[0])]
        pmax = np.maximum.accumulate(np.concatenate(([c], us[:-1])))
        late = (pmax - us) > delay_us
        hours = g["ts"].dt.strftime("%Y-%m-%d %H")
        out = pd.DataFrame({"hour": hours.values, "late": late.astype(np.int64)})
        agg = out.groupby("hour", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"))
        return agg.astype({"n_events": np.int64, "n_late": np.int64})

    folded = tiny_final_groupby(
        events.map_batches(add_range, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kern, batch_format="pandas"),
        keys=["hour"], aggs=[("n_events", "sum"), ("n_late", "sum")],
        out_names=["hour", "n_events", "n_late"],
    ).to_pandas()
    folded["late_ppm"] = (
        folded["n_late"].to_numpy(np.int64) * 1_000_000
        // folded["n_events"].to_numpy(np.int64)
    )
    for c in ("n_events", "n_late", "late_ppm"):
        folded[c] = folded[c].astype(np.int64)
    return folded.sort_values("hour").reset_index(drop=True)
