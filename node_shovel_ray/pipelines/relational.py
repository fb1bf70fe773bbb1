"""Relational operator coverage over the TPC-H-ish testdata tables.

The reference has no data-level relational ops (SURVEY.md §2.7 — it is a row
shuttle); these are the promoted operators the rebuild adds, each built
Ray-Data-first and oracle-checked against DuckDB SQL in __ray_entry__:

- grouped aggregation (partial-friendly Sum/Count/Mean)
- broadcast hash join (small dimension side via ray.put, no shuffle)
- global top-k (sort + limit)
- distinct
- windowed sessionization (gap-based, per-key map_groups)
- filtered vectorized projection
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.enrich import lookup_enrich


def _round2(arr):
    """round(x, 2) with DuckDB semantics (half away from zero, not half-even)."""
    return pc.round(arr, 2, round_mode="half_towards_infinity")


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "rd.Dataset":
    # prune at the read: only requested columns leave storage
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def agg_pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q1-shaped grouped aggregate over lineitem."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("revenue", rev)

    from ..stages.aggregate import combinable_groupby

    ds = ds.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
    # partial-then-final: the exchange carries one row per (flags, block),
    # never the lineitem rows
    out = combinable_groupby(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_revenue": ("revenue", "sum"),
            "n": (None, "count"),
        },
    )

    def rounded(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_qty"), "sum_qty", _round2(t["sum_qty"])
        ).set_column(
            t.schema.get_field_index("sum_revenue"),
            "sum_revenue",
            _round2(t["sum_revenue"]),
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def join_orders_customers(sf_dir: str) -> "rd.Dataset":
    """orders ⋈ customer via broadcast lookup (dimension side ray.put once),
    then grouped count+sum per customer market segment."""
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    lookup = pa.table(
        {
            "o_custkey": pa.array(cust["c_custkey"], pa.int64()),
            "c_mktsegment": pa.array(cust["c_mktsegment"], pa.string()),
        }
    )
    from ..stages.aggregate import combinable_groupby

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = lookup_enrich(orders, lookup, key="o_custkey", concurrency=(1, 4))
    out = combinable_groupby(
        joined,
        ["c_mktsegment"],
        {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("total"), "total", _round2(t["total"])
        ),
        batch_format="pyarrow",
    )


def topk_orders(sf_dir: str, k: int = 10) -> "rd.Dataset":
    """Global top-k by price (deterministic tiebreak on orderkey).

    Partial top-k per block first (the vocab_top_tokens plan): the global
    sort-shuffle then sees only k × n_blocks rows, never the full orders
    table — a full-table sort for 10 rows is the classic all-to-all
    bottleneck at scale."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, False]
        ).head(k)

    pruned = ds.map_batches(local_topk, batch_format="pandas", batch_size=None)
    return pruned.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, True]
    ).limit(k)


def distinct_event_types(sf_dir: str) -> pa.Table:
    vals = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def sessionize(sf_dir: str, gap_minutes: int = 30) -> "rd.Dataset":
    """Gap-based session numbering per user — the windowed-aggregate shape
    (stream idiom: partition by key, sort by ts within partition)."""
    from ..stages.keyed import keyed_map_blocks

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = df.groupby("user_id", sort=False)["ts"].diff()
        new = (d > gap) | d.isna()
        df["session_idx"] = (
            new.groupby(df["user_id"], sort=False).cumsum().astype("int64") - 1
        )
        return df[["event_id", "user_id", "session_idx"]]

    return keyed_map_blocks(ds, ["user_id"], per_block)


def filter_project_revenue(sf_dir: str, cutoff: str = "1997-01-01") -> "rd.Dataset":
    """Vectorized filter + computed projection (decoder→UDF map shape)."""
    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_shipdate"], pa.scalar(np.datetime64(cutoff, "us")))
        t = t.filter(keep)
        rev = _round2(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue": rev}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grouped_topk_hours(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Per-key top-k: the 3 busiest hours per event_type (count desc,
    hour asc tiebreak). Keyed stage → hash-bucket block processing; the
    aggregate before it shrinks the data to (type, hour) rows first."""
    from ray.data.aggregate import Count

    from ..stages.keyed import keyed_map_blocks

    ev = _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("ts"), "ts",
            pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )
    from ..stages.aggregate import combinable_groupby

    hourly = combinable_groupby(ev, ["event_type", "ts"], {"n": (None, "count")})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "n", "ts"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("event_type", sort=False).head(k)

    out = keyed_map_blocks(hourly, ["event_type"], topk)
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "hour", "n"]),
        batch_format="pyarrow",
    )


def distinct_users_per_type(sf_dir: str) -> "rd.Dataset":
    """Exact count-distinct per group: two-stage — distinct (type, user)
    pairs via keyed first-per-key (shuffle carries deduped pairs only),
    then a count per type."""
    from ray.data.aggregate import Count

    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    from ..stages.aggregate import combinable_groupby

    pairs = _read(sf_dir, "events", ["event_type", "user_id"])
    dedup = keyed_map_blocks(
        pairs, ["event_type", "user_id"],
        first_per_key_block(["event_type", "user_id"]),
    )
    return combinable_groupby(dedup, ["event_type"], {"n_users": (None, "count")})


def asof_join_events_orders(sf_dir: str) -> "rd.Dataset":
    """As-of join: each event matched to the latest order of the same
    customer at-or-before the event time — an operator Ray Data lacks,
    composed as hash-bucket co-location + ``pd.merge_asof`` per bucket
    (partitioning assumption: both sides bucketed on the same key hash).

    Scale shape: both sides shuffle ONCE on the join key; per-bucket work is
    a sorted merge (O(n log n) in the bucket). Oracle: DuckDB ASOF JOIN.
    """
    from ..stages.keyed import _add_bucket, default_num_blocks

    nb = default_num_blocks()
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        lambda t: _add_bucket(["user_id"], nb)(t).append_column(
            "_side", pa.array(np.zeros(len(t), np.int8))
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def order_cols(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_id": pa.nulls(len(t), pa.int64()),
                "user_id": t["o_custkey"],
                "ts": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
            }
        )
        return _add_bucket(["user_id"], nb)(t).append_column(
            "_side", pa.array(np.ones(len(t), np.int8))
        )

    orders_n = orders.map_batches(order_cols, batch_format="pyarrow")
    ev_n = ev.map_batches(
        lambda t: t.append_column(
            "o_totalprice", pa.nulls(len(t), pa.float64())
        ).select(["event_id", "user_id", "ts", "o_totalprice", "_bucket", "_side"]),
        batch_format="pyarrow",
    )
    both = ev_n.union(orders_n.select_columns(
        ["event_id", "user_id", "ts", "o_totalprice", "_bucket", "_side"]
    ))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0][["event_id", "user_id", "ts"]]
        right = df[df["_side"] == 1][["user_id", "ts", "o_totalprice"]]
        if not len(left):
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "last_order_price": pd.Series([], dtype="float64")}
            )
        left = left.sort_values("ts", kind="mergesort")
        right = right.sort_values("ts", kind="mergesort")
        m = pd.merge_asof(
            left, right, on="ts", by="user_id", direction="backward",
            allow_exact_matches=True,
        )
        out = m[["event_id", "user_id", "o_totalprice"]].rename(
            columns={"o_totalprice": "last_order_price"}
        )
        # the union carries null event_id on the orders side → pandas made
        # the column float64; restore int64 for the events rows
        out["event_id"] = out["event_id"].astype("int64")
        out["last_order_price"] = out["last_order_price"].round(2)
        return out

    from ..stages.keyed import keyed_map_blocks

    # rows already carry _bucket; group on it directly (one exchange)
    return both.groupby("_bucket").map_groups(
        lambda g: per_bucket(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


def union_event_extremes(sf_dir: str) -> "rd.Dataset":
    """Set op: union of two filtered views (high-value ∪ error events)."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    hi = ev.map_batches(
        lambda t: t.filter(pc.greater(t["value"], 180.0)), batch_format="pyarrow"
    )
    err = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "error")), batch_format="pyarrow"
    )
    u = hi.union(err)
    # distinct on event_id (a row can satisfy both predicates)
    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    return keyed_map_blocks(u, ["event_id"], first_per_key_block(["event_id"]))


def _range_interval_agg(m: pd.DataFrame, win: "np.timedelta64") -> pd.DataFrame:
    """Shared kernel for both range-join plans: interval filter + per-event
    count/revenue aggregate over a (event × candidate-order) merged frame.
    NaT order dates (events with no orders, via the left merge) compare
    False and contribute n=0 / total=0."""
    od = m["o_orderdate"].to_numpy("datetime64[us]")
    ts = m["ts"].to_numpy("datetime64[us]")
    with np.errstate(invalid="ignore"):
        ok = (od >= ts - win) & (od <= ts)
    m["_n"] = ok.astype("int64")
    m["_v"] = np.where(ok, np.nan_to_num(m["o_totalprice"].to_numpy()), 0.0)
    g = m.groupby("event_id", sort=False).agg(
        n_recent_orders=("_n", "sum"), recent_total=("_v", "sum")
    )
    g = g.reset_index()
    g["event_id"] = g["event_id"].astype("int64")
    g["n_recent_orders"] = g["n_recent_orders"].astype("int64")
    # round(2) half-away-from-zero, matching the DuckDB oracle
    v = g["recent_total"].to_numpy()
    g["recent_total"] = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5) / 100
    return g


def _range_join_bucketed(
    events: "rd.Dataset", orders: "rd.Dataset", win: "np.timedelta64"
) -> "rd.Dataset":
    """Bucket-both-sides range join (the big-dimension plan): union the two
    sides into one schema with a side marker, hash-partition on the join
    key (ONE keyed exchange, the asof_join pattern), then per bucket run
    the same merge + interval-filter + aggregate the broadcast plan runs
    per batch. Per-task memory is bounded by bucket size, never the
    dimension table."""
    from ..stages.keyed import keyed_map_blocks

    def ev_norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "o_totalprice": pa.nulls(len(t), pa.float64()),
                "_side": pa.array(np.zeros(len(t), np.int8)),
            }
        )

    def or_norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pa.nulls(len(t), pa.int64()),
                "user_id": t["o_custkey"],
                "ts": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "o_totalprice": t["o_totalprice"],
                "_side": pa.array(np.ones(len(t), np.int8)),
            }
        )

    both = events.map_batches(ev_norm, batch_format="pyarrow").union(
        orders.map_batches(or_norm, batch_format="pyarrow")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 0][["event_id", "user_id", "ts"]]
        if not len(left):
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "n_recent_orders": pd.Series([], dtype="int64"),
                 "recent_total": pd.Series([], dtype="float64")}
            )
        right = df[df["_side"] == 1][["user_id", "ts", "o_totalprice"]].rename(
            columns={"ts": "o_orderdate"}
        )
        m = left.merge(right, on="user_id", how="left")
        return _range_interval_agg(m, win)

    return keyed_map_blocks(both, ["user_id"], per_bucket)


def range_join_events_orders(
    sf_dir: str,
    window_days: int = 90,
    broadcast_max_bytes: int = 64 << 20,
    force_bucketed: bool = False,
) -> "rd.Dataset":
    """Range (interval) join: per event, count + revenue of the same
    customer's orders with ``o_orderdate`` in ``[ts - window, ts]`` — the
    interval-predicate join family Ray Data lacks. Left-join semantics:
    events with no matching order keep n=0 / total=0.

    Plan selection on dimension size (parquet footprint on storage — a
    metadata-only check, no execution):

    - small dimension → broadcast plan: orders pre-filtered to the probe
      side's distinct keys (a semi-join, so only referenced customers
      ship), ``ray.put`` once, fetched once per actor; the fact side
      streams and never shuffles.
    - large dimension (or ``force_bucketed``) → bucket-both-sides plan
      (:func:`_range_join_bucketed`): one keyed exchange, per-bucket
      memory bounded by bucket size. Both plans share the interval/agg
      kernel and produce identical rows (pinned by test).
    """
    import ray

    from ..stages.keyed import default_pool

    win = np.timedelta64(window_days, "D")
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders_ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    path = os.path.join(sf_dir, "orders.parquet")
    dim_bytes = (
        sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
        if os.path.isdir(path)
        else os.path.getsize(path)
    )
    if force_bucketed or dim_bytes > broadcast_max_bytes:
        return _range_join_bucketed(ev, orders_ds, win)

    # broadcast plan — pre-filter the dimension to keys the probe actually
    # references (distinct user_ids; bounded by the user population)
    probe_keys = pa.array(sorted(ev.unique("user_id")), pa.int64())
    orders = (
        orders_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=probe_keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        .reset_index(drop=True)
    )
    ref = ray.put(orders)

    class RangeJoin:
        def __init__(self):
            self.orders = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = b.merge(
                self.orders, left_on="user_id", right_on="o_custkey", how="left"
            )
            return _range_interval_agg(m, win)

    return ev.map_batches(
        RangeJoin, batch_format="pandas", concurrency=default_pool()
    )


def hash_join_events_customers(sf_dir: str) -> "rd.Dataset":
    """Generic distributed hash join (stages/join.hash_join): events ⋈
    customer on user_id — both sides shuffle ONCE on the key hash, merge
    per bucket; neither side broadcasts (the big-build-side shape
    lookup_enrich can't serve)."""
    from ..stages.join import hash_join

    ev = _read(sf_dir, "events", ["event_id", "user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(ev, cust, left_on="user_id", right_on="c_custkey", how="inner")


def _custkeys_with_urgent_orders(sf_dir: str) -> "pa.Array":
    """Distinct custkeys holding 1-URGENT orders — the tiny build side for
    semi/anti joins (urgent-only so BOTH joins select non-trivially)."""
    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    keys = urgent.unique("o_custkey")
    return pa.array(sorted(keys), pa.int64())


def semi_join_customers(sf_dir: str) -> "rd.Dataset":
    """Semi join: customers having at least one urgent order. The build
    side is a distinct-key set broadcast into a streaming is_in filter —
    the probe side never shuffles (big-probe/small-build shape)."""
    keyset = _custkeys_with_urgent_orders(sf_dir)

    def probe(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_custkey"], value_set=keyset))

    return _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


def anti_join_customers(sf_dir: str) -> "rd.Dataset":
    """Anti join: customers with NO urgent orders (same shape, negated)."""
    keyset = _custkeys_with_urgent_orders(sf_dir)

    def probe(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=keyset)))

    return _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


def median_value_per_type(sf_dir: str) -> "rd.Dataset":
    """Exact per-group median (discrete, lower-of-two for even counts —
    DuckDB quantile_disc(0.5) semantics). Ray has no quantile aggregate;
    composed as one keyed exchange + a vectorized per-group quantile in
    each hash bucket. Exactness costs the groups' values crossing the
    exchange once; for sketched quantiles at 100 TB, pre-aggregate
    per-batch histograms instead."""
    from ..stages.keyed import keyed_map_blocks

    def med(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("event_type", sort=False)["value"]
            .quantile(0.5, interpolation="lower")
            .reset_index()
            .rename(columns={"value": "median_value"})
        )
        out["median_value"] = out["median_value"].round(2)
        return out

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return keyed_map_blocks(ev, ["event_type"], med)


def approx_distinct_users_per_type(sf_dir: str) -> "rd.Dataset":
    """HyperLogLog per-group count-distinct (functions/sketches.py): the
    exchange carries fixed-size register rows per (group, block) instead
    of every distinct pair. Uses the md5 hash variant so the ENTIRE
    sketch (hash → registers → merge → estimator) is reproduced by the
    DuckDB oracle (sql_oracle.Q_APPROX_DISTINCT_USERS) — fully
    oracle-paired since r3, was `no_oracle`. Gate-scale guard retained:
    estimate within 10% of the exact count (p=12 → ~1.6% typical)."""
    from ..functions.sketches import approx_count_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_count_distinct(ev, "event_type", "user_id", p=12, hash_fn="md5")
    if ev.count() <= 1_000_000:
        got = out.to_pandas().set_index("event_type")["approx_n_distinct"]
        exact = (
            distinct_users_per_type(sf_dir)
            .to_pandas()
            .set_index("event_type")["n_users"]
        )
        for t, n in exact.items():
            err = abs(got[t] - n) / max(1, n)
            assert err < 0.1, f"HLL error {err:.3f} for {t}: {got[t]} vs {n}"
        return rd.from_pandas(
            got.reset_index().sort_values("event_type").reset_index(drop=True)
        )
    return out


def approx_median_value_hist(sf_dir: str, bin_width: float = 0.1) -> "rd.Dataset":
    """Histogram-sketch median per event type
    (functions/sketches.grouped_hist_quantile): the 100 TB quantile path —
    the exchange carries (group, bin, count) rows, never the values. The
    sketch itself is SQL-reproducible (same float64 binning in DuckDB), so
    this is a fully oracle-paired APPROXIMATE operator; error ≤ bin_width
    vs the exact median by construction (guard below)."""
    from ..functions.sketches import grouped_hist_quantile

    ev = _read(sf_dir, "events", ["event_type", "value"])
    out = grouped_hist_quantile(
        ev, "event_type", "value", q=0.5, bin_width=bin_width, out="approx_median"
    )

    def rounded(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("approx_median"), "approx_median",
            _round2(t["approx_median"]),
        )

    out = out.map_batches(rounded, batch_format="pyarrow")
    if ev.count() <= 1_000_000:
        got = out.to_pandas().set_index("event_type")["approx_median"]
        exact = (
            median_value_per_type(sf_dir).to_pandas()
            .set_index("event_type")["median_value"]
        )
        for t_, v in exact.items():
            assert abs(got[t_] - v) <= bin_width + 1e-9, (t_, got[t_], v)
        return rd.from_pandas(
            got.reset_index().sort_values("event_type").reset_index(drop=True)
        )
    return out


def window_functions_user(sf_dir: str) -> "rd.Dataset":
    """Row-based window functions per key: lag (microseconds since the
    user's previous event; -1 for the first) and a 3-row moving average of
    ``value`` ordered by (ts, event_id) — the ROWS-frame window family,
    composed as one keyed exchange + vectorized pandas shift/rolling per
    hash bucket (every user's rows co-located, all users per bucket in one
    C call). Oracle: SQL lag()/avg() OVER (ROWS 2 PRECEDING)."""
    from ..stages.keyed import keyed_map_blocks

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df["_us"] = df["ts"].astype("int64")  # epoch microseconds
        g = df.groupby("user_id", sort=False)
        delta = (df["_us"] - g["_us"].shift(1)).fillna(-1).astype("int64")
        mavg = (
            g["value"].rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
        )
        out = df[["event_id", "user_id"]].copy()
        out["delta_us"] = delta.to_numpy()
        v = mavg.to_numpy()
        out["mavg_value"] = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5) / 100
        return out

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return keyed_map_blocks(ev, ["user_id"], win)
