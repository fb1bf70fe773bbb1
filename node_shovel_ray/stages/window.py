"""Windowed aggregates over event time — the streaming-window family the
reference lacks entirely (no windows/watermarks, SURVEY.md §2.9) expressed
batch-first: tumbling windows are a pure bucketing column (zero shuffle
beyond the aggregate's own partial→final exchange); sliding windows flat-map
each row into the windows containing it; session windows live in
relational.sessionize (gap-based, keyed).

Semantics: event-time (a timestamp column), aligned windows (epoch-anchored),
end-exclusive [start, start+size). Late data is a non-issue batch-side —
every row is present before the job runs; the streaming analogue's
watermarking collapses into "the partition's files are complete".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", size_s: int = 3600, out: str = "window"
) -> pa.Table:
    """Epoch-aligned tumbling-window start column (timestamp[us]).

    Uses numpy floor division (not ``pc.divide``, which truncates toward
    zero) so pre-epoch timestamps land in the correct window, matching the
    flooring ``date_trunc`` oracle semantics.
    """
    size_us = size_s * 1_000_000
    us = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
    start = (us // size_us) * size_us
    return batch.append_column(
        out, pa.array(start.astype("datetime64[us]"))
    )


def tumbling_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    ts_col: str = "ts",
    size_s: int = 3600,
    value_col: str | None = None,
) -> "ray.data.Dataset":
    """count (and sum/mean of value_col) per (keys..., window).

    The window column is a vectorized map; the aggregate itself uses Ray's
    partial→final groupby, so the exchange carries one row per
    (key, window) per block — never the raw events.
    """
    size_us = size_s * 1_000_000

    # pre-combine per block: Dataset.groupby().aggregate() sort-shuffles its
    # INPUT rows (no map-side combine in Ray 2.49 — measured on the salted
    # seq path), so aggregate partials first and exchange one row per
    # (key, window) per block, never the events
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy("datetime64[us]").astype("int64")
        df = df.assign(window=((us // size_us) * size_us).astype("datetime64[us]"))
        g = df.groupby([*keys, "window"], sort=False)
        if value_col:
            out = g.agg(
                n=(ts_col, "size"),
                sum_value=(value_col, "sum"),
                min_value=(value_col, "min"),
                max_value=(value_col, "max"),
            ).reset_index()
        else:
            out = g.size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum("n", alias_name="n")]
    if value_col:
        aggs += [
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        ]
    return parts.groupby([*keys, "window"]).aggregate(*aggs)


def sliding_count(
    ds: "ray.data.Dataset",
    keys: list[str],
    ts_col: str = "ts",
    size_s: int = 3600,
    step_s: int = 900,
    out_prefix: str = "window",
) -> "ray.data.Dataset":
    """Sliding windows: each row flat-maps into the ``size/step`` windows
    containing it, then a tumbling-style count per (keys, window start).
    Cost is explicit: rows are duplicated size/step times before the
    (small) aggregate — choose step accordingly.
    """
    if size_s % step_s:
        raise ValueError("size_s must be a multiple of step_s")
    k = size_s // step_s
    step_us = step_s * 1_000_000

    # pre-combine then explode: count per (keys, base window) per block
    # FIRST, and fan the k window memberships out over the aggregated rows
    # — the exchange (and the ×k duplication) carries counts, never events
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy("datetime64[us]").astype("int64")
        # last window whose [start, start+size) contains ts
        df = df.assign(_base=(us // step_us) * step_us)
        g = df.groupby([*keys, "_base"], sort=False).size().reset_index(name="n")
        reps = pd.concat(
            [
                g.assign(
                    **{out_prefix: (g["_base"] - i * step_us).astype("datetime64[us]")}
                )
                for i in range(k)
            ]
        )
        reps["n"] = reps["n"].astype("int64")
        return reps.drop(columns=["_base"])

    parts = ds.map_batches(partial, batch_format="pandas")
    return parts.groupby([*keys, out_prefix]).aggregate(Sum("n", alias_name="n"))
