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
    aggs = [Count(alias_name="n")]
    if value_col:
        aggs += [
            Sum(value_col, alias_name="sum_value"),
            Min(value_col, alias_name="min_value"),
            Max(value_col, alias_name="max_value"),
        ]
    win = ds.map_batches(
        lambda t: add_tumbling_window(t, ts_col, size_s),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return win.groupby([*keys, "window"]).aggregate(*aggs)


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
    size_us, step_us = size_s * 1_000_000, step_s * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64()).to_numpy()
        # last window whose [start, start+size) contains ts
        last_start = (us // step_us) * step_us
        outs = []
        for i in range(k):
            start = last_start - i * step_us
            sub = t.append_column(
                out_prefix, pa.array(start.astype("datetime64[us]"))
            )
            outs.append(sub)
        return pa.concat_tables(outs)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby([*keys, out_prefix]).aggregate(Count(alias_name="n"))
