"""Per-sink aggregate counts with partial (combiner) pre-aggregation.

The reference only counts operationally — per-node Prometheus counters and
pipeline totals summed across workers (src/core/processor.js:26-36,
src/core/aggregated_metrics.js:100-132). The rebuild promotes those counters
to data-level aggregates: counts keyed ``(sink_tag, role, tool, hour)``.

Scale design: a bare ``groupby().count()`` shuffles every row. Instead each
batch is collapsed to one row per key *inside* ``map_batches`` (pyarrow
hash-group-by — the combiner), so the all-to-all exchange moves only
``O(distinct keys × blocks)`` rows; the final ``groupby().sum`` is tiny.
Key cardinality here is roles × tools × hours — thousands, not billions —
so this stays cheap at 100 TB.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def hour_floor(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    # keep timestamp[us] so the schema matches DuckDB's date_trunc('hour')
    return pc.cast(pc.floor_temporal(ts, unit="hour"), pa.timestamp("us"))


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Combiner: batch → one row per (sink_tag, role, tool, hour).

    Audit broadcast rows are counted twice — once under their primary sink
    and once under ``audit`` — mirroring shovel broadcast delivery
    (src/outputs/pipeline.js:18-30).
    """
    tool = pc.fill_null(batch["parsed_tool"], "")
    keyed = pa.table(
        {
            "sink_tag": batch["sink_tag"],
            "role": batch["role"],
            "tool": tool,
            "hour": hour_floor(batch["ts"]),
            "audit": pc.fill_null(batch["audit"], False),
        }
    )
    audit_rows = keyed.filter(keyed["audit"])
    audit_rows = audit_rows.set_column(
        0, "sink_tag", pa.array(["audit"] * len(audit_rows), pa.string())
    )
    both = pa.concat_tables([keyed, audit_rows]).drop(["audit"])
    return both.group_by(["sink_tag", "role", "tool", "hour"]).aggregate(
        [([], "count_all")]
    ).rename_columns(["sink_tag", "role", "tool", "hour", "partial_n"])


def combinable_groupby(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
) -> "ray.data.Dataset":
    """Partial-then-final grouped aggregate for COMBINABLE functions.

    ``aggs``: out_name → (column, fn) with fn ∈ {count, sum, min, max}
    (count ignores the column). Ray's ``groupby().aggregate()`` sort-shuffles
    its input rows with no map-side combine (Ray 2.49); this computes one
    partial row per (key-tuple, block) inside ``map_batches`` first, so the
    exchange carries O(groups × blocks) rows, never the data."""
    import pandas as pd

    from ray.data.aggregate import Max, Min
    from ray.data.aggregate import Sum as _Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        spec = {
            name: ((col or keys[0]), "size" if fn == "count" else fn)
            for name, (col, fn) in aggs.items()
        }
        out = g.agg(**spec).reset_index()
        for name, (_, fn) in aggs.items():
            if fn == "count":
                out[name] = out[name].astype("int64")
        return out

    finals = [
        {"count": _Sum, "sum": _Sum, "min": Min, "max": Max}[fn](
            name, alias_name=name
        )
        for name, (_, fn) in aggs.items()
    ]
    return ds.map_batches(partial, batch_format="pandas").groupby(keys).aggregate(
        *finals
    )


def sink_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Routed dataset → (sink_tag, role, tool, hour, n) counts."""
    partial = ds.map_batches(
        _partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partial.groupby(["sink_tag", "role", "tool", "hour"]).aggregate(
        Sum("partial_n", alias_name="n")
    )
    return out
