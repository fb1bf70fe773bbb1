"""Generic distributed hash join — the shuffle-join family member the
engine previously expressed only as specializations (broadcast
lookup_enrich, semi/anti filters, asof/range bucket joins).

Ray Data has no native join; this composes one from the engine's standard
primitives (union-then-bucket, the asof_join pattern,
pipelines/relational.py): both sides are normalized to one superset
schema with a side marker, hash-partitioned on the join key (ONE keyed
exchange), and merged per bucket with a vectorized ``pd.merge``.
Per-task memory is bounded by bucket size — neither side is ever
broadcast or materialized. Use ``stages/enrich.lookup_enrich`` instead
when the build side is small (no shuffle at all).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """``left ⋈ right`` on ``left_on == right_on``
    (``inner`` / ``left`` / ``right`` / ``outer``).

    Output columns: all of ``left`` plus ``right``'s non-key columns (the
    key keeps ``left_on``'s name). Unmatched rows carry nulls — pandas
    widens int64 columns to float64 there (CLAUDE.md); cast downstream if
    the oracle needs int64.
    """
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(
            f"how must be inner/left/right/outer, got {how!r}"
        )
    right_on = right_on or left_on

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != right_on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    key_t = ltypes[left_on]

    def norm_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in lcols}
        for c in rcols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        cols["_side"] = pa.array(np.zeros(len(t), np.int8))
        return pa.table(cols)

    def norm_right(t: pa.Table) -> pa.Table:
        cols = {left_on: t[right_on].cast(key_t)}
        for c in lcols:
            if c != left_on:
                cols[c] = pa.nulls(len(t), ltypes[c])
        for c in rcols:
            cols[c] = t[c]
        cols["_side"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(cols)

    both = left.map_batches(norm_left, batch_format="pyarrow").union(
        right.map_batches(norm_right, batch_format="pyarrow")
    )

    lkeep = lcols
    rkeep = [left_on] + rcols
    # the union pads each side's missing columns with nulls, which widens
    # pandas int/bool columns to float/object (CLAUDE.md); restore the
    # declared dtype wherever the merged column carries no nulls
    narrow = {
        name: np.dtype(t.to_pandas_dtype())
        for name, t in {**ltypes, **rtypes}.items()
        if pa.types.is_integer(t) or pa.types.is_boolean(t)
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lpart = df[df["_side"] == 0][lkeep]
        rpart = df[df["_side"] == 1][rkeep]
        m = lpart.merge(rpart, on=left_on, how=how)
        for c, dt in narrow.items():
            if c in m.columns and m[c].dtype != dt and not m[c].isna().any():
                m[c] = m[c].astype(dt)
        return m

    from .keyed import keyed_map_blocks

    return keyed_map_blocks(both, [left_on], per_bucket, num_blocks=num_blocks)
