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
    key keeps ``left_on``'s name). Unmatched rows carry nulls; every block
    emits one fixed Arrow schema with the inputs' declared column types
    (int/bool stay int/bool with nulls — no data-dependent float widening).
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
    # Every bucket must emit the SAME schema (per-bucket narrowing made the
    # dtype depend on whether that bucket happened to contain unmatched
    # rows — mixed-schema blocks/files downstream). Decide once, from the
    # declared input schemas: emit Arrow with the original column types;
    # Arrow ints/bools are nullable-native, so unmatched-row nulls need no
    # pandas float64 widening and matched buckets can't "narrow back".
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols] + [(c, rtypes[c]) for c in rcols]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        lpart = df[df["_side"] == 0][lkeep]
        rpart = df[df["_side"] == 1][rkeep]
        m = lpart.merge(rpart, on=left_on, how=how)
        # from_pandas maps NaN -> null, then casts float64-widened int/bool
        # columns back to their declared Arrow type uniformly
        return pa.Table.from_pandas(m, schema=out_schema, preserve_index=False)

    from .keyed import keyed_map_blocks

    return keyed_map_blocks(both, [left_on], per_bucket, num_blocks=num_blocks)
