"""Deterministic events → transcripts transform ("transcriptify").

The correctness driver oracle-checks queries against DuckDB views of the
TPC-H-ish testdata tables only, so the transcript table of BASELINE.json's
``input_hint`` is *derived* from the ``events`` table by a pure
integer/string transform that is expressible identically in vectorized Arrow
(here) and ANSI SQL (:data:`node_shovel_ray.pipelines.sql_oracle.TRANSCRIPTIFY_SQL`).
This plays the role of shovel's input+decoder stages: raw records in,
typed transcript rows out (reference: src/core/input.js:34-37,
src/decoders/json.js:10-14).

Mapping (all deterministic, no wall-clock, no RNG):

- ``conv_id``  = ``'conv-' || lpad(user_id, 8, '0')``
- ``turn_idx`` = rank of ``event_id`` within ``user_id`` (0-based)
- ``role``     = signup→system, purchase→assistant, error→tool, else user
- ``tool``     = purchase→search, error→bash, else ''
- ``text``     = optional ``[role=..] `` prefix (event_id%10<3) + body +
  optional well-formed ``<tool:..>..</tool>`` + optional ``ERR-nnnn``
- ``ts``       = event ts unchanged
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _imod(arr: pa.Array, n: int) -> pa.Array:
    """Integer a % n for non-negative ints (pyarrow has no modulo kernel)."""
    return pc.subtract(arr, pc.multiply(pc.divide(arr, n), n))


def _concat(*parts) -> pa.Array:
    """Element-wise string concat; scalars broadcast."""
    return pc.binary_join_element_wise(*parts, "")


def transcriptify_batch(batch: pa.Table) -> pa.Table:
    """events batch → transcript columns (without turn_idx; see below)."""
    uid = batch["user_id"]
    et = batch["event_type"]
    eid = batch["event_id"]
    props = batch["props"]

    # Contract guard: Arrow utf8_lpad leaves over-length inputs unchanged
    # while DuckDB lpad TRUNCATES to 8 chars, so user_id >= 10^8 would make
    # the engine and the TRANSCRIPTIFY oracle CTE diverge (and the oracle
    # side could collide conv_ids). Fail loudly instead of silently drifting.
    if len(batch):
        umax = pc.max(uid).as_py()
        if umax is not None and umax >= 10**8:
            raise ValueError(
                f"transcriptify requires user_id < 10^8 (lpad width); got {umax}"
            )
    conv_id = _concat("conv-", pc.utf8_lpad(pc.cast(uid, pa.string()), 8, "0"))

    is_signup = pc.equal(et, "signup")
    is_purchase = pc.equal(et, "purchase")
    is_error = pc.equal(et, "error")
    role = pc.if_else(
        is_signup,
        "system",
        pc.if_else(is_purchase, "assistant", pc.if_else(is_error, "tool", "user")),
    )
    tool = pc.if_else(is_purchase, "search", pc.if_else(is_error, "bash", ""))

    empty = pa.scalar("")
    prefix = pc.if_else(
        pc.less(_imod(eid, 10), 3), _concat("[role=", role, "] "), empty
    )
    body = _concat("event ", et, " ", props)
    toolpart = pc.if_else(
        pc.not_equal(tool, ""),
        _concat(" <tool:", tool, ' args="', props, '">call</tool>'),
        empty,
    )
    errpart = pc.if_else(
        is_error,
        _concat(" ERR-", pc.utf8_lpad(pc.cast(_imod(eid, 10000), pa.string()), 4, "0")),
        empty,
    )
    text = _concat(prefix, body, toolpart, errpart)

    return pa.table(
        {
            "conv_id": pc.cast(conv_id, pa.string()),
            "event_id": eid,
            "role": pc.cast(role, pa.string()),
            "text": pc.cast(text, pa.string()),
            "tool": pc.cast(tool, pa.string()),
            "ts": batch["ts"],
        }
    )


def _number_block(df: pd.DataFrame) -> pd.DataFrame:
    """Turn numbering for every conversation in a hash block at once."""
    df = df.sort_values(["conv_id", "event_id"], kind="mergesort")
    df["turn_idx"] = df.groupby("conv_id", sort=False).cumcount().astype("int32")
    return df


def transcriptify(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """events Dataset → transcript Dataset (schema.TRANSCRIPTS).

    Per-row columns are a stateless vectorized map; ``turn_idx`` needs keyed
    co-location → one hash-partition exchange on ``conv_id`` (the same key
    every later keyed stage reuses, per SURVEY.md §7.4), then one vectorized
    rank per block.
    """
    from .keyed import keyed_map_blocks

    ds = events.map_batches(
        transcriptify_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = keyed_map_blocks(ds, ["conv_id"], _number_block)
    return ds.select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
