"""Outcome + sink routing: shovel's four-way message outcome and multi-output
fan-out re-expressed as row-level tag columns and filtered dataset branches.

Reference semantics being reproduced:

- pipeline UDF outcomes out/ignore/reject (README.md:212-243,
  src/core/node.js:214-271) → an ``outcome`` per row; ignored rows are
  dropped-but-counted, rejected rows go to a dead-letter branch, and the
  per-partition counters must reconcile ``in == routed + ignored + rejected``
  (mirrors pipeline totals, src/core/master.js:183-185).
- multi-output fan-out / broadcast (src/outputs/pipeline.js:18-30,
  round-robin/broadcast delivery src/core/master.js:207-224) → a primary
  ``sink_tag`` column (mutually exclusive sinks) plus boolean broadcast
  flags (a row may appear in a broadcast sink AND its primary sink).

Routing is one vectorized pass; branching N sinks off one parsed dataset
re-computes upstream per branch unless the upstream is materialized once —
the flagship pipeline does exactly that (SURVEY.md §7.5 "fan-out without
recompute").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def assign_sink_tag(batch: pa.Table) -> pa.Table:
    """FIXTURES.md §4 tag rules (order-independent per row):

    errors ⇐ error_code non-null; tools ⇐ no error and parsed_tool present;
    chat otherwise. ``audit`` broadcast flag ⇐ priority >= 2.
    """
    has_err = pc.is_valid(batch["error_code"])
    has_tool = pc.and_(
        pc.is_valid(batch["parsed_tool"]), pc.not_equal(batch["parsed_tool"].combine_chunks().fill_null(""), "")
    )
    tag = pc.if_else(has_err, "errors", pc.if_else(has_tool, "tools", "chat"))
    audit = pc.fill_null(pc.greater_equal(batch["priority"], 2), False)
    return batch.append_column("sink_tag", pc.cast(tag, pa.string())).append_column(
        "audit", audit
    )


def route(ds: "ray.data.Dataset", batch_size: int = 32768) -> "ray.data.Dataset":
    return ds.map_batches(
        assign_sink_tag, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def branch(ds: "ray.data.Dataset", tag: str) -> "ray.data.Dataset":
    """Filtered view for one primary sink (vectorized predicate)."""
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["sink_tag"], tag)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def broadcast_branch(ds: "ray.data.Dataset", flag_col: str = "audit") -> "ray.data.Dataset":
    """Filtered view for a broadcast sink (rows also kept in primary)."""
    return ds.map_batches(
        lambda t: t.filter(pc.fill_null(t[flag_col], False)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
