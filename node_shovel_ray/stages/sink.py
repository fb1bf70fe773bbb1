"""Single-pass multi-sink writer: route, write every sink, and pre-aggregate
counts in ONE scan of the data.

Shovel's router delivers each message to its sinks as it flows
(src/outputs/pipeline.js:18-30) — it never re-reads the stream per sink. The
Dataset-branch equivalent (materialize once, then N filtered write passes)
scans the routed data N+1 times; this stage instead processes each block
once: split by ``sink_tag``, write each part to its sink directory
(parquet; ``audit`` broadcast rows to JSONL), and emit one partial-counts
row per (sink, role, tool, hour) — the block is read once and never
materialized. Output filenames are deterministic (content-keyed), so
re-runs overwrite idempotently.

Scale notes: each task writes its own files (no write coordination); the
returned counts dataset is tiny (distinct keys × blocks) and feeds the final
``groupby().sum`` — the only exchange in the whole flagship when the input
is key-partitioned.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Sum

from .. import schema as S
from ..sources.jsonl import encode_jsonl
from .aggregate import hour_floor


def _block_tag(batch: pa.Table) -> str:
    first = f"{batch['conv_id'][0].as_py()}-{batch['turn_idx'][0].as_py()}"
    return hashlib.sha1(f"{first}-{len(batch)}".encode()).hexdigest()[:12]


def _write_part(t: pa.Table, sink_dir: str, tag: str) -> None:
    os.makedirs(sink_dir, exist_ok=True)
    tmp = os.path.join(sink_dir, f".part-{tag}.tmp")
    pq.write_table(t, tmp, compression="snappy")
    os.rename(tmp, os.path.join(sink_dir, f"part-{tag}.parquet"))


def _write_audit_jsonl(t: pa.Table, sink_dir: str, tag: str) -> None:
    os.makedirs(sink_dir, exist_ok=True)
    lines = encode_jsonl(t)
    tmp = os.path.join(sink_dir, f".part-{tag}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines.to_pylist()))
        fh.write("\n")
    os.rename(tmp, os.path.join(sink_dir, f"part-{tag}.jsonl"))


def _partial_counts_with_audit(keyed: pa.Table) -> pa.Table:
    audit_rows = keyed.filter(keyed["audit"])
    audit_rows = audit_rows.set_column(
        0, "sink_tag", pa.array(["audit"] * len(audit_rows), pa.string())
    )
    both = pa.concat_tables([keyed, audit_rows]).drop(["audit"])
    return (
        both.group_by(["sink_tag", "role", "tool", "hour"])
        .aggregate([([], "count_all")])
        .rename_columns(["sink_tag", "role", "tool", "hour", "partial_n"])
    )


def multi_sink_write(
    routed: "ray.data.Dataset", out_dir: str
) -> "ray.data.Dataset":
    """One pass: write errors/tools/chat parquet + audit JSONL + emit counts.

    Returns the final (sink_tag, role, tool, hour, n) counts Dataset.
    """

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "sink_tag": pa.array([], pa.string()),
                    "role": pa.array([], pa.string()),
                    "tool": pa.array([], pa.string()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "partial_n": pa.array([], pa.int64()),
                }
            )
        tag = _block_tag(batch)
        for sink in S.SINKS:
            part = batch.filter(pc.equal(batch["sink_tag"], sink))
            if len(part):
                _write_part(part, os.path.join(out_dir, f"sink={sink}"), tag)
        audit = batch.filter(pc.fill_null(batch["audit"], False))
        if len(audit):
            _write_audit_jsonl(
                audit.drop(["hour"]), os.path.join(out_dir, f"sink={S.AUDIT_SINK}"), tag
            )
        keyed = pa.table(
            {
                "sink_tag": batch["sink_tag"],
                "role": batch["role"],
                "tool": pc.fill_null(batch["parsed_tool"], ""),
                "hour": batch["hour"] if "hour" in batch.column_names
                else hour_floor(batch["ts"]),
                "audit": pc.fill_null(batch["audit"], False),
            }
        )
        return _partial_counts_with_audit(keyed)

    partial = routed.map_batches(
        write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return partial.groupby(["sink_tag", "role", "tool", "hour"]).aggregate(
        Sum("partial_n", alias_name="n")
    )
