"""Vectorized JSONL encoding + sink.

``Dataset.write_json`` serializes via pandas row paths (~5 MB/s/core on wide
text rows); this sink JSON-escapes only the string columns (the sole part
that needs Python) and assembles lines with Arrow concat kernels
(~75 MB/s/core measured). File-per-block layout with deterministic names so
re-runs overwrite idempotently (the file sink analogue of the reference's
append stream, src/outputs/file.js:43-55, made batch + idempotent).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def encode_jsonl(batch: pa.Table, columns: list[str] | None = None) -> pa.Array:
    """Each row → one JSON object line (string array)."""
    cols = columns or batch.column_names
    parts: list = []
    n = len(batch)
    for i, name in enumerate(cols):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        key = ('{' if i == 0 else ',') + json.dumps(name) + ":"
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            vals = pa.array(
                [json.dumps(x) if x is not None else "null" for x in col.to_pylist()],
                pa.string(),
            )
        elif pa.types.is_boolean(t):
            vals = pc.if_else(col, "true", "false")
            vals = pc.fill_null(vals, "null")
        elif pa.types.is_timestamp(t):
            iso = pc.strftime(pc.cast(col, pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S")
            vals = pc.binary_join_element_wise('"', iso, '"', "")
            vals = pc.fill_null(vals, "null")
        else:
            vals = pc.fill_null(pc.cast(col, pa.string()), "null")
        parts.append(key)
        parts.append(vals)
    parts.append("}")
    return pc.binary_join_element_wise(*parts, "")


def write_jsonl(
    ds: "ray.data.Dataset", path: str, columns: list[str] | None = None
) -> int:
    """Write the dataset as JSONL files, one per block; returns row count.

    Deterministic filenames (hash of first-row key + row count) make re-runs
    idempotent when the input is deterministic.
    """
    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        lines = encode_jsonl(batch, columns)
        first = str(batch.column(0)[0].as_py())
        tag = hashlib.sha1(f"{first}-{len(batch)}".encode()).hexdigest()[:12]
        tmp = os.path.join(path, f".part-{tag}.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines.to_pylist()))
            fh.write("\n")
        os.rename(tmp, os.path.join(path, f"part-{tag}.jsonl"))
        return pa.table({"rows": pa.array([len(batch)], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(counts["rows"].sum())
