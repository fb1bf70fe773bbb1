"""Format encoders: shovel's per-message encoder plugins as batch transforms.

Reference contract: encoders read ``message.content`` and write
``message.payload`` (src/core/message.js:76-79). Here "payload" is a string
column materialized just before (or inside) a sink write.

- json    (src/encoders/json.js:27-34)   → :func:`encode_json`
- csv     (src/encoders/csv.js:32-52)    → :func:`encode_csv`
- base64  (src/encoders/base64.js:10-14) → :func:`encode_base64`
- format  (src/encoders/format.js:10-14, date tokens src/core/utils.js:45-67)
          → :func:`encode_format` — fully vectorized template projection
- noop    (src/encoders/noop.js:2-6)     → identity
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.template import render_template


def encode_json(
    batch: pa.Table, columns: list[str] | None = None, out: str = "payload",
    pretty: bool = False,
) -> pa.Table:
    """Rows → JSON strings (one object per row, selected columns)."""
    cols = columns or batch.column_names
    sub = batch.select(cols).to_pylist()
    indent = 2 if pretty else None
    seps = None if pretty else (",", ":")
    vals = [json.dumps(r, default=str, indent=indent, separators=seps) for r in sub]
    return batch.append_column(out, pa.array(vals, pa.string()))


def encode_csv(
    batch: pa.Table, columns: list[str] | None = None, out: str = "payload",
    delimiter: str = ",",
) -> pa.Table:
    """One record → one CSV line (src/encoders/csv.js:32-52)."""
    import csv as _csv
    import io

    cols = columns or batch.column_names
    buf = io.StringIO()
    w = _csv.writer(buf, delimiter=delimiter, lineterminator="\n")
    # Slice on the writer's record boundaries (buf.tell() after each row),
    # not on physical lines: a quoted field may contain embedded newlines,
    # so splitlines() would yield more lines than rows.
    offsets = [0]
    for row in zip(*(batch[c].to_pylist() for c in cols)):
        w.writerow(row)
        offsets.append(buf.tell())
    s = buf.getvalue()
    vals = [s[a : b - 1] for a, b in zip(offsets, offsets[1:])]  # strip the \n
    return batch.append_column(out, pa.array(vals, pa.string()))


def encode_msgpack(
    batch: pa.Table, columns: list[str] | None = None, out: str = "payload"
) -> pa.Table:
    """Rows → msgpack bytes, one map per row (src/encoders/msgpack.js:6-9);
    pure-Python public-spec packer (functions/msgpack_codec.py)."""
    from ..functions.msgpack_codec import packb

    cols = columns or batch.column_names
    vals = [packb(r) for r in batch.select(cols).to_pylist()]
    return batch.append_column(out, pa.array(vals, pa.binary()))


def encode_base64(batch: pa.Table, column: str, out: str = "payload") -> pa.Table:
    """string → base64 (src/encoders/base64.js:10-14), vectorized-ish."""
    vals = [
        None if s is None else base64.b64encode(s.encode("utf-8")).decode("ascii")
        for s in batch[column].to_pylist()
    ]
    return batch.append_column(out, pa.array(vals, pa.string()))


def write_time_partitioned(
    ds, base_dir: str, ts_col: str = "ts", granularity: str = "day",
    partition_template: str | None = None,
):
    """Time-partitioned parquet sink — the reference's per-message templated
    index/topic routing (``audit-{YYYY}-{MM}`` — src/outputs/elasticsearch.js:203-211,
    src/outputs/amqp.js:71-88) as Hive-style partition directories.

    A ``_part`` column is rendered per row from ``partition_template``
    (default ``{YYYY}-{MM}`` or ``{YYYY}-{MM}-{DD}``) and used as the
    partition column, so each time bucket lands in its own directory —
    resumable, prunable layout.
    """
    tpl = partition_template or (
        "{YYYY}-{MM}" if granularity == "month" else "{YYYY}-{MM}-{DD}"
    )

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", render_template(batch, tpl, ts_col=ts_col)
        )

    tagged = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(base_dir, partition_cols=["_part"])
    return base_dir


def encode_format(
    batch: pa.Table, template: str, out: str = "payload", ts_col: str = "ts"
) -> pa.Table:
    """Template projection with field + date tokens — the `format` encoder
    (src/encoders/format.js:10-14). Vectorized: pc.strftime for date tokens,
    binary_join_element_wise for splicing. Example template:
    ``"{conv_id}/{YYYY}-{MM}-{DD}/{HH}"`` (UTC, src/core/utils.js:45-67)."""
    return batch.append_column(out, render_template(batch, template, ts_col=ts_col))
