"""Vectorized grok/regex parse stage (the decoder analogue).

The reference's extraction idiom is the syslog parser: one JS regex parse per
message, parsed fields into headers (reference: src/inputs/syslog.js:44-56).
Here the whole extraction runs as RE2 kernels (`pyarrow.compute.extract_regex`)
over zero-copy Arrow string columns — no Python-per-row work — and malformed
rows are *flagged* (``parse_ok=false``, parsed columns null) instead of
throwing, mirroring the reference's error→reject contract
(src/core/node.js:461-466): one bad row never fails a 100k-row block.

Stateless: plain function for ``map_batches`` tasks (retryable for free).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2 patterns (pyarrow.compute uses RE2: no backrefs, linear time — safe on
# hostile input by construction).
RE_TOOL = r"<tool:(?P<parsed_tool>[a-z_]+)\b"
RE_TOOL_WELLFORMED = r"<tool:[a-z_]+.*</tool>"  # args may embed quotes/JSON
RE_ERR = r"(?P<error_code>ERR-[0-9]{4})"
RE_ROLETAG = r"^\[role=(?P<role_tag>[a-z]+)\]"


def _extract(text: pa.ChunkedArray | pa.Array, pattern: str, field: str) -> pa.Array:
    """extract_regex → one capture-group column; null where no match.

    ``pc.struct_field`` (not ``StructArray.field``) so the no-match nulls of
    the struct propagate into the child column.
    """
    return pc.struct_field(pc.extract_regex(text, pattern), field)


def parse_batch(batch: pa.Table) -> pa.Table:
    """transcripts batch → parsed batch (schema.PARSED).

    parse_ok is false when the text contains an embedded newline or an
    opening ``<tool:`` without a well-formed invocation; parsed columns are
    nulled for such rows.
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    tool = _extract(text, RE_TOOL, "parsed_tool")
    err = _extract(text, RE_ERR, "error_code")
    rtag = _extract(text, RE_ROLETAG, "role_tag")

    has_nl = pc.match_substring(text, "\n")
    has_open = pc.match_substring(text, "<tool:")
    wellformed = pc.match_substring_regex(text, RE_TOOL_WELLFORMED)
    bad_tool = pc.and_(has_open, pc.invert(wellformed))
    # null text → parse_ok=false (reject), mirroring the throw→reject contract
    ok = pc.fill_null(pc.invert(pc.or_(has_nl, bad_tool)), False)

    nulls = pa.nulls(len(text), pa.string())
    tool = pc.if_else(ok, tool, nulls)
    err = pc.if_else(ok, err, nulls)
    rtag = pc.if_else(ok, rtag, nulls)

    return (
        batch.append_column("parsed_tool", tool)
        .append_column("error_code", err)
        .append_column("role_tag", rtag)
        .append_column("parse_ok", ok)
    )


def parse(ds: "ray.data.Dataset", batch_size: int = 32768) -> "ray.data.Dataset":
    """Apply the parse stage: stateless zero-copy-Arrow map_batches."""
    return ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


# RFC3164-ish syslog line, the reference syslog input's parse
# (src/inputs/syslog.js:44-56 via nsyslog-parser) as one RE2 pass:
#   <PRI>Mmm dd hh:mm:ss host prog[pid]: message
RE_SYSLOG = (
    r"^<(?P<pri>[0-9]{1,3})>"
    r"(?P<sl_ts>[A-Z][a-z]{2} [ 0-9][0-9] [0-9]{2}:[0-9]{2}:[0-9]{2}) "
    r"(?P<sl_host>[^ ]+) "
    r"(?P<sl_prog>[^ \[:]+)(?:\[(?P<sl_pid>[0-9]+)\])?: "
    r"(?P<sl_msg>.*)$"
)


def parse_syslog_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Syslog decode: parsed fields → columns (severity/facility derived from
    PRI exactly as the reference exposes them as headers); unparseable rows
    get nulls + parse_ok=false, never an exception."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    st = pc.extract_regex(text, RE_SYSLOG)
    ok = pc.is_valid(st)
    pri = pc.cast(pc.struct_field(st, "pri"), pa.int32())
    out = (
        batch.append_column("pri", pri)
        .append_column("severity", pc.bit_wise_and(pri, 7))
        .append_column("facility", pc.shift_right(pri, 3))
        .append_column("sl_ts", pc.struct_field(st, "sl_ts"))
        .append_column("sl_host", pc.struct_field(st, "sl_host"))
        .append_column("sl_prog", pc.struct_field(st, "sl_prog"))
        # RE2 reports an unmatched optional group as "" — normalize to null
        .append_column(
            "sl_pid",
            pc.if_else(
                pc.equal(pc.fill_null(pc.struct_field(st, "sl_pid"), ""), ""),
                pa.nulls(len(text), pa.string()),
                pc.struct_field(st, "sl_pid"),
            ),
        )
        .append_column("sl_msg", pc.struct_field(st, "sl_msg"))
        .append_column("parse_ok", ok)
    )
    return out
