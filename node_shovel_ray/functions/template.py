"""Vectorized template rendering — the reference's Pupa-template +
date-token idiom (src/core/utils.js:45-67), used by the `format` encoder
(src/encoders/format.js:10-14) and the per-message templated routing of the
elasticsearch/amqp/mqtt sinks (src/outputs/elasticsearch.js:203-211).

Tokens: ``{column}`` for any column, plus UTC date tokens of the reference
(T, YYYY, YY, MM, M, DD, D, HH, H, mm, m, ss, s, DATE_ISO) derived from a
timestamp column. Everything runs as Arrow kernels: ``pc.strftime`` per date
token, one ``binary_join_element_wise`` splice — no Python per row.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# token → strftime fmt (UTC); reference list at src/core/utils.js:45-67
_DATE_TOKENS = {
    "T": "%s",            # epoch seconds (special-cased below)
    "YYYY": "%Y",
    "YY": "%y",
    "MM": "%m",
    "DD": "%d",
    "HH": "%H",
    "mm": "%M",
    "ss": "%S",
    "DATE_ISO": "%Y-%m-%dT%H:%M:%S",
}
_TOKEN_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _strip_leading_zero(arr: pa.Array) -> pa.Array:
    one = pc.utf8_ltrim(arr, "0")
    return pc.if_else(pc.equal(one, ""), "0", one)


def render_template(batch: pa.Table, template: str, ts_col: str = "ts") -> pa.Array:
    """Render ``template`` against every row of ``batch`` → string array."""
    parts: list = []
    pos = 0
    n = len(batch)
    ts = batch[ts_col] if ts_col in batch.column_names else None
    if ts is not None:
        t = ts.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            ts = pc.cast(ts, pa.timestamp("us"))  # ISO strings → timestamps
        # second precision: Arrow's strftime %S appends subseconds otherwise
        ts = pc.cast(pc.floor_temporal(ts, unit="second"), pa.timestamp("s"))
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append(template[pos : m.start()])
        tok = m.group(1)
        if tok in _DATE_TOKENS or tok in ("M", "D", "H", "m", "s"):
            if ts is None:
                raise ValueError(f"date token {{{tok}}} needs a {ts_col} column")
            if tok == "T":
                # ts is second-precision here → int64 cast IS epoch seconds
                parts.append(pc.cast(pc.cast(ts, pa.int64()), pa.string()))
            elif tok in ("M", "D", "H", "m", "s"):
                fmt = {"M": "%m", "D": "%d", "H": "%H", "m": "%M", "s": "%S"}[tok]
                parts.append(_strip_leading_zero(pc.strftime(ts, format=fmt)))
            else:
                parts.append(pc.strftime(ts, format=_DATE_TOKENS[tok]))
        elif tok in batch.column_names:
            col = batch[tok]
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(pc.fill_null(col, ""))
        else:
            raise KeyError(f"template token {{{tok}}} is neither a date token nor a column")
        pos = m.end()
    if pos < len(template):
        parts.append(template[pos:])
    if not parts:
        parts = [template]
    if len(parts) == 1 and isinstance(parts[0], str):
        return pa.array([parts[0]] * n, pa.string())
    return pc.binary_join_element_wise(*parts, "")


def translate(
    arr: pa.ChunkedArray | pa.Array, mapping: dict, default=None
) -> pa.Array:
    """Dictionary lookup with default — reference translate()
    (src/core/utils.js:74-76), vectorized via index_in + take."""
    keys = pa.array(list(mapping.keys()))
    vals = pa.array(list(mapping.values()))
    idx = pc.index_in(arr, value_set=keys)
    out = vals.take(idx)
    if default is not None:
        out = pc.fill_null(out, default)
    return out


# ------------------------------------------------------------- small utils
# (reference src/core/utils.js:69-72 parseContentType, 97-101 Duration.parse)

_DUR_UNITS_MS = {
    "ns": 1e-6, "us": 1e-3, "µs": 1e-3, "ms": 1.0,
    "s": 1000.0, "sec": 1000.0, "second": 1000.0, "seconds": 1000.0,
    "m": 60_000.0, "min": 60_000.0, "minute": 60_000.0, "minutes": 60_000.0,
    "h": 3_600_000.0, "hr": 3_600_000.0, "hour": 3_600_000.0, "hours": 3_600_000.0,
    "d": 86_400_000.0, "day": 86_400_000.0, "days": 86_400_000.0,
    "w": 604_800_000.0, "wk": 604_800_000.0, "week": 604_800_000.0, "weeks": 604_800_000.0,
    "y": 31_557_600_000.0, "yr": 31_557_600_000.0, "year": 31_557_600_000.0, "years": 31_557_600_000.0,
}

_DUR_RE = re.compile(
    r"(-?\d*\.?\d+)\s*([a-zµ]*)", re.IGNORECASE
)


def parse_duration(value) -> float:
    """``Duration.parse`` (reference src/core/utils.js:97-101, the public
    parse-duration grammar): '1h30m', '2 days', '1.5s', '100' (bare = ms),
    negative values — returns milliseconds (float).
    """
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    if not s:
        raise ValueError("empty duration")
    total = 0.0
    matched = 0
    for num, unit in _DUR_RE.findall(s):
        unit = unit.lower()
        if unit and unit not in _DUR_UNITS_MS:
            raise ValueError(f"unknown duration unit {unit!r} in {value!r}")
        total += float(num) * _DUR_UNITS_MS.get(unit, 1.0)
        matched += 1
    if not matched:
        raise ValueError(f"unparseable duration {value!r}")
    return total


def parse_duration_s(value) -> float:
    """Duration in SECONDS — the config-layer convenience (window sizes)."""
    return parse_duration(value) / 1000.0


def parse_content_type(value: str) -> dict:
    """``parseContentType`` (reference src/core/utils.js:69-72): MIME
    essence + parameter map, per the WHATWG grammar subset the reference
    exercises ('application/protobuf; proto=Test')."""
    parts = [p.strip() for p in str(value).split(";")]
    mime = parts[0].lower()
    if "/" not in mime:
        raise ValueError(f"invalid content type {value!r}")
    params: dict[str, str] = {}
    for p in parts[1:]:
        if not p or "=" not in p:
            continue
        k, _, v = p.partition("=")
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        params.setdefault(k.strip().lower(), v)
    return {"mimeType": mime, "parameters": params}
