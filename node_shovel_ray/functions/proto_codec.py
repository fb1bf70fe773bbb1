"""Pure-Python protobuf wire codec for scalar-field messages.

The reference decoder/encoder wrap protobufjs (src/decoders/protobuf.js:12-141,
src/encoders/protobuf.js:54-68) with a .proto schema loaded once at start.
No protobuf runtime ships in this container; the wire format (varint, zigzag,
fixed32/64, length-delimited — developers.google.com/protocol-buffers/docs/encoding)
and the small .proto grammar subset the reference tests exercise
(tests/assets/test.proto: ``message Test { required string test = 1; }``)
are public specs implemented directly.

Supported: proto2/proto3 scalar fields (string, bytes, bool, int32/64,
uint32/64, sint32/64, fixed32/64, sfixed32/64, float, double), enums,
nested/embedded message fields, repeated fields (packed and unpacked
decode; unpacked encode), unknown-tag skipping. ``toObject`` parity with
the reference's decodeOptions (longs → decimal strings, bytes → base64
strings, enums → value names).
"""

from __future__ import annotations

import base64
import re
import struct
from dataclasses import dataclass, field

_SCALARS = {
    "string", "bytes", "bool", "int32", "int64", "uint32", "uint64",
    "sint32", "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64",
    "float", "double",
}
_VARINT_TYPES = {"bool", "int32", "int64", "uint32", "uint64", "sint32", "sint64"}
_I64_TYPES = {"fixed64", "sfixed64", "double"}
_I32_TYPES = {"fixed32", "sfixed32", "float"}
_LONG_TYPES = {"int64", "uint64", "sint64", "fixed64", "sfixed64"}


@dataclass
class Field:
    name: str
    type: str          # scalar name, enum name, or message name
    tag: int
    repeated: bool = False


@dataclass
class Message:
    name: str
    fields: dict[int, Field] = field(default_factory=dict)  # by tag


@dataclass
class Schema:
    messages: dict[str, Message] = field(default_factory=dict)
    enums: dict[str, dict[int, str]] = field(default_factory=dict)  # num→name

    def lookup(self, class_name: str) -> Message:
        if class_name not in self.messages:
            raise KeyError(f'Unknown class name "{class_name}"')
        return self.messages[class_name]


_COMMENT_RE = re.compile(r"//[^\n]*|/\*.*?\*/", re.S)
_FIELD_RE = re.compile(
    r"(?:(required|optional|repeated)\s+)?([A-Za-z_][\w.]*)\s+"
    r"([A-Za-z_]\w*)\s*=\s*(\d+)\s*(?:\[[^\]]*\])?\s*;"
)
_ENUM_VAL_RE = re.compile(r"([A-Za-z_]\w*)\s*=\s*(-?\d+)\s*;")


def parse_proto(src: str) -> Schema:
    """Parse the .proto subset: message/enum blocks with scalar fields.

    Handles one nesting level the way protobufjs exposes it (nested types
    addressable as ``Outer.Inner`` and by bare name from sibling fields)."""
    src = _COMMENT_RE.sub(" ", src)
    schema = Schema()
    _parse_block(src, "", schema)
    return schema


def _parse_block(src: str, prefix: str, schema: Schema) -> None:
    pos = 0
    while True:
        m = re.search(r"\b(message|enum)\s+([A-Za-z_]\w*)\s*\{", src[pos:])
        if not m:
            break
        kind, name = m.group(1), m.group(2)
        start = pos + m.end()
        depth, i = 1, start
        while depth and i < len(src):
            if src[i] == "{":
                depth += 1
            elif src[i] == "}":
                depth -= 1
            i += 1
        body = src[start : i - 1]
        full = f"{prefix}.{name}" if prefix else name
        if kind == "enum":
            schema.enums[full] = {
                int(v): n for n, v in _ENUM_VAL_RE.findall(body)
            }
        else:
            msg = Message(full)
            # nested types first, so fields can reference them
            _parse_block(body, full, schema)
            for label, ftype, fname, tag in _FIELD_RE.findall(_strip_nested(body)):
                msg.fields[int(tag)] = Field(
                    fname, ftype, int(tag), repeated=(label == "repeated")
                )
            schema.messages[full] = msg
        pos = i


def _strip_nested(body: str) -> str:
    """Remove nested message/enum blocks so their fields aren't re-parsed."""
    out, depth, i = [], 0, 0
    while i < len(body):
        m = re.match(r"\b(?:message|enum)\s+[A-Za-z_]\w*\s*\{", body[i:])
        if m and depth == 0:
            j = i + m.end()
            d = 1
            while d and j < len(body):
                if body[j] == "{":
                    d += 1
                elif body[j] == "}":
                    d -= 1
                j += 1
            i = j
            continue
        out.append(body[i])
        i += 1
    return "".join(out)


def _resolve_type(schema: Schema, msg: Message, ftype: str) -> str:
    """Resolve a field type name to a fully-qualified message/enum key."""
    if ftype in _SCALARS:
        return ftype
    # try nested (Outer.ftype), then absolute
    for cand in (f"{msg.name}.{ftype}", ftype):
        if cand in schema.messages or cand in schema.enums:
            return cand
    raise KeyError(f'Unknown type "{ftype}" in message "{msg.name}"')


# ------------------------------------------------------------------ varints


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise EOFError("truncated varint")
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def write_varint(v: int, out: bytearray) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, per the wire spec
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _from_varint(ftype: str, raw: int):
    if ftype == "bool":
        return bool(raw)
    if ftype in ("sint32", "sint64"):
        return _zigzag_dec(raw)
    if ftype in ("int32", "int64"):
        return raw - (1 << 64) if raw >= (1 << 63) else raw
    return raw  # uint32/uint64


# ------------------------------------------------------------------- decode


def decode_message(schema: Schema, class_name: str, data: bytes) -> dict:
    """Wire bytes → dict, with the reference's toObject conventions
    (longs as decimal strings, bytes as base64 strings, enums as names)."""
    msg = schema.lookup(class_name)
    out: dict = {}
    pos = 0
    while pos < len(data):
        key, pos = read_varint(data, pos)
        tag, wt = key >> 3, key & 7
        f = msg.fields.get(tag)
        if f is None:
            pos = _skip(data, pos, wt)
            continue
        rt = _resolve_type(schema, msg, f.type)
        val, pos = _read_field(schema, rt, wt, data, pos, f)
        if f.repeated:
            if isinstance(val, list):
                out.setdefault(f.name, []).extend(val)
            else:
                out.setdefault(f.name, []).append(val)
        else:
            out[f.name] = val
    return out


def _read_field(schema, rt: str, wt: int, data: bytes, pos: int, f: Field):
    if rt in schema.enums:
        if wt == 2 and f.repeated:  # packed (proto3 default for enums)
            n, pos = read_varint(data, pos)
            end = pos + n
            vals = []
            while pos < end:
                raw, pos = read_varint(data, pos)
                vals.append(schema.enums[rt].get(raw, raw))
            return vals, pos
        raw, pos = read_varint(data, pos)
        return schema.enums[rt].get(raw, raw), pos
    if rt in schema.messages:
        n, pos = read_varint(data, pos)
        sub = data[pos : pos + n]
        if len(sub) != n:
            # a buffer truncated inside the submessage must reject the row,
            # not decode partially with silently missing fields
            raise EOFError("truncated length-delimited field")
        return decode_message(schema, rt, sub), pos + n
    if rt in _VARINT_TYPES:
        if wt == 2 and f.repeated:  # packed
            n, pos = read_varint(data, pos)
            end = pos + n
            vals = []
            while pos < end:
                raw, pos = read_varint(data, pos)
                vals.append(_render(rt, _from_varint(rt, raw)))
            return vals, pos
        raw, pos = read_varint(data, pos)
        return _render(rt, _from_varint(rt, raw)), pos
    if rt in _I64_TYPES:
        if wt == 2 and f.repeated:  # packed
            n, pos = read_varint(data, pos)
            vals = [
                _render(rt, _unpack_fixed(rt, data, p))
                for p in range(pos, pos + n, 8)
            ]
            return vals, pos + n
        return _render(rt, _unpack_fixed(rt, data, pos)), pos + 8
    if rt in _I32_TYPES:
        if wt == 2 and f.repeated:  # packed
            n, pos = read_varint(data, pos)
            vals = [
                _render(rt, _unpack_fixed(rt, data, p))
                for p in range(pos, pos + n, 4)
            ]
            return vals, pos + n
        return _render(rt, _unpack_fixed(rt, data, pos)), pos + 4
    # string / bytes
    n, pos = read_varint(data, pos)
    raw = data[pos : pos + n]
    if len(raw) != n:
        raise EOFError("truncated length-delimited field")
    if rt == "string":
        return raw.decode("utf-8"), pos + n
    return base64.b64encode(raw).decode("ascii"), pos + n


def _unpack_fixed(rt: str, data: bytes, pos: int):
    fmt = {"fixed64": "<Q", "sfixed64": "<q", "double": "<d",
           "fixed32": "<I", "sfixed32": "<i", "float": "<f"}[rt]
    return struct.unpack_from(fmt, data, pos)[0]


def _render(rt: str, v):
    """decodeOptions parity: 64-bit ints → decimal strings."""
    if rt in _LONG_TYPES:
        return str(v)
    return v


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == 0:
        _, pos = read_varint(data, pos)
        return pos
    if wt == 1:
        return pos + 8
    if wt == 2:
        n, pos = read_varint(data, pos)
        return pos + n
    if wt == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wt}")


# ------------------------------------------------------------------- encode


def encode_message(schema: Schema, class_name: str, obj: dict) -> bytes:
    msg = schema.lookup(class_name)
    out = bytearray()
    for tag in sorted(msg.fields):
        f = msg.fields[tag]
        if f.name not in obj or obj[f.name] is None:
            continue
        rt = _resolve_type(schema, msg, f.type)
        vals = obj[f.name] if f.repeated else [obj[f.name]]
        for v in vals:
            _write_field(schema, rt, f, v, out)
    return bytes(out)


def _write_field(schema: Schema, rt: str, f: Field, v, out: bytearray) -> None:
    if rt in schema.enums:
        if isinstance(v, str):
            rev = {n: num for num, n in schema.enums[rt].items()}
            v = rev[v]
        write_varint(f.tag << 3 | 0, out)
        write_varint(v, out)
    elif rt in schema.messages:
        sub = encode_message(schema, rt, v)
        write_varint(f.tag << 3 | 2, out)
        write_varint(len(sub), out)
        out += sub
    elif rt in _VARINT_TYPES:
        write_varint(f.tag << 3 | 0, out)
        iv = int(v)
        if rt in ("sint32", "sint64"):
            iv = _zigzag_enc(iv)
        write_varint(iv, out)
    elif rt in _I64_TYPES:
        write_varint(f.tag << 3 | 1, out)
        fmt = {"fixed64": "<Q", "sfixed64": "<q", "double": "<d"}[rt]
        out += struct.pack(fmt, float(v) if rt == "double" else int(v))
    elif rt in _I32_TYPES:
        write_varint(f.tag << 3 | 5, out)
        fmt = {"fixed32": "<I", "sfixed32": "<i", "float": "<f"}[rt]
        out += struct.pack(fmt, float(v) if rt == "float" else int(v))
    elif rt == "string":
        b = str(v).encode("utf-8")
        write_varint(f.tag << 3 | 2, out)
        write_varint(len(b), out)
        out += b
    else:  # bytes (accepts base64 str, the toObject rendering, or raw bytes)
        b = base64.b64decode(v) if isinstance(v, str) else bytes(v)
        write_varint(f.tag << 3 | 2, out)
        write_varint(len(b), out)
        out += b
