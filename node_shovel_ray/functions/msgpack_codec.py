"""Pure-Python msgpack pack/unpack (public wire spec, msgpack.org).

The reference's msgpack decoder/encoder are one-call wrappers around the
``msgpackr`` library (src/decoders/msgpack.js:6-9, src/encoders/msgpack.js:6-9).
No msgpack library ships in this container, so the wire format — a small
public spec — is implemented directly: enough to round-trip every JSON-ish
value the reference moves through its Message envelope (nil, bool, int,
float, str, bin, array, map) plus ext passthrough on decode.

Packing always chooses the smallest representation (fixint/fixstr/... like
msgpackr does), so golden byte tests against the reference's test vectors
hold (tests/decoders/msgpack.js packs ``{test: 'ok'}``).
"""

from __future__ import annotations

import struct
from typing import Any, NamedTuple


class ExtType(NamedTuple):
    """Opaque msgpack extension value (decoded passthrough)."""

    code: int
    data: bytes


def packb(obj: Any) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(o: Any, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        _pack_int(o, out)
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 256:
            out += bytes((0xD9, n))
        elif n < 65536:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 256:
            out += bytes((0xC4, n))
        elif n < 65536:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += o
    elif isinstance(o, ExtType):  # before list/tuple: ExtType IS a tuple
        _pack_ext(o, out)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n < 16:
            out.append(0x90 | n)
        elif n < 65536:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in o:
            _pack(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n < 16:
            out.append(0x80 | n)
        elif n < 65536:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack: cannot pack {type(o).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 128:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 256:
        out += bytes((0xCC, v))
    elif 0 <= v < 65536:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 <= v < 2**32:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 <= v < 2**64:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -128 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -32768 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -(2**31) <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -(2**63) <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise OverflowError(f"msgpack: int out of 64-bit range: {v}")


_EXT_LEN_FIX = {0xD4: 1, 0xD5: 2, 0xD6: 4, 0xD7: 8, 0xD8: 16}


def _pack_ext(o: ExtType, out: bytearray) -> None:
    n = len(o.data)
    fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
    if fix is not None:
        out.append(fix)
    elif n < 256:
        out += bytes((0xC7, n))
    elif n < 65536:
        out.append(0xC8)
        out += struct.pack(">H", n)
    else:
        out.append(0xC9)
        out += struct.pack(">I", n)
    out += struct.pack("b", o.code)
    out += o.data


def unpackb(buf: bytes) -> Any:
    v, pos = _unpack(memoryview(buf), 0)
    if pos != len(buf):
        raise ValueError(f"msgpack: {len(buf) - pos} trailing bytes")
    return v


def _take(buf: memoryview, pos: int, n: int) -> tuple[memoryview, int]:
    if pos + n > len(buf):
        raise ValueError("msgpack: truncated input")
    return buf[pos : pos + n], pos + n


def _unpack(buf: memoryview, pos: int) -> tuple[Any, int]:
    if pos >= len(buf):
        raise ValueError("msgpack: truncated input")
    b = buf[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 256, pos
    if 0x80 <= b < 0x90:  # fixmap
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b < 0xA0:  # fixarray
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b < 0xC0:  # fixstr
        raw, pos = _take(buf, pos, b & 0x1F)
        return str(raw, "utf-8"), pos
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _unpack_len(buf, pos, b - 0xC4)
        raw, pos = _take(buf, pos, n)
        return bytes(raw), pos
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n, pos = _unpack_len(buf, pos, b - 0xC7)
        code_raw, pos = _take(buf, pos, 1)
        raw, pos = _take(buf, pos, n)
        return ExtType(struct.unpack("b", code_raw)[0], bytes(raw)), pos
    if b == 0xCA:
        raw, pos = _take(buf, pos, 4)
        return struct.unpack(">f", raw)[0], pos
    if b == 0xCB:
        raw, pos = _take(buf, pos, 8)
        return struct.unpack(">d", raw)[0], pos
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        size = 1 << (b - 0xCC)
        raw, pos = _take(buf, pos, size)
        return int.from_bytes(raw, "big"), pos
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        size = 1 << (b - 0xD0)
        raw, pos = _take(buf, pos, size)
        return int.from_bytes(raw, "big", signed=True), pos
    if b in _EXT_LEN_FIX:  # fixext 1/2/4/8/16
        n = _EXT_LEN_FIX[b]
        code_raw, pos = _take(buf, pos, 1)
        raw, pos = _take(buf, pos, n)
        return ExtType(struct.unpack("b", code_raw)[0], bytes(raw)), pos
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _unpack_len(buf, pos, b - 0xD9)
        raw, pos = _take(buf, pos, n)
        return str(raw, "utf-8"), pos
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _unpack_len(buf, pos, b - 0xDC + 1)
        return _unpack_array(buf, pos, n)
    if b in (0xDE, 0xDF):  # map 16/32
        n, pos = _unpack_len(buf, pos, b - 0xDE + 1)
        return _unpack_map(buf, pos, n)
    raise ValueError(f"msgpack: reserved type byte 0x{b:02x}")


def _unpack_len(buf: memoryview, pos: int, size_class: int) -> tuple[int, int]:
    size = 1 << size_class
    raw, pos = _take(buf, pos, size)
    return int.from_bytes(raw, "big"), pos


def _unpack_array(buf: memoryview, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _unpack(buf, pos)
        out.append(v)
    return out, pos


def _unpack_map(buf: memoryview, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack(buf, pos)
        v, pos = _unpack(buf, pos)
        out[k] = v
    return out, pos
