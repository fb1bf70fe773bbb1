"""Pure-Python AMQP 0-9-1 frame codec — the wire subset the reference's
amqp transport exercises via amqplib (src/inputs/amqp.js:204-274:
createChannel → prefetch → assertQueue → bindQueue → consume →
ack/nack(requeue); src/outputs/amqp.js:77-85: assertExchange + publish
with templated routing key).

Implemented from the public OASIS AMQP 0-9-1 spec (§2.3 framing, §4.2
data encodings, class/method tables): no amqp package exists in this
container, same stance as the msgpack/protobuf/MQTT codecs.

Framing: ``octet type | short channel | long size | payload | 0xCE``.
Method payloads are encoded/decoded from the METHODS spec table below —
shortstr/longstr/short/long/longlong/octet/table plus packed ``bit``
runs. Content-header frames carry the basic-class property flags the
reference uses (content-type, delivery-mode, headers table).
"""

from __future__ import annotations

import struct

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_HEARTBEAT = 1, 2, 3, 8
FRAME_END = 0xCE

# (class_id, method_id) → (name, [(arg, type), ...]); consecutive 'bit'
# args pack into shared octets, per spec §4.2.5.2
METHODS: dict[tuple[int, int], tuple[str, list[tuple[str, str]]]] = {
    (10, 10): ("connection.start", [
        ("version_major", "octet"), ("version_minor", "octet"),
        ("server_properties", "table"), ("mechanisms", "longstr"),
        ("locales", "longstr")]),
    (10, 11): ("connection.start-ok", [
        ("client_properties", "table"), ("mechanism", "shortstr"),
        ("response", "longstr"), ("locale", "shortstr")]),
    (10, 30): ("connection.tune", [
        ("channel_max", "short"), ("frame_max", "long"),
        ("heartbeat", "short")]),
    (10, 31): ("connection.tune-ok", [
        ("channel_max", "short"), ("frame_max", "long"),
        ("heartbeat", "short")]),
    (10, 40): ("connection.open", [
        ("virtual_host", "shortstr"), ("reserved1", "shortstr"),
        ("reserved2", "bit")]),
    (10, 41): ("connection.open-ok", [("reserved1", "shortstr")]),
    (10, 50): ("connection.close", [
        ("reply_code", "short"), ("reply_text", "shortstr"),
        ("class_id", "short"), ("method_id", "short")]),
    (10, 51): ("connection.close-ok", []),
    (20, 10): ("channel.open", [("reserved1", "shortstr")]),
    (20, 11): ("channel.open-ok", [("reserved1", "longstr")]),
    (20, 40): ("channel.close", [
        ("reply_code", "short"), ("reply_text", "shortstr"),
        ("class_id", "short"), ("method_id", "short")]),
    (20, 41): ("channel.close-ok", []),
    (40, 10): ("exchange.declare", [
        ("reserved1", "short"), ("exchange", "shortstr"),
        ("type", "shortstr"), ("passive", "bit"), ("durable", "bit"),
        ("auto_delete", "bit"), ("internal", "bit"), ("no_wait", "bit"),
        ("arguments", "table")]),
    (40, 11): ("exchange.declare-ok", []),
    (50, 10): ("queue.declare", [
        ("reserved1", "short"), ("queue", "shortstr"), ("passive", "bit"),
        ("durable", "bit"), ("exclusive", "bit"), ("auto_delete", "bit"),
        ("no_wait", "bit"), ("arguments", "table")]),
    (50, 11): ("queue.declare-ok", [
        ("queue", "shortstr"), ("message_count", "long"),
        ("consumer_count", "long")]),
    (50, 20): ("queue.bind", [
        ("reserved1", "short"), ("queue", "shortstr"),
        ("exchange", "shortstr"), ("routing_key", "shortstr"),
        ("no_wait", "bit"), ("arguments", "table")]),
    (50, 21): ("queue.bind-ok", []),
    (60, 10): ("basic.qos", [
        ("prefetch_size", "long"), ("prefetch_count", "short"),
        ("global_", "bit")]),
    (60, 11): ("basic.qos-ok", []),
    (60, 20): ("basic.consume", [
        ("reserved1", "short"), ("queue", "shortstr"),
        ("consumer_tag", "shortstr"), ("no_local", "bit"),
        ("no_ack", "bit"), ("exclusive", "bit"), ("no_wait", "bit"),
        ("arguments", "table")]),
    (60, 21): ("basic.consume-ok", [("consumer_tag", "shortstr")]),
    (60, 30): ("basic.cancel", [
        ("consumer_tag", "shortstr"), ("no_wait", "bit")]),
    (60, 31): ("basic.cancel-ok", [("consumer_tag", "shortstr")]),
    (60, 40): ("basic.publish", [
        ("reserved1", "short"), ("exchange", "shortstr"),
        ("routing_key", "shortstr"), ("mandatory", "bit"),
        ("immediate", "bit")]),
    (60, 60): ("basic.deliver", [
        ("consumer_tag", "shortstr"), ("delivery_tag", "longlong"),
        ("redelivered", "bit"), ("exchange", "shortstr"),
        ("routing_key", "shortstr")]),
    (60, 80): ("basic.ack", [
        ("delivery_tag", "longlong"), ("multiple", "bit")]),
    (60, 120): ("basic.nack", [
        ("delivery_tag", "longlong"), ("multiple", "bit"),
        ("requeue", "bit")]),
}
NAME_TO_ID = {name: cm for cm, (name, _) in METHODS.items()}

# basic-class content-header property flags, high bit first (spec §2.3.5.2
# + basic class properties); only the ones the reference's publish options
# can carry — unknown low flags are rejected on decode
_BASIC_PROPS = [
    ("content_type", "shortstr", 1 << 15),
    ("content_encoding", "shortstr", 1 << 14),
    ("headers", "table", 1 << 13),
    ("delivery_mode", "octet", 1 << 12),
    ("priority", "octet", 1 << 11),
    ("correlation_id", "shortstr", 1 << 10),
    ("reply_to", "shortstr", 1 << 9),
    ("expiration", "shortstr", 1 << 8),
    ("message_id", "shortstr", 1 << 7),
    ("timestamp", "longlong", 1 << 6),
    ("type", "shortstr", 1 << 5),
    ("user_id", "shortstr", 1 << 4),
    ("app_id", "shortstr", 1 << 3),
]


# ---------------------------------------------------------- value codecs


def _enc_shortstr(s: str | bytes) -> bytes:
    data = s.encode() if isinstance(s, str) else s
    if len(data) > 255:
        raise ValueError("shortstr exceeds 255 bytes")
    return bytes([len(data)]) + data


def _enc_longstr(s: str | bytes) -> bytes:
    data = s.encode() if isinstance(s, str) else s
    return struct.pack(">I", len(data)) + data


def _enc_table(t: dict | None) -> bytes:
    body = bytearray()
    for k, v in (t or {}).items():
        body += _enc_shortstr(k)
        if isinstance(v, bool):
            body += b"t" + bytes([int(v)])
        elif isinstance(v, int):
            body += b"I" + struct.pack(">i", v)
        elif isinstance(v, (str, bytes)):
            body += b"S" + _enc_longstr(v)
        elif isinstance(v, dict):
            body += b"F" + _enc_table(v)
        else:
            raise TypeError(f"unsupported table value type {type(v)}")
    return struct.pack(">I", len(body)) + bytes(body)


def _dec_shortstr(buf: bytes, pos: int) -> tuple[str, int]:
    n = buf[pos]
    return buf[pos + 1:pos + 1 + n].decode(), pos + 1 + n


def _dec_longstr(buf: bytes, pos: int) -> tuple[bytes, int]:
    (n,) = struct.unpack_from(">I", buf, pos)
    return buf[pos + 4:pos + 4 + n], pos + 4 + n


def _dec_table(buf: bytes, pos: int) -> tuple[dict, int]:
    (n,) = struct.unpack_from(">I", buf, pos)
    end = pos + 4 + n
    pos += 4
    out: dict = {}
    while pos < end:
        key, pos = _dec_shortstr(buf, pos)
        tag = buf[pos:pos + 1]
        pos += 1
        if tag == b"t":
            out[key], pos = bool(buf[pos]), pos + 1
        elif tag == b"I":
            out[key] = struct.unpack_from(">i", buf, pos)[0]
            pos += 4
        elif tag == b"S":
            v, pos = _dec_longstr(buf, pos)
            out[key] = v.decode()
        elif tag == b"F":
            out[key], pos = _dec_table(buf, pos)
        else:
            raise ValueError(f"unsupported field-table tag {tag!r}")
    return out, end


_FIXED = {"octet": (">B", 1), "short": (">H", 2), "long": (">I", 4),
          "longlong": (">Q", 8)}


def _encode_args(spec: list[tuple[str, str]], args: dict) -> bytes:
    out = bytearray()
    bits: list[bool] = []

    def flush_bits():
        while bits:
            chunk, octet = bits[:8], 0
            del bits[:8]
            for i, b in enumerate(chunk):
                octet |= int(bool(b)) << i
            out.append(octet)

    for name, typ in spec:
        val = args.get(name, 0 if typ in _FIXED else
                       (False if typ == "bit" else
                        ({} if typ == "table" else "")))
        if typ == "bit":
            bits.append(bool(val))
            continue
        flush_bits()
        if typ in _FIXED:
            out += struct.pack(_FIXED[typ][0], int(val))
        elif typ == "shortstr":
            out += _enc_shortstr(val)
        elif typ == "longstr":
            out += _enc_longstr(val)
        elif typ == "table":
            out += _enc_table(val)
        else:
            raise ValueError(f"unknown arg type {typ}")
    flush_bits()
    return bytes(out)


def _decode_args(spec: list[tuple[str, str]], buf: bytes) -> dict:
    out: dict = {}
    pos = 0
    bit_idx = -1  # >=0 while inside a packed bit run
    for name, typ in spec:
        if typ == "bit":
            if bit_idx < 0:
                bit_octet = buf[pos]
                pos += 1
                bit_idx = 0
            out[name] = bool((bit_octet >> bit_idx) & 1)
            bit_idx += 1
            if bit_idx == 8:
                bit_idx = -1
            continue
        bit_idx = -1
        if typ in _FIXED:
            fmt, n = _FIXED[typ]
            out[name] = struct.unpack_from(fmt, buf, pos)[0]
            pos += n
        elif typ == "shortstr":
            out[name], pos = _dec_shortstr(buf, pos)
        elif typ == "longstr":
            out[name], pos = _dec_longstr(buf, pos)
        elif typ == "table":
            out[name], pos = _dec_table(buf, pos)
    return out


# -------------------------------------------------------------- frame API


def frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return (struct.pack(">BHI", ftype, channel, len(payload))
            + payload + bytes([FRAME_END]))


def method_frame(channel: int, name: str, **args) -> bytes:
    cid, mid = NAME_TO_ID[name]
    payload = (struct.pack(">HH", cid, mid)
               + _encode_args(METHODS[(cid, mid)][1], args))
    return frame(FRAME_METHOD, channel, payload)


def header_frame(channel: int, body_size: int,
                 properties: dict | None = None) -> bytes:
    props = properties or {}
    flags = 0
    vals = bytearray()
    for pname, ptype, bit in _BASIC_PROPS:
        if pname not in props:
            continue
        flags |= bit
        v = props[pname]
        if ptype == "shortstr":
            vals += _enc_shortstr(v)
        elif ptype == "octet":
            vals += bytes([int(v)])
        elif ptype == "longlong":
            vals += struct.pack(">Q", int(v))
        elif ptype == "table":
            vals += _enc_table(v)
    payload = struct.pack(">HHQH", 60, 0, body_size, flags) + bytes(vals)
    return frame(FRAME_HEADER, channel, payload)


def body_frames(channel: int, body: bytes, frame_max: int = 131072) -> bytes:
    """Body split across frames when it exceeds frame_max (spec §4.2.6)."""
    chunk = max(1, frame_max - 8)
    out = bytearray()
    for i in range(0, len(body), chunk):
        out += frame(FRAME_BODY, channel, body[i:i + chunk])
    if not body:
        return b""  # zero-length body sends no body frame
    return bytes(out)


def heartbeat_frame() -> bytes:
    return frame(FRAME_HEARTBEAT, 0, b"")


def decode_frame(buf: bytes, pos: int = 0) -> tuple[dict, int] | None:
    """Parse ONE frame at ``pos`` → (frame_dict, next_pos), or None if
    incomplete. Method frames come back with the method name and args;
    header frames with body_size + properties; body frames with bytes."""
    if len(buf) - pos < 8:
        return None
    ftype, channel, size = struct.unpack_from(">BHI", buf, pos)
    end = pos + 7 + size
    if len(buf) < end + 1:
        return None
    if buf[end] != FRAME_END:
        raise ValueError("missing frame-end octet")
    payload = buf[pos + 7:end]
    nxt = end + 1
    if ftype == FRAME_METHOD:
        cid, mid = struct.unpack_from(">HH", payload, 0)
        if (cid, mid) not in METHODS:
            raise ValueError(f"unknown method ({cid}, {mid})")
        name, spec = METHODS[(cid, mid)]
        return ({"type": "method", "channel": channel, "method": name,
                 "args": _decode_args(spec, payload[4:])}, nxt)
    if ftype == FRAME_HEADER:
        cid, _w, body_size, flags = struct.unpack_from(">HHQH", payload, 0)
        p = 14
        props: dict = {}
        for pname, ptype, bit in _BASIC_PROPS:
            if not flags & bit:
                continue
            if ptype == "shortstr":
                props[pname], p = _dec_shortstr(payload, p)
            elif ptype == "octet":
                props[pname] = payload[p]
                p += 1
            elif ptype == "longlong":
                props[pname] = struct.unpack_from(">Q", payload, p)[0]
                p += 8
            elif ptype == "table":
                props[pname], p = _dec_table(payload, p)
        return ({"type": "header", "channel": channel, "class_id": cid,
                 "body_size": body_size, "properties": props}, nxt)
    if ftype == FRAME_BODY:
        return ({"type": "body", "channel": channel, "payload": payload},
                nxt)
    if ftype == FRAME_HEARTBEAT:
        return ({"type": "heartbeat", "channel": channel}, nxt)
    raise ValueError(f"unknown frame type {ftype}")
