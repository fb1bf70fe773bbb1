"""Pure-Python MQTT 3.1.1 wire codec (the packet subset the reference's
mqtt input/output exercise via the npm ``mqtt`` client:
src/inputs/mqtt.js:65-113 — connect/subscribe/message with topic +
{retain, qos, dup} packet props; src/outputs/mqtt.js:111-129 — publish
with per-message templated topic).

Same build-vs-import stance as the msgpack/protobuf codecs here: the
container has no mqtt package, and the wire format is a short public
spec (OASIS MQTT 3.1.1 §2-§3), so the codec is implemented from the
spec. Encoders return ``bytes``; :func:`decode_packet` incrementally
parses a stream buffer (returns ``None`` while a packet is incomplete —
the TCP reassembly loop the npm client does internally).

Packet coverage: CONNECT/CONNACK, PUBLISH (qos 0/1) /PUBACK,
SUBSCRIBE/SUBACK, UNSUBSCRIBE/UNSUBACK, PINGREQ/PINGRESP, DISCONNECT —
what a qos≤1 subscribe/publish client (the reference's usage: plain
``connection.publish`` / ``connection.subscribe``) puts on the wire.

:func:`topic_matches` implements spec §4.7 filter matching: ``#``
matches any remaining levels (including none), ``+`` exactly one, and
wildcard-leading filters do not match ``$``-system topics.
"""

from __future__ import annotations

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14

TYPE_NAMES = {
    CONNECT: "connect", CONNACK: "connack", PUBLISH: "publish",
    PUBACK: "puback", SUBSCRIBE: "subscribe", SUBACK: "suback",
    UNSUBSCRIBE: "unsubscribe", UNSUBACK: "unsuback",
    PINGREQ: "pingreq", PINGRESP: "pingresp", DISCONNECT: "disconnect",
}

# CONNACK return codes (spec table 3.1)
RC_ACCEPTED = 0
RC_BAD_CREDENTIALS = 4
RC_NOT_AUTHORIZED = 5


# ------------------------------------------------------------- primitives


def encode_varint(n: int) -> bytes:
    """Remaining-length varint (spec §2.2.3, 1..4 bytes, max 268435455)."""
    if not 0 <= n <= 0x0FFFFFFF:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int] | None:
    """(value, next_pos), or None if the buffer ends mid-varint."""
    mult, val = 1, 0
    for i in range(4):
        if pos + i >= len(buf):
            return None
        b = buf[pos + i]
        val += (b & 0x7F) * mult
        if not b & 0x80:
            return val, pos + i + 1
        mult *= 128
    raise ValueError("malformed remaining length (>4 bytes)")


def _string(s: str | bytes) -> bytes:
    data = s.encode() if isinstance(s, str) else s
    if len(data) > 0xFFFF:
        raise ValueError("MQTT string exceeds 65535 bytes")
    return len(data).to_bytes(2, "big") + data


def _read_string(body: bytes, pos: int) -> tuple[bytes, int]:
    n = int.from_bytes(body[pos:pos + 2], "big")
    return body[pos + 2:pos + 2 + n], pos + 2 + n


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + encode_varint(len(body)) + body


# --------------------------------------------------------------- encoders


def connect(client_id: str, username: str | None = None,
            password: str | None = None, keepalive: int = 60,
            clean_session: bool = True) -> bytes:
    flags = (0x02 if clean_session else 0)
    if username is not None:
        flags |= 0x80
        if password is not None:
            flags |= 0x40
    body = (_string("MQTT") + bytes([4, flags])
            + keepalive.to_bytes(2, "big") + _string(client_id))
    if username is not None:
        body += _string(username)
        if password is not None:
            body += _string(password)
    return _packet(CONNECT, 0, body)


def connack(return_code: int, session_present: bool = False) -> bytes:
    return _packet(CONNACK, 0, bytes([int(session_present), return_code]))


def publish(topic: str, payload: bytes, qos: int = 0, retain: bool = False,
            dup: bool = False, packet_id: int | None = None) -> bytes:
    if qos not in (0, 1):
        raise ValueError("codec supports qos 0/1 (the reference's usage)")
    if qos and packet_id is None:
        raise ValueError("qos 1 publish requires a packet_id")
    flags = (0x08 if dup else 0) | (qos << 1) | (0x01 if retain else 0)
    body = _string(topic)
    if qos:
        body += packet_id.to_bytes(2, "big")
    return _packet(PUBLISH, flags, body + payload)


def puback(packet_id: int) -> bytes:
    return _packet(PUBACK, 0, packet_id.to_bytes(2, "big"))


def subscribe(packet_id: int, filters: list[str | tuple[str, int]]) -> bytes:
    body = packet_id.to_bytes(2, "big")
    for f in filters:
        topic, qos = f if isinstance(f, tuple) else (f, 0)
        body += _string(topic) + bytes([qos])
    return _packet(SUBSCRIBE, 0x02, body)


def suback(packet_id: int, granted: list[int]) -> bytes:
    return _packet(SUBACK, 0, packet_id.to_bytes(2, "big") + bytes(granted))


def unsubscribe(packet_id: int, filters: list[str]) -> bytes:
    body = packet_id.to_bytes(2, "big")
    for f in filters:
        body += _string(f)
    return _packet(UNSUBSCRIBE, 0x02, body)


def unsuback(packet_id: int) -> bytes:
    return _packet(UNSUBACK, 0, packet_id.to_bytes(2, "big"))


def pingreq() -> bytes:
    return _packet(PINGREQ, 0, b"")


def pingresp() -> bytes:
    return _packet(PINGRESP, 0, b"")


def disconnect() -> bytes:
    return _packet(DISCONNECT, 0, b"")


# ---------------------------------------------------------------- decoder


def decode_packet(buf: bytes, pos: int = 0) -> tuple[dict, int] | None:
    """Parse ONE packet starting at ``pos``.

    Returns ``(packet_dict, next_pos)`` or ``None`` if the buffer does
    not yet hold a complete packet (read more bytes and retry).
    """
    if pos >= len(buf):
        return None
    head = buf[pos]
    ptype, flags = head >> 4, head & 0x0F
    vl = decode_varint(buf, pos + 1)
    if vl is None:
        return None
    length, body_pos = vl
    if body_pos + length > len(buf):
        return None
    body = buf[body_pos:body_pos + length]
    nxt = body_pos + length
    if ptype not in TYPE_NAMES:
        raise ValueError(f"unknown MQTT packet type {ptype}")
    pkt: dict = {"type": TYPE_NAMES[ptype]}

    if ptype == CONNECT:
        proto, p = _read_string(body, 0)
        level = body[p]
        cflags = body[p + 1]
        keepalive = int.from_bytes(body[p + 2:p + 4], "big")
        client_id, p = _read_string(body, p + 4)
        username = password = None
        if cflags & 0x80:
            u, p = _read_string(body, p)
            username = u.decode()
            if cflags & 0x40:
                w, p = _read_string(body, p)
                password = w.decode()
        pkt.update(protocol=proto.decode(), level=level,
                   clean_session=bool(cflags & 0x02), keepalive=keepalive,
                   client_id=client_id.decode(), username=username,
                   password=password)
    elif ptype == CONNACK:
        pkt.update(session_present=bool(body[0] & 1), return_code=body[1])
    elif ptype == PUBLISH:
        qos = (flags >> 1) & 0x03
        topic, p = _read_string(body, 0)
        packet_id = None
        if qos:
            packet_id = int.from_bytes(body[p:p + 2], "big")
            p += 2
        pkt.update(topic=topic.decode(), payload=body[p:], qos=qos,
                   retain=bool(flags & 0x01), dup=bool(flags & 0x08),
                   packet_id=packet_id)
    elif ptype in (PUBACK, UNSUBACK):
        pkt.update(packet_id=int.from_bytes(body[:2], "big"))
    elif ptype == SUBSCRIBE:
        pid = int.from_bytes(body[:2], "big")
        p, filters = 2, []
        while p < len(body):
            f, p = _read_string(body, p)
            filters.append((f.decode(), body[p]))
            p += 1
        pkt.update(packet_id=pid, filters=filters)
    elif ptype == SUBACK:
        pkt.update(packet_id=int.from_bytes(body[:2], "big"),
                   granted=list(body[2:]))
    elif ptype == UNSUBSCRIBE:
        pid = int.from_bytes(body[:2], "big")
        p, filters = 2, []
        while p < len(body):
            f, p = _read_string(body, p)
            filters.append(f.decode())
        pkt.update(packet_id=pid, filters=filters)
    # PINGREQ / PINGRESP / DISCONNECT carry no body
    return pkt, nxt


# ---------------------------------------------------------- topic matching


def topic_matches(filter_: str, topic: str) -> bool:
    """Spec §4.7: ``#`` = any remaining levels (incl. none), ``+`` = exactly
    one level; wildcard-leading filters never match ``$``-system topics."""
    if topic.startswith("$") and filter_[:1] in ("#", "+"):
        return False
    flevels = filter_.split("/")
    tlevels = topic.split("/")
    for i, f in enumerate(flevels):
        if f == "#":
            if i != len(flevels) - 1:
                raise ValueError("'#' must be the last filter level")
            return True
        if i >= len(tlevels):
            return False
        if f != "+" and f != tlevels[i]:
            return False
    return len(flevels) == len(tlevels)
