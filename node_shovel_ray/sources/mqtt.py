"""In-process MQTT 3.1.1 broker + client + subscriber collector — the
loopback stand-in for the reference's mqtt transport (src/inputs/
mqtt.js:61-113: connect → subscribe(topics) → message{topic, payload,
{retain,qos,dup}}; src/outputs/mqtt.js:111-129: publish with templated
topic, ack on completion).

No mqtt package exists in this environment and no external broker is
reachable, so the wire protocol itself is implemented from the public
spec (functions/mqtt_codec.py) and the broker runs in-process — the
same stance as the msgpack/protobuf codecs: REAL bytes on a REAL
socket, just loopback-scoped.

Pieces:

- :class:`MqttBroker` — threaded broker: CONNECT auth (CONNACK 0/4),
  SUBSCRIBE with §4.7 wildcard filters, PUBLISH qos0/1 fan-out to
  matching subscribers (PUBACK to qos-1 publishers), retained-message
  delivery on subscribe, PINGREQ/PINGRESP.
- :class:`MqttClient` — blocking client used by both sides: publish
  (qos 1 waits for PUBACK — the reference's ack callback) and
  subscribe with an on-message callback.
- :class:`MqttSubscriberCollector` — the input analogue: subscribes and
  spools every delivered message ``{source, topic, qos, retain, dup}``
  into the sealed-shard spool (sources/net.py), so a pipeline tick
  drains it exactly like the tcp/udp/http collectors.

Scale shape: identical to the other collectors — one subscriber per
ingest edge, spool shards on shared storage, Dataset reads the spool.
"""

from __future__ import annotations

import socket
import socketserver
import threading

from ..functions import mqtt_codec as mc
from .net import SpoolWriter


class MqttBroker:
    """Minimal in-process MQTT 3.1.1 broker (qos ≤ 1)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 username: str | None = None, password: str | None = None):
        self._lock = threading.Lock()
        # one write lock for every client socket: deliveries fan out from
        # publisher threads, so unsynchronized writes could interleave a
        # packet mid-frame on a shared subscriber connection
        self._wlock = threading.Lock()
        self._subs: list[tuple[object, str, int]] = []  # (wfile, filter, qos)
        self._retained: dict[str, bytes] = {}
        broker = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = b""
                connected = False
                try:
                    while True:
                        chunk = self.connection.recv(65536)
                        if not chunk:
                            return
                        buf += chunk
                        while True:
                            got = mc.decode_packet(buf)
                            if got is None:
                                break
                            pkt, nxt = got
                            buf = buf[nxt:]
                            t = pkt["type"]
                            if t == "connect":
                                if username is not None and (
                                    pkt["username"] != username
                                    or pkt["password"] != password
                                ):
                                    with broker._wlock:
                                        self.wfile.write(
                                            mc.connack(mc.RC_BAD_CREDENTIALS))
                                    return  # spec: close after non-zero rc
                                connected = True
                                with broker._wlock:
                                    self.wfile.write(
                                        mc.connack(mc.RC_ACCEPTED))
                            elif not connected:
                                return  # first packet must be CONNECT
                            elif t == "subscribe":
                                granted = []
                                with broker._lock:
                                    for f, q in pkt["filters"]:
                                        broker._subs.append(
                                            (self.wfile, f, min(q, 1)))
                                        granted.append(min(q, 1))
                                with broker._wlock:
                                    self.wfile.write(
                                        mc.suback(pkt["packet_id"], granted))
                                broker._deliver_retained(
                                    self.wfile, [f for f, _ in pkt["filters"]])
                            elif t == "unsubscribe":
                                with broker._lock:
                                    broker._subs = [
                                        s for s in broker._subs
                                        if not (s[0] is self.wfile
                                                and s[1] in pkt["filters"])]
                                with broker._wlock:
                                    self.wfile.write(
                                        mc.unsuback(pkt["packet_id"]))
                            elif t == "publish":
                                if pkt["qos"] == 1:
                                    with broker._wlock:
                                        self.wfile.write(
                                            mc.puback(pkt["packet_id"]))
                                broker._route(pkt)
                            elif t == "pingreq":
                                with broker._wlock:
                                    self.wfile.write(mc.pingresp())
                            elif t == "disconnect":
                                return
                finally:
                    with broker._lock:
                        broker._subs = [
                            s for s in broker._subs if s[0] is not self.wfile]

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address[:2]
        threading.Thread(
            target=self._server.serve_forever, daemon=True).start()

    def _route(self, pkt: dict) -> None:
        if pkt["retain"]:
            # empty retained payload clears the retention (spec §3.3.1.3)
            if pkt["payload"]:
                self._retained[pkt["topic"]] = pkt["payload"]
            else:
                self._retained.pop(pkt["topic"], None)
        # forward retain=0 (a live delivery, not a retained replay)
        wire = mc.publish(pkt["topic"], pkt["payload"], qos=0, retain=False)
        with self._lock:
            targets = [w for w, f, _ in self._subs
                       if mc.topic_matches(f, pkt["topic"])]
        for w in targets:
            try:
                with self._wlock:
                    w.write(wire)
            except OSError:
                pass  # subscriber went away; cleanup happens in its handler

    def _deliver_retained(self, wfile, filters: list[str]) -> None:
        for topic, payload in list(self._retained.items()):
            if any(mc.topic_matches(f, topic) for f in filters):
                try:
                    with self._wlock:
                        wfile.write(mc.publish(topic, payload, retain=True))
                except OSError:
                    pass

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class MqttClient:
    """Blocking qos≤1 client: the reference's ``MQTT.connect`` usage."""

    def __init__(self, host: str, port: int, client_id: str = "nsr",
                 username: str | None = None, password: str | None = None,
                 on_message=None, timeout: float = 10.0):
        self._on_message = on_message
        self._acks: dict[int, threading.Event] = {}
        self._suback = threading.Event()
        self._pid = 0
        self._lock = threading.Lock()
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.sendall(mc.connect(client_id, username, password))
        self._connack = threading.Event()
        self.return_code: int | None = None
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        if not self._connack.wait(timeout):
            raise TimeoutError("no CONNACK")
        if self.return_code != mc.RC_ACCEPTED:
            raise ConnectionRefusedError(
                f"CONNACK return code {self.return_code}")

    def _read_loop(self) -> None:
        buf = b""
        try:
            while True:
                chunk = self._sock.recv(65536)
                if not chunk:
                    return
                buf += chunk
                while True:
                    got = mc.decode_packet(buf)
                    if got is None:
                        break
                    pkt, nxt = got
                    buf = buf[nxt:]
                    if pkt["type"] == "connack":
                        self.return_code = pkt["return_code"]
                        self._connack.set()
                    elif pkt["type"] == "puback":
                        ev = self._acks.pop(pkt["packet_id"], None)
                        if ev:
                            ev.set()
                    elif pkt["type"] == "suback":
                        self._suback.set()
                    elif pkt["type"] == "publish" and self._on_message:
                        self._on_message(pkt)
        except OSError:
            pass

    def _next_pid(self) -> int:
        with self._lock:
            self._pid = self._pid % 65535 + 1
            return self._pid

    def subscribe(self, filters: list[str], timeout: float = 10.0) -> None:
        self._suback.clear()
        self._sock.sendall(mc.subscribe(self._next_pid(),
                                        [(f, 1) for f in filters]))
        if not self._suback.wait(timeout):
            raise TimeoutError("no SUBACK")

    def publish(self, topic: str, payload: bytes, qos: int = 0,
                retain: bool = False, timeout: float = 10.0) -> None:
        if qos == 0:
            self._sock.sendall(mc.publish(topic, payload, retain=retain))
            return
        pid = self._next_pid()
        ev = threading.Event()
        self._acks[pid] = ev
        self._sock.sendall(
            mc.publish(topic, payload, qos=1, retain=retain, packet_id=pid))
        if not ev.wait(timeout):  # no ack → raise → task retry (nack path)
            raise TimeoutError(f"no PUBACK for packet {pid}")

    def close(self) -> None:
        try:
            self._sock.sendall(mc.disconnect())
            self._sock.close()
        except OSError:
            pass


class MqttSubscriberCollector:
    """Subscribe-and-spool input edge (reference src/inputs/mqtt.js).

    Every delivered message becomes a spool row with the reference's
    header fields as typed columns: payload (``source``), topic, and the
    packet props {qos, retain, dup} (mqtt.js:96-107).
    """

    def __init__(self, spool_dir: str, host: str, port: int,
                 topics: list[str] | None = None, client_id: str = "nsr-in",
                 username: str | None = None, password: str | None = None,
                 max_records: int = 10_000):
        self.spool = SpoolWriter(spool_dir, max_records=max_records)
        self.listening = True
        collector = self

        def on_message(pkt: dict) -> None:
            if not collector.listening:  # pause drops, like tcp/udp
                return
            collector.spool.append(
                {
                    "source": pkt["payload"],
                    "topic": pkt["topic"],
                    "qos": pkt["qos"],
                    "retain": pkt["retain"],
                    "dup": pkt["dup"],
                }
            )

        self.client = MqttClient(host, port, client_id=client_id,
                                 username=username, password=password,
                                 on_message=on_message)
        self.client.subscribe(topics or ["#"])  # reference default ['#']

    def pause(self) -> None:
        self.listening = False

    def resume(self) -> None:
        self.listening = True

    def stop(self) -> None:
        self.client.close()
        self.spool.seal()
