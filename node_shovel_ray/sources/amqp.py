"""In-process AMQP 0-9-1 broker + client + consumer collector — the
loopback stand-in for the reference's amqp transport
(src/inputs/amqp.js:175-300: connect → channel → prefetch(queue_size) →
assertQueue → bindQueue(exchange, routing_key) → consume with per-message
ack / nack(requeue) / reject; src/outputs/amqp.js:60-86: assertExchange +
publish with per-message templated routing key).

The wire protocol is implemented from the public OASIS 0-9-1 spec
(functions/amqp_codec.py); the broker runs in-process so the full
handshake → declare → bind → publish → deliver → ack ledger is exercised
over real sockets without an external rabbitmq.

Broker semantics covered (the subset the reference relies on):
- PLAIN auth at connection.start-ok (bad credentials → connection.close
  with reply-code 403, like rabbit);
- direct / fanout / topic exchanges (topic: ``*`` = one word, ``#`` = any
  words, '.'-separated, spec §3.1.3.3) + the default '' exchange routing
  straight to the queue named by the routing key;
- per-channel ``basic.qos prefetch_count`` honored: a consumer with
  ``prefetch`` outstanding unacked deliveries receives nothing more until
  it acks (the reference's queue_size backpressure, amqp.js:206);
- ``basic.nack requeue=true`` puts the message back at the HEAD of the
  queue and redelivers with ``redelivered=1``; ``requeue=false`` drops it
  (the reference's reject path).
"""

from __future__ import annotations

import itertools
import socket
import socketserver
import threading
import time
from collections import deque

from ..functions import amqp_codec as ac
from .net import SpoolWriter


def topic_key_matches(pattern: str, key: str) -> bool:
    """AMQP topic-exchange match: ``*``=one word, ``#``=zero+ words."""
    pw, kw = pattern.split("."), key.split(".")

    def rec(i: int, j: int) -> bool:
        while i < len(pw):
            if pw[i] == "#":
                if i == len(pw) - 1:
                    return True
                return any(rec(i + 1, j2) for j2 in range(j, len(kw) + 1))
            if j >= len(kw) or (pw[i] != "*" and pw[i] != kw[j]):
                return False
            i, j = i + 1, j + 1
        return j == len(kw)

    return rec(0, 0)


class _Conn:
    """Per-connection broker state: socket write lock + channel counters."""

    def __init__(self, wfile):
        self.wfile = wfile
        self.wlock = threading.Lock()
        self.next_tag: dict[int, itertools.count] = {}
        self.unacked: dict[int, dict[int, tuple[str, tuple]]] = {}
        self.prefetch: dict[int, int] = {}

    def send(self, *frames: bytes) -> None:
        with self.wlock:
            for f in frames:
                self.wfile.write(f)


class AmqpBroker:
    """Minimal in-process AMQP 0-9-1 broker."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 username: str | None = None, password: str | None = None):
        self._lock = threading.Lock()
        self._exchanges: dict[str, str] = {"": "direct"}
        self._queues: dict[str, deque] = {}
        self._bindings: list[tuple[str, str, str]] = []  # (exch, key, queue)
        # queue → [consumer dict]; round-robin position per queue
        self._consumers: dict[str, list[dict]] = {}
        self._rr: dict[str, int] = {}
        broker = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                conn = _Conn(self.wfile)
                header = self.rfile.read(8)
                if header != ac.PROTOCOL_HEADER:
                    # spec §4.2.2: answer with the supported header, close
                    conn.send(ac.PROTOCOL_HEADER)
                    return
                conn.send(ac.method_frame(
                    0, "connection.start", version_major=0, version_minor=9,
                    server_properties={"product": "nsr-loopback"},
                    mechanisms=b"PLAIN", locales=b"en_US"))
                buf = b""
                pending: dict[int, dict] = {}  # channel → publish in flight
                try:
                    while True:
                        chunk = self.connection.recv(1 << 20)
                        if not chunk:
                            return
                        buf += chunk
                        while True:
                            got = ac.decode_frame(buf)
                            if got is None:
                                break
                            fr, nxt = got
                            buf = buf[nxt:]
                            if not broker._dispatch(conn, fr, pending,
                                                    username, password):
                                return
                finally:
                    broker._drop_conn(conn)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address[:2]
        threading.Thread(
            target=self._server.serve_forever, daemon=True).start()

    # ------------------------------------------------------------ routing

    def _dispatch(self, conn: _Conn, fr: dict, pending: dict,
                  username, password) -> bool:
        """Handle one frame; returns False to close the connection."""
        ch = fr["channel"]
        if fr["type"] == "heartbeat":
            return True
        if fr["type"] == "header":
            pending[ch]["properties"] = fr["properties"]
            pending[ch]["body_size"] = fr["body_size"]
            pending[ch]["body"] = b""
            if fr["body_size"] == 0:
                self._publish(pending.pop(ch))
            return True
        if fr["type"] == "body":
            p = pending[ch]
            p["body"] += fr["payload"]
            if len(p["body"]) >= p["body_size"]:
                self._publish(pending.pop(ch))
            return True

        m, a = fr["method"], fr["args"]
        if m == "connection.start-ok":
            if username is not None:
                ok = a["response"] == b"\x00%b\x00%b" % (
                    username.encode(), password.encode())
                if a["mechanism"] != "PLAIN" or not ok:
                    conn.send(ac.method_frame(
                        0, "connection.close", reply_code=403,
                        reply_text="ACCESS_REFUSED", class_id=0, method_id=0))
                    return False
            conn.send(ac.method_frame(0, "connection.tune", channel_max=2047,
                                      frame_max=131072, heartbeat=0))
        elif m == "connection.tune-ok":
            pass
        elif m == "connection.open":
            conn.send(ac.method_frame(0, "connection.open-ok"))
        elif m == "connection.close":
            conn.send(ac.method_frame(0, "connection.close-ok"))
            return False
        elif m == "channel.open":
            conn.next_tag[ch] = itertools.count(1)
            conn.unacked[ch] = {}
            conn.prefetch[ch] = 0
            conn.send(ac.method_frame(ch, "channel.open-ok"))
        elif m == "channel.close":
            conn.send(ac.method_frame(ch, "channel.close-ok"))
        elif m == "exchange.declare":
            with self._lock:
                self._exchanges[a["exchange"]] = a["type"]
            if not a["no_wait"]:
                conn.send(ac.method_frame(ch, "exchange.declare-ok"))
        elif m == "queue.declare":
            with self._lock:
                q = self._queues.setdefault(a["queue"], deque())
                n = len(q)
            if not a["no_wait"]:
                conn.send(ac.method_frame(
                    ch, "queue.declare-ok", queue=a["queue"],
                    message_count=n, consumer_count=0))
        elif m == "queue.bind":
            with self._lock:
                self._bindings.append(
                    (a["exchange"], a["routing_key"], a["queue"]))
            if not a["no_wait"]:
                conn.send(ac.method_frame(ch, "queue.bind-ok"))
        elif m == "basic.qos":
            conn.prefetch[ch] = a["prefetch_count"]
            conn.send(ac.method_frame(ch, "basic.qos-ok"))
        elif m == "basic.consume":
            consumer = {"conn": conn, "channel": ch, "tag": a["consumer_tag"],
                        "queue": a["queue"], "no_ack": a["no_ack"]}
            with self._lock:
                self._consumers.setdefault(a["queue"], []).append(consumer)
            if not a["no_wait"]:
                conn.send(ac.method_frame(ch, "basic.consume-ok",
                                          consumer_tag=a["consumer_tag"]))
            self._pump(a["queue"])
        elif m == "basic.cancel":
            with self._lock:
                for q, lst in self._consumers.items():
                    self._consumers[q] = [
                        c for c in lst
                        if not (c["conn"] is conn and c["tag"] == a["consumer_tag"])]
            if not a["no_wait"]:
                conn.send(ac.method_frame(ch, "basic.cancel-ok",
                                          consumer_tag=a["consumer_tag"]))
        elif m == "basic.publish":
            pending[ch] = {"exchange": a["exchange"],
                           "routing_key": a["routing_key"]}
        elif m == "basic.ack":
            tags = ([t for t in conn.unacked[ch] if t <= a["delivery_tag"]]
                    if a["multiple"] else [a["delivery_tag"]])
            touched = set()
            for t in tags:
                entry = conn.unacked[ch].pop(t, None)
                if entry:
                    touched.add(entry[0])
            for q in touched:
                self._pump(q)
        elif m == "basic.nack":
            tags = ([t for t in conn.unacked[ch] if t <= a["delivery_tag"]]
                    if a["multiple"] else [a["delivery_tag"]])
            touched = set()
            for t in sorted(tags, reverse=True):
                entry = conn.unacked[ch].pop(t, None)
                if entry is None:
                    continue
                qname, msg = entry
                touched.add(qname)
                if a["requeue"]:
                    with self._lock:
                        # back to the HEAD, marked redelivered
                        self._queues[qname].appendleft(
                            msg[:4] + (True,))
            for q in touched:
                self._pump(q)
        else:
            raise ValueError(f"broker: unhandled method {m}")
        return True

    def _publish(self, p: dict) -> None:
        """Route a completed publish to bound queues and pump them."""
        exch, key = p["exchange"], p["routing_key"]
        msg = (exch, key, p["properties"], p["body"], False)
        targets: list[str] = []
        with self._lock:
            etype = self._exchanges.get(exch, "direct")
            if exch == "":
                if key in self._queues:
                    targets = [key]
            else:
                for e, bkey, q in self._bindings:
                    if e != exch:
                        continue
                    if (etype == "fanout" or (etype == "direct" and bkey == key)
                            or (etype == "topic"
                                and topic_key_matches(bkey, key))):
                        targets.append(q)
            for q in dict.fromkeys(targets):  # dedup, keep order
                self._queues.setdefault(q, deque()).append(msg)
        for q in dict.fromkeys(targets):
            self._pump(q)

    def _pump(self, qname: str) -> None:
        """Deliver queued messages to consumers with prefetch capacity."""
        while True:
            with self._lock:
                queue = self._queues.get(qname)
                consumers = [c for c in self._consumers.get(qname, ())]
                if not queue or not consumers:
                    return
                # round-robin starting after the last chosen consumer
                start = self._rr.get(qname, 0)
                chosen = None
                for i in range(len(consumers)):
                    c = consumers[(start + i) % len(consumers)]
                    conn, ch = c["conn"], c["channel"]
                    pf = conn.prefetch.get(ch, 0)
                    if c["no_ack"] or pf == 0 or len(conn.unacked[ch]) < pf:
                        chosen = c
                        self._rr[qname] = (start + i + 1) % len(consumers)
                        break
                if chosen is None:
                    return
                msg = queue.popleft()
                conn, ch = chosen["conn"], chosen["channel"]
                tag = next(conn.next_tag[ch])
                if not chosen["no_ack"]:
                    conn.unacked[ch][tag] = (qname, msg)
            exch, key, props, body, redelivered = msg
            try:
                conn.send(
                    ac.method_frame(ch, "basic.deliver",
                                    consumer_tag=chosen["tag"],
                                    delivery_tag=tag,
                                    redelivered=redelivered,
                                    exchange=exch, routing_key=key),
                    ac.header_frame(ch, len(body), props),
                    ac.body_frames(ch, body))
            except OSError:
                self._drop_conn(conn)
                with self._lock:  # put the message back for someone else
                    self._queues[qname].appendleft(msg)

    def _drop_conn(self, conn: _Conn) -> None:
        with self._lock:
            for q in list(self._consumers):
                self._consumers[q] = [
                    c for c in self._consumers[q] if c["conn"] is not conn]
            # unacked messages from a dead consumer return to their queues
            requeue = [
                (qname, msg)
                for per_ch in conn.unacked.values()
                for qname, msg in per_ch.values()
            ]
            for qname, msg in requeue:
                self._queues.setdefault(qname, deque()).appendleft(
                    msg[:4] + (True,))
        conn.unacked = {}
        for qname, _ in requeue:
            self._pump(qname)

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class AmqpClient:
    """Blocking 0-9-1 client on one channel — the amqplib usage shape."""

    def __init__(self, host: str, port: int,
                 username: str = "guest", password: str = "guest",
                 on_deliver=None, timeout: float = 10.0):
        self._on_deliver = on_deliver
        self._replies: dict[str, list] = {}
        self._reply_ev = threading.Condition()
        self._closed = threading.Event()
        self._wlock = threading.Lock()
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.sendall(ac.PROTOCOL_HEADER)
        self._timeout = timeout
        threading.Thread(target=self._read_loop, daemon=True).start()
        self._expect("connection.start")
        self._send(ac.method_frame(
            0, "connection.start-ok", client_properties={"product": "nsr"},
            mechanism="PLAIN",
            response=b"\x00%b\x00%b" % (username.encode(), password.encode()),
            locale="en_US"))
        tune = self._expect("connection.tune", "connection.close")
        if tune["method"] == "connection.close":
            raise ConnectionRefusedError(tune["args"]["reply_text"])
        self.frame_max = tune["args"]["frame_max"] or 131072
        self._send(ac.method_frame(0, "connection.tune-ok", **tune["args"]))
        self._send(ac.method_frame(0, "connection.open", virtual_host="/"))
        self._expect("connection.open-ok")
        self._send(ac.method_frame(1, "channel.open"))
        self._expect("channel.open-ok")

    # --------------------------------------------------------- wire plumbing

    def _send(self, *frames: bytes) -> None:
        with self._wlock:
            for f in frames:
                self._sock.sendall(f)

    def _expect(self, *names: str) -> dict:
        with self._reply_ev:
            end = self._reply_ev.wait_for(
                lambda: any(self._replies.get(n) for n in names)
                or self._closed.is_set(),
                timeout=self._timeout)
            if not end or self._closed.is_set() and not any(
                    self._replies.get(n) for n in names):
                raise TimeoutError(f"no {names} reply")
            for n in names:
                if self._replies.get(n):
                    return self._replies[n].pop(0)
        raise AssertionError("unreachable")

    def _read_loop(self) -> None:
        buf = b""
        deliver: dict | None = None
        try:
            while True:
                chunk = self._sock.recv(1 << 20)
                if not chunk:
                    break
                buf += chunk
                while True:
                    got = ac.decode_frame(buf)
                    if got is None:
                        break
                    fr, nxt = got
                    buf = buf[nxt:]
                    if fr["type"] == "method" and fr["method"] == "basic.deliver":
                        deliver = dict(fr["args"])
                    elif fr["type"] == "header" and deliver is not None:
                        deliver["properties"] = fr["properties"]
                        deliver["body_size"] = fr["body_size"]
                        deliver["body"] = b""
                        if fr["body_size"] == 0 and self._on_deliver:
                            self._on_deliver(deliver)
                            deliver = None
                    elif fr["type"] == "body" and deliver is not None:
                        deliver["body"] += fr["payload"]
                        if len(deliver["body"]) >= deliver["body_size"]:
                            if self._on_deliver:
                                self._on_deliver(deliver)
                            deliver = None
                    elif fr["type"] == "method":
                        with self._reply_ev:
                            self._replies.setdefault(
                                fr["method"], []).append(fr)
                            self._reply_ev.notify_all()
        except OSError:
            pass
        finally:
            self._closed.set()
            with self._reply_ev:
                self._reply_ev.notify_all()

    # ---------------------------------------------------------------- API

    def exchange_declare(self, exchange: str, type_: str = "direct") -> None:
        self._send(ac.method_frame(1, "exchange.declare", exchange=exchange,
                                   type=type_, durable=True))
        self._expect("exchange.declare-ok")

    def queue_declare(self, queue: str, durable: bool = True) -> None:
        self._send(ac.method_frame(1, "queue.declare", queue=queue,
                                   durable=durable))
        self._expect("queue.declare-ok")

    def queue_bind(self, queue: str, exchange: str, routing_key: str) -> None:
        self._send(ac.method_frame(1, "queue.bind", queue=queue,
                                   exchange=exchange,
                                   routing_key=routing_key))
        self._expect("queue.bind-ok")

    def qos(self, prefetch_count: int) -> None:
        self._send(ac.method_frame(1, "basic.qos",
                                   prefetch_count=prefetch_count))
        self._expect("basic.qos-ok")

    def consume(self, queue: str, consumer_tag: str = "nsr") -> None:
        self._send(ac.method_frame(1, "basic.consume", queue=queue,
                                   consumer_tag=consumer_tag))
        self._expect("basic.consume-ok")

    def cancel(self, consumer_tag: str = "nsr") -> None:
        self._send(ac.method_frame(1, "basic.cancel",
                                   consumer_tag=consumer_tag))
        self._expect("basic.cancel-ok")

    def publish(self, exchange: str, routing_key: str, body: bytes,
                properties: dict | None = None) -> None:
        self._send(
            ac.method_frame(1, "basic.publish", exchange=exchange,
                            routing_key=routing_key),
            ac.header_frame(1, len(body), properties),
            ac.body_frames(1, body, self.frame_max))

    def ack(self, delivery_tag: int) -> None:
        self._send(ac.method_frame(1, "basic.ack",
                                   delivery_tag=delivery_tag))

    def nack(self, delivery_tag: int, requeue: bool = True) -> None:
        self._send(ac.method_frame(1, "basic.nack",
                                   delivery_tag=delivery_tag,
                                   requeue=requeue))

    def close(self) -> None:
        try:
            self._send(ac.method_frame(0, "connection.close", reply_code=200,
                                       reply_text="bye", class_id=0,
                                       method_id=0))
            self._expect("connection.close-ok")
        except (OSError, TimeoutError):
            pass
        try:
            self._sock.close()
        except OSError:
            pass


class AmqpConsumerCollector:
    """Consume-and-spool input edge (reference src/inputs/amqp.js).

    Mirrors the reference's wiring order (amqp.js:204-247): channel →
    ``prefetch(queue_size)`` → assertQueue → bindQueue(exchange,
    routing_key) → consume. Each delivery is spooled, THEN acked —
    at-least-once: a crash between spool-append and ack leaves the
    message unacked and the broker redelivers it (``redelivered=1``).
    While paused, deliveries are nack'd with requeue=true (the
    reference's onNack path, amqp.js:104-106).
    """

    def __init__(self, spool_dir: str, host: str, port: int,
                 queue: str = "shovel", exchange: str = "",
                 routing_key: str = "", exchange_type: str = "direct",
                 prefetch: int = 1000,
                 username: str = "guest", password: str = "guest",
                 max_records: int = 10_000):
        self.spool = SpoolWriter(spool_dir, max_records=max_records)
        self.listening = True
        collector = self

        def on_deliver(d: dict) -> None:
            if not collector.listening:
                # damp the nack→redeliver cycle while paused (rabbit clients
                # cancel the consumer instead; a tick-scoped pause is short)
                time.sleep(0.05)
                collector.client.nack(d["delivery_tag"], requeue=True)
                return
            collector.spool.append(
                {
                    "source": d["body"],
                    "exchange": d["exchange"],
                    "routing_key": d["routing_key"],
                    "redelivered": d["redelivered"],
                    "content_type": d["properties"].get("content_type", ""),
                }
            )
            collector.client.ack(d["delivery_tag"])

        self.client = AmqpClient(host, port, username=username,
                                 password=password, on_deliver=on_deliver)
        self.client.qos(prefetch)
        if exchange:
            self.client.exchange_declare(exchange, exchange_type)
        self.client.queue_declare(queue)
        if exchange:
            self.client.queue_bind(queue, exchange, routing_key)
        self.client.consume(queue)

    def pause(self) -> None:
        self.listening = False

    def resume(self) -> None:
        self.listening = True

    def stop(self) -> None:
        try:
            self.client.cancel()
        except TimeoutError:
            pass
        self.client.close()
        self.spool.seal()
