"""Network ingestion edge — batch analogues of the reference's live
tcp/udp servers (src/inputs/tcp.js:6-122, src/inputs/udp.js:5-76) and
http-server input (src/inputs/http-server.js:63-140).

A live protocol server cannot *be* a Dataset (a Dataset is a bounded,
replayable computation), so the batch-engine shape is

    collector  →  spool of sealed shards  →  Dataset

- A **collector** (TCP line server / UDP datagram server / HTTP POST
  handler) runs as an ordinary thread — on the driver for a single-edge
  test, or inside a long-lived named Ray actor per ingest node at scale —
  and appends records to a SPOOL of rotating Parquet shard files. A shard
  is written to ``*.tmp`` and atomically renamed when sealed; readers
  only ever see sealed shards.
- :func:`drain_spool` plans a Dataset over the sealed, not-yet-committed
  shards; :func:`commit_spool` records them consumed only AFTER the sink
  succeeds (the at-least-once contract shared with sources/tail.py — a
  crash between drain and commit re-reads the same shards next tick).

The reference's per-connection metadata headers (``input-tcp-properties``
with remoteAddress/remoteFamily/remotePort/localAddress/localPort,
tcp.js:40-46,74-81; udp's ``rinfo``, udp.js:38-50) become typed columns
on every spooled row, so downstream routing can filter on them with
plain Arrow predicates instead of header lookups.

Scale shape: one collector per ingest node, each owning its own spool
directory on shared storage; the downstream pipeline reads the union of
spools with one ``read_parquet`` — shard count, not collector count,
sets read parallelism.
"""

from __future__ import annotations

import base64
import http.server
import json
import os
import socket
import socketserver
import threading

import pyarrow as pa
import pyarrow.parquet as pq

_CONSUMED_NAME = "consumed_shards.json"


# ------------------------------------------------------------------ spool


class SpoolWriter:
    """Thread-safe rotating-shard writer.

    Rows buffer in memory and seal to ``shard-%06d.parquet`` when
    ``max_records`` is reached or :meth:`seal` is called (the reference's
    queue batch_size/flush_timeout idiom, src/queues/batch.js:26-39,
    mapped to shard rotation). Seal = write ``.tmp`` + atomic rename, so
    a reader never observes a half-written shard.

    ``queue_size`` > 0 enables the reference's FIFO load shedding
    (src/queues/batch.js:182-195): an append at capacity evicts the
    OLDEST buffered row first, counted in :attr:`evicted`. Off by
    default — a batch engine prefers backpressure (the HTTP collector's
    520) over dropping; the knob exists for lossy edges (UDP-style
    telemetry) where the reference would shed too. Sealed shards are
    never evicted (they are the durable ledger).
    """

    def __init__(self, spool_dir: str, max_records: int = 10_000,
                 queue_size: int = 0):
        self.spool_dir = spool_dir
        self.max_records = max_records
        self.queue_size = queue_size
        self.evicted = 0
        os.makedirs(spool_dir, exist_ok=True)
        self._lock = threading.Lock()      # guards _rows / _next_idx
        self._io_lock = threading.Lock()   # serializes shard writes
        self._rows: list[dict] = []
        existing = [
            f for f in os.listdir(spool_dir)
            if f.startswith("shard-") and f.endswith(".parquet")
        ]
        self._next_idx = (
            max((int(f[6:12]) for f in existing), default=-1) + 1
        )

    def append(self, row: dict) -> None:
        batch = None
        with self._lock:
            if self.queue_size and len(self._rows) >= self.queue_size:
                self._rows.pop(0)  # evict the oldest (batch.js:188-193)
                self.evicted += 1
            self._rows.append(row)
            if len(self._rows) >= self.max_records:
                # double-buffer: swap under the lock, write OUTSIDE it, so
                # the Arrow conversion + parquet I/O of a sealing shard
                # never stalls concurrent receiver threads (49k → 234k
                # lines/s on the 4-connection 1M-line TCP burst,
                # scripts/bench_net.py)
                batch, idx = self._rows, self._next_idx
                self._next_idx += 1
                self._rows = []
        if batch is not None:
            self._write_shard(batch, idx)

    def pending(self) -> int:
        with self._lock:
            return len(self._rows)

    def seal(self) -> None:
        with self._lock:
            batch, idx = self._rows, self._next_idx
            if batch:
                self._next_idx += 1
            self._rows = []
        if batch:
            self._write_shard(batch, idx)

    def _write_shard(self, rows: list[dict], idx: int) -> None:
        # shard indices may rename out of order under concurrent seals;
        # readers key on shard NAMES (sealed_shards/commit_spool), not on
        # a contiguous index, so a gap visible mid-write is harmless
        table = pa.Table.from_pylist(rows)
        name = f"shard-{idx:06d}.parquet"
        tmp = os.path.join(self.spool_dir, name + ".tmp")
        with self._io_lock:
            pq.write_table(table, tmp)
            os.replace(tmp, os.path.join(self.spool_dir, name))


def _consumed_path(spool_dir: str) -> str:
    return os.path.join(spool_dir, _CONSUMED_NAME)


def sealed_shards(spool_dir: str) -> list[str]:
    """Sealed-but-unconsumed shard files, oldest first."""
    if not os.path.isdir(spool_dir):
        return []
    done: set[str] = set()
    if os.path.exists(_consumed_path(spool_dir)):
        with open(_consumed_path(spool_dir)) as fh:
            done = set(json.load(fh))
    return sorted(
        f for f in os.listdir(spool_dir)
        if f.startswith("shard-") and f.endswith(".parquet") and f not in done
    )


def drain_spool(spool_dir: str):
    """Dataset over the sealed, unconsumed shards (None if spool empty).

    Returns ``(dataset, shard_names)``; pass ``shard_names`` to
    :func:`commit_spool` AFTER the sink succeeds.
    """
    import ray.data as rd

    shards = sealed_shards(spool_dir)
    if not shards:
        return None, []
    paths = [os.path.join(spool_dir, s) for s in shards]
    # one block per shard: a shard is the collector's atomic unit and the
    # resume granularity, so never split one across tasks
    return rd.read_parquet(paths, override_num_blocks=len(paths)), shards


def commit_spool(spool_dir: str, shards: list[str]) -> None:
    """Mark ``shards`` consumed (atomic tmp+rename, marker written LAST)."""
    done: set[str] = set()
    if os.path.exists(_consumed_path(spool_dir)):
        with open(_consumed_path(spool_dir)) as fh:
            done = set(json.load(fh))
    done.update(shards)
    tmp = _consumed_path(spool_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(done), fh)
    os.replace(tmp, _consumed_path(spool_dir))


# ----------------------------------------------------------- tcp collector


class TcpLineCollector:
    """Line-delimited TCP server → spool (reference src/inputs/tcp.js).

    One row per received line with the reference's connection-metadata
    header fields as columns. ``port=0`` binds an ephemeral port (read it
    back from :attr:`address`). ``pause()``/``resume()`` mirror the
    reference's listening flag (tcp.js:66-68: lines received while paused
    are dropped, not buffered).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        encoding: str = "utf-8",
        keep_alive: bool = True,
        max_records: int = 10_000,
    ):
        self.spool = SpoolWriter(spool_dir, max_records=max_records)
        self.listening = True
        collector = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                remote_addr, remote_port = self.client_address[:2]
                local_addr, local_port = self.connection.getsockname()[:2]
                family = (
                    "IPv6" if self.connection.family == socket.AF_INET6
                    else "IPv4"
                )
                if keep_alive:
                    self.connection.setsockopt(
                        socket.SOL_SOCKET, socket.SO_KEEPALIVE, 1
                    )
                for raw in self.rfile:  # whole lines, like Readline
                    if not collector.listening:
                        continue
                    collector.spool.append(
                        {
                            "source": raw.rstrip(b"\r\n").decode(encoding),
                            "remote_address": remote_addr,
                            "remote_family": family,
                            "remote_port": remote_port,
                            "local_address": local_addr,
                            "local_port": local_port,
                        }
                    )

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address[:2]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def pause(self) -> None:
        self.listening = False

    def resume(self) -> None:
        self.listening = True

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self.spool.seal()


# ----------------------------------------------------------- udp collector


class UdpDatagramCollector:
    """One-message-per-datagram UDP server → spool (src/inputs/udp.js).

    The datagram payload is kept as raw ``binary`` (the reference passes
    the Buffer through undecoded, udp.js:44) with the rinfo fields as
    columns.

    Receives in ONE dedicated loop thread over a kernel buffer sized by
    ``rcvbuf`` — a thread-per-datagram server (ThreadingUDPServer)
    measured 5% delivery at a 40k msg/s loopback burst because thread
    spawn (~25 µs) can't keep up and the default 212 KiB socket buffer
    overflows; the single recv loop with a 4 MiB buffer delivers 100%
    at the same burst (scripts/bench_net.py).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_records: int = 10_000,
        rcvbuf: int = 1 << 22,
    ):
        self.spool = SpoolWriter(spool_dir, max_records=max_records)
        self.listening = True
        self._stop = threading.Event()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, rcvbuf)
        self._sock.bind((host, port))
        self._sock.setblocking(False)
        self.address = self._sock.getsockname()[:2]
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def _recv_loop(self) -> None:
        # poll once per BURST, then drain nonblocking until EWOULDBLOCK —
        # a per-datagram settimeout recvfrom pays poll+recv syscalls per
        # packet and capped the consumer at ~30k datagrams/s; draining
        # between polls amortizes the wait across the whole burst
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(self._sock, selectors.EVENT_READ)
        recvfrom = self._sock.recvfrom
        append = self.spool.append
        try:
            while not self._stop.is_set():
                if not sel.select(timeout=0.2):  # lets the loop see _stop
                    continue
                while not self._stop.is_set():
                    try:
                        data, rinfo = recvfrom(65_535)
                    except BlockingIOError:
                        break
                    except OSError:  # socket closed under us
                        return
                    if not self.listening:
                        continue
                    addr, port_ = rinfo[:2]
                    append(
                        {
                            "source": data,
                            "remote_address": addr,
                            "remote_family": "IPv4",
                            "remote_port": port_,
                            "size": len(data),
                        }
                    )
        finally:
            sel.close()

    def pause(self) -> None:
        self.listening = False

    def resume(self) -> None:
        self.listening = True

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
        self._sock.close()
        self.spool.seal()


# ---------------------------------------------------------- http collector


class HttpIngestServer:
    """HTTP request → spool (reference src/inputs/http-server.js).

    The reference resolves each request's status from the message's
    downstream outcome (onAck→200, onNack→520, onReject→501,
    http-server.js:125-140; 403 while not listening, :68). In the batch
    shape the downstream pipeline runs later, so the collector judges
    ADMISSION with the same codes:

    - 403 while paused (not listening),
    - 401 on basic-auth failure (username/password options),
    - 520 when the spool backlog exceeds ``backpressure`` (nack — the
      client should retry),
    - 501 when the optional ``validator(body, content_type)`` returns
      False (reject — permanently undecodable),
    - 200 on accepted (ack; also the reference's *ignore* outcome).

    Body bytes are spooled raw with the content-type column, mirroring
    ``message.setContentType(ctx.get('content-type'))`` (:80).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        username: str = "",
        password: str = "",
        validator=None,
        backpressure: int = 100_000,
        max_records: int = 10_000,
    ):
        self.spool = SpoolWriter(spool_dir, max_records=max_records)
        self.listening = True
        collector = self
        auth_token = None
        if username:
            auth_token = "Basic " + base64.b64encode(
                f"{username}:{password}".encode()
            ).decode()

        class Handler(http.server.BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: the default HTTP/1.0 closes the
            # connection per request, forcing shippers into a new TCP
            # handshake + server thread per POST. Loopback throughput is
            # parity (~0.7-1.1k req/s either way — Python request parsing
            # under the GIL is the ceiling, scripts/bench_net.py); the
            # win is connection economy for real remote shippers.
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _respond(self, status: int):
                self.send_response(status)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_POST(self):
                # drain the body BEFORE any early-exit response: on a
                # keep-alive connection an unread body would be parsed as
                # the next request line, desyncing the very retry loop the
                # 520 nack asks the shipper to run
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                if not collector.listening:
                    self._respond(403)
                    return
                if auth_token and self.headers.get("Authorization") != auth_token:
                    self._respond(401)
                    return
                if collector.spool.pending() >= backpressure:
                    self._respond(520)  # nack: retry later
                    return
                ctype = self.headers.get("Content-Type", "")
                if validator is not None and not validator(body, ctype):
                    self._respond(501)  # reject: undecodable
                    return
                collector.spool.append(
                    {
                        "source": body,
                        "content_type": ctype,
                        "method": "POST",
                        "path": self.path,
                        "remote_address": self.client_address[0],
                    }
                )
                self._respond(200)

            do_PUT = do_POST

        class Server(socketserver.ThreadingMixIn, http.server.HTTPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address[:2]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def pause(self) -> None:
        self.listening = False

    def resume(self) -> None:
        self.listening = True

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self.spool.seal()
