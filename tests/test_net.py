"""Network edge: tcp/udp/http collectors → spool → Dataset, and tcp/udp
sinks — loopback round-trips mirroring the reference's live transports
(src/inputs/tcp.js, udp.js, http-server.js; src/outputs/tcp.js, udp.js)."""

from __future__ import annotations

import base64
import socket
import socketserver
import threading
import time
import urllib.request

import pytest

from node_shovel_ray.sources.net import (
    HttpIngestServer,
    SpoolWriter,
    TcpLineCollector,
    UdpDatagramCollector,
    commit_spool,
    drain_spool,
    sealed_shards,
)


def _wait(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return False


# ------------------------------------------------------------------ spool


def test_spool_seal_rotation_and_commit(tmp_path):
    sp = SpoolWriter(str(tmp_path), max_records=3)
    for i in range(7):
        sp.append({"source": f"r{i}"})
    # 7 rows, rotation at 3 → two sealed shards + 1 pending
    assert sealed_shards(str(tmp_path)) == [
        "shard-000000.parquet", "shard-000001.parquet"]
    assert sp.pending() == 1
    sp.seal()
    assert len(sealed_shards(str(tmp_path))) == 3
    ds, shards = drain_spool(str(tmp_path))
    assert sorted(r["source"] for r in ds.take_all()) == [
        f"r{i}" for i in range(7)]
    commit_spool(str(tmp_path), shards)
    ds2, shards2 = drain_spool(str(tmp_path))
    assert ds2 is None and shards2 == []  # consumed; at-least-once tick done
    # a writer restarted over the same dir continues numbering (no clobber)
    sp2 = SpoolWriter(str(tmp_path), max_records=3)
    sp2.append({"source": "late"})
    sp2.seal()
    assert sealed_shards(str(tmp_path)) == ["shard-000003.parquet"]


def test_spool_concurrent_appends_lose_nothing(ray_session, tmp_path):
    # the seal path double-buffers (swap under the lock, parquet write
    # outside it) so sealing never stalls receivers — this pins that no
    # row is lost or duplicated when many threads append across many
    # rotations, including a concurrent explicit seal()
    sp = SpoolWriter(str(tmp_path), max_records=97)  # non-divisor rotation
    n_threads, per_thread = 8, 5_000

    def writer(tid: int) -> None:
        for i in range(per_thread):
            sp.append({"source": f"{tid}:{i}"})

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    sp.seal()  # race an explicit seal against the appenders
    for t in threads:
        t.join()
    sp.seal()
    ds, _ = drain_spool(str(tmp_path))
    got = [r["source"] for r in ds.take_all()]
    assert len(got) == n_threads * per_thread
    assert len(set(got)) == n_threads * per_thread  # no duplicates either


def test_spool_fifo_eviction(tmp_path):
    # reference queue load shedding (src/queues/batch.js:182-195): at
    # queue_size capacity the OLDEST buffered row is evicted and counted
    sp = SpoolWriter(str(tmp_path), max_records=100, queue_size=3)
    for i in range(5):
        sp.append({"source": f"r{i}"})
    assert sp.evicted == 2 and sp.pending() == 3
    sp.seal()
    ds, _ = drain_spool(str(tmp_path))
    assert sorted(r["source"] for r in ds.take_all()) == ["r2", "r3", "r4"]
    # default queue_size=0 never sheds
    sp2 = SpoolWriter(str(tmp_path / "b"), max_records=1000)
    for i in range(500):
        sp2.append({"source": str(i)})
    assert sp2.evicted == 0 and sp2.pending() == 500


# ----------------------------------------------------------- tcp collector


def test_tcp_line_collector_roundtrip(ray_session, tmp_path):
    col = TcpLineCollector(str(tmp_path), max_records=100)
    host, port = col.address
    # two connections, like two remote shippers
    for conn_lines in (["alpha", "beta"], ["gamma"]):
        with socket.create_connection((host, port)) as s:
            s.sendall(("\n".join(conn_lines) + "\n").encode())
    assert _wait(lambda: col.spool.pending() == 3)
    # pause drops (reference tcp.js:66-68), resume accepts again
    col.pause()
    with socket.create_connection((host, port)) as s:
        s.sendall(b"dropped\n")
    time.sleep(0.2)
    col.resume()
    with socket.create_connection((host, port)) as s:
        s.sendall(b"delta\n")
    assert _wait(lambda: col.spool.pending() == 4)
    col.stop()

    ds, shards = drain_spool(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["source"])
    assert [r["source"] for r in rows] == ["alpha", "beta", "delta", "gamma"]
    # reference header fields are typed columns (tcp.js:74-81)
    assert rows[0]["remote_address"] == "127.0.0.1"
    assert rows[0]["remote_family"] == "IPv4"
    assert rows[0]["local_port"] == port
    assert rows[0]["remote_port"] > 0
    commit_spool(str(tmp_path), shards)


# ----------------------------------------------------------- udp collector


def test_udp_datagram_collector(ray_session, tmp_path):
    col = UdpDatagramCollector(str(tmp_path))
    host, port = col.address
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payloads = [b"one", b"\x00\x01binary\xff", b"three"]
    for p in payloads:
        tx.sendto(p, (host, port))
    assert _wait(lambda: col.spool.pending() == 3)
    col.stop()
    ds, _ = drain_spool(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["source"])
    # raw bytes preserved (reference passes the Buffer through, udp.js:44)
    assert [r["source"] for r in rows] == sorted(payloads)
    assert all(r["size"] == len(r["source"]) for r in rows)
    assert rows[0]["remote_address"] == "127.0.0.1"


# ---------------------------------------------------------- http collector


def _post(url, body=b"x", ctype="application/json", auth=None):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    if auth:
        req.add_header(
            "Authorization",
            "Basic " + base64.b64encode(auth.encode()).decode())
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


def test_http_ingest_outcome_status_map(ray_session, tmp_path):
    srv = HttpIngestServer(
        str(tmp_path),
        username="u", password="p",
        validator=lambda body, ctype: body != b"bad",
        backpressure=2,
    )
    host, port = srv.address
    url = f"http://{host}:{port}/ingest"
    assert _post(url, b"no-auth") == 401            # auth required
    assert _post(url, b"bad", auth="u:p") == 501    # reject: validator
    assert _post(url, b'{"a":1}', auth="u:p") == 200
    assert _post(url, b'{"a":2}', auth="u:p") == 200
    # backlog at backpressure bound → 520 nack (reference onNack, :131)
    assert _post(url, b'{"a":3}', auth="u:p") == 520
    srv.spool.seal()
    assert _post(url, b'{"a":3}', auth="u:p") == 200  # drained → accepts
    srv.pause()
    assert _post(url, b'{"a":4}', auth="u:p") == 403  # not listening (:68)
    srv.resume()
    srv.stop()
    ds, _ = drain_spool(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["source"])
    assert [r["source"] for r in rows] == [b'{"a":1}', b'{"a":2}', b'{"a":3}']
    assert rows[0]["content_type"] == "application/json"
    assert rows[0]["path"] == "/ingest"


# ------------------------------------------------------------------- sinks


class _LineReceiver:
    """Accumulates newline-framed TCP payloads across connections."""

    def __init__(self):
        self.lines: list[bytes] = []
        self.lock = threading.Lock()
        recv = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    with recv.lock:
                        recv.lines.append(raw.rstrip(b"\n"))

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server(("127.0.0.1", 0), Handler)
        self.address = self.server.server_address[:2]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def test_write_tcp_delivers_all_rows(ray_session):
    import ray.data as rd

    from node_shovel_ray.stages.sink_net import write_tcp

    recv = _LineReceiver()
    host, port = recv.address
    ds = rd.from_items([{"payload": f"msg-{i:03d}"} for i in range(250)])
    n = write_tcp(ds, host, port, batch_size=64)
    assert n == 250
    assert _wait(lambda: len(recv.lines) == 250)
    recv.stop()
    assert sorted(recv.lines) == [f"msg-{i:03d}".encode() for i in range(250)]


def test_write_udp_delivers_datagrams(ray_session):
    import ray.data as rd

    from node_shovel_ray.stages.sink_net import write_udp

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5)
    host, port = rx.getsockname()
    ds = rd.from_items([{"payload": f"d{i}"} for i in range(40)])
    n = write_udp(ds, host, port)
    assert n == 40
    got = set()
    try:
        while len(got) < 40:
            got.add(rx.recv(4096))
    except socket.timeout:
        pass
    rx.close()
    # UDP may drop, but loopback under 40 tiny datagrams should not
    assert got == {f"d{i}".encode() for i in range(40)}


# ------------------------------------------------------------- YAML wiring


def test_yaml_spool_input_and_tcp_output(ray_session, tmp_path):
    from node_shovel_ray.pipelines.config import PipelineConfig, build

    # collector fills the spool (the live edge)
    col = TcpLineCollector(str(tmp_path / "spool"))
    host, port = col.address
    with socket.create_connection((host, port)) as s:
        s.sendall(b"e|1\ne|2\ne|3\n")
    assert _wait(lambda: col.spool.pending() == 3)
    col.stop()

    # pipeline tick: spool → tcp sink (delivered count is the ack ledger)
    recv = _LineReceiver()
    rhost, rport = recv.address
    cfg = PipelineConfig.from_dict({
        "name": "net-e2e",
        "input": {"use": "spool",
                  "options": {"spool_dir": str(tmp_path / "spool")}},
        "output": {"use": "tcp",
                   "options": {"host": rhost, "port": rport,
                               "column": "source"}},
    })
    out = build(cfg)()
    assert out == 3
    assert _wait(lambda: len(recv.lines) == 3)
    recv.stop()
    # commit happened (eager sink) → second tick drains nothing
    ds2, shards2 = drain_spool(str(tmp_path / "spool"))
    assert ds2 is None and shards2 == []
    # a new tick with an empty spool still runs (empty dataset path)
    cfg2 = PipelineConfig.from_dict({
        "name": "net-empty",
        "input": {"use": "spool",
                  "options": {"spool_dir": str(tmp_path / "spool")}},
        "output": {"use": "blackhole"},
    })
    assert build(cfg2)() == 0


def test_http_keepalive_survives_early_exit_responses(ray_session, tmp_path):
    """HTTP/1.1 keep-alive: a 403 (paused) response must DRAIN the unread
    request body, or the next request on the same connection would parse
    the stale body as a request line (protocol desync on the documented
    nack-retry path)."""
    import http.client

    srv = HttpIngestServer(str(tmp_path))
    host, port = srv.address
    conn = http.client.HTTPConnection(host, port)
    body = b'{"payload": "x" * 10}'

    srv.pause()
    conn.request("POST", "/i", body=body,
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse(); r.read()
    assert r.status == 403
    srv.resume()
    # SAME connection: must parse as a fresh request and succeed
    conn.request("POST", "/i", body=body,
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse(); r.read()
    assert r.status == 200
    conn.close()
    srv.stop()
    srv.spool.seal()
    ds, _ = drain_spool(str(tmp_path))
    assert ds.count() == 1  # only the accepted POST was spooled
