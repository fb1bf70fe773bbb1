"""Network output sinks — batch analogues of the reference's tcp/udp
outputs (src/outputs/tcp.js:6-96, src/outputs/udp.js:4-42).

The reference holds ONE persistent client connection per worker process
and writes each message's payload as it arrives, ack-ing on successful
write, nack-ing while disconnected, rejecting on a throw
(tcp.js:39-56). The Dataset shape keeps those semantics at batch
granularity:

- the writer is an ACTOR-POOL stage — the connection is made once per
  actor in ``__init__`` (the persistent-client idiom; reconnects are a
  new actor, Ray restarts it on failure) and every ``__call__`` writes
  one batch;
- a failed write raises → Ray retries the task = the reference's nack
  path (at-least-once delivery, same contract as every sink here);
- the stage emits one count row per batch, so the pipeline's return
  value is the total delivered-row count (the ack ledger).

UDP sends one datagram per row (udp.js:33-41). The per-row ``sendto``
loop is the protocol's own framing — one syscall per datagram is
irreducible — so this is NOT a vectorization miss; the batch is only
materialized as a Python list at the socket boundary.
"""

from __future__ import annotations

import socket

import pyarrow as pa

from .keyed import default_pool


class _TcpBatchWriter:
    """One persistent connection per actor; newline-framed writes."""

    def __init__(self, host: str, port: int, column: str,
                 encoding: str = "utf-8"):
        self.column = column
        self.encoding = encoding
        self.sock = socket.create_connection((host, port), timeout=30)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.column].to_pylist()
        out = bytearray()
        for p in payloads:
            out += p.encode(self.encoding) if isinstance(p, str) else p
            out += b"\n"
        self.sock.sendall(bytes(out))  # raise → task retry (nack path)
        return pa.table({"n": pa.array([len(payloads)], pa.int64())})

    def __del__(self):
        try:
            self.sock.close()
        except Exception:
            pass


class _UdpBatchWriter:
    """One datagram per row (reference udp.js:33-41)."""

    def __init__(self, host: str, port: int, column: str,
                 encoding: str = "utf-8"):
        self.column = column
        self.encoding = encoding
        self.addr = (host, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for p in batch[self.column].to_pylist():
            data = p.encode(self.encoding) if isinstance(p, str) else p
            self.sock.sendto(data, self.addr)
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    def __del__(self):
        try:
            self.sock.close()
        except Exception:
            pass


def write_tcp(ds, host: str, port: int, column: str = "payload",
              encoding: str = "utf-8", batch_size: int = 4096) -> int:
    """Stream ``ds[column]`` newline-framed over TCP; returns rows sent."""
    counts = ds.map_batches(
        _TcpBatchWriter,
        fn_constructor_args=(host, port, column, encoding),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(),
    )
    return sum(r["n"] for r in counts.take_all())


def write_udp(ds, host: str, port: int, column: str = "payload",
              encoding: str = "utf-8", batch_size: int = 4096) -> int:
    """Send one datagram per row of ``ds[column]``; returns rows sent."""
    counts = ds.map_batches(
        _UdpBatchWriter,
        fn_constructor_args=(host, port, column, encoding),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(),
    )
    return sum(r["n"] for r in counts.take_all())
