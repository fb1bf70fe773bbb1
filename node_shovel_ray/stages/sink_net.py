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


class _MqttBatchPublisher:
    """One persistent MQTT connection per actor; per-row templated topic
    (reference src/outputs/mqtt.js:111-129: renderTemplate over the
    message, publish, ack on the broker callback — qos 1 here so the
    PUBACK wait IS that ack)."""

    def __init__(self, host: str, port: int, topic_template: str,
                 column: str, qos: int = 1,
                 username: str | None = None, password: str | None = None):
        from ..sources.mqtt import MqttClient

        self.topic_template = topic_template
        self.column = column
        self.qos = qos
        self.client = MqttClient(host, port, client_id=f"nsr-out-{id(self)}",
                                 username=username, password=password)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.template import render_template

        if "{" in self.topic_template:
            topics = render_template(batch, self.topic_template).to_pylist()
        else:
            topics = [self.topic_template] * len(batch)
        payloads = batch[self.column].to_pylist()
        for topic, p in zip(topics, payloads):
            data = p.encode() if isinstance(p, str) else p
            # per-row publish is the protocol's own framing (like UDP);
            # a qos-1 TimeoutError raises → task retry (nack path)
            self.client.publish(topic, data, qos=self.qos)
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    def __del__(self):
        try:
            self.client.close()
        except Exception:
            pass


def write_mqtt(ds, host: str, port: int, topic: str,
               column: str = "payload", qos: int = 1,
               username: str | None = None, password: str | None = None,
               batch_size: int = 4096) -> int:
    """Publish ``ds[column]`` to MQTT, topic templated per row."""
    counts = ds.map_batches(
        _MqttBatchPublisher,
        fn_constructor_args=(host, port, topic, column, qos,
                             username, password),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(),
    )
    return sum(r["n"] for r in counts.take_all())


class _AmqpBatchPublisher:
    """One persistent AMQP connection per actor; per-row templated routing
    key (reference src/outputs/amqp.js:81-85: renderTemplate over the
    message, channel.publish(exchange, key, payload))."""

    def __init__(self, host: str, port: int, exchange: str,
                 routing_key_template: str, column: str,
                 exchange_type: str = "direct",
                 username: str = "guest", password: str = "guest"):
        from ..sources.amqp import AmqpClient

        self.exchange = exchange
        self.template = routing_key_template
        self.column = column
        self.client = AmqpClient(host, port, username=username,
                                 password=password)
        if exchange:
            self.client.exchange_declare(exchange, exchange_type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.template import render_template

        if "{" in self.template:
            keys = render_template(batch, self.template).to_pylist()
        else:
            keys = [self.template] * len(batch)
        for key, p in zip(keys, batch[self.column].to_pylist()):
            data = p.encode() if isinstance(p, str) else p
            # socket failure raises → task retry (the nack/reconnect path)
            self.client.publish(self.exchange, key, data,
                                properties={"delivery_mode": 2})
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    def __del__(self):
        try:
            self.client.close()
        except Exception:
            pass


def write_amqp(ds, host: str, port: int, exchange: str, routing_key: str,
               column: str = "payload", exchange_type: str = "direct",
               username: str = "guest", password: str = "guest",
               batch_size: int = 4096) -> int:
    """Publish ``ds[column]`` to AMQP, routing key templated per row."""
    counts = ds.map_batches(
        _AmqpBatchPublisher,
        fn_constructor_args=(host, port, exchange, routing_key, column,
                             exchange_type, username, password),
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
