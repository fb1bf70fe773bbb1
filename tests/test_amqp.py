"""AMQP 0-9-1: frame-codec goldens, topic-key matching, loopback
broker/client round-trips (handshake, declare/bind, publish/deliver,
ack/nack/prefetch ledger), the consumer collector, and the publisher
sink (reference src/inputs/amqp.js, src/outputs/amqp.js)."""

from __future__ import annotations

import time

import pytest

from node_shovel_ray.functions import amqp_codec as ac
from node_shovel_ray.sources.amqp import (
    AmqpBroker,
    AmqpClient,
    AmqpConsumerCollector,
    topic_key_matches,
)
from node_shovel_ray.sources.net import drain_spool


def _wait(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return False


# -------------------------------------------------------------- wire codec


def test_method_frame_bit_packing_and_tables():
    w = ac.method_frame(1, "queue.declare", queue="q", durable=True,
                        auto_delete=True,
                        arguments={"n": 3, "s": "x", "b": True,
                                   "f": {"inner": 1}})
    f, n = ac.decode_frame(w)
    assert n == len(w)
    a = f["args"]
    assert (a["queue"], a["passive"], a["durable"], a["exclusive"],
            a["auto_delete"], a["no_wait"]) == ("q", False, True, False,
                                                True, False)
    assert a["arguments"] == {"n": 3, "s": "x", "b": True, "f": {"inner": 1}}
    # deliver: longlong tag + bit + strings
    w = ac.method_frame(7, "basic.deliver", consumer_tag="ct",
                        delivery_tag=2**40, redelivered=True,
                        exchange="ex", routing_key="rk")
    f, _ = ac.decode_frame(w)
    assert f["channel"] == 7
    assert f["args"] == {"consumer_tag": "ct", "delivery_tag": 2**40,
                         "redelivered": True, "exchange": "ex",
                         "routing_key": "rk"}


def test_header_and_body_frames():
    w = ac.header_frame(1, 5, {"content_type": "text/plain",
                               "delivery_mode": 2,
                               "headers": {"k": "v"}, "timestamp": 123})
    f, _ = ac.decode_frame(w)
    assert f["type"] == "header" and f["body_size"] == 5
    assert f["properties"] == {"content_type": "text/plain",
                               "delivery_mode": 2, "headers": {"k": "v"},
                               "timestamp": 123}
    # multi-frame body honors frame_max
    w = ac.body_frames(1, b"ab" * 1000, frame_max=108)
    parts, pos = [], 0
    while (got := ac.decode_frame(w, pos)) is not None:
        parts.append(got[0]["payload"])
        pos = got[1]
    assert b"".join(parts) == b"ab" * 1000
    assert all(len(p) <= 100 for p in parts)
    # incomplete frame → None; bad frame-end → error
    assert ac.decode_frame(w[:4]) is None
    bad = bytearray(ac.heartbeat_frame())
    bad[-1] = 0x00
    with pytest.raises(ValueError):
        ac.decode_frame(bytes(bad))


def test_topic_key_matching():
    assert topic_key_matches("a.*.c", "a.b.c")
    assert not topic_key_matches("a.*.c", "a.b.b.c")
    assert topic_key_matches("a.#", "a")
    assert topic_key_matches("a.#", "a.b.c.d")
    assert topic_key_matches("#", "x.y")
    assert topic_key_matches("a.#.z", "a.z")
    assert topic_key_matches("a.#.z", "a.b.c.z")
    assert not topic_key_matches("a.b", "a")
    assert not topic_key_matches("*", "a.b")


# ---------------------------------------------------------------- broker


def test_handshake_auth_and_direct_roundtrip(tmp_path):
    broker = AmqpBroker(username="u", password="p")
    host, port = broker.address
    with pytest.raises(ConnectionRefusedError):
        AmqpClient(host, port, username="u", password="nope")

    got: list[dict] = []
    sub = AmqpClient(host, port, username="u", password="p",
                     on_deliver=got.append)
    sub.qos(100)
    sub.exchange_declare("logs", "direct")
    sub.queue_declare("q1")
    sub.queue_bind("q1", "logs", "err")
    sub.consume("q1")

    pub = AmqpClient(host, port, username="u", password="p")
    pub.publish("logs", "err", b"m1", {"content_type": "text/plain"})
    pub.publish("logs", "info", b"filtered-out")
    pub.publish("logs", "err", b"m2" * 100_000)  # multi-frame body
    assert _wait(lambda: len(got) == 2)
    assert got[0]["body"] == b"m1"
    assert got[0]["properties"]["content_type"] == "text/plain"
    assert got[0]["exchange"] == "logs" and got[0]["routing_key"] == "err"
    assert got[1]["body"] == b"m2" * 100_000
    for d in got:
        sub.ack(d["delivery_tag"])
    # default '' exchange routes by queue name
    pub.publish("", "q1", b"direct-to-queue")
    assert _wait(lambda: len(got) == 3)
    sub.ack(got[2]["delivery_tag"])
    pub.close()
    sub.close()
    broker.stop()


def test_prefetch_blocks_until_ack_and_nack_requeues():
    broker = AmqpBroker()
    host, port = broker.address
    got: list[dict] = []
    sub = AmqpClient(host, port, on_deliver=got.append)
    sub.qos(1)  # the reference's queue_size prefetch (amqp.js:206)
    sub.queue_declare("q")
    sub.consume("q")
    pub = AmqpClient(host, port)
    for i in range(3):
        pub.publish("", "q", f"m{i}".encode())
    # prefetch=1: only one outstanding delivery until acked
    assert _wait(lambda: len(got) == 1)
    time.sleep(0.2)
    assert len(got) == 1
    sub.ack(got[0]["delivery_tag"])
    assert _wait(lambda: len(got) == 2)
    # nack(requeue) → redelivered at the head with redelivered=True
    sub.nack(got[1]["delivery_tag"], requeue=True)
    assert _wait(lambda: len(got) == 3)
    assert got[2]["body"] == got[1]["body"] == b"m1"
    assert got[2]["redelivered"] is True
    sub.ack(got[2]["delivery_tag"])
    assert _wait(lambda: len(got) == 4)
    # nack without requeue drops (the reference's reject)
    sub.nack(got[3]["delivery_tag"], requeue=False)
    time.sleep(0.2)
    assert len(got) == 4
    pub.close()
    sub.close()
    broker.stop()


def test_topic_exchange_fanout_routing():
    broker = AmqpBroker()
    host, port = broker.address
    got_a, got_b = [], []
    ca = AmqpClient(host, port, on_deliver=got_a.append)
    ca.qos(10)
    ca.exchange_declare("t", "topic")
    ca.queue_declare("qa")
    ca.queue_bind("qa", "t", "eu.*.err")
    ca.consume("qa", consumer_tag="a")
    cb = AmqpClient(host, port, on_deliver=got_b.append)
    cb.qos(10)
    cb.queue_declare("qb")
    cb.queue_bind("qb", "t", "eu.#")
    cb.consume("qb", consumer_tag="b")
    pub = AmqpClient(host, port)
    pub.publish("t", "eu.fr.err", b"x")   # both
    pub.publish("t", "eu.fr.warn", b"y")  # only b
    pub.publish("t", "us.ny.err", b"z")   # neither
    assert _wait(lambda: len(got_a) == 1 and len(got_b) == 2)
    for c, got in ((ca, got_a), (cb, got_b)):
        for d in got:
            c.ack(d["delivery_tag"])
    for c in (ca, cb, pub):
        c.close()
    broker.stop()


# ------------------------------------------------------ collector + sink


def test_consumer_collector_spools_and_acks(ray_session, tmp_path):
    broker = AmqpBroker()
    host, port = broker.address
    col = AmqpConsumerCollector(str(tmp_path), host, port, queue="ship",
                                exchange="evs", routing_key="k",
                                prefetch=2)
    pub = AmqpClient(host, port)
    for i in range(5):
        pub.publish("evs", "k", f"m{i}".encode(),
                    {"content_type": "application/json"})
    assert _wait(lambda: col.spool.pending() == 5)
    col.stop()
    pub.close()
    broker.stop()
    ds, _ = drain_spool(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["source"])
    assert [r["source"] for r in rows] == [f"m{i}".encode() for i in range(5)]
    assert rows[0]["exchange"] == "evs"
    assert rows[0]["routing_key"] == "k"
    assert rows[0]["content_type"] == "application/json"
    assert rows[0]["redelivered"] is False


def test_write_amqp_templated_routing_key(ray_session, tmp_path):
    import ray.data as rd

    from node_shovel_ray.stages.sink_net import write_amqp

    broker = AmqpBroker()
    host, port = broker.address
    # one collector per routing key, bound to a topic exchange
    cols = {
        role: AmqpConsumerCollector(
            str(tmp_path / role), host, port, queue=f"q-{role}",
            exchange="out", routing_key=f"turn.{role}",
            exchange_type="topic", prefetch=100)
        for role in ("user", "agent")
    }
    ds = rd.from_items([
        {"payload": f"p{i}", "role": ["user", "agent"][i % 2]}
        for i in range(50)
    ])
    n = write_amqp(ds, host, port, exchange="out",
                   routing_key="turn.{role}", exchange_type="topic",
                   batch_size=16)
    assert n == 50
    assert _wait(lambda: sum(c.spool.pending() for c in cols.values()) == 50)
    for c in cols.values():
        c.stop()
    broker.stop()
    for role, want in (("user", [f"p{i}" for i in range(0, 50, 2)]),
                       ("agent", [f"p{i}" for i in range(1, 50, 2)])):
        rows, _ = drain_spool(str(tmp_path / role))
        got = sorted(r["source"].decode() for r in rows.take_all())
        assert got == sorted(want)
        assert {r["routing_key"] for r in rows.take_all()} == {f"turn.{role}"}
