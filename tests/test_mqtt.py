"""MQTT 3.1.1: wire-codec goldens, §4.7 topic matching, loopback
broker/client round-trips, subscriber-collector ingest, and the qos-1
publisher sink (reference src/inputs/mqtt.js, src/outputs/mqtt.js)."""

from __future__ import annotations

import time

import pytest

from node_shovel_ray.functions import mqtt_codec as mc
from node_shovel_ray.sources.mqtt import (
    MqttBroker,
    MqttClient,
    MqttSubscriberCollector,
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


def test_varint_boundaries():
    # spec §2.2.3 table: 1/2/3/4-byte boundaries
    for n, wire in [(0, b"\x00"), (127, b"\x7f"), (128, b"\x80\x01"),
                    (16383, b"\xff\x7f"), (16384, b"\x80\x80\x01"),
                    (2097151, b"\xff\xff\x7f"),
                    (268435455, b"\xff\xff\xff\x7f")]:
        assert mc.encode_varint(n) == wire
        assert mc.decode_varint(wire, 0) == (n, len(wire))
    assert mc.decode_varint(b"\x80", 0) is None  # incomplete
    with pytest.raises(ValueError):
        mc.encode_varint(268435456)


def test_packet_roundtrips():
    pkt, _ = mc.decode_packet(mc.connect("cid", "user", "pw", keepalive=30))
    assert pkt == {"type": "connect", "protocol": "MQTT", "level": 4,
                   "clean_session": True, "keepalive": 30,
                   "client_id": "cid", "username": "user", "password": "pw"}
    pkt, _ = mc.decode_packet(
        mc.publish("a/b", b"\x00payload\xff", qos=1, retain=True,
                   packet_id=7))
    assert pkt == {"type": "publish", "topic": "a/b",
                   "payload": b"\x00payload\xff", "qos": 1, "retain": True,
                   "dup": False, "packet_id": 7}
    pkt, _ = mc.decode_packet(mc.subscribe(3, [("a/#", 1), ("b/+", 0)]))
    assert pkt == {"type": "subscribe", "packet_id": 3,
                   "filters": [("a/#", 1), ("b/+", 0)]}
    pkt, _ = mc.decode_packet(mc.suback(3, [1, 0]))
    assert pkt == {"type": "suback", "packet_id": 3, "granted": [1, 0]}
    pkt, _ = mc.decode_packet(mc.puback(9))
    assert pkt == {"type": "puback", "packet_id": 9}
    assert mc.decode_packet(mc.pingreq())[0] == {"type": "pingreq"}
    assert mc.decode_packet(mc.disconnect())[0] == {"type": "disconnect"}
    # stream reassembly: two packets concatenated, then a truncated third
    wire = mc.puback(1) + mc.pingresp()
    p1, n1 = mc.decode_packet(wire)
    p2, n2 = mc.decode_packet(wire, n1)
    assert (p1["type"], p2["type"], n2) == ("puback", "pingresp", len(wire))
    assert mc.decode_packet(mc.publish("t", b"xyz")[:-2]) is None


def test_topic_matching_spec_4_7():
    # spec §4.7.1 examples
    assert mc.topic_matches("sport/tennis/player1/#",
                            "sport/tennis/player1")
    assert mc.topic_matches("sport/tennis/player1/#",
                            "sport/tennis/player1/ranking")
    assert not mc.topic_matches("sport/tennis/+", "sport/tennis/player1/score")
    assert mc.topic_matches("sport/+", "sport/")
    assert not mc.topic_matches("sport/+", "sport")
    assert mc.topic_matches("#", "a/b/c")
    assert mc.topic_matches("+/+", "a/b")
    # $-system topics are not matched by wildcard-leading filters (§4.7.2)
    assert not mc.topic_matches("#", "$SYS/broker")
    assert not mc.topic_matches("+/monitor", "$SYS/monitor")
    assert mc.topic_matches("$SYS/#", "$SYS/broker")
    with pytest.raises(ValueError):
        mc.topic_matches("a/#/b", "a/x/b")


# ------------------------------------------------------- broker loopback


def test_broker_pubsub_retain_and_auth():
    broker = MqttBroker(username="u", password="p")
    host, port = broker.address
    with pytest.raises(ConnectionRefusedError):
        MqttClient(host, port, username="u", password="wrong")

    got: list[dict] = []
    sub = MqttClient(host, port, client_id="sub", username="u", password="p",
                     on_message=got.append)
    sub.subscribe(["logs/#"])
    pub = MqttClient(host, port, client_id="pub", username="u", password="p")
    pub.publish("logs/app", b"m0")                      # qos 0
    pub.publish("logs/db/err", b"m1", qos=1)            # qos 1 → PUBACK
    pub.publish("metrics/cpu", b"nope")                 # filtered out
    pub.publish("logs/retained", b"keep", qos=1, retain=True)
    assert _wait(lambda: len(got) == 3)
    assert [(m["topic"], m["payload"]) for m in got] == [
        ("logs/app", b"m0"), ("logs/db/err", b"m1"),
        ("logs/retained", b"keep")]
    # a late subscriber receives the retained message with retain=True
    got2: list[dict] = []
    late = MqttClient(host, port, client_id="late", username="u",
                      password="p", on_message=got2.append)
    late.subscribe(["logs/retained"])
    assert _wait(lambda: len(got2) == 1)
    assert got2[0]["retain"] is True and got2[0]["payload"] == b"keep"
    for c in (sub, pub, late):
        c.close()
    broker.stop()


def test_subscriber_collector_spools(ray_session, tmp_path):
    broker = MqttBroker()
    host, port = broker.address
    col = MqttSubscriberCollector(str(tmp_path), host, port,
                                  topics=["events/+"])
    pub = MqttClient(host, port, client_id="pub")
    pub.publish("events/a", b"one", qos=1)
    pub.publish("events/b", b"two")
    pub.publish("events/a/deep", b"filtered-out")
    assert _wait(lambda: col.spool.pending() == 2)
    col.pause()
    pub.publish("events/a", b"dropped-while-paused", qos=1)
    time.sleep(0.2)
    col.resume()
    pub.publish("events/c", b"three", qos=1)
    assert _wait(lambda: col.spool.pending() == 3)
    pub.close()
    col.stop()
    broker.stop()
    ds, _ = drain_spool(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["source"])
    assert [(r["source"], r["topic"], r["qos"]) for r in rows] == [
        (b"one", "events/a", 0),   # broker forwards qos0 deliveries
        (b"three", "events/c", 0),
        (b"two", "events/b", 0)]
    assert all(r["retain"] is False and r["dup"] is False for r in rows)


# ---------------------------------------------------------------- the sink


def test_write_mqtt_templated_topic(ray_session, tmp_path):
    import ray.data as rd

    from node_shovel_ray.stages.sink_net import write_mqtt

    broker = MqttBroker()
    host, port = broker.address
    col = MqttSubscriberCollector(str(tmp_path), host, port, topics=["#"])
    ds = rd.from_items([
        {"payload": f"p{i}", "role": ["user", "agent"][i % 2]}
        for i in range(60)
    ])
    n = write_mqtt(ds, host, port, topic="out/{role}", batch_size=16)
    assert n == 60
    assert _wait(lambda: col.spool.pending() == 60)
    col.stop()
    broker.stop()
    rows, _ = drain_spool(str(tmp_path))
    got = sorted((r["topic"], r["source"]) for r in rows.take_all())
    want = sorted(
        (f"out/{['user', 'agent'][i % 2]}", f"p{i}".encode())
        for i in range(60))
    assert got == want
