"""msgpack codec tests, mirroring the reference's decoder/encoder tests
(tests/decoders/msgpack.js, tests/encoders/msgpack.js pack {test: 'ok'})
plus spec-level golden vectors and round-trip properties."""

import math

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from node_shovel_ray.functions.msgpack_codec import ExtType, packb, unpackb
from node_shovel_ray.stages.decode import decode_msgpack
from node_shovel_ray.stages.encode import encode_msgpack


def test_reference_golden_map():
    # msgpackr pack({test:'ok'}) == 81 a4 t e s t a2 o k
    b = packb({"test": "ok"})
    assert b == bytes.fromhex("81a474657374a26f6b")
    assert unpackb(b) == {"test": "ok"}


@pytest.mark.parametrize(
    "value,wire",
    [
        (None, "c0"),
        (True, "c3"),
        (False, "c2"),
        (0, "00"),
        (127, "7f"),
        (-1, "ff"),
        (-32, "e0"),
        (128, "cc80"),
        (256, "cd0100"),
        (65536, "ce00010000"),
        (2**32, "cf0000000100000000"),
        (-33, "d0df"),
        (-129, "d1ff7f"),
        (-32769, "d2ffff7fff"),
        (-(2**31) - 1, "d3ffffffff7fffffff"),
        (1.5, "cb3ff8000000000000"),
        ("", "a0"),
        ("a", "a161"),
        (b"\x01\x02", "c40201 02".replace(" ", "")),
        ([], "90"),
        ([1, "x"], "9201a178"),
        ({}, "80"),
    ],
)
def test_spec_golden(value, wire):
    assert packb(value) == bytes.fromhex(wire)
    assert unpackb(bytes.fromhex(wire)) == value


def test_long_forms():
    s = "x" * 300
    assert unpackb(packb(s)) == s
    arr = list(range(70000))
    assert unpackb(packb(arr)) == arr
    m = {f"k{i}": i for i in range(20)}
    assert unpackb(packb(m)) == m
    blob = b"\x00" * 70000
    assert unpackb(packb(blob)) == blob


def test_float32_and_ext_decode():
    # float32 decode (we always pack float64, but must read both)
    assert unpackb(bytes.fromhex("ca3fc00000")) == 1.5
    # fixext / ext round-trip
    for data in (b"\x01", b"\x01\x02\x03", b"z" * 300):
        e = ExtType(5, data)
        assert unpackb(packb(e)) == e


def test_errors():
    with pytest.raises(ValueError):
        unpackb(bytes.fromhex("81a474"))  # truncated
    with pytest.raises(ValueError):
        unpackb(bytes.fromhex("c000"))  # trailing bytes
    with pytest.raises(ValueError):
        unpackb(bytes.fromhex("c1"))  # reserved byte
    with pytest.raises(TypeError):
        packb(object())
    with pytest.raises(OverflowError):
        packb(2**64)


json_vals = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=40),
    lambda inner: st.lists(inner, max_size=5)
    | st.dictionaries(st.text(max_size=10), inner, max_size=5),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(json_vals)
def test_roundtrip_property(v):
    assert unpackb(packb(v)) == v


def test_nan_roundtrip():
    out = unpackb(packb(float("nan")))
    assert math.isnan(out)


def test_batch_stages_roundtrip():
    rows = [{"test": "ok"}, {"n": 3, "xs": [1, 2]}, {"s": None}]
    t = pa.table({"payload": pa.array([packb(r) for r in rows], pa.binary())})
    dec = decode_msgpack(t)
    assert dec["decode_ok"].to_pylist() == [True, True, True]
    assert dec["content"].to_pylist()[0] == '{"test":"ok"}'

    src = pa.table({"test": ["ok"]})
    enc = encode_msgpack(src)
    assert enc["payload"].to_pylist()[0] == bytes.fromhex("81a474657374a26f6b")


def test_decode_flags_bad_rows():
    t = pa.table(
        {"payload": pa.array([packb({"a": 1}), b"\xc1", None], pa.binary())}
    )
    dec = decode_msgpack(t)
    assert dec["decode_ok"].to_pylist() == [True, False, False]


def test_truncated_payloads_flag_not_crash():
    """Truncated float/ext/str payloads must set decode_ok=false, never
    raise out of the batch."""
    bad = [
        bytes([0xCB, 0, 0]),          # truncated float64
        bytes([0xCA, 0]),             # truncated float32
        bytes([0xD6, 1]),             # fixext4 missing body
        bytes([0xC7, 5, 1, 0, 0]),    # ext8 short body
        bytes([0xD9, 10, 0x61]),      # str8 short body
        bytes([0xC4, 4, 0x00]),       # bin8 short body
    ]
    t = pa.table({"payload": pa.array(bad + [packb({"k": 1})], pa.binary())})
    out = decode_msgpack(t)
    assert out["decode_ok"].to_pylist() == [False] * len(bad) + [True]
