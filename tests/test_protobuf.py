"""Protobuf wire codec + decoder/encoder stage tests, mirroring the
reference's tests/decoders/protobuf.js (plain, delimited, json modes over
tests/assets/test.proto: ``message Test { required string test = 1; }``)
plus scalar-type wire coverage."""

import json

import pyarrow as pa
import pytest

from node_shovel_ray.functions.proto_codec import (
    decode_message,
    encode_message,
    parse_proto,
)
from node_shovel_ray.stages.decode import (
    ProtobufDecoder,
    ProtobufEncoder,
    write_delimited,
)

TEST_PROTO = "message Test {\n\trequired string test = 1;\n}\n"

SCALARS_PROTO = """
syntax = "proto3";
message Everything {
  string s = 1;
  bytes b = 2;
  bool flag = 3;
  int32 i32 = 4;
  int64 i64 = 5;
  uint32 u32 = 6;
  uint64 u64 = 7;
  sint32 si32 = 8;
  sint64 si64 = 9;
  fixed32 f32 = 10;
  fixed64 f64 = 11;
  sfixed32 sf32 = 12;
  sfixed64 sf64 = 13;
  float fl = 14;
  double db = 15;
  repeated int32 xs = 16;
  Color color = 17;
  Inner inner = 18;
  enum Color { RED = 0; GREEN = 1; }
  message Inner { string note = 1; }
}
"""


def test_reference_golden_wire():
    # protobufjs Test.encode({test:'ok'}).finish() == 0a 02 6f 6b
    schema = parse_proto(TEST_PROTO)
    wire = encode_message(schema, "Test", {"test": "ok"})
    assert wire == bytes.fromhex("0a026f6b")
    assert decode_message(schema, "Test", wire) == {"test": "ok"}


def test_reference_delimited_wire():
    # encodeDelimited prefixes the varint body length
    schema = parse_proto(TEST_PROTO)
    body = encode_message(schema, "Test", {"test": "ok"})
    assert write_delimited([body]) == bytes.fromhex("040a026f6b")


def test_scalar_roundtrip_and_rendering():
    schema = parse_proto(SCALARS_PROTO)
    obj = {
        "s": "héllo", "b": "AQID",  # base64 of 01 02 03
        "flag": True, "i32": -5, "i64": "-6", "u32": 7, "u64": "8",
        "si32": -9, "si64": "-10", "f32": 11, "f64": "12",
        "sf32": -13, "sf64": "-14", "fl": 1.5, "db": -2.25,
        "xs": [1, -2, 3], "color": "GREEN", "inner": {"note": "n"},
    }
    wire = encode_message(schema, "Everything", obj)
    back = decode_message(schema, "Everything", wire)
    assert back == obj  # longs rendered as strings, bytes as base64, enum name


def test_packed_repeated_decode():
    # packed encoding of xs=[1,2,300]: tag16 wt2, len, varints
    schema = parse_proto(SCALARS_PROTO)
    # key = 16<<3|2 = 130 → two-byte varint 0x82 0x01
    payload = bytes([0x82, 0x01, 4, 1, 2, 0xAC, 0x02])
    assert decode_message(schema, "Everything", payload) == {"xs": [1, 2, 300]}


def test_unknown_tag_skipped():
    schema = parse_proto(TEST_PROTO)
    # field 9 varint 5, then field 1 'ok'
    wire = bytes([9 << 3 | 0, 5]) + bytes.fromhex("0a026f6b")
    assert decode_message(schema, "Test", wire) == {"test": "ok"}


def test_negative_int32_ten_byte_varint():
    schema = parse_proto(SCALARS_PROTO)
    wire = encode_message(schema, "Everything", {"i32": -1})
    assert decode_message(schema, "Everything", wire) == {"i32": -1}


def test_unknown_class_raises():
    schema = parse_proto(TEST_PROTO)
    with pytest.raises(KeyError):
        schema.lookup("Nope")


def test_decoder_stage_plain():
    schema_src = TEST_PROTO
    dec = ProtobufDecoder(schema_src, "Test")
    t = pa.table({"payload": pa.array([bytes.fromhex("0a026f6b"), b"\xff\xff"],
                                      pa.binary())})
    out = dec(t)
    assert out["decode_ok"].to_pylist() == [True, False]
    assert json.loads(out["content"].to_pylist()[0]) == {"test": "ok"}
    assert out["proto_class"].to_pylist()[0] == "Test"


def test_decoder_stage_delimited_flatmap():
    dec = ProtobufDecoder(TEST_PROTO, "Test", delimited=True)
    body1 = bytes.fromhex("0a026f6b")
    schema = parse_proto(TEST_PROTO)
    body2 = encode_message(schema, "Test", {"test": "two"})
    blob = write_delimited([body1, body2])
    t = pa.table({"payload": pa.array([blob], pa.binary())})
    out = dec(t)
    assert len(out) == 2
    assert [json.loads(c)["test"] for c in out["content"].to_pylist()] == ["ok", "two"]
    assert out["rec_idx"].to_pylist() == [0, 1]


def test_decoder_stage_json_mode():
    dec = ProtobufDecoder(TEST_PROTO, "Test", content_type="application/json")
    t = pa.table({"payload": pa.array([b'{"test": "ok"}'], pa.binary())})
    out = dec(t)
    assert json.loads(out["content"].to_pylist()[0]) == {"test": "ok"}


def test_encoder_stage_roundtrip():
    enc = ProtobufEncoder(TEST_PROTO, "Test")
    t = pa.table({"content": pa.array(['{"test": "ok"}'], pa.string())})
    out = enc(t)
    assert out["payload"].to_pylist()[0] == bytes.fromhex("0a026f6b")

    enc_d = ProtobufEncoder(TEST_PROTO, "Test", delimited=True)
    out_d = enc_d(t)
    assert out_d["payload"].to_pylist()[0] == bytes.fromhex("040a026f6b")


def test_yaml_registry_end_to_end(tmp_path):
    """Delimited decode through the YAML pipeline layer, with the .proto
    loaded from root_path/proto_path like the reference config."""
    import ray.data as rd

    from node_shovel_ray.pipelines.config import REGISTRY

    proto_file = tmp_path / "test.proto"
    proto_file.write_text(TEST_PROTO)
    factory = REGISTRY["decoder"]["protobuf"]
    stage = factory(
        {
            "class_name": "Test",
            "root_path": str(tmp_path),
            "proto_path": "test.proto",
            "delimited": True,
        }
    )
    schema = parse_proto(TEST_PROTO)
    blob = write_delimited(
        [encode_message(schema, "Test", {"test": f"r{i}"}) for i in range(3)]
    )
    ds = rd.from_arrow(pa.table({"payload": pa.array([blob], pa.binary())}))
    rows = stage(ds).to_pandas()
    assert len(rows) == 3
    assert [json.loads(c)["test"] for c in rows["content"]] == ["r0", "r1", "r2"]


def test_truncated_embedded_message_rejects():
    """ADVICE r2: a buffer cut inside a nested message must reject (EOFError)
    rather than decode partially with silently missing fields."""
    import pytest

    schema = parse_proto(
        "message Outer { Inner i = 1; message Inner { string s = 1; } }"
    )
    full = encode_message(schema, "Outer", {"i": {"s": "hello world"}})
    with pytest.raises(EOFError, match="truncated"):
        decode_message(schema, "Outer", full[:-4])


def test_packed_repeated_enum_decode():
    schema = parse_proto(
        "message M { repeated Color cs = 1;"
        " enum Color { RED = 0; GREEN = 1; BLUE = 2; } }"
    )
    packed = bytes([0x0A, 3, 0, 1, 2])
    unpacked = bytes([0x08, 0, 0x08, 1, 0x08, 2])
    want = {"cs": ["RED", "GREEN", "BLUE"]}
    assert decode_message(schema, "M", packed) == want
    assert decode_message(schema, "M", unpacked) == want
