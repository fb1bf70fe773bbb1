"""Operator conformance via golden in/out pairs — the reference's
testDecoder pattern (tests/utils.js:9-69) over batches instead of messages."""

import pyarrow as pa
import pytest

from node_shovel_ray.stages.decode import (
    ProtobufDecoder,
    decode_base64,
    decode_csv,
    decode_json,
    decode_msgpack,
    group_multiline,
    json_field,
)


def _t(texts, col="text"):
    return pa.table({col: pa.array(texts, pa.string())})


def test_decode_json_roundtrip():
    # mirrors tests/decoders/json.js:6-12
    out = decode_json(_t(['{"b":2,"a":1}', "not json", None]))
    assert out["content"][0].as_py() == '{"a":1,"b":2}'
    assert out["decode_ok"].to_pylist() == [True, False, False]
    assert out["content"][1].as_py() is None


def test_decode_json5ish():
    # mirrors tests/decoders/json5.js semantics (single quotes, trailing comma)
    out = decode_json(_t(["{'a': 1, 'b': 'x',}"]), lenient=True)
    assert out["decode_ok"][0].as_py() is True
    assert out["content"][0].as_py() == '{"a":1,"b":"x"}'


def test_json_field():
    out = json_field(_t(['{"k": 87}', "junk"]), "text", "k", "k_out")
    assert out["k_out"].to_pylist() == ["87", None]


def test_decode_csv_named_columns():
    # mirrors src/decoders/csv.js:32-52 single-record semantics
    out = decode_csv(_t(['a,"b,c",3', "x,y,z", "only,two"]),
                     columns=["c1", "c2", "c3"])
    assert out["c1"].to_pylist() == ["a", "x", None]
    assert out["c2"].to_pylist() == ["b,c", "y", None]
    assert out["decode_ok"].to_pylist() == [True, True, False]


def test_decode_base64():
    # mirrors tests/decoders/base64 golden pair
    import base64

    good = base64.b64encode("hello shovel".encode()).decode()
    out = decode_base64(_t([good, "!!!notb64"]))
    assert out["content"].to_pylist() == ["hello shovel", None]
    assert out["decode_ok"].to_pylist() == [True, False]


def test_decode_msgpack_gated():
    try:
        import msgpack  # noqa: F401

        has = True
    except ImportError:
        has = False
    if not has:
        with pytest.raises(NotImplementedError):
            decode_msgpack(pa.table({"payload": pa.array([b"x"], pa.binary())}))


def test_group_multiline():
    # mirrors src/decoders/multiline.js flush-on-blank contract
    out = group_multiline(_t(["a", "b", "", "c", "", "", "d", "e"]))
    assert out["text"].to_pylist() == ["a\nb", "c", "d\ne"]


def test_delimited_roundtrip():
    # the protobuf delimited mode's real framing (src/decoders/protobuf.js:111-140)
    from node_shovel_ray.stages.decode import split_delimited, write_delimited

    recs = [b"hello", b"", b"x" * 300, b"\x00\x01\x02"]
    blob = write_delimited(recs)
    out = split_delimited(
        pa.table({"payload": pa.array([blob, None], pa.binary())})
    )
    assert out["record"].to_pylist() == recs
    assert out["ok"].to_pylist() == [True] * 4
    assert out["rec_idx"].to_pylist() == [0, 1, 2, 3]


def test_delimited_truncated_tail_flagged():
    from node_shovel_ray.stages.decode import split_delimited, write_delimited

    blob = write_delimited([b"good"]) + b"\x0aonly-part"  # claims 10, has 9
    out = split_delimited(pa.table({"payload": pa.array([blob], pa.binary())}))
    assert out["ok"].to_pylist() == [True, False]
    assert out["record"][0].as_py() == b"good"


def test_protobuf_decoder_is_real_now():
    # wire decode implemented in round 2 (see tests/test_protobuf.py);
    # unknown class still fails fast at construction like onStart
    dec = ProtobufDecoder("message T { int32 a = 1; }", "T")
    out = dec(pa.table({"payload": pa.array([bytes([8, 5])], pa.binary())}))
    assert out["content"].to_pylist() == ['{"a":5}']
    with pytest.raises(KeyError):
        ProtobufDecoder("message T { int32 a = 1; }", "Nope")


def test_json5_full_grammar():
    """Full JSON5 cases the reference's json5 lib accepts
    (tests/decoders/json5.js round-trips JSON5.stringify output:
    unquoted keys + single quotes)."""
    from node_shovel_ray.functions.json5 import parse

    # the reference test vector: JSON5.stringify({test:'ok'}) == "{test:'ok'}"
    assert parse("{test:'ok'}") == {"test": "ok"}
    assert parse("""
        // line comment
        {
          unquoted: 1,          /* block comment */
          $id_: 'single',
          "double": [1, 2, 3,],  // trailing comma
          hex: 0xFF,
          lead: .5,
          trail: 5.,
          plus: +3,
          inf: Infinity,
          neg: -Infinity,
          cont: 'a\\
b',
        }
    """) == {
        "unquoted": 1, "$id_": "single", "double": [1, 2, 3],
        "hex": 255, "lead": 0.5, "trail": 5.0, "plus": 3,
        "inf": float("inf"), "neg": float("-inf"), "cont": "ab",
    }
    import math
    assert math.isnan(parse("NaN"))
    assert parse('"\\u0041\\x42"') == "AB"

    import pytest
    for bad in ("{test:'ok'} x", "{a:1", "'unterminated", "{1:2}", "/*", "[1 2]"):
        with pytest.raises(ValueError):
            parse(bad)


def test_decode_json5_lenient_batch():
    import pyarrow as pa

    from node_shovel_ray.stages.decode import decode_json

    t = pa.table({"text": ["{test:'ok', n:0x10,}", "// only comment", "{a:1}"]})
    out = decode_json(t, lenient=True)
    assert out["decode_ok"].to_pylist() == [True, False, True]
    assert out["content"].to_pylist()[0] == '{"n":16,"test":"ok"}'
