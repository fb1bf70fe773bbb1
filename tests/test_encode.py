"""Encoder golden pairs — the reference's testEncoder pattern
(tests/utils.js:9-69); template date tokens per src/core/utils.js:45-67."""

import pyarrow as pa
import pytest

from node_shovel_ray.functions.template import render_template, translate
from node_shovel_ray.stages.encode import (
    encode_base64,
    encode_csv,
    encode_format,
    encode_json,
)


def _batch():
    return pa.table(
        {
            "conv_id": pa.array(["conv-1", "conv-2"]),
            "n": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1735693200000000, 1737000000000000], pa.timestamp("us")
            ),  # 2025-01-01 01:00:00, 2025-01-16...
        }
    )


def test_encode_json():
    out = encode_json(_batch(), columns=["conv_id", "n"])
    assert out["payload"][0].as_py() == '{"conv_id":"conv-1","n":1}'


def test_encode_csv():
    out = encode_csv(_batch(), columns=["conv_id", "n"])
    assert out["payload"].to_pylist() == ["conv-1,1", "conv-2,2"]


def test_encode_base64():
    import base64

    out = encode_base64(_batch(), "conv_id")
    assert out["payload"][0].as_py() == base64.b64encode(b"conv-1").decode()


def test_encode_format_date_tokens():
    # audit-{YYYY}-{MM} — the templated ES index-name idiom
    # (src/outputs/elasticsearch.js:203-211)
    out = encode_format(_batch(), "audit-{YYYY}-{MM}")
    assert out["payload"][0].as_py() == "audit-2025-01"
    out2 = encode_format(_batch(), "{conv_id}/{YYYY}-{MM}-{DD}T{HH}:{mm}:{ss}")
    assert out2["payload"][0].as_py() == "conv-1/2025-01-01T01:00:00"


def test_format_nopad_and_epoch_tokens():
    out = render_template(_batch(), "{M}/{D} {H}h @{T}")
    assert out[0].as_py() == "1/1 1h @1735693200"


def test_format_unknown_token_raises():
    with pytest.raises(KeyError):
        render_template(_batch(), "{nope}")


def test_translate():
    # src/core/utils.js:74-76 dictionary lookup with default
    arr = pa.array(["a", "b", "zz"])
    out = translate(arr, {"a": "1", "b": "2"}, default="?")
    assert out.to_pylist() == ["1", "2", "?"]
