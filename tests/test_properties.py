"""Property-based tests (hypothesis) — the reference has none (SURVEY.md §5);
these harden the row-level contracts against arbitrary input."""

import json

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from node_shovel_ray.sources.jsonl import encode_jsonl
from node_shovel_ray.stages.parse import parse_batch

from _oracle import parse_row

texts = st.lists(
    st.one_of(st.none(), st.text(max_size=200)), min_size=1, max_size=20
)


def _mk(vals):
    n = len(vals)
    return pa.table(
        {
            "conv_id": pa.array(["c"] * n),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(vals, pa.string()),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


@settings(max_examples=60, deadline=None)
@given(texts)
def test_parse_never_throws_and_matches_oracle(vals):
    out = parse_batch(_mk(vals))
    assert len(out) == len(vals)
    for i, v in enumerate(vals):
        if v is None:
            # null text → reject (engine contract; oracle never sees nulls)
            assert out["parse_ok"][i].as_py() is False
            assert out["parsed_tool"][i].as_py() is None
            continue
        want = parse_row(v)
        assert out["parse_ok"][i].as_py() == want["parse_ok"], v
        if not want["parse_ok"]:
            assert out["parsed_tool"][i].as_py() is None
            assert out["error_code"][i].as_py() is None
        else:
            assert out["parsed_tool"][i].as_py() == want["parsed_tool"], v
            assert out["error_code"][i].as_py() == want["error_code"], v


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=100), min_size=1, max_size=10),
       st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=10))
def test_jsonl_roundtrip_any_strings(strs, ints):
    n = min(len(strs), len(ints))
    batch = pa.table(
        {
            "s": pa.array(strs[:n], pa.string()),
            "i": pa.array(ints[:n], pa.int64()),
        }
    )
    lines = encode_jsonl(batch).to_pylist()
    for j, ln in enumerate(lines):
        obj = json.loads(ln)
        assert obj["s"] == strs[j]
        assert obj["i"] == ints[j]
