import pandas as pd
import pyarrow as pa

import ray.data as rd

from node_shovel_ray import schema as S
from node_shovel_ray.stages.parse import parse, parse_batch

from _oracle import parse_row


def _mk(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array(["c"] * n),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=S.TRANSCRIPTS,
    )


# FIXTURES.md §6 golden pairs — each §1.1 grammar case incl. hostile rows
GOLDEN = [
    ("plain words only", (None, None, None, True)),
    ('x <tool:bash args="k=1">call</tool> y', ("bash", None, None, True)),
    ("oops ERR-0042 happened", (None, "ERR-0042", None, True)),
    ("[role=assistant] hi", (None, None, "assistant", True)),
    (
        '[role=tool] go <tool:http args="u=2">call</tool> ERR-9999',
        ("http", "ERR-9999", "tool", True),
    ),
    ('broken <tool:broken args="oops>', (None, None, None, False)),  # unclosed
    ("line one\nline two", (None, None, None, False)),  # embedded newline
    ("non-ascii é中文 ]] [[", (None, None, None, True)),  # parses fine
    ("ERR-12 too short ERR-123", (None, None, None, True)),  # no 4-digit code
    ("[role=x1] bad tag", (None, None, None, True)),  # tag not [a-z]+
]


def test_golden_pairs():
    out = parse_batch(_mk([t for t, _ in GOLDEN]))
    for i, (text, (tool, err, rtag, ok)) in enumerate(GOLDEN):
        assert out["parsed_tool"][i].as_py() == tool, text
        assert out["error_code"][i].as_py() == err, text
        assert out["role_tag"][i].as_py() == rtag, text
        assert out["parse_ok"][i].as_py() == ok, text


def test_parse_matches_python_oracle(tiny_tables):
    t, _ = tiny_tables
    out = parse(rd.from_arrow(t)).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = pd.DataFrame([parse_row(x) for x in df["text"]])
    assert out["parse_ok"].tolist() == oracle["parse_ok"].tolist()
    assert out["parsed_tool"].where(out["parsed_tool"].notna(), None).tolist() == \
        oracle["parsed_tool"].tolist()
    assert out["error_code"].where(out["error_code"].notna(), None).tolist() == \
        oracle["error_code"].tolist()
    assert out["role_tag"].where(out["role_tag"].notna(), None).tolist() == \
        oracle["role_tag"].tolist()
    # built-in cross-check: parsed_tool equals the tool column when present
    mask = out["tool"] != ""
    assert (out.loc[mask, "parsed_tool"] == out.loc[mask, "tool"]).all()


def test_hostile_rows_never_fail_batch(tiny_tables):
    t, _ = tiny_tables
    out = parse_batch(t)
    assert len(out) == len(t)
    bad = out.to_pandas().query("~parse_ok")
    assert len(bad) > 0  # the 1% hostile rows are present and flagged
    assert bad["parsed_tool"].isna().all()
