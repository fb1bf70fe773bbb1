import glob
import json
import os

import pyarrow as pa

import ray.data as rd

from node_shovel_ray.sources.jsonl import encode_jsonl, write_jsonl


def _batch():
    return pa.table(
        {
            "conv_id": pa.array(['he said "hi"\n', "plain", None]),
            "n": pa.array([1, None, 3], pa.int64()),
            "ok": pa.array([True, False, None]),
            "ts": pa.array([1735693200000000, None, 0], pa.timestamp("us")),
        }
    )


def test_encode_jsonl_roundtrip():
    lines = encode_jsonl(_batch()).to_pylist()
    objs = [json.loads(ln) for ln in lines]
    assert objs[0] == {
        "conv_id": 'he said "hi"\n', "n": 1, "ok": True,
        "ts": "2025-01-01T01:00:00",
    }
    assert objs[1] == {"conv_id": "plain", "n": None, "ok": False, "ts": None}
    assert objs[2]["conv_id"] is None and objs[2]["n"] == 3


def test_write_jsonl(tmp_path):
    ds = rd.from_arrow(_batch())
    n = write_jsonl(ds, str(tmp_path / "out"))
    assert n == 3
    rows = []
    for f in glob.glob(str(tmp_path / "out" / "part-*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(x) for x in fh]
    assert len(rows) == 3
    # idempotent re-run: same deterministic filenames, same row count
    n2 = write_jsonl(rd.from_arrow(_batch()), str(tmp_path / "out"))
    assert n2 == 3
    assert len(glob.glob(str(tmp_path / "out" / "part-*.jsonl"))) == len(
        {f for f in os.listdir(tmp_path / "out")}
    )
