"""Generic distributed hash join (stages/join.py): union-then-bucket, one
keyed exchange, per-bucket merge — python-oracled against pd.merge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from node_shovel_ray.stages.join import hash_join


def _sides():
    left = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "user_id": pa.array([i % 7 for i in range(20)], pa.int64()),
        }
    )
    right = pa.table(
        {
            "c_custkey": pa.array([0, 1, 2, 3, 9], pa.int64()),
            "seg": pa.array(["a", "b", "c", "d", "z"]),
        }
    )
    return left, right


def _canon(df):
    return df.sort_values(["event_id"]).reset_index(drop=True)


def test_inner_join_matches_pandas(ray_session):
    left, right = _sides()
    got = _canon(
        hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="user_id", right_on="c_custkey",
        ).to_pandas()
    )
    want = _canon(
        left.to_pandas().merge(
            right.to_pandas().rename(columns={"c_custkey": "user_id"}),
            on="user_id", how="inner",
        )
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert set(got["user_id"]) == {0, 1, 2, 3}  # keys 4-6 unmatched, 9 probe-less


def test_left_join_keeps_unmatched(ray_session):
    left, right = _sides()
    got = _canon(
        hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="user_id", right_on="c_custkey", how="left",
        ).to_pandas()
    )
    assert len(got) == 20
    assert got[got["user_id"] >= 4]["seg"].isna().all()
    assert (got[got["user_id"] < 4]["seg"].notna()).all()


def test_join_layout_independent(ray_session):
    left, right = _sides()
    a = _canon(
        hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="user_id", right_on="c_custkey",
        ).to_pandas()
    )
    b = _canon(
        hash_join(
            rd.from_arrow(left).repartition(7), rd.from_arrow(right).repartition(3),
            left_on="user_id", right_on="c_custkey", num_blocks=5,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_outer_and_right_join(ray_session):
    left, right = _sides()
    got = hash_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="user_id", right_on="c_custkey", how="outer",
    ).to_pandas()
    # all 20 left rows + the probe-less right key 9
    assert len(got) == 21
    orphan = got[got["user_id"] == 9]
    assert len(orphan) == 1 and orphan["seg"].iloc[0] == "z"
    assert orphan["event_id"].isna().all()
    r = hash_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="user_id", right_on="c_custkey", how="right",
    ).to_pandas()
    # right join: every matching (event, cust) pair + the orphan key 9
    assert set(r["user_id"]) == {0, 1, 2, 3, 9}
    assert len(r) == len(got[got["user_id"] <= 3]) + 1


def test_join_rejects_column_clash_and_bad_how(ray_session):
    left, right = _sides()
    with pytest.raises(ValueError, match="how"):
        hash_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_on="user_id", right_on="c_custkey", how="cross",
        )
    clash = rd.from_arrow(
        pa.table({"c_custkey": pa.array([1], pa.int64()),
                  "event_id": pa.array([9], pa.int64())})
    )
    with pytest.raises(ValueError, match="overlapping"):
        hash_join(rd.from_arrow(left), clash, left_on="user_id", right_on="c_custkey")


def test_left_join_uniform_schema_across_buckets(ray_session):
    """ADVICE r3: per-bucket dtype narrowing made output schema depend on
    which bucket a row hashed into (matched-only buckets emitted int64,
    mixed buckets float64). Every block must now carry ONE Arrow schema:
    the declared input types, nullable."""
    left = pa.table(
        {
            "k": pa.array(range(40), pa.int64()),
            "lv": pa.array(range(40), pa.int64()),
        }
    )
    # right misses half the keys → many buckets mix matched/unmatched rows
    right = pa.table(
        {
            "k": pa.array(range(0, 40, 2), pa.int64()),
            "rv": pa.array(range(20), pa.int64()),
            "rb": pa.array([i % 2 == 0 for i in range(20)]),
        }
    )
    out = hash_join(
        rd.from_arrow(left), rd.from_arrow(right), left_on="k", how="left",
        num_blocks=8,
    )
    schemas = {
        str(b.schema) for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
    }
    assert len(schemas) == 1
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["rv"] == pa.int64() and types["rb"] == pa.bool_()
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["rv"].isna().sum() == 20 and df["rb"].isna().sum() == 20
    matched = df[df["k"] % 2 == 0]
    assert (matched["rv"].to_numpy() == matched["k"].to_numpy() // 2).all()
