"""Sequence packing (functions/packing.py): distributed ordered prefix sum
== a single-pass python cumsum, independent of block layout and id gaps."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from node_shovel_ray.functions.packing import pack_docs


def _canon(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_pack_docs_matches_cumsum(ray_session):
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(100_000, size=2000, replace=False))  # gappy ids
    toks = rng.integers(0, 900, size=2000)
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "n_tokens": pa.array(toks, pa.int64())}
    )
    got = _canon(pack_docs(rd.from_arrow(t), budget=512))
    off = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert got["offset"].tolist() == off.tolist()
    assert got["pack_id"].tolist() == (off // 512).tolist()
    # layout-independent (different block structure and bucket count)
    got2 = _canon(pack_docs(rd.from_arrow(t).repartition(23), budget=512, n_buckets=7))
    pd.testing.assert_frame_equal(got, got2)


def test_pack_docs_edges(ray_session):
    t = pa.table(
        {"doc_id": pa.array([5], pa.int64()), "n_tokens": pa.array([3], pa.int64())}
    )
    got = _canon(pack_docs(rd.from_arrow(t), budget=2))
    assert got["offset"].tolist() == [0] and got["pack_id"].tolist() == [0]
    with pytest.raises(ValueError):
        pack_docs(rd.from_arrow(t), budget=0)
