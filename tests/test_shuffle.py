"""Deterministic seeded corpus shuffle (functions/shuffle.py)."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.shuffle import deterministic_shuffle


def _ranks(ds, **kw):
    return {
        r["doc_id"]: r["shuffle_rank"]
        for r in deterministic_shuffle(ds, **kw).take_all()
    }


def test_permutation_and_layout_independence():
    ids = pa.table({"doc_id": pa.array(list(range(700)), pa.int64())})
    a = _ranks(rd.from_arrow(ids))
    assert sorted(a.values()) == list(range(700))  # a true permutation
    b = _ranks(rd.from_arrow(ids).repartition(13))  # layout must not matter
    assert a == b


def test_seed_changes_order_but_stays_deterministic():
    ids = pa.table({"doc_id": pa.array(list(range(300)), pa.int64())})
    a = _ranks(rd.from_arrow(ids), seed="shuf42")
    a2 = _ranks(rd.from_arrow(ids), seed="shuf42")
    c = _ranks(rd.from_arrow(ids), seed="other")
    assert a == a2
    assert a != c and sorted(c.values()) == list(range(300))
