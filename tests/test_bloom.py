"""Bloom-filter pre-filter (functions/bloom.py) and the composed
huge-blocklist decontamination variant (pipelines/corpus.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.bloom import (
    bloom_build,
    bloom_from_datasets,
    bloom_query,
    default_hash64 as _hash,
)


def test_members_always_hit_nonmembers_mostly_miss():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    others = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bf = bloom_build(members, bits_per_key=12, k=8)
    assert bloom_query(bf, members).all()  # no false negatives, ever
    fp = bloom_query(bf, others).mean()
    assert fp < 0.02  # ~0.3% theoretical at 12 bits/key, k=8


def test_empty_and_zero_key_edge_cases():
    bf = bloom_build(np.array([], dtype=np.uint64))
    assert not bloom_query(bf, np.array([1, 2, 3], dtype=np.uint64)).any()
    assert bloom_query(bf, np.array([], dtype=np.uint64)).shape == (0,)
    bf0 = bloom_build(np.array([0], dtype=np.uint64))
    assert bloom_query(bf0, np.array([0], dtype=np.uint64)).all()


def test_distributed_build_matches_local():
    strs = np.array([f"doc {i} text" for i in range(2000)], dtype=object)
    local = bloom_build(_hash(strs), bits_per_key=12, k=8)
    ds = rd.from_arrow(pa.table({"tn": pa.array(list(strs) + [None])}))
    dist = bloom_from_datasets(
        ds.repartition(7), "tn", n_keys=2000, hash_fn=_hash,
        bits_per_key=12, k=8,
    )
    assert dist.m == local.m and dist.k == local.k
    assert np.array_equal(dist.bits, local.bits)  # nulls contribute nothing


def test_bloom_decontaminate_matches_plain():
    from node_shovel_ray.pipelines import corpus

    sf_dir = "/root/testdata/sf0.001"
    plain = sorted(
        r["doc_id"] for r in corpus.decontaminate_docs(sf_dir).take_all()
    )
    bloom = sorted(
        r["doc_id"] for r in corpus.decontaminate_bloom_docs(sf_dir).take_all()
    )
    assert bloom == plain and len(plain) > 0
