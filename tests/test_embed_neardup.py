import numpy as np
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.similarity import (
    cosine_pairs_bruteforce,
    cosine_pairs_lsh,
    _norm,
)


def _planted_corpus(n=120, d=32, seed=7):
    """Random vectors + 6 planted near-dup pairs (ids 100..111)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    for i in range(6):
        a, b = 100 + 2 * i, 101 + 2 * i
        m[b] = m[a] + 0.05 * rng.standard_normal(d)  # cos ≈ 0.999
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.astype(np.float32) for row in m],
                                  pa.list_(pa.float32())),
        }
    ), m


def _true_pairs(m, threshold):
    mn = _norm(m.astype(np.float64))
    S = mn @ mn.T
    out = set()
    n = len(m)
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                out.add((i, j))
    return out


def test_bruteforce_exact():
    t, m = _planted_corpus()
    got = cosine_pairs_bruteforce(rd.from_arrow(t), threshold=0.9,
                                  concurrency=(1, 2)).to_pandas()
    assert {tuple(p) for p in zip(got["vec_a"], got["vec_b"])} == _true_pairs(m, 0.9)


def test_lsh_recalls_planted_dups():
    t, m = _planted_corpus()
    got = cosine_pairs_lsh(rd.from_arrow(t), threshold=0.9,
                           concurrency=(1, 2)).to_pandas()
    found = {tuple(p) for p in zip(got["vec_a"], got["vec_b"])}
    true = _true_pairs(m, 0.9)
    # planted near-identical pairs collide in some table with prob ~1
    assert len(found & true) >= 5  # ≥5 of 6 planted pairs
    assert found <= true  # verification step: no false positives
