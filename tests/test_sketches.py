"""HyperLogLog sketch tests: accuracy vs exact, mergeability, determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.sketches import (
    approx_count_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(7)
    for true_n in (10, 500, 20_000, 300_000):
        vals = rng.integers(0, 10**12, size=true_n)
        est = hll_estimate(hll_registers(vals, p=12))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10**9, size=5000)
    b = rng.integers(0, 10**9, size=5000)
    merged = hll_merge(hll_registers(a), hll_registers(b))
    est_union = hll_estimate(merged)
    true_union = len(set(a) | set(b))
    assert abs(est_union - true_union) / true_union < 0.05
    # determinism: same input → byte-identical registers
    assert hll_registers(a).tobytes() == hll_registers(a).tobytes()


def test_approx_count_distinct_dataset(ray_session):
    rng = np.random.default_rng(11)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": np.where(rng.random(n) < 0.5, "x", "y"),
            "v": rng.integers(0, 5000, size=n),
        }
    )
    ds = rd.from_pandas(df).repartition(6)  # force multi-block merge path
    got = (
        approx_count_distinct(ds, "g", "v", p=12)
        .to_pandas()
        .set_index("g")["approx_n_distinct"]
    )
    for g, sub in df.groupby("g"):
        true_n = sub["v"].nunique()
        assert abs(got[g] - true_n) / true_n < 0.05
