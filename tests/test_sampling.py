"""Deterministic sampling operators (functions/sampling.py): membership is
a pure function of the ids — stable across re-runs, block layouts, and
(for md5) reproducible by the SQL oracle."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.sampling import (
    fraction_threshold,
    sample_fraction,
    sample_per_group,
    sample_topn,
)


def _docs(n=200):
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
        }
    )


def test_fraction_threshold_edges():
    import pytest

    assert fraction_threshold(0.0) == 0
    assert fraction_threshold(1.0) == 1 << 64
    assert 0 < fraction_threshold(0.5) < (1 << 64)
    with pytest.raises(ValueError):
        fraction_threshold(1.5)


def test_sample_fraction_deterministic_and_plausible(ray_session):
    t = _docs(1000)
    a = sorted(sample_fraction(rd.from_arrow(t), 0.3, "doc_id").to_pandas()["doc_id"])
    b = sorted(sample_fraction(rd.from_arrow(t), 0.3, "doc_id").to_pandas()["doc_id"])
    assert a == b  # rerun-stable
    assert 0.2 < len(a) / 1000 < 0.4  # ~Bernoulli(0.3)
    # p=1 keeps everything, p=0 nothing
    assert sample_fraction(rd.from_arrow(t), 1.0, "doc_id").count() == 1000
    assert sample_fraction(rd.from_arrow(t), 0.0, "doc_id").count() == 0
    # monotone: the p=0.1 sample is a subset of the p=0.3 sample
    small = set(
        sample_fraction(rd.from_arrow(t), 0.1, "doc_id").to_pandas()["doc_id"]
    )
    assert small <= set(a)


def test_assign_split_deterministic_and_proportional(ray_session):
    import pytest

    from node_shovel_ray.functions.sampling import assign_split, split_cutoffs

    t = _docs(5000)
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = assign_split(rd.from_arrow(t), fr, id_col="doc_id").to_pandas()
    b = assign_split(rd.from_arrow(t).repartition(13), fr, id_col="doc_id").to_pandas()
    # layout/order independent: same assignment per id
    ma = dict(zip(a["doc_id"], a["split"]))
    mb = dict(zip(b["doc_id"], b["split"]))
    assert ma == mb
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac["val"] - 0.05) < 0.02 and abs(frac["test"] - 0.05) < 0.02
    with pytest.raises(ValueError, match="sum to 1"):
        split_cutoffs({"a": 0.5, "b": 0.3})


def test_mixture_sample_rates_and_monotonicity(ray_session):
    from node_shovel_ray.functions.sampling import mixture_sample

    n = 3000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "src": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    rates = {"s0": 1.0, "s1": 0.5}
    got = mixture_sample(
        rd.from_arrow(t), rates, group_col="src", id_col="doc_id", default_rate=0.0
    ).to_pandas()
    per = got.groupby("src").size()
    assert per["s0"] == n // 3                 # keep-all
    assert abs(per["s1"] / (n // 3) - 0.5) < 0.07
    assert "s2" not in per.index               # default 0 drops
    # monotone: halving a rate yields a subset
    lo = mixture_sample(
        rd.from_arrow(t), {"s1": 0.25}, group_col="src", id_col="doc_id"
    ).to_pandas()
    hi_ids = set(got[got["src"] == "s1"]["doc_id"])
    assert set(lo["doc_id"]) <= hi_ids
    # ADVICE r4: an absent group must not float64 the cutoff Series —
    # default_rate=1.0 (the exact 2⁶⁴ sentinel) keeps EVERY absent-group
    # row even though 2⁶⁴ survives a float round-trip only by accident
    all_s2 = mixture_sample(
        rd.from_arrow(t), {"s0": 0.5}, group_col="src", id_col="doc_id",
        default_rate=1.0,
    ).to_pandas()
    assert (all_s2.groupby("src").size()[["s1", "s2"]] == n // 3).all()


def test_sample_topn_exact_size_and_layout_independent(ray_session):
    t = _docs(300)
    one_block = sample_topn(rd.from_arrow(t), n=40, id_col="doc_id").to_pandas()
    many = sample_topn(
        rd.from_arrow(t).repartition(13), n=40, id_col="doc_id"
    ).to_pandas()
    a = one_block.sort_values("doc_id").reset_index(drop=True)
    b = many.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # membership independent of block layout
    assert len(a) == 40  # EXACT size, not binomial
    # python oracle: the 40 smallest (md5 >> 1, id)
    from node_shovel_ray.functions.sketches import md5_lower64

    df = t.to_pandas()
    df["_h"] = md5_lower64(df["doc_id"].to_numpy()) >> np.uint64(1)
    want = df.sort_values(["_h", "doc_id"]).head(40)
    assert set(a["doc_id"]) == set(want["doc_id"])


def test_sample_per_group_layout_independent(ray_session):
    t = _docs(300)
    one_block = sample_per_group(
        rd.from_arrow(t), "lang", k=10, id_col="doc_id"
    ).to_pandas()
    many_blocks = sample_per_group(
        rd.from_arrow(t).repartition(13), "lang", k=10, id_col="doc_id"
    ).to_pandas()
    a = one_block.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = many_blocks.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)  # membership independent of block layout
    assert (a.groupby("lang").size() == 10).all()
    # python oracle: k smallest (md5, id) per group
    from node_shovel_ray.functions.sketches import md5_lower64

    df = t.to_pandas()
    df["_h"] = md5_lower64(df["doc_id"].to_numpy())
    want = (
        df.sort_values(["_h", "doc_id"]).groupby("lang", sort=False).head(10)
    )
    assert set(zip(a["lang"], a["doc_id"])) == set(zip(want["lang"], want["doc_id"]))
