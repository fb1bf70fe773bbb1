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


def test_grouped_hist_quantile_bound_and_layout(ray_session):
    """Histogram-sketch quantile: within bin_width of the exact quantile,
    and independent of block layout (mergeable partials)."""
    import pyarrow as pa

    import ray.data as rd

    from node_shovel_ray.functions.sketches import grouped_hist_quantile

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(10, 2, 5000), rng.normal(50, 5, 5000)])
    grp = ["a"] * 5000 + ["b"] * 5000
    t = pa.table({"g": pa.array(grp), "v": pa.array(vals, pa.float64())})
    for w in (0.1, 1.0):
        got = (
            grouped_hist_quantile(rd.from_arrow(t), "g", "v", q=0.5, bin_width=w)
            .to_pandas().set_index("g")["approx_q"]
        )
        for g in ("a", "b"):
            exact = np.quantile(vals[:5000] if g == "a" else vals[5000:], 0.5)
            assert abs(got[g] - exact) <= w + 1e-9
    a = (
        grouped_hist_quantile(rd.from_arrow(t), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        grouped_hist_quantile(rd.from_arrow(t).repartition(17), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert a.equals(b)


def test_curated_docs_invariants(ray_session):
    """The composed curation pipeline: survivors are unique by normalized
    text, pass the quality floor, and are capped per language."""
    import pandas as pd

    from node_shovel_ray.functions.textstats import QualityScore, normalize_text
    from node_shovel_ray.pipelines.corpus import curated_docs

    got = curated_docs("/root/testdata/sf0.001").to_pandas()
    assert (got.groupby("lang").size() <= 10).all()
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang", "text"],
    )
    sel = docs[docs["doc_id"].isin(got["doc_id"])].copy()
    q = QualityScore()(sel)
    assert (q["quality"].round(4) >= 0.4).all()
    import pyarrow as pa

    norm = normalize_text(pa.Table.from_pandas(sel, preserve_index=False))
    assert norm["text_norm"].to_pandas().is_unique


def test_md5_lower64_matches_duckdb():
    """md5_lower64 must equal DuckDB md5_number_lower(CAST(v AS VARCHAR))
    — the contract that makes the HLL sketch SQL-oracle-checkable."""
    import duckdb

    from node_shovel_ray.functions.sketches import md5_lower64

    vals = [0, 1, 42, -7, 123456789012345]
    got = md5_lower64(vals)
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (want,) = con.execute(
            "SELECT md5_number_lower(CAST(? AS VARCHAR))", [v]
        ).fetchone()
        assert int(g) == want


def test_hll_md5_register_parity_with_sql():
    """Register-level parity engine↔SQL at a cardinality that exercises the
    raw-estimate path (not just linear counting)."""
    import duckdb

    from node_shovel_ray.functions.sketches import hll_estimate_int, hll_registers

    p, m = 12, 1 << 12
    n = 30_000
    regs = hll_registers(np.arange(n, dtype=np.int64), p=p, hash_fn="md5")
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE vals AS SELECT CAST(i AS BIGINT) AS v FROM range({n}) t(i)"
    )
    df = con.execute(f"""
        WITH h AS (SELECT DISTINCT md5_number_lower(CAST(v AS VARCHAR)) AS hv FROM vals),
        r AS (SELECT CAST(hv >> {64-p} AS INT) AS idx,
                     hv & ((1::UBIGINT << {64-p}) - 1) AS w FROM h),
        s1 AS (SELECT idx, w, w | (w>>1) AS x FROM r),
        s2 AS (SELECT idx, w, x | (x>>2) AS x FROM s1),
        s3 AS (SELECT idx, w, x | (x>>4) AS x FROM s2),
        s4 AS (SELECT idx, w, x | (x>>8) AS x FROM s3),
        s5 AS (SELECT idx, w, x | (x>>16) AS x FROM s4),
        s6 AS (SELECT idx, w, x | (x>>32) AS x FROM s5)
        SELECT idx, MAX(CASE WHEN w = 0 THEN {64-p+1}
                             ELSE {64-p} - bit_count(x) + 1 END) AS M
        FROM s6 GROUP BY idx
    """).df()
    want = np.zeros(m, dtype=int)
    want[df["idx"].to_numpy()] = df["M"].to_numpy()
    assert np.array_equal(want, regs.astype(int))
    assert abs(hll_estimate_int(regs) - n) / n < 0.05


def test_fingerprint_md5_edges():
    import pyarrow as pa

    from node_shovel_ray.functions.textstats import fingerprint_md5

    t = pa.table({"text": pa.array(["", "   ", "one two", "w " * 40, None])})
    out = fingerprint_md5(t)["fingerprint"].to_pylist()
    assert out[0] is None and out[1] is None and out[4] is None
    assert isinstance(out[2], int) and isinstance(out[3], int)


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
