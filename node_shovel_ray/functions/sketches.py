"""Mergeable sketches for pre-aggregated wide operations.

Exact per-group count-distinct (pipelines/relational.distinct_users_per_type)
must move every distinct (group, value) pair through the exchange; at
100 TB the sketch version moves a FIXED 2^p bytes per (group, block):
each block builds HyperLogLog registers per group inside ``map_batches``
(the combiner), the exchange carries only register vectors, and the final
reduce is an elementwise max + bias-corrected estimate.

HyperLogLog per Flajolet et al. 2007 (public algorithm), with the standard
small-range linear-counting correction. Hashing is seeded/deterministic
(pd.util.hash_array) — re-runs give byte-identical sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def md5_lower64(values) -> np.ndarray:
    """DuckDB-equivalent ``md5_number_lower(CAST(v AS VARCHAR))``: the
    little-endian uint64 from bytes 8..16 of the md5 digest of ``str(v)``
    (verified against DuckDB v1.0). Python-loop hashing — use only where
    SQL-reproducibility is required (the oracle-paired sketch queries);
    the seeded ``pd.util.hash_array`` family is the fast default."""
    import hashlib

    return np.array(
        [
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16], "little")
            for v in values
        ],
        dtype=np.uint64,
    )


def hll_registers(
    values: np.ndarray,
    p: int = 12,
    hash_key: str = "hllsketchseed000",
    hash_fn: str = "default",
) -> np.ndarray:
    """Values → 2^p uint8 HLL registers (vectorized, deterministic).

    ``hash_fn="md5"`` swaps in :func:`md5_lower64` so the whole sketch —
    registers, merge, estimate — is reproducible in ANSI SQL (the
    oracle-paired variant); everything downstream of the hash is shared."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    if hash_fn == "md5":
        h = md5_lower64(values)
    else:
        h = pd.util.hash_array(
            np.asarray(values, dtype=object), hash_key=hash_key
        ).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rank = leading-zero count of the (64-p)-bit remainder + 1;
    # bit_length via frexp is exact for w < 2^53 (here w < 2^52)
    wf = w.astype(np.float64)
    exp = np.frexp(wf)[1]  # bit_length of w (0 for w == 0)
    rank = np.where(w == 0, 64 - p + 1, 64 - p - exp + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_estimate_int(regs: np.ndarray) -> int:
    """Estimate rounded half-away-from-zero — the exact rounding the SQL
    oracle uses (CAST(floor(E + 0.5) AS BIGINT)), so both sides agree."""
    return int(np.floor(hll_estimate(regs) + 0.5))


def grouped_hist_quantile(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    q: float = 0.5,
    bin_width: float = 0.1,
    out: str = "approx_q",
) -> "ray.data.Dataset":
    """Mergeable fixed-width-histogram quantile sketch (approx quantile
    whose error is bounded by ``bin_width``).

    Exact grouped quantiles (relational.median_value_per_type) move every
    group value through the exchange; this sketch pre-aggregates a
    ``(group, bin) → count`` histogram per batch, so the exchange carries
    one row per distinct bin per block. The estimate is the lower edge of
    the first bin whose cumulative count reaches ``ceil(q·n)``.

    Every step — ``floor(value / bin_width)``, integer cumsum, threshold,
    ``bin · bin_width`` — is the same IEEE-754 float64 op in DuckDB, so
    the WHOLE sketch is SQL-oracle-reproducible (no seeded hashing
    needed)."""
    from ..stages.keyed import keyed_map_blocks

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(df[value_col].to_numpy(np.float64) / bin_width).astype(
            np.int64
        )
        return (
            df.assign(_bin=bins)
            .groupby([group_col, "_bin"], sort=False)
            .size()
            .reset_index(name="_n")
        )

    parts = ds.map_batches(partial, batch_format="pandas")

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_v = [], []
        for g, sub in df.groupby(group_col, sort=False):
            hist = sub.groupby("_bin")["_n"].sum().sort_index()
            thr = int(np.ceil(q * int(hist.sum())))
            cum = hist.cumsum().to_numpy()
            sel = int(hist.index[np.searchsorted(cum, thr, side="left")])
            out_g.append(g)
            out_v.append(sel * bin_width)
        return pd.DataFrame({group_col: out_g, out: np.asarray(out_v, np.float64)})

    return keyed_map_blocks(parts, [group_col], reduce_group)


def approx_count_distinct(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    p: int = 12,
    hash_fn: str = "default",
) -> "ray.data.Dataset":
    """(group, approx_n_distinct) via per-block HLL combiners.

    The exchange carries one 2^p-byte register row per (group, block) —
    independent of the number of distinct values — then a per-group
    elementwise-max reduce and estimate. ``hash_fn="md5"`` makes the whole
    pipeline reproducible by the DuckDB SQL oracle (same hash, same
    registers, same estimator)."""
    from ..stages.keyed import keyed_map_blocks

    def block_sketch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            rows.append(
                (g, hll_registers(sub[value_col].to_numpy(), p=p, hash_fn=hash_fn))
            )
        return pd.DataFrame(
            {
                group_col: [r[0] for r in rows],
                "_regs": [r[1].tobytes() for r in rows],
            }
        )

    sketches = ds.map_batches(block_sketch, batch_format="pandas")

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for g, sub in df.groupby(group_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for b in sub["_regs"]:
                regs = hll_merge(regs, np.frombuffer(b, dtype=np.uint8))
            out_g.append(g)
            out_n.append(hll_estimate_int(regs))
        return pd.DataFrame({group_col: out_g, "approx_n_distinct": out_n})

    return keyed_map_blocks(sketches, [group_col], reduce_group)
