"""Deterministic sampling operators for training-data curation.

A 100 TB corpus pipeline needs reproducible subsetting — "K docs per
language" / "2% of the corpus" — that is stable across retries, resumes
and re-runs. Random sampling breaks the engine's pure-function invariant
(CLAUDE.md: no unseeded RNG); these operators instead rank rows by a
content-derived hash of the id, which is uniform-ish, deterministic, and
— with ``hash_fn="md5"`` (functions/sketches.md5_lower64) — reproducible
by the DuckDB oracle, so both are fully hash-checked queries.

Scale shapes:

- :func:`sample_fraction`: a pure streaming filter (hash < p·2⁶⁴); no
  shuffle, no state.
- :func:`sample_per_group`: per-batch partial top-k per group (bounds the
  exchange to k × groups × blocks rows) → one keyed exchange → final
  top-k per group. The wide payload columns ride along only for rows
  that survive the partial cut.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .sketches import md5_lower64

_FULL = 1 << 64


def _hash_ids(values, hash_fn: str) -> np.ndarray:
    if hash_fn == "md5":
        return md5_lower64(values)
    return pd.util.hash_array(
        np.asarray(values, dtype=object), hash_key="nsrsample0123456"
    ).astype(np.uint64)


def fraction_threshold(p: float) -> int:
    """p ∈ [0,1] → the integer hash cutoff. Computed ONCE in Python and
    inlined into the SQL oracle as a literal, so engine and oracle can
    never disagree on float→int rounding."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {p}")
    return min(int(p * _FULL), _FULL - 1) if p < 1.0 else _FULL


def sample_fraction(
    ds: "ray.data.Dataset",
    p: float,
    id_col: str,
    hash_fn: str = "md5",
) -> "ray.data.Dataset":
    """Deterministic Bernoulli(p) subset: keep rows with
    ``hash(id) < p·2⁶⁴``. Streaming filter — no shuffle, no materialize."""
    thr = fraction_threshold(p)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_ids(df[id_col].to_numpy(), hash_fn)
        return df[h < np.uint64(min(thr, _FULL - 1))] if thr < _FULL else df

    return ds.map_batches(keep, batch_format="pandas")


def split_cutoffs(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """{'train': .9, 'val': .05, 'test': .05} → [(name, upper_cutoff)] with
    integer hash cutoffs computed ONCE in Python (inlined into the SQL
    oracle as literals so float→int rounding cannot diverge)."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    items = list(fractions.items())
    for i, (name, f) in enumerate(items):
        acc += f
        cut = _FULL if i == len(items) - 1 else int(acc * _FULL)
        out.append((name, cut))
    return out


def assign_split(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    id_col: str,
    out: str = "split",
    hash_fn: str = "md5",
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: each row's split is a pure
    function of its id (hash landing in the fraction's cutoff band) —
    stable across re-runs and immune to row order/layout, and with md5
    reproducible by the SQL oracle. A streaming map; no shuffle."""
    cuts = split_cutoffs(fractions)
    names = np.array([name for name, _ in cuts], dtype=object)
    # every cutoff except the (implicit 2⁶⁴) last fits in uint64
    inner = np.array([c for _, c in cuts[:-1]], dtype=np.uint64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_ids(df[id_col].to_numpy(), hash_fn)
        band = np.searchsorted(inner, h, side="right")  # first cut > hash
        df = df.copy()
        df[out] = names[band]
        return df

    return ds.map_batches(tag, batch_format="pandas")


def mixture_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    group_col: str,
    id_col: str,
    default_rate: float = 0.0,
    hash_fn: str = "md5",
) -> "ray.data.Dataset":
    """Corpus mixture weighting: keep each row with its group's sampling
    rate (``hash(id) < rate·2⁶⁴``) — the data-mixing step that reweights
    sources (web/books/code/…) before training. Deterministic per id, a
    pure streaming filter, and monotone: raising a rate only ADDS docs.
    Groups absent from ``rates`` use ``default_rate``."""
    # cutoffs stay exact Python ints end-to-end (a float64 round-trip
    # would push cutoffs within 2⁻⁵⁴ of 1 up to 2⁶⁴ and misread them as
    # keep-all, diverging from the SQL twin's integer literal); only the
    # exact 2⁶⁴ sentinel from p == 1.0 means keep-all
    cut = {g: fraction_threshold(r) for g, r in rates.items()}
    dflt = fraction_threshold(default_rate)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_ids(df[id_col].to_numpy(), hash_fn)
        # dict-default map, NOT map(cut).fillna(dflt): a group absent from
        # ``rates`` would make map() emit NaN and silently float64 the whole
        # Series — the exact float64 round-trip this code must avoid
        thr = df[group_col].map(lambda g: cut.get(g, dflt))  # object: exact ints
        keep_all = (thr == _FULL).to_numpy()
        thr_u = np.where(keep_all, 0, thr.to_numpy()).astype(np.uint64)
        return df[keep_all | (h < thr_u)]

    return ds.map_batches(keep, batch_format="pandas")


def sample_topn(
    ds: "ray.data.Dataset",
    n: int,
    id_col: str,
    hash_fn: str = "md5",
) -> "ray.data.Dataset":
    """Exact-SIZE deterministic global sample: the ``n`` rows with the
    smallest ``(hash(id) >> 1, id)`` — "give me exactly 200k docs,
    reproducibly" (Bernoulli gives a binomial count, not an exact one).

    Scale shape: partial top-n per block first, so the one sort exchange
    sees ≤ n × blocks rows, never the corpus (the topk_orders plan). The
    hash is shifted right one bit because the sort key must be int64 —
    Ray's sort-boundary sampling round-trips key samples through Python
    and overflows on uint64 values ≥ 2⁶³ (CLAUDE.md) — and ``h >> 1``
    keeps an order BOTH engines can express exactly (SQL twin:
    ``md5_number_lower(id) // 2``); ``id`` breaks the doubled ties.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = _hash_ids(df[id_col].to_numpy(), hash_fn)
        df["_h"] = (h >> np.uint64(1)).astype(np.int64)
        return df.sort_values(["_h", id_col], kind="mergesort").head(n)

    # batch_size=None = whole-block batches: the default 1024-row batches
    # would make head(n) a no-op for n >= 1024 (no pruning at all) and
    # n x batches survivors otherwise; then coalesce the pruned slivers —
    # a sort exchange launches input_blocks x partitions tasks (CLAUDE.md)
    pruned = ds.map_batches(
        partial, batch_format="pandas", batch_size=None
    ).repartition(8)
    return pruned.sort(["_h", id_col]).limit(n).drop_columns(["_h"])


def sample_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    k: int,
    id_col: str,
    hash_fn: str = "md5",
) -> "ray.data.Dataset":
    """Deterministic per-group sample: the ``k`` rows of each group with
    the smallest ``(hash(id), id)`` — a reservoir whose membership is a
    pure function of the ids (SQL twin: row_number() OVER (PARTITION BY
    group ORDER BY md5_number_lower(id), id) <= k)."""
    from ..stages.keyed import keyed_map_blocks

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = _hash_ids(df[id_col].to_numpy(), hash_fn)
        df = df.sort_values(["_h", id_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    # whole-block batches: default 1024-row batches would keep
    # k x groups x BATCHES rows instead of x blocks (no-op for k >= 1024)
    pruned = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k).drop(columns=["_h"])

    return keyed_map_blocks(pruned, [group_col], final)
