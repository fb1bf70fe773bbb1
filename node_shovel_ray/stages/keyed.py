"""Keyed block processing: the scalable replacement for per-group ``map_groups``.

``GroupedData.map_groups`` invokes Python once per group — with millions of
conversations that is millions of pandas calls. This module hash-partitions
by key (``Dataset.repartition(keys=...)``, one all-to-all exchange — the same
shuffle ``map_groups`` pays) and then applies ONE vectorized function per
block; pandas ``groupby`` *inside* the block handles all of the block's
groups in C. Invariant provided: after the repartition every key's rows live
in exactly one block, so block-local keyed logic is globally correct.

This is the engine's standard pattern for keyed stages (sequence numbering,
dedup, sessionization); SURVEY.md §7.4's shuffle keys all flow through here.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def default_num_blocks(min_blocks: int = 16) -> int:
    """Buckets for a keyed exchange: ~2× cluster CPUs (parallelism headroom)."""
    return max(min_blocks, 2 * _cluster_cpus())


def default_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds: min 1 (never starve a small session),
    max ~3/4 of cluster CPUs — beware: Ray fuses adjacent map stages INTO a
    pool, so its max caps their parallelism too."""
    return (1, max(4, (3 * _cluster_cpus()) // 4))


def _add_bucket(keys: list[str], nb: int):
    def fn(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for k in keys:
            col = t[k].to_pandas().to_numpy()
            if col.dtype == object:
                hk = pd.util.hash_array(col, hash_key="nsrbucket0123456")
            else:
                hk = pd.util.hash_array(np.ascontiguousarray(col))
            h = h * np.uint64(1000003) + hk.astype(np.uint64)
        return t.append_column("_bucket", pa.array((h % np.uint64(nb)).astype(np.int64)))

    return fn


def keyed_map_blocks(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partition by ``keys``; apply ``fn`` once per whole partition.

    Implementation: a deterministic content-hash bucket column (stable across
    workers/processes — no Python ``hash``), then ``groupby('_bucket')``
    ``map_groups`` — one Python call per *bucket*, not per key group. Works
    on every Ray shuffle strategy (``repartition(keys=...)`` would need the
    opt-in HASH_SHUFFLE context).
    """
    nb = num_blocks or default_num_blocks()
    bucketed = ds.map_batches(
        _add_bucket(keys, nb), batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = fn(df.drop(columns=["_bucket"]))
        return out

    return bucketed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def seq_rank_block(key: str, order_col: str, out_col: str):
    """Block fn: 0-based dense rank of order_col within key (all groups at
    once via groupby.cumcount — C speed)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col], kind="mergesort")
        df[out_col] = df.groupby(key, sort=False).cumcount().astype("int64")
        return df

    return fn


def first_per_key_block(keys: list[str], order_col: str | None = None):
    """Block fn: keep one row per key (min order_col when given)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            df = df.sort_values(order_col, kind="mergesort")
        return df.drop_duplicates(subset=keys, keep="first")

    return fn
