"""Deterministic corpus shuffle — the training-data step that fixes a
reproducible global sample order (epoch order) for a corpus.

Order = ascending ``md5('<seed>:' || id)`` (DuckDB ``md5_number_lower``
parity, like the sampling family), so the shuffle is seeded, stable
across runs/layouts, and fully SQL-oracle-paired via
``row_number() OVER (ORDER BY md5..., id)``.

The global rank is computed WITHOUT a global sort of the rows: md5
hashes are uniform over uint64, so the top bits form balanced RANGE
buckets over the hash domain. Per-bucket counts (a tiny n_buckets-row
aggregate, pre-combined per block) prefix-sum on the driver into bucket
base ranks; one keyed exchange on the bucket then ranks locally — the
same distributed ordered-prefix-sum shape as functions/packing.py, with
the hash domain replacing the id domain. At 100 TB the exchange carries
only (id, hash) pairs, never the documents; consumers join the rank back
or write rank-partitioned shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .sketches import md5_lower64


def shuffle_hash(ids, seed: str) -> np.ndarray:
    """Seeded DuckDB-reproducible order key:
    ``md5_number_lower('<seed>:' || id)`` as uint64."""
    return md5_lower64([f"{seed}:{v}" for v in ids])


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    seed: str = "shuf42",
    out_col: str = "shuffle_rank",
    n_bucket_bits: int = 6,
) -> "ray.data.Dataset":
    """(id) rows → (id, rank) with rank = position in the seeded global
    shuffle order (0-based, ties on the 64-bit hash broken by id)."""
    from ..stages.keyed import keyed_map_blocks

    shift = np.uint64(64 - n_bucket_bits)

    def hash_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = shuffle_hash(ids, seed)
        return pa.table(
            {
                id_col: t[id_col],
                "_h": pa.array(h, pa.uint64()),
                "_hb": pa.array((h >> shift).astype(np.int64)),
            }
        )

    # narrow (id, hash, bucket) projection, reused by the counts pass and
    # the ranking exchange → materialize once (branching hazard, CLAUDE.md)
    hashed = ds.map_batches(
        hash_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("_hb", sort=False).size().reset_index(name="_n")

    from ray.data.aggregate import Sum

    totals = (
        hashed.map_batches(block_counts, batch_format="pandas")
        .groupby("_hb")
        .aggregate(Sum("_n", alias_name="_n"))
        .to_pandas()
        .sort_values("_hb")
    )
    base = dict(
        zip(
            totals["_hb"].astype(int),
            np.concatenate(
                [[0], np.cumsum(totals["_n"].to_numpy())[:-1]]
            ).astype(np.int64),
        )
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for hb, sub in df.groupby("_hb", sort=False):
            sub = sub.sort_values(
                ["_h", id_col], kind="mergesort"
            ).reset_index(drop=True)
            out.append(
                pd.DataFrame(
                    {
                        id_col: sub[id_col],
                        out_col: base[int(hb)]
                        + np.arange(len(sub), dtype=np.int64),
                    }
                )
            )
        return (
            pd.concat(out)
            if out
            else pd.DataFrame(
                {id_col: df[id_col], out_col: pd.Series([], dtype="int64")}
            )
        )

    return keyed_map_blocks(hashed, ["_hb"], rank_bucket)
