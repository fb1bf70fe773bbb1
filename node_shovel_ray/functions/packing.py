"""Sequence packing — the LLM-training data-prep step that concatenates a
corpus in a stable order and chunks it into fixed-token-budget training
windows ("concat-then-chunk" packing). Each document gets the global
token offset where it starts and the id of the window containing that
offset.

The core is a DISTRIBUTED ORDERED PREFIX SUM over doc_id order, built
without any global sort of the wide rows:

1. per-doc token counts (vectorized map);
2. contiguous RANGE buckets ``doc_id // W`` (order-preserving, unlike the
   hash buckets keyed stages use) and per-bucket token totals — a tiny
   (n_buckets)-row aggregate;
3. the driver prefix-sums the bucket totals (n_buckets numbers — never
   data) and broadcasts the bucket base offsets;
4. one keyed exchange on the range bucket; inside each bucket a local
   cumsum + the bucket's base gives every doc's exact global offset.

Every step is deterministic and the whole thing is one SQL window
function (``SUM(n) OVER (ORDER BY doc_id)``), so the operator is fully
oracle-paired.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def pack_docs(
    ds: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(id, n_tokens) rows → (id, n_tokens, offset, pack_id) where
    ``offset`` is the sum of ``n_tokens`` over all ids < this id and
    ``pack_id = offset // budget``. Ids must be unique integers (any
    gaps allowed — ranges only need ORDER, not density)."""
    from ..stages.keyed import default_num_blocks, keyed_map_blocks

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    # materialize the narrow (id, n_tokens) projection ONCE: the span
    # aggregate, the bucket-totals pass and the final exchange all read it,
    # and branching it lazy would re-run the upstream token-count scan per
    # branch (CLAUDE.md hazard). Two int64 cols — tiny even at 10⁹ docs.
    counts = ds.select_columns([id_col, token_col]).materialize()

    from ray.data.aggregate import Max, Min

    span = counts.aggregate(Min(id_col), Max(id_col))
    lo, hi = span[f"min({id_col})"], span[f"max({id_col})"]
    nb = n_buckets or default_num_blocks()
    width = max(1, (int(hi) - int(lo)) // nb + 1)

    def add_range_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        rb = (ids - int(lo)) // width
        return t.append_column("_rb", pa.array(rb.astype(np.int64)))

    bucketed = counts.map_batches(
        add_range_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-bucket totals → driver prefix sum (n_buckets rows, never data).
    # Pre-combine per block so the exchange carries one row per (block,
    # bucket), not one per document.
    def block_totals(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("_rb", sort=False)[token_col].sum().reset_index(name="_t")
        )

    from ray.data.aggregate import Sum

    totals = (
        bucketed.map_batches(block_totals, batch_format="pandas")
        .groupby("_rb")
        .aggregate(Sum("_t", alias_name="_t"))
        .to_pandas()
        .sort_values("_rb")
    )
    base = dict(
        zip(
            totals["_rb"].astype(int),
            np.concatenate([[0], np.cumsum(totals["_t"].to_numpy())[:-1]]).astype(
                np.int64
            ),
        )
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rb, sub in df.groupby("_rb", sort=False):
            sub = sub.sort_values(id_col, kind="mergesort").copy()
            n = sub[token_col].to_numpy(np.int64)
            local = np.concatenate([[0], np.cumsum(n)[:-1]])
            off = local + base[int(rb)]
            sub["offset"] = off
            sub["pack_id"] = off // budget
            out.append(sub.drop(columns=["_rb"]))
        return pd.concat(out) if out else df.drop(columns=["_rb"]).assign(
            offset=pd.Series([], dtype="int64"),
            pack_id=pd.Series([], dtype="int64"),
        )

    return keyed_map_blocks(bucketed, ["_rb"], per_bucket)
