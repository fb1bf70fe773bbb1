"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute_force` — the exactness baseline: per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once, fetched per actor),
  partial top-k per batch, tiny driver-side merge. Scales linearly: every
  batch does one BLAS GEMM; nothing materializes the corpus.
- :func:`knn_ivf` — the scale path: k-means coarse quantizer (trained on a
  sample), corpus bucketed by nearest centroid (one shuffle), queries probe
  only ``nprobe`` buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy where possible."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """Actor-pool stage: cosine top-k of each broadcast query vs one batch."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(query_ref)  # (nq, d) float64, fetched once per actor
        self.q = _norm(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        m = _norm(_to_matrix(batch[self.vec_col]))
        sims = self.q @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows = {
            "query_idx": np.repeat(np.arange(sims.shape[0]), k),
            self.id_col: ids[idx.ravel()],
            "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
        }
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int64()),
                self.id_col: pa.array(rows[self.id_col]),
                "sim": pa.array(rows["sim"], pa.float64()),
            }
        )


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> pd.DataFrame:
    """Exact cosine top-k: (query_idx, id, sim) rows, k per query.

    Partial top-k per batch in the actor pool; the driver merges only
    ``k × n_batches`` candidate rows — never the corpus.
    """
    from ..stages.keyed import default_pool

    concurrency = concurrency or default_pool()
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.select_columns([id_col, vec_col]).map_batches(
        BatchTopK,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    cand = partial.to_pandas()
    out = (
        cand.sort_values(["query_idx", "sim", id_col], ascending=[True, False, True])
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def _kmeans(x: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        for c in range(len(cent)):
            m = x[lab == c]
            if len(m):
                cent[c] = m.mean(0)
    return cent


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    seed: int = 42,
    concurrency=None,
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k (the 100 TB path).

    Train a coarse quantizer on a driver-side sample, assign every vector a
    centroid id inside ``map_batches`` (broadcast centroids), then search
    only the ``nprobe`` closest buckets per query — the bucket filter is a
    vectorized predicate, so non-probed buckets never leave the scan.
    """
    from ..stages.keyed import default_pool

    concurrency = concurrency or default_pool()
    sample = ds.select_columns([vec_col]).limit(sample_n).to_pandas()
    x = _norm(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = _norm(_kmeans(x, n_clusters, seed=seed))
    cref = ray.put(cent)

    q = _norm(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_set = set(np.unique(probes).tolist())

    class AssignAndFilter:
        def __init__(self):
            self.cent = ray.get(cref)
            self.keep = probe_set

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _norm(_to_matrix(batch[vec_col]))
            lab = (m @ self.cent.T).argmax(1)
            mask = np.isin(lab, list(self.keep))
            t = batch.filter(pa.array(mask))
            return t.append_column("bucket", pa.array(lab[mask], pa.int64()))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        AssignAndFilter, batch_format="pyarrow", concurrency=concurrency
    )
    return knn_brute_force(
        pruned, queries, k=k, id_col=id_col, vec_col=vec_col, concurrency=concurrency
    )
