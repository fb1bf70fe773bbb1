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


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> pd.DataFrame:
    """Exact cosine top-k: (query_idx, id, sim) rows, k per query.

    The query matrix is small, so the per-batch top-k is a TASK closure
    (Ray ships it with the task spec) — no actor-pool spin-up; the driver
    merges only ``k × n_batches`` candidate rows — never the corpus.
    """
    q = _norm(np.asarray(queries, dtype=np.float64))

    def topk_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m = _norm(_to_matrix(batch[vec_col]))
        sims = q @ m.T  # (nq, nb)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "query_idx": pa.array(
                    np.repeat(np.arange(sims.shape[0]), kk), pa.int64()
                ),
                id_col: pa.array(ids[idx.ravel()]),
                "sim": pa.array(
                    np.take_along_axis(sims, idx, axis=1).ravel(), pa.float64()
                ),
            }
        )

    kw = {} if concurrency is None or isinstance(concurrency, tuple) else {
        "concurrency": concurrency
    }
    partial = ds.select_columns([id_col, vec_col]).map_batches(
        topk_batch, batch_format="pyarrow", **kw
    )
    cand = partial.to_pandas()
    out = (
        cand.sort_values(["query_idx", "sim", id_col], ascending=[True, False, True])
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class _PairFinder:
    """Actor-pool stage: cosine pairs of one batch vs the broadcast corpus."""

    def __init__(self, corpus_ref, threshold: float, id_col: str, vec_col: str):
        ids, mat = ray.get(corpus_ref)  # fetched once per actor
        self.ids = ids
        self.mat = mat  # already L2-normalized float64
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bids = batch[self.id_col].to_numpy()
        m = _norm(_to_matrix(batch[self.vec_col]))
        sims = m @ self.mat.T  # (nb, N)
        bi, cj = np.nonzero(sims >= self.threshold)
        a, b, s = bids[bi], self.ids[cj], sims[bi, cj]
        keep = a < b  # dedup (a,b)/(b,a) and self-pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(s[keep], pa.float64()),
            }
        )


def cosine_pairs_bruteforce(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=None,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs, exact (each-batch × broadcast
    corpus GEMM). The broadcast matrix is ``ray.put`` once (N×d float64 —
    viable to ~1M×64 = 0.5 GB); beyond that use :func:`cosine_pairs_lsh`.
    """
    from ..stages.keyed import default_pool

    corpus = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = corpus[id_col].to_numpy()
    mat = _norm(np.stack(corpus[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))
    return ds.select_columns([id_col, vec_col]).map_batches(
        _PairFinder,
        fn_constructor_args=(ref, threshold, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency or default_pool(),
    )


def cosine_pairs_tiled(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tiles: int = 8,
) -> "ray.data.Dataset":
    """Exact embedding-cosine near-dup pairs WITHOUT materializing the
    corpus — the scale-correct replacement for
    :func:`cosine_pairs_bruteforce` (same answer, different plan).

    Standard distributed all-pairs tiling: every vector is hashed to one of
    ``n_tiles`` tiles and replicated to each unordered tile pair it
    participates in (``n_tiles`` copies per row → communication
    O(N × n_tiles × d)); one keyed exchange co-locates each tile pair, and
    the per-group kernel is a single float64 GEMM over
    O(N / n_tiles)-sized sides. Memory per task is O((N / n_tiles) × d) —
    bounded by the tile count, never the corpus. Diagonal groups compute
    the upper triangle; off-diagonal groups the full cross product; pair
    ids are normalized (a < b) so no pair is emitted twice.
    """
    from ..stages.keyed import keyed_map_blocks

    T = int(n_tiles)

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t[id_col].to_numpy()
        tiles = (
            pd.util.hash_array(np.ascontiguousarray(ids)) % np.uint64(T)
        ).astype(np.int64)
        m = _norm(_to_matrix(t[vec_col]))
        rep_tile = np.repeat(tiles, T)
        other = np.tile(np.arange(T, dtype=np.int64), n)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, T)),
                "_tile": pa.array(rep_tile),
                "_ga": pa.array(np.minimum(rep_tile, other)),
                "_gb": pa.array(np.maximum(rep_tile, other)),
                "_vec": pa.array(
                    list(np.repeat(m, T, axis=0)), pa.list_(pa.float64())
                ),
            }
        )

    expanded = ds.select_columns([id_col, vec_col]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    )

    def tile_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for (ga, gb), g in df.groupby(["_ga", "_gb"], sort=False):
            if ga == gb:
                # diagonal: each tile's rows appear once; upper triangle
                g = g.drop_duplicates(subset=[id_col])
                ids = g[id_col].to_numpy()
                m = np.stack(g["_vec"].to_numpy())
                sims = m @ m.T
                mask = np.triu(sims >= threshold, k=1)
                ia, ib = np.nonzero(mask)  # only passing pairs materialize
                a, b, s = ids[ia], ids[ib], sims[ia, ib]
            else:
                A = g[g["_tile"] == ga]
                B = g[g["_tile"] == gb]
                if not len(A) or not len(B):
                    continue
                ma = np.stack(A["_vec"].to_numpy())
                mb = np.stack(B["_vec"].to_numpy())
                sims = ma @ mb.T
                ia, ib = np.nonzero(sims >= threshold)
                a, b, s = (
                    A[id_col].to_numpy()[ia],
                    B[id_col].to_numpy()[ib],
                    sims[ia, ib],
                )
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append(s)
        if not out_a:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"),
                 "vec_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b),
             "sim": np.concatenate(out_s)}
        )

    return keyed_map_blocks(expanded, ["_ga", "_gb"], tile_pairs)


def md5_planes(n_tables: int, n_planes: int, d: int) -> np.ndarray:
    """Deterministic hyperplane family from the md5 hash domain.

    ``plane[t, p, j] = (md5_num("lshp_{t}_{p}_{j}") % 2^53) / 2^52 - 1``
    where ``md5_num`` is the low-8-bytes-little-endian integer of the md5
    digest — exactly DuckDB's ``md5_number_lower``, and every value has
    ≤53 mantissa bits so the float64 round-trip is bit-exact in both
    engines. Uniform-on-[-1,1) directions are a valid sign-LSH family
    (symmetric about the origin); the collision probability deviates from
    the Gaussian family's exact ``1 - θ/π`` only by the cube's mild
    anisotropy, negligible at d≥32. This is what makes
    ``embed_neardup_lsh`` fully SQL-oracle-checkable."""
    import hashlib

    vals = np.empty((n_tables, n_planes, d), np.float64)
    for t in range(n_tables):
        for p in range(n_planes):
            for j in range(d):
                h = int.from_bytes(
                    hashlib.md5(f"lshp_{t}_{p}_{j}".encode()).digest()[8:16],
                    "little",
                )
                vals[t, p, j] = (h % 2**53) / 2**52 - 1.0
    return vals


def cosine_pairs_lsh(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 1000,
    concurrency=None,
    plane_family: str = "gaussian",
) -> "ray.data.Dataset":
    """Embedding near-dup pairs via random-hyperplane LSH (the scale path).

    ``n_tables`` independent sign-hash tables of ``n_planes`` bits each; a
    pair collides in a table with prob ``(1 - θ/π)^n_planes`` — near-dups
    (small angle) almost surely share a bucket in ≥1 table. Per-table
    shuffle key = (table, bucket); in-bucket pairwise cosine is capped at
    ``max_bucket`` rows (boilerplate guard), then pairs are deduped across
    tables and verified against ``threshold``.

    ``plane_family="md5"`` draws the planes from :func:`md5_planes`
    instead of a seeded Gaussian — same algorithm, but the bucketing is
    then exactly reproducible in SQL (DuckDB ``md5_number_lower``), so the
    whole approximate pipeline gets a full value-hash oracle.
    """
    import pandas as pd

    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    d = len(ds.select_columns([vec_col]).take(1)[0][vec_col])
    if plane_family == "md5":
        planes = md5_planes(n_tables, n_planes, d)
    else:
        planes = np.random.default_rng(seed).standard_normal((n_tables, n_planes, d))

    # planes are a few KB → task closure, not an actor pool
    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        # signs come from the RAW float64 vectors (sign(v·p) == sign(v̂·p),
        # and the SQL twin's list_dot_product sees raw vectors too);
        # normalization happens once here for the in-bucket cosine sims.
        mraw = _to_matrix(batch[vec_col])
        m = _norm(mraw)
        outs = []
        # flat-buffer list build: pa.array(list(m)) walks a Python object
        # per row (×n_tables) and dominates large batches
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), m.shape[1]
        ).cast(pa.list_(pa.float64()))
        for t in range(n_tables):
            signs = (mraw @ planes[t].T) > 0  # (n, n_planes)
            buck = signs @ (1 << np.arange(n_planes))
            outs.append(
                pa.table(
                    {
                        id_col: pa.array(ids),
                        "table": pa.array(np.full(len(ids), t, np.int32)),
                        "bucket": pa.array(buck.astype(np.int64)),
                        "vec": vec_arr,
                    }
                )
            )
        return pa.concat_tables(outs)

    bands = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, g in df.groupby(["table", "bucket"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            m = np.stack(g["vec"].to_numpy())
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
            s = sims[ia, ib]
            keep = s >= threshold
            out_a.append(ids[ia][keep])
            out_b.append(ids[ib][keep])
            out_s.append(s[keep])
        if not out_a:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"),
                 "vec_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b),
             "sim": np.concatenate(out_s)}
        )

    pairs = keyed_map_blocks(bands, ["table", "bucket"], bucket_pairs)
    return keyed_map_blocks(
        pairs, ["vec_a", "vec_b"], first_per_key_block(["vec_a", "vec_b"])
    )


def _round_away(x: np.ndarray, dp: int) -> np.ndarray:
    """Round half AWAY from zero at ``dp`` decimals — bit-exact parity with
    DuckDB's ``round(x, dp)`` on DOUBLE (verified on 200k random values;
    numpy's np.round is half-even and would diverge)."""
    p = 10.0 ** dp
    return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p


def train_det_quantizer(
    ds: "ray.data.Dataset",
    n_clusters: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
) -> np.ndarray:
    """The deterministic 9dp-quantized k-means trainer shared by
    :func:`knn_ivf_det` and :func:`kmeans_assign_det` — every float
    decision point rounded half-away at 9 decimals (== DuckDB
    ``round(x, 9)``), first-k init in id order, ties to the smallest
    cluster id; see knn_ivf_det's docstring for the exactness contract.
    Returns the normalized rounded centroid matrix (n_clusters × d)."""
    sample = (
        ds.select_columns([id_col, vec_col]).limit(sample_n).to_pandas()
        .sort_values(id_col)
    )
    x = _round_away(_norm(np.stack(sample[vec_col].to_numpy()).astype(np.float64)), 9)
    nc = min(n_clusters, len(x))
    cent = x[:nc].copy()
    for _ in range(iters):
        dist = _round_away(
            np.sqrt(((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)), 9
        )
        lab = dist.argmin(1)  # first min == smallest cluster id on ties
        for c in range(nc):
            m = x[lab == c]
            if len(m):
                cent[c] = _round_away(m.mean(0), 9)
    return _round_away(_norm(cent), 9)


def kmeans_assign_det(
    ds: "ray.data.Dataset",
    n_clusters: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
) -> "ray.data.Dataset":
    """Embedding k-means clustering as a first-class operator: every
    vector labeled with its cosine-nearest deterministic centroid — the
    cluster pass a curation pipeline runs for cluster-balanced mixing or
    cluster-level dedup (SemDeDup-style).

    Scale shape: the quantizer trains on a driver-side ``sample_n`` slice
    (n_clusters × d floats), then assignment is an embarrassingly
    parallel streaming ``map_batches`` with the centroid matrix shipped
    in the task closure — no shuffle, no corpus materialization.
    Oracle: the same unrolled k-means CTE chain as the IVF twin
    (pipelines/sql_oracle._kmeans_chain_sql), assignment tail only.
    """
    cent = train_det_quantizer(
        ds, n_clusters, iters=iters, id_col=id_col, vec_col=vec_col,
        sample_n=sample_n,
    )

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m = _round_away(_norm(_to_matrix(batch[vec_col])), 9)
        d9 = _round_away(m @ cent.T, 9)
        lab = d9.argmax(1)  # first max == smallest cluster id on ties
        sim = _round_away(np.take_along_axis(d9, lab[:, None], 1)[:, 0], 4)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(lab.astype(np.int64)),
                "sim": pa.array(sim, pa.float64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def semdedup(
    ds: "ray.data.Dataset",
    n_clusters: int = 16,
    tau: float = 0.35,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with the deterministic quantizer, then WITHIN each
    cluster drop every vector that has an earlier (smaller-id) neighbor
    with cosine ≥ ``tau``. Cross-cluster near-dups are not compared —
    that is SemDeDup's approximation, which is what makes it scale.

    The drop rule is one-pass and independent of the neighbor's own drop
    status (v goes if ANY u < v is close, survivor or not) — deterministic,
    order-free, and exactly expressible as SQL NOT EXISTS
    (sql_oracle.Q_SEMDEDUP_EMBEDDINGS, over the shared k-means chain).

    Scale shape: one keyed exchange on the cluster id (vectors ride as a
    d-float list column), one vectorized pairwise pass per cluster.
    Per-cluster work is O(s²·d) — at corpus scale you raise ``n_clusters``
    so the expected cluster size stays bounded (SemDeDup runs ~100k
    clusters at billions of docs); cluster-size skew is the operative
    partitioning assumption, logged nowhere silently because nothing is
    capped — every vector is compared within its full cluster.
    """
    cent = train_det_quantizer(
        ds, n_clusters, iters=iters, id_col=id_col, vec_col=vec_col,
        sample_n=sample_n,
    )

    def assign_vec(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m = _round_away(_norm(_to_matrix(batch[vec_col])), 9)
        lab = _round_away(m @ cent.T, 9).argmax(1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(lab.astype(np.int64)),
                # normalized 9dp-quantized vectors ride to the exchange so
                # the per-cluster pass needs no second corpus read; built
                # from the flat buffer — pa.array(list(m)) walks a Python
                # object per ROW and dominated a 1M-vector probe
                "_e": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1)), m.shape[1]
                ),
            }
        )

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign_vec, batch_format="pyarrow"
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cluster", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            m = np.stack(g["_e"].to_numpy())
            n = len(m)
            dup = np.zeros(n, dtype=bool)
            # column-chunked pairwise pass: the live matrix is
            # prefix × chunk, never the full s × s similarity matrix
            # (a skewed 50k-vector cluster would need a 20 GB square)
            step = 1024
            for j0 in range(1, n, step):
                j1 = min(j0 + step, n)
                s = _round_away(m[:j1] @ m[j0:j1].T, 9)
                hit = s >= tau
                # keep only u-row strictly BEFORE the column's vector
                hit &= np.arange(j1)[:, None] < np.arange(j0, j1)[None, :]
                dup[j0:j1] = hit.any(axis=0)
            outs.append(g.loc[~dup, [id_col, "cluster"]])
        return (
            pd.concat(outs)
            if outs
            else df[[id_col, "cluster"]].iloc[:0]
        )

    from ..stages.keyed import keyed_map_blocks

    return keyed_map_blocks(assigned, ["cluster"], prune, num_blocks=num_blocks)


def knn_ivf_det(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    concurrency=None,
) -> pd.DataFrame:
    """Deterministic IVF top-k — the SQL-oracle-checkable variant.

    Same algorithm as :func:`knn_ivf` (k-means coarse quantizer, probe the
    ``nprobe`` nearest cells, exact top-k inside the probed cells) but with
    every float decision point quantized so DuckDB reproduces it exactly
    (sql_oracle's knn-IVF oracle):

    - init = the first ``n_clusters`` sample rows (id order), not a seeded
      RNG draw;
    - normalized vectors, per-iteration centroids/means, distances, and
      dot products are all rounded half-away at 9 decimals
      (:func:`_round_away` == DuckDB ``round``), so assignment argmins /
      argmaxes see identical values in both engines, with ties broken by
      the smallest cluster id in both;
    - training assigns by euclidean argmin against raw means; the final
      corpus assignment and probe choice use cosine argmax against the
      normalized rounded centroids.

    The quantizer trains on the first ``sample_n`` rows — the SQL twin
    trains on the whole table, so the oracle contract requires
    ``count(ds) <= sample_n`` (true at gate scales; at real scale the
    oracle is a small-slice check, like every other sketch oracle).
    Determinism also preserves the repo invariant that every operator is a
    pure function of its input (retry/resume equality-safe).
    """
    cent = train_det_quantizer(
        ds, n_clusters, iters=iters, id_col=id_col, vec_col=vec_col,
        sample_n=sample_n,
    )

    q = _round_away(_norm(np.asarray(queries, dtype=np.float64)), 9)[0]
    cdots = _round_away(cent @ q, 9)
    order = np.lexsort((np.arange(len(cent)), -cdots))  # dot DESC, cluster ASC
    probe_arr = np.sort(order[:nprobe])

    def assign_filter_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m = _round_away(_norm(_to_matrix(batch[vec_col])), 9)
        lab = _round_away(m @ cent.T, 9).argmax(1)  # first max == smallest c
        mask = np.isin(lab, probe_arr)
        ids, m = ids[mask], m[mask]
        s = _round_away(m @ q, 9)
        if len(s) > k:
            top = np.lexsort((ids, -s))[:k]  # sim DESC, id ASC
            ids, s = ids[top], s[top]
        return pa.table(
            {id_col: pa.array(ids), "sim_raw": pa.array(s, pa.float64())}
        )

    cand = (
        ds.select_columns([id_col, vec_col])
        .map_batches(assign_filter_topk, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        cand.sort_values(["sim_raw", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = _round_away(out.pop("sim_raw").to_numpy(), 4)
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
    sample = ds.select_columns([vec_col]).limit(sample_n).to_pandas()
    x = _norm(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = _norm(_kmeans(x, n_clusters, seed=seed))

    q = _norm(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_arr = np.unique(probes)

    # centroids are n_clusters × d floats → task closure, not an actor pool
    def assign_and_filter(batch: pa.Table) -> pa.Table:
        m = _norm(_to_matrix(batch[vec_col]))
        lab = (m @ cent.T).argmax(1)
        mask = np.isin(lab, probe_arr)
        t = batch.filter(pa.array(mask))
        return t.append_column("bucket", pa.array(lab[mask], pa.int64()))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        assign_and_filter, batch_format="pyarrow"
    )
    return knn_brute_force(
        pruned, queries, k=k, id_col=id_col, vec_col=vec_col, concurrency=concurrency
    )
