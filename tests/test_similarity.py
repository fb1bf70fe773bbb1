import numpy as np
import pyarrow.parquet as pq

import ray.data as rd

from node_shovel_ray.functions.similarity import knn_brute_force, knn_ivf, _norm


def _corpus():
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    return t, mat, ids


def test_knn_brute_force_exact():
    t, mat, ids = _corpus()
    q = mat[:2]
    got = knn_brute_force(rd.from_arrow(t), q, k=5, concurrency=2)
    # numpy oracle
    qn, mn = _norm(q.copy()), _norm(mat.copy())
    sims = qn @ mn.T
    for qi in range(2):
        want = set(ids[np.argsort(-sims[qi])[:5]])
        have = set(got[got["query_idx"] == qi]["vec_id"])
        assert have == want


def test_tiled_pairs_match_bruteforce():
    """cosine_pairs_tiled (the scale path: tile exchange, no corpus
    materialization) must produce EXACTLY the brute-force broadcast's
    pairs — ids and sims — at several tile counts, including tile counts
    larger than the corpus's natural block count."""
    import pandas as pd

    from node_shovel_ray.functions.similarity import (
        cosine_pairs_bruteforce,
        cosine_pairs_tiled,
    )

    t, mat, ids = _corpus()

    def canon(df):
        return (
            df.sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
            .astype({"vec_a": "int64", "vec_b": "int64"})
        )

    brute = canon(
        cosine_pairs_bruteforce(rd.from_arrow(t), threshold=0.35, concurrency=2)
        .to_pandas()
    )
    assert len(brute) > 0
    for n_tiles in (1, 3, 8):
        tiled = canon(
            cosine_pairs_tiled(rd.from_arrow(t), threshold=0.35, n_tiles=n_tiles)
            .to_pandas()
        )
        pd.testing.assert_frame_equal(tiled, brute, check_exact=False, rtol=1e-12)


def test_knn_ivf_recall():
    t, mat, ids = _corpus()
    q = mat[5:8]
    exact = knn_brute_force(rd.from_arrow(t), q, k=10, concurrency=2)
    approx = knn_ivf(rd.from_arrow(t), q, k=10, n_clusters=8, nprobe=4,
                     concurrency=2)
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 buckets → decent recall


def test_md5_plane_family_matches_duckdb():
    """The md5 hyperplane family (the embed_neardup_lsh oracle lever) must
    be bit-exactly reproducible via DuckDB's md5_number_lower — the same
    contract the SQL oracle (sql_oracle.Q_EMBED_NEARDUP_LSH) relies on."""
    import duckdb

    from node_shovel_ray.functions.similarity import md5_planes

    planes = md5_planes(2, 3, 5)
    got = duckdb.sql(
        """
        SELECT t.range, p.range,
               list_transform(range(0, 5), j ->
                 CAST(md5_number_lower('lshp_' || t.range || '_' || p.range || '_' || j)
                      % 9007199254740992 AS DOUBLE) / 4503599627370496.0 - 1.0)
        FROM range(0, 2) t, range(0, 3) p ORDER BY 1, 2
        """
    ).fetchall()
    for t, p, vals in got:
        assert planes[t, p].tolist() == vals
    # symmetric about 0 and bounded — a valid sign-LSH direction family
    big = md5_planes(4, 12, 64).ravel()
    assert big.min() >= -1.0 and big.max() < 1.0
    assert abs(big.mean()) < 0.05


def test_knn_ivf_det_recall_and_determinism():
    """The deterministic (SQL-oracle-checkable) IVF variant: same recall
    bound as the seeded one, and bit-identical across runs (the property
    the quantized k-means exists for)."""
    from node_shovel_ray.functions.similarity import knn_ivf_det

    t, mat, ids = _corpus()
    q = mat[5:6]
    exact = knn_brute_force(rd.from_arrow(t), q, k=10, concurrency=2)
    a = knn_ivf_det(rd.from_arrow(t), q, k=10, n_clusters=8, nprobe=4)
    b = knn_ivf_det(rd.from_arrow(t), q, k=10, n_clusters=8, nprobe=4)
    assert a.equals(b)
    e = set(exact[exact["query_idx"] == 0]["vec_id"])
    assert len(e & set(a["vec_id"])) / len(e) >= 0.5


def test_kmeans_assign_det_partition_and_layout():
    """Embedding clustering: every vector gets exactly one label, labels
    are deterministic and block-layout-independent, and each vector's
    centroid is its true cosine argmax (numpy oracle)."""
    from node_shovel_ray.functions.similarity import (
        _round_away,
        kmeans_assign_det,
        train_det_quantizer,
    )

    t, mat, ids = _corpus()
    a = kmeans_assign_det(rd.from_arrow(t), n_clusters=8).to_pandas()
    b = kmeans_assign_det(
        rd.from_arrow(t).repartition(7), n_clusters=8
    ).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)  # layout-independent
    assert len(a) == len(ids) and a["vec_id"].is_unique  # a partition
    assert a["cluster"].between(0, 7).all()
    assert a["cluster"].nunique() > 1  # not degenerate
    # numpy oracle for the assignment step
    cent = train_det_quantizer(rd.from_arrow(t), 8)
    m = _round_away(_norm(mat.copy()), 9)
    d9 = _round_away(m @ cent.T, 9)
    want = dict(zip(ids, d9.argmax(1)))
    assert all(want[v] == c for v, c in zip(a["vec_id"], a["cluster"]))


def test_semdedup_drop_rule_and_layout():
    """SemDeDup within-cluster prune: layout-independent, keeps smallest
    id, and matches the numpy drop rule (v dropped iff any u < v in the
    SAME cluster has round-9 cosine >= tau)."""
    from node_shovel_ray.functions.similarity import (
        _round_away,
        semdedup,
        train_det_quantizer,
    )

    t, mat, ids = _corpus()
    tau = 0.35
    a = semdedup(rd.from_arrow(t), tau=tau).to_pandas()
    b = semdedup(rd.from_arrow(t).repartition(7), tau=tau).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    assert 0 < len(a) < len(ids)  # some drops, not all
    # numpy oracle
    cent = train_det_quantizer(rd.from_arrow(t), 16)
    order = np.argsort(ids, kind="mergesort")
    m = _round_away(_norm(mat.copy()), 9)[order]
    sid = ids[order]
    lab = _round_away(m @ cent.T, 9).argmax(1)
    keep = []
    for i in range(len(sid)):
        near = (
            _round_away(m[:i][lab[:i] == lab[i]] @ m[i], 9) >= tau
        ).any()
        if not near:
            keep.append(sid[i])
    assert set(a["vec_id"]) == set(keep)
