import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.dedup import (
    dedup_exact,
    dedup_exact_counts,
    minhash_lsh_pairs,
    simhash_pairs,
    _shingles,
)


def test_dedup_exact_resume_replay():
    # FIXTURES.md §6: duplicated (conv_id, turn_idx) rows → one survivor
    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 5, 4], pa.int64()),
            "text": pa.array(["a", "a", "b", "b", "c"]),
        }
    )
    out = dedup_exact(rd.from_arrow(t)).to_pandas().sort_values("text")
    assert out["doc_id"].tolist() == [1, 2, 4]  # min id survives

    cnt = dedup_exact_counts(rd.from_arrow(t)).to_pandas().sort_values("text")
    assert cnt["keep_id"].tolist() == [1, 2, 4]
    assert cnt["n_dups"].tolist() == [2, 2, 1]


def _near_dup_corpus():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    texts = {
        0: base,
        1: base.replace("today", "tonight"),          # near-dup of 0
        2: "completely different content about spark ray data pipelines",
        3: base,                                        # exact dup of 0
        4: "another unrelated string with its own words entirely here",
    }
    return pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
        }
    )


def test_minhash_lsh_finds_near_dups():
    ds = rd.from_arrow(_near_dup_corpus())
    pairs = minhash_lsh_pairs(ds, threshold=0.5, num_perm=64, num_bands=16,
                              concurrency=2).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 3) in got  # exact dup always caught
    assert (0, 1) in got or (1, 3) in got  # near dup caught
    assert all({a, b} & {2, 4} == set() or a == b for a, b in got) or not any(
        {2, 4} <= {a, b} for a, b in got
    )


def test_minhash_jaccard_vs_bruteforce():
    # LSH-verified jaccard equals exact shingle jaccard (python oracle)
    ds = rd.from_arrow(_near_dup_corpus())
    pairs = minhash_lsh_pairs(ds, threshold=0.3, concurrency=2).to_pandas()
    texts = _near_dup_corpus().to_pandas().set_index("doc_id")["text"]
    for _, r in pairs.iterrows():
        sa = _shingles(texts[r["doc_a"]].split(), 3)
        sb = _shingles(texts[r["doc_b"]].split(), 3)
        assert abs(r["jaccard"] - len(sa & sb) / len(sa | sb)) < 1e-9


def test_simhash_pairs():
    ds = rd.from_arrow(_near_dup_corpus())
    pairs = simhash_pairs(ds, max_hamming=4, concurrency=2).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 3) in got           # identical text → hamming 0
    assert (2, 4) not in got        # unrelated text stays apart


def test_ngram_jaccard_paths_agree(ray_session):
    """Broadcast (small candidate set) and distributed keyed-join verify
    paths must produce identical jaccard rows."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import ngram_jaccard

    texts = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": [
                    "a b c d e", "a b c d f", "x y z", "x y w",
                    "p q r s", "",
                ],
            }
        )
    )
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([0, 2, 4], pa.int64()),
                "doc_b": pa.array([1, 3, 5], pa.int64()),
            }
        )
    )
    bc = (
        ngram_jaccard(pairs, texts, k=2, concurrency=(1, 2))
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    kj = (
        ngram_jaccard(pairs, texts, k=2, concurrency=(1, 2), broadcast_limit=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, kj)
    assert bc.iloc[0]["jaccard"] == 3 / 5  # {a b,b c,c d} of 5 bigrams
    assert bc.iloc[2]["jaccard"] == 0.0    # vs empty doc


def test_ngram_jaccard_string_ids(ray_session):
    """ADVICE r2: the broadcast path must accept non-integer doc ids (the
    semi-join keys on the column's native Arrow type)."""
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import ngram_jaccard

    texts = rd.from_arrow(
        pa.table({"doc_id": ["d0", "d1", "d2"], "text": ["a b c", "a b d", "x y"]})
    )
    pairs = rd.from_arrow(pa.table({"doc_a": ["d0"], "doc_b": ["d1"]}))
    got = ngram_jaccard(pairs, texts, k=2, concurrency=(1, 2)).to_pandas()
    assert got["jaccard"].tolist() == [1 / 3]  # {a b} of {a b, b c, b d}
    # VERDICT r3 #6: string ids through the DISTRIBUTED (keyed-join)
    # verify path too — broadcast_limit=0 forces _attach_text, which now
    # keys on the column's native Arrow type instead of casting to int64
    pairs2 = rd.from_arrow(
        pa.table({"doc_a": ["d0", "d2"], "doc_b": ["d1", "d0"]})
    )
    kj = (
        ngram_jaccard(pairs2, texts, k=2, concurrency=(1, 2), broadcast_limit=0)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert kj["doc_a"].tolist() == ["d0", "d2"]
    assert kj["jaccard"].tolist() == [1 / 3, 0.0]


def test_connected_components_ds_matches_driver(ray_session):
    """Distributed min-label propagation + pointer jumping equals driver
    union-find on a graph with a long chain (worst case for plain
    propagation), a clique, a pair, and disjoint components."""
    import pandas as pd
    import ray.data as rd

    from node_shovel_ray.functions.dedup import (
        connected_components,
        connected_components_ds,
    )

    edges_a = list(range(100, 119)) + [50, 51, 50, 52, 53, 200]
    edges_b = list(range(101, 120)) + [51, 52, 52, 53, 50, 300]
    pairs = pd.DataFrame({"doc_a": edges_a, "doc_b": edges_b})
    want = connected_components(pairs)

    got_ds = connected_components_ds(
        rd.from_pandas(pairs), num_blocks=8
    ).to_pandas()
    got = dict(zip(got_ds["v"], got_ds["root"]))
    assert got == want
    # chain collapses to its min, clique to 50, pair to 200
    assert got[119] == 100 and got[53] == 50 and got[300] == 200


def test_connected_components_ds_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from node_shovel_ray.functions.dedup import connected_components_ds

    out = connected_components_ds(
        rd.from_pandas(pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                     "doc_b": pd.Series([], dtype="int64")}))
    )
    assert out.count() == 0 and set(out.schema().names) == {"v", "root"}


def test_dedup_near_distributed_paths_match_driver(ray_session):
    """VERDICT r4 #1: forcing every driver-side limit to zero (keyed pair
    dedup, distributed CC, distributed anti-join) must give the same
    survivors as the driver union-find path."""
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import dedup_near

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 5, 7, 9], pa.int64()),
                "text": [
                    "the cat sat on the mat today ok",
                    "the cat sat on the mat today ok!",
                    "the cat sat on the mat today ok yes",
                    "completely different words entirely here now",
                    "another shared sentence for the pair case",
                    "another shared sentence for the pair case",
                ],
            }
        )
    )
    base = sorted(dedup_near(docs, threshold=0.5).to_pandas()["doc_id"])
    forced = sorted(
        dedup_near(
            docs, threshold=0.5,
            pair_dedup_limit=0,       # keyed-exchange pair dedup
            cc_driver_limit=0,        # distributed connected components
            drop_broadcast_limit=0,   # distributed anti-join drop filter
        ).to_pandas()["doc_id"]
    )
    assert forced == base and 9 not in forced


def test_ngram_jaccard_big_pair_path_never_gathers_pairs(ray_session):
    """VERDICT r4 #4: above the broadcast limit the pair list must never
    come to the driver — pin by making Dataset.to_pandas raise while the
    plan is built."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import ngram_jaccard

    texts = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(4), pa.int64()),
             "text": ["a b c d", "a b c e", "x y z", "x y q"]}
        )
    )
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array([0, 2], pa.int64()),
                  "doc_b": pa.array([1, 3], pa.int64())})
    )
    real = rd.Dataset.to_pandas
    rd.Dataset.to_pandas = lambda self, *a, **k: (_ for _ in ()).throw(
        AssertionError("driver-side to_pandas on the big-pair path")
    )
    try:
        out = ngram_jaccard(pairs, texts, k=2, broadcast_limit=0)
    finally:
        rd.Dataset.to_pandas = real
    got = out.to_pandas().sort_values("doc_a").reset_index(drop=True)
    assert got["jaccard"].tolist() == [2 / 4, 1 / 3]


def test_connected_components_and_dedup_near(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import connected_components, dedup_near

    # chain 1-2-3, pair 7-9, singleton 5 untouched
    pairs = pd.DataFrame({"doc_a": [1, 2, 7], "doc_b": [2, 3, 9]})
    roots = connected_components(pairs)
    assert roots == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 5, 7, 9], pa.int64()),
                # three near-identical texts (one component), one pair,
                # one unique
                "text": [
                    "the cat sat on the mat today ok",
                    "the cat sat on the mat today ok!",
                    "the cat sat on the mat today ok yes",
                    "completely different words entirely here now",
                    "another shared sentence for the pair case",
                    "another shared sentence for the pair case",
                ],
            }
        )
    )
    kept = sorted(dedup_near(docs, threshold=0.5).to_pandas()["doc_id"])
    assert 5 in kept and 1 in kept and 7 in kept
    assert 9 not in kept  # exact dup of 7 always dropped
    assert len(kept) <= 4


def test_minhash_pairs_md5_exact_dups_and_sql_shape(ray_session):
    """md5-permutation variant: exact duplicates must pair at jaccard 1.0,
    near-dups above threshold appear, unrelated docs don't."""
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.functions.dedup import minhash_pairs_md5

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                "text": [
                    "the cat sat on the mat today fine ok",
                    "the cat sat on the mat today fine ok",
                    "the cat sat on the mat today fine ok yes",
                    "completely unrelated words entirely here now",
                ],
            }
        )
    )
    got = (
        minhash_pairs_md5(docs, threshold=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs and 9 not in set(got["doc_a"]) | set(got["doc_b"])
    assert got.set_index(["doc_a", "doc_b"]).loc[(1, 2), "jaccard"] == 1.0
