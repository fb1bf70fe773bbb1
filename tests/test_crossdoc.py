"""Cross-document n-gram duplication signal (pipelines/corpus.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from node_shovel_ray.pipelines.corpus import crossdoc_gram_docs


def test_crossdoc_hand_computed(tmp_path):
    # doc0/doc1 share the trigram "a b c"; doc2 shares nothing; doc3 is
    # too short for any trigram
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d", "a b c e", "x y z w", "a b"]),
        }
    )
    d = tmp_path / "documents.parquet"
    os.makedirs(d)
    pq.write_table(docs, str(d / "part-0.parquet"))

    out = {
        r["doc_id"]: r
        for r in crossdoc_gram_docs(str(tmp_path), n=3, min_df=2).take_all()
    }
    assert out[0]["n_grams"] == 2 and out[0]["n_common"] == 1
    assert out[0]["common_ratio"] == 0.5
    assert out[1]["n_grams"] == 2 and out[1]["n_common"] == 1
    assert out[2]["n_grams"] == 2 and out[2]["n_common"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["common_ratio"] == 0.0


def test_hashed_exchange_matches_strings():
    sf = "/root/testdata/sf0.001"
    plain = sorted(
        map(tuple, (r.values() for r in crossdoc_gram_docs(sf).take_all()))
    )
    hashed = sorted(
        map(
            tuple,
            (r.values() for r in crossdoc_gram_docs(sf, hashed=True).take_all()),
        )
    )
    assert hashed == plain


def test_dupspan_overlapping_spans_union(tmp_path):
    import os

    from node_shovel_ray.pipelines.corpus import dupspan_docs

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f",        # shares "a b c d e" with doc 1
                    "a b c d e g",
                    "x a b c d e f y",    # two overlapping shared spans
                    "q a b c d e f r",    #   -> union covers 6 tokens
                    "too short",          # < L tokens
                ]
            ),
        }
    )
    d = tmp_path / "documents.parquet"
    os.makedirs(d)
    import pyarrow.parquet as pq

    pq.write_table(docs, str(d / "p.parquet"))
    out = {r["doc_id"]: r for r in dupspan_docs(str(tmp_path), L=5).take_all()}
    # doc 0 shares "a b c d e" (docs 1-3) AND "b c d e f" (docs 2-3):
    # overlapping spans union to full coverage
    assert out[0]["n_covered"] == 6 and out[0]["dup_span_frac"] == 1.0
    assert out[1]["n_covered"] == 5 and out[1]["dup_span_frac"] == round(5 / 6, 4)
    assert out[2]["n_covered"] == 6 and out[2]["n_tokens"] == 8
    assert out[3]["n_covered"] == 6
    assert out[4]["n_covered"] == 0 and out[4]["dup_span_frac"] == 0.0
