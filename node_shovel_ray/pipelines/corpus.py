"""Training-data corpus pipelines over the documents/embeddings tables:
dedup, text analysis, similarity search — queries()-facing wrappers."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.dedup import dedup_exact_counts, minhash_lsh_pairs, simhash_pairs
from ..functions.similarity import knn_brute_force, knn_ivf
from ..functions.textstats import LangId, QualityScore, fingerprint, token_count
from ..stages.keyed import default_pool


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def dedup_exact_docs(sf_dir: str) -> "rd.Dataset":
    return dedup_exact_counts(
        _docs(sf_dir, ["doc_id", "text"]), key_col="text", id_col="doc_id"
    )


def token_stats_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_count, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens"])
    )


def quality_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(QualityScore, batch_format="pandas", concurrency=default_pool())
        .select_columns(["doc_id", "n_words", "punct_ratio", "stop_ratio", "quality"])
    )


def langid_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LangId, batch_format="pandas", concurrency=default_pool())
        .select_columns(["doc_id", "lang_pred"])
    )


def fingerprint_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fingerprint, batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
    )


def minhash_pairs_docs(sf_dir: str) -> "rd.Dataset":
    return minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.5, concurrency=None
    )


def simhash_pairs_docs(sf_dir: str) -> "rd.Dataset":
    return simhash_pairs(
        _docs(sf_dir, ["doc_id", "text"]), max_hamming=3, concurrency=None
    )


def embed_neardup(sf_dir: str, threshold: float = 0.35) -> pa.Table:
    """Embedding-cosine near-dup pairs (brute-force exactness baseline)."""
    from ..functions.similarity import cosine_pairs_bruteforce

    got = cosine_pairs_bruteforce(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        threshold=threshold,
    ).to_pandas()
    got = got.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.table(
        {
            "vec_a": pa.array(got["vec_a"], pa.int64()),
            "vec_b": pa.array(got["vec_b"], pa.int64()),
            "sim": pa.compute.round(
                pa.array(got["sim"], pa.float64()), 4,
                round_mode="half_towards_infinity",
            ),
        }
    )


def embed_neardup_lsh(sf_dir: str, threshold: float = 0.35) -> "rd.Dataset":
    """LSH-bucketed variant (the 100 TB path; recall < 1 by design)."""
    from ..functions.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        threshold=threshold,
    )


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q = t.filter(pa.compute.equal(t["vec_id"], 0))["embedding"].to_pylist()[0]
    return np.asarray([q], dtype=np.float64)


def knn_vec0(sf_dir: str) -> pa.Table:
    """Top-10 cosine neighbours of vec_id=0 (incl. itself, sim≈1)."""
    got = knn_brute_force(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        _query_vec(sf_dir),
        k=10,
        concurrency=None,
    )
    return pa.table(
        {
            "vec_id": pa.array(got["vec_id"], pa.int64()),
            "sim": pa.compute.round(
                pa.array(got["sim"].to_numpy(), pa.float64()), 4,
                round_mode="half_towards_infinity",
            ),
        }
    )


def knn_ivf_vec0(sf_dir: str) -> pa.Table:
    got = knn_ivf(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        _query_vec(sf_dir),
        k=10,
        n_clusters=16,
        nprobe=6,
        concurrency=None,
    )
    return pa.table(
        {
            "vec_id": pa.array(got["vec_id"], pa.int64()),
            "sim": pa.compute.round(
                pa.array(got["sim"].to_numpy(), pa.float64()), 4,
                round_mode="half_towards_infinity",
            ),
        }
    )
