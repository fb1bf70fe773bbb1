"""Multimodal driver queries: REAL decode over synthesized media payloads.

The reference shovels opaque Buffers through its Message envelope without
interpreting them (src/core/message.js:57-58); these pipelines are the
100 TB-training-data extension of that idea — ``payload: binary`` columns
decoded by actor-pool stages (SURVEY.md §2, multimodal family).

Shape (fully distributed, no driver loops):

  read documents.parquet (doc_id ONLY — pruned read)
    → map_batches(synth_media_from_ids)   # deterministic payload per id
    → media_pipeline(..., codec="real")   # actor pool, genuine BMP/PPM/WAV
                                          # header + pixel/sample parsing
    → closed-form stats columns

Because ``synth_media_from_ids`` embeds pixels/samples that are pure
arithmetic in the id (see its docstring), DuckDB can compute the SAME stats
straight from ``documents.doc_id`` — the decode path is hash-verified by
the driver's oracle gate end to end. A broken header walk, row-padding
bug, or channel-order swap shows up as a value-hash mismatch.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ..stages.multimodal import media_pipeline, synth_media_from_ids


def _doc_ids(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )


def _media(sf_dir: str, kind: str) -> "rd.Dataset":
    def synth(t: pa.Table) -> pa.Table:
        return synth_media_from_ids(t["doc_id"].to_pylist(), kind=kind)

    return _doc_ids(sf_dir).map_batches(synth, batch_format="pyarrow")


def media_image_stats(sf_dir: str) -> "rd.Dataset":
    """Per-image decoded dims + mean pixel (BMP for even ids, PPM for odd —
    both real parse paths covered in one query)."""
    out = media_pipeline(
        _media(sf_dir, "image"), "features", codec="real", batch_size=256
    )
    return out.select_columns(["media_id", "decoded_w", "decoded_h", "mean_pixel"])


def media_audio_stats(sf_dir: str) -> "rd.Dataset":
    """Per-clip decoded sample count / rate / duration / amplitude stats
    from genuine RIFF chunk walking."""
    out = media_pipeline(
        _media(sf_dir, "audio"), "audio", codec="real", batch_size=256
    )
    return out.select_columns(
        ["media_id", "n_samples", "sample_rate", "duration_ms", "mean_amp"]
    )


def media_frame_stats(sf_dir: str) -> "rd.Dataset":
    """Video frame sampling: concatenated-PPM stream walked frame by frame
    (flat-map: 1 clip row → 3-5 frame rows), per-frame decoded stats."""
    return media_pipeline(
        _media(sf_dir, "video"), "frames", codec="real", batch_size=256
    )


# SQL twins — same closed-form arithmetic DuckDB-side (documents view is
# pre-registered by the driver).
Q_MEDIA_IMAGE = """
    SELECT doc_id AS media_id,
           CAST(16 + doc_id % 13 AS INT) AS decoded_w,
           CAST(16 + doc_id % 7 AS INT) AS decoded_h,
           ((doc_id*37) % 256 + (doc_id*37 + 11) % 256
            + (doc_id*37 + 22) % 256) / 3.0 AS mean_pixel
    FROM documents
"""

Q_MEDIA_AUDIO = """
    SELECT doc_id AS media_id,
           800 + (doc_id % 5) * 160 AS n_samples,
           16000 AS sample_rate,
           (800 + (doc_id % 5) * 160) * 1000 // 16000 AS duration_ms,
           CAST(doc_id % 997 - 498 AS DOUBLE) AS mean_amp
    FROM documents
"""

Q_MEDIA_FRAMES = """
    SELECT doc_id AS media_id,
           CAST(f.i AS INT) AS frame_idx,
           8 AS frame_w, 8 AS frame_h,
           CAST((doc_id*7 + f.i*13) % 256 AS DOUBLE) AS frame_mean
    FROM documents, unnest(range(3 + doc_id % 3)) AS f(i)
"""
