"""Multimodal column stages: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The reference moves opaque Buffers through its Message envelope
(``source``/``payload`` may be a Buffer, src/core/message.js:57-58) without
interpreting them; at 100 TB training-data scale the same idea becomes a
``payload: binary`` column + sidecar metadata columns, with decode /
feature-extract / resize / frame-sample as stateful actor stages.

No image/audio codec libraries exist in this container, so the CODEC step is
stubbed: ``codec="real"`` raises NotImplementedError at actor construction;
``codec="fake"`` (default) is a deterministic stand-in that exercises every
piece of real plumbing — schema handling, binary buffers through the object
store, actor-pool lifecycle, small-batch sizing for large payloads, output
layout. Swap the ``_decode_*`` methods for Pillow/libsndfile/pyav calls on a
real cluster; nothing else changes.

Batch-size guidance (memory-aware): with B-byte payloads and batch size N,
a worker holds ~N×B decoded bytes — size ``batch_size`` so
``batch_size × payload_bytes × concurrency`` fits the heap (e.g. 4 MB
images → batch_size ≤ 64 at 8 actors on a 16 GB worker).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),       # opaque encoded bytes
        ("format", pa.string()),        # jpeg | wav | mp4 | ...
        ("width", pa.int32()),          # images/video; -1 otherwise
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),    # audio; -1 otherwise
        ("duration_ms", pa.int32()),    # audio/video; -1 otherwise
    ]
)


def gen_media(n: int = 64, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic fake media table (seeded payload bytes + metadata)."""
    # per-kind seed must not use Python hash() (salted per process)
    kind_seed = int.from_bytes(hashlib.sha256(kind.encode()).digest()[:4], "little")
    rng = np.random.default_rng([seed, kind_seed])
    payloads, fmts, ws, hs, srs, durs = [], [], [], [], [], []
    for i in range(n):
        size = int(rng.integers(1024, 8192))
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        if kind == "image":
            fmts.append("jpeg")
            ws.append(int(rng.integers(64, 1024)))
            hs.append(int(rng.integers(64, 1024)))
            srs.append(-1)
            durs.append(-1)
        elif kind == "audio":
            fmts.append("wav")
            ws.append(-1)
            hs.append(-1)
            srs.append(16000)
            durs.append(int(rng.integers(500, 30000)))
        else:
            fmts.append("mp4")
            ws.append(640)
            hs.append(480)
            srs.append(-1)
            durs.append(int(rng.integers(1000, 60000)))
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "sample_rate": pa.array(srs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class _MediaActor:
    """Base: codec gate in __init__ (once per actor — the load-model slot)."""

    def __init__(self, codec: str = "fake"):
        if codec == "real":  # pragma: no cover - no codec libs in container
            raise NotImplementedError(
                "real decode needs Pillow/libsndfile/pyav — not in this "
                "container; swap the _decode_* methods on a real cluster"
            )
        self.codec = codec


class ImageFeatures(_MediaActor):
    """payload → feature vector + decoded dims (actor pool, small batches).

    Fake decode = deterministic bytes→pseudo-pixels; real decode would be
    ``PIL.Image.open(io.BytesIO(payload))``.
    """

    def __init__(self, codec: str = "fake", feat_dim: int = 16):
        super().__init__(codec)
        self.feat_dim = feat_dim

    def _decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        # deterministic fake: tile payload bytes into a (h', w') uint8 "image"
        arr = np.frombuffer(payload, dtype=np.uint8)
        side = max(8, int(len(arr) ** 0.5) // 2)
        need = side * side
        reps = int(np.ceil(need / len(arr)))
        return np.tile(arr, reps)[:need].reshape(side, side)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, dws, dhs = [], [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self._decode_image(payload, w, h)
            # histogram feature — stands in for an embedding model forward
            hist, _ = np.histogram(img, bins=self.feat_dim, range=(0, 256))
            feats.append((hist / max(1, hist.sum())).astype(np.float32))
            dhs.append(img.shape[0])
            dws.append(img.shape[1])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_w": pa.array(dws, pa.int32()),
                "decoded_h": pa.array(dhs, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class ImageResize(_MediaActor):
    """payload → resized payload (fake: deterministic truncate/pad)."""

    def __init__(self, codec: str = "fake", target: int = 64):
        super().__init__(codec)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        n = self.target * self.target
        for payload in batch["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            reps = int(np.ceil(n / len(arr)))
            out.append(np.tile(arr, reps)[:n].tobytes())
        t = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()),
        )
        return t.set_column(
            t.schema.get_field_index("width"), "width",
            pa.array([self.target] * len(t), pa.int32()),
        ).set_column(
            t.schema.get_field_index("height"), "height",
            pa.array([self.target] * len(t), pa.int32()),
        )


class FrameSample(_MediaActor):
    """video payload → N frame rows (flat-map: 1 row in, N out)."""

    def __init__(self, codec: str = "fake", n_frames: int = 4):
        super().__init__(codec)
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            arr = np.frombuffer(payload, dtype=np.uint8)
            step = max(1, len(arr) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(mid)
                fidx.append(i)
                frames.append(arr[i * step : (i + 1) * step].tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_pipeline(
    ds: "ray.data.Dataset",
    stage: str = "features",
    codec: str = "fake",
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Apply one multimodal stage as an actor pool with small batches
    (large binary payloads → batch_size × payload × concurrency must fit a
    worker heap)."""
    from .keyed import default_pool

    cls = {"features": ImageFeatures, "resize": ImageResize,
           "frames": FrameSample}[stage]
    return ds.map_batches(
        cls,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool(),
    )
