"""Chunked binary stream source — the batch analogue of the reference's
``stream`` input (src/inputs/stream.js:7-96): read a file from a start
position in ``buffer_size``-byte chunks, one message per chunk.

Ray-native shape: the driver plans (path, offset, length) chunk ranges
from file METADATA only (one ``os.stat`` per file — no data touched on
the driver), then ``from_items(ranges) → map_batches(read)`` so every
task seeks and reads just its own ranges in parallel. Chunk boundaries
are a pure function of (size, start, buffer_size) — deterministic, so
retries/resume are equality-safe, and a re-run can skip completed chunk
ranges by offset.

``start_position`` follows the reference exactly: ``"beginning"`` → 0,
``"end"`` → file size (zero chunks — the tail-follow idiom; pair with
state/incremental.follow_once for growth), or an integer byte offset.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data as rd


def plan_chunks(
    path: str, size: int, start_position: int | str, buffer_size: int
) -> list[dict]:
    """(file, size, start, buffer) → chunk range rows. Pure/deterministic."""
    if buffer_size < 1:
        raise ValueError(f"buffer_size must be >= 1, got {buffer_size}")
    if start_position == "beginning":
        start = 0
    elif start_position == "end":
        start = size
    else:
        start = int(start_position)
        if start < 0:
            raise ValueError(f"start_position must be >= 0, got {start}")
    out = []
    idx = 0
    for off in range(start, size, buffer_size):
        out.append(
            {
                "path": path,
                "chunk_idx": idx,
                "offset": off,
                "length": min(buffer_size, size - off),
            }
        )
        idx += 1
    return out


def read_binary_stream(
    path: str,
    start_position: int | str = "beginning",
    buffer_size: int = 100_000,
    column: str = "source",
) -> "rd.Dataset":
    """Directory/glob/file → Dataset of
    ``(path, chunk_idx, offset, length, {column}: binary)`` rows.

    Mirrors the reference's chunk semantics per file; multiple files are
    the rotated-stream generalization (ordered by path). Rows arrive in
    no guaranteed order — ``(path, chunk_idx)`` is the total order key.
    """
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*")))
    else:
        files = sorted(glob.glob(path)) or [path]
    files = [f for f in files if os.path.isfile(f)]
    if not files:
        raise FileNotFoundError(f"no files under {path}")

    ranges: list[dict] = []
    for f in files:
        ranges.extend(plan_chunks(f, os.path.getsize(f), start_position, buffer_size))

    empty = pa.table(
        {
            "path": pa.array([], pa.string()),
            "chunk_idx": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            column: pa.array([], pa.binary()),
        }
    )
    if not ranges:
        return rd.from_arrow(empty)

    def read_ranges(batch: pa.Table) -> pa.Table:
        bufs: list[bytes] = []
        fh = None
        cur = None
        try:
            for p, off, ln in zip(
                batch["path"].to_pylist(),
                batch["offset"].to_pylist(),
                batch["length"].to_pylist(),
            ):
                if p != cur:
                    if fh is not None:
                        fh.close()
                    fh = open(p, "rb")
                    cur = p
                fh.seek(off)
                buf = fh.read(ln)
                if len(buf) != ln:
                    # file shrank between planning and read: fail loudly,
                    # never emit a silently short chunk
                    raise EOFError(f"{p}: expected {ln} bytes at {off}, got {len(buf)}")
                bufs.append(buf)
        finally:
            if fh is not None:
                fh.close()
        return batch.append_column(column, pa.array(bufs, pa.binary()))

    return rd.from_items(ranges).map_batches(read_ranges, batch_format="pyarrow")
