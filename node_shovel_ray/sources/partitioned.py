"""Key-partitioned parquet reading: the layout contract for shuffle-free
keyed stages (enrich.seq_number_local and friends).

Ray's default parquet read splits files into multiple blocks for
parallelism, which can cut a conversation in half mid-block. When the input
layout already shards by key (one conversation never spans files — how this
engine's own sinks and the fixture generator write), reading with
``override_num_blocks = number of files`` keeps each file exactly one block,
so every key's rows stay together and keyed stages can run block-local with
zero shuffle — the only viable plan at 10^12-turn scale.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd


def read_partitioned_parquet(
    path: str, columns: list[str] | None = None
) -> "rd.Dataset":
    """Read a key-sharded parquet directory with file-aligned blocks.

    Each input file becomes exactly one block (verified by
    tests/test_enrich.py::test_seq_number_local_on_sharded_fixture), so
    block-local keyed operators see whole key groups.
    """
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return rd.read_parquet(files, columns=columns, override_num_blocks=len(files))
