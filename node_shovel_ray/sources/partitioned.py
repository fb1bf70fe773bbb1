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
    path: str, columns: list[str] | None = None, validate_key: str | None = None
) -> "rd.Dataset":
    """Read a key-sharded parquet directory with file-aligned blocks.

    Each input file becomes exactly one block (verified by
    tests/test_enrich.py::test_seq_number_local_on_sharded_fixture), so
    block-local keyed operators see whole key groups.

    ``validate_key``: name of the sharding key column — when given, the
    layout contract ("no key value spans two files") is CHECKED before
    reading, from parquet footer min/max statistics alone (metadata-only,
    no data I/O): if every file's [min, max] key range is disjoint from
    every other's, no key can live in two files. Foreign/mis-sharded data
    fails loudly instead of being silently mis-numbered.
    """
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    if validate_key is not None and len(files) > 1:
        validate_key_sharding(files, validate_key)
    return rd.read_parquet(files, columns=columns, override_num_blocks=len(files))


def validate_key_sharding(files: list[str], key: str) -> None:
    """Assert no ``key`` value appears in more than one file.

    Two tiers:

    1. **Metadata-only accept** — row-group min/max statistics from every
       footer; if all files' key ranges are pairwise disjoint, no key can
       span files (range-sharded layouts pass with zero data I/O).
    2. **Exact distributed check** — interleaved-but-valid layouts
       (hash/round-robin sharding, like this engine's own sinks) have
       overlapping ranges, so fall through to reading ONLY the key column
       with file paths, pre-deduplicating (key, file) pairs per batch, and
       counting distinct files per key through one keyed exchange of the
       deduped pairs. Any key seen in ≥2 files raises ``ValueError``.
    """
    import pyarrow.parquet as pq

    ranges = []
    have_stats = True
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        if key not in names:
            raise ValueError(f"sharding key {key!r} not in {f}")
        ci = names.index(key)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                have_stats = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if not have_stats:
            break
        if mins:
            ranges.append((min(mins), max(maxs)))
    if have_stats:
        ranges.sort()
        if all(b_lo > a_hi for (_, a_hi), (b_lo, _) in zip(ranges, ranges[1:])):
            return  # disjoint ranges → provably no spanning key

    # tier 2: exact, key column only, distributed
    import pandas as pd

    ds = rd.read_parquet(files, columns=[key], include_paths=True)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates([key, "path"])

    pairs = ds.map_batches(dedup_pairs, batch_format="pandas")

    from ..stages.keyed import keyed_map_blocks

    def violators(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby(key, sort=False)["path"].nunique()
        bad = n[n > 1]
        return pd.DataFrame({key: bad.index.to_numpy(), "n_files": bad.to_numpy()})

    bad_rows = keyed_map_blocks(pairs, [key], violators).limit(5).take_all()
    if bad_rows:
        examples = ", ".join(f"{r[key]!r}({r['n_files']} files)" for r in bad_rows)
        raise ValueError(
            f"key sharding violated: {key!r} values span multiple files "
            f"(e.g. {examples}) — re-shard or use the keyed exchange path "
            "(stages.keyed.keyed_map_blocks)"
        )
