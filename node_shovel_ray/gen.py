"""Seeded, deterministic synthetic transcript generator (FIXTURES.md §1-§2).

Replaces the reference's nondeterministic CUID/`new Date()` defaults
(reference: src/core/message.js:54-55) with fully reproducible content: the
same ``(seed, n_convs)`` always yields byte-identical tables, so retries and
resume runs can be equality-checked.

Vectorized with numpy/pandas so the bench-scale table (10M+ turns) generates
in seconds; files interleave conversation ranges so stable-ordering logic is
actually exercised (FIXTURES.md §1).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import schema as S

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")
TOOLS = np.array(["bash", "search", "read_file", "write_file", "http"])
ROLES = np.array(["user", "assistant", "tool"])
TENANTS = np.array([f"tenant-{i}" for i in range(10)])
CHANNELS = np.array(["api", "web", "cli"])

# span size for chunked generation: ~77 turns/conv x ~1.1 KB text must stay
# under Arrow's 2 GiB single-array limit
_SPAN = 12_000

_LOREM = (
    "log pipeline shovel message queue batch stream parse route enrich "
    "aggregate sink source decode encode worker master ack nack retry "
    "buffer flush commit offset partition shard replay lineage metric"
).split()


def _filler_pool(rng: np.random.Generator, pool_size: int = 512) -> np.ndarray:
    """Pool of seeded filler phrases, 20-2000 chars each."""
    out = []
    for _ in range(pool_size):
        n = int(rng.integers(4, 320))
        words = rng.choice(_LOREM, size=n)
        out.append(" ".join(words.tolist()))
    return np.array(out, dtype=object)


def gen_transcripts(
    n_convs: int = 100, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Return (transcripts, conv_meta) Arrow tables.

    Turns-per-conv ~ Zipf(s=1.2) clipped to [1, 200] → includes hot
    conversations for skew tests. Text embeds the parse targets of
    FIXTURES.md §1.1; ~1% of rows are regex-hostile (unclosed tool tag,
    embedded newline, non-ASCII) and must be flagged, not thrown
    (reference reject contract: src/core/node.js:461-466).

    Generated in spans of ≤12k convs (chunked arrays): a bench-scale text
    column would overflow Arrow's 2 GiB single-array offset limit.
    """
    if n_convs > _SPAN:
        spans = [
            _gen_span(k0, min(_SPAN, n_convs - k0), seed)
            for k0 in range(0, n_convs, _SPAN)
        ]
        transcripts = pa.concat_tables(spans)
    else:
        transcripts = _gen_span(0, n_convs, seed)
    return transcripts, gen_conv_meta(n_convs)


def gen_conv_meta(n_convs: int) -> pa.Table:
    """Deterministic conv-level lookup (FIXTURES.md §2) — pure formulas."""
    ks = np.arange(n_convs, dtype=np.int64)
    return pa.table(
        {
            "conv_id": pa.array([f"conv-{k:08d}" for k in ks], pa.string()),
            "tenant": pa.array(TENANTS[(ks * 7) % 10], pa.string()),
            "channel": pa.array(CHANNELS[ks % 3], pa.string()),
            "priority": pa.array((ks * 13) % 4, pa.int32()),
        },
        schema=S.CONV_META,
    )


def _gen_span(k0: int, n_convs: int, seed: int) -> pa.Table:
    """Transcript rows for convs [k0, k0+n_convs); deterministic per span."""
    rng = np.random.default_rng([seed, k0])
    lens = np.clip(rng.zipf(1.2, size=n_convs), 1, 200).astype(np.int64)
    total = int(lens.sum())
    conv_k = np.repeat(np.arange(k0, k0 + n_convs, dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, lens)).astype(
        np.int32
    )

    import pyarrow.compute as pc

    conv_id = pc.binary_join_element_wise(
        "conv-", pc.utf8_lpad(pc.cast(pa.array(conv_k), pa.string()), 8, "0"), ""
    )

    role = ROLES[turn_idx % 3].astype(object)
    role[rng.random(total) < 0.05] = "system"
    role_arr = pa.array(role, pa.string())

    tool_mask = rng.random(total) < 0.30
    hostile_mask = rng.random(total) < 0.01
    tool_mask &= ~hostile_mask  # hostile rows never carry a well-formed tool
    tool = np.where(tool_mask, rng.choice(TOOLS, size=total), "").astype(object)
    tool_arr = pa.array(tool, pa.string())

    err_mask = rng.random(total) < 0.08
    err_num = rng.integers(0, 10000, size=total)
    roletag_mask = rng.random(total) < 0.30

    # all text assembly in Arrow C kernels — object-dtype concat is ~100×
    # slower at bench scale
    filler = pc.take(
        pa.array(_filler_pool(rng), pa.string()),
        pa.array(rng.integers(0, 512, size=total), pa.int64()),
    )
    cat = pc.binary_join_element_wise
    empty = pa.scalar("")
    prefix = pc.if_else(
        pa.array(roletag_mask), cat("[role=", role_arr, "] ", ""), empty
    )
    args = pc.cast(pa.array(err_num % 97), pa.string())
    toolpart = pc.if_else(
        pa.array(tool_mask),
        cat(" <tool:", tool_arr, ' args="k=', args, '">call</tool>', ""),
        empty,
    )
    errpart = pc.if_else(
        pa.array(err_mask),
        cat(" ERR-", pc.utf8_lpad(pc.cast(pa.array(err_num), pa.string()), 4, "0"), ""),
        empty,
    )
    hostile_kind = rng.integers(0, 3, size=total)
    h0 = pa.array(hostile_mask & (hostile_kind == 0))
    h1 = pa.array(hostile_mask & (hostile_kind == 1))
    h2 = pa.array(hostile_mask & (hostile_kind == 2))
    hostpart = pc.if_else(
        h0,
        ' <tool:broken args="oops>',
        pc.if_else(h1, "\nbroken [[ line", pc.if_else(h2, " non-ascii é中文 ]]", "")),
    )
    text = cat(prefix, filler, toolpart, errpart, hostpart, "")

    conv_offset_s = (conv_k * 1733) % (72 * 3600)
    ts = EPOCH + (conv_offset_s + 7 * turn_idx.astype(np.int64)) * np.timedelta64(
        1_000_000, "us"
    )

    return pa.table(
        {
            "conv_id": pc.cast(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": role_arr,
            "text": pc.cast(text, pa.string()),
            "tool": tool_arr,
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=S.TRANSCRIPTS,
    )


def write_fixture(
    out_dir: str, n_convs: int = 100, seed: int = 42, n_files: int = 8
) -> str:
    """Write conv-sharded transcript parquet + conv_meta.parquet under out_dir.

    Shard f holds convs with ``k % n_files == f`` (interleaved ranges), rows
    sorted by (conv_id, turn_idx) within each file — FIXTURES.md §1. Large
    fixtures are generated and written span-by-span (≤12k convs in memory at
    once), producing files ``part-<shard>-<span>.parquet``; every file still
    contains only whole conversations, so file-aligned reads keep keys
    together. Skips work if already written (marker file) so bench runs
    reuse the cached fixture.
    """
    marker = os.path.join(out_dir, f"_done-{n_convs}-{seed}-{n_files}")
    if os.path.exists(marker):
        return out_dir
    # stale fixture from a different config → wipe, or shards would mix
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "transcripts"), exist_ok=True)
    for k0 in range(0, n_convs, _SPAN):
        t = _gen_span(k0, min(_SPAN, n_convs - k0), seed)
        conv_k = pa.compute.cast(
            pa.compute.utf8_replace_slice(t["conv_id"], 0, 5, ""), pa.int64()
        )
        shard = pa.compute.subtract(
            conv_k, pa.compute.multiply(pa.compute.divide(conv_k, n_files), n_files)
        )
        t2 = t.append_column("_shard", pa.compute.cast(shard, pa.int64()))
        # one sort per span, then zero-copy slices per shard (n_files
        # filters would re-scan the span per file)
        t2 = t2.sort_by(
            [("_shard", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        shard_np = t2["_shard"].to_numpy()
        bounds = np.searchsorted(shard_np, np.arange(n_files + 1))
        for f in range(n_files):
            lo, hi = int(bounds[f]), int(bounds[f + 1])
            if lo == hi:
                continue
            part = t2.slice(lo, hi - lo).drop(["_shard"])
            pq.write_table(
                part,
                os.path.join(
                    out_dir, "transcripts", f"part-{f:05d}-{k0:08d}.parquet"
                ),
            )
    pq.write_table(gen_conv_meta(n_convs), os.path.join(out_dir, "conv_meta.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
