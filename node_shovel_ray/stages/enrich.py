"""Enrich stages: broadcast lookup join + per-conversation sequence numbering.

The reference's enrich idiom is a user pipeline UDF holding a lookup dict in
its closure, mutating ``message.content`` per message (reference pipeline
contract: README.md:212-243; closure-state pattern:
src/decoders/protobuf.js:49-63). Here:

- the conv-level lookup is a **broadcast join**: the small side is
  ``ray.put`` once on the driver and read once per actor in ``__init__``
  (never re-shipped per batch); the per-batch work is a vectorized
  ``pc.index_in`` + ``take`` — no shuffle at all.
- sequence numbering within ``conv_id`` under stable ``turn_idx`` ordering is
  a keyed ``groupby('conv_id').map_groups`` — the one shuffle this stage
  needs, on the same key as every other keyed stage. A skew-aware salted
  variant (:func:`seq_number_salted`) handles hot conversations: numbering a
  conversation whose turns dwarf a block is split into salt chunks whose
  in-chunk ranks are offset by chunk sizes — no single task ever holds the
  whole hot group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


class LookupEnrich:
    """Actor-pool stage: append lookup columns keyed by a join column.

    ``lookup_ref`` is a ``ray.put`` ObjectRef to a pyarrow.Table with the key
    column plus value columns. Reading it in ``__init__`` amortizes the fetch
    across every batch the actor processes (zero-copy from the local object
    store).
    """

    def __init__(self, lookup_ref, key: str, fill: dict | None = None):
        self.lookup: pa.Table = ray.get(lookup_ref)
        self.key = key
        self.keys = self.lookup[key].combine_chunks()
        self.fill = fill or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.key], value_set=self.keys)
        for name in self.lookup.column_names:
            if name == self.key:
                continue
            col = self.lookup[name].take(idx)
            if name in self.fill:
                col = col.fill_null(self.fill[name])
            batch = batch.append_column(name, col)
        return batch


def lookup_enrich(
    ds: "ray.data.Dataset",
    lookup: pa.Table,
    key: str = "conv_id",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 32768,
    fill: dict | None = None,
) -> "ray.data.Dataset":
    """Broadcast-join ``lookup`` onto ``ds`` (small-side join, no shuffle).

    ``concurrency`` defaults to an autoscaling (1, 4) pool so the stage never
    reserves every CPU of a small session and starves the read/shuffle
    operators (pool sizing rule from the Ray Data guide).
    """
    ref = ray.put(lookup)
    return ds.map_batches(
        LookupEnrich,
        fn_constructor_args=(ref, key, fill),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def _seq_group(g: pd.DataFrame, order_col: str, out_col: str) -> pd.DataFrame:
    g = g.sort_values(order_col, kind="mergesort")
    g[out_col] = np.arange(len(g), dtype=np.int64)
    return g


def seq_number(
    ds: "ray.data.Dataset",
    key: str = "conv_id",
    order_col: str = "turn_idx",
    out_col: str = "seq_in_conv",
) -> "ray.data.Dataset":
    """0-based dense sequence by ``order_col`` within ``key`` (one shuffle)."""
    return ds.groupby(key).map_groups(
        lambda g: _seq_group(g, order_col, out_col), batch_format="pandas"
    )


def seq_number_salted(
    ds: "ray.data.Dataset",
    key: str = "conv_id",
    order_col: str = "turn_idx",
    out_col: str = "seq_in_conv",
    chunk: int = 100_000,
) -> "ray.data.Dataset":
    """Skew-aware sequence numbering for hot keys (SURVEY.md §7.5).

    Two-phase: (1) salt = order_col // chunk bounds every group a task sees
    to ``chunk`` rows; rank within (key, salt). (2) a tiny aggregate of
    per-chunk counts yields each chunk's global offset, broadcast back and
    added vectorized. Requires ``order_col`` to be non-negative and unique
    within key (true for turn_idx); ranks equal the dense rank of order_col.
    """
    def add_salt(t: pa.Table) -> pa.Table:
        salt = pc.cast(pc.divide(pc.cast(t[order_col], pa.int64()), chunk), pa.int64())
        return t.append_column("_salt", salt)

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)

    def rank_chunk(g: pd.DataFrame) -> pd.DataFrame:
        return _seq_group(g, order_col, "_chunk_rank")

    ranked = salted.groupby([key, "_salt"]).map_groups(
        rank_chunk, batch_format="pandas"
    )

    # per-(key, salt) counts — tiny table (one row per chunk) → driver-safe
    counts = ranked.groupby([key, "_salt"]).count().to_pandas()
    counts = counts.sort_values([key, "_salt"], kind="mergesort")
    counts["_offset"] = counts.groupby(key)["count()"].cumsum() - counts["count()"]
    offsets = pa.table(
        {
            key: pa.array(counts[key], pa.string()),
            "_salt": pa.array(counts["_salt"], pa.int64()),
            "_offset": pa.array(counts["_offset"], pa.int64()),
        }
    )
    ref = ray.put(offsets)

    class AddOffset:
        def __init__(self):
            tbl = ray.get(ref)
            self.lut = {
                (k, s): o
                for k, s, o in zip(
                    tbl[key].to_pylist(),
                    tbl["_salt"].to_pylist(),
                    tbl["_offset"].to_pylist(),
                )
            }

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            off = [
                self.lut[(k, s)] for k, s in zip(b[key].to_numpy(), b["_salt"].to_numpy())
            ]
            b[out_col] = b["_chunk_rank"].to_numpy() + np.asarray(off, dtype=np.int64)
            return b.drop(columns=["_salt", "_chunk_rank"])

    return ranked.map_batches(AddOffset, batch_format="pandas", concurrency=(1, 2))
