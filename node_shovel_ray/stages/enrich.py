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


from .keyed import default_pool


def lookup_enrich(
    ds: "ray.data.Dataset",
    lookup: pa.Table,
    key: str = "conv_id",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32768,
    fill: dict | None = None,
) -> "ray.data.Dataset":
    """Broadcast-join ``lookup`` onto ``ds`` (small-side join, no shuffle).

    ``concurrency`` defaults to an autoscaling pool sized to the cluster so
    the stage neither starves other operators nor throttles the stages Ray
    fuses into it.
    """
    if concurrency is None:
        concurrency = default_pool()
    ref = ray.put(lookup)
    return ds.map_batches(
        LookupEnrich,
        fn_constructor_args=(ref, key, fill),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def lookup_enrich_auto(
    ds: "ray.data.Dataset",
    lookup: "pa.Table | ray.data.Dataset",
    key: str = "conv_id",
    broadcast_max_bytes: int = 256 << 20,
    force_join: bool = False,
    **kw,
) -> "ray.data.Dataset":
    """Plan-switching enrich: broadcast join while the lookup fits the
    budget, generic shuffle hash join (stages/join.hash_join, left) when it
    does not (the 10⁹-conversation regime where a driver-held broadcast
    table stops being 'small'). Both plans produce identical rows (pinned
    by test).

    A Dataset lookup (the distributed-derivation path) is materialized —
    it is the SMALL side by contract: one row per key, narrow columns —
    and its measured ``size_bytes()`` picks the plan; under the budget the
    blocks are fetched once to the driver for the broadcast, over it they
    stay distributed and feed the shuffle join (the regime where fetching
    them would be the OOM this switch exists to prevent).
    """
    from .join import hash_join

    if isinstance(lookup, pa.Table):
        if not force_join and lookup.get_total_buffer_size() <= broadcast_max_bytes:
            return lookup_enrich(ds, lookup, key=key, **kw)
        lookup_ds = ray.data.from_arrow(lookup)
    elif force_join:
        lookup_ds = lookup
    else:
        mat = lookup.materialize()
        if mat.size_bytes() <= broadcast_max_bytes:
            # map_groups emits schema-less empty blocks for empty buckets —
            # drop them before concat
            tbls = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
            if not tbls:
                raise ValueError("empty lookup Dataset")
            tbl = pa.concat_tables(tbls).combine_chunks()
            return lookup_enrich(ds, tbl, key=key, **kw)
        lookup_ds = mat
    return hash_join(ds, lookup_ds, left_on=key, right_on=key, how="left")


def _seq_group(g: pd.DataFrame, order_col: str, out_col: str) -> pd.DataFrame:
    g = g.sort_values(order_col, kind="mergesort")
    g[out_col] = np.arange(len(g), dtype=np.int64)
    return g


def seq_number(
    ds: "ray.data.Dataset",
    key: str = "conv_id",
    order_col: str = "turn_idx",
    out_col: str = "seq_in_conv",
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """0-based dense sequence by ``order_col`` within ``key``.

    One hash-partition exchange on ``key`` + one vectorized rank per block
    (all of a block's groups at once) — NOT per-group ``map_groups``, which
    pays a Python call per conversation.
    """
    from .keyed import keyed_map_blocks, seq_rank_block

    return keyed_map_blocks(
        ds, [key], seq_rank_block(key, order_col, out_col), num_blocks=num_blocks
    )


def seq_number_local(
    ds: "ray.data.Dataset",
    key: str = "conv_id",
    order_col: str = "turn_idx",
    out_col: str = "seq_in_conv",
) -> "ray.data.Dataset":
    """Shuffle-free sequence numbering for KEY-PARTITIONED input.

    PARTITIONING ASSUMPTION (caller must guarantee): every key's rows live
    within a single input block — true when the input files are sharded by
    key hash/range (as this engine's own sinks and the fixture generator
    write them) and no file is split mid-key. At 10^12-turn scale this is
    the only sane plan: an all-to-all of the wide text rows costs more than
    the whole rest of the pipeline, while key-aligned layout makes ranking a
    block-local vectorized pass (measured ~20× cheaper). For unpartitioned
    input use :func:`seq_number` (one keyed exchange).
    """
    from .keyed import seq_rank_block

    return ds.map_batches(
        seq_rank_block(key, order_col, out_col),
        batch_format="pandas",
        batch_size=None,
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

    from .keyed import keyed_map_blocks

    def rank_chunks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "_salt", order_col], kind="mergesort")
        df["_chunk_rank"] = (
            df.groupby([key, "_salt"], sort=False).cumcount().astype("int64")
        )
        return df

    # materialize once: the counts pass AND the offset map both read
    # `ranked`; branching it lazy would re-run the keyed exchange twice
    ranked = keyed_map_blocks(salted, [key, "_salt"], rank_chunks).materialize()

    # per-(key, salt) counts — the keyed exchange already co-located every
    # (key, salt) group in ONE block, so block-local sizes ARE the global
    # counts: a cheap projection scan, not a second exchange
    # (`Dataset.groupby().count()` here sort-shuffles the whole wide rows
    # to count 1.5k groups — measured 25 s vs <1 s at sf0.1)
    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key, "_salt"], sort=False).size().reset_index(name="count()")
        )

    counts = ranked.map_batches(block_counts, batch_format="pandas").to_pandas()
    # the keyed exchange co-locates each (key, _salt) group in one *logical*
    # block, but Ray splits output blocks at target_max_block_size — a wide
    # hot-key chunk can straddle two physical blocks and emit two partial
    # rows; re-aggregate so offsets see exactly one row per (key, _salt)
    counts = counts.groupby([key, "_salt"], as_index=False)["count()"].sum()
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

    from .keyed import default_pool

    class AddOffset:
        def __init__(self):
            self.offsets = ray.get(ref).to_pandas()  # (key, _salt, _offset)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            # vectorized merge on (key, _salt) — no per-row dict lookups
            merged = b.merge(self.offsets, on=[key, "_salt"], how="left")
            b[out_col] = (
                b["_chunk_rank"].to_numpy() + merged["_offset"].to_numpy()
            ).astype("int64")
            return b.drop(columns=["_salt", "_chunk_rank"])

    # autoscaling pool: a fixed cap of 2 actors used to throttle every map
    # stage Ray fused behind it (CLAUDE.md pool-fusion hazard)
    return ranked.map_batches(
        AddOffset, batch_format="pandas", concurrency=default_pool()
    )
