"""The flagship parse → enrich → route → aggregate DAG.

This is the Ray-Data-native equivalent of a full shovel pipeline YAML —
input → decoder → pipeline → encoder → queue → output
(reference wiring: src/core/processor.js:79-84) — over transcript tables:

  read → [transcriptify] → parse → lookup-enrich → seq-number → route →
    ├─ sink 'errors'  (Parquet)
    ├─ sink 'tools'   (Parquet)
    ├─ sink 'chat'    (Parquet)
    ├─ sink 'audit'   (JSONL, broadcast: priority >= 2)
    └─ sink_counts    (groupby aggregate keyed (sink_tag, role, tool, hour))

Fan-out note (SURVEY.md §7.5): branching an unmaterialized Dataset
recomputes upstream per branch, so when multiple sinks are written the
routed dataset is materialized once — the analogue of shovel duplicating a
message in-process for its pipeline output (src/outputs/pipeline.js:18-30).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import schema as S
from ..stages.aggregate import hour_floor, sink_counts
from ..stages.enrich import (
    lookup_enrich_auto,
    seq_number,
    seq_number_local,
    seq_number_salted,
)
from ..stages.parse import parse
from ..stages.route import assign_sink_tag, branch, broadcast_branch
from ..stages.transcriptify import transcriptify


def build_conv_meta_ds(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Derive the conv-level lookup from distinct user ids — DISTRIBUTED.

    Same formulas as sql_oracle.CONV_META_CTE — pure integer ops on user_id.
    Plan: per-batch ``pc.unique`` pre-combine (the exchange carries at most
    one row per (block, uid), never the events), then one keyed exchange
    dedups globally and derives the meta columns vectorized per bucket. The
    distinct set NEVER lands on the driver — at the 10⁹-conversation regime
    a driver-side ``events.unique()`` set is a multi-GB OOM; here the
    result stays a Dataset and stages/enrich.lookup_enrich_auto decides
    broadcast vs shuffle join from its measured size.
    """
    from ..stages.keyed import keyed_map_blocks

    def batch_unique(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t["user_id"])})

    pre = events.select_columns(["user_id"]).map_batches(
        batch_unique, batch_format="pyarrow", zero_copy_batch=True
    )

    channels = np.array(["api", "web", "cli"])

    def derive(df) -> pa.Table:
        u = np.unique(df["user_id"].to_numpy(np.int64))
        return pa.table(
            {
                "conv_id": pa.array(np.char.mod("conv-%08d", u), pa.string()),
                "tenant": pa.array(np.char.mod("tenant-%d", u % 10), pa.string()),
                "channel": pa.array(channels[u % 3], pa.string()),
                "priority": pa.array((u % 4).astype(np.int32), pa.int32()),
            },
            schema=S.CONV_META,
        )

    return keyed_map_blocks(pre, ["user_id"], derive)


def _add_hour(batch: pa.Table) -> pa.Table:
    return batch.append_column("hour", hour_floor(batch["ts"]))


def enrich_route(
    parsed: "ray.data.Dataset",
    conv_meta: "pa.Table | ray.data.Dataset",
    skew_aware: bool = False,
    assume_partitioned: bool = False,
    broadcast_max_bytes: int = 256 << 20,
) -> "ray.data.Dataset":
    """parsed → enriched+routed dataset (schema.ENRICHED + audit flag).

    ``conv_meta`` may be a driver-held Arrow table (small lookups) or a
    Dataset (the distributed derivation); ``lookup_enrich_auto`` picks the
    broadcast plan while the lookup fits ``broadcast_max_bytes`` and a
    shuffle hash join beyond it — the headline pipeline is protected
    either way.

    ``assume_partitioned=True`` ⇒ input blocks are conv-aligned (key-sharded
    files): sequence numbering runs block-local with no shuffle (the
    10^12-turn plan; see enrich.seq_number_local for the contract).
    """
    ds = lookup_enrich_auto(
        parsed, conv_meta, key="conv_id", broadcast_max_bytes=broadcast_max_bytes
    )
    if assume_partitioned:
        seq = seq_number_local
    elif skew_aware:
        seq = seq_number_salted
    else:
        seq = seq_number
    ds = seq(ds, key="conv_id", order_col="turn_idx", out_col="seq_in_conv")
    ds = ds.map_batches(_add_hour, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(assign_sink_tag, batch_format="pyarrow", zero_copy_batch=True)


def run(
    transcripts: "ray.data.Dataset",
    conv_meta: "pa.Table | ray.data.Dataset",
    out_dir: str | None = None,
    skew_aware: bool = False,
    assume_partitioned: bool = False,
) -> dict:
    """Execute the full DAG; optionally write the four sinks under out_dir.

    Returns {"routed": Dataset, "counts": Dataset, "sinks": {tag: path|Dataset}}.
    """
    parsed = parse(transcripts)
    routed = enrich_route(
        parsed, conv_meta, skew_aware=skew_aware,
        assume_partitioned=assume_partitioned,
    )
    if out_dir is not None:
        # single-pass sinks for BOTH plans: route + write all 4 sinks +
        # pre-aggregate counts in one scan — no materialize, no per-branch
        # re-reads (the fallback plan used to materialize then make 4
        # filtered write passes: N+1 scans of the routed data)
        from ..stages.sink import multi_sink_write

        # materialize the (tiny) counts so the sink files are on disk when
        # run() returns — the write is a side effect of this one scan
        counts = multi_sink_write(routed, out_dir).materialize()
        sinks = {
            tag: os.path.join(out_dir, f"sink={tag}")
            for tag in (*S.SINKS, S.AUDIT_SINK)
        }
        return {"routed": routed, "counts": counts, "sinks": sinks}
    sinks: dict[str, object] = {
        tag: branch(routed, tag) for tag in S.SINKS
    }
    sinks[S.AUDIT_SINK] = broadcast_branch(routed)
    counts = sink_counts(routed)
    return {"routed": routed, "counts": counts, "sinks": sinks}


def from_events(events: "ray.data.Dataset", **kw) -> dict:
    """events table → full DAG (transcriptify first). The enrich lookup is
    derived distributed (never a driver-side distinct set)."""
    t = transcriptify(events)
    meta = build_conv_meta_ds(events)
    return run(t, meta, **kw)


def repeated_turns(
    transcripts: "ray.data.Dataset", min_convs: int = 2
) -> "ray.data.Dataset":
    """Cross-conversation repeated-turn detection: every turn TEXT that
    appears in ≥ ``min_convs`` distinct conversations, with its
    conversation count — the transcript-side boilerplate signal (canned
    assistant responses, templated system turns) mirroring the corpus
    line-dedup op.

    Exactness: a (conv_id, text) pair can straddle read batches, so the
    per-batch distinct is only a pre-SHRINK (never affects the global
    distinct set); the real count-distinct happens after one keyed
    exchange on the text (each text's survivors co-located), where
    nunique(conv_id) per text is exact. Shipped rows are the batch-local
    distinct (conv, text) pairs — far fewer than turns when turns repeat
    within a conversation."""
    import pandas as pd

    from ..stages.keyed import keyed_map_blocks

    def shrink(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "text"]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(), preserve_index=False
        )

    pairs = transcripts.map_batches(shrink, batch_format="pyarrow")

    def count_convs(df: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            df.drop_duplicates()
            .groupby("text", sort=False)["conv_id"]
            .size()
            .reset_index(name="n_convs")
        )
        return out[out["n_convs"] >= min_convs]

    return keyed_map_blocks(pairs, ["text"], count_convs)
