"""Resumable partitioned execution with per-partition lineage + metrics.

Reference durability model: every message is LevelDB-put on enqueue and
deleted on final ack; a crashed worker replays the whole DB on startup
(src/queues/batch.js:197-207, 84-95) — at-least-once, duplicate-prone.
The rebuild is partition-grained and effectively exactly-once:

- output layout: ``out/sink=<tag>/part-<pid>/`` written to a temp dir and
  atomically renamed on success (same-filesystem ``os.rename``);
- commit marker: ``out/_manifest/partition-<pid>.json`` written *last*,
  recording lineage (input files, row counts per sink, wall time);
- resume: a new run lists ``_manifest/`` and skips committed partitions —
  re-running a partition is idempotent because every stage is a pure
  function of its input files (no CUIDs, no wall-clock);
- aggregates: each partition writes partial counts
  (``_manifest/aggregates-partial/<pid>.parquet``); finals are re-reduced
  from partials so a resumed run never double-counts.

Partitioning assumption (documented per SURVEY.md §7.5): keyed stages
(sequence numbering, dedup) require each key's rows to live in one
partition — i.e. inputs are sharded by hash/range of the key, as this
engine's own sinks write them.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def partition_id(files: list[str]) -> str:
    h = hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:16]
    return h


class ResumableRunner:
    """Run ``process`` over input partitions, committing each atomically.

    ``process(ds)`` → dict with ``"sinks": {tag: Dataset}`` and optionally
    ``"counts": Dataset`` (partial aggregate rows for this partition).
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.partial_dir = os.path.join(self.manifest_dir, "aggregates-partial")
        self.tmp_dir = os.path.join(out_dir, "_tmp")
        for d in (self.manifest_dir, self.partial_dir, self.tmp_dir):
            os.makedirs(d, exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------

    def _marker(self, pid: str) -> str:
        return os.path.join(self.manifest_dir, f"partition-{pid}.json")

    def committed(self) -> set[str]:
        out = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("partition-") and f.endswith(".json"):
                out.add(f[len("partition-") : -len(".json")])
        return out

    # -- execution ------------------------------------------------------------

    def _atomic_write_parquet(self, ds: "ray.data.Dataset", final: str, pid: str) -> int:
        tmp = os.path.join(self.tmp_dir, f"{pid}-{os.path.basename(final)}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)  # an empty sink writes no files but must still commit
        ds.write_parquet(tmp)
        n = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
                for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.rename(tmp, final)
        return n

    def run_partition(self, files: list[str], process: Callable) -> dict:
        pid = partition_id(files)
        if os.path.exists(self._marker(pid)):
            with open(self._marker(pid)) as fh:
                info = json.load(fh)
            info["skipped"] = True
            return info

        from .metrics import parse_operator_stats, stage_counters

        t0 = time.monotonic()
        ds = ray.data.read_parquet(files)
        n_in = ds.count()  # parquet metadata only — no scan
        res = process(ds)
        sink_rows: dict[str, int] = {}
        operators: dict[str, list] = {}
        for tag, branch in res["sinks"].items():
            final = os.path.join(self.out_dir, f"sink={tag}", f"part-{pid}")
            sink_rows[tag] = self._atomic_write_parquet(branch, final, pid)
            try:  # per-operator wall/rows for the executed branch
                operators[tag] = parse_operator_stats(branch.stats())
            except Exception:
                operators[tag] = []
        if res.get("counts") is not None:
            partial = res["counts"].to_pandas()
            tmp = os.path.join(self.tmp_dir, f"{pid}-partial.parquet")
            pq.write_table(pa.Table.from_pandas(partial, preserve_index=False), tmp)
            os.rename(tmp, os.path.join(self.partial_dir, f"{pid}.parquet"))

        declared = res.get("counters", {})
        info = {
            "partition_id": pid,
            "input_files": sorted(files),
            "sink_rows": sink_rows,
            "rows_in": sum(sink_rows.values()),
            "counters": stage_counters(
                n_in,
                sink_rows,
                broadcast=tuple(declared.get("broadcast", ("audit",))),
                ignored=declared.get("ignored", 0),
                rejected=declared.get("rejected"),
                deadletter=tuple(declared.get("deadletter", ("rejects",))),
            ),
            "operators": operators,
            "wall_sec": round(time.monotonic() - t0, 3),
            "skipped": False,
        }
        # commit marker LAST — its presence is the transaction boundary
        tmp_marker = os.path.join(self.tmp_dir, f"{pid}-marker.json")
        with open(tmp_marker, "w") as fh:
            json.dump(info, fh, indent=1)
        os.rename(tmp_marker, self._marker(pid))
        return info

    def run(self, partitions: list[list[str]], process: Callable) -> list[dict]:
        """Run all partitions; ``_manifest/metrics.json`` is refreshed after
        EVERY committed partition (not only at the end), so an operator can
        watch counters/sink rows advance DURING a long run — the batch
        analogue of the reference's live Prometheus scrape with
        cross-worker pull aggregation (src/core/master.js:104-129,
        aggregated_metrics.js:157-209). Each refresh is an atomic rename,
        and the numbers are re-derived from commit markers, so a reader
        never sees a torn or double-counted snapshot."""
        total = len(partitions)
        infos = []
        for i, files in enumerate(partitions):
            infos.append(self.run_partition(files, process))
            self._write_metrics(status="running", done=i + 1, total=total)
        self._write_metrics(status="complete", done=total, total=total)
        return infos

    # -- operational metrics --------------------------------------------------

    def metrics(self) -> dict:
        """Aggregate every committed partition's counters + operator stats
        into one run-level dump — the analogue of the reference's
        cluster-aggregated metrics registry
        (src/core/aggregated_metrics.js:100-209). Re-derived from the
        commit markers, so it is resume-safe (never double-counts)."""
        from .metrics import merge_counters

        parts = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("partition-") and f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    parts.append(json.load(fh))
        sink_totals: dict[str, int] = {}
        op_wall: dict[str, float] = {}
        for p in parts:
            for tag, n in p.get("sink_rows", {}).items():
                sink_totals[tag] = sink_totals.get(tag, 0) + n
            for ops in p.get("operators", {}).values():
                for op in ops:
                    op_wall[op["operator"]] = round(
                        op_wall.get(op["operator"], 0.0) + op["wall_sec"], 3
                    )
        return {
            "n_partitions": len(parts),
            "counters": merge_counters([p.get("counters", {}) for p in parts]),
            "sink_rows": sink_totals,
            "operator_wall_sec": op_wall,
            "wall_sec": round(sum(p.get("wall_sec", 0.0) for p in parts), 3),
        }

    def _write_metrics(self, status: str = "complete",
                       done: int | None = None, total: int | None = None) -> None:
        m = self.metrics()
        m["status"] = status
        if done is not None:
            m["partitions_done"] = done
        if total is not None:
            m["partitions_total"] = total
        tmp = os.path.join(self.tmp_dir, "metrics.json")
        with open(tmp, "w") as fh:
            json.dump(m, fh, indent=1)
        os.rename(tmp, os.path.join(self.manifest_dir, "metrics.json"))

    @staticmethod
    def read_live_metrics(out_dir: str) -> dict | None:
        """The scrape endpoint analogue: read the latest atomic metrics
        snapshot of a (possibly still-running) run from another process.
        Returns None before the first partition commits."""
        path = os.path.join(out_dir, "_manifest", "metrics.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    # -- final aggregates -----------------------------------------------------

    def final_counts(self, keys: list[str], n_col: str = "n") -> "pa.Table":
        """Re-reduce the per-partition partial counts (idempotent)."""
        parts = [
            pq.read_table(os.path.join(self.partial_dir, f))
            for f in sorted(os.listdir(self.partial_dir))
            if f.endswith(".parquet")
        ]
        if not parts:
            return pa.table({})
        allp = pa.concat_tables(parts)
        out = allp.group_by(keys).aggregate([(n_col, "sum")])
        return out.rename_columns(keys + [n_col])
