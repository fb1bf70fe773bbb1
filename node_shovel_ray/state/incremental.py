"""Incremental "follow" runner — the batch analogue of the reference's
polling inputs.

The reference's http-request input polls on a cron schedule
(src/inputs/http-request.js:11-192) and its file input can tail/follow; in
a batch engine both collapse to "each invocation discovers what is NEW
since the last run and processes only that". Discovery is by the
:class:`~node_shovel_ray.state.manifest.ResumableRunner` commit manifest:
a file group is processed exactly once, no matter how often the poller
fires or crashes mid-run (the commit marker is written last).

Run :func:`follow_once` from cron / a scheduler loop; it is a no-op when
nothing new arrived. ``group_size`` batches small files into one partition
to keep output-file counts sane at 100 TB (one partition dir per group,
resumable + prunable).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from .manifest import ResumableRunner, partition_id


def discover_new(
    watch_dir: str,
    runner: ResumableRunner,
    pattern: str = "*.parquet",
    group_size: int = 1,
) -> list[list[str]]:
    """List file groups under ``watch_dir`` not yet committed.

    Grouping is deterministic (sorted order, fixed-size chunks of the
    *stable* name sequence) so a group's partition id is reproducible
    across polls — required for exactly-once skip. Note: groups are formed
    from never-seen files only; files already inside a committed group are
    never regrouped.
    """
    files = sorted(glob.glob(os.path.join(watch_dir, pattern)))
    done = runner.committed()
    seen: set[str] = set()
    for pid in done:
        marker = os.path.join(runner.manifest_dir, f"partition-{pid}.json")
        import json

        with open(marker) as fh:
            seen.update(json.load(fh).get("input_files", []))
    fresh = [f for f in files if f not in seen]
    groups = [fresh[i : i + group_size] for i in range(0, len(fresh), group_size)]
    return [g for g in groups if partition_id(g) not in done]


def follow_once(
    watch_dir: str,
    out_dir: str,
    process: Callable,
    pattern: str = "*.parquet",
    group_size: int = 1,
) -> dict:
    """One poll tick: process every new file group, commit atomically.

    ``process(ds)`` has the ResumableRunner contract (dict with "sinks"
    and optional "counts"). Returns a tick summary.
    """
    runner = ResumableRunner(out_dir)
    groups = discover_new(watch_dir, runner, pattern, group_size)
    results = runner.run(groups, process)
    return {
        "new_groups": len(groups),
        "rows_in": sum(r["rows_in"] for r in results),
        "partitions": [r["partition_id"] for r in results],
    }
