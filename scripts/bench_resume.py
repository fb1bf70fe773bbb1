"""Measure resume overhead: full partitioned run vs. resumed no-op run.

Runs the flagship process over the tiny-bench fixture via ResumableRunner
(partition = a group of conv-sharded files), then re-runs the same
partition list against the same output dir — every partition must be
skipped via the manifest, so the second run's wall time IS the resume
overhead. Prints one JSON line; numbers go to BASELINE.md.
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq

from node_shovel_ray import schema as S
from node_shovel_ray.gen import write_fixture
from node_shovel_ray.pipelines import flagship
from node_shovel_ray.stages.aggregate import sink_counts
from node_shovel_ray.stages.parse import parse
from node_shovel_ray.stages.route import branch, broadcast_branch
from node_shovel_ray.state.manifest import ResumableRunner

FIX = "/tmp/nsr_resume_fix"
write_fixture(FIX, n_convs=8000, seed=42, n_files=32)
meta = pq.read_table(os.path.join(FIX, "conv_meta.parquet"))

files = sorted(glob.glob(os.path.join(FIX, "transcripts", "*.parquet")))
group = 4  # files per partition
partitions = [files[i : i + group] for i in range(0, len(files), group)]


def process(ds):
    routed = flagship.enrich_route(parse(ds), meta).materialize()
    sinks = {tag: branch(routed, tag) for tag in S.SINKS}
    sinks["audit"] = broadcast_branch(routed)
    return {"sinks": sinks, "counts": sink_counts(routed)}


out = "/tmp/nsr_resume_out"
shutil.rmtree(out, ignore_errors=True)

t0 = time.monotonic()
infos = ResumableRunner(out).run(partitions, process)
full = time.monotonic() - t0
assert all(not i["skipped"] for i in infos)

t0 = time.monotonic()
infos2 = ResumableRunner(out).run(partitions, process)
resume = time.monotonic() - t0
assert all(i["skipped"] for i in infos2)

rows = sum(i["rows_in"] for i in infos)
print(json.dumps({
    "partitions": len(partitions),
    "rows": rows,
    "full_run_sec": round(full, 2),
    "resume_noop_sec": round(resume, 3),
    "resume_overhead_pct": round(100 * resume / full, 2),
}))
ray.shutdown()
