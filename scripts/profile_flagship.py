"""Stage-level wall-time breakdown of the flagship DAG at bench scale.
Usage: python scripts/profile_flagship.py [num_cpus]. Reads the cached bench
fixture (/tmp/nsr_bench); prints per-phase seconds and ds.stats() tails."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq
import ray.data as rd

from node_shovel_ray import schema as S
from node_shovel_ray.pipelines import flagship
from node_shovel_ray.stages.aggregate import sink_counts
from node_shovel_ray.stages.parse import parse
from node_shovel_ray.stages.route import branch, broadcast_branch

BENCH = "/tmp/nsr_bench"
meta = pq.read_table(os.path.join(BENCH, "conv_meta.parquet"))

t0 = time.monotonic()
n = rd.read_parquet(os.path.join(BENCH, "transcripts")).count()
print(f"[{time.monotonic()-t0:7.2f}s] read+count rows={n}")

def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"[{time.monotonic()-t0:7.2f}s] {label}")
    return out

ds = rd.read_parquet(os.path.join(BENCH, "transcripts"))
parsed = parse(ds)
timed("parse only (count)", lambda: parsed.count())

routed_l = flagship.enrich_route(parse(rd.read_parquet(os.path.join(BENCH, "transcripts"))), meta)
routed = timed("parse+enrich+route materialize", lambda: routed_l.materialize())
print(routed.stats()[-2500:])

timed("sink_counts from materialized", lambda: sink_counts(routed).to_pandas())
timed("write errors parquet", lambda: branch(routed, "errors").write_parquet("/tmp/prof_out/errors"))
timed("write chat parquet", lambda: branch(routed, "chat").write_parquet("/tmp/prof_out/chat"))
timed("write audit json", lambda: broadcast_branch(routed).drop_columns(["hour"]).write_json("/tmp/prof_out/audit"))
ray.shutdown()
