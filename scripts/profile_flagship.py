"""Stage-level wall-time breakdown of the flagship DAG at bench scale.

Usage: python scripts/profile_flagship.py [num_cpus]. Reads the cached
bench fixture (/tmp/nsr_bench). Profiles the HEADLINE plan (conv-sharded
read → block-local seq → single-pass multi-sink write; what bench.py
times) stage by cumulative stage, then prints the full plan's per-operator
stats. The old fan-out plan (materialize + per-branch writes) is NOT the
bench path — profile it via `bench.py --fallback` instead.
"""

import os
import shutil
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

from node_shovel_ray.pipelines import flagship
from node_shovel_ray.sources.partitioned import read_partitioned_parquet
from node_shovel_ray.stages.parse import parse
from node_shovel_ray.stages.sink import multi_sink_write

BENCH = "/tmp/nsr_bench"
OUT = "/dev/shm/prof_out" if os.path.isdir("/dev/shm") else "/tmp/prof_out"
meta = pq.read_table(os.path.join(BENCH, "conv_meta.parquet"))


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"[{time.monotonic()-t0:7.2f}s] {label}", flush=True)
    return out


def _read():
    return read_partitioned_parquet(os.path.join(BENCH, "transcripts"))


# cumulative prefixes of the headline plan — the delta between successive
# lines is that stage's marginal cost (all task-fused where Ray allows)
timed("read (force full scan)", lambda: _read().map_batches(
    lambda t: t.select(["conv_id"]).slice(0, 1), batch_format="pyarrow").count())
timed("read+parse", lambda: parse(_read()).count())
timed("read+parse+enrich+route", lambda: flagship.enrich_route(
    parse(_read()), meta, assume_partitioned=True).count())


def full():
    shutil.rmtree(OUT, ignore_errors=True)
    routed = flagship.enrich_route(parse(_read()), meta, assume_partitioned=True)
    counts = multi_sink_write(routed, OUT)
    df = counts.to_pandas()
    return counts, df


counts, df = timed("FULL single-pass plan (4 sinks + counts)", full)
print(counts.stats()[-3000:])
shutil.rmtree(OUT, ignore_errors=True)
ray.shutdown()
