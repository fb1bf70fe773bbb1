"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Prints ONE JSON line:
  {"metric": "flagship_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "turns": T, "turns_per_sec": ...}

Headline = the flagship parse→enrich→route→aggregate DAG over a cached
seeded synthetic transcript table (~6M turns, ~7 GB of text), written as 256
conv-sharded parquet files (file-aligned blocks → the shuffle-free
partitioned plan). Timed twice per session: cold (worker/actor spin-up)
and warm — the warm number is the headline. Sinks land on tmpfs because on
a real cluster sink bandwidth scales with nodes. Side queries cover the
other operator families over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

--scaling: run the headline twice in fresh processes (num_cpus=8 then 32)
on the same input and report both throughputs + scaling efficiency —
the sandbox substitute for N vs 4N nodes (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DIR = os.environ.get("NSR_BENCH_DIR", "/tmp/nsr_bench")
BENCH_CONVS = int(os.environ.get("NSR_BENCH_CONVS", "80000"))  # ~6M turns


def _ensure_fixture() -> str:
    from node_shovel_ray.gen import write_fixture

    out = write_fixture(BENCH_DIR, n_convs=BENCH_CONVS, seed=42, n_files=256)
    marker = os.path.join(BENCH_DIR, ".sharding_validated")
    if not os.path.exists(marker):
        # validate the layout contract once per dataset (not per timed run):
        # the shuffle-free flagship plan depends on conv-disjoint files
        import glob as _glob

        from node_shovel_ray.sources.partitioned import validate_key_sharding

        validate_key_sharding(
            sorted(_glob.glob(os.path.join(BENCH_DIR, "transcripts", "*.parquet"))),
            "conv_id",
        )
        open(marker, "w").write("ok\n")
    return out


def _flagship(sink_dir: str) -> int:
    """Full DAG incl. sink writes + aggregate; returns turns processed."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from node_shovel_ray.pipelines import flagship

    from node_shovel_ray.sources.partitioned import read_partitioned_parquet

    meta = pq.read_table(os.path.join(BENCH_DIR, "conv_meta.parquet"))
    # fixture files are conv-sharded → file-aligned blocks → block-local seq
    # numbering, no shuffle of the wide text rows
    ds = read_partitioned_parquet(os.path.join(BENCH_DIR, "transcripts"))
    res = flagship.run(ds, meta, out_dir=sink_dir, assume_partitioned=True)
    counts = res["counts"].to_pandas()
    primaries = counts[counts["sink_tag"] != "audit"]
    return int(primaries["n"].sum())


def _flagship_fallback(sink_dir: str) -> int:
    """The NON-partitioned plan: default parquet read (files split across
    blocks, no layout contract) + keyed-exchange sequence numbering
    (stages/enrich.seq_number) — what a 100 TB run pays when the input is
    NOT conv-sharded. Measured so the fallback's cost is a number in
    BASELINE.md, not a note (VERDICT r2 #8)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from node_shovel_ray.pipelines import flagship

    meta = pq.read_table(os.path.join(BENCH_DIR, "conv_meta.parquet"))
    ds = rd.read_parquet(os.path.join(BENCH_DIR, "transcripts"))
    res = flagship.run(ds, meta, out_dir=sink_dir, assume_partitioned=False)
    counts = res["counts"].to_pandas()
    primaries = counts[counts["sink_tag"] != "audit"]
    return int(primaries["n"].sum())


def _side_queries() -> dict[str, float]:
    """One timed representative per operator family over SF_DIR."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from node_shovel_ray.functions.dedup import dedup_exact_counts, minhash_lsh_pairs
    from node_shovel_ray.functions.similarity import knn_brute_force
    from node_shovel_ray.functions.textstats import quality_score, token_count
    from node_shovel_ray.pipelines import flagship

    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)

    timed(
        "transcript_dag_events",
        lambda: flagship.from_events(
            rd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
        )["counts"].to_pandas(),
    )
    timed(
        "transcript_dag_skew_salted",
        lambda: flagship.from_events(
            rd.read_parquet(os.path.join(SF_DIR, "events.parquet")),
            skew_aware=True,
        )["counts"].to_pandas(),
    )
    timed(
        "dedup_exact_docs",
        lambda: dedup_exact_counts(
            rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
        ).count(),
    )
    timed(
        "minhash_lsh_docs",
        lambda: minhash_lsh_pairs(
            rd.read_parquet(os.path.join(SF_DIR, "documents.parquet")),
            threshold=0.5,
            concurrency=None,
        ).count(),
    )

    def _knn():
        t = pq.read_table(
            os.path.join(SF_DIR, "embeddings.parquet")
        )
        q = np.stack(t["embedding"].to_pandas().head(8).to_numpy())
        knn_brute_force(rd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet")), q, k=10)

    timed("knn_embeddings", _knn)
    timed(
        "textstats_docs",
        lambda: rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
        .map_batches(token_count, batch_format="pyarrow")
        .map_batches(quality_score, batch_format="pyarrow")
        .count(),
    )

    from node_shovel_ray.pipelines import corpus

    timed("curation_pipeline", lambda: corpus.curated_docs(SF_DIR).count())
    timed("pack_docs", lambda: corpus.pack_docs_seq(SF_DIR).count())
    timed("embed_neardup_tiled", lambda: corpus.embed_neardup(SF_DIR).count())
    timed("unigram_lm", lambda: corpus.unigram_logprob_docs(SF_DIR).count())

    # r4 operators: Bloom-pre-filtered decontamination, cross-doc n-gram
    # duplication, real multimodal decode (BMP wire codec → pixel stats)
    from node_shovel_ray.pipelines import media

    timed(
        "decontaminate_bloom",
        lambda: corpus.decontaminate_bloom_docs(SF_DIR).count(),
    )
    timed("crossdoc_grams", lambda: corpus.crossdoc_gram_docs(SF_DIR).count())
    timed("media_decode", lambda: media.media_image_stats(SF_DIR).count())

    # r5: end-to-end near-duplicate REMOVAL (MinHash-LSH pairs → star-
    # contraction connected components → anti-join drop), fully
    # distributed (no driver-side pair list / union-find / drop set)
    from node_shovel_ray.functions.dedup import dedup_near

    timed(
        "neardup_removal",
        lambda: dedup_near(
            rd.read_parquet(os.path.join(SF_DIR, "documents.parquet")),
            threshold=0.5,
            cc_driver_limit=0,
            drop_broadcast_limit=0,
        ).count(),
    )
    return out


def run_once() -> dict:
    import ray

    _ensure_fixture()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import shutil

    # sinks on tmpfs: on a real cluster sink bandwidth scales with nodes;
    # single-node disk would be the one artificially non-scaling resource
    sink_base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    sink_dir = f"{sink_base}/nsr_bench_out_{NUM_CPUS}"
    shutil.rmtree(sink_dir, ignore_errors=True)

    # warm page cache so we measure compute+shuffle, not first disk read
    # (count() alone reads only metadata — force a real column scan)
    import pyarrow as pa
    import ray.data as rd

    rd.read_parquet(os.path.join(BENCH_DIR, "transcripts")).map_batches(
        lambda t: pa.table({"b": pa.array([t.get_total_buffer_size()], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).count()

    plan = _flagship_fallback if os.environ.get("NSR_PLAN") == "fallback" else _flagship

    # cold run spins up workers/actor pools; warm run measures the engine.
    # NSR_WARM_RUNS>1 → min of N warm runs (least-noise estimate; the warm
    # band on this shared host spans ~2× with page-cache/object-store state)
    t0 = time.monotonic()
    turns = plan(sink_dir)
    cold = time.monotonic() - t0
    shutil.rmtree(sink_dir, ignore_errors=True)
    headline = float("inf")
    for _ in range(int(os.environ.get("NSR_WARM_RUNS", "2"))):
        t0 = time.monotonic()
        turns = plan(sink_dir)
        headline = min(headline, time.monotonic() - t0)
        shutil.rmtree(sink_dir, ignore_errors=True)

    queries = {"flagship": round(headline, 3), "flagship_cold": round(cold, 3)}
    if os.environ.get("NSR_SKIP_SIDE") != "1":
        queries.update(_side_queries())

    result = {
        "metric": "flagship_e2e_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": turns,
        "turns_per_sec": round(turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs → scaling efficiency.

    Host throughput on this shared box drifts ±50% across the hour, which
    swamps a single-pair measurement, so the legs are INTERLEAVED
    (8, 32, 8, 32 — fresh process each) and the per-level minimum (the
    least-noise capability estimate) feeds the efficiency ratio. All raw
    legs are reported for honesty.
    """
    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), NSR_SKIP_SIDE="1"
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pairs = int(os.environ.get("NSR_SCALING_PAIRS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(pairs):
        lo_runs.append(sub(8))
        hi_runs.append(sub(32))
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "turns": lo["turns"],
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "turns_per_sec_8cpu": lo["turns_per_sec"],
        "turns_per_sec_32cpu": hi["turns_per_sec"],
        "raw_sec_8cpu": [r["value"] for r in lo_runs],
        "raw_sec_32cpu": [r["value"] for r in hi_runs],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--fallback" in sys.argv:
        # non-partitioned plan (keyed-exchange seq numbering), no side queries
        os.environ["NSR_PLAN"] = "fallback"
        os.environ.setdefault("NSR_SKIP_SIDE", "1")
        out = run_once()
        out["metric"] = "flagship_fallback_e2e_sec"
        print(json.dumps(out))
    else:
        print(json.dumps(run_once()))
