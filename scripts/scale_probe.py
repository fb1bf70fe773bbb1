"""Memory-envelope scale probe (VERDICT r3 #8): run the two headline
pipelines on a fixture ~4× the bench scale and record the PEAK object-store
footprint + spill, evidencing that block sizing / 2 GiB Arrow spans hold an
order of magnitude up from the gate scale.

Usage:
  python scripts/scale_probe.py [n_convs] [n_docs]    # defaults 320k / 10M

Outputs one JSON line:
  {"flagship": {rows, sec, peak_object_store_gb, store_total_gb, spilled_mb},
   "curation": {...}, ...}

Peak usage is sampled by a background thread polling
``ray.available_resources()['object_store_memory']`` against the total —
the same signal the autoscaler uses — plus the end-of-run
``memory_summary`` spill counters.
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = os.environ.get("NSR_PROBE_DIR", "/tmp/nsr_probe")


class StoreSampler:
    """Poll object-store availability; track peak usage."""

    def __init__(self, period_s: float = 0.25):
        import ray

        self.total = float(ray.cluster_resources().get("object_store_memory", 0))
        self.peak_used = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, args=(period_s,), daemon=True)

    def _loop(self, period_s: float):
        import ray

        while not self._stop.is_set():
            avail = float(
                ray.available_resources().get("object_store_memory", self.total)
            )
            self.peak_used = max(self.peak_used, self.total - avail)
            time.sleep(period_s)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


def spilled_mb() -> float:
    """Cumulative plasma spill from ray's memory summary (0 if none)."""
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", s)
        return float(m.group(1)) if m else 0.0
    except Exception:
        return -1.0  # summary unavailable (NaN would break strict JSON)


# ------------------------------------------------- big documents fixture


def gen_documents(out_dir: str, n_docs: int, seed: int = 7,
                  n_files: int = 64) -> str:
    """Deterministic large documents table, written shard-by-shard so the
    generator itself stays in a small memory envelope. Layout matches the
    testdata contract (doc_id/text/lang/source/n_chars); text ~60 tokens
    from a seeded vocab with planted exact duplicates (every 50th doc
    repeats the previous doc's text) so dedup has real work."""
    docs_path = os.path.join(out_dir, "documents.parquet")
    done = os.path.join(out_dir, f".docs_{n_docs}_{seed}")
    if os.path.exists(done):
        return out_dir
    os.makedirs(docs_path, exist_ok=True)
    vocab = np.array(
        ["tok%04d" % i for i in range(4096)]
        + ["the", "of", "and", "to", "in", "is", "was", "for", "on", "with"]
    )
    langs = np.array(["en", "de", "fr", "es", "pt"])
    sources = np.array(["web", "books", "code", "wiki"])
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_docs)
        if lo >= hi:
            break
        rng = np.random.default_rng([seed, f])
        n = hi - lo
        ids = np.arange(lo, hi, dtype=np.int64)
        toks = rng.choice(vocab, size=(n, 60))
        texts = np.array([" ".join(row) for row in toks])
        dup = (ids % 50 == 0) & (ids > lo)  # planted exact dups
        texts[dup] = texts[np.flatnonzero(dup) - 1]
        t = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs[ids % len(langs)], pa.string()),
                "source": pa.array(sources[ids % len(sources)], pa.string()),
                "n_chars": pa.array(np.char.str_len(texts).astype(np.int64)),
            }
        )
        pq.write_table(t, os.path.join(docs_path, f"part-{f:05d}.parquet"))
    open(done, "w").write("ok\n")
    return out_dir


# ------------------------------------------------- probes


def probe_flagship(n_convs: int) -> dict:
    import ray

    from node_shovel_ray.gen import write_fixture
    from node_shovel_ray.pipelines import flagship
    from node_shovel_ray.sources.partitioned import read_partitioned_parquet

    fx = os.path.join(PROBE_DIR, f"transcripts_{n_convs}")
    write_fixture(fx, n_convs=n_convs, seed=42, n_files=256)
    meta = pq.read_table(os.path.join(fx, "conv_meta.parquet"))
    sink = os.path.join(PROBE_DIR, "flagship_out")
    t0 = time.time()
    with StoreSampler() as samp:
        ds = read_partitioned_parquet(os.path.join(fx, "transcripts"))
        res = flagship.run(ds, meta, out_dir=sink, assume_partitioned=True)
        counts = res["counts"].to_pandas()
    sec = time.time() - t0
    rows = int(counts[counts["sink_tag"] != "audit"]["n"].sum())
    return {
        "rows": rows, "sec": round(sec, 1),
        "rows_per_s": int(rows / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


def probe_curation(n_docs: int) -> dict:
    from node_shovel_ray.pipelines import corpus

    docs_dir = os.path.join(PROBE_DIR, f"docs_{n_docs}")
    gen_documents(docs_dir, n_docs)
    t0 = time.time()
    with StoreSampler() as samp:
        out = corpus.curated_docs(docs_dir, min_quality=0.2, k=1000)
        n_out = out.count()
    sec = time.time() - t0
    return {
        "rows_in": n_docs, "rows_out": int(n_out), "sec": round(sec, 1),
        "rows_per_s": int(n_docs / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


def probe_decontaminate(n_docs: int) -> dict:
    """Bloom-pre-filtered vs plain broadcast-set decontamination at scale
    (blocklist = doc_id % 97 == 0 → n_docs/97 entries). Evidence that the
    bloom path holds its envelope and matches the plain row count."""
    from node_shovel_ray.pipelines import corpus

    docs_dir = os.path.join(PROBE_DIR, f"docs_{n_docs}")
    gen_documents(docs_dir, n_docs)
    out: dict = {"rows_in": n_docs, "n_blocklist": n_docs // 97 + 1}
    for name, fn in (
        ("bloom", corpus.decontaminate_bloom_docs),
        ("plain", corpus.decontaminate_docs),
    ):
        t0 = time.time()
        with StoreSampler() as samp:
            n = fn(docs_dir).count()
        sec = time.time() - t0
        out[name] = {
            "rows_out": int(n), "sec": round(sec, 1),
            "rows_per_s": int(n_docs / sec),
            "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        }
    out["rows_match"] = out["bloom"]["rows_out"] == out["plain"]["rows_out"]
    return out


def probe_crossdoc(n_docs: int) -> dict:
    """The round's one true all-to-all: per-gram document frequency over
    every trigram of the corpus (~56 grams/doc → ~0.56B (gram, block)
    partial rows at 10M docs). Runs the hashed-exchange variant — the
    100 TB path — and records wall + peak store + spill."""
    from node_shovel_ray.pipelines import corpus

    docs_dir = os.path.join(PROBE_DIR, f"docs_{n_docs}")
    gen_documents(docs_dir, n_docs)
    t0 = time.time()
    with StoreSampler() as samp:
        n = corpus.crossdoc_gram_docs(docs_dir, hashed=True).count()
    sec = time.time() - t0
    return {
        "rows_in": n_docs, "rows_out": int(n), "sec": round(sec, 1),
        "rows_per_s": int(n_docs / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


def probe_neardup(n_docs: int) -> dict:
    """Near-duplicate REMOVAL at scale with every driver-side path
    DISABLED (VERDICT r4 #1): MinHash-LSH pairs → keyed-exchange pair
    dedup → distributed star-contraction connected components
    (functions/dedup.connected_components_ds) → distributed anti-join
    drop. The driver never holds the pair list, the component labels, or
    the drop set. The fixture plants an exact duplicate every 50th doc
    (~n/50 two-doc components), so the expected drop count is known to
    within shard-boundary effects."""
    import ray.data as rd

    from node_shovel_ray.functions.dedup import dedup_near

    docs_dir = os.path.join(PROBE_DIR, f"docs_{n_docs}")
    gen_documents(docs_dir, n_docs)
    t0 = time.time()
    with StoreSampler() as samp:
        out = dedup_near(
            rd.read_parquet(os.path.join(docs_dir, "documents.parquet")),
            threshold=0.5,
            cc_driver_limit=0,       # force distributed connected components
            drop_broadcast_limit=0,  # force the distributed anti-join drop
        )
        n = out.count()
    sec = time.time() - t0
    return {
        "rows_in": n_docs, "rows_out": int(n),
        "dropped": int(n_docs - n),
        "planted_dups_approx": n_docs // 50,
        "sec": round(sec, 1),
        "rows_per_s": int(n_docs / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


def probe_linededup(n_docs: int) -> dict:
    """Cross-document line dedup at scale: multi-line docs (6 lines × 10
    tokens) with boilerplate planted — a shared FOOTER line on every 3rd
    doc and a shared BANNER line on every 7th — so the expected removal
    count is exact: ceil(n/3) + ceil(n/7) lines (random 10-token lines
    never collide). Exercises the line-df hash-bucket exchange and the
    broadcast common-line set + vectorized rewrite at probe scale."""
    from node_shovel_ray.pipelines.corpus import line_dedup_docs

    out_dir = os.path.join(PROBE_DIR, f"linedocs_{n_docs}")
    docs_path = os.path.join(out_dir, "documents.parquet")
    done = os.path.join(out_dir, ".done")
    vocab = np.array(["tok%04d" % i for i in range(4096)])
    n_files = 64
    if not os.path.exists(done):
        os.makedirs(docs_path, exist_ok=True)
        per = (n_docs + n_files - 1) // n_files
        for f in range(n_files):
            lo, hi = f * per, min((f + 1) * per, n_docs)
            if lo >= hi:
                break
            rng = np.random.default_rng([13, f])
            ids = np.arange(lo, hi, dtype=np.int64)
            toks = rng.choice(vocab, size=(len(ids), 60))
            texts = [
                "\n".join(" ".join(row[j:j + 10]) for j in range(0, 60, 10))
                for row in toks
            ]
            texts = np.array(texts, dtype=object)
            foot = ids % 3 == 0
            texts[foot] = [t + "\nSHARED FOOTER LINE" for t in texts[foot]]
            ban = ids % 7 == 0
            texts[ban] = ["SHARED BANNER LINE\n" + t for t in texts[ban]]
            t = pa.table(
                {
                    "doc_id": pa.array(ids),
                    "text": pa.array(list(texts), pa.string()),
                }
            )
            pq.write_table(t, os.path.join(docs_path, f"part-{f:05d}.parquet"))
        open(done, "w").write("ok\n")
    expected = (n_docs + 2) // 3 + (n_docs + 6) // 7
    t0 = time.time()
    with StoreSampler() as samp:
        # materialize ONCE: the aggregate + count branches would otherwise
        # each re-run the whole rewrite pass (CLAUDE.md union/branch rule)
        out = line_dedup_docs(out_dir).materialize()
        from ray.data.aggregate import Sum

        agg = out.aggregate(Sum("n_removed", alias_name="removed"))
        rows = out.count()
    sec = time.time() - t0
    return {
        "rows_in": n_docs, "rows_out": int(rows),
        "lines_removed": int(agg["removed"]),
        "lines_removed_expected": expected,
        "sec": round(sec, 1),
        "rows_per_s": int(n_docs / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


def probe_semdedup(n_vecs: int, d: int = 64) -> dict:
    """SemDeDup semantic dedup at scale: synthetic gaussian embeddings
    with a near-duplicate planted every 25th vector (a 1e-3 perturbation
    of its predecessor → cosine ≈ 1), pruned at tau=0.8 (random 64-d
    gaussian pairs sit ~6σ below that, so expected drops ≈ n/25).
    n_clusters=256 so expected cluster size is n/256; the prune pass is
    column-chunked, so peak per-task memory is prefix × 1024 doubles even
    on skewed clusters."""
    import ray.data as rd

    from node_shovel_ray.functions.similarity import semdedup

    emb_dir = os.path.join(PROBE_DIR, f"emb_{n_vecs}")
    path = os.path.join(emb_dir, "embeddings.parquet")
    if not os.path.exists(path):
        os.makedirs(emb_dir, exist_ok=True)
        rng = np.random.default_rng(11)
        tmp = path + ".tmp"
        writer = None
        for start in range(0, n_vecs, 100_000):
            stop = min(start + 100_000, n_vecs)
            x = rng.normal(size=(stop - start, d))
            # plant a near-dup of the PREVIOUS vector every 25th row
            idx = np.arange(start, stop)
            planted = (idx % 25 == 0) & (idx > 0)
            src = np.where(planted)[0]
            x[src[src > 0]] = x[src[src > 0] - 1] + rng.normal(
                scale=1e-3, size=(int((src > 0).sum()), d)
            )
            t = pa.table(
                {
                    "vec_id": pa.array(idx, pa.int64()),
                    # flat-buffer list build (CLAUDE.md: never
                    # pa.array(list(matrix)) — one Python object per row)
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(x.reshape(-1)), d
                    ).cast(pa.list_(pa.float64())),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(tmp, t.schema)
            writer.write_table(t)
        writer.close()
        os.replace(tmp, path)
    t0 = time.time()
    with StoreSampler() as samp:
        out = semdedup(
            rd.read_parquet(path), n_clusters=256, tau=0.8
        )
        n = out.count()
    sec = time.time() - t0
    return {
        "rows_in": n_vecs, "rows_out": int(n),
        "dropped": int(n_vecs - n),
        "planted_dups_approx": n_vecs // 25,
        "sec": round(sec, 1),
        "rows_per_s": int(n_vecs / sec),
        "peak_object_store_gb": round(samp.peak_used / 2**30, 2),
        "store_total_gb": round(samp.total / 2**30, 2),
        "spilled_mb": spilled_mb(),
    }


PROBES = {
    "flagship": lambda nc, nd: probe_flagship(nc),
    "curation": lambda nc, nd: probe_curation(nd),
    "decontaminate": lambda nc, nd: probe_decontaminate(nd),
    "crossdoc": lambda nc, nd: probe_crossdoc(nd),
    "neardup": lambda nc, nd: probe_neardup(nd),
    "semdedup": lambda nc, nd: probe_semdedup(nd),
    "linededup": lambda nc, nd: probe_linededup(nd),
}


def main():
    import ray

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    jobs = [a.removeprefix("--") for a in sys.argv[1:] if a.startswith("--")]
    jobs = jobs or ["flagship", "curation"]
    n_convs = int(args[0]) if args else 320_000
    n_docs = int(args[1]) if len(args) > 1 else 10_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    out = {j: PROBES[j](n_convs, n_docs) for j in jobs}
    out.update({"n_convs": n_convs, "n_docs": n_docs})
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
