"""Operational metrics surface (reference aggregated_metrics.js:100-209 /
node.js:277-289): per-partition stage counters with the reconciliation
invariant in == routed + ignored + rejected, per-operator wall/rows from
Dataset.stats(), and the run-level aggregate written into the manifest."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from node_shovel_ray.state.manifest import ResumableRunner
from node_shovel_ray.state.metrics import (
    merge_counters,
    parse_operator_stats,
    stage_counters,
)


def test_stage_counters_reconcile():
    c = stage_counters(100, {"errors": 10, "tools": 30, "chat": 60, "audit": 25})
    assert c["routed"] == 100 and c["reconciled"]
    assert c["broadcast_rows"] == {"audit": 25}
    # dead-letter rows count as rejected, not routed
    c = stage_counters(100, {"chat": 90, "rejects": 7}, ignored=3)
    assert c["routed"] == 90 and c["rejected"] == 7 and c["reconciled"]
    # a lost row breaks the invariant and is RECORDED, not hidden
    c = stage_counters(100, {"chat": 90, "rejects": 7}, ignored=2)
    assert not c["reconciled"]


def test_merge_counters():
    a = stage_counters(10, {"chat": 10})
    b = stage_counters(5, {"chat": 4, "rejects": 1})
    m = merge_counters([a, b])
    assert m == {
        "in": 15, "routed": 14, "ignored": 0, "rejected": 1,
        "broadcast_rows": {}, "reconciled": True,
    }


def test_parse_operator_stats_real_output(ray_session):
    import ray.data as rd

    ds = rd.range(1000).map_batches(lambda t: t, batch_format="pyarrow").materialize()
    ops = parse_operator_stats(ds.stats())
    assert ops and all(o["wall_sec"] >= 0 for o in ops)
    assert ops[-1]["rows_out"] == 1000
    assert any("MapBatches" in o["operator"] for o in ops)
    # tolerant on garbage
    assert parse_operator_stats("") == []
    assert parse_operator_stats("no operators here") == []


def _write_shards(d, n_shards=2, rows=40):
    os.makedirs(d, exist_ok=True)
    files = []
    for s in range(n_shards):
        f = os.path.join(d, f"shard-{s}.parquet")
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([f"k{i % 4}" for i in range(rows)]),
                    "v": pa.array(range(rows), pa.int64()),
                }
            ),
            f,
        )
        files.append(f)
    return [[f] for f in files]


def test_runner_emits_counters_and_metrics(ray_session, tmp_path):
    """The manifest carries the counter artifact per partition; metrics()
    re-reduces them; metrics.json lands next to the commit markers."""
    parts = _write_shards(str(tmp_path / "in"))

    def _mod_filter(cmp):
        return lambda t: t.filter(cmp(pc.bit_wise_and(t["v"], 3)))

    def process(ds):
        # route: v%4==0 → rejects (dead-letter), v%4==1 → ignored (dropped
        # but counted), the rest → chat
        chat = ds.map_batches(
            _mod_filter(lambda m: pc.greater(m, 1)), batch_format="pyarrow"
        )
        rejects = ds.map_batches(
            _mod_filter(lambda m: pc.equal(m, 0)), batch_format="pyarrow"
        )
        ignored = ds.map_batches(
            _mod_filter(lambda m: pc.equal(m, 1)), batch_format="pyarrow"
        ).count()
        return {
            "sinks": {"chat": chat, "rejects": rejects},
            "counters": {"ignored": ignored, "deadletter": ("rejects",)},
        }

    out = str(tmp_path / "out")
    runner = ResumableRunner(out)
    infos = runner.run(parts, process)

    for info in infos:
        c = info["counters"]
        assert c["in"] == 40
        assert c["in"] == c["routed"] + c["ignored"] + c["rejected"]
        assert c["reconciled"]
        assert info["operators"]["chat"], "operator stats captured per sink"

    m = runner.metrics()
    assert m["counters"] == {
        "in": 80, "routed": 40, "ignored": 20, "rejected": 20,
        "broadcast_rows": {}, "reconciled": True,
    }
    assert m["sink_rows"] == {"chat": 40, "rejects": 20}
    assert m["operator_wall_sec"]

    on_disk = json.load(open(os.path.join(out, "_manifest", "metrics.json")))
    assert on_disk["counters"] == m["counters"]

    # resume: skipped partitions keep their recorded counters; totals stable
    infos2 = ResumableRunner(out).run(parts, process)
    assert all(i["skipped"] for i in infos2)
    assert ResumableRunner(out).metrics()["counters"] == m["counters"]


def test_combinable_groupby_matches_plain(ray_session):
    """combinable_groupby (per-block partials + tiny final exchange) must
    equal a direct pandas groupby for every supported fn."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.stages.aggregate import combinable_groupby

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abcd"), 5000),
            "v": rng.normal(size=5000),
        }
    )
    got = (
        combinable_groupby(
            rd.from_pandas(df).repartition(11),
            ["g"],
            {"n": (None, "count"), "s": ("v", "sum"),
             "lo": ("v", "min"), "hi": ("v", "max")},
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    want = (
        df.groupby("g")
        .agg(n=("v", "size"), s=("v", "sum"), lo=("v", "min"), hi=("v", "max"))
        .reset_index()
    )
    assert got["n"].tolist() == want["n"].tolist()
    assert np.allclose(got["s"], want["s"])
    assert np.allclose(got["lo"], want["lo"]) and np.allclose(got["hi"], want["hi"])


def test_flagship_process_counters_reconcile(tiny_fixture, tiny_tables, tmp_path):
    """The flagship DAG drops nothing: every input row lands in exactly one
    primary sink, audit is broadcast — the invariant holds per partition
    from the EMITTED counters (first-class, not an ad hoc assertion)."""
    from node_shovel_ray import schema as S
    from node_shovel_ray.pipelines import flagship
    from node_shovel_ray.stages.aggregate import sink_counts
    from node_shovel_ray.stages.parse import parse
    from node_shovel_ray.stages.route import branch, broadcast_branch

    _, meta = tiny_tables
    files = sorted(
        glob.glob(os.path.join(tiny_fixture, "transcripts", "*.parquet"))
    )

    def process(ds):
        routed = flagship.enrich_route(parse(ds), meta).materialize()
        sinks = {tag: branch(routed, tag) for tag in S.SINKS}
        sinks["audit"] = broadcast_branch(routed)
        return {"sinks": sinks, "counts": sink_counts(routed)}

    runner = ResumableRunner(str(tmp_path / "out"))
    infos = runner.run([[f] for f in files], process)
    for info in infos:
        c = info["counters"]
        assert c["reconciled"] and c["ignored"] == 0 and c["rejected"] == 0
        assert c["in"] == c["routed"] > 0
        assert "audit" in c["broadcast_rows"]
    assert runner.metrics()["counters"]["reconciled"]
