"""Kill/resume fixture (FIXTURES.md §7): re-run skips committed partitions,
final outputs byte-equal an uninterrupted run, lineage is logged."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from node_shovel_ray.pipelines import flagship
from node_shovel_ray.state.manifest import ResumableRunner


def _partitions(fixture_dir):
    files = sorted(glob.glob(os.path.join(fixture_dir, "transcripts", "*.parquet")))
    return [[f] for f in files]  # one shard per partition (conv-aligned)


def _process(meta):
    from node_shovel_ray import schema as S
    from node_shovel_ray.stages.aggregate import sink_counts
    from node_shovel_ray.stages.parse import parse
    from node_shovel_ray.stages.route import branch, broadcast_branch

    def fn(ds):
        routed = flagship.enrich_route(parse(ds), meta).materialize()
        sinks = {tag: branch(routed, tag) for tag in S.SINKS}
        sinks["audit"] = broadcast_branch(routed)
        return {"sinks": sinks, "counts": sink_counts(routed)}

    return fn


def _read_sinks(out_dir):
    out = {}
    for tag in ("errors", "tools", "chat", "audit"):
        files = glob.glob(os.path.join(out_dir, f"sink={tag}", "part-*", "*.parquet"))
        df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        out[tag] = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return out


def test_kill_resume(tiny_fixture, tiny_tables, tmp_path):
    _, meta = tiny_tables
    parts = _partitions(tiny_fixture)
    assert len(parts) == 4
    process = _process(meta)

    # uninterrupted reference run
    ref_dir = str(tmp_path / "ref")
    ref = ResumableRunner(ref_dir)
    ref.run(parts, process)

    # interrupted run: only half the partitions commit, then "crash"
    out_dir = str(tmp_path / "out")
    r1 = ResumableRunner(out_dir)
    infos1 = r1.run(parts[:2], process)
    assert all(not i["skipped"] for i in infos1)
    assert len(r1.committed()) == 2

    # resume: full partition list; committed ones must be skipped
    r2 = ResumableRunner(out_dir)
    infos2 = r2.run(parts, process)
    assert [i["skipped"] for i in infos2] == [True, True, False, False]

    # identical final sink row-sets + text vs uninterrupted run
    got, want = _read_sinks(out_dir), _read_sinks(ref_dir)
    for tag in got:
        pd.testing.assert_frame_equal(got[tag], want[tag]), tag

    # re-reduced aggregates equal, no double counting
    keys = ["sink_tag", "role", "tool", "hour"]
    a = r2.final_counts(keys).to_pandas().sort_values(keys).reset_index(drop=True)
    b = ref.final_counts(keys).to_pandas().sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # lineage recorded per partition
    m = sorted(glob.glob(os.path.join(out_dir, "_manifest", "partition-*.json")))
    assert len(m) == 4
    info = json.load(open(m[0]))
    assert info["input_files"] and "sink_rows" in info and info["rows_in"] > 0

    # third run over everything: pure no-op
    infos3 = ResumableRunner(out_dir).run(parts, process)
    assert all(i["skipped"] for i in infos3)


def test_follow_once_incremental(ray_session, tmp_path):
    """Polling-input analogue (reference src/inputs/http-request.js cron
    loop → batch 'process only what's new'): second tick is a no-op,
    late-arriving files are picked up, totals never double-count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from node_shovel_ray.state.incremental import follow_once

    watch = tmp_path / "incoming"
    out = tmp_path / "out"
    watch.mkdir()

    def write(i, n):
        pq.write_table(
            pa.table({"k": ["a"] * n, "v": list(range(n))}),
            watch / f"f-{i:03d}.parquet",
        )

    def process(ds):
        return {"sinks": {"all": ds}}

    write(0, 3)
    write(1, 2)
    r1 = follow_once(str(watch), str(out), process)
    assert r1["new_groups"] == 2 and r1["rows_in"] == 5

    # tick with nothing new → no-op
    r2 = follow_once(str(watch), str(out), process)
    assert r2["new_groups"] == 0 and r2["rows_in"] == 0

    # a late file arrives → only it is processed
    write(2, 4)
    r3 = follow_once(str(watch), str(out), process)
    assert r3["new_groups"] == 1 and r3["rows_in"] == 4

    # all rows landed exactly once
    import glob as g

    total = sum(
        pq.read_table(f).num_rows
        for f in g.glob(str(out / "sink=all" / "*" / "*.parquet"))
    )
    assert total == 9


def test_live_metrics_mid_run(tiny_fixture, tiny_tables, tmp_path):
    """VERDICT r4 #8: metrics.json must be readable DURING the run (after
    each committed partition, status=running) and reconcile at completion
    (status=complete, counters = sum over all partitions)."""
    _, meta = tiny_tables
    parts = _partitions(tiny_fixture)
    out_dir = str(tmp_path / "live")
    inner = _process(meta)
    seen_mid: list[dict] = []

    def spying_process(ds):
        # runs while partition N is IN FLIGHT — the live snapshot must
        # reflect exactly the previously committed partitions
        live = ResumableRunner.read_live_metrics(out_dir)
        if live is not None:
            seen_mid.append(live)
        return inner(ds)

    infos = ResumableRunner(out_dir).run(parts, spying_process)
    assert len(infos) == 4

    # mid-run snapshots: first partition saw none; later ones saw running
    # snapshots with monotonically increasing committed counts
    assert len(seen_mid) == 3
    assert [m["status"] for m in seen_mid] == ["running"] * 3
    assert [m["n_partitions"] for m in seen_mid] == [1, 2, 3]
    assert [m["partitions_done"] for m in seen_mid] == [1, 2, 3]
    assert all(m["partitions_total"] == 4 for m in seen_mid)
    # counters advance monotonically
    ins = [m["counters"]["in"] for m in seen_mid]
    assert ins == sorted(ins) and ins[0] > 0

    # completion: reconciles with per-partition commit markers exactly
    final = ResumableRunner.read_live_metrics(out_dir)
    assert final["status"] == "complete"
    assert final["n_partitions"] == 4 and final["partitions_done"] == 4
    want_in = sum(i["counters"]["in"] for i in infos)
    assert final["counters"]["in"] == want_in
    for tag in ("errors", "tools", "chat", "audit"):
        assert final["sink_rows"][tag] == sum(i["sink_rows"][tag] for i in infos)
