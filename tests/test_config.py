"""Pipeline-config contract tests — mirrors the reference's config suite:
YAML load, env interpolation with/without defaults
(tests/core/pipeline_config.js:78-120), unknown-plugin failure path
(tests/core/node.js:68-81)."""

import os

import pytest

from node_shovel_ray.pipelines.config import (
    PipelineConfig,
    build,
    interpolate_env,
    register,
)


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("NSR_TEST_VAR", "hello")
    assert interpolate_env("x-${NSR_TEST_VAR}-y") == "x-hello-y"
    assert interpolate_env("${NSR_UNSET_VAR:fallback}") == "fallback"
    monkeypatch.setenv("NSR_TEST_VAR", "set")
    assert interpolate_env("${NSR_TEST_VAR:fallback}") == "set"
    with pytest.raises(KeyError):
        interpolate_env("${NSR_UNSET_VAR}")


def test_unknown_plugin_raises():
    cfg = PipelineConfig.from_dict(
        {"name": "p", "input": {"use": "parquet", "options": {"path": "x"}},
         "decoder": {"use": "nope"}}
    )
    with pytest.raises(KeyError, match="no decoder plugin named 'nope'"):
        build(cfg)


def test_yaml_pipeline_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("NSR_SF", "/root/testdata/sf0.001")
    yml = tmp_path / "p.yaml"
    yml.write_text(
        """
name: transcript-parse
input:
  use: parquet
  options: {path: "${NSR_SF}/events.parquet"}
decoder:
  use: transcriptify
pipeline:
  use: parse
encoder:
  use: format
  options: {template: "{conv_id}@{YYYY}-{MM}-{DD}"}
output:
  use: dataset
"""
    )
    run = build(PipelineConfig.from_yaml(str(yml)))
    out = run().to_pandas()
    assert len(out) == 1000
    assert {"parsed_tool", "error_code", "parse_ok", "payload"} <= set(out.columns)
    assert out["payload"].str.match(r"conv-\d{8}@\d{4}-\d{2}-\d{2}").all()


def test_custom_stage_registration():
    @register("pipeline", "add_constant")
    def _factory(o):
        import pyarrow as pa

        def stage(ds):
            return ds.map_batches(
                lambda t: t.append_column("k", pa.array([o["k"]] * len(t))),
                batch_format="pyarrow",
            )

        return stage

    cfg = PipelineConfig.from_dict(
        {
            "name": "c",
            "input": {"use": "items", "options": {"items": [{"a": 1}, {"a": 2}]}},
            "pipeline": {"use": "add_constant", "options": {"k": 7}},
        }
    )
    out = build(cfg)().to_pandas()
    assert out["k"].tolist() == [7, 7]


def test_multi_output_broadcast_and_fanout(tmp_path):
    import glob

    import pyarrow.parquet as pq

    base = {
        "name": "m",
        "input": {"use": "items", "options": {"items": [{"a": i} for i in range(10)]}},
        "outputs": [
            {"use": "parquet", "options": {"path": str(tmp_path / "s1")}},
            {"use": "parquet", "options": {"path": str(tmp_path / "s2")}},
        ],
    }
    # broadcast: both sinks receive all 10 rows (src/outputs/pipeline.js)
    build(PipelineConfig.from_dict(base))()
    for s in ("s1", "s2"):
        n = sum(pq.read_table(f).num_rows
                for f in glob.glob(str(tmp_path / s / "*.parquet")))
        assert n == 10, s

    # fanout: every row delivered exactly once, hash-balanced across sinks
    # (master.js:214-224 round-robin completeness semantics)
    base2 = dict(base, mode="fanout", outputs=[
        {"use": "parquet", "options": {"path": str(tmp_path / "f1")}},
        {"use": "parquet", "options": {"path": str(tmp_path / "f2")}},
    ])
    build(PipelineConfig.from_dict(base2))()
    rows = {}
    for s in ("f1", "f2"):
        vals = []
        for f in glob.glob(str(tmp_path / s / "*.parquet")):
            vals += pq.read_table(f)["a"].to_pylist()
        rows[s] = vals
    assert sorted(rows["f1"] + rows["f2"]) == list(range(10))  # complete
    assert not (set(rows["f1"]) & set(rows["f2"]))  # disjoint
    assert rows["f1"] and rows["f2"]  # both sinks used


def test_blackhole_and_parquet_outputs(tmp_path):
    cfg = PipelineConfig.from_dict(
        {
            "name": "b",
            "input": {"use": "items", "options": {"items": [{"a": i} for i in range(5)]}},
            "output": {"use": "blackhole"},
        }
    )
    assert build(cfg)() == 5
    cfg2 = PipelineConfig.from_dict(
        {
            "name": "w",
            "input": {"use": "items", "options": {"items": [{"a": 1}]}},
            "output": {"use": "parquet", "options": {"path": str(tmp_path / "o")}},
        }
    )
    path = build(cfg2)()
    import glob

    assert glob.glob(os.path.join(path, "*.parquet"))


def test_duration_and_content_type_utils():
    from node_shovel_ray.functions.template import (
        parse_content_type,
        parse_duration,
    )

    assert parse_duration("1h30m") == 5_400_000
    assert parse_duration("100") == 100  # bare number = ms
    ct = parse_content_type("application/protobuf; proto=Test")
    assert ct["mimeType"] == "application/protobuf"
    assert ct["parameters"]["proto"] == "Test"


def test_protobuf_class_from_content_type():
    from node_shovel_ray.pipelines.config import _proto_class_name

    assert _proto_class_name({"class_name": "X"}) == "X"
    assert (
        _proto_class_name({"content_type": "application/protobuf; proto=Test"})
        == "Test"
    )
    import pytest

    with pytest.raises(ValueError, match="Missing class name"):
        _proto_class_name({"content_type": "application/protobuf"})


def test_window_stage_duration_config(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.pipelines.config import REGISTRY

    stage = REGISTRY["pipeline"]["window"]({"size": "30m", "keys": []})
    ts = [
        datetime.datetime(2024, 1, 1, 0, 10),
        datetime.datetime(2024, 1, 1, 0, 40),
        datetime.datetime(2024, 1, 1, 0, 50),
    ]
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
    out = stage(ds).to_pandas().sort_values("window").reset_index(drop=True)
    assert list(out["n"]) == [1, 2]


def test_chain_and_curation_stages(ray_session):
    """r3 config surface: chain combinator + normalize/sample stages, the
    YAML analogue of a multi-node shovel pipeline body."""
    import pyarrow as pa
    import ray.data as rd

    from node_shovel_ray.pipelines.config import REGISTRY

    stage = REGISTRY["pipeline"]["chain"](
        {
            "stages": [
                {"use": "normalize"},
                {"use": "sample", "options": {"per_group": {"group": "lang", "k": 2},
                                              "id_col": "doc_id"}},
            ]
        }
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "lang": pa.array(["en", "de"] * 10),
                "text": pa.array([f"  Some   TEXT {i} " for i in range(20)]),
            }
        )
    )
    out = stage(ds).to_pandas()
    assert (out.groupby("lang").size() == 2).all()
    assert out["text_norm"].str.match(r"some text \d+$").all()


def test_window_stage_rejects_subsecond_size():
    """ADVICE r2: '500ms' used to truncate to size_s=0 and floor-divide
    every row into the epoch-0 window; sub-/fractional-second sizes must
    raise instead."""
    import pytest

    from node_shovel_ray.pipelines.config import REGISTRY

    for bad in ("500ms", "1500ms"):
        with pytest.raises(ValueError, match="whole number of seconds"):
            REGISTRY["pipeline"]["window"]({"size": bad, "keys": []})


def test_text_input_reads_gzip(ray_session, tmp_path):
    """Reference file input reads gzip (src/inputs/file.js); the text input
    inherits Arrow's extension-based auto-decompression."""
    import gzip

    from node_shovel_ray.pipelines.config import REGISTRY

    p = tmp_path / "log.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("a\nb\n")
    ds = REGISTRY["input"]["text"]({"path": str(p)})()
    assert [r["text"] for r in ds.take_all()] == ["a", "b"]


def test_tail_input_commits_after_sink(ray_session, tmp_path):
    # file `follow: true` analogue: run the SAME config twice; the second
    # run sees only lines appended between runs (offset state committed
    # after the sink succeeded)
    import os

    watch = tmp_path / "logs"
    watch.mkdir()
    f = watch / "app.log"
    f.write_bytes(b"l1\nl2\n")
    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"

    def cfg(out):
        return PipelineConfig.from_dict(
            {
                "name": "tailer",
                "input": {"use": "tail", "options": {
                    "path": str(watch), "state_dir": str(tmp_path / "state")}},
                "output": {"use": "parquet", "options": {"path": str(out)}},
            }
        )

    build(cfg(out1))()
    import pandas as pd
    import pyarrow.parquet as pq

    a = pq.read_table(str(out1)).to_pandas()
    assert sorted(a["line"]) == ["l1", "l2"]

    with open(f, "ab") as fh:
        fh.write(b"l3\n")
    build(cfg(out2))()
    b = pq.read_table(str(out2)).to_pandas()
    assert b["line"].tolist() == ["l3"] and b["line_no"].tolist() == [2]


def test_tail_lazy_sink_materializes_before_commit(ray_session, tmp_path):
    # ADVICE r4: with a LAZY sink (output: dataset) the tail offsets must
    # not advance until the bytes were actually processed — a failure in a
    # lazy downstream stage used to commit first and silently drop lines
    from node_shovel_ray.pipelines.config import register
    from node_shovel_ray.sources.tail import load_offsets

    if "boom_test" not in __import__(
        "node_shovel_ray.pipelines.config", fromlist=["REGISTRY"]
    ).REGISTRY["pipeline"]:
        @register("pipeline", "boom_test")
        def _boom(o):
            def fail(t):
                raise RuntimeError("boom")

            return lambda ds: ds.map_batches(fail, batch_format="pyarrow")

    watch = tmp_path / "logs"
    watch.mkdir()
    f = watch / "app.log"
    f.write_bytes(b"l1\n")
    state = tmp_path / "state"

    def cfg(pipeline="noop"):
        return PipelineConfig.from_dict(
            {
                "name": "tailer",
                "input": {"use": "tail", "options": {
                    "path": str(watch), "state_dir": str(state)}},
                "pipeline": {"use": pipeline},
                "output": {"use": "dataset"},
            }
        )

    with pytest.raises(Exception):
        build(cfg("boom_test"))()  # fails DURING the forced materialize
    # offsets NOT committed → the failed lines replay next tick
    assert load_offsets(str(state)).get(str(f), {}).get("offset", 0) == 0

    out = build(cfg())()
    assert out.count() == 1  # lazy sink was materialized inside run()
    assert load_offsets(str(state))[str(f)]["offset"] == len(b"l1\n")
    # nothing new → next tick sees zero rows
    assert build(cfg())().count() == 0


def test_corpus_ops_registry(tmp_path):
    """r4 registry ops: dedup / shuffle / textstats / decontaminate chain
    over a tiny documents table + parquet blocklist."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from node_shovel_ray.pipelines.config import PipelineConfig, build

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["dup text", "dup text", "keep me", "BLOCKED  one", "other"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    pq.write_table(
        pa.table({"text": pa.array(["blocked one"])}),
        str(tmp_path / "block.parquet"),
    )

    def run(stages):
        cfg = PipelineConfig.from_dict(
            {
                "name": "t",
                "input": {"use": "parquet", "options": {"path": str(tmp_path / "docs.parquet")}},
                "pipeline": {"use": "chain", "options": {"stages": stages}},
                "output": {"use": "dataset"},
            }
        )
        return build(cfg)().to_pandas()

    out = run([{"use": "decontaminate", "options": {"path": str(tmp_path / "block.parquet")}}])
    assert sorted(out["doc_id"]) == [0, 1, 2, 4]  # normalized match dropped

    out = run([{"use": "dedup", "options": {}}])
    assert sorted(out["keep_id" if "keep_id" in out else "doc_id"]) == [0, 2, 3, 4]

    out = run([{"use": "shuffle", "options": {"seed": "s1"}}])
    assert sorted(out["shuffle_rank"]) == [0, 1, 2, 3, 4]

    out = run([{"use": "textstats", "options": {"which": "tokens"}}])
    assert out.set_index("doc_id")["n_tokens"][3] == 2


def test_cluster_semdedup_topn_registry(tmp_path):
    """r5 registry ops: cluster / semdedup over a tiny embeddings table;
    sample top_n over documents."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from node_shovel_ray.pipelines.config import PipelineConfig, build

    rng = np.random.default_rng(3)
    m = rng.normal(size=(20, 8))
    m[1] = m[0] + 1e-4  # planted near-dup
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float64())),
            }
        ),
        str(tmp_path / "emb.parquet"),
    )

    def run(path, stages):
        cfg = PipelineConfig.from_dict(
            {
                "name": "t",
                "input": {"use": "parquet", "options": {"path": path}},
                "pipeline": {"use": "chain", "options": {"stages": stages}},
                "output": {"use": "dataset"},
            }
        )
        return build(cfg)().to_pandas()

    emb = str(tmp_path / "emb.parquet")
    out = run(emb, [{"use": "cluster", "options": {"n_clusters": 4}}])
    assert len(out) == 20 and out["cluster"].between(0, 3).all()

    out = run(emb, [{"use": "semdedup", "options": {"n_clusters": 4, "tau": 0.9}}])
    assert 1 not in set(out["vec_id"])  # the planted dup is pruned
    assert 0 in set(out["vec_id"])      # its smaller-id twin survives

    docs = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(10)]),
        }
    )
    pq.write_table(docs, str(tmp_path / "docs2.parquet"))
    out = run(
        str(tmp_path / "docs2.parquet"),
        [{"use": "sample", "options": {"top_n": 4}}],
    )
    assert len(out) == 4
