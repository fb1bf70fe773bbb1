import numpy as np
import pyarrow.parquet as pq

from node_shovel_ray import schema as S
from node_shovel_ray.gen import gen_transcripts


def test_deterministic():
    a, _ = gen_transcripts(50, seed=42)
    b, _ = gen_transcripts(50, seed=42)
    assert a.equals(b)
    c, _ = gen_transcripts(50, seed=43)
    assert not a.equals(c)


def test_schema_and_invariants(tiny_tables):
    t, meta = tiny_tables
    assert t.schema.equals(S.TRANSCRIPTS)
    assert meta.schema.equals(S.CONV_META)
    df = t.to_pandas()
    # turn_idx contiguous & unique within conv
    for _, g in df.groupby("conv_id"):
        assert sorted(g["turn_idx"]) == list(range(len(g)))
    # ts spans >= 48h for hour bucketing
    span = df["ts"].max() - df["ts"].min()
    assert span.total_seconds() >= 48 * 3600
    # zipf skew: at least one hot conversation
    sizes = df.groupby("conv_id").size()
    assert sizes.max() >= 50
    # tool column non-empty iff a well-formed invocation is embedded
    has_inv = df["text"].str.contains("</tool>", regex=False)
    assert ((df["tool"] != "") == has_inv).all()


def test_sharded_files_interleave(tiny_fixture):
    files = sorted(
        __import__("glob").glob(f"{tiny_fixture}/transcripts/part-*.parquet")
    )
    assert len(files) == 4
    convs = [set(pq.read_table(f, columns=["conv_id"])["conv_id"].to_pylist())
             for f in files]
    # each shard holds a disjoint, interleaved subset of conv ids
    for i in range(len(convs)):
        for j in range(i + 1, len(convs)):
            assert not (convs[i] & convs[j])
    total = gen_transcripts(100, 42)[0]
    assert sum(len(pq.read_table(f)) for f in files) == len(total)
