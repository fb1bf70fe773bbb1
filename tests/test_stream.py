"""Golden tests mirroring the reference stream input's chunk semantics
(src/inputs/stream.js:7-96): start_position beginning/end/number,
buffer_size-sized chunks, byte-exact reassembly."""

import os

import pytest

from node_shovel_ray.sources.stream import plan_chunks, read_binary_stream


def test_plan_chunks_shapes():
    # 250 bytes, buffer 100 → 100 + 100 + 50 (reference highWaterMark chunks)
    got = plan_chunks("f", 250, "beginning", 100)
    assert [(c["offset"], c["length"]) for c in got] == [(0, 100), (100, 100), (200, 50)]
    assert [c["chunk_idx"] for c in got] == [0, 1, 2]
    # start at 'end' → nothing (tail-follow idiom)
    assert plan_chunks("f", 250, "end", 100) == []
    # numeric start offset mid-file
    got = plan_chunks("f", 250, 30, 100)
    assert [(c["offset"], c["length"]) for c in got] == [(30, 100), (130, 100), (230, 20)]
    # start beyond EOF / empty file → nothing
    assert plan_chunks("f", 250, 900, 100) == []
    assert plan_chunks("f", 0, "beginning", 100) == []
    with pytest.raises(ValueError):
        plan_chunks("f", 10, "beginning", 0)
    with pytest.raises(ValueError):
        plan_chunks("f", 10, -5, 100)


def test_read_binary_stream_byte_exact(ray_session, tmp_path):
    data = bytes(range(256)) * 40  # 10240 bytes
    f = tmp_path / "blob.bin"
    f.write_bytes(data)
    ds = read_binary_stream(str(f), buffer_size=4096)
    df = ds.to_pandas().sort_values("chunk_idx").reset_index(drop=True)
    assert df["length"].tolist() == [4096, 4096, 2048]
    assert b"".join(df["source"]) == data
    # offset start reproduces a suffix
    df2 = (
        read_binary_stream(str(f), start_position=100, buffer_size=4096)
        .to_pandas().sort_values("chunk_idx").reset_index(drop=True)
    )
    assert b"".join(df2["source"]) == data[100:]
    # 'end' → zero rows with the stable schema
    ds3 = read_binary_stream(str(f), start_position="end")
    assert ds3.count() == 0
    assert "source" in ds3.schema().names


def test_stream_input_via_config_registry(ray_session, tmp_path):
    from node_shovel_ray.pipelines.config import REGISTRY

    f = tmp_path / "x.bin"
    f.write_bytes(b"Z" * 130)
    ds = REGISTRY["input"]["stream"]({"path": str(f), "buffer_size": 100})()
    df = ds.to_pandas().sort_values("chunk_idx")
    assert df["length"].tolist() == [100, 30]


def test_read_binary_stream_multi_file(ray_session, tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    (d / "a.bin").write_bytes(b"A" * 150)
    (d / "b.bin").write_bytes(b"B" * 50)
    df = read_binary_stream(str(d), buffer_size=100).to_pandas()
    df = df.sort_values(["path", "chunk_idx"]).reset_index(drop=True)
    assert [os.path.basename(p) for p in df["path"]] == ["a.bin", "a.bin", "b.bin"]
    assert df["length"].tolist() == [100, 50, 50]
    joined = b"".join(df["source"])
    assert joined == b"A" * 150 + b"B" * 50
