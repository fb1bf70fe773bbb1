import os

import pytest

from node_shovel_ray.sources.tail import (
    discover_appended,
    load_offsets,
    tail_dataset,
    tail_once,
)


def _write(path, data, mode="ab"):
    with open(path, mode) as fh:
        fh.write(data)


def test_tail_basic_tick_and_partial_line(tmp_path, ray_session):
    watch, state = str(tmp_path / "w"), str(tmp_path / "s")
    os.makedirs(watch)
    f = os.path.join(watch, "a.log")
    _write(f, b"one\ntwo\npart", "wb")  # trailing partial line

    r1 = tail_once(watch, state, process=lambda ds: ds.to_pandas())
    got = r1["result"]
    assert got["line"].tolist() == ["one", "two"]
    assert got["line_no"].tolist() == [0, 1]
    assert r1["lines"] == 2
    assert load_offsets(state)[f]["offset"] == len(b"one\ntwo\n")

    # tick 2: the partial line completes + one more appears
    _write(f, b"ial\nthree\n")
    r2 = tail_once(watch, state, process=lambda ds: ds.to_pandas())
    got2 = r2["result"]
    assert got2["line"].tolist() == ["partial", "three"]
    assert got2["line_no"].tolist() == [2, 3]  # continues across ticks

    # tick 3: nothing new → no-op
    assert tail_once(watch, state)["files"] == 0


def test_tail_rotation_rereads_from_zero(tmp_path, ray_session):
    watch, state = str(tmp_path / "w"), str(tmp_path / "s")
    os.makedirs(watch)
    f = os.path.join(watch, "a.log")
    _write(f, b"aaaa\nbbbb\n", "wb")
    tail_once(watch, state, process=lambda ds: ds.to_pandas())
    _write(f, b"x\n", "wb")  # rotated: file shrank
    r = tail_once(watch, state, process=lambda ds: ds.to_pandas())
    assert r["result"]["line"].tolist() == ["x"]
    assert r["result"]["line_no"].tolist() == [0]  # counter reset with file


@pytest.mark.parametrize("max_chunk", [3, 4, 5, 7, 64])
def test_tail_chunk_split_matches_naive(tmp_path, ray_session, max_chunk):
    # lines sized so some newline lands EXACTLY on a chunk boundary for
    # several max_chunk values — regression for the lookbehind protocol
    watch, state = str(tmp_path / "w"), str(tmp_path / "s")
    os.makedirs(watch)
    f = os.path.join(watch, "a.log")
    data = b"ab\ncd\nefgh\n\ni\njklmnopq\nz\n"
    _write(f, data, "wb")
    ranges = discover_appended(watch, state)
    df = (
        tail_dataset(ranges, max_chunk=max_chunk)
        .to_pandas().sort_values("byte_start").reset_index(drop=True)
    )
    assert df["line"].tolist() == data.decode().split("\n")[:-1]
    assert df["line_no"].tolist() == list(range(7))


def test_tail_multiple_files(tmp_path, ray_session):
    watch, state = str(tmp_path / "w"), str(tmp_path / "s")
    os.makedirs(watch)
    _write(os.path.join(watch, "a.log"), b"a1\na2\n", "wb")
    _write(os.path.join(watch, "b.log"), b"b1\n", "wb")
    r = tail_once(watch, state, process=lambda ds: ds.to_pandas())
    assert r["files"] == 2 and r["lines"] == 3
    by_file = r["result"].groupby(
        r["result"]["path"].map(os.path.basename)
    )["line"].apply(list).to_dict()
    assert by_file == {"a.log": ["a1", "a2"], "b.log": ["b1"]}
