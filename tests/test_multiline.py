"""Cross-boundary multiline tests (reference src/decoders/multiline.js:2-17:
blank line flushes; a record may span chunk boundaries — here, file
boundaries)."""

import pyarrow as pa

from node_shovel_ray.sources.multiline import (
    read_multiline_text,
    split_file_lines,
    stitch_fragments,
)
from node_shovel_ray.stages.decode import group_multiline


def test_split_file_lines_shapes():
    assert split_file_lines(["a", "b", "", "c"]) == ([], "a\nb", "c", None)
    assert split_file_lines(["", "a", "b", ""]) == (["a\nb"], None, None, None)
    assert split_file_lines(["a", "b"]) == ([], None, None, "a\nb")
    assert split_file_lines(["", "a", "", "b", "c"]) == (["a"], None, "b\nc", None)
    assert split_file_lines(["a", "", "b", "", "c"]) == (["b"], "a", "c", None)
    assert split_file_lines([]) == ([], None, None, None)
    assert split_file_lines(["", ""]) == ([], None, None, None)


def test_stitch_across_boundaries():
    # tail of file0 + head of file1 glue into one record
    assert stitch_fragments([(None, "x", None), ("y", None, None)]) == ["x\ny"]
    # blank-leading file flushes the carried record alone
    assert stitch_fragments([(None, "x", None), (None, None, None)]) == ["x"]
    # bridge chain: record spans three files
    assert stitch_fragments(
        [(None, "a", None), (None, None, "b"), ("c", "d", None)]
    ) == ["a\nb\nc", "d"]
    # trailing open record flushes at end-of-stream
    assert stitch_fragments([(None, "z", None)]) == ["z"]
    assert stitch_fragments([]) == []


def test_read_multiline_text_record_spans_files(ray_session, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    # record 'l3 l4' spans part-0 → part-1 (no blank at the boundary)
    (d / "part-0.txt").write_text("l1\nl2\n\nl3\n")
    (d / "part-1.txt").write_text("l4\n\nl5\nl6\n")
    got = sorted(read_multiline_text(str(d)).to_pandas()["text"])
    assert got == sorted(["l1\nl2", "l3\nl4", "l5\nl6"])


def test_read_multiline_matches_batch_local_single_file(ray_session, tmp_path):
    d = tmp_path / "one"
    d.mkdir()
    content = "a\nb\n\nc\n\n\nd\ne\nf\n"
    (d / "f.txt").write_text(content)
    got = sorted(read_multiline_text(str(d)).to_pandas()["text"])
    # batch-local grouping over the same lines in one batch == global result
    t = pa.table({"text": pa.array(content.splitlines(), pa.string())})
    local = sorted(group_multiline(t)["text"].to_pylist())
    assert got == local == sorted(["a\nb", "c", "d\ne\nf"])


def test_stitch_empty_file_is_transparent():
    """ADVICE r2: an empty rotated-log segment contains no blank line, so a
    record spanning it must glue across — only a file that actually holds a
    blank flushes."""
    assert stitch_fragments(
        [(None, "part1", None), (None, None, None, True), ("part2", None, None)]
    ) == ["part1\npart2"]
    # blank-only file (not empty) still flushes
    assert stitch_fragments(
        [(None, "part1", None), (None, None, None, False), ("part2", None, None)]
    ) == ["part1", "part2"]


def test_read_multiline_empty_segment_glues(ray_session, tmp_path):
    d = tmp_path / "logs3"
    d.mkdir()
    (d / "a.txt").write_text("part1\n")  # open tail
    (d / "b.txt").write_text("")         # zero-byte rotated segment
    (d / "c.txt").write_text("part2\n\nr3\n")
    got = sorted(read_multiline_text(str(d)).to_pandas()["text"])
    assert got == sorted(["part1\npart2", "r3"])


def test_read_multiline_blank_boundary_no_glue(ray_session, tmp_path):
    d = tmp_path / "logs2"
    d.mkdir()
    (d / "a.txt").write_text("r1\n")      # open tail
    (d / "b.txt").write_text("\nr2\n")    # leading blank → flush r1 alone
    got = sorted(read_multiline_text(str(d)).to_pandas()["text"])
    assert got == ["r1", "r2"]
