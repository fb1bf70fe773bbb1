"""Within-file tailing — the batch analogue of the reference's
``follow: true`` file input (src/inputs/file.js:113-126: a Tail reader
emits each appended line; pause/resume maps to our tick boundaries).

Each :func:`tail_once` tick discovers how far every watched file has grown
since the last committed offset and processes ONLY the appended bytes:

- offsets always advance to a **line boundary** (a trailing partial line is
  held back for the next tick — the reference's Tail emits whole lines);
- a file that SHRANK is treated as rotated/truncated and re-read from 0
  (classic tail -F semantics);
- offset state lives in one JSON map (atomic tmp+rename, committed only
  AFTER the tick's processing succeeds) → a crash mid-tick re-reads the
  same ranges next tick. Pair the tick with
  :class:`~node_shovel_ray.state.manifest.ResumableRunner` (partition id =
  the (path, start, end) ranges) for exactly-once output on retry.

Scale: the tick's unit of work is a *range* (path, start, end), not a file.
Ranges larger than ``max_chunk`` are split; every chunk is an independent
Ray task (``from_items(ranges).flat_map``) using the standard
chunk-boundary line protocol — a chunk owns the lines that START inside
it, reading past its end to finish the final line — so a first tick over a
pre-existing 100 GB log parallelizes across the cluster instead of being
one task.
"""

from __future__ import annotations

import glob
import json
import os

import ray
import ray.data

_STATE_NAME = "tail_offsets.json"


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, _STATE_NAME)


def load_offsets(state_dir: str) -> dict[str, dict]:
    """{path: {"offset": committed byte offset, "lines": lines emitted}}."""
    p = _state_path(state_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def commit_offsets(state_dir: str, offsets: dict[str, dict]) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = _state_path(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(offsets, fh, indent=0, sort_keys=True)
    os.replace(tmp, _state_path(state_dir))  # atomic commit marker last


def discover_appended(
    watch_dir: str,
    state_dir: str,
    pattern: str = "*.log",
) -> list[dict]:
    """Stat-only planning pass: one range per grown file.

    Returns [{path, start, end, line_base}] — ``end`` is the stat size at
    plan time (bytes appended after the stat land in the next tick)."""
    offsets = load_offsets(state_dir)
    ranges = []
    for path in sorted(glob.glob(os.path.join(watch_dir, pattern))):
        size = os.stat(path).st_size
        st = offsets.get(path, {"offset": 0, "lines": 0})
        start = st["offset"]
        if size < start:  # rotated/truncated → re-read from the top
            start, st = 0, {"offset": 0, "lines": 0}
        if size > start:
            ranges.append(
                {"path": path, "start": start, "end": size,
                 "line_base": st["lines"]}
            )
    return ranges


def _split_chunks(ranges: list[dict], max_chunk: int) -> list[dict]:
    """Split big ranges into parallel chunks. ``first`` marks the chunk that
    starts on a known line boundary (the committed offset); later chunks
    start mid-line and skip to their first newline."""
    chunks = []
    for r in ranges:
        pos = r["start"]
        first = True
        while pos < r["end"]:
            chunks.append(
                {"path": r["path"], "start": pos,
                 "end": min(pos + max_chunk, r["end"]),
                 "range_end": r["end"], "first": first,
                 "line_base": r["line_base"]}
            )
            pos += max_chunk
            first = False
    return chunks


def _read_chunk_lines(chunk: dict, encoding: str = "utf-8") -> list[dict]:
    """Lines that START inside [start, end) — the standard parallel-text
    chunk protocol. Reads ahead past ``end`` (within the tick's range) to
    finish the line in progress; never emits the range's trailing partial
    line (held back until a newline lands)."""
    path, start, end = chunk["path"], chunk["start"], chunk["end"]
    range_end = chunk["range_end"]
    # non-first chunks read ONE lookbehind byte: a line starts at s iff
    # byte s-1 is a newline, so "skip to after the first newline" must
    # include start-1 — otherwise a line ending exactly on the chunk
    # boundary makes the next chunk drop its first line
    read_from = start if chunk["first"] else start - 1
    with open(path, "rb") as fh:
        fh.seek(read_from)
        buf = fh.read(range_end - read_from)  # chunk + lookahead to range end
    if not chunk["first"]:
        nl = buf.find(b"\n")
        if nl < 0 or read_from + nl + 1 >= end:
            return []  # our first line starts in a later chunk's territory
        buf = buf[nl + 1 :]
        start = read_from + nl + 1
    out, pos = [], 0
    while pos < end - start:  # only lines starting before our chunk end
        nl = buf.find(b"\n", pos)
        if nl < 0:
            break  # trailing partial line — held back for the next tick
        out.append(
            {"path": path, "byte_start": start + pos,
             "line": buf[pos:nl].decode(encoding, errors="replace")}
        )
        pos = nl + 1
    return out


def tail_dataset(
    ranges: list[dict],
    max_chunk: int = 64 << 20,
    encoding: str = "utf-8",
) -> "ray.data.Dataset":
    """Appended ranges → Dataset of {path, byte_start, line_no, line}.

    ``line_no`` continues across ticks per file (line_base from state).
    Chunk tasks emit (path, byte_start) which is a total order within a
    file, so line numbers are assigned by rank without re-reading: we count
    lines per chunk (cheap metadata from the same read) — here at tick
    scale a groupby-free prefix over the ordered chunk list suffices."""
    chunks = _split_chunks(ranges, max_chunk)
    if not chunks:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({"path": pa.array([], "string"),
                      "byte_start": pa.array([], "int64"),
                      "line_no": pa.array([], "int64"),
                      "line": pa.array([], "string")})
        )

    # count lines per chunk in parallel (read once, reuse below would need
    # shipping the lines twice; counting is the cheap pass and keeps the
    # emit pass streaming)
    @ray.remote
    def count(ch: dict) -> int:
        return len(_read_chunk_lines(ch))

    counts = ray.get([count.remote(ch) for ch in chunks])
    base: dict[str, int] = {}
    for ch, n in zip(chunks, counts):
        ch["line_no_base"] = ch["line_base"] + base.get(ch["path"], 0)
        base[ch["path"]] = base.get(ch["path"], 0) + n

    def emit(ch: dict):
        rows = _read_chunk_lines(ch, encoding)
        for i, row in enumerate(rows):
            row["line_no"] = ch["line_no_base"] + i
            yield row

    return ray.data.from_items(chunks).flat_map(emit)


def consumed_offsets(ranges: list[dict]) -> dict[str, dict]:
    """New committed state after a tick: offset = last complete line's end
    within each range (computed by one tail scan of the range's final
    chunk — partial trailing line excluded), lines = line_base + emitted."""
    out = {}
    for r in ranges:
        with open(r["path"], "rb") as fh:
            fh.seek(r["start"])
            buf = fh.read(r["end"] - r["start"])
        last_nl = buf.rfind(b"\n")
        n_lines = buf.count(b"\n")
        consumed = r["start"] + (last_nl + 1 if last_nl >= 0 else 0)
        out[r["path"]] = {"offset": consumed, "lines": r["line_base"] + n_lines}
    return out


def tail_once(
    watch_dir: str,
    state_dir: str,
    process=None,
    pattern: str = "*.log",
    max_chunk: int = 64 << 20,
) -> dict:
    """One tail tick: read appended line ranges, optionally process, commit
    offsets AFTER success (at-least-once; pair the processor with
    ResumableRunner partitions keyed on the ranges for exactly-once)."""
    ranges = discover_appended(watch_dir, state_dir, pattern)
    if not ranges:
        return {"files": 0, "lines": 0}
    ds = tail_dataset(ranges, max_chunk=max_chunk)
    result = process(ds) if process is not None else None
    consumed = consumed_offsets(ranges)
    new_state = load_offsets(state_dir)
    new_state.update(consumed)
    commit_offsets(state_dir, new_state)
    n_lines = sum(
        consumed[r["path"]]["lines"] - r["line_base"] for r in ranges
    )
    return {"files": len(ranges), "lines": n_lines, "result": result,
            "ranges": ranges}
