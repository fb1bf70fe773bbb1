"""Cross-boundary multiline record assembly.

The reference's multiline decoder carries its accumulation stack across
messages of a continuous stream (src/decoders/multiline.js:2-17): a blank
line flushes one combined record, and a record may span arbitrarily many
input chunks. The batch-side hazard is the same stack state at block
boundaries — ``stages.decode.group_multiline`` is deliberately batch-local
and can split a record that straddles two blocks.

:func:`read_multiline_text` is the scalable, boundary-correct reader:

- one file = one task = one block (a rotated-log stream is a file
  sequence, the true analogue of the reference's input);
- each task splits its file into fully-closed records plus at most two
  boundary fragments (the run of non-blank lines touching the file's
  start/end) — fragment volume is O(record size × n_files), never O(data);
- the driver stitches the tiny fragment chain across file boundaries in
  file order (a record spanning files is glued; a file-leading blank
  flushes the carried record), then the closed-record datasets and the
  stitched records are unioned.

Every step is deterministic, so retries/resume are equality-safe.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data as rd


def split_file_lines(
    lines: list[str],
) -> tuple[list[str], str | None, str | None, str | None]:
    """One file's lines → (closed_records, head_frag, tail_frag, bridge).

    ``head_frag``: first non-blank run when the file STARTS mid-record
    (first line non-blank) and an interior blank closes it later.
    ``tail_frag``: last run when the file ENDS mid-record.
    ``bridge``: the whole file is one unbroken non-blank run (no blanks) —
    it may continue a record on BOTH sides.
    """
    segs: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln is None or ln.strip() == "":
            if cur:
                segs.append(cur)
                cur = []
        else:
            cur.append(ln)
    open_tail = bool(cur)
    if cur:
        segs.append(cur)
    open_head = bool(lines) and lines[0] is not None and lines[0].strip() != ""

    if not segs:
        return [], None, None, None
    recs = ["\n".join(s) for s in segs]
    if len(recs) == 1:
        if open_head and open_tail:
            return [], None, None, recs[0]
        if open_head:
            return [], recs[0], None, None
        if open_tail:
            return [], None, recs[0], None
        return recs, None, None, None
    head = recs[0] if open_head else None
    tail = recs[-1] if open_tail else None
    mid = recs[(1 if head else 0) : (-1 if tail else len(recs))]
    return mid, head, tail, None


def stitch_fragments(
    frags: list[tuple],
) -> list[str]:
    """Glue per-file (head, tail, bridge) fragments in file order into the
    records that span file boundaries (reference stack-carry semantics).

    Each entry is ``(head, tail, bridge)`` or ``(head, tail, bridge,
    empty)``: ``empty=True`` marks a ZERO-LINE file (e.g. an empty rotated
    segment), which contains no blank line and therefore must NOT flush a
    carried record — it is transparent. A file whose lines are all blank
    still flushes (it does contain a blank)."""
    out: list[str] = []
    carry: str | None = None
    for frag in frags:
        head, tail, bridge = frag[0], frag[1], frag[2]
        if len(frag) > 3 and frag[3]:
            continue  # empty file: the open record continues across it
        if bridge is not None:
            carry = f"{carry}\n{bridge}" if carry is not None else bridge
            continue
        if head is not None:
            out.append(f"{carry}\n{head}" if carry is not None else head)
            carry = None
        elif carry is not None:
            # file starts with a blank (or has no head run) → flush
            out.append(carry)
            carry = None
        if tail is not None:
            carry = tail
    if carry is not None:
        out.append(carry)
    return out


class _FileSplitter:
    """Actor/task stage: path row → record rows + fragment marker rows."""

    def __init__(self, column: str):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ords, kinds, texts = [], [], []
        for o, path in zip(batch["ordinal"].to_pylist(), batch["path"].to_pylist()):
            with open(path, encoding="utf-8") as f:
                lines = f.read().splitlines()
            recs, head, tail, bridge = split_file_lines(lines)
            if not lines:
                # zero-line file: emit a marker so the stitcher carries the
                # open record through instead of flushing it
                ords.append(o)
                kinds.append("empty")
                texts.append("")
                continue
            for r in recs:
                ords.append(o)
                kinds.append("record")
                texts.append(r)
            for kind, v in (("head", head), ("tail", tail), ("bridge", bridge)):
                if v is not None:
                    ords.append(o)
                    kinds.append(kind)
                    texts.append(v)
        return pa.table(
            {
                "ordinal": pa.array(ords, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                self.column: pa.array(texts, pa.string()),
            }
        )


def read_multiline_text(
    path: str, column: str = "text"
) -> "rd.Dataset":
    """Read a directory/glob of text files as multiline records, correct
    across every file boundary. Returns a Dataset with ``(ordinal,
    {column})`` — ordinal is the file index of the record's start."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no files under {path}")
    paths = rd.from_items(
        [{"ordinal": i, "path": f} for i, f in enumerate(files)]
    ).repartition(len(files))
    split = paths.map_batches(
        _FileSplitter(column), batch_format="pyarrow"
    ).materialize()  # tiny: records are line-grouped text

    closed = split.filter(expr="kind == 'record'").drop_columns(["kind"])

    frag_rows = sorted(
        split.filter(expr="kind != 'record'").take_all(),
        key=lambda r: r["ordinal"],
    )
    by_ord: dict[int, dict[str, str]] = {}
    for r in frag_rows:
        by_ord.setdefault(r["ordinal"], {})[r["kind"]] = r[column]
    frags = [
        (
            by_ord.get(i, {}).get("head"),
            by_ord.get(i, {}).get("tail"),
            by_ord.get(i, {}).get("bridge"),
            "empty" in by_ord.get(i, {}),
        )
        for i in range(len(files))
    ]
    stitched = stitch_fragments(frags)
    if stitched:
        extra = rd.from_arrow(
            pa.table(
                {
                    "ordinal": pa.array([-1] * len(stitched), pa.int64()),
                    column: pa.array(stitched, pa.string()),
                }
            )
        )
        return closed.union(extra)
    return closed
