"""Pure-Python single-process oracle for the flagship DAG (SURVEY.md §5).

Row-at-a-time `re`-based reimplementation of parse → enrich → route →
aggregate, deliberately written in the reference's one-message-at-a-time
style (src/core/node.js:470-498) so the vectorized Ray stages are checked
against an independent implementation, not themselves.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

RE_TOOL = re.compile(r"<tool:([a-z_]+)\b")
RE_WELL = re.compile(r"<tool:[a-z_]+.*</tool>")
RE_ERR = re.compile(r"(ERR-[0-9]{4})")
RE_RTAG = re.compile(r"^\[role=([a-z]+)\]")


def parse_row(text: str) -> dict:
    ok = "\n" not in text and (("<tool:" not in text) or bool(RE_WELL.search(text)))
    if not ok:
        return {"parsed_tool": None, "error_code": None, "role_tag": None,
                "parse_ok": False}
    m = RE_TOOL.search(text)
    e = RE_ERR.search(text)
    r = RE_RTAG.search(text)
    return {
        "parsed_tool": m.group(1) if m else None,
        "error_code": e.group(1) if e else None,
        "role_tag": r.group(1) if r else None,
        "parse_ok": True,
    }


def run_oracle(transcripts: pa.Table, conv_meta: pa.Table) -> dict:
    """Full DAG oracle → dict of pandas DataFrames: parsed, routed, counts,
    sinks {tag: rows}."""
    df = transcripts.to_pandas()
    parsed = pd.DataFrame([parse_row(t) for t in df["text"]])
    df = pd.concat([df.reset_index(drop=True), parsed], axis=1)

    meta = conv_meta.to_pandas().set_index("conv_id")
    df = df.join(meta, on="conv_id")

    seqs = []
    for _, g in df.groupby("conv_id", sort=False):
        order = g["turn_idx"].sort_values(kind="mergesort")
        rank = pd.Series(range(len(order)), index=order.index, dtype="int64")
        seqs.append(rank)
    df["seq_in_conv"] = pd.concat(seqs).reindex(df.index)

    df["hour"] = df["ts"].dt.floor("h")

    def tag(row):
        if row["error_code"] is not None:
            return "errors"
        if row["parsed_tool"] is not None and row["parsed_tool"] != "":
            return "tools"
        return "chat"

    df["sink_tag"] = df.apply(tag, axis=1)
    df["audit"] = df["priority"] >= 2

    sinks = {t: df[df["sink_tag"] == t] for t in ("errors", "tools", "chat")}
    sinks["audit"] = df[df["audit"]]

    rows = []
    for name, sub in list(sinks.items()):
        grp = (
            sub.assign(tool_out=sub["parsed_tool"].fillna(""))
            .groupby(["role", "tool_out", "hour"], sort=False)
            .size()
            .reset_index(name="n")
        )
        grp.insert(0, "sink_tag", name)
        rows.append(grp)
    counts = pd.concat(rows, ignore_index=True).rename(columns={"tool_out": "tool"})
    return {"df": df, "sinks": sinks, "counts": counts}
