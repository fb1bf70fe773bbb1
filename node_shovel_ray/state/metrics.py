"""Per-stage operational counters for a pipeline run — the batch analogue
of the reference's aggregated Prometheus metrics (per-node counters
gathered and reduced across workers, src/core/aggregated_metrics.js:100-209,
per-node in/out/ack counters src/core/node.js:277-289).

Two artifacts, both first-class (written into the run's manifest, not ad
hoc test assertions):

- **stage counters** (:func:`stage_counters`): per-partition
  ``in / routed / ignored / rejected`` with the reference's invariant
  ``in == routed + ignored + rejected`` checked and recorded (reference
  pipeline totals, src/core/master.js:183-185). Broadcast sinks (rows
  also kept in a primary sink) are excluded from ``routed`` so the
  invariant holds under fan-out.
- **operator stats** (:func:`parse_operator_stats`): per-operator wall
  time / task count / output rows parsed from ``Dataset.stats()`` — what
  an operator of the 100 TB job watches. Parsing is tolerant: an
  unrecognized stats layout degrades to an empty list, never an error.

`ResumableRunner` embeds both in each partition's commit marker and
re-reduces them across partitions in :meth:`ResumableRunner.metrics`
(state/manifest.py) — the same gather-then-aggregate shape as the
reference's master/worker registry protocol.
"""

from __future__ import annotations

import re

_OP_RE = re.compile(
    r"^Operator\s+\d+\s+(?P<name>.+?):\s+(?P<tasks>\d+)\s+tasks executed,"
    r"\s+(?P<blocks>\d+)\s+blocks produced in\s+(?P<sec>[\d.]+)s",
    re.M,
)
_ROWS_RE = re.compile(
    r"^\* Output num rows per block:.*?,\s+(?P<total>\d+)\s+total", re.M
)


def parse_operator_stats(stats_text: str) -> list[dict]:
    """``Dataset.stats()`` text → one dict per operator:
    ``{operator, tasks, blocks, wall_sec, rows_out}``."""
    ops = []
    matches = list(_OP_RE.finditer(stats_text or ""))
    for i, m in enumerate(matches):
        seg_end = matches[i + 1].start() if i + 1 < len(matches) else len(stats_text)
        seg = stats_text[m.start() : seg_end]
        rows = _ROWS_RE.search(seg)
        ops.append(
            {
                "operator": m.group("name"),
                "tasks": int(m.group("tasks")),
                "blocks": int(m.group("blocks")),
                "wall_sec": float(m.group("sec")),
                "rows_out": int(rows.group("total")) if rows else None,
            }
        )
    return ops


def stage_counters(
    rows_in: int,
    sink_rows: dict[str, int],
    broadcast: tuple[str, ...] = ("audit",),
    ignored: int = 0,
    rejected: int | None = None,
    deadletter: tuple[str, ...] = ("rejects",),
) -> dict:
    """The reference's per-pipeline counter set with its reconciliation
    invariant evaluated (never silently assumed).

    ``broadcast`` sinks duplicate rows already in a primary sink →
    excluded from ``routed``. ``deadletter`` sinks hold rejected rows →
    counted as ``rejected`` (unless an explicit count is given), not
    ``routed``."""
    routed = sum(
        n for tag, n in sink_rows.items()
        if tag not in broadcast and tag not in deadletter
    )
    if rejected is None:
        rejected = sum(n for tag, n in sink_rows.items() if tag in deadletter)
    return {
        "in": int(rows_in),
        "routed": int(routed),
        "ignored": int(ignored),
        "rejected": int(rejected),
        "broadcast_rows": {t: int(sink_rows[t]) for t in sink_rows if t in broadcast},
        "reconciled": int(rows_in) == routed + int(ignored) + int(rejected),
    }


def merge_counters(parts: list[dict]) -> dict:
    """Reduce per-partition counters into run totals (sum counters, AND
    the reconciliation flags) — aggregated_metrics.js's gather step."""
    out = {"in": 0, "routed": 0, "ignored": 0, "rejected": 0,
           "broadcast_rows": {}, "reconciled": True}
    for c in parts:
        for k in ("in", "routed", "ignored", "rejected"):
            out[k] += c.get(k, 0)
        for t, n in c.get("broadcast_rows", {}).items():
            out["broadcast_rows"][t] = out["broadcast_rows"].get(t, 0) + n
        out["reconciled"] = out["reconciled"] and c.get("reconciled", True)
    return out
