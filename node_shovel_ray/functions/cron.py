"""Cron-expression schedule — the reference's http-request input polls on a
``schedule`` (5-field cron via CronJob) or a fixed ``interval`` in ms
(src/inputs/http-request.js:60-71, 164-192). This is the batch engine's
deterministic twin: parse the published crontab grammar and compute the
next fire time as a PURE function of (expr, after) — no wall clock, per
the engine's determinism invariant. Drive :func:`poll_deadlines` from an
external scheduler loop that owns the clock.

Grammar (standard crontab, minute-resolution):
  minute hour day-of-month month day-of-week
  - ``*``; lists ``1,5,9``; ranges ``2-5``; steps ``*/15``, ``10-40/5``
  - month/day names (jan..dec, sun..sat), case-insensitive
  - day-of-week 0-7 with 7 == 0 (Sunday)
  - standard OR rule: when BOTH day-of-month and day-of-week are
    restricted, a day matches if EITHER matches (the published vixie-cron
    behavior).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_FIELDS = (
    ("minute", 0, 59, {}),
    ("hour", 0, 23, {}),
    ("dom", 1, 31, {}),
    ("month", 1, 12, {n: i + 1 for i, n in enumerate(
        "jan feb mar apr may jun jul aug sep oct nov dec".split())}),
    ("dow", 0, 7, {n: i for i, n in enumerate(
        "sun mon tue wed thu fri sat".split())}),
)


@dataclass(frozen=True)
class CronSpec:
    minute: frozenset
    hour: frozenset
    dom: frozenset
    month: frozenset
    dow: frozenset
    dom_star: bool  # needed for the vixie OR rule
    dow_star: bool


def _parse_field(text: str, lo: int, hi: int, names: dict) -> tuple[frozenset, bool]:
    def atom(a: str) -> int:
        a = a.lower()
        if a in names:
            return names[a]
        v = int(a)
        if not (lo <= v <= hi):
            raise ValueError(f"cron field value {v} outside {lo}-{hi}")
        return v

    # vixie cron sets the DOM_STAR/DOW_STAR flag when the field BEGINS with
    # '*' (so "*/2" counts as star for the dom/dow OR rule), not only when
    # it is exactly "*"
    star = text.startswith("*")
    out: set[int] = set()
    for part in text.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >=1, got {step}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = atom(a_s), atom(b_s)
            if b < a:
                raise ValueError(f"cron range {a}-{b} is reversed")
        else:
            a = b = atom(part)
            if step != 1:  # "5/15" means 5-hi/15 in vixie cron
                b = hi
        out.update(range(a, b + 1, step))
    return frozenset(out), star


def parse_cron(expr: str) -> CronSpec:
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron expression needs 5 fields, got {len(parts)}: {expr!r}")
    vals, stars = [], []
    for text, (_, lo, hi, names) in zip(parts, _FIELDS):
        v, star = _parse_field(text, lo, hi, names)
        vals.append(v)
        stars.append(star)
    minute, hour, dom, month, dow = vals
    dow = frozenset(0 if d == 7 else d for d in dow)  # 7 == Sunday == 0
    return CronSpec(minute, hour, dom, month, dow,
                    dom_star=stars[2], dow_star=stars[4])


def _day_matches(spec: CronSpec, d: datetime) -> bool:
    # python weekday(): Mon=0..Sun=6 → cron Sun=0..Sat=6
    cron_dow = (d.weekday() + 1) % 7
    dom_ok = d.day in spec.dom
    dow_ok = cron_dow in spec.dow
    # published vixie rule: if EITHER field begins with '*' (its star flag
    # set), the day must satisfy BOTH; only when both are fully restricted
    # does the OR rule apply. A plain '*' makes its _ok always true, so
    # this reduces to the familiar special cases.
    if spec.dom_star or spec.dow_star:
        return dom_ok and dow_ok
    return dom_ok or dow_ok


def next_fire(spec: CronSpec | str, after: datetime) -> datetime:
    """First fire time STRICTLY after ``after`` (minute resolution).

    Pure function — the caller owns the clock. Bounded search (~4 years)
    guards impossible dates like ``0 0 30 2 *``."""
    if isinstance(spec, str):
        spec = parse_cron(spec)
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    limit = after + timedelta(days=4 * 366)
    while t <= limit:
        if t.month not in spec.month:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0) + timedelta(days=32)).replace(
                day=1, hour=0, minute=0
            )
            continue
        if not _day_matches(spec, t):
            t = (t + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if t.hour not in spec.hour:
            t = (t + timedelta(hours=1)).replace(minute=0)
            continue
        if t.minute not in spec.minute:
            t += timedelta(minutes=1)
            continue
        return t
    raise ValueError("cron expression never fires (impossible date?)")


def poll_deadlines(
    after: datetime,
    n: int = 1,
    schedule: str | None = None,
    interval_ms: int | None = None,
) -> list[datetime]:
    """Next ``n`` poll deadlines — mirrors the reference's config surface
    (exactly one of ``schedule`` / ``interval``)."""
    if (schedule is None) == (interval_ms is None):
        raise ValueError("exactly one of schedule / interval_ms required")
    out: list[datetime] = []
    if interval_ms is not None:
        if interval_ms <= 0:
            raise ValueError(f"interval_ms must be positive, got {interval_ms}")
        step = timedelta(milliseconds=interval_ms)
        t = after
        for _ in range(n):
            t = t + step
            out.append(t)
        return out
    spec = parse_cron(schedule)
    t = after
    for _ in range(n):
        t = next_fire(spec, t)
        out.append(t)
    return out
