from datetime import datetime

import pytest

from node_shovel_ray.functions.cron import next_fire, parse_cron, poll_deadlines

T0 = datetime(2026, 3, 14, 10, 30)  # Saturday


def test_every_15_minutes():
    assert next_fire("*/15 * * * *", T0) == datetime(2026, 3, 14, 10, 45)
    assert next_fire("*/15 * * * *", datetime(2026, 3, 14, 10, 45)) == datetime(
        2026, 3, 14, 11, 0
    )  # strictly after


def test_weekday_morning():
    # 9am weekdays from a Saturday → Monday 9:00
    assert next_fire("0 9 * * 1-5", T0) == datetime(2026, 3, 16, 9, 0)


def test_dom_dow_or_rule():
    # vixie OR: both restricted → 1st of month OR Monday, whichever first
    assert next_fire("0 0 1 * 1", T0) == datetime(2026, 3, 16, 0, 0)  # Monday
    # from Mar 30 (Monday) 01:00 the next is Apr 1 (dom) before Apr 6 (Monday)
    assert next_fire("0 0 1 * 1", datetime(2026, 3, 30, 1, 0)) == datetime(
        2026, 4, 1, 0, 0
    )


def test_names_and_sunday_alias():
    assert next_fire("0 12 * jan sun", T0) == datetime(2027, 1, 3, 12, 0)
    assert parse_cron("0 0 * * 7").dow == parse_cron("0 0 * * 0").dow


def test_steps_with_range_and_lists():
    s = parse_cron("10-40/15 1,13 * * *")
    assert sorted(s.minute) == [10, 25, 40]
    assert sorted(s.hour) == [1, 13]


def test_stepped_dom_keeps_star_flag():
    # ADVICE r4: vixie sets DOM_STAR when the field BEGINS with '*', so
    # "0 0 */2 * 1" = Mondays whose day-of-month is odd (AND, not OR).
    s = parse_cron("0 0 */2 * 1")
    assert s.dom_star and not s.dow_star
    # Mar 16 2026 is a Monday but an even day → skipped; Mar 23 is odd
    assert next_fire("0 0 */2 * 1", T0) == datetime(2026, 3, 23)
    # both fields fully restricted → vixie OR rule still applies
    assert next_fire("0 0 15 * 1", T0) == datetime(2026, 3, 15)


def test_month_rollover():
    # only fires in December → jumps months, then years
    assert next_fire("5 4 2 12 *", T0) == datetime(2026, 12, 2, 4, 5)


def test_impossible_date_raises():
    with pytest.raises(ValueError):
        next_fire("0 0 30 2 *", T0)  # Feb 30 never exists


def test_bad_expressions_raise():
    for expr in ("* * * *", "61 * * * *", "* * * * 8", "5-2 * * * *",
                 "*/0 * * * *"):
        with pytest.raises(ValueError):
            parse_cron(expr)


def test_poll_deadlines_interval_and_schedule():
    dl = poll_deadlines(T0, n=3, interval_ms=90_000)
    assert dl == [datetime(2026, 3, 14, 10, 31, 30),
                  datetime(2026, 3, 14, 10, 33, 0),
                  datetime(2026, 3, 14, 10, 34, 30)]
    dl2 = poll_deadlines(T0, n=2, schedule="*/30 * * * *")
    assert dl2 == [datetime(2026, 3, 14, 11, 0), datetime(2026, 3, 14, 11, 30)]
    with pytest.raises(ValueError):
        poll_deadlines(T0, schedule="* * * * *", interval_ms=1000)
