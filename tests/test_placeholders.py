"""System-expression placeholders (P11) — reference
``QuartzFilterEnum.java`` values + ``ESQuartzListener`` freeze/dup rules."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dbsyncer_spark.functions.placeholders import (
    is_system_placeholder,
    resolve_filters,
)

NOW = datetime(2026, 8, 17, 10, 30, 45, tzinfo=timezone.utc)


def test_values_match_reference_filters():
    snap: dict[str, str] = {}
    filters = [
        ("ts", ">=", "$timestamp_begin$"),
        ("ts", "<", "$timestamp_end$"),
        ("d", ">=", "$date_begin$"),
        ("d", ">=", "$date_yes_begin$"),
        ("d", "<=", "$date_yes_end$"),
        ("ts", ">=", "$timestamp_yes_begin$"),
        ("ts", "<=", "$timestamp_yes_end$"),
    ]
    out = resolve_filters(filters, snap, NOW)
    vals = [v for _c, _o, v in out]
    ms = str(int(NOW.timestamp() * 1000))
    assert vals[0] == ms and vals[1] == ms  # TimestampFilter: epoch millis
    assert vals[2] == "2026-08-17 10:30:45"  # DateFilter: yyyy-MM-dd HH:mm:ss
    assert vals[3] == "2026-08-16 00:00:00"  # YesDateFilter begin
    assert vals[4] == "2026-08-16 23:59:59"  # YesDateFilter end
    y0 = datetime(2026, 8, 16, 0, 0, 0, tzinfo=timezone.utc)
    assert vals[5] == str(int(y0.timestamp() * 1000))


def test_begin_freezes_end_advances():
    snap: dict[str, str] = {}
    f = [("ts", ">=", "$timestamp_begin$"), ("ts", "<", "$timestamp_end$")]
    first = resolve_filters(f, snap, NOW)
    later = datetime(2026, 8, 17, 11, 0, 0, tzinfo=timezone.utc)
    second = resolve_filters(f, snap, later)
    # begin reuses the snapshot watermark; end re-renders from `now`
    assert second[0][2] == first[0][2]
    assert second[1][2] != first[1][2]
    assert snap == {"$timestamp_begin$": first[0][2]}


def test_duplicate_placeholder_raises_and_plain_values_pass():
    with pytest.raises(ValueError):
        resolve_filters(
            [("a", ">", "$date_begin$"), ("b", ">", "$date_begin$")], {}, NOW
        )
    out = resolve_filters([("a", "=", "x"), ("b", "=", 5)], {}, NOW)
    assert out == [("a", "=", "x"), ("b", "=", 5)]
    assert is_system_placeholder(" $timestamp_begin$ ")
    assert not is_system_placeholder("$nope$") and not is_system_placeholder(7)


def test_polling_window_pushdown(spark):
    """Resolved placeholders are literals -> the comparison reaches the
    scan as a PushedFilter (C2 polling shape)."""
    from dbsyncer_spark.functions.placeholders import polling_window

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    snap: dict[str, str] = {}
    now = datetime(2024, 3, 1, tzinfo=timezone.utc)
    out = polling_window(
        ev.select("event_id", "ts"),
        [("ts", ">=", "$date_yes_begin$"), ("ts", "<", "$date_end$")],
        snap,
        now,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(ts)" in plan
    assert snap["$date_yes_begin$"] == "2024-02-29 00:00:00"
    out.count()  # executes the pruned scan
