"""System-expression placeholders for polling-CDC filters — the analog
of the reference's Quartz filter family (P11).

Reference: ``sdk/enums/QuartzFilterEnum.java:18-50`` defines eight
placeholders (``$timestamp_begin$``, ``$timestamp_end$``,
``$date_begin$``, ``$date_end$``, ``$date_yes_begin$``,
``$date_yes_end$``, ``$timestamp_yes_begin$``, ``$timestamp_yes_end$``)
whose values come from the four ``sdk/listener/filter/*Filter.java``
implementations: timestamps render as epoch millis, dates as
``yyyy-MM-dd HH:mm:ss``; the ``yes`` variants are yesterday 00:00:00 /
23:59:59. ``ESQuartzListener.captureSnapshot`` freezes *begin*-class
placeholders at job start so the incremental phase resumes from the
full-sync watermark, and a placeholder appearing twice in one filter
set is an error (``ESQuartzListener.java:63-72``).

Spark shape: resolution is a driver-side value substitution happening
BEFORE the plan is built, so the executors only ever see literal
predicates — the filters stay pushdown-able Column comparisons. ``now``
is injected (never read ambiently) so resolution is deterministic and
replayable, matching the engine-wide rule that a resumed job re-derives
identical plans.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

_DATE_FMT = "%Y-%m-%d %H:%M:%S"


def _yesterday_begin(now: datetime) -> datetime:
    return (now - timedelta(days=1)).replace(hour=0, minute=0, second=0, microsecond=0)


def _yesterday_end(now: datetime) -> datetime:
    return (now - timedelta(days=1)).replace(
        hour=23, minute=59, second=59, microsecond=999999
    )


def _millis(dt: datetime) -> str:
    # a NAIVE datetime is interpreted as UTC: .timestamp() alone reads
    # it in the host's LOCAL zone, so the same injected `now` rendered
    # different epoch millis on differently-configured hosts — breaking
    # the module's deterministic/replayable resolution contract and
    # disagreeing with the $date_*$ renderings of the same value
    # (r5 review). Aware datetimes keep their own zone.
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return str(int(dt.timestamp() * 1000))


# name -> (is_begin, render(now) -> str), mirroring QuartzFilterEnum order
PLACEHOLDERS: dict[str, tuple[bool, object]] = {
    "$timestamp_begin$": (True, _millis),
    "$timestamp_end$": (False, _millis),
    "$date_begin$": (True, lambda now: now.strftime(_DATE_FMT)),
    "$date_end$": (False, lambda now: now.strftime(_DATE_FMT)),
    "$date_yes_begin$": (True, lambda now: _yesterday_begin(now).strftime(_DATE_FMT)),
    "$date_yes_end$": (False, lambda now: _yesterday_end(now).strftime(_DATE_FMT)),
    "$timestamp_yes_begin$": (True, lambda now: _millis(_yesterday_begin(now))),
    "$timestamp_yes_end$": (False, lambda now: _millis(_yesterday_end(now))),
}


_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
}


def polling_window(df, filters, snapshot: dict[str, str], now: datetime):
    """Resolve placeholders, then apply the filters as one AND-composed
    predicate — the polling-CDC batch shape (C2): every comparison is a
    literal after resolution, so it pushes down to the parquet scan."""
    from functools import reduce

    resolved = resolve_filters(filters, snapshot, now)
    preds = [_OPS[op](df[col], v) for col, op, v in resolved]
    return df.filter(reduce(lambda a, b: a & b, preds)) if preds else df


def is_system_placeholder(value: object) -> bool:
    """``QuartzFilterEnum.isSystemPlaceholder``: exact (trimmed) match."""
    return isinstance(value, str) and value.strip() in PLACEHOLDERS


def resolve_filters(
    filters: list[tuple[str, str, object]],
    snapshot: dict[str, str],
    now: datetime,
) -> list[tuple[str, str, object]]:
    """Substitute system placeholders in ``(column, op, value)`` filters.

    Begin-class placeholders freeze: the first resolution writes the
    value into ``snapshot`` (mutated in place — it is the persisted
    watermark) and later calls reuse it, so a full sync and the
    incremental phase that follows share one watermark
    (``ESQuartzListener.java:49-83``). End-class placeholders re-render
    from ``now`` on every call. The same placeholder twice in one
    filter set raises, as in the reference.
    """
    seen: set[str] = set()
    out: list[tuple[str, str, object]] = []
    for col, op, value in filters:
        if not is_system_placeholder(value):
            out.append((col, op, value))
            continue
        name = str(value).strip()
        if name in seen:
            raise ValueError(f"system placeholder appears more than once: {name}")
        seen.add(name)
        begin, render = PLACEHOLDERS[name]
        if begin:
            if name not in snapshot:
                snapshot[name] = render(now)
            out.append((col, op, snapshot[name]))
        else:
            out.append((col, op, render(now)))
    return out
