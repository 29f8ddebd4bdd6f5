"""Gap detection + classification + market-boundary splitting (SURVEY §2.5 W9).

Reference: delta = ts - lag(ts) per symbol; a gap exists when delta exceeds
2x the expected tick interval (data_coverage_report.py:83-180); the gap is
then classified by duration and market calendar (market_calendar.py:425-499):

    SEAMLESS  < 5 s
    WEEKEND   Fri>=20:00 UTC -> Sun<=22:00 UTC, 40-80 h (primary pattern);
              Sat -> Sun<=22:00, 24-50 h (alternative) — weekend-closure
              markets only (market_types.py WeekendClosureWindow)
    HOLIDAY   >= 20 h containing a market holiday (Dec 25 / Jan 1),
              market_calendar.py MARKET_HOLIDAYS + gap_contains_holiday
    SHORT     < 0.5 h
    MODERATE  0.5 h - 4 h
    LARGE     > 4 h

Gaps longer than 80 h are SPLIT at weekend boundaries (Fri 20:00 / Sun
22:00 UTC) before classification so multi-weekend data loss is not masked
as one weekend closure (market_calendar.split_gap_at_market_boundaries:501).

Pure lag + when-chain classification — no UDF, stays in codegen. The
splitter generates segment edges row-locally (sequence + transform over the
few LARGE gaps), so it adds no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

SEAMLESS_MS = 5_000
SHORT_MS = 30 * 60_000
MODERATE_MS = 4 * 3600_000
# WeekendClosureWindow defaults (market_types.py:34-39)
FRI_CLOSE_HOUR = 20
SUN_OPEN_HOUR = 22
WEEKEND_MIN_MS = 40 * 3600_000
WEEKEND_MAX_MS = 80 * 3600_000
WEEKEND_ALT_MIN_MS = 24 * 3600_000
WEEKEND_ALT_MAX_MS = 50 * 3600_000
HOLIDAY_MIN_MS = 20 * 3600_000
# MARKET_HOLIDAYS (market_calendar.py:31): (month, day)
MARKET_HOLIDAYS = ((12, 25), (1, 1))


def _contains_holiday(start_ts: Column, end_ts: Column) -> Column:
    """True iff any calendar date in [start.date, end.date] is a market
    holiday (gap_contains_holiday). Closed-form: check the holiday's
    occurrence in the start year and in the end year; any gap spanning a
    full year contains every holiday."""
    sd = F.to_date(start_ts)
    ed = F.to_date(end_ts)
    checks = [F.datediff(ed, sd) >= 366]
    for m, d in MARKET_HOLIDAYS:
        for yr in (F.year(sd), F.year(ed)):
            h = F.make_date(yr, F.lit(m), F.lit(d))
            checks.append(h.between(sd, ed))
    out = checks[0]
    for c in checks[1:]:
        out = out | c
    return out


def classify_gap(
    gap_ms: Column, start_ts: Column, end_ts: Column, weekend_closure: bool = False
) -> Column:
    """Duration (+ weekend/holiday) classification — when-chain mirror of
    market_calendar.classify_gap, including the exact primary/alternative
    weekend patterns (market_types.py:55-108; note the reference checks
    end weekday == Sunday with hour <= 22, and we mirror the code, not its
    'Monday morning' comment)."""
    c = F.when(gap_ms < SEAMLESS_MS, F.lit("SEAMLESS"))
    if weekend_closure:
        start_dow = F.weekday(start_ts)  # Mon=0
        end_dow = F.weekday(end_ts)
        primary = (
            (start_dow == 4)
            & (F.hour(start_ts) >= FRI_CLOSE_HOUR)
            & (end_dow == 6)
            & (F.hour(end_ts) <= SUN_OPEN_HOUR)
            & (gap_ms >= WEEKEND_MIN_MS)
            & (gap_ms <= WEEKEND_MAX_MS)
        )
        alternative = (
            (start_dow == 5)
            & (end_dow == 6)
            & (F.hour(end_ts) <= SUN_OPEN_HOUR)
            & (gap_ms >= WEEKEND_ALT_MIN_MS)
            & (gap_ms <= WEEKEND_ALT_MAX_MS)
        )
        c = c.when(primary | alternative, F.lit("WEEKEND"))
        c = c.when(
            (gap_ms >= HOLIDAY_MIN_MS) & _contains_holiday(start_ts, end_ts),
            F.lit("HOLIDAY"),
        )
    return (
        c.when(gap_ms < SHORT_MS, F.lit("SHORT"))
        .when(gap_ms < MODERATE_MS, F.lit("MODERATE"))
        .otherwise(F.lit("LARGE"))
    )


def split_gaps_at_market_boundaries(
    gaps: DataFrame,
    *,
    start: str = "gap_start",
    end: str = "gap_end",
) -> DataFrame:
    """Split gaps longer than the 80 h weekend ceiling at Fri-close /
    Sun-open boundaries; shorter gaps pass through as one segment
    (market_calendar.split_gap_at_market_boundaries:501-556). Adds
    ``segment_start``, ``segment_end``, ``segment_ms``, ``n_segments``;
    each segment is then classified independently by the caller.

    Row-local: boundary instants come from a per-row week sequence
    (bounded by the gap length), no shuffle and no UDF."""
    s_col, e_col = F.col(start), F.col(end)
    # Monday 00:00 of each week overlapping the gap, one week of margin
    weeks = F.sequence(
        F.date_trunc("week", s_col - F.expr("INTERVAL 7 DAYS")),
        e_col + F.expr("INTERVAL 7 DAYS"),
        F.expr("INTERVAL 7 DAYS"),
    )
    bounds = F.filter(
        F.flatten(
            F.transform(
                weeks,
                lambda w: F.array(
                    w + F.expr(f"INTERVAL {4 * 24 + FRI_CLOSE_HOUR} HOURS"),  # Fri 20:00
                    w + F.expr(f"INTERVAL {6 * 24 + SUN_OPEN_HOUR} HOURS"),  # Sun 22:00
                ),
            )
        ),
        lambda x: (x > s_col) & (x < e_col),
    )
    long_gap = (F.unix_millis(e_col) - F.unix_millis(s_col)) > WEEKEND_MAX_MS
    edges = F.when(
        long_gap,
        F.concat(F.array(s_col), F.array_sort(bounds), F.array(e_col)),
    ).otherwise(F.array(s_col, e_col))
    n = F.size(edges)
    seg = F.arrays_zip(
        F.slice(edges, 1, n - 1).alias("segment_start"),
        F.slice(edges, 2, n - 1).alias("segment_end"),
    )
    out = gaps.withColumn("n_segments", n - 1).withColumn(
        "__seg", F.explode(seg)
    )
    return (
        out.withColumn("segment_start", F.col("__seg.segment_start"))
        .withColumn("segment_end", F.col("__seg.segment_end"))
        .withColumn(
            "segment_ms",
            F.unix_millis(F.col("segment_end")) - F.unix_millis(F.col("segment_start")),
        )
        .drop("__seg")
    )


def detect_gaps(
    ticks: DataFrame,
    expected_interval_ms: int,
    *,
    key: str = "symbol",
    ts: str = "timestamp",
    tiebreak: str | None = None,
    weekend_closure: bool = False,
) -> DataFrame:
    """Rows describing every inter-tick gap > 2x expected interval."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    ms = F.unix_millis(F.col(ts))
    df = ticks.select(
        F.col(key).alias("key"),
        F.col(ts).alias("gap_end"),
        ms.alias("__ms"),
        F.lag(ms).over(w).alias("__prev_ms"),
        F.lag(ts).over(w).alias("gap_start"),
    )
    gap_ms = F.col("__ms") - F.col("__prev_ms")
    return (
        df.where(F.col("__prev_ms").isNotNull() & (gap_ms > 2 * expected_interval_ms))
        .select(
            "key",
            "gap_start",
            "gap_end",
            gap_ms.alias("gap_ms"),
            classify_gap(gap_ms, F.col("gap_start"), F.col("gap_end"), weekend_closure).alias(
                "gap_class"
            ),
        )
    )


def sessionize(
    df: DataFrame,
    gap_ms: int,
    *,
    key: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event exceeds ``gap_ms``; session_id is the running count
    of session starts per key (lag + conditional cumsum — one window pass,
    no UDF). This is the batch analogue of streaming session windows and the
    generalization of the reference's fixed UTC-hour session labels (S4) to
    activity-defined sessions."""
    w = Window.partitionBy(key).orderBy(ts)
    delta = F.unix_millis(F.col(ts)) - F.unix_millis(F.lag(ts).over(w))
    is_new = F.when(delta.isNull() | (delta > gap_ms), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    gap_ms: int,
    *,
    key: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """Per-session envelope: start/end/duration/event count."""
    s = sessionize(df, gap_ms, key=key, ts=ts)
    return s.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.unix_millis(F.max(ts)) - F.unix_millis(F.min(ts))).alias("duration_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


def trading_days_between(saved_at, now, *, weekend_aware: bool = True) -> int:
    """Trading days elapsed between two instants — the weekend-aware
    staleness measure of the reference's state store
    (algo_state_store.py:234-250 + market_calendar.get_trading_days:
    119-141): count Mon-Fri calendar dates in [saved_at.date, now.date]
    INCLUSIVE, minus one (same-day = 0 days old), so a Friday-night
    snapshot restored Monday morning is 1 trading day old, not 3 calendar
    days. ``weekend_aware=False`` (24/7 markets, e.g. crypto) counts plain
    calendar days — there a Friday snapshot genuinely IS 3 days of missed
    market on Monday. Driver-side scalar helper (restore-time planning
    check), not a DataFrame op."""
    from datetime import timedelta

    if saved_at > now:
        raise ValueError(f"saved_at {saved_at} is after now {now}")
    d0, d1 = saved_at.date(), now.date()
    if not weekend_aware:
        return (d1 - d0).days
    # numpy busday_count is half-open [d0, d1); add one day to make the
    # range inclusive, then the same minus-one convention as above — O(1)
    # instead of the old O(days) date loop (VERDICT r9 cosmetic #3)
    import numpy as np

    days = int(np.busday_count(d0, d1 + timedelta(days=1)))
    return max(0, days - 1)
