"""Gap detection + classification (SURVEY §2.5 W9).

Reference: delta = ts - lag(ts) per symbol; a gap exists when delta exceeds
2x the expected tick interval (data_coverage_report.py:83-180); the gap is
then classified by duration and market calendar (market_calendar.py:425-499):

    SEAMLESS  < 5 s
    WEEKEND   Fri-evening -> Mon-morning pattern (weekend-closure markets)
    SHORT     < 0.5 h
    MODERATE  0.5 h - 4 h
    LARGE     > 4 h

Pure lag + when-chain — no UDF, stays in codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

SEAMLESS_MS = 5_000
SHORT_MS = 30 * 60_000
MODERATE_MS = 4 * 3600_000
WEEKEND_MIN_MS = 24 * 3600_000
WEEKEND_MAX_MS = 80 * 3600_000  # max_duration_hours=80 (market_calendar.py)


def classify_gap(
    gap_ms: Column, start_ts: Column, end_ts: Column, weekend_closure: bool = False
) -> Column:
    """Duration (+ weekend-pattern) classification — when-chain mirror of
    market_calendar.classify_gap."""
    c = F.when(gap_ms < SEAMLESS_MS, F.lit("SEAMLESS"))
    if weekend_closure:
        # Primary pattern: starts Fri(4)/Sat(5) (weekday, Mon=0), ends
        # Sun(6)/Mon(0), duration in the weekend band.
        start_dow = F.weekday(start_ts)
        end_dow = F.weekday(end_ts)
        weekend = (
            (gap_ms >= WEEKEND_MIN_MS)
            & (gap_ms <= WEEKEND_MAX_MS)
            & start_dow.isin(4, 5)
            & end_dow.isin(6, 0)
        )
        c = c.when(weekend, F.lit("WEEKEND"))
    return (
        c.when(gap_ms < SHORT_MS, F.lit("SHORT"))
        .when(gap_ms < MODERATE_MS, F.lit("MODERATE"))
        .otherwise(F.lit("LARGE"))
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
