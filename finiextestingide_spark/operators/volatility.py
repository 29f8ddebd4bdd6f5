"""Volatility-regime period profiling (SURVEY §2.4 A3/A4).

Reference: bars grouped into N-hour periods; each period's mean ATR is
classified RELATIVE to the global mean ATR into 5 regimes, plus a percentile
rank = share of periods with strictly smaller ATR
(volatility_profile_analyzer.py:449-576, thresholds :580-600).

Spark-first: one hash agg to periods, then the global mean and the strict
percentile as window functions over the (tiny) period table — no driver
round-trip, no second scan of the bars.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

DEFAULT_THRESHOLDS = (0.5, 0.8, 1.2, 2.0)
REGIMES = ("VERY_LOW", "LOW", "MEDIUM", "HIGH", "VERY_HIGH")


def classify_regime(ratio: Column, thresholds: Sequence[float] = DEFAULT_THRESHOLDS) -> Column:
    t = list(thresholds)
    return (
        F.when(ratio < t[0], F.lit(REGIMES[0]))
        .when(ratio < t[1], F.lit(REGIMES[1]))
        .when(ratio < t[2], F.lit(REGIMES[2]))
        .when(ratio < t[3], F.lit(REGIMES[3]))
        .otherwise(F.lit(REGIMES[4]))
    )


def volatility_periods(
    bars: DataFrame,
    granularity_hours: int = 1,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    atr: str = "atr",
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
) -> DataFrame:
    """Period rows: avg ATR, ratio to the symbol's global mean, regime label,
    strict percentile rank, tick stats, hi/lo range."""
    period = (
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts)) / (granularity_hours * 3600))
            * (granularity_hours * 3600)
        )
    ).alias("period_start")
    # DETERMINISM: these two averages are the only order-sensitive float
    # reductions in the operator (everything upstream is a sorted window
    # pass). A plain double avg sums in shuffle-fetch / thread order, which
    # varies run to run and once flipped a value across a round(6) boundary
    # in the cross-engine gate. Averaging over an exact DECIMAL cast makes
    # the sum order-independent; the final cast back to double is a
    # deterministic function of the exact value.
    agg = (
        bars.where(F.col(atr).isNotNull())
        .groupBy(F.col(key).alias("key"), period)
        .agg(
            F.avg(F.col(atr).cast("decimal(28,10)")).cast("double").alias("avg_atr"),
            F.sum("tick_count").alias("tick_count"),
            F.count(F.lit(1)).alias("bar_count"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
        )
    )
    wk = Window.partitionBy("key")
    global_avg = F.avg(F.col("avg_atr").cast("decimal(28,10)")).over(wk).cast("double")
    ratio = F.when(global_avg != 0, F.col("avg_atr") / global_avg)
    # rank() - 1 == count of strictly smaller values, ties included correctly
    pct = (
        (F.rank().over(Window.partitionBy("key").orderBy("avg_atr")) - 1)
        * 100.0
        / F.count(F.lit(1)).over(wk)
    )
    return agg.select(
        "key",
        "period_start",
        "avg_atr",
        ratio.alias("atr_ratio"),
        classify_regime(ratio, thresholds).alias("regime"),
        pct.alias("atr_percentile"),
        "tick_count",
        "bar_count",
        "high",
        "low",
        (F.col("high") - F.col("low")).alias("price_range"),
    )


def profile_summary(periods: DataFrame, *, key: str = "key") -> DataFrame:
    """Per-symbol min/max/avg/std ATR and regime distribution
    (volatility_profile_analyzer.py:194-257)."""
    return periods.groupBy(key).agg(
        F.min("avg_atr").alias("min_atr"),
        F.max("avg_atr").alias("max_atr"),
        F.avg("avg_atr").alias("mean_atr"),
        F.stddev_pop("avg_atr").alias("std_atr"),
        F.sum("tick_count").alias("total_ticks"),
        F.count(F.lit(1)).alias("periods"),
        *[
            F.sum(F.when(F.col("regime") == r, 1).otherwise(0)).alias(f"n_{r.lower()}")
            for r in REGIMES
        ],
    )
