"""Tick -> OHLCV bar aggregation (SURVEY.md §2.4 A1/A2).

The reference resamples ticks to 7 tumbling timeframes with pandas
(reference: vectorized_bar_renderer.py:155-212; timeframe registry
timeframe_config_utils.py:51-59). Here it is a single hash aggregation:

    groupBy(window(ts, tf), key).agg(min_by, max, min, max_by, sum, count)

Scale notes:
- One shuffle on (key, bucket); partial aggregation (map-side combine) means
  the shuffle carries one row per (key, bucket) per input partition, not one
  per tick — at 100 TB this is the difference between shuffling ~TBs and ~MBs.
- open/close use min_by/max_by over a (ts, tiebreak) struct instead of a sort:
  no per-group sort, stays in whole-stage codegen, and honors the reference's
  stable (timestamp, time_msc) total order (shared_data_preparator.py:686-692,
  bug #385: a non-stable sort scrambles sub-second order).
- Gap buckets are simply absent (hash agg only materializes observed groups),
  matching the reference's dropna() semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# M1..D1 registry — reference: timeframe_config_utils.py:51-59.
TIMEFRAMES: dict[str, str] = {
    "M1": "1 minute",
    "M5": "5 minutes",
    "M15": "15 minutes",
    "M30": "30 minutes",
    "H1": "1 hour",
    "H4": "4 hours",
    "D1": "1 day",
}


def ohlcv_bars(
    ticks: DataFrame,
    timeframe: str = "M5",
    *,
    ts: str = "timestamp",
    key: str | Sequence[str] = "symbol",
    price: str | Column = "mid",
    volume: str | Column | None = None,
    tiebreak: str | None = "time_msc",
) -> DataFrame:
    """One tumbling-window OHLCV pass.

    ``timeframe`` is an M1/M5/.../D1 code or any Spark window duration.
    ``volume=None`` counts each tick as volume 1.0.
    """
    duration = TIMEFRAMES.get(timeframe, timeframe)
    keys = [key] if isinstance(key, str) else list(key)
    p = F.col(price) if isinstance(price, str) else price
    vol = (F.col(volume) if isinstance(volume, str) else volume) if volume is not None else F.lit(1.0)
    order = F.struct(F.col(ts), *([F.col(tiebreak)] if tiebreak else []))
    return (
        ticks.groupBy(F.window(F.col(ts), duration).alias("__w"), *[F.col(k) for k in keys])
        .agg(
            F.min_by(p, order).alias("open"),
            F.max(p).alias("high"),
            F.min(p).alias("low"),
            F.max_by(p, order).alias("close"),
            F.sum(vol).alias("volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            F.col("__w.start").alias("bar_ts"),
            *keys,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "tick_count",
        )
    )


def rollup_bars(
    bars: DataFrame,
    timeframe: str,
    *,
    key: str | Sequence[str] = "symbol",
) -> DataFrame:
    """Coarser OHLCV from finer bars — the aggregates compose exactly
    (open = first sub-bar's open, high = max, low = min, close = last
    sub-bar's close, volume/tick_count = sums) whenever the coarse window
    is an aligned multiple of the fine one (true for M1 -> M5/M15/M30/H1/
    H4/D1). At scale this is how coarse frames are rendered: ticks are
    scanned ONCE (for the base frame); every further frame aggregates bars,
    an input 100-1000x smaller."""
    duration = TIMEFRAMES.get(timeframe, timeframe)
    keys = [key] if isinstance(key, str) else list(key)
    order = F.col("bar_ts")
    return (
        bars.groupBy(F.window(F.col("bar_ts"), duration).alias("__w"), *[F.col(k) for k in keys])
        .agg(
            F.min_by("open", order).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", order).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("tick_count").alias("tick_count"),
        )
        .select(
            F.col("__w.start").alias("bar_ts"),
            *keys,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "tick_count",
        )
    )


def cascade_timeframe_bars(
    ticks: DataFrame,
    timeframes: Sequence[str] = tuple(TIMEFRAMES),
    base: str = "M1",
    **kwargs,
) -> DataFrame:
    """All requested timeframes with ONE pass over the ticks: the base frame
    aggregates ticks, every coarser frame rolls up from the base bars
    (rollup_bars). The base aggregation sits behind one exchange that
    ReuseExchange shares across all rollup branches."""
    key = kwargs.get("key", "symbol")
    base_bars = ohlcv_bars(ticks, base, **kwargs)
    parts = []
    for tf in timeframes:
        if tf == base:
            parts.append(base_bars.withColumn("timeframe", F.lit(tf)))
        else:
            parts.append(rollup_bars(base_bars, tf, key=key).withColumn("timeframe", F.lit(tf)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multi_timeframe_bars(
    ticks: DataFrame,
    timeframes: Sequence[str] = tuple(TIMEFRAMES),
    **kwargs,
) -> DataFrame:
    """All requested timeframes in one plan (§2.4 A2).

    Implemented as a union of per-timeframe aggregations over one shared scan:
    Catalyst reuses the scan (ReusedExchange under AQE when cached), and each
    branch is an independent partial-agg pipeline. This beats exploding a
    timeframe list per tick (which would multiply shuffle input 7x).
    """
    parts = []
    for tf in timeframes:
        parts.append(ohlcv_bars(ticks, tf, **kwargs).withColumn("timeframe", F.lit(tf)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
