"""Scenario/window generation (SURVEY.md §7 M5; reference generator_cli).

The reference's scenario generator splits a data range into backtest windows
three ways (reference: python/scenario generator splitters —
blocks_split.py:55-160, volatility_split.py:36-110,
walk_forward_split.py:22-59). Splits are planning-time: tiny outputs, but the
volatility split *reads the data* (ATR minima), so it is a DataFrame op; the
calendar splits are pure driver-side math materialized as a scenarios
DataFrame."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

_SCEN_DDL = (
    "scenario_id int, name string, symbol string, start_ts timestamp, "
    "end_ts timestamp, role string"
)


def blocks_split(
    spark: SparkSession,
    symbol: str,
    start: datetime,
    end: datetime,
    n_blocks: int,
    *,
    oos_every: int = 3,
) -> DataFrame:
    """Equal time blocks; every ``oos_every``-th block is OOS, the rest IS
    (blocks_split.py). Deterministic naming: {symbol}_block{i}."""
    total = (end - start) / n_blocks
    rows = []
    for i in range(n_blocks):
        role = "OOS" if (i + 1) % oos_every == 0 else "IS"
        rows.append(
            (i, f"{symbol}_block{i}", symbol, start + i * total, start + (i + 1) * total, role)
        )
    return spark.createDataFrame(rows, _SCEN_DDL)


def walk_forward_split(
    spark: SparkSession,
    symbol: str,
    start: datetime,
    end: datetime,
    *,
    train: timedelta,
    test: timedelta,
    step: timedelta | None = None,
    embargo: timedelta | None = None,
) -> DataFrame:
    """Rolling IS(train)+OOS(test) window pairs advancing by ``step``
    (default: test size — non-overlapping OOS; walk_forward_split.py:22-59).

    ``embargo`` inserts a purge gap between each IS end and its OOS start
    (the purged walk-forward of financial ML practice): indicators computed
    near the IS boundary leak forward through their lookback window, and the
    embargo keeps the OOS evaluation clear of that contamination. None/zero
    reproduces the reference's contiguous split."""
    step = step or test
    gap = embargo or timedelta(0)
    rows = []
    i = 0
    cur = start
    while cur + train + gap + test <= end:
        rows.append((2 * i, f"{symbol}_wf{i}_is", symbol, cur, cur + train, "IS"))
        oos_start = cur + train + gap
        rows.append(
            (2 * i + 1, f"{symbol}_wf{i}_oos", symbol, oos_start, oos_start + test, "OOS")
        )
        cur += step
        i += 1
    return spark.createDataFrame(rows, _SCEN_DDL)


def volatility_split(
    bars_with_atr: DataFrame,
    n_windows: int,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    atr: str = "atr",
    min_separation_bars: int = 10,
) -> DataFrame:
    """Window boundaries at ATR minima (volatility_split.py:36-110): cut the
    range where the market is calmest so no window starts mid-storm.

    Distributed selection: rank bars by ATR ascending per symbol, greedily
    keep the lowest-ATR bars that are >= min_separation_bars apart (done on
    the collected candidate head — candidates are ~n_windows*10 rows, the
    data reduction happened in the ranking), then build [boundary, next)
    windows."""
    w = Window.partitionBy(key).orderBy(F.asc(atr), F.asc(ts))
    seq = Window.partitionBy(key).orderBy(ts)
    ranked = (
        bars_with_atr.where(F.col(atr).isNotNull())
        .withColumn("__bar_no", F.row_number().over(seq))
        .withColumn("__atr_rank", F.row_number().over(w))
        .where(F.col("__atr_rank") <= n_windows * 10)  # candidate pool
        .select(key, ts, atr, "__bar_no")
    )
    from .replay import _bounded_collect

    pool = _bounded_collect(
        ranked.orderBy(atr, ts), 500_000, "volatility_split(candidate pool)"
    )
    by_symbol: dict[str, list] = {}
    for r in pool:
        picks = by_symbol.setdefault(r[key], [])
        if len(picks) < n_windows - 1 and all(
            abs(r["__bar_no"] - p["__bar_no"]) >= min_separation_bars for p in picks
        ):
            picks.append(r)

    spark = bars_with_atr.sparkSession
    bounds = _bounded_collect(
        bars_with_atr.groupBy(key).agg(
            F.min(ts).alias("__min_ts"), F.max(ts).alias("__max_ts")
        ),
        500_000,
        "volatility_split(symbol bounds)",
    )
    rows = []
    sid = 0
    for b in bounds:
        sym = b[key]
        cuts = sorted([p[ts] for p in by_symbol.get(sym, [])])
        edges = [b["__min_ts"], *cuts, b["__max_ts"]]
        for i in range(len(edges) - 1):
            rows.append((sid, f"{sym}_vol{i}", sym, edges[i], edges[i + 1], "IS"))
            sid += 1
    return spark.createDataFrame(rows, _SCEN_DDL)
