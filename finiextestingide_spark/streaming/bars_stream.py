"""Live-path bar rendering as Structured Streaming (SURVEY.md §2.9, §1.4).

The reference's live pipeline consumes a WebSocket tick feed through a queue
into the same per-tick bar renderer the batch path uses (reference:
python/framework/autotrader/autotrader_tick_loop.py:1-60,
python/framework/bars/bar_renderer.py:123-214): a bar closes when the first
tick of the next bucket arrives.

Spark mapping: the batch/streaming unified DataFrame API is that shared core
for free. ``F.window(ts, tf)`` + a watermark reproduces the close-on-bucket-
change semantics: in append output mode a window's bar is emitted exactly
once, when the watermark passes the window end (= the reference's
"first tick of the next bucket closes the bar", plus bounded lateness the
reference doesn't tolerate at all — its inputs are pre-sorted,
shared_data_preparator.py:686-692, so ``delay='0 seconds'`` matches it).

State bounds: the watermark is the TTL — Spark drops window state once the
watermark passes, the reference's deque(maxlen=1000) analogue
(bar_renderer.py:55-58)."""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..operators.bars import TIMEFRAMES


def read_tick_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    base_path: str | None = None,
) -> DataFrame:
    """File-drop source — the queue analogue for tests/replay; swap for a
    socket/Kafka source in production (the transformations are identical).

    ``base_path`` must be set (to the containing directory) when ``path``
    names a single file — the file source requires a directory basePath."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.load(path)


def stream_ohlcv_bars(
    ticks: DataFrame,
    timeframe: str = "M1",
    *,
    ts: str = "timestamp",
    key: str | Sequence[str] = "symbol",
    price: str = "mid",
    volume: str | None = None,
    watermark_delay: str = "0 seconds",
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming OHLCV — same aggregate expressions as the batch
    operators.bars.ohlcv_bars, over an event-time window + watermark.

    open/close use min_by/max_by on the event timestamp: without
    ``tiebreak``, within-bucket arrival races at identical ts resolve
    arbitrarily, exactly the contract the reference documents for its live
    path (arrival order preserved at import, tick_importer.py:291-293);
    passing a unique ``tiebreak`` column makes open/close deterministic
    (the batch operator's contract)."""
    duration = TIMEFRAMES.get(timeframe, timeframe)
    keys = [key] if isinstance(key, str) else list(key)
    p = F.col(price)
    vol = F.col(volume) if volume is not None else F.lit(1.0)
    order = F.col(ts) if tiebreak is None else F.struct(F.col(ts), F.col(tiebreak))
    return (
        ticks.withWatermark(ts, watermark_delay)
        .groupBy(F.window(F.col(ts), duration).alias("__w"), *keys)
        .agg(
            F.min_by(p, order).alias("open"),
            F.max(p).alias("high"),
            F.min(p).alias("low"),
            F.max_by(p, order).alias("close"),
            F.sum(vol).alias("volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(F.col("__w.start").alias("bar_ts"), *keys, "open", "high", "low",
                "close", "volume", "tick_count")
    )


def run_to_memory(
    bars: DataFrame, query_name: str, *, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table (tests / local
    inspection). Blocks until the availableNow trigger finishes."""
    q = (
        bars.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stale_feed_flags(
    ticks: DataFrame,
    *,
    ts: str = "timestamp",
    key: str = "symbol",
    interval: str = "10 seconds",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Stale-feed detection (worker_orchestrator.py:236-247 market-data
    staleness contract): per (key, interval) bucket, the tick count — a
    downstream consumer treats an absent/empty bucket as a stale feed.
    Session-window-free encoding that stays in append mode."""
    return (
        ticks.withWatermark(ts, watermark_delay)
        .groupBy(F.window(F.col(ts), interval).alias("__w"), key)
        .agg(F.count(F.lit(1)).alias("ticks"), F.max(ts).alias("last_tick_ts"))
        .select(F.col("__w.start").alias("bucket_ts"), key, "ticks", "last_tick_ts")
    )
