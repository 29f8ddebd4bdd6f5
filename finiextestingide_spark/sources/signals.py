"""Signal JSONL archives -> as-of-joinable snapshot table (SURVEY.md S10, J2).

The reference loads one pydantic envelope per JSONL line, gates on major
schema version, trims to the scenario range but keeps exactly one snapshot
before the start (so the first tick already has a signal), and extracts the
per-symbol entry with a neutral default (reference:
python/framework/signal_data/signal_jsonl_loader.py:24-80,
signal_data_provider.py:62-79).

Spark: ``spark.read.schema(...).json`` reads JSONL natively; the
keep-last-before-start trim is a window over the pre-start rows; the
per-symbol extraction is an explode + filter."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..schemas import SIGNAL_SCHEMA


def read_signal_archive(
    spark: SparkSession, path: str, *, major_version: str = "1"
) -> DataFrame:
    """One envelope per line; drop rows whose schema major version differs
    (the reference's forward-compat gate, pydantic extra='ignore')."""
    df = spark.read.schema(SIGNAL_SCHEMA).json(path)
    return df.where(
        F.col("schema_version").isNull()
        | (F.split("schema_version", "\\.").getItem(0) == major_version)
    ).withColumn("signal_ts", F.timestamp_millis(F.col("collected_msc")))


def trim_to_range(
    snapshots: DataFrame, start: datetime, end: datetime
) -> DataFrame:
    """Keep snapshots in [start, end) PLUS the single latest snapshot before
    start (signal_jsonl_loader.py range trim): the first in-range tick must
    already see a signal."""
    pre = (
        snapshots.where(F.col("signal_ts") < F.lit(start))
        .withColumn(
            "__rn",
            F.row_number().over(Window.orderBy(F.desc("collected_msc"))),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    in_range = snapshots.where(
        (F.col("signal_ts") >= F.lit(start)) & (F.col("signal_ts") < F.lit(end))
    )
    return pre.unionByName(in_range)


def carve_stale_windows(snapshots: DataFrame, windows: DataFrame) -> DataFrame:
    """P7 — delete snapshots falling inside configured stress-test windows
    (reference: shared_data_preparator.py:343-354 + stale_data_slicer.py):
    broadcast range anti-join on [win_start, win_end). The downstream as-of
    join then serves the last pre-window snapshot with a growing staleness,
    which is exactly the stress behaviour the reference simulates."""
    w = windows.select(
        F.col("win_start").alias("__ws"), F.col("win_end").alias("__we")
    )
    cond = (F.col("signal_ts") >= F.col("__ws")) & (F.col("signal_ts") < F.col("__we"))
    return snapshots.join(F.broadcast(w), cond, "left_anti")


def per_symbol_signals(snapshots: DataFrame, symbol: str | None = None) -> DataFrame:
    """J2 — explode the multi-symbol envelope; optionally select one symbol.
    Missing symbol in an envelope => no row (the as-of join's `how='left'` +
    ``neutral_defaults`` supplies HOLD/0-confidence downstream)."""
    out = snapshots.select(
        "collected_msc",
        "signal_ts",
        F.explode("result").alias("r"),
    ).select(
        "collected_msc",
        "signal_ts",
        F.col("r.symbol").alias("symbol"),
        F.col("r.signal").alias("signal"),
        F.col("r.sentiment_score").alias("sentiment_score"),
        F.col("r.confidence").alias("confidence"),
        F.col("r.urgency").alias("urgency"),
        F.col("r.is_breaking").alias("is_breaking"),
    )
    if symbol is not None:
        out = out.where(F.col("symbol") == symbol)
    return out


def neutral_defaults(joined: DataFrame) -> DataFrame:
    """Post-as-of-join neutral fill: HOLD / 0 score / 0 confidence when no
    snapshot matched (signal_data_provider.py:62-79 neutral default)."""
    return (
        joined.withColumn("signal", F.coalesce("signal", F.lit("HOLD")))
        .withColumn("sentiment_score", F.coalesce("sentiment_score", F.lit(0.0)))
        .withColumn("confidence", F.coalesce("confidence", F.lit(0.0)))
    )
