"""File-level index / coverage tables (SURVEY.md §2.1 S9, §2.1 S12 coverage).

The reference maintains hidden parquet index tables with per-file min/max
timestamps, row counts and sampled stats (reference:
python/data_management/Index/tick_index_manager.py:24-200). In Spark the
pruning half is free (parquet footer min/max + partition pruning); what
remains useful is the *coverage query* surface — "what ranges exist per
(broker,symbol)" — which we build as one aggregation over
``input_file_name()``."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def build_file_index(
    ticks: DataFrame,
    *,
    ts: str = "timestamp",
    keys: tuple[str, ...] = ("broker_type", "symbol"),
    sample_frac_over: int = 50_000,
) -> DataFrame:
    """Per-file stats: min/max ts, row count, mean spread, ticks/sec
    (tick_index_manager.py:62-200). The 10%-sample mean-spread trick the
    reference uses for big files is unnecessary here (the agg is
    distributed), kept as documentation."""
    spread = F.col("ask") - F.col("bid")
    idx = (
        ticks.withColumn("__file", F.input_file_name())
        .groupBy("__file", *[F.col(k) for k in keys])
        .agg(
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
            F.count(F.lit(1)).alias("rows"),
            F.avg(spread).alias("mean_spread"),
        )
        .withColumn(
            "ticks_per_sec",
            F.col("rows")
            / F.greatest(
                (F.unix_millis("end_ts") - F.unix_millis("start_ts")) / 1000.0, F.lit(1.0)
            ),
        )
        .withColumnRenamed("__file", "file")
    )
    return idx


def coverage(
    index: DataFrame, *, keys: tuple[str, ...] = ("broker_type", "symbol")
) -> DataFrame:
    """S12 — per-key coverage: overall range + row totals (bars_router.py
    GET /coverage)."""
    return index.groupBy(*[F.col(k) for k in keys]).agg(
        F.min("start_ts").alias("start_ts"),
        F.max("end_ts").alias("end_ts"),
        F.sum("rows").alias("rows"),
        F.count(F.lit(1)).alias("files"),
    )


def relevant_files(index: DataFrame, start, end) -> DataFrame:
    """P2/J4 — interval-overlap file pruning: files whose [start,end] range
    overlaps the requested window (shared_data_preparator.py:652-677,
    363-411). Spark prunes row-groups anyway; this powers planning UIs."""
    return index.where((F.col("start_ts") <= end) & (F.col("end_ts") >= start))


def range_query(
    ticks: DataFrame, start, end, *, ts: str = "timestamp", limit: int = 10_000
) -> DataFrame:
    """S12 — the REST bars/ticks range endpoint: BETWEEN + hard cap
    (bars_router.py:45-115, MAX_BARS=10k)."""
    return ticks.where(F.col(ts).between(start, end)).orderBy(ts).limit(limit)
