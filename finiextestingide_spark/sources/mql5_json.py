"""MQL5 JSON export -> tick lake ingest (SURVEY.md §2.1 S1-S8).

The reference imports broker tick JSON per file with pandas (reference:
python/data_management/importers/tick_importer.py:114-383) — validate
mandatory fields, downcast dtypes, shift broker-local timestamps to UTC via
a per-broker offset registry, relabel sessions, flag quality issues, refuse
duplicate source files, write snappy Parquet partitioned by broker/symbol.

Spark-first: one ``spark.read.schema(...).json`` over ALL export files (the
per-file loop becomes input partitioning), explode the tick array, and every
transform below is a column expression — the whole ingest is a single
distributed job whose output is the partitioned lake. At 100 TB of raw JSON
this scans once, shuffles only for the final partitioned write, and the
mandatory-field validation is a filter that codegens into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.core import normalize_broker_type, session_from_utc_hour
from ..schemas import MQL5_EXPORT_SCHEMA

# The fixed on-disk projection (tick_importer.py:369-375).
PARQUET_COLUMNS = [
    "timestamp",
    "time_msc",
    "collected_msc",
    "bid",
    "ask",
    "last",
    "tick_volume",
    "real_volume",
    "spread_points",
    "spread_pct",
    "tick_flags",
    "session",
]

_TS_FMT = "yyyy.MM.dd HH:mm:ss"  # MQL5 export format (FIXTURES.md §2)


def read_exports(spark: SparkSession, path: str) -> DataFrame:
    """S1 — one row per export file: metadata struct + ticks array +
    provenance column (the reference stores source_file in parquet metadata
    for dedup, tick_importer.py:468-546; we keep it as a column)."""
    return (
        spark.read.schema(MQL5_EXPORT_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .withColumn("source_file", F.input_file_name())
    )


def validate_exports(exports: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S1 validation — mandatory metadata fields (symbol, start_time, one of
    broker_type|data_collector: import_schema_types.py:132-148). Returns
    (valid, rejected-with-reason)."""
    reason = (
        F.when(F.col("metadata.symbol").isNull(), "missing metadata.symbol")
        .when(F.col("metadata.start_time").isNull(), "missing metadata.start_time")
        .when(
            F.col("metadata.broker_type").isNull()
            & F.col("metadata.data_collector").isNull(),
            "missing broker_type/data_collector",
        )
        .when(F.size("ticks") == 0, "empty ticks array")
    )
    tagged = exports.withColumn("reject_reason", reason)
    return (
        tagged.where(F.col("reject_reason").isNull()).drop("reject_reason"),
        tagged.where(F.col("reject_reason").isNotNull()).select(
            "source_file", "reject_reason"
        ),
    )


def explode_ticks(exports: DataFrame) -> DataFrame:
    """Envelope -> one row per tick, metadata broadcast onto every row."""
    return exports.select(
        F.col("metadata"),
        F.col("source_file"),
        F.posexplode("ticks").alias("tick_seq", "t"),
    ).select(
        normalize_broker_type(
            F.coalesce(F.col("metadata.broker_type"), F.col("metadata.data_collector"))
        ).alias("broker_type"),
        F.col("metadata.symbol").alias("symbol"),
        F.coalesce(F.col("metadata.broker_utc_offset_hours"), F.lit(0)).alias(
            "utc_offset_hours"
        ),
        F.col("source_file"),
        F.col("tick_seq"),
        F.to_timestamp("t.timestamp", _TS_FMT).alias("timestamp"),
        F.col("t.time_msc").alias("time_msc"),
        F.col("t.collected_msc").alias("collected_msc"),
        F.col("t.bid").alias("bid"),
        F.col("t.ask").alias("ask"),
        F.col("t.last").alias("last"),
        F.col("t.tick_volume").alias("tick_volume"),
        F.col("t.real_volume").alias("real_volume"),
        F.col("t.spread_points").alias("spread_points"),
        F.col("t.spread_pct").alias("spread_pct"),
        F.col("t.tick_flags").alias("tick_flags"),
        F.col("t.session").alias("session"),
    ).where(
        # mandatory tick fields (import_schema_types.py:132-148)
        F.col("timestamp").isNotNull()
        & F.col("bid").isNotNull()
        & F.col("ask").isNotNull()
    )


def apply_utc_offset(ticks: DataFrame) -> DataFrame:
    """S3 — broker-local -> UTC: shift BOTH the timestamp and the ms-epoch
    column by the per-broker offset (tick_importer.py:413-450, epoch shift
    :439-441). The offset rides on each row (broadcast from metadata), so
    mixed-broker inputs convert in one pass."""
    off_ms = F.col("utc_offset_hours").cast("long") * 3600_000
    return ticks.withColumn(
        "timestamp",
        F.timestamp_millis(F.unix_millis("timestamp") - off_ms),  # ms precision kept
    ).withColumn("time_msc", F.col("time_msc") - off_ms)


def relabel_sessions(ticks: DataFrame) -> DataFrame:
    """S4 — UTC hour -> ASIA/EUROPE/US/TRANSITION
    (market_session_utils.py:17); recomputed after offset correction, never
    trusted from the export."""
    return ticks.withColumn("session", session_from_utc_hour(F.hour("timestamp")))


def quality_flags(
    ticks: DataFrame, *, max_spread_pct: float = 5.0, max_jump_pct: float = 10.0
) -> DataFrame:
    """S5 — flag (not drop): invalid prices, extreme spreads, price jumps
    (tick_importer.py:569-593). The jump check is a per-symbol lag window."""
    from pyspark.sql import Window

    w = Window.partitionBy("broker_type", "symbol").orderBy("time_msc")
    mid = (F.col("bid") + F.col("ask")) / 2
    prev_mid = F.lag(mid).over(w)
    # guard the division: ANSI mode (Spark 4 default) ERRORS on divide-by-
    # zero, and a zero/invalid previous quote must not crash the scan —
    # the invalid-price flag already marks that row
    jump = F.when(prev_mid > 0, F.abs(mid - prev_mid) / prev_mid * 100)
    return (
        ticks.withColumn("flag_invalid_price", (F.col("bid") <= 0) | (F.col("ask") <= 0))
        .withColumn(
            "flag_extreme_spread",
            F.coalesce(F.col("spread_pct") > max_spread_pct, F.lit(False)),
        )
        .withColumn("flag_price_jump", F.coalesce(jump > max_jump_pct, F.lit(False)))
    )


def optimize_dtypes(ticks: DataFrame) -> DataFrame:
    """S2 — the reference's dtype discipline (tick_importer.py:548-566):
    prices/volumes float32, counters int32, ms-epochs int64."""
    casts = {
        "bid": "float",
        "ask": "float",
        "last": "float",
        "real_volume": "float",
        "spread_pct": "float",
        "tick_volume": "int",
        "spread_points": "int",
        "time_msc": "long",
        "collected_msc": "long",
    }
    return ticks.select(
        *[
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in ticks.columns
        ]
    )


def detect_duplicate_imports(
    ticks: DataFrame, ingest_log: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """S6 — refuse files already ingested: anti-join against the ingest log
    (a table of source_file), replacing the reference's parquet-metadata scan
    (tick_importer.py:468-546). Returns (fresh, duplicate_sources)."""
    if ingest_log is None:
        return ticks, ticks.sparkSession.createDataFrame([], "source_file string")
    log = ingest_log.select("source_file").distinct()
    fresh = ticks.join(F.broadcast(log), "source_file", "left_anti")
    dupes = (
        ticks.select("source_file")
        .distinct()
        .join(F.broadcast(log), "source_file", "left_semi")
    )
    return fresh, dupes


def write_tick_lake(ticks: DataFrame, path: str, mode: str = "append") -> None:
    """S7 — snappy Parquet, hive layout broker_type/symbol
    (tick_importer.py:311-383). Partition columns give free pruning for the
    per-(broker,symbol) scans every downstream query does."""
    cols = ["broker_type", "symbol", *PARQUET_COLUMNS, "source_file"]
    ticks.select(*cols).write.mode(mode).partitionBy("broker_type", "symbol").parquet(path)


def read_tick_lake(spark: SparkSession, path: str) -> DataFrame:
    """S8 — normalized reader: guarantee a `volume` column
    (real_volume -> volume, default 0.0; tick_parquet_reader.py:26-50)."""
    df = spark.read.parquet(path)
    return df.withColumn(
        "volume", F.coalesce(F.col("real_volume").cast("double"), F.lit(0.0))
    )


def ingest(
    spark: SparkSession,
    export_path: str,
    lake_path: str,
    *,
    ingest_log: DataFrame | None = None,
    max_spread_pct: float = 5.0,
) -> dict[str, int]:
    """The full S1-S7 pipeline as one job. Returns counters for reporting."""
    exports = read_exports(spark, export_path)
    valid, rejected = validate_exports(exports)
    ticks = explode_ticks(valid)
    ticks, dupes = detect_duplicate_imports(ticks, ingest_log)
    ticks = optimize_dtypes(
        quality_flags(
            relabel_sessions(apply_utc_offset(ticks)), max_spread_pct=max_spread_pct
        )
    )
    n = ticks.count()
    write_tick_lake(ticks, lake_path)
    return {
        "ticks_written": n,
        "files_rejected": rejected.count(),
        "files_duplicate": dupes.count(),
    }
