"""Loaders for the driver's synthetic star-schema tables (TESTDATA.md).

``events.ts`` is Parquet TIMESTAMP(NANOS); Spark's reader only accepts it
with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py), which
surfaces it as a ns-epoch long. The data is microsecond-precision, so the
``DIV 1000`` conversion below is lossless and matches DuckDB's reading of the
same file bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as Parquet TIMESTAMP(NANOS) that arrive as ns-epoch longs.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The harness may hand us a vanilla session; both configs are
    # runtime-settable. nanosAsLong is required to read events.ts (Parquet
    # TIMESTAMP(NANOS)); UTC keeps date_trunc bucketing aligned with the
    # DuckDB oracle's naive-timestamp semantics regardless of host TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
