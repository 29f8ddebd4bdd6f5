"""Loaders for the driver's synthetic star-schema tables (TESTDATA.md).

PUBLIC-API NOTE — session-wide side effect: ``load_table`` (and therefore
``register_views``) pins ``spark.sql.session.timeZone`` to UTC on the session
it is given. This is deliberate: the harness may hand us a vanilla session,
and every oracle comparison assumes UTC wall-clock bucketing (DuckDB reads
these files as naive timestamps). Callers sharing a session with other
workloads should be aware the timezone is pinned; all other reader behavior
is scoped per-read.

``events.ts`` has shipped in two physical encodings across driver testdata
generations: Parquet TIMESTAMP(NANOS) (older Spark reads it only as a
ns-epoch long via the legacy ``nanosAsLong`` conf) and TIMESTAMP(MICROS)
with isAdjustedToUTC=false (read natively as TIMESTAMP_NTZ). The loader
normalizes both to a session-TZ TimestampType column by inspecting the
dtype it actually got, so it works on any combination of Spark version and
testdata generation.
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

# Columns that may arrive as ns-epoch longs / TIMESTAMP_NTZ depending on the
# testdata generation; normalized to TimestampType (UTC session).
_TS_NORMALIZE_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's session contract ONCE, explicitly: UTC wall-clock
    (oracle comparisons assume DuckDB's naive-timestamp semantics) and the
    legacy NANOS parquet read. Library embedders sharing a session with
    other workloads should call this (or accept that load_table applies the
    same settings lazily) — it is the single place the engine mutates
    session state, and both settings are runtime-settable no-ops when
    already applied."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    set_nanos_as_long(spark)
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The harness may hand us a vanilla session (the driver does); the gate
    # contract therefore applies configure_session's settings lazily here.
    # Embedders who want explicit control call configure_session once
    # instead — the settings are identical (see module docstring).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _TS_NORMALIZE_COLS:
        set_nanos_as_long(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TS_NORMALIZE_COLS.get(name, ()):
        df = normalize_ts(df, col)
    return df


def set_nanos_as_long(spark: SparkSession) -> None:
    """Enable the legacy NANOS-as-long parquet read where the build supports
    it. Harmless no-op on Spark builds that read NANOS natively (or removed
    the conf); required on builds where NANOS is only readable as a long.
    Shared by batch loaders and the streaming gate paths."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to session-TZ TimestampType whichever
    physical encoding the reader produced (works on batch AND streaming
    DataFrames — only the schema is inspected)."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        # ns-epoch long from the legacy nanos path; data is
        # microsecond-precision so DIV 1000 is lossless.
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt and dt.startswith("timestamp_ntz"):
        # native NTZ read; with the session pinned to UTC this cast is
        # wall-clock-identity and matches DuckDB bit-for-bit.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
