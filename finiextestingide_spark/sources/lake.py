"""Bucketed-table layout for co-located joins (SCALE.md §1).

The dedup/similarity pipelines join repeatedly on `doc_id`; the replay
pipeline joins ticks to scenario slices on `symbol`. Writing both sides
bucketed by the join key (`bucketBy` + `sortBy`, Hive-style layout) makes
those joins shuffle-FREE: Catalyst sees compatible output partitionings and
elides both exchanges — at 100 TB that is the difference between a join
that moves nothing and one that moves the fact table.

Bucketed writes go through the session catalog (`saveAsTable` — bucket
metadata lives in the metastore, not the parquet footer), so these helpers
manage named tables, not bare paths. tests/test_lake.py asserts the
resulting join plan contains zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and per-bucket sorted) managed table."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort:
        w = w.sortBy(bucket_by)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count;
    with bucketing metadata present the plan has no shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
