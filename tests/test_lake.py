"""Bucketed-layout tests: co-located joins must be shuffle-free."""

from __future__ import annotations

import uuid

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    from finiextestingide_spark.sources.lake import colocated_join, write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    left = spark.range(0, 10_000).selectExpr("id AS doc_id", "id % 97 AS f")
    right = spark.range(0, 10_000).selectExpr("id AS doc_id", "id % 31 AS g")
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"lake_l_{suffix}", f"lake_r_{suffix}"
    try:
        write_bucketed(left, lt, bucket_by="doc_id", n_buckets=8)
        write_bucketed(right, rt, bucket_by="doc_id", n_buckets=8)
        joined = colocated_join(spark, lt, rt, "doc_id")
        assert joined.count() == 10_000
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # the same join over plain (unbucketed) frames DOES shuffle
        plain = left.join(right, "doc_id")
        assert "Exchange" in _plan(plain)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
