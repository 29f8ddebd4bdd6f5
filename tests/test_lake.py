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


def test_bucketed_tick_lake_backtest_single_exchange(spark, sf_dir):
    """The 100 TB replay layout (SCALE.md): ticks persisted as a bucketed
    lake table (write_bucketed on symbol) feed run_backtest with ZERO
    Exchange before the explicit per-scenario repartition — the scenario
    attach broadcasts the scenario slice onto the bucketed scan in place,
    so the ONLY shuffle in the whole pre-replay plan is the one
    deliberately placed repartition(n, __part) — the collision-free
    scenario-placement salt (round 8) — that spreads the
    Python-CPU-bound replay across cores. At 1000 executors that means the
    100 TB tick scan is never moved; only the (already-sliced) per-scenario
    rows travel once. The plan is pinned structurally: exactly one
    Exchange node, and it is the scenario repartition; the scan is the
    bucketed table."""
    import pyspark.sql.functions as F

    from finiextestingide_spark.operators.replay import run_backtest
    from finiextestingide_spark.sources.lake import write_bucketed
    from finiextestingide_spark.sources.tables import load_table

    ticks = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("symbol"),
        F.col("ts").alias("timestamp"),
        F.unix_millis("ts").alias("time_msc"),
        F.unix_millis("ts").alias("collected_msc"),
        (F.col("value") - 0.005).alias("bid"),
        (F.col("value") + 0.005).alias("ask"),
    )
    table = f"lake_ticks_{uuid.uuid4().hex[:8]}"
    try:
        write_bucketed(ticks, table, bucket_by="symbol", n_buckets=4)
        lake_ticks = spark.table(table)
        scenarios = spark.createDataFrame(
            [(i + 1, f"lake-{s}", s, None, None, i + 1, 0, 0,
              {"strategy": "buy_hold", "bar_ms": "3600000",
               "equity_sample_every": "0"})
             for i, s in enumerate(["click", "view", "purchase"])],
            "scenario_id int, name string, symbol string, max_ticks int, "
            "tick_processing_budget_ms double, latency_seed int, "
            "latency_min_ms int, latency_max_ms int, parameters map<string,string>",
        )
        res = run_backtest(lake_ticks, scenarios)
        plan = _plan(res)
        # exactly ONE shuffle Exchange in the whole plan, and it is the
        # explicit scenario repartition (hashpartitioning on __part, the
        # round-8 collision-free placement salt). A BroadcastExchange of
        # the tiny scenario slice is allowed — that IS the design (the
        # 100 TB side never moves; the config does).
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Exchange rangepartitioning" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        first_exchange_arg = plan.split("Exchange hashpartitioning(", 1)[1]
        assert first_exchange_arg.startswith("__part"), plan
        # the scan really is the bucketed lake table
        assert "Bucketed: true" in plan, plan
        # and the composition actually runs: one result row per scenario
        assert res.count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
