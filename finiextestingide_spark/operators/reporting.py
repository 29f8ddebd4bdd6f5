"""Reporting aggregations over replay output (SURVEY.md §2.4 A5-A9, A12-A13).

The reference aggregates per-scenario results driver-side in report builders
(reference: python/framework/reporting/builders/report_aggregators.py). Here
every aggregate is a ``groupBy().agg()`` — distributed, partial-aggregated,
and ratio columns are recomputed from sums AFTER aggregation (the same rule
the reference states at report_aggregators.py:107-247: never average
ratios)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def per_group_trade_analytics(trades: DataFrame, group: str = "symbol") -> DataFrame:
    """A5 — expectancy + win/loss breakdown per group (reference
    report_aggregators.py:25-60; grouped by currency there, by any column
    here)."""
    win = F.col("net_pnl") > 0
    loss = F.col("net_pnl") < 0
    return trades.groupBy(group).agg(
        F.count(F.lit(1)).alias("trades"),
        F.sum(win.cast("int")).alias("wins"),
        F.sum(loss.cast("int")).alias("losses"),
        F.avg("net_pnl").alias("expectancy"),
        F.avg(F.when(win, F.col("net_pnl"))).alias("avg_win"),
        F.avg(F.when(loss, F.col("net_pnl"))).alias("avg_loss"),
        F.avg(F.when(win, F.col("mae_pnl"))).alias("winner_avg_mae"),
        F.avg(F.when(win, F.col("mfe_pnl"))).alias("winner_avg_mfe"),
        F.avg(F.when(loss, F.col("mae_pnl"))).alias("loser_avg_mae"),
        F.avg(F.when(loss, F.col("mfe_pnl"))).alias("loser_avg_mfe"),
        F.sum("gross_pnl").alias("gross_pnl"),
        F.sum("fees").alias("fees"),
        F.sum("net_pnl").alias("net_pnl"),
    )


def portfolio_rollup(results: DataFrame, group: str | None = None) -> DataFrame:
    """A6 — roll scenario results up; ratios recomputed from sums
    (report_aggregators.py:107-247), worst-magnitude drawdown, recovery
    factor = net / max_drawdown."""
    keys = [group] if group else []
    agg = results.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("runs"),
        F.sum("trades_count").alias("trades"),
        F.sum("wins").alias("wins"),
        F.sum("losses").alias("losses"),
        F.sum("gross_profit").alias("gross_profit"),
        F.sum("gross_loss").alias("gross_loss"),
        F.sum("fees").alias("fees"),
        F.sum("net_pnl").alias("net_pnl"),
        F.max("max_drawdown").alias("worst_drawdown"),
    )
    return (
        agg.withColumn(
            "win_rate",
            F.when(F.col("trades") > 0, F.col("wins") / F.col("trades")),
        )
        .withColumn(
            "profit_factor",
            F.when(F.col("gross_loss") != 0, F.col("gross_profit") / -F.col("gross_loss")),
        )
        .withColumn(
            "recovery_factor",
            F.when(F.col("worst_drawdown") > 0, F.col("net_pnl") / F.col("worst_drawdown")),
        )
    )


def per_scenario_totals(trades: DataFrame) -> DataFrame:
    """A7 — footer totals per scenario (report_aggregators.py:65-90)."""
    return trades.groupBy("scenario_id").agg(
        F.count(F.lit(1)).alias("trades"),
        F.sum("gross_pnl").alias("gross_pnl"),
        F.sum("fees").alias("fees"),
        F.sum("net_pnl").alias("net_pnl"),
    )


def profiling_aggregate(
    timings: DataFrame,
    *,
    scenario: str = "scenario_id",
    avg_tick_us: str = "avg_tick_us",
    bottleneck: str = "bottleneck",
) -> DataFrame:
    """A8 — cross-scenario profiling: exact P95 of per-scenario avg tick time,
    suggested budget = P95 * 1.1, modal bottleneck + frequency
    (report_aggregators.py:331-423). Exact percentile (not approx) so the
    result is oracle-checkable; swap to percentile_approx at fleet scale."""
    p95 = timings.agg(
        F.percentile(avg_tick_us, F.lit(0.95)).alias("p95_avg_tick_us"),
        F.count(F.lit(1)).alias("scenarios"),
    ).withColumn("suggested_budget_us", F.col("p95_avg_tick_us") * 1.1)
    mode_row = (
        timings.groupBy(bottleneck)
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc(bottleneck))
        .limit(1)
        .select(
            F.col(bottleneck).alias("modal_bottleneck"),
            F.col("freq").alias("modal_bottleneck_freq"),
        )
    )
    return p95.crossJoin(mode_row)


def robustness_stats(results: DataFrame, *, objective: str = "net_pnl", role: str = "role") -> DataFrame:
    """A9 — across windows: mean/median/pstdev/CoV, %profitable, best/worst
    with argmax attribution (robustness_report_builder.py:109-181)."""
    return results.groupBy(role).agg(
        F.count(F.lit(1)).alias("windows"),
        F.avg(objective).alias("mean_obj"),
        F.percentile(objective, F.lit(0.5)).alias("median_obj"),
        F.stddev_pop(objective).alias("pstdev_obj"),
        F.when(F.avg(objective) != 0, F.stddev_pop(objective) / F.abs(F.avg(objective))).alias(
            "cov_obj"
        ),
        F.avg((F.col(objective) > 0).cast("double")).alias("pct_profitable"),
        F.max(objective).alias("best_obj"),
        F.min(objective).alias("worst_obj"),
        F.max_by("scenario_id", F.col(objective)).alias("best_scenario"),
        F.min_by("scenario_id", F.col(objective)).alias("worst_scenario"),
    )


def walk_forward_efficiency(results: DataFrame, *, objective: str = "net_pnl") -> DataFrame:
    """WFE = OOS mean / IS mean (robustness_report_builder.py)."""
    pivot = results.groupBy().pivot("role", ["IS", "OOS"]).agg(F.avg(objective))
    return pivot.select(
        F.col("IS").alias("is_mean"),
        F.col("OOS").alias("oos_mean"),
        F.when(F.col("IS") != 0, F.col("OOS") / F.col("IS")).alias("wfe"),
    )


def worker_timing_totals(timings: DataFrame, *, worker: str = "worker") -> DataFrame:
    """A12 — per-worker timing totals, avg recomputed from sums
    (report_aggregators.py:293-326)."""
    return (
        timings.groupBy(worker)
        .agg(
            F.sum("calls").alias("calls"),
            F.sum("total_us").alias("total_us"),
            F.min("min_us").alias("min_us"),
            F.max("max_us").alias("max_us"),
        )
        .withColumn("avg_us", F.when(F.col("calls") > 0, F.col("total_us") / F.col("calls")))
    )


def write_report(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "csv",
    single_file: bool = True,
) -> None:
    """S14 report sink: render a (small, aggregated) report table to CSV or
    JSON lines (reference: python/framework/reporting/ builders +
    event_stream_csv_writer.py render the unified result model to
    console/file/CSV). Reports are end-of-pipeline aggregates — thousands of
    rows, not the fact table — so ``single_file`` coalesces to one part for
    human/downstream consumption; leave it False for large exports."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported report format: {fmt}")


def read_report(spark, path: str, *, fmt: str = "csv") -> DataFrame:
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    raise ValueError(f"unsupported report format: {fmt}")
