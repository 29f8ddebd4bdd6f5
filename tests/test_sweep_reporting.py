"""End-to-end sweep + ledger + reporting tests (SURVEY §3.3 lifecycle):
grid expansion -> one distributed replay pass -> ledger -> ranking /
sensitivity / rollups."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from finiextestingide_spark.operators.reporting import (
    per_group_trade_analytics,
    per_scenario_totals,
    portfolio_rollup,
    profiling_aggregate,
    robustness_stats,
    walk_forward_efficiency,
)
from finiextestingide_spark.operators.replay import run_backtest, trades_table
from finiextestingide_spark.operators.sweep import (
    append_ledger,
    expand_grid,
    ledger_rows,
    parameter_sensitivity,
    rank_runs,
    read_ledger,
    run_sweep,
    sweep_summary,
)
from tests.test_replay import BASE, PRICES, make_scenarios, make_ticks


def test_expand_grid_order():
    grid = {"b": ["1", "2"], "a": ["x"]}
    combos = expand_grid(grid)
    assert combos == [{"a": "x", "b": "1"}, {"a": "x", "b": "2"}]


@pytest.fixture(scope="module")
def sweep_results(spark):
    ticks = make_ticks(spark, PRICES)
    scenarios = make_scenarios(
        spark,
        [
            (1, "a", "X", None, None, 1, 0, 0, BASE),
            (2, "b", "X", None, None, 2, 0, 0, BASE),
        ],
    )
    grid = {"fast": ["2", "3"], "slow": ["4", "6"]}
    return run_sweep(spark, ticks, scenarios, grid, sweep_id="sw1").cache()


def test_sweep_runs_every_combo(spark, sweep_results):
    rows = sweep_results.collect()
    assert len(rows) == 2 * 4  # 2 scenarios x 2x2 grid
    assert len({r["run_id"] for r in rows}) == 8
    assert all(r["sweep_id"] == "sw1" for r in rows)
    # overrides applied: each combo's parameters carry its grid levels
    params = {(r["base_scenario_id"], r["combo_id"]): r["parameters"] for r in rows}
    assert params[(1, 0)]["fast"] == "2" and params[(1, 0)]["slow"] == "4"
    assert params[(1, 3)]["fast"] == "3" and params[(1, 3)]["slow"] == "6"


def test_ledger_roundtrip_and_ranking(spark, sweep_results, tmp_path):
    path = str(tmp_path / "ledger")
    append_ledger(ledger_rows(sweep_results), path)
    append_ledger(ledger_rows(sweep_results.withColumn("sweep_id", F.lit("sw2")).withColumn(
        "run_id", F.concat(F.lit("sw2-"), F.col("run_id")))), path)
    ledger = read_ledger(spark, path)
    assert ledger.count() == 16
    summary = {r["sweep_id"]: r for r in sweep_summary(ledger).collect()}
    assert summary["sw1"]["runs"] == 8 and summary["sw1"]["errors"] == 0
    ranked = rank_runs(ledger.where(F.col("sweep_id") == "sw1")).collect()
    objs = [r["objective"] for r in ranked]
    assert objs == sorted(objs, reverse=True)
    # deterministic tiebreak: equal objectives ordered by run_id asc
    for a, b in zip(ranked, ranked[1:]):
        if a["objective"] == b["objective"]:
            assert a["run_id"] < b["run_id"]


def test_parameter_sensitivity_levels(spark, sweep_results):
    sens = parameter_sensitivity(ledger_rows(sweep_results), ["fast", "slow"]).collect()
    by_param = {}
    for r in sens:
        by_param.setdefault(r["param"], []).append(r)
    assert set(by_param) == {"fast", "slow"}
    assert {r["level"] for r in by_param["fast"]} == {"2", "3"}
    for r in sens:
        assert r["runs"] == 4  # each level appears in 4 runs
        assert r["influence"] >= 0


def test_portfolio_rollup_ratios_from_sums(spark, sweep_results):
    roll = portfolio_rollup(sweep_results).collect()[0]
    assert roll["runs"] == 8
    if roll["trades"] > 0 and roll["win_rate"] is not None:
        assert roll["win_rate"] == pytest.approx(roll["wins"] / roll["trades"])
    if roll["gross_loss"] != 0:
        assert roll["profit_factor"] == pytest.approx(
            roll["gross_profit"] / -roll["gross_loss"]
        )


def test_trade_analytics_and_totals(spark):
    ticks = make_ticks(spark, PRICES)
    scenarios = make_scenarios(spark, [(1, "a", "X", None, None, 1, 0, 0, BASE)])
    trades = trades_table(run_backtest(ticks, scenarios)).cache()
    g = per_group_trade_analytics(trades, "direction").collect()
    assert {r["direction"] for r in g} <= {"LONG", "SHORT"}
    for r in g:
        assert r["trades"] == r["wins"] + r["losses"] or r["trades"] >= r["wins"] + r["losses"]
    tot = per_scenario_totals(trades).collect()[0]
    assert tot["trades"] == trades.count()


def test_robustness_and_wfe(spark):
    rows = [
        (1, "IS", 10.0), (2, "IS", 20.0), (3, "IS", 30.0),
        (4, "OOS", 5.0), (5, "OOS", 15.0),
    ]
    df = spark.createDataFrame(rows, "scenario_id int, role string, net_pnl double")
    stats = {r["role"]: r for r in robustness_stats(df).collect()}
    assert stats["IS"]["mean_obj"] == pytest.approx(20.0)
    assert stats["IS"]["median_obj"] == pytest.approx(20.0)
    assert stats["IS"]["best_scenario"] == 3 and stats["IS"]["worst_scenario"] == 1
    assert stats["OOS"]["pct_profitable"] == pytest.approx(1.0)
    wfe = walk_forward_efficiency(df).collect()[0]
    assert wfe["wfe"] == pytest.approx(10.0 / 20.0)


def test_profiling_aggregate(spark):
    rows = [(i, float(100 + i), "workerA" if i < 7 else "workerB") for i in range(10)]
    df = spark.createDataFrame(rows, "scenario_id int, avg_tick_us double, bottleneck string")
    out = profiling_aggregate(df).collect()[0]
    assert out["modal_bottleneck"] == "workerA" and out["modal_bottleneck_freq"] == 7
    assert out["suggested_budget_us"] == pytest.approx(out["p95_avg_tick_us"] * 1.1)


def test_report_sinks_roundtrip(spark, tmp_path):
    from finiextestingide_spark.operators.reporting import read_report, write_report

    df = spark.createDataFrame(
        [("EUR", 12, 345.5), ("USD", 7, -12.25)], "currency string, trades int, net double"
    )
    for fmt in ("csv", "json"):
        p = str(tmp_path / f"report_{fmt}")
        write_report(df, p, fmt=fmt)
        back = read_report(spark, p, fmt=fmt)
        got = sorted((r["currency"], int(r["trades"]), float(r["net"])) for r in back.collect())
        assert got == [("EUR", 12, 345.5), ("USD", 7, -12.25)]
