"""One pytest per named Phase-0 validator class + the PostRunValidator
analogue (reference scenario_validator.py / batch_orchestrator.py:345-383,
576-623): failing configs must be rejected before any scan, advisories
must land on the validation channel without failing the batch."""

from __future__ import annotations

import pytest

from finiextestingide_spark.operators.preflight import (
    detect_base_currency,
    detect_quote_currency,
    post_run_validate,
    preflight_validate,
)

SCEN_DDL = (
    "scenario_id int, name string, symbol string, max_ticks int, "
    "end_ts timestamp, parameters map<string,string>"
)


def scen_df(spark, rows):
    return spark.createDataFrame(rows, SCEN_DDL)


def base(sid, name, symbol="EURUSD", max_ticks=100, params=None):
    from datetime import datetime

    return (sid, name, symbol, max_ticks, datetime(2026, 1, 2), params or {})


SPECS = {
    "EURUSD": {"swap_mode": "points", "digits": 5},
    "BTCUSD": {"swap_mode": "none", "digits": 2},
    "USDJPY": {"swap_mode": "percent", "digits": 3},  # unmodeled mode
}


def checks(result, check):
    return [i for i in result.errors if i.check == check]


def test_validate_scenario_names(spark):
    df = scen_df(
        spark,
        [base(1, "a"), base(2, "a"), base(3, ""), base(4, "b")],
    )
    valid, result = preflight_validate(df, SPECS)
    msgs = checks(result, "names")
    assert any("duplicate" in i.message for i in msgs)
    assert any("no name" in i.message for i in msgs)
    # both 'a' duplicates and the unnamed scenario are excluded; 'b' survives
    assert [r["name"] for r in valid.collect()] == ["b"]


def test_validate_scenario_boundaries(spark):
    df = scen_df(
        spark,
        [
            (1, "no_bounds", "EURUSD", None, None, {}),
            (2, "ticks_only", "EURUSD", 10, None, {}),
            (3, "end_only", "EURUSD", None, __import__("datetime").datetime(2026, 1, 2), {}),
            (4, "zero_ticks", "EURUSD", 0, None, {}),
        ],
    )
    valid, result = preflight_validate(df, SPECS)
    bad = {i.scenario_name for i in checks(result, "boundaries")}
    assert bad == {"no_bounds", "zero_ticks"}
    assert {r["name"] for r in valid.collect()} == {"ticks_only", "end_only"}


def test_validate_scenario_symbols(spark):
    df = scen_df(spark, [base(1, "ok"), base(2, "missing", symbol="GBPNZD")])
    valid, result = preflight_validate(df, SPECS)
    assert [i.scenario_name for i in checks(result, "symbols")] == ["missing"]
    assert [r["name"] for r in valid.collect()] == ["ok"]
    # no broker config -> registration check skipped (reference posture)
    _, result2 = preflight_validate(df, None)
    assert checks(result2, "symbols") == []


def test_validate_swap_modes(spark):
    df = scen_df(spark, [base(1, "ok"), base(2, "unmodeled", symbol="USDJPY")])
    valid, result = preflight_validate(df, SPECS)
    msgs = checks(result, "swap_modes")
    assert [i.scenario_name for i in msgs] == ["unmodeled"]
    assert "percent" in msgs[0].message
    assert [r["name"] for r in valid.collect()] == ["ok"]


def test_validate_account_currencies(spark):
    assert detect_quote_currency("DASHUSD") == "USD"
    assert detect_base_currency("DASHUSD") == "DASH"
    assert detect_quote_currency("USDJPY") == "JPY"
    df = scen_df(
        spark,
        [
            base(1, "ok", params={"account_currency": "USD"}),
            base(2, "cross", params={"account_currency": "CHF"}),
            base(3, "bal_ok", params={"balances": '{"USD": 10000}'}),
            base(4, "bal_mismatch", params={"balances": '{"JPY": 5}'}),
            base(5, "bal_empty", params={"balances": "{}"}),
            base(6, "bal_junk", params={"balances": "not json"}),
        ],
    )
    valid, result = preflight_validate(df, SPECS)
    bad = {i.scenario_name for i in checks(result, "account_currencies")}
    assert bad == {"cross", "bal_mismatch", "bal_empty", "bal_junk"}
    assert {r["name"] for r in valid.collect()} == {"ok", "bal_ok"}


def test_validate_scenario_parameters(spark):
    df = scen_df(
        spark,
        [
            base(1, "ok", params={"strategy": "buy_hold", "lots": "1.5"}),
            base(2, "typo_strategy", params={"strategy": "by_hold"}),
            base(3, "bad_number", params={"lots": "one"}),
            base(4, "bad_spot", params={"spot_mode": "yes"}),
        ],
    )
    valid, result = preflight_validate(df, SPECS)
    bad = {i.scenario_name for i in checks(result, "parameters")}
    assert bad == {"typo_strategy", "bad_number", "bad_spot"}
    assert [r["name"] for r in valid.collect()] == ["ok"]


def test_strict_mode_raises_before_any_scan(spark):
    df = scen_df(spark, [base(1, "a"), base(2, "a")])
    with pytest.raises(ValueError, match="pre-flight validation failed"):
        preflight_validate(df, SPECS, strict=True)


def test_preflight_feeds_replay_only_valid_scenarios(spark):
    """End-to-end: the filtered DataFrame drives run_backtest — the invalid
    scenario never reaches the range join (Phase-0 fail-fast before data)."""
    from datetime import datetime

    from finiextestingide_spark.operators.replay import run_backtest

    ticks = spark.createDataFrame(
        [
            ("W", datetime(2026, 1, 1, 0, 0, i), 1_767_225_600_000 + i * 1000,
             1_767_225_600_000 + i * 1000, 99.99, 100.01)
            for i in range(8)
        ],
        "symbol string, timestamp timestamp, time_msc long, collected_msc long, "
        "bid double, ask double",
    )
    scen = spark.createDataFrame(
        [
            (1, "good", "W", 8, None, 1, 0, 0, {"strategy": "buy_hold", "bar_ms": "1000"}),
            (2, "bad", "W", 8, None, 1, 0, 0, {"strategy": "nope"}),
        ],
        "scenario_id int, name string, symbol string, max_ticks int, "
        "tick_processing_budget_ms double, latency_seed int, latency_min_ms int, "
        "latency_max_ms int, parameters map<string,string>",
    )
    valid, result = preflight_validate(scen, None)
    assert {i.scenario_name for i in result.errors} == {"bad"}
    out = run_backtest(ticks, valid).collect()
    assert [r["scenario_id"] for r in out] == [1]


def test_post_run_validator_advisories(spark):
    from datetime import datetime

    scen = scen_df(
        spark,
        [
            base(1, "stressed", params={"reject_probability": "0.5", "reject_seed": "7"}),
            base(2, "clipped", params={}),
            base(3, "quiet", params={}),
        ],
    )
    results = spark.createDataFrame(
        [
            (1, 100, 0, 5, 3, 1, 4, 0),
            (2, 80, 20, 5, 2, 0, 2, 0),  # 20/100 clipped -> budget advisory
            (3, 100, 0, 5, 0, 0, 0, 0),  # zero trades
        ],
        "scenario_id int, ticks_processed long, ticks_clipped long, bars_closed long, "
        "trades_count int, orders_rejected int, orders_filled int, orders_cancelled int",
    )
    warns = post_run_validate(results, scen)
    by_check = {}
    for w in warns:
        assert not w.is_error  # advisories never invalidate the batch
        by_check.setdefault(w.check, []).append(w.scenario_name)
    assert by_check["stress_test"] == ["stressed"]
    assert by_check["budget"] == ["clipped"]
    assert by_check["zero_trades"] == ["quiet"]
    # params drift vs first scenario -> constancy advisory (#367)
    assert by_check["parameter_constancy"] == ["<batch>"]
    _ = datetime  # noqa


def test_post_run_constant_params_no_drift_warning(spark):
    scen = scen_df(
        spark,
        [base(1, "w1", params={"lots": "1"}), base(2, "w2", params={"lots": "1"})],
    )
    results = spark.createDataFrame(
        [(1, 10, 0, 1, 1, 0, 1, 0), (2, 10, 0, 1, 1, 0, 1, 0)],
        "scenario_id int, ticks_processed long, ticks_clipped long, bars_closed long, "
        "trades_count int, orders_rejected int, orders_filled int, orders_cancelled int",
    )
    warns = post_run_validate(results, scen)
    assert all(w.check != "parameter_constancy" for w in warns)


def test_plugin_load_error_not_sticky(spark, monkeypatch):
    """Regression (round-8 advice): a failed plugin entry-point load must be
    reported ONCE (on the row that triggered the attempt) — later rows with
    plain strategy-name typos keep the unknown-strategy message listing the
    built-ins instead of inheriting the stale plugin load error."""
    import finiextestingide_spark.operators.replay as replay_mod
    from finiextestingide_spark.operators.preflight import (
        validate_scenario_parameters,
    )

    def boom():
        raise ValueError("entry-point 'bad_plugin' failed to import: boom")

    monkeypatch.setattr(replay_mod, "load_strategy_plugins", boom)
    rows = [
        {"scenario_id": 1, "name": "first_typo",
         "parameters": {"strategy": "no_such_a"}},
        {"scenario_id": 2, "name": "second_typo",
         "parameters": {"strategy": "no_such_b"}},
    ]
    issues = validate_scenario_parameters(rows)
    plugin_issues = [i for i in issues if "failed to import" in i.message]
    unknown = {i.scenario_name: i.message for i in issues
               if "unknown strategy" in i.message}
    assert len(plugin_issues) == 1 and plugin_issues[0].scenario_name == "first_typo"
    assert set(unknown) == {"first_typo", "second_typo"}
    assert "built-ins" in unknown["second_typo"]


# --- trading-day-aware snapshot staleness (round-9 item 6) ------------------


def test_trading_days_between_weekend_aware():
    """algo_state_store.py:234-250 semantics: Mon-Fri dates inclusive minus
    one — a Friday-night snapshot restored Monday is 1 trading day old, not
    3 calendar days; 24/7 markets count calendar days."""
    from datetime import datetime

    from finiextestingide_spark.operators.gaps import trading_days_between

    fri = datetime(2026, 8, 14, 22, 0)   # Friday night
    mon = datetime(2026, 8, 17, 8, 0)    # Monday morning
    assert trading_days_between(fri, mon) == 1
    assert trading_days_between(fri, mon, weekend_aware=False) == 3
    assert trading_days_between(fri, fri) == 0                      # same instant
    sat = datetime(2026, 8, 15, 12, 0)
    sun = datetime(2026, 8, 16, 12, 0)
    assert trading_days_between(sat, sun) == 0                      # all-weekend
    tue, friday = datetime(2026, 8, 11, 9, 0), datetime(2026, 8, 14, 9, 0)
    assert trading_days_between(tue, friday) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        trading_days_between(mon, fri)


def test_snapshot_staleness_advisory():
    """Friday-night snapshot restored Monday with max_age=1 trading day is
    NOT stale; a Tuesday snapshot restored Friday IS — the advisory (never
    an error: the restore channel owns the policy) names ages and policy."""
    from datetime import datetime

    from finiextestingide_spark.operators.preflight import (
        validate_snapshot_staleness,
    )

    fri = datetime(2026, 8, 14, 22, 0)
    mon = datetime(2026, 8, 17, 8, 0)
    assert (
        validate_snapshot_staleness(fri, mon, max_age_trading_days=1) is None
    )
    # the same span on a 24/7 market IS stale (3 calendar days)
    issue = validate_snapshot_staleness(
        fri, mon, max_age_trading_days=1, weekend_aware=False
    )
    assert issue is not None and not issue.is_error
    assert "3 trading day(s)" in issue.message

    tue = datetime(2026, 8, 11, 9, 0)
    friday = datetime(2026, 8, 14, 9, 0)
    issue = validate_snapshot_staleness(
        tue, friday, max_age_trading_days=1, name="sess"
    )
    assert issue is not None
    assert issue.check == "stale_snapshot" and issue.scenario_name == "sess"
    # policy-off value disables the check entirely
    assert (
        validate_snapshot_staleness(tue, friday, max_age_trading_days=0) is None
    )
