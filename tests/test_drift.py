"""Drift auditor (J6 economics, round-9 item 4): local vs broker-truth
fee/volume/price comparison over paired fills, thresholded relative deltas
(reference DriftAuditor #327, drift_audit_types.py DriftRecord/Summary)."""

from __future__ import annotations

import pytest

from finiextestingide_spark.operators.drift import drift_events, drift_summary

METRICS = [
    ("fee", "fee", "fee", 1.0),
    ("volume", "volume", "volume", 0.5),
    ("price", "price", "price", 0.5),
]
DDL = "fill_id long, fee double, volume double, price double"


def _events(spark, local_rows, broker_rows, **kw):
    local = spark.createDataFrame(local_rows, DDL)
    broker = spark.createDataFrame(broker_rows, DDL)
    return drift_events(
        local, broker, keys=["fill_id"], metrics=METRICS, **kw
    ).collect()


def test_each_drift_class_surfaces(spark):
    """One fill per drift class: only the drifted metric of the drifted
    fill emits, with the reference's relative-delta semantics."""
    broker = [
        (1, 2.00, 10.0, 101.0),  # fee drift: local 2.10 -> 5% > 1%
        (2, 2.00, 10.0, 101.0),  # volume drift: local 10.2 -> 2% > 0.5%
        (3, 2.00, 10.0, 101.0),  # price drift: local 102.5 -> ~1.49% > 0.5%
        (4, 2.00, 10.0, 101.0),  # clean: below every threshold
    ]
    local = [
        (1, 2.10, 10.0, 101.0),
        (2, 2.00, 10.2, 101.0),
        (3, 2.00, 10.0, 102.5),
        (4, 2.01, 10.01, 101.1),  # 0.5% / 0.1% / ~0.099%: all below
    ]
    rows = _events(spark, local, broker)
    got = {(r["fill_id"], r["drift_type"]): r for r in rows}
    assert set(got) == {(1, "fee"), (2, "volume"), (3, "price")}
    fee = got[(1, "fee")]
    assert fee["local_value"] == 2.10 and fee["broker_value"] == 2.00
    assert fee["delta"] == pytest.approx(0.10)
    assert fee["relative_delta_pct"] == pytest.approx(5.0)
    assert fee["threshold_exceeded"] is True


def test_zero_broker_value_always_surfaces(spark):
    """Broker reports zero: a nonzero local value has no defined relative
    delta (NULL) but MUST surface regardless of threshold; zero local is
    0% drift and stays silent."""
    broker = [(1, 0.0, 10.0, 101.0), (2, 0.0, 10.0, 101.0)]
    local = [(1, 0.05, 10.0, 101.0), (2, 0.0, 10.0, 101.0)]
    rows = _events(spark, local, broker)
    assert len(rows) == 1
    r = rows[0]
    assert (r["fill_id"], r["drift_type"]) == (1, "fee")
    assert r["relative_delta_pct"] is None
    assert r["threshold_exceeded"] is True


def test_unpaired_fills_are_not_drift(spark):
    """Pairing is inner: a local fill without broker truth (or vice versa)
    is the reconciliation layer's finding (#151), never a drift event."""
    broker = [(1, 2.0, 10.0, 101.0), (99, 5.0, 1.0, 50.0)]
    local = [(1, 9.9, 10.0, 101.0), (42, 5.0, 1.0, 50.0)]
    rows = _events(spark, local, broker)
    assert {r["fill_id"] for r in rows} == {1}


def test_emit_all_and_summary(spark):
    """emit_all is the audit-table form (every paired metric row);
    drift_summary reproduces DriftAuditSummary: per-type exceeded counts +
    worst relative drift over ALL audited fills."""
    broker = [(1, 2.00, 10.0, 100.0), (2, 2.00, 10.0, 100.0)]
    local = [(1, 2.50, 10.0, 100.0), (2, 2.04, 10.0, 103.0)]
    local_df = spark.createDataFrame(local, DDL)
    broker_df = spark.createDataFrame(broker, DDL)
    allrows = drift_events(
        local_df, broker_df, keys=["fill_id"], metrics=METRICS, emit_all=True
    )
    assert allrows.count() == 6  # 2 fills x 3 metrics
    summ = {r["drift_type"]: r for r in drift_summary(allrows).collect()}
    # fee: fill 1 drifts 25% (event), fill 2 drifts 2% (also > 1% threshold)
    assert summ["fee"]["n_events"] == 2
    assert summ["fee"]["max_drift_pct"] == pytest.approx(25.0)
    assert summ["fee"]["n_audited"] == 2
    assert summ["volume"]["n_events"] == 0
    assert summ["volume"]["max_drift_pct"] == pytest.approx(0.0)
    assert summ["price"]["n_events"] == 1        # 3% > 0.5% on fill 2
    assert summ["price"]["max_drift_pct"] == pytest.approx(3.0)


def test_state_diff_vocabulary(spark):
    """#151 Reconciler contract: ghost (broker-only), orphan (local-only),
    stale (matched, field beyond 0.1% relative tolerance with broker as
    denominator) — one row per diverged field; in-tolerance matches emit
    nothing."""
    from finiextestingide_spark.operators.drift import state_diff

    local = spark.createDataFrame(
        [
            (1, 100.0, 2.0),   # matched, in tolerance
            (2, 100.0, 2.0),   # stale on price (+1%)
            (3, 100.0, 2.0),   # stale on BOTH fields
            (4, 100.0, 2.0),   # orphan: broker lacks it
        ],
        "ref long, price double, lots double",
    )
    broker = spark.createDataFrame(
        [
            (1, 100.05, 2.0),  # 0.05% < 0.1%: silent
            (2, 101.0, 2.0),
            (3, 102.0, 2.5),
            (5, 50.0, 1.0),    # ghost: local lacks it
        ],
        "ref long, price double, lots double",
    )
    rows = state_diff(
        local, broker, key="ref",
        fields=[("price", "price", "price"), ("lots", "lots", "lots")],
    ).collect()
    got = {(r["ref"], r["divergence"], r["field"]) for r in rows}
    assert got == {
        (2, "stale", "price"),
        (3, "stale", "price"),
        (3, "stale", "lots"),
        (4, "orphan", None),
        (5, "ghost", None),
    }
    by = {(r["ref"], r["field"]): r for r in rows if r["divergence"] == "stale"}
    # denominators are the BROKER values (reconciler._within_tol)
    assert by[(2, "price")]["relative_delta_pct"] == pytest.approx(100 * 1.0 / 101.0)
    assert by[(3, "lots")]["relative_delta_pct"] == pytest.approx(100 * 0.5 / 2.5)


def test_flat_check_dust(spark):
    """SPOT flat-preflight: quote assets and dust-magnitude balances are
    ignored; any other balance above the dust threshold breaks flatness."""
    from finiextestingide_spark.operators.drift import flat_check

    bal = spark.createDataFrame(
        [("USDT", 1523.0), ("BTC", 5e-9), ("ETH", 0.25), ("DOGE", -2e-9)],
        "asset string, amount double",
    )
    rows = flat_check(bal, quote_assets=["USDT"]).collect()
    assert [r["asset"] for r in rows] == ["ETH"]  # the only real holding
    flat = flat_check(bal.where("asset <> 'ETH'"), quote_assets=["USDT"])
    assert flat.count() == 0  # dust-only = flat
