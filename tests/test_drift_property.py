"""Hypothesis property tests for the drift/state-diff classifiers
(round-10 item 8): `drift_events`' zero-broker/zero-local edge lattice and
`state_diff`'s ghost/orphan/stale/missing_field classification are column
expressions with hand-reasoned edge cases — fuzz them against a plain
pandas mirror the same way the reconciliation fold is swept.

One Spark pass evaluates a whole generated batch (Hypothesis drives the
DATA, not per-example Spark jobs — a per-example SparkSession round trip
would be minutes per test)."""

from __future__ import annotations

import math

import pytest

# randomized pandas-mirror sweeps (same class as test_property_oracles) — slow tier
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from finiextestingide_spark.operators.drift import drift_events, state_diff

# value grid deliberately includes the edge lattice: zeros on either side,
# tiny magnitudes (denominator guard), sign flips, and exact threshold
# neighborhoods
_VALS = st.sampled_from(
    [0.0, 1e-13, -1e-13, 0.5, -0.5, 1.0, 1.005, 1.01, 100.0, -100.0, 1e9]
)
_OPT_VALS = st.one_of(st.none(), _VALS)


def _mirror_drift(local_rows, broker_rows, thr):
    """Reference semantics in plain python (drift_audit_types.py:38-43):
    delta = local - broker; rel = 100*|delta|/|broker|; broker==0 with
    local!=0 -> undefined rel, ALWAYS exceeded; broker==0 with local==0 ->
    0%% drift. Inner pairing only."""
    broker = dict(broker_rows)
    out = {}
    for k, lv in local_rows:
        if k not in broker:
            continue
        bv = broker[k]
        delta = lv - bv
        if bv != 0.0:
            rel = 100.0 * abs(delta) / abs(bv)
            exceeded = rel > thr
        elif lv == 0.0:
            rel, exceeded = 0.0, False
        else:
            rel, exceeded = None, True
        out[k] = (lv, bv, delta, rel, exceeded)
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    local=st.lists(
        st.tuples(st.integers(0, 12), _VALS), min_size=0, max_size=16,
        unique_by=lambda t: t[0],
    ),
    broker=st.lists(
        st.tuples(st.integers(0, 12), _VALS), min_size=0, max_size=16,
        unique_by=lambda t: t[0],
    ),
    thr=st.sampled_from([0.0, 0.1, 1.0, 50.0]),
)
def test_drift_events_matches_pandas_mirror(spark, local, broker, thr):
    mirror = _mirror_drift(local, broker, thr)
    rows = drift_events(
        spark.createDataFrame(local + [(-1, 0.0)], "k long, v double"),
        spark.createDataFrame(broker + [(-2, 0.0)], "k long, v double"),
        keys=["k"],
        metrics=[("m", "v", "v", thr)],
        emit_all=True,
    ).collect()
    got = {
        r["k"]: (
            r["local_value"], r["broker_value"], r["delta"],
            r["relative_delta_pct"], r["threshold_exceeded"],
        )
        for r in rows
        if r["k"] >= 0
    }
    assert set(got) == set(mirror)
    for k, (lv, bv, delta, rel, exceeded) in mirror.items():
        glv, gbv, gdelta, grel, gexc = got[k]
        assert glv == lv and gbv == bv
        assert gdelta == pytest.approx(delta, rel=1e-12, abs=1e-300)
        if rel is None:
            assert grel is None
        else:
            assert grel == pytest.approx(rel, rel=1e-12, abs=0.0)
        assert gexc == exceeded, (k, lv, bv, rel, thr)


def _mirror_state_diff(local_rows, broker_rows, tol):
    """reconciler.py #151 semantics in plain python: ghost (broker-only),
    orphan (local-only), stale (rel > tol with broker denominator floored
    at 1e-12), missing_field (field NULL on exactly one side); both-NULL
    agrees; matched-and-in-tolerance emits nothing."""
    lk, bk = dict(local_rows), dict(broker_rows)
    out = []
    for k in sorted(set(lk) | set(bk)):
        if k not in lk:
            out.append((k, "ghost", None))
            continue
        if k not in bk:
            out.append((k, "orphan", None))
            continue
        lv, bv = lk[k], bk[k]
        if (lv is None) != (bv is None):
            out.append((k, "missing_field", "f"))
        elif lv is None and bv is None:
            pass
        else:
            rel = 100.0 * abs(lv - bv) / max(abs(bv), 1e-12)
            if rel > tol:
                out.append((k, "stale", "f"))
    return sorted(out)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    local=st.lists(
        st.tuples(st.integers(0, 12), _OPT_VALS), min_size=0, max_size=16,
        unique_by=lambda t: t[0],
    ),
    broker=st.lists(
        st.tuples(st.integers(0, 12), _OPT_VALS), min_size=0, max_size=16,
        unique_by=lambda t: t[0],
    ),
    tol=st.sampled_from([0.0, 0.1, 5.0]),
)
def test_state_diff_matches_pandas_mirror(spark, local, broker, tol):
    mirror = _mirror_state_diff(local, broker, tol)
    rows = state_diff(
        spark.createDataFrame(local + [(-1, 0.0)], "k long, f double"),
        spark.createDataFrame(broker + [(-1, 0.0)], "k long, f double"),
        key="k",
        fields=[("f", "f", "f")],
        stale_tolerance_pct=tol,
    ).collect()
    got = sorted(
        (r["k"], r["divergence"], r["field"]) for r in rows if r["k"] >= 0
    )
    assert got == mirror
    # value/rel payload spot-check on stale rows
    by_key = {(r["k"], r["divergence"]): r for r in rows if r["k"] >= 0}
    lk, bk = dict(local), dict(broker)
    for k, div, _f in mirror:
        if div != "stale":
            continue
        r = by_key[(k, "stale")]
        rel = 100.0 * abs(lk[k] - bk[k]) / max(abs(bk[k]), 1e-12)
        assert r["relative_delta_pct"] == pytest.approx(rel, rel=1e-9)
        assert not math.isnan(r["local_value"]) and not math.isnan(
            r["broker_value"]
        )
