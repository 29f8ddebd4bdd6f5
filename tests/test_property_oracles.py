"""Property-based cross-checks against INDEPENDENT pandas oracles.

The gate queries already oracle against DuckDB; these tests use a third
engine (pandas resample / merge_asof / cummax) on randomized inputs, so a
shared misunderstanding encoded in both the Spark code and a hand-written
SQL oracle would still be caught. Randomness is seeded through hypothesis
for reproducible shrinking.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from finiextestingide_spark.operators.asof import asof_join
from finiextestingide_spark.operators.bars import ohlcv_bars
from finiextestingide_spark.operators.equity import with_drawdown

T0 = datetime(2026, 1, 5)

_prices = st.lists(
    st.floats(min_value=1.0, max_value=1000.0, allow_nan=False, width=32),
    min_size=1,
    max_size=80,
)
_offsets = st.lists(
    st.integers(min_value=0, max_value=3600), min_size=1, max_size=80
)


@st.composite
def tick_series(draw):
    prices = draw(_prices)
    offs = sorted(draw(st.lists(
        st.integers(min_value=0, max_value=3600),
        min_size=len(prices), max_size=len(prices), unique=True,
    )))
    return [(T0 + timedelta(seconds=o), p) for o, p in zip(offs, prices)]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(series=tick_series())
def test_ohlcv_matches_pandas_resample(spark, series):
    df = spark.createDataFrame(
        [("X", t, i, p) for i, (t, p) in enumerate(series)],
        "symbol string, ts timestamp, seq long, price double",
    )
    got = {
        r["bar_ts"]: r
        for r in ohlcv_bars(
            df, "M5", ts="ts", key="symbol", price="price", tiebreak="seq"
        ).collect()
    }

    pdf = pd.DataFrame(series, columns=["ts", "price"]).set_index("ts")
    res = pdf["price"].resample("5min").agg(["first", "max", "min", "last", "count"])
    res = res[res["count"] > 0]
    assert set(got) == set(res.index.to_pydatetime())
    for bar_ts, row in res.iterrows():
        g = got[bar_ts.to_pydatetime()]
        assert g["open"] == pytest.approx(row["first"])
        assert g["high"] == pytest.approx(row["max"])
        assert g["low"] == pytest.approx(row["min"])
        assert g["close"] == pytest.approx(row["last"])
        assert g["tick_count"] == row["count"]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_offs=st.lists(st.integers(0, 500), min_size=1, max_size=40, unique=True),
    right_offs=st.lists(st.integers(0, 500), min_size=1, max_size=20, unique=True),
)
def test_asof_join_matches_merge_asof(spark, left_offs, right_offs):
    lrows = [("X", T0 + timedelta(seconds=o)) for o in sorted(left_offs)]
    rrows = [
        ("X", T0 + timedelta(seconds=o), float(o)) for o in sorted(right_offs)
    ]
    left = spark.createDataFrame(lrows, "symbol string, ts timestamp")
    right = spark.createDataFrame(rrows, "symbol string, sig_ts timestamp, val double")

    out = asof_join(
        left, right, on=["symbol"], left_ts="ts", right_ts="sig_ts", how="left"
    ).collect()
    got = {r["ts"]: r["val"] for r in out}

    exp = pd.merge_asof(
        pd.DataFrame(lrows, columns=["symbol", "ts"]),
        pd.DataFrame(rrows, columns=["symbol", "sig_ts", "val"]),
        left_on="ts",
        right_on="sig_ts",
        by="symbol",
    )
    for _, row in exp.iterrows():
        g = got[row["ts"].to_pydatetime()]
        if pd.isna(row["val"]):
            assert g is None
        else:
            assert g == pytest.approx(row["val"])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(equities=st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=32),
    min_size=1, max_size=60,
))
def test_drawdown_matches_pandas_cummax(spark, equities):
    rows = [("X", T0 + timedelta(seconds=i), float(e)) for i, e in enumerate(equities)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, equity double")
    out = (
        with_drawdown(df, key="k", ts="ts", equity="equity")
        .orderBy("ts")
        .collect()
    )
    s = pd.Series(equities, dtype="float64")
    peak = s.cummax()
    dd = peak - s
    for i, r in enumerate(out):
        assert r["peak_equity"] == pytest.approx(peak.iloc[i])
        assert r["drawdown"] == pytest.approx(dd.iloc[i])
        assert r["max_drawdown"] == pytest.approx(dd.iloc[: i + 1].max())
