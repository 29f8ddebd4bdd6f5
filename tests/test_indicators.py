"""Golden-value indicator tests — the reference's formula flavors, verified
against independent hand computations (model: the reference's
tests/framework/worker_tests/worker_computation_tests/, e.g.
test_rsi_computation.py which pins SMA-flavor RSI, not Wilder)."""

from __future__ import annotations

import math

import pandas as pd
from datetime import datetime, timedelta
import pytest

from finiextestingide_spark.operators.indicators import (
    with_atr_ewm,
    with_atr_sma,
    with_bollinger,
    with_ema,
    with_macd,
    with_obv,
    with_rsi,
)

CLOSES = [44.0, 44.5, 44.2, 44.9, 45.3, 45.0, 45.6, 46.1, 45.8, 46.4, 46.2, 46.9]


@pytest.fixture(scope="module")
def bars(spark):
    rows = [
        ("X", datetime(2026, 1, 1) + timedelta(minutes=i), c, c + 0.5, c - 0.5, 100.0 + i)
        for i, c in enumerate(CLOSES)
    ]
    return spark.createDataFrame(
        rows, "symbol string, bar_ts timestamp, close double, high double, low double, volume double"
    )


def _col(df, name):
    return [r[name] for r in df.orderBy("bar_ts").collect()]


def test_rsi_sma_flavor(spark, bars):
    period = 5
    got = _col(with_rsi(bars, period), "rsi")
    # independent: mean of gains/losses over last `period` deltas, zeros incl.
    deltas = [CLOSES[i] - CLOSES[i - 1] for i in range(1, len(CLOSES))]
    for i, v in enumerate(got):
        if i < period:  # warmup: needs `period` deltas
            assert v is None
            continue
        window = deltas[i - period : i]
        g = sum(max(d, 0.0) for d in window) / period
        l = sum(max(-d, 0.0) for d in window) / period
        want = 100.0 if l == 0 else 100.0 - 100.0 / (1.0 + g / l)
        assert v == pytest.approx(want, abs=1e-9), f"row {i}"


def test_rsi_all_gains_is_100(spark):
    df = spark.createDataFrame(
        [("X", datetime(2026, 1, 1) + timedelta(minutes=i), float(i)) for i in range(8)],
        "symbol string, bar_ts timestamp, close double",
    )
    got = _col(with_rsi(df, 5), "rsi")
    assert got[-1] == pytest.approx(100.0)


def test_bollinger_population_std(spark, bars):
    period, dev = 5, 2.0
    rows = with_bollinger(bars, period, dev).orderBy("bar_ts").collect()
    for i, r in enumerate(rows):
        if i < period - 1:
            assert r["bb_middle"] is None
            continue
        window = CLOSES[i - period + 1 : i + 1]
        mid = sum(window) / period
        var = sum((x - mid) ** 2 for x in window) / period  # population
        std = math.sqrt(var)
        assert r["bb_middle"] == pytest.approx(mid, abs=1e-9)
        assert r["bb_upper"] == pytest.approx(mid + dev * std, abs=1e-9)
        assert r["bb_lower"] == pytest.approx(mid - dev * std, abs=1e-9)
        lo, hi = mid - dev * std, mid + dev * std
        pos = 0.5 if hi == lo else min(1.0, max(0.0, (CLOSES[i] - lo) / (hi - lo)))
        assert r["bb_position"] == pytest.approx(pos, abs=1e-9)


def test_obv_cumulative_signed_volume(spark, bars):
    got = _col(with_obv(bars), "obv")
    obv, want = 0.0, []
    for i, c in enumerate(CLOSES):
        if i > 0:
            vol = 100.0 + i
            if c > CLOSES[i - 1]:
                obv += vol
            elif c < CLOSES[i - 1]:
                obv -= vol
        want.append(obv)
    assert got == pytest.approx(want)


def test_atr_sma(spark, bars):
    period = 5
    got = _col(with_atr_sma(bars, period), "atr")
    trs = []
    for i, c in enumerate(CLOSES):
        h, lo = c + 0.5, c - 0.5
        if i == 0:
            trs.append(h - lo)
        else:
            pc = CLOSES[i - 1]
            trs.append(max(h - lo, abs(h - pc), abs(lo - pc)))
    for i, v in enumerate(got):
        if i < period - 1:
            assert v is None
        else:
            assert v == pytest.approx(sum(trs[i - period + 1 : i + 1]) / period, abs=1e-9)


def test_atr_ewm_matches_pandas(spark, bars):
    period = 5
    got = _col(with_atr_ewm(bars, period), "atr")
    pdf = pd.DataFrame({"close": CLOSES})
    pdf["high"], pdf["low"] = pdf["close"] + 0.5, pdf["close"] - 0.5
    pc = pdf["close"].shift(1)
    tr = pd.concat(
        [pdf["high"] - pdf["low"], (pdf["high"] - pc).abs(), (pdf["low"] - pc).abs()], axis=1
    ).max(axis=1)
    want = tr.ewm(span=period, adjust=False).mean().tolist()
    assert got == pytest.approx(want, abs=1e-9)


def test_ema_seeded_first_flavor(spark, bars):
    """reference moving_average.py:4-22 — alpha=2/(N+1), seed = first value."""
    period = 5
    got = _col(with_ema(bars, period, out="ema"), "ema")
    alpha = 2.0 / (period + 1)
    ema, want = CLOSES[0], [CLOSES[0]]
    for c in CLOSES[1:]:
        ema = alpha * c + (1 - alpha) * ema
        want.append(ema)
    assert got == pytest.approx(want, abs=1e-9)


def test_macd_sma_seeded(spark, bars):
    """reference macd_worker.py:262-284 — EMAs seeded with SMA of first p."""
    fast, slow, signal = 3, 6, 3
    rows = with_macd(bars, fast, slow, signal).orderBy("bar_ts").collect()

    def ema_sma_seeded(vals, p):
        out = [float("nan")] * len(vals)
        if len(vals) < p:
            return out
        alpha = 2.0 / (p + 1)
        e = sum(vals[:p]) / p
        out[p - 1] = e
        for i in range(p, len(vals)):
            e = alpha * vals[i] + (1 - alpha) * e
            out[i] = e
        return out

    f, s = ema_sma_seeded(CLOSES, fast), ema_sma_seeded(CLOSES, slow)
    macd = [a - b if not (math.isnan(a) or math.isnan(b)) else float("nan") for a, b in zip(f, s)]
    macd_clean = [m for m in macd if not math.isnan(m)]
    sig_clean = ema_sma_seeded(macd_clean, signal)
    sig = [float("nan")] * len(macd)
    j = 0
    for i, m in enumerate(macd):
        if not math.isnan(m):
            sig[i] = sig_clean[j]
            j += 1
    for i, r in enumerate(rows):
        if math.isnan(macd[i]):
            assert r["macd"] is None or math.isnan(r["macd"])
        else:
            assert r["macd"] == pytest.approx(macd[i], abs=1e-9)
        if not math.isnan(sig[i]):
            assert r["macd_signal"] == pytest.approx(sig[i], abs=1e-9)
            assert r["macd_histogram"] == pytest.approx(macd[i] - sig[i], abs=1e-9)
