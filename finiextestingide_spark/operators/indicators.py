"""Windowed indicator library (SURVEY.md §2.5 W1-W6).

The reference computes these per tick inside worker objects
(python/framework/workers/core/*.py); here each indicator is a window
expression over completed bars — one sort-free pass per symbol partition,
fully inside whole-stage codegen. The EMA family (MACD, ewm-ATR) is
recursive and not expressible as a plain SQL window; those go through a
grouped Arrow-batched ``applyInPandas`` (one group per symbol — exactly the
per-symbol parallelism the reference gets from its process pool).

Formula flavors are pinned to the reference (golden tests in
tests/test_indicators.py):
- RSI: SMA flavor, NOT Wilder — mean of gains/losses over the last `period`
  deltas, zeros included; avg_loss == 0 -> 100 (rsi_worker.py:96-139).
- Bollinger: population std (np.std), middle = SMA (bollinger_worker.py:165-235).
- EMA: alpha = 2/(period+1); plain flavor seeds with the first value
  (moving_average.py:4-22); MACD seeds with the SMA of the first `period`
  values then recurses (macd_worker.py:262-284).
- ATR: TR = max(h-l, |h-c_prev|, |l-c_prev|); ATR = ewm(span=period,
  adjust=False) mean (volatility_profile_analyzer.py:420-443).
- OBV: cumulative signed volume (obv_worker.py:131-258).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import DoubleType, StructField, StructType
from pyspark.sql.window import WindowSpec


def _schema_plus(df: DataFrame, *extra: str) -> StructType:
    """Output schema = input schema + double columns. (StructType.add would
    mutate the DataFrame's cached schema object in place — build a copy.)"""
    return StructType(list(df.schema.fields) + [StructField(c, DoubleType()) for c in extra])

from ..functions.core import clamp, rescale


def _w(key: str, ts: str) -> WindowSpec:
    return Window.partitionBy(key).orderBy(ts)


def with_rsi(
    bars: DataFrame,
    period: int = 14,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    out: str = "rsi",
) -> DataFrame:
    """SMA-flavor RSI over the last `period` close-to-close deltas.

    Null during warmup (fewer than period deltas), mirroring the reference's
    warmup gating (abstract_indicator_worker.py warmup depth contract).
    """
    w = _w(key, ts)
    frame = w.rowsBetween(-(period - 1), 0)
    df = bars.withColumn("__delta", F.col(close) - F.lag(close).over(w))
    gain = F.avg(F.greatest(F.col("__delta"), F.lit(0.0))).over(frame)
    loss = F.avg(F.greatest(-F.col("__delta"), F.lit(0.0))).over(frame)
    rn = F.row_number().over(w)
    rsi = F.when(loss == 0, F.lit(100.0)).otherwise(100.0 - 100.0 / (1.0 + gain / loss))
    return (
        df.withColumn(out, F.when(rn > period, rsi))
        .withColumn(f"{out}_avg_gain", F.when(rn > period, gain))
        .withColumn(f"{out}_avg_loss", F.when(rn > period, loss))
        .drop("__delta")
    )


def with_bollinger(
    bars: DataFrame,
    period: int = 20,
    dev: float = 2.0,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    prefix: str = "bb",
) -> DataFrame:
    """Bollinger bands: SMA middle, population std, rescaled+clamped position
    (reference: bollinger_worker.py:165-235)."""
    w = _w(key, ts)
    frame = w.rowsBetween(-(period - 1), 0)
    rn = F.row_number().over(w)
    middle = F.avg(close).over(frame)
    std = F.stddev_pop(close).over(frame)
    upper = middle + dev * std
    lower = middle - dev * std
    ready = rn >= period
    position = clamp(rescale(F.col(close), lower, upper))
    width_pct = F.when(middle != 0, (upper - lower) / middle)
    df = (
        bars.withColumn(f"{prefix}_middle", F.when(ready, middle))
        .withColumn(f"{prefix}_upper", F.when(ready, upper))
        .withColumn(f"{prefix}_lower", F.when(ready, lower))
        .withColumn(f"{prefix}_position", F.when(ready, position))
        .withColumn(f"{prefix}_width_pct", F.when(ready, width_pct))
    )
    # Slope of the middle band normalized by band width, needs period+1 closes
    # (bollinger_worker.py slope output).
    prev_mid = F.lag(f"{prefix}_middle").over(w)
    band_w = F.col(f"{prefix}_upper") - F.col(f"{prefix}_lower")
    slope = F.when(band_w != 0, (F.col(f"{prefix}_middle") - prev_mid) / band_w)
    return df.withColumn(f"{prefix}_slope", F.when(rn > period, slope))


def with_obv(
    bars: DataFrame,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    volume: str = "volume",
    out: str = "obv",
) -> DataFrame:
    """On-balance volume: running sum of sign(close delta) * volume
    (reference: obv_worker.py:131-258)."""
    w = _w(key, ts)
    df = bars.withColumn("__delta", F.col(close) - F.lag(close).over(w))
    signed = F.signum("__delta") * F.col(volume)
    return df.withColumn(
        out, F.coalesce(F.sum(signed).over(w.rowsBetween(Window.unboundedPreceding, 0)), F.lit(0.0))
    ).drop("__delta")


def with_sma(
    bars: DataFrame,
    period: int,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    out: str | None = None,
) -> DataFrame:
    w = _w(key, ts)
    rn = F.row_number().over(w)
    ma = F.avg(close).over(w.rowsBetween(-(period - 1), 0))
    return bars.withColumn(out or f"sma_{period}", F.when(rn >= period, ma))


def with_ma_trend(
    bars: DataFrame,
    period: int = 20,
    flat_threshold: float = 0.1,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    out: str = "ma_trend",
) -> DataFrame:
    """MA slope normalized by window volatility -> direction label
    (reference: ma_trend_worker.py:145-205)."""
    w = _w(key, ts)
    df = with_sma(bars, period, key=key, ts=ts, close=close, out="__ma")
    slope = F.col("__ma") - F.lag("__ma").over(w)
    vol = F.stddev_pop(close).over(w.rowsBetween(-(period - 1), 0))
    norm = F.when(vol != 0, slope / vol).otherwise(F.lit(0.0))
    label = (
        F.when(norm > flat_threshold, F.lit("UP"))
        .when(norm < -flat_threshold, F.lit("DOWN"))
        .otherwise(F.lit("FLAT"))
    )
    rn = F.row_number().over(w)
    return (
        df.withColumn(f"{out}_slope", F.when(rn > period, norm))
        .withColumn(out, F.when(rn > period, label))
        .drop("__ma")
    )


def true_range(
    *, high: str = "high", low: str = "low", prev_close: Column
) -> Column:
    """TR = max(h-l, |h-c_prev|, |l-c_prev|) — greatest() skips the null
    prev_close on the first bar (volatility_profile_analyzer.py:420-443)."""
    return F.greatest(
        F.col(high) - F.col(low),
        F.abs(F.col(high) - prev_close),
        F.abs(F.col(low) - prev_close),
    )


def with_atr_sma(
    bars: DataFrame,
    period: int = 14,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    out: str = "atr",
) -> DataFrame:
    """SMA-flavor ATR: mean of the last `period` true ranges. Pure window
    expression — the oracle-checkable flavor; the reference's ewm flavor is
    ``with_atr_ewm`` below."""
    w = _w(key, ts)
    df = bars.withColumn("__tr", true_range(prev_close=F.lag("close").over(w)))
    rn = F.row_number().over(w)
    atr = F.avg("__tr").over(w.rowsBetween(-(period - 1), 0))
    return df.withColumn(out, F.when(rn >= period, atr)).drop("__tr")


# ---------------------------------------------------------------------------
# EMA family — recursive, hence grouped Arrow-batched pandas, one group per
# symbol. At scale: shuffle on symbol only; each group streams through pandas
# in Arrow batches. This is the deliberate slow path — everything above stays
# JVM-side.
# ---------------------------------------------------------------------------


def _ema_seeded_first(s: pd.Series, period: int) -> pd.Series:
    """alpha=2/(p+1), seeded with the first value (moving_average.py:4-22).
    Equivalent to pandas ewm(span=period, adjust=False)."""
    return s.ewm(span=period, adjust=False).mean()


def _ema_seeded_sma(s: pd.Series, period: int) -> pd.Series:
    """EMA seeded with the SMA of the first `period` values, recursive after
    (macd_worker.py:262-284). Values before the seed point are NaN."""
    n = len(s)
    out = pd.Series([float("nan")] * n, index=s.index, dtype="float64")
    if n < period:
        return out
    alpha = 2.0 / (period + 1)
    vals = s.to_numpy(dtype="float64")
    ema = vals[:period].mean()
    out.iloc[period - 1] = ema
    for i in range(period, n):
        ema = alpha * vals[i] + (1.0 - alpha) * ema
        out.iloc[i] = ema
    return out


def with_ema(
    bars: DataFrame,
    period: int,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
    out: str | None = None,
    seed: str = "first",
) -> DataFrame:
    """Recursive EMA via applyInPandas; ``seed`` is 'first' or 'sma'."""
    out = out or f"ema_{period}"
    schema = _schema_plus(bars, out)
    fn = _ema_seeded_first if seed == "first" else _ema_seeded_sma

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        pdf[out] = fn(pdf[close], period)
        return pdf

    return bars.groupBy(key).applyInPandas(compute, schema)


def with_atr_ewm(
    bars: DataFrame,
    period: int = 14,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    out: str = "atr",
) -> DataFrame:
    """Reference-flavor ATR: ewm(span=period, adjust=False) of TR
    (volatility_profile_analyzer.py:420-443, extreme_move_scanner.py:131-138)."""
    schema = _schema_plus(bars, out)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        prev_close = pdf["close"].shift(1)
        tr = pd.concat(
            [
                pdf["high"] - pdf["low"],
                (pdf["high"] - prev_close).abs(),
                (pdf["low"] - prev_close).abs(),
            ],
            axis=1,
        ).max(axis=1)
        pdf[out] = tr.ewm(span=period, adjust=False).mean()
        return pdf

    return bars.groupBy(key).applyInPandas(compute, schema)


def with_macd(
    bars: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    close: str = "close",
) -> DataFrame:
    """MACD = EMA(fast) - EMA(slow), both SMA-seeded; signal = SMA-seeded EMA
    of the MACD series; histogram = macd - signal (macd_worker.py:189-285)."""
    schema = _schema_plus(bars, "macd", "macd_signal", "macd_histogram")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        macd = _ema_seeded_sma(pdf[close], fast) - _ema_seeded_sma(pdf[close], slow)
        pdf["macd"] = macd
        pdf["macd_signal"] = _ema_seeded_sma(macd.dropna(), signal).reindex(macd.index)
        pdf["macd_histogram"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return bars.groupBy(key).applyInPandas(compute, schema)
