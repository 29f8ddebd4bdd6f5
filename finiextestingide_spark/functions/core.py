"""Scalar expression library (SURVEY.md §2.7).

Every function returns a Column expression built from pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly. No Python UDFs here: these are the
hot-path scalars and must stay inside Tungsten.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def mid_price(bid: Column | str = "bid", ask: Column | str = "ask") -> Column:
    """(bid+ask)/2 — reference: market_data_types.py:29-32."""
    return (F.col(bid) if isinstance(bid, str) else bid) / 2 + (
        F.col(ask) if isinstance(ask, str) else ask
    ) / 2


def session_from_utc_hour(hour: Column) -> Column:
    """UTC hour -> trading-session label.

    Reference mapping (market_session_utils.py:17): 22-08 sydney_tokyo,
    08-16 london (incl. the 13-16 london/NY overlap), 16-21 new_york,
    21-22 transition.
    """
    return (
        F.when((hour >= 22) | (hour < 8), F.lit("sydney_tokyo"))
        .when((hour >= 8) & (hour < 16), F.lit("london"))
        .when((hour >= 16) & (hour < 21), F.lit("new_york"))
        .otherwise(F.lit("transition"))
    )


def derive_pip_size(tick_size: Column, digits: Column, pip_mode_tick: Column) -> Column:
    """Market-aware pip size — reference: trading_math/pip_math.py:12-31.

    TICK-mode markets use the raw tick size; forex uses fractional-pip
    convention (tick*10 when quoted with 3 or 5 digits).
    """
    return F.when(pip_mode_tick, tick_size).otherwise(
        F.when(digits.isin(3, 5), tick_size * 10).otherwise(tick_size)
    )


def gross_pnl_from_price_diff(
    price_diff: Column, digits: Column, tick_value: Column, lots: Column
) -> Column:
    """price_diff * 10^digits * tick_value * lots — reference: pnl_math.py:8-24."""
    return price_diff * F.pow(F.lit(10.0), digits.cast("double")) * tick_value * lots


def rescale(x: Column, lo: Column, hi: Column, neutral: float = 0.5) -> Column:
    """Min-max rescale with a neutral default on a degenerate range
    (reference: trading_math/normalizer.py)."""
    return F.when(hi == lo, F.lit(neutral)).otherwise((x - lo) / (hi - lo))


def clamp(x: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    return F.least(F.greatest(x, F.lit(lo)), F.lit(hi))


def normalize_broker_type(name: Column) -> Column:
    """lowercase + non-alnum -> underscore — reference: tick_importer.py:99-112."""
    return F.regexp_replace(F.lower(name), "[^a-z0-9_]", "_")
