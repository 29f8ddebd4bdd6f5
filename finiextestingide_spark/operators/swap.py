"""Overnight swap accrual (R6).

Spark re-expression of the reference's rollover fee accrual (reference:
python/framework/trading_env/portfolio_manager.py:860-917): one signed fee
per broker rollover (midnight) crossed while a position is open, counted
triple on the broker's configured weekday; fee per rollover =
swap_rate x lots (the reference additionally scales by tick_value — fold it
into the rate).

The rollover count uses a CLOSED FORM over the date arithmetic (how many
midnights, how many of them fall on the triple weekday) — no per-day explode
and no UDF, so at 100 TB this is a pure projection over the positions table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _iso_dow(d: Column) -> Column:
    """ISO day-of-week 1=Monday .. 7=Sunday."""
    return F.weekday(d) + 1


def rollover_columns(
    open_ts: Column,
    close_ts: Column,
    *,
    triple_weekday: int = 3,
) -> tuple[Column, Column]:
    """(nights, triples): midnights crossed in (open, close], and how many of
    them fall on the ISO weekday ``triple_weekday`` (default Wednesday, the
    common broker triple-swap day).

    Closed form: the k-th crossed midnight is the start of day open+k
    (k = 1..nights); the count of those days with a given weekday is
    floor((nights - 1 - offset) / 7) + 1 where offset is the distance from
    the first crossed day's weekday to the target weekday.
    """
    nights = F.datediff(close_ts, open_ts)
    first_dow = _iso_dow(F.date_add(open_ts, 1))
    offset = (F.lit(triple_weekday) - first_dow + 7) % 7
    triples = (
        F.when(nights <= 0, F.lit(0))
        .when(nights - 1 >= offset, F.floor((nights - 1 - offset) / 7) + 1)
        .otherwise(F.lit(0))
    )
    return nights, triples.cast("long")


def with_swap_fee(
    positions: DataFrame,
    *,
    open_ts: str = "open_ts",
    close_ts: str = "close_ts",
    rate: str = "swap_rate",
    lots: str = "lots",
    triple_weekday: int = 3,
    out: str = "swap_fee",
) -> DataFrame:
    """Add nights / triple_rollovers / total swap fee columns.

    total fee = rate x lots x (nights + 2 x triples): each rollover costs one
    unit, triple-day rollovers cost two extra.
    """
    nights, triples = rollover_columns(
        F.col(open_ts), F.col(close_ts), triple_weekday=triple_weekday
    )
    return (
        positions.withColumn("nights", nights)
        .withColumn("triple_rollovers", triples)
        .withColumn(
            out,
            F.col(rate) * F.col(lots) * (F.col("nights") + 2 * F.col("triple_rollovers")),
        )
    )
