"""Running equity / drawdown / excursion windows (SURVEY §2.5 W11-W12).

Reference: running max equity and drawdown (portfolio_manager.py:1133-1139);
per-position running MAE/MFE with price-at-extreme capture
(portfolio_types.py:120-155). Pure window expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_drawdown(
    curve: DataFrame,
    *,
    key: str | None = "scenario_id",
    ts: str = "ts",
    equity: str = "equity",
) -> DataFrame:
    w = (Window.partitionBy(key) if key else Window.partitionBy()).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, 0
    )
    peak = F.max(equity).over(w)
    dd = peak - F.col(equity)
    df = curve.withColumn("peak_equity", peak).withColumn("drawdown", dd)
    return df.withColumn(
        "max_drawdown",
        F.max("drawdown").over(
            (Window.partitionBy(key) if key else Window.partitionBy())
            .orderBy(ts)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def with_excursions(
    marks: DataFrame,
    *,
    key: str = "position_id",
    ts: str = "ts",
    pnl: str = "unrealized_pnl",
    price: str = "price",
) -> DataFrame:
    """Running MAE/MFE of unrealized P&L + the price at each extreme
    (min_by/max_by capture, no second pass)."""
    w = Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    return (
        marks.withColumn("mae_pnl", F.min(pnl).over(w))
        .withColumn("mfe_pnl", F.max(pnl).over(w))
        .withColumn("mae_price", F.min_by(price, pnl).over(w))
        .withColumn("mfe_price", F.max_by(price, pnl).over(w))
    )
