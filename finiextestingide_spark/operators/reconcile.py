"""Order <-> execution reconciliation (SURVEY §2.3 J6, batch form).

The reference pairs broker execution records with the orders that produced
them for its live reconciliation layer (broker_trade_types.py;
live_trade_executor.py; abstract_adapter.py Tier-3 truth-pull: pull broker
orders/balances/positions and reconcile against local state). The batch
engine's analogue is a lake-side audit: given an orders table and an
executions table, pair them on the order key and classify every order by
how its executed amount reconciles against the expected amount.

Spark-first shape: one aggregate over executions (map-side combined) + one
equi-join keyed on the order key — at 100 TB this is a plain shuffle join
on the natural key with AQE skew handling; no state, no driver loop.
Orphan executions (no matching order) surface as their own class rather
than being dropped — the reconciliation property a truth-pull audit needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def reconcile_orders(
    orders: DataFrame,
    executions: DataFrame,
    *,
    order_key: str,
    expected: Column,
    executed: Column,
    tolerance: float = 1e-6,
) -> DataFrame:
    """Per-order reconciliation row:

    (order_key, expected_amount, executed_amount, n_executions, status)
    with status:
      MATCHED        |executed - expected| <= tolerance
      UNDER_EXECUTED executed < expected - tolerance (incl. partial fills)
      OVER_EXECUTED  executed > expected + tolerance
      MISSING        order with no executions at all
      ORPHAN         executions whose order key has no order row

    ``expected`` is evaluated against ``orders``; ``executed`` must be an
    aggregate expression evaluated over each order's execution group.
    """
    exp = orders.select(F.col(order_key), expected.alias("expected_amount"))
    got = executions.groupBy(order_key).agg(
        executed.alias("executed_amount"),
        F.count(F.lit(1)).alias("n_executions"),
    )
    joined = exp.join(got, order_key, "full_outer")
    diff = F.col("executed_amount") - F.col("expected_amount")
    status = (
        F.when(F.col("expected_amount").isNull(), F.lit("ORPHAN"))
        .when(F.col("executed_amount").isNull(), F.lit("MISSING"))
        .when(F.abs(diff) <= tolerance, F.lit("MATCHED"))
        .when(diff < 0, F.lit("UNDER_EXECUTED"))
        .otherwise(F.lit("OVER_EXECUTED"))
    )
    return joined.select(
        order_key,
        "expected_amount",
        "executed_amount",
        F.coalesce("n_executions", F.lit(0)).alias("n_executions"),
        status.alias("status"),
    )
