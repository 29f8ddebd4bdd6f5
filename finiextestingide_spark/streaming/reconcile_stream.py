"""Streaming order <-> execution reconciliation (SURVEY §2.3 J6, live form).

The reference's live trade executor pairs broker execution reports with the
orders that produced them CONTINUOUSLY (live_trade_executor.py;
abstract_adapter.py Tier-3 truth-pull), not as an end-of-day audit: an
execution can arrive before its order is known (ORPHAN until the order
shows up), fills dribble in over time (UNDER_EXECUTED until the quantity
completes), and the pairing state must survive restarts. This operator is
that layer Spark-first: two unbounded streams union into one keyed
stateful pairing (``applyInPandasWithState``), per-key state holds the
expected amount and the exact running executed total, and every state
change emits a REVISION row — the latest revision per key is the current
reconciliation verdict, and once the feeds drain it equals the batch
``operators.reconcile.reconcile_orders`` classification row for row (the
gate hash-checks exactly that).

Two exactness decisions:
- the executed total accumulates as ``decimal.Decimal`` carried in state as
  a string: decimal addition is exact and associative, so ANY arrival order
  (micro-batch slicing, late fills, cross-stream races) produces the same
  final total the batch decimal sum produces — float accumulation would
  make the final hash depend on arrival order;
- revisions are emitted in append mode (a memory/Kafka sink never needs
  update support) and consumers take max(revision) per key; the monotone
  revision also gives an audit trail of every reclassification
  (ORPHAN -> UNDER_EXECUTED -> MATCHED as the order and its fills land).

Scale posture: state is one tiny row per order key, sharded by the shuffle
on the key; no per-batch scans of the whole book, no driver participation.
A 100 TB lake's order flow shards across executors exactly like the batch
join's shuffle would.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("has_order", IntegerType()),
        StructField("expected", DoubleType()),
        StructField("executed", StringType()),  # exact Decimal as text
        StructField("n_exec", LongType()),
        StructField("revision", LongType()),
    ]
)


def reconcile_stream(
    orders: DataFrame,
    executions: DataFrame,
    *,
    order_key: str,
    expected: str = "expected_amount",
    qty: str = "qty",
    tolerance: float = 1e-6,
    state_ttl_ms: int = 0,
) -> DataFrame:
    """orders(order_key, expected_amount) STREAM x executions(order_key,
    qty) STREAM -> revision stream (order_key, expected_amount,
    executed_amount, n_executions, status, revision).

    Status classes are the batch ``reconcile_orders`` contract evaluated on
    the state seen SO FAR: ORPHAN (executions, no order yet), MISSING
    (order, no executions yet), MATCHED / UNDER_EXECUTED / OVER_EXECUTED by
    ``|executed - expected| <=> tolerance``. Late and out-of-order arrivals
    are held in per-key state and re-emit a higher revision; the latest
    revision per key converges to the batch full-outer-join row once both
    feeds drain. ``qty`` may be a decimal column — exactness of the
    accumulated total is preserved end-to-end.

    ``state_ttl_ms > 0`` arms per-key state expiry (the 100 TB posture:
    order flow is unbounded, so a months-lived stream must not hold every
    key it ever saw): a key idle for the TTL drops its pairing state —
    its latest revision already carries the verdict. A fill arriving
    AFTER expiry re-creates the key as a fresh ORPHAN revision (visible,
    never silently merged), which is exactly the honest signal for a fill
    later than the retention horizon. Default 0 = keep state forever
    (bounded audits, the gate's availableNow drives)."""
    key_type = orders.schema[order_key].dataType
    out_schema = StructType(
        [
            StructField(order_key, key_type),
            StructField("expected_amount", DoubleType()),
            StructField("executed_amount", DoubleType()),
            StructField("n_executions", LongType()),
            StructField("status", StringType()),
            StructField("revision", LongType()),
        ]
    )

    o = orders.select(
        F.col(order_key).alias("__key"),
        F.lit(1).alias("__is_order"),
        F.col(expected).cast("double").alias("__expected"),
        F.lit(None).cast("string").alias("__qty"),
    )
    e = executions.select(
        F.col(order_key).alias("__key"),
        F.lit(0).alias("__is_order"),
        F.lit(None).cast("double").alias("__expected"),
        F.col(qty).cast("string").alias("__qty"),  # exact decimal transport
    )
    src = o.unionByName(e)

    def run(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            # TTL expiry: the latest emitted revision stands as the final
            # verdict; dropping state bounds a long-lived stream
            state.remove()
            return
        if state.exists:
            has_order, exp, executed_s, n_exec, revision = state.get
            executed = Decimal(executed_s)
        else:
            has_order, exp, executed, n_exec, revision = 0, None, Decimal(0), 0, 0
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            changed = True
            for is_order, e_amt, q in zip(
                pdf["__is_order"], pdf["__expected"], pdf["__qty"]
            ):
                if is_order:
                    has_order = 1
                    exp = float(e_amt)
                else:
                    executed += Decimal(q)
                    n_exec += 1
        if not changed:
            return
        revision += 1
        state.update((has_order, exp, str(executed), n_exec, revision))
        if state_ttl_ms > 0:
            state.setTimeoutDuration(state_ttl_ms)
        if not has_order:
            status, e_out, x_out = "ORPHAN", None, float(executed)
        elif n_exec == 0:
            status, e_out, x_out = "MISSING", exp, None
        else:
            x = float(executed)
            diff = x - exp
            if abs(diff) <= tolerance:
                status = "MATCHED"
            elif diff < 0:
                status = "UNDER_EXECUTED"
            else:
                status = "OVER_EXECUTED"
            e_out, x_out = exp, x
        yield pd.DataFrame(
            [(k, e_out, x_out, n_exec, status, revision)],
            columns=[f.name for f in out_schema.fields],
        )

    return (
        src.groupBy("__key")
        .applyInPandasWithState(
            run,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if state_ttl_ms > 0
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def latest_revisions(revisions: DataFrame, order_key: str) -> DataFrame:
    """Collapse a (bounded) revision table to the current verdict per key —
    what a dashboard or the gate's batch comparison reads."""
    from pyspark.sql import Window

    w = Window.partitionBy(order_key).orderBy(F.col("revision").desc())
    return (
        revisions.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "revision")
    )
