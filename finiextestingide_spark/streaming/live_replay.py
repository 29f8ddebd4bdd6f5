"""The live autotrader loop as ONE stateful streaming operator.

The reference's second entry point runs the SAME tick pipeline live that
the backtest runs batch: WebSocket -> queue -> bars -> workers -> decision
-> trade executor (reference: python/framework/autotrader/
autotrader_tick_loop.py:201+, shared core tick_pipeline_core.py:1-16), and
its parity suite pins that the two pipelines produce identical trade
records on the same input (tests/parity/test_trade_records_parity.py).

Engine mapping: ``live_backtest`` keys the tick stream by symbol and runs
the replay's market-order/target-model path inside
``applyInPandasWithState`` — per-key state carries exactly what the
reference's live loop holds in memory: the forming bar bucket, the
strategy's close window, the current target, and the one open position
with its running MAE/MFE. A trade record is emitted the moment its
position closes; the final open position never closes (a live session has
no END), which is precisely the difference the parity test must allow
for.

Tick-loop ordering mirrors operators/replay._replay_core's defaults path
bit-for-bit (latency 0, market entries, single position, flat per-lot
fees — the dominant sweep configuration the vectorized fast path also
pins): bar close on the first tick of a later bucket -> strategy decision
-> same-tick close-then-open fills (close at bid for LONG / ask for
SHORT, open at ask for LONG / bid for SHORT) -> per-tick excursion update
AFTER fills so the entry tick's spread shows up in MAE. Closes are stored
as array<double> state, so the SMA arithmetic runs over the exact same
float64 values in both pipelines.

Scope (honest): strategies whose cross-bar state is the close window
plus the held target — sma_cross, buy_hold, and rsi_reversion (its
hold-previous semantics ride the stored target; its deltas are diffs of
the stored closes). Path-dependent strategies beyond that (recursive EMA
state, stop books, seeded latency queues) lift their state into the
state tuple through the same seam; ``_decide`` is the swap point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRADE_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("trade_id", IntegerType()),
        StructField("direction", StringType()),
        StructField("lots", DoubleType()),
        StructField("entry_ts", TimestampType()),
        StructField("entry_price", DoubleType()),
        StructField("exit_ts", TimestampType()),
        StructField("exit_price", DoubleType()),
        StructField("gross_pnl", DoubleType()),
        StructField("fees", DoubleType()),
        StructField("net_pnl", DoubleType()),
        StructField("mae_pnl", DoubleType()),
        StructField("mfe_pnl", DoubleType()),
        StructField("mae_price", DoubleType()),
        StructField("mfe_price", DoubleType()),
        StructField("exit_reason", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),        # forming bar's bucket start ms; -1 none
        StructField("cur_close", DoubleType()),   # forming bar's latest mid
        StructField("closes", ArrayType(DoubleType())),  # closed-bar closes (trimmed)
        StructField("target", IntegerType()),     # current strategy target
        StructField("pos_dir", IntegerType()),    # 0 flat, +1 long, -1 short
        StructField("pos_lots", DoubleType()),
        StructField("pos_entry_ms", LongType()),
        StructField("pos_entry_price", DoubleType()),
        StructField("pos_fees", DoubleType()),
        StructField("pos_mae", DoubleType()),
        StructField("pos_mfe", DoubleType()),
        StructField("pos_mae_price", DoubleType()),
        StructField("pos_mfe_price", DoubleType()),
        StructField("trade_count", IntegerType()),
        # seeded latency queue (R2): FIFO of in-flight actions + the rng
        # draw count (the generator is rebuilt per batch by replaying
        # exactly n_draws randint calls — same sequence as the batch core)
        StructField("pend_due", ArrayType(LongType())),
        StructField("pend_kind", ArrayType(IntegerType())),  # 0 close_all, 1 open
        StructField("pend_dir", ArrayType(IntegerType())),
        StructField("n_draws", IntegerType()),
    ]
)


def _decide(closes: list[float], target: int, params: dict) -> int:
    """Decision from the stored close window + held target — the same
    arithmetic as the batch strategies (operators/replay.SmaCross after the
    round-6 fresh-window fix; RsiReversion's SMA-flavor RSI with
    hold-previous semantics, whose only cross-bar state is the previous
    target and the last period+1 closes — both already in the state tuple).
    buy_hold -> 1."""
    strat = params.get("strategy", "sma_cross")
    if strat == "buy_hold":
        return 1
    if strat == "rsi_reversion":
        period = int(params.get("period", 14))
        buy_below = float(params.get("buy_below", 30.0))
        sell_above = float(params.get("sell_above", 70.0))
        if len(closes) < period + 1:
            return target
        window = [closes[i] - closes[i - 1] for i in range(len(closes) - period, len(closes))]
        gain = sum(d for d in window if d > 0) / period
        loss = sum(-d for d in window if d < 0) / period
        rsi = 100.0 if loss == 0 else 100.0 - 100.0 / (1.0 + gain / loss)
        if rsi < buy_below:
            return 1
        if rsi > sell_above:
            return -1
        return target
    fast = int(params.get("fast", 5))
    slow = int(params.get("slow", 20))
    if len(closes) < slow:
        return 0
    return 1 if sum(closes[-fast:]) / fast > sum(closes[-slow:]) / slow else -1


def live_backtest(
    ticks: DataFrame,
    params: dict,
    *,
    latency_seed: int = 0,
    latency_min_ms: int = 0,
    latency_max_ms: int = 0,
    timeout_ms: int = 0,
) -> DataFrame:
    """ticks(symbol, timestamp, time_msc, bid, ask) STREAM -> trade-record
    stream, one row per closed trade, per-symbol state = the live loop's
    in-memory session. ``params`` is the scenario's parameters map
    (strategy/fast/slow/bar_ms/lots/contract_size/fee_per_side).

    Seeded latency (R2): with ``latency_max_ms > 0`` every signal flip
    draws one delay from random.Random(latency_seed).randint(min, max) —
    the batch core's exact call sequence — and its close/open actions rest
    in a FIFO drained head-first once the tick clock passes each deadline
    (the batch's Phase-1 contract: the queue is FIFO by SUBMISSION, so a
    later order with a shorter draw still waits for the head). The draw
    count rides in the state tuple; the generator is rebuilt per
    micro-batch by replaying exactly that many draws, which keeps the
    live sequence bit-identical to the batch run's."""
    bar_ms = int(params.get("bar_ms", 60_000))
    lots = float(params.get("lots", 1.0))
    contract = float(params.get("contract_size", 1.0))
    fee_per_side = float(params.get("fee_per_side", 0.0))
    # close-window bound: enough history for whichever decision runs
    win = max(int(params.get("slow", 20)), int(params.get("period", 14)) + 1)
    sl_dist = float(params["sl_dist"]) if "sl_dist" in params else None
    tp_dist = float(params["tp_dist"]) if "tp_dist" in params else None

    def run(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (symbol,) = key
        if state.hasTimedOut:  # pragma: no cover - timeouts off by default
            state.remove()
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # global event-time order across Arrow chunks (same contract as the
        # incremental bar renderer: per-chunk order is not enough)
        pdf = pdf.sort_values(["timestamp", "time_msc"], kind="mergesort")

        if state.exists:
            (bucket, cur_close, closes, target, pos_dir, pos_lots, pos_entry_ms,
             pos_entry_price, pos_fees, pos_mae, pos_mfe, pos_mae_price,
             pos_mfe_price, trade_count, pend_due, pend_kind, pend_dir,
             n_draws) = state.get
            closes = list(closes)
            pending = list(zip(pend_due, pend_kind, pend_dir))
        else:
            bucket, cur_close, closes, target = -1, 0.0, [], 0
            pos_dir, pos_lots, pos_entry_ms, pos_entry_price = 0, 0.0, 0, 0.0
            pos_fees, pos_mae, pos_mfe = 0.0, 0.0, 0.0
            pos_mae_price, pos_mfe_price, trade_count = 0.0, 0.0, 0
            pending, n_draws = [], 0
        rng = None
        if latency_max_ms > 0:
            import random

            rng = random.Random(latency_seed)
            for _ in range(n_draws):
                rng.randint(latency_min_ms, latency_max_ms)

        out: list[tuple] = []
        ts_ms = (pdf["timestamp"].astype("int64") // 1_000_000).tolist()
        bl = pdf["bid"].tolist()
        al = pdf["ask"].tolist()

        for t, b, a in zip(ts_ms, bl, al):
            bk = t // bar_ms * bar_ms
            flip = False
            if bk != bucket:
                if bucket != -1:
                    # bar closes: append its close, trim, decide
                    closes.append(cur_close)
                    if len(closes) > win:
                        del closes[0]
                    new_target = _decide(closes, target, params)
                    if new_target != target:
                        target = new_target
                        flip = True
                bucket = bk
            cur_close = (b + a) / 2.0

            if flip:
                # one rng draw per flip regardless of what gets queued
                # (the batch core's sequence contract); latency 0 resolves
                # on this same tick via the drain below
                delay = rng.randint(latency_min_ms, latency_max_ms) if rng else 0
                if rng:
                    n_draws += 1
                due = t + delay
                if pos_dir != 0:
                    # close_all queued ONLY when a position exists at
                    # SIGNAL time — the batch contract. (An open still in
                    # flight gets no close: it fills, the next flip's
                    # close_all takes it out. Faithful, not "fixed".)
                    pending.append((due, 0, 0))
                if target != 0:
                    pending.append((due, 1, target))

            # Phase 1 — drain the latency queue head-first (FIFO by
            # submission, the batch contract) at the current quote
            while pending and t >= pending[0][0]:
                _, kind, d = pending.pop(0)
                if kind == 0:  # close_all
                    if pos_dir != 0:
                        price = b if pos_dir > 0 else a
                        gross = pos_dir * (price - pos_entry_price) * contract * pos_lots
                        fees = pos_fees + fee_per_side * pos_lots
                        out.append(
                            (
                                symbol, trade_count,
                                "LONG" if pos_dir > 0 else "SHORT", pos_lots,
                                pd.Timestamp(pos_entry_ms, unit="ms"), pos_entry_price,
                                pd.Timestamp(t, unit="ms"), price,
                                gross, fees, gross - fees,
                                pos_mae, pos_mfe, pos_mae_price, pos_mfe_price,
                                "SIGNAL",
                            )
                        )
                        trade_count += 1
                        pos_dir = 0
                elif pos_dir != 0:
                    pass  # capacity-dropped open: consumed (batch execute())
                else:
                    pos_dir = d
                    pos_lots = lots
                    pos_entry_ms = t
                    pos_entry_price = a if d > 0 else b
                    pos_fees = fee_per_side * lots
                    pos_mae = pos_mfe = 0.0
                    # a side with no excursion reports the ENTRY price as
                    # its extreme (the batch fast path's contract:
                    # mae_price/mfe_price = entry when min/max pnl never
                    # leaves zero)
                    pos_mae_price = pos_mfe_price = pos_entry_price

            # excursions AFTER fills: the entry tick's spread lands in MAE
            if pos_dir != 0:
                mark = b if pos_dir > 0 else a
                unreal = pos_dir * (mark - pos_entry_price) * contract * pos_lots
                if unreal < pos_mae:
                    pos_mae, pos_mae_price = unreal, mark
                if unreal > pos_mfe:
                    pos_mfe, pos_mfe_price = unreal, mark
                # broker-side SL/TP on the close-side mark, FILL AT THE
                # LEVEL (the batch R3 contract: excursion above runs on the
                # raw mark first, so a gap through the level still lands in
                # MAE/MFE; SL checked before TP)
                if sl_dist is not None or tp_dist is not None:
                    move = pos_dir * (mark - pos_entry_price)
                    fill = reason = None
                    if sl_dist is not None and move <= -sl_dist:
                        fill = pos_entry_price - pos_dir * sl_dist
                        reason = "SL"
                    elif tp_dist is not None and move >= tp_dist:
                        fill = pos_entry_price + pos_dir * tp_dist
                        reason = "TP"
                    if fill is not None:
                        gross = pos_dir * (fill - pos_entry_price) * contract * pos_lots
                        fees = pos_fees + fee_per_side * pos_lots
                        out.append(
                            (
                                symbol, trade_count,
                                "LONG" if pos_dir > 0 else "SHORT", pos_lots,
                                pd.Timestamp(pos_entry_ms, unit="ms"), pos_entry_price,
                                pd.Timestamp(t, unit="ms"), fill,
                                gross, fees, gross - fees,
                                pos_mae, pos_mfe, pos_mae_price, pos_mfe_price,
                                reason,
                            )
                        )
                        trade_count += 1
                        pos_dir = 0

        state.update(
            (
                int(bucket), float(cur_close), [float(x) for x in closes], int(target),
                int(pos_dir), float(pos_lots), int(pos_entry_ms), float(pos_entry_price),
                float(pos_fees), float(pos_mae), float(pos_mfe),
                float(pos_mae_price), float(pos_mfe_price), int(trade_count),
                [int(x[0]) for x in pending], [int(x[1]) for x in pending],
                [int(x[2]) for x in pending], int(n_draws),
            )
        )
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in TRADE_SCHEMA.fields])

    return (
        ticks.groupBy("symbol")
        .applyInPandasWithState(
            run,
            outputStructType=TRADE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms > 0
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
