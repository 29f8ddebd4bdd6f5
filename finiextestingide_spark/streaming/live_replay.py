"""The live autotrader loop as ONE stateful streaming operator.

The reference's second entry point runs the SAME tick pipeline live that
the backtest runs batch: WebSocket -> queue -> bars -> workers -> decision
-> trade executor (reference: python/framework/autotrader/
autotrader_tick_loop.py:201+, shared core tick_pipeline_core.py:1-16), and
its parity suite pins that the two pipelines produce identical trade
records on the same input (tests/parity/test_trade_records_parity.py).

Engine mapping: ``live_backtest`` keys the tick stream by symbol and runs
the replay's market-order path inside ``applyInPandasWithState`` — per-key
state carries exactly what the reference's live loop holds in memory: the
forming bar bucket, the strategy's close window (and its pyramiding slot
count), the current target, the open-position BOOK with running MAE/MFE
per position, the latency FIFO, and the rng draw count. A trade record is
emitted the moment its position closes; final open positions never close
(a live session has no END), which is precisely the difference the parity
tests must allow for.

Tick-loop ordering mirrors operators/replay._replay_core bit-for-bit: bar
close on the first tick of a later bucket -> strategy decision (one rng
draw per decision that queues order actions) -> latency FIFO drained
head-first (FIFO by SUBMISSION — a later order with a shorter draw still
waits for the head) with capacity-dropped opens consumed at fill time ->
per-tick excursion update AFTER fills so the entry tick's spread lands in
MAE -> broker-side SL/TP on the close-side mark, filled AT the level.
Closes are stored as array<double> state, so the SMA arithmetic runs over
the exact same float64 values in both pipelines; excursion prices anchor
at the entry when a side never leaves zero (the batch contract).

Scope (honest): the target-model strategies whose cross-bar state is the
close window plus the held target — sma_cross, buy_hold, rsi_reversion
(hold-previous rides the stored target) — and the action-model pyramid
(multi-position book up to ``max_positions``, slot count in state,
capacity drops reclaim the slot exactly like the batch on_open_dropped
hook). Strategies beyond that (recursive EMA state, resting-order books)
lift their state into the state tuple through the same seam; ``_decide``
and the pyramid branch are the swap points.
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
        StructField("target", IntegerType()),     # target-model strategy state
        StructField("open_count", IntegerType()),  # pyramid slot count (incl. in-flight)
        # the open-position book, oldest first (parallel arrays)
        StructField("p_dir", ArrayType(IntegerType())),
        StructField("p_lots", ArrayType(DoubleType())),
        StructField("p_entry_ms", ArrayType(LongType())),
        StructField("p_entry_price", ArrayType(DoubleType())),
        StructField("p_fees", ArrayType(DoubleType())),
        StructField("p_mae", ArrayType(DoubleType())),
        StructField("p_mfe", ArrayType(DoubleType())),
        StructField("p_maep", ArrayType(DoubleType())),
        StructField("p_mfep", ArrayType(DoubleType())),
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


class _Pos:
    __slots__ = ("dir", "lots", "entry_ms", "entry_price", "fees", "mae", "mfe",
                 "maep", "mfep")

    def __init__(self, dir, lots, entry_ms, entry_price, fees, mae, mfe, maep, mfep):
        self.dir, self.lots = dir, lots
        self.entry_ms, self.entry_price, self.fees = entry_ms, entry_price, fees
        self.mae, self.mfe, self.maep, self.mfep = mae, mfe, maep, mfep


def _decide(closes: list[float], target: int, params: dict) -> int:
    """Target-model decision from the stored close window + held target —
    the same arithmetic as the batch strategies (operators/replay.SmaCross
    after the round-6 fresh-window fix; RsiReversion's SMA-flavor RSI with
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
    (strategy/fast/slow/bar_ms/lots/contract_size/fee_per_side/
    max_positions/sl_dist/tp_dist).

    Seeded latency (R2): with ``latency_max_ms > 0`` every decision that
    queues order actions draws one delay from
    random.Random(latency_seed).randint(min, max) — the batch core's exact
    call sequence — and the actions rest in a FIFO drained head-first once
    the tick clock passes each deadline. The draw count rides in the state
    tuple; the generator is rebuilt per micro-batch by replaying exactly
    that many draws, which keeps the live sequence bit-identical to the
    batch run's."""
    bar_ms = int(params.get("bar_ms", 60_000))
    lots = float(params.get("lots", 1.0))
    contract = float(params.get("contract_size", 1.0))
    fee_per_side = float(params.get("fee_per_side", 0.0))
    max_positions = int(params.get("max_positions", 1))
    strat = params.get("strategy", "sma_cross")
    pyramid = strat == "pyramid"
    fast = int(params.get("fast", 5))
    slow = int(params.get("slow", 20))
    # close-window bound: enough history for whichever decision runs
    win = max(slow, int(params.get("period", 14)) + 1)
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
            (bucket, cur_close, closes, target, open_count,
             p_dir, p_lots, p_ems, p_ep, p_fees, p_mae, p_mfe, p_maep, p_mfep,
             trade_count, pend_due, pend_kind, pend_dir, n_draws) = state.get
            closes = list(closes)
            positions = [
                _Pos(*vals)
                for vals in zip(p_dir, p_lots, p_ems, p_ep, p_fees, p_mae, p_mfe,
                                p_maep, p_mfep)
            ]
            pending = list(zip(pend_due, pend_kind, pend_dir))
        else:
            bucket, cur_close, closes, target, open_count = -1, 0.0, [], 0, 0
            positions, pending, trade_count, n_draws = [], [], 0, 0
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

        def emit_close(p: _Pos, t: int, price: float, reason: str) -> None:
            nonlocal trade_count
            gross = p.dir * (price - p.entry_price) * contract * p.lots
            fees = p.fees + fee_per_side * p.lots
            out.append(
                (
                    symbol, trade_count, "LONG" if p.dir > 0 else "SHORT", p.lots,
                    pd.Timestamp(p.entry_ms, unit="ms"), p.entry_price,
                    pd.Timestamp(t, unit="ms"), price,
                    gross, fees, gross - fees,
                    p.mae, p.mfe, p.maep, p.mfep, reason,
                )
            )
            trade_count += 1

        for t, b, a in zip(ts_ms, bl, al):
            bk = t // bar_ms * bar_ms
            acts: list[tuple] = []  # (kind, dir, lots) queued this tick
            if bk != bucket:
                if bucket != -1:
                    # bar closes: append its close, trim, decide
                    closes.append(cur_close)
                    if len(closes) > win:
                        del closes[0]
                    if pyramid:
                        # Pyramid.on_bar_actions: while SMA(fast)>SMA(slow)
                        # add one position per closed bar up to the slot
                        # cap; on the flip, close ALL (oldest first). The
                        # slot count includes in-flight opens, reclaimed on
                        # capacity drops (on_open_dropped).
                        if len(closes) >= slow:
                            cond = sum(closes[-fast:]) / fast > sum(closes[-slow:]) / slow
                            if cond:
                                if open_count < max_positions:
                                    open_count += 1
                                    acts.append((1, 1, lots))
                            elif open_count:
                                open_count = 0
                                acts.append((0, 0, 0.0))
                    else:
                        new_target = _decide(closes, target, params)
                        if new_target != target:
                            target = new_target
                            # one rng draw per flip regardless of what gets
                            # queued (the batch on_bar contract)
                            delay = (
                                rng.randint(latency_min_ms, latency_max_ms) if rng else 0
                            )
                            if rng:
                                n_draws += 1
                            due = t + delay
                            if positions:
                                # close_all queued ONLY when a position
                                # exists at SIGNAL time — the batch
                                # contract. (An open still in flight gets
                                # no close: it fills, the next flip's
                                # close_all takes it out.)
                                pending.append((due, 0, 0))
                            if target != 0:
                                pending.append((due, 1, target))
                bucket = bk
            cur_close = (b + a) / 2.0

            if acts:
                # action model: queueable actions share ONE submission draw
                # per decision (the batch handle_actions contract)
                delay = rng.randint(latency_min_ms, latency_max_ms) if rng else 0
                if rng:
                    n_draws += 1
                due = t + delay
                for kind, d, _l in acts:
                    pending.append((due, kind, d))

            # Phase 1 — drain the latency queue head-first (FIFO by
            # submission, the batch contract) at the current quote
            while pending and t >= pending[0][0]:
                _, kind, d = pending.pop(0)
                if kind == 0:  # close_all, oldest first
                    for p in list(positions):
                        emit_close(p, t, b if p.dir > 0 else a, "SIGNAL")
                    positions = []
                elif len(positions) >= max_positions:
                    # capacity-dropped open: consumed (batch execute());
                    # the pyramid strategy reclaims its reserved slot
                    # (on_open_dropped)
                    if pyramid and open_count:
                        open_count -= 1
                else:
                    entry = a if d > 0 else b
                    positions.append(
                        _Pos(d, lots, t, entry, fee_per_side * lots,
                             # a side with no excursion reports the ENTRY
                             # price as its extreme (the batch contract)
                             0.0, 0.0, entry, entry)
                    )

            # excursions AFTER fills (entry tick's spread lands in MAE),
            # then broker-side SL/TP on the close-side mark, FILL AT THE
            # LEVEL — the batch R3 contract, per position in book order
            if positions:
                for p in list(positions):
                    mark = b if p.dir > 0 else a
                    unreal = p.dir * (mark - p.entry_price) * contract * p.lots
                    if unreal < p.mae:
                        p.mae, p.maep = unreal, mark
                    if unreal > p.mfe:
                        p.mfe, p.mfep = unreal, mark
                    if sl_dist is not None or tp_dist is not None:
                        move = p.dir * (mark - p.entry_price)
                        if sl_dist is not None and move <= -sl_dist:
                            emit_close(p, t, p.entry_price - p.dir * sl_dist, "SL")
                            positions.remove(p)
                            continue
                        if tp_dist is not None and move >= tp_dist:
                            emit_close(p, t, p.entry_price + p.dir * tp_dist, "TP")
                            positions.remove(p)

        state.update(
            (
                int(bucket), float(cur_close), [float(x) for x in closes],
                int(target), int(open_count),
                [int(p.dir) for p in positions], [float(p.lots) for p in positions],
                [int(p.entry_ms) for p in positions],
                [float(p.entry_price) for p in positions],
                [float(p.fees) for p in positions],
                [float(p.mae) for p in positions], [float(p.mfe) for p in positions],
                [float(p.maep) for p in positions], [float(p.mfep) for p in positions],
                int(trade_count),
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
