"""Scenario-parallel stateful replay — the backtest core (SURVEY.md §2.8).

The reference forks one OS process per scenario and runs a per-tick Python
loop through bars -> workers -> decision -> trade simulator (reference:
python/framework/batch/batch_orchestrator.py:550-574,
python/framework/process/process_tick_loop.py:110+,
python/framework/trading_env/simulation/trade_simulator.py:146-236).

Spark-first shape: scenarios are rows; ticks are range-joined to scenarios
(one broadcast join = the reference's grouped scan-sharing,
shared_data_preparator.py:624-696), then ONE ``groupBy(scenario_id)
.applyInPandas(...)`` replaces the process pool. Each scenario's stream is
independent, so this partitions perfectly: on a 1000-executor cluster a
40-scenario batch is 40 tasks, a 100k-combination sweep is 100k tasks —
no shuffle after the one scenario-attach join, no driver-side loop.

Inside the group the semantics are deliberately sequential (that is the
operator's contract — order fills depend on prior fills):

- R1 tick-budget clipping: virtual clock over ``collected_msc``; a clipped
  tick is invisible to the strategy but the broker still matches orders on
  it (shared_data_preparator.py:462-536).
- R2 seeded latency queue: each order is delayed by
  ``random.Random(seed).randint(min_ms, max_ms)`` — the exact RNG sequence
  the reference uses (seeded_delay_generator.py:15-40), so same seed =>
  same fills, different seed => different fills.
- R3 order matching: market orders fill on the first tick at/after the
  latency deadline (BUY at ask, SELL at bid); SL/TP exits are broker-side
  and immediate (trade_simulator.py:610-686, close-side price selection:
  LONG exits at bid, SHORT at ask). Limit/stop ENTRY orders
  (params entry_type='limit'|'stop' with entry_offset) rest after their
  latency deadline and fill on the reference's trigger rules
  (trade_simulator.py:610-686): LONG limit fills at the limit price once
  ask <= limit, SHORT limit once bid >= limit; LONG stop fills at market
  once ask >= stop, SHORT stop once bid <= stop. A newer signal cancels the
  resting entry (the resolve-modify/cancel phase) before queueing its own
  orders; close orders are always market.
- R4 position P&L + MAE/MFE running extrema with price-at-extreme capture
  (portfolio_types.py:120-155).
- R5 equity / peak / drawdown account state (portfolio_manager.py:1080-1139).
- R7 incremental bar render: bucket floor per tick; a bar closes on the
  first tick of the next bucket; decisions fire on bar close
  (bar_renderer.py:123-214).
- R9 decision logic: pluggable strategies over the closed-bar close series
  (the reference's decision_logic/ plugins); each is O(1) per bar via
  incremental state.

Memory posture: one scenario's ticks must fit one task (the same bound the
reference has per process). Columns are projected to 5 primitive arrays
before the loop; 10M ticks/scenario ~= 400 MB — within executor budgets.
Equity output is sampled every ``equity_sample_every`` ticks so the result
row stays small.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
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

TRADE_FIELDS = StructType(
    [
        StructField("trade_id", IntegerType()),
        StructField("direction", StringType()),
        StructField("lots", DoubleType()),
        StructField("entry_ts", TimestampType()),
        StructField("entry_price", DoubleType()),
        StructField("exit_ts", TimestampType()),
        StructField("exit_price", DoubleType()),
        StructField("gross_pnl", DoubleType()),
        StructField("fees", DoubleType()),
        StructField("swap", DoubleType()),
        StructField("net_pnl", DoubleType()),
        StructField("mae_pnl", DoubleType()),
        StructField("mfe_pnl", DoubleType()),
        StructField("mae_price", DoubleType()),
        StructField("mfe_price", DoubleType()),
        StructField("exit_reason", StringType()),
    ]
)

EQUITY_SAMPLE_FIELDS = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("equity", DoubleType()),
        StructField("drawdown", DoubleType()),
    ]
)

REPLAY_RESULT_SCHEMA = StructType(
    [
        StructField("scenario_id", IntegerType()),
        StructField("ticks_processed", LongType()),
        StructField("ticks_clipped", LongType()),
        StructField("bars_closed", LongType()),
        StructField("trades_count", IntegerType()),
        StructField("orders_rejected", IntegerType()),
        StructField("wins", IntegerType()),
        StructField("losses", IntegerType()),
        StructField("gross_profit", DoubleType()),
        StructField("gross_loss", DoubleType()),
        StructField("fees", DoubleType()),
        StructField("swap", DoubleType()),
        StructField("net_pnl", DoubleType()),
        StructField("final_equity", DoubleType()),
        StructField("max_drawdown", DoubleType()),
        StructField("trades", ArrayType(TRADE_FIELDS)),
        StructField("equity_samples", ArrayType(EQUITY_SAMPLE_FIELDS)),
    ]
)


# ---------------------------------------------------------------------------
# Strategies (R9) — incremental, O(1) per closed bar. The reference's
# decision-logic plugins (python/framework/decision_logic/core/) follow the
# same contract: warmup depth + a per-bar decision.
# ---------------------------------------------------------------------------


class SmaCross:
    """target +1 when SMA(fast) > SMA(slow), else -1."""

    def __init__(self, params: dict):
        self.fast = int(params.get("fast", 5))
        self.slow = int(params.get("slow", 20))
        self.warmup = self.slow
        self._closes: list[float] = []
        self._fsum = 0.0
        self._ssum = 0.0

    def on_bar(self, close: float) -> int:
        cs = self._closes
        cs.append(close)
        self._fsum += close
        self._ssum += close
        if len(cs) > self.fast:
            self._fsum -= cs[-self.fast - 1]
        if len(cs) > self.slow:
            self._ssum -= cs[-self.slow - 1]
        if len(cs) < self.warmup:
            return 0
        return 1 if self._fsum / self.fast > self._ssum / self.slow else -1


class RsiReversion:
    """SMA-flavor RSI (rsi_worker.py:96-139): long below `buy_below`, short
    above `sell_above`, otherwise hold the previous target."""

    def __init__(self, params: dict):
        self.period = int(params.get("period", 14))
        self.buy_below = float(params.get("buy_below", 30.0))
        self.sell_above = float(params.get("sell_above", 70.0))
        self.warmup = self.period + 1
        self._deltas: list[float] = []
        self._prev_close: float | None = None
        self._target = 0

    def on_bar(self, close: float) -> int:
        if self._prev_close is not None:
            self._deltas.append(close - self._prev_close)
        self._prev_close = close
        if len(self._deltas) < self.period:
            return self._target
        window = self._deltas[-self.period :]
        gain = sum(d for d in window if d > 0) / self.period
        loss = sum(-d for d in window if d < 0) / self.period
        rsi = 100.0 if loss == 0 else 100.0 - 100.0 / (1.0 + gain / loss)
        if rsi < self.buy_below:
            self._target = 1
        elif rsi > self.sell_above:
            self._target = -1
        return self._target


class BuyHold:
    def __init__(self, params: dict):
        self.warmup = 1

    def on_bar(self, close: float) -> int:
        return 1


class _Ema:
    """SMA-seeded recursive EMA (the reference's flavor, macd_worker.py:262-284):
    first `n` values average into the seed, then alpha = 2/(n+1)."""

    def __init__(self, n: int):
        self.n = n
        self.alpha = 2.0 / (n + 1.0)
        self._buf: list[float] = []
        self.val: float | None = None

    def update(self, x: float) -> float | None:
        if self.val is None:
            self._buf.append(x)
            if len(self._buf) == self.n:
                self.val = sum(self._buf) / self.n
            return self.val
        self.val = self.val + self.alpha * (x - self.val)
        return self.val


class MacdCross:
    """Long while MACD > signal line, short otherwise (the reference's
    cautious-MACD decision logic family, decision_logic/core/); EMAs and the
    signal line use the exact W3 formula flavor (SMA-seeded recursion)."""

    def __init__(self, params: dict):
        fast = int(params.get("fast", 12))
        slow = int(params.get("slow", 26))
        signal = int(params.get("signal", 9))
        self.warmup = slow + signal
        self._ef = _Ema(fast)
        self._es = _Ema(slow)
        self._esig = _Ema(signal)
        self._target = 0

    def on_bar(self, close: float) -> int:
        f = self._ef.update(close)
        s = self._es.update(close)
        if f is None or s is None:
            return self._target
        macd = f - s
        sig = self._esig.update(macd)
        if sig is None:
            return self._target
        self._target = 1 if macd > sig else -1
        return self._target


class Consensus:
    """Majority vote of sma_cross + rsi_reversion + macd_cross: flip only
    when at least `quorum` sub-signals agree on a direction, else hold (the
    reference's simple-consensus decision logic shape)."""

    def __init__(self, params: dict):
        self._subs = [SmaCross(params), RsiReversion(params), MacdCross(params)]
        self.warmup = max(s.warmup for s in self._subs)
        self.quorum = int(params.get("quorum", 2))
        self._target = 0

    def on_bar(self, close: float) -> int:
        votes = [s.on_bar(close) for s in self._subs]
        for side in (1, -1):
            if sum(1 for v in votes if v == side) >= self.quorum:
                self._target = side
        return self._target


STRATEGIES = {
    "sma_cross": SmaCross,
    "rsi_reversion": RsiReversion,
    "buy_hold": BuyHold,
    "macd_cross": MacdCross,
    "consensus": Consensus,
}


@dataclass
class _Position:
    direction: int  # +1 long, -1 short
    lots: float
    entry_i: int
    entry_ms: int
    entry_price: float
    fees: float
    swap: float = 0.0
    mae_pnl: float = 0.0
    mfe_pnl: float = 0.0
    mae_price: float = 0.0
    mfe_price: float = 0.0


def _replay_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """The per-scenario state machine, config read from the (constant)
    scenario columns joined onto the group's rows."""
    first = pdf.iloc[0]
    scen = {
        k: first.get(k)
        for k in (
            "scenario_id",
            "parameters",
            "tick_processing_budget_ms",
            "latency_seed",
            "latency_min_ms",
            "latency_max_ms",
            "max_ticks",
        )
    }
    return _replay_core(pdf, scen)


def _replay_core(pdf: pd.DataFrame, scen: dict) -> pd.DataFrame:
    sid = int(scen["scenario_id"])
    raw_params = scen.get("parameters")
    params: dict = dict(raw_params) if isinstance(raw_params, dict) else {}

    strategy_name = params.get("strategy", "sma_cross")
    strategy = STRATEGIES[strategy_name](params)
    bar_ms = int(params.get("bar_ms", 60_000))
    lots = float(params.get("lots", 1.0))
    contract = float(params.get("contract_size", 1.0))
    fee_per_side = float(params.get("fee_per_side", 0.0))
    sl_dist = float(params["sl_dist"]) if "sl_dist" in params else None
    tp_dist = float(params["tp_dist"]) if "tp_dist" in params else None
    start_balance = float(params.get("start_balance", 10_000.0))
    sample_every = int(params.get("equity_sample_every", 1000))
    entry_type = params.get("entry_type", "market")  # market | limit | stop
    entry_offset = float(params.get("entry_offset", 0.0))
    # R6 — overnight rollover fee per UTC day boundary crossed while a
    # position is open (portfolio_manager.py:860-917); multi-day gaps charge
    # once per crossed boundary.
    swap_long = float(params.get("swap_long_daily", 0.0))
    swap_short = float(params.get("swap_short_daily", 0.0))
    # R5 — margin gate (portfolio_manager margin checks / the reference's
    # margin_validation suite): an open is REJECTED when current equity
    # cannot cover the required margin. None = margin checks off.
    margin_per_lot = (
        float(params["margin_per_lot"]) if "margin_per_lot" in params else None
    )
    # R8 — simulated-time heartbeats (opt-in): resolve latency-queue fills
    # whose deadline falls inside an inter-tick gap at the last known quote,
    # at the deadline instant; suppressed across gaps larger than the
    # suppress threshold (reference: process_tick_loop.py:52-107 — ghost
    # passes every heartbeat interval, suppressed across large gaps).
    heartbeat_ms = int(params["heartbeat_ms"]) if "heartbeat_ms" in params else None
    suppress_gap_ms = int(
        params.get("heartbeat_suppress_gap_ms", 0 if heartbeat_ms is None else 100 * heartbeat_ms)
    )

    budget_ms = scen.get("tick_processing_budget_ms")
    budget_ms = float(budget_ms) if budget_ms is not None and not pd.isna(budget_ms) else None
    seed = scen.get("latency_seed")
    seed = int(seed) if seed is not None and not pd.isna(seed) else 42
    lat_min = scen.get("latency_min_ms")
    lat_min = int(lat_min) if lat_min is not None and not pd.isna(lat_min) else 0
    lat_max = scen.get("latency_max_ms")
    lat_max = int(lat_max) if lat_max is not None and not pd.isna(lat_max) else 0
    max_ticks = scen.get("max_ticks")
    max_ticks = int(max_ticks) if max_ticks is not None and not pd.isna(max_ticks) else None

    # Deterministic total order — reference bug #385 is tick-order
    # instability. Input row order after the scenario-attach shuffle is
    # arbitrary, so time_msc alone leaves ties nondeterministic; break them
    # with the ingest tick_seq when present, else every value column (rows
    # still tied after that are identical, so their order cannot matter).
    sort_keys = [
        c
        for c in ("time_msc", "tick_seq", "timestamp", "collected_msc", "bid", "ask")
        if c in pdf.columns
    ]
    pdf = pdf.sort_values(sort_keys, kind="mergesort")
    if max_ticks is not None:
        pdf = pdf.iloc[:max_ticks]

    ts_ms = pdf["time_msc"].to_numpy(dtype="int64")
    coll_ms = (
        pdf["collected_msc"].to_numpy(dtype="int64")
        if "collected_msc" in pdf.columns
        else ts_ms
    )
    bid = pdf["bid"].to_numpy(dtype="float64")
    ask = pdf["ask"].to_numpy(dtype="float64")
    buckets = ts_ms // bar_ms
    n = len(ts_ms)

    rng = random.Random(seed)
    balance = start_balance
    equity = start_balance
    peak = start_balance
    max_dd = 0.0
    clock = -(2**62)
    n_clipped = 0
    n_rejected = 0
    bars_closed = 0
    cur_bucket = -(2**62)
    cur_close = 0.0
    have_bar = False
    target = 0
    pos: _Position | None = None
    # latency queue: (due_ms, direction, purpose, trigger_price)
    # purpose 'open'/'close'; trigger_price None for market opens and closes.
    pending: list[tuple[int, int, str, float | None]] = []
    # resting limit/stop entry past its latency deadline: (dir, trigger)
    resting: tuple[int, float] | None = None
    trades: list[dict] = []
    samples: list[dict] = []

    tsl = ts_ms.tolist()
    cl = coll_ms.tolist()
    bl = bid.tolist()
    al = ask.tolist()
    bk = buckets.tolist()

    # Vectorized fast path for the dominant sweep configuration (market
    # orders, no stops/budget/heartbeat/margin/swap, no equity sampling):
    # bit-identical results, ~10x per-core throughput. force_slow=1 pins
    # the reference loop (used by the equivalence tests).
    if (
        budget_ms is None
        and sl_dist is None
        and tp_dist is None
        and heartbeat_ms is None
        and margin_per_lot is None
        and swap_long == 0.0
        and swap_short == 0.0
        and entry_type == "market"
        and sample_every == 0
        and params.get("force_slow") != "1"
    ):
        return _replay_fast(
            sid,
            strategy,
            tsl,
            bl,
            al,
            bk,
            rng=rng,
            lat_min=lat_min,
            lat_max=lat_max,
            lots=lots,
            contract=contract,
            fee_per_side=fee_per_side,
            start_balance=start_balance,
        )

    def close_position(i: int, price: float, reason: str, exit_ms: int | None = None) -> None:
        nonlocal pos, balance
        p = pos
        gross = p.direction * (price - p.entry_price) * contract * p.lots
        fees = p.fees + fee_per_side * p.lots
        # swap was already debited from balance at each day boundary; it
        # joins the trade record (and net) here, not the balance again
        balance += gross - fees
        trades.append(
            {
                "trade_id": len(trades),
                "direction": "LONG" if p.direction > 0 else "SHORT",
                "lots": p.lots,
                "entry_ts": pd.Timestamp(p.entry_ms, unit="ms"),
                "entry_price": p.entry_price,
                "exit_ts": pd.Timestamp(exit_ms if exit_ms is not None else tsl[i], unit="ms"),
                "exit_price": price,
                "gross_pnl": gross,
                "fees": fees,
                "swap": p.swap,
                "net_pnl": gross - fees - p.swap,
                "mae_pnl": p.mae_pnl,
                "mfe_pnl": p.mfe_pnl,
                "mae_price": p.mae_price,
                "mfe_price": p.mfe_price,
                "exit_reason": reason,
            }
        )
        pos = None

    def margin_ok() -> bool:
        """R5 margin gate at fill time: equity (== balance when flat) must
        cover the required margin, else the order is rejected."""
        nonlocal n_rejected
        if margin_per_lot is not None and balance < margin_per_lot * lots:
            n_rejected += 1
            return False
        return True

    for i in range(n):
        t = tsl[i]
        b = bl[i]
        a = al[i]

        # R6 — overnight rollover: charge per UTC day boundary crossed
        # since the previous tick while holding (position state is from
        # before this tick's fills, so a position opened on this tick is
        # not charged for this boundary)
        if pos is not None and i > 0 and (swap_long != 0.0 or swap_short != 0.0):
            days = t // 86_400_000 - tsl[i - 1] // 86_400_000
            if days > 0:
                rate = swap_long if pos.direction > 0 else swap_short
                charge = rate * days * pos.lots
                balance -= charge
                pos.swap += charge

        # R8 — heartbeat passes inside an inter-tick gap: fills whose
        # latency deadline expired during the gap resolve at the LAST known
        # quote, stamped at the deadline; suppressed for gaps beyond the
        # threshold (weekend analogue — those fills wait for the next tick).
        if (
            heartbeat_ms is not None
            and i > 0
            and heartbeat_ms < t - tsl[i - 1] <= suppress_gap_ms
        ):
            pb, pa = bl[i - 1], al[i - 1]
            while pending and pending[0][0] < t:
                due, direction, purpose, trig = pending.pop(0)
                if purpose == "close":
                    if pos is not None:
                        close_position(
                            i - 1, pb if pos.direction > 0 else pa, "SIGNAL", exit_ms=due
                        )
                elif trig is not None:
                    # limit/stop entries become resting at their deadline; a
                    # gap has no quote movement, so no trigger can fire here
                    resting = (direction, trig)
                elif pos is None and margin_ok():
                    price = pa if direction > 0 else pb
                    pos = _Position(
                        direction=direction,
                        lots=lots,
                        entry_i=i - 1,
                        entry_ms=due,
                        entry_price=price,
                        fees=fee_per_side * lots,
                        mae_price=price,
                        mfe_price=price,
                    )

        # R1 — budget clipping (algo-invisible, broker-visible)
        clipped = False
        if budget_ms is not None:
            c = cl[i]
            if c < clock:
                clipped = True
                n_clipped += 1
            else:
                clock = c + budget_ms

        # R7 — bar close on first tick of a new bucket; R9 decision
        if bk[i] != cur_bucket:
            if have_bar:
                bars_closed += 1
                new_target = strategy.on_bar(cur_close)
                if not clipped and new_target != target:
                    target = new_target
                    delay = rng.randint(lat_min, lat_max) if lat_max > 0 else 0
                    due = t + delay
                    # resolve-modify/cancel phase: a newer signal cancels
                    # any resting limit/stop entry before queueing its own
                    resting = None
                    if pos is not None:
                        pending.append((due, -pos.direction, "close", None))
                    if target != 0:
                        if entry_type == "limit":
                            trig = (a - entry_offset) if target > 0 else (b + entry_offset)
                        elif entry_type == "stop":
                            trig = (a + entry_offset) if target > 0 else (b - entry_offset)
                        else:
                            trig = None
                        pending.append((due, target, "open", trig))
            cur_bucket = bk[i]
            have_bar = True
        cur_close = (b + a) / 2.0

        # R2/R3 — drain latency queue in submission order
        while pending and t >= pending[0][0]:
            _, direction, purpose, trig = pending.pop(0)
            if purpose == "close":
                if pos is not None:
                    close_position(i, b if pos.direction > 0 else a, "SIGNAL")
            elif trig is not None:
                resting = (direction, trig)  # limit/stop: rest until trigger
            elif pos is None and margin_ok():
                price = a if direction > 0 else b
                pos = _Position(
                    direction=direction,
                    lots=lots,
                    entry_i=i,
                    entry_ms=t,
                    entry_price=price,
                    fees=fee_per_side * lots,
                    mae_price=price,
                    mfe_price=price,
                )

        # R3 — limit/stop trigger phase (trade_simulator.py:610-686): LONG
        # limit fills AT the limit once ask <= limit; SHORT limit once
        # bid >= limit; stops break out and fill at market.
        if resting is not None and pos is None:
            direction, trig = resting
            fill = None
            if entry_type == "limit":
                if direction > 0 and a <= trig:
                    fill = trig
                elif direction < 0 and b >= trig:
                    fill = trig
            else:  # stop
                if direction > 0 and a >= trig:
                    fill = a
                elif direction < 0 and b <= trig:
                    fill = b
            if fill is not None:
                resting = None
                if not margin_ok():
                    fill = None  # broker rejects the triggered order
            if fill is not None:
                pos = _Position(
                    direction=direction,
                    lots=lots,
                    entry_i=i,
                    entry_ms=t,
                    entry_price=fill,
                    fees=fee_per_side * lots,
                    mae_price=fill,
                    mfe_price=fill,
                )

        # R4 — excursion update as the price arrives (before stop evaluation,
        # so the exit tick's adverse move is captured in MAE)
        unreal = 0.0
        if pos is not None:
            mark = b if pos.direction > 0 else a
            unreal = pos.direction * (mark - pos.entry_price) * contract * pos.lots
            if unreal < pos.mae_pnl:
                pos.mae_pnl = unreal
                pos.mae_price = mark
            if unreal > pos.mfe_pnl:
                pos.mfe_pnl = unreal
                pos.mfe_price = mark

            # R3 — broker-side SL/TP (close-side price: LONG->bid, SHORT->ask)
            if sl_dist is not None or tp_dist is not None:
                move = pos.direction * (mark - pos.entry_price)
                if sl_dist is not None and move <= -sl_dist:
                    close_position(i, mark, "SL")
                    unreal = 0.0
                elif tp_dist is not None and move >= tp_dist:
                    close_position(i, mark, "TP")
                    unreal = 0.0

        # R5 — account state
        equity = balance + unreal
        if equity > peak:
            peak = equity
        dd = peak - equity
        if dd > max_dd:
            max_dd = dd
        if sample_every > 0 and i % sample_every == 0:
            samples.append(
                {"ts": pd.Timestamp(t, unit="ms"), "equity": equity, "drawdown": dd}
            )

    if pos is not None and n > 0:
        close_position(n - 1, bl[n - 1] if pos.direction > 0 else al[n - 1], "END")
        equity = balance

    wins = sum(1 for tr in trades if tr["net_pnl"] > 0)
    losses = sum(1 for tr in trades if tr["net_pnl"] < 0)
    return pd.DataFrame(
        [
            {
                "scenario_id": sid,
                "ticks_processed": n,
                "ticks_clipped": n_clipped,
                "bars_closed": bars_closed,
                "trades_count": len(trades),
                "orders_rejected": n_rejected,
                "wins": wins,
                "losses": losses,
                "gross_profit": sum(tr["gross_pnl"] for tr in trades if tr["gross_pnl"] > 0),
                "gross_loss": sum(tr["gross_pnl"] for tr in trades if tr["gross_pnl"] < 0),
                "fees": sum(tr["fees"] for tr in trades),
                "swap": sum(tr["swap"] for tr in trades),
                "net_pnl": sum(tr["net_pnl"] for tr in trades),
                "final_equity": equity if n > 0 else start_balance,
                "max_drawdown": max_dd,
                "trades": trades,
                "equity_samples": samples,
            }
        ]
    )


def _replay_fast(
    sid: int,
    strategy,
    tsl: list,
    bl: list,
    al: list,
    bk: list,
    *,
    rng: random.Random,
    lat_min: int,
    lat_max: int,
    lots: float,
    contract: float,
    fee_per_side: float,
    start_balance: float,
) -> pd.DataFrame:
    """Vectorized replay for the market-order / no-stop / no-budget domain.

    Decisions depend only on closed-bar closes, never on fills, so the flip
    sequence is computed once from the (short) bar series; fills resolve by
    searchsorted with FIFO head-blocking; MAE/MFE and the equity/drawdown
    stream are per-segment numpy reductions. BIT-IDENTICAL to _replay_core
    on this domain (pinned by tests + a hypothesis equivalence property):
    every float expression keeps the loop's exact operation order, the
    strategy object and the latency RNG are consumed in the same sequence.
    ~10x the per-core throughput of the per-tick loop — this is the path a
    100k-combination sweep runs on."""
    ts = np.asarray(tsl, dtype=np.int64)
    bid = np.asarray(bl, dtype=np.float64)
    ask = np.asarray(al, dtype=np.float64)
    buckets = np.asarray(bk, dtype=np.int64)
    n = len(ts)
    mid = (bid + ask) / 2.0

    # closed-bar closes + decision tick indices (first tick of each new
    # bucket after the first)
    change = np.flatnonzero(np.diff(buckets) != 0) + 1
    closes = mid[change - 1]
    bars_closed = int(len(change))

    # strategy targets per closed bar -> flip points (same call sequence as
    # the loop; strategies are deterministic, no RNG inside)
    flips: list[tuple[int, int]] = []  # (decision tick idx, new target)
    target = 0
    for ci, close in zip(change, closes):
        new_target = strategy.on_bar(float(close))
        if new_target != target:
            target = new_target
            flips.append((int(ci), new_target))

    # FIFO queue with head-blocking fills; close fills close whatever is
    # open (direction recorded at fill, like the loop)
    balance = start_balance
    trades: list[dict] = []
    pos_dir = 0
    pos_entry_i = -1
    pos_entry_ms = 0
    pos_entry_price = 0.0
    segments: list[tuple[int, int, int, float, float]] = []  # (s, e, dir, entry, bal)
    seg_start = 0
    seg_bal = balance
    last_fill_idx = 0
    queue: list[tuple[int, int, int, str]] = []  # (due, emit_idx, dir, purpose)

    def close_at(i: int, exit_ms: int, reason: str) -> None:
        nonlocal balance, pos_dir, seg_start, seg_bal
        entry = pos_entry_price
        d = pos_dir
        price = bid[i] if d > 0 else ask[i]
        gross = d * (price - entry) * contract * lots
        fees = fee_per_side * lots + fee_per_side * lots
        # MAE/MFE window: [entry_i, i-1] for SIGNAL (drain precedes the
        # excursion block), [entry_i, i] for END (post-loop close)
        w_end = i if reason == "END" else i - 1
        if w_end >= pos_entry_i:
            mark = (bid if d > 0 else ask)[pos_entry_i : w_end + 1]
            pnl = d * (mark - entry) * contract * lots
            jmin = int(np.argmin(pnl))
            jmax = int(np.argmax(pnl))
            minp, maxp = float(pnl[jmin]), float(pnl[jmax])
            mae = minp if minp < 0.0 else 0.0
            mfe = maxp if maxp > 0.0 else 0.0
            mae_price = float(mark[jmin]) if minp < 0.0 else entry
            mfe_price = float(mark[jmax]) if maxp > 0.0 else entry
        else:  # empty window: opened and closed on the same tick
            mae = mfe = 0.0
            mae_price = mfe_price = entry
        balance += gross - fees
        trades.append(
            {
                "trade_id": len(trades),
                "direction": "LONG" if d > 0 else "SHORT",
                "lots": lots,
                "entry_ts": pd.Timestamp(pos_entry_ms, unit="ms"),
                "entry_price": entry,
                "exit_ts": pd.Timestamp(exit_ms, unit="ms"),
                "exit_price": float(price),
                "gross_pnl": float(gross),
                "fees": fees,
                "swap": 0.0,
                "net_pnl": float(gross - fees - 0.0),
                "mae_pnl": mae,
                "mfe_pnl": mfe,
                "mae_price": mae_price,
                "mfe_price": mfe_price,
                "exit_reason": reason,
            }
        )
        segments.append((seg_start, i - 1 if reason != "END" else i, d, entry, seg_bal))
        seg_start = i if reason != "END" else i + 1
        seg_bal = balance
        pos_dir = 0

    def open_at(i: int, entry_ms: int, d: int) -> None:
        nonlocal pos_dir, pos_entry_i, pos_entry_ms, pos_entry_price, seg_start, seg_bal
        price = ask[i] if d > 0 else bid[i]
        if seg_start <= i - 1:
            segments.append((seg_start, i - 1, 0, 0.0, seg_bal))
        seg_start = i
        pos_dir = d
        pos_entry_i = i
        pos_entry_ms = entry_ms
        pos_entry_price = float(price)

    def drain(limit_idx: int) -> None:
        nonlocal last_fill_idx
        while queue:
            due, emit_idx, d, purpose = queue[0]
            fidx = int(np.searchsorted(ts, due, side="left"))
            fidx = max(fidx, emit_idx, last_fill_idx)
            if fidx > limit_idx:
                return
            queue.pop(0)
            last_fill_idx = fidx
            if purpose == "close":
                if pos_dir != 0:
                    close_at(fidx, int(ts[fidx]), "SIGNAL")
            elif pos_dir == 0:
                open_at(fidx, int(ts[fidx]), d)

    for ik, tgt in flips:
        drain(ik - 1)
        delay = rng.randint(lat_min, lat_max) if lat_max > 0 else 0
        due = int(ts[ik]) + delay
        if pos_dir != 0:
            queue.append((due, ik, -pos_dir, "close"))
        if tgt != 0:
            queue.append((due, ik, tgt, "open"))
        drain(ik)
    drain(n - 1)
    if pos_dir != 0 and n > 0:
        close_at(n - 1, int(ts[n - 1]), "END")
    if seg_start <= n - 1:
        segments.append((seg_start, n - 1, 0, 0.0, seg_bal))

    # equity / peak / drawdown over the piecewise-affine segments — same
    # expression order as the loop: unreal = d*(mark-entry)*contract*lots,
    # equity = balance + unreal, peak/dd by running comparison
    peak = start_balance
    max_dd = 0.0
    for s, e, d, entry, bal in segments:
        if e < s:
            continue
        if d != 0:
            mark = (bid if d > 0 else ask)[s : e + 1]
            eq = bal + d * (mark - entry) * contract * lots
        else:
            eq = np.full(e - s + 1, bal)
        run_peak = np.maximum(np.maximum.accumulate(eq), peak)
        dd = float(np.max(run_peak - eq))
        if dd > max_dd:
            max_dd = dd
        peak = float(run_peak[-1])

    wins = sum(1 for tr in trades if tr["net_pnl"] > 0)
    losses = sum(1 for tr in trades if tr["net_pnl"] < 0)
    return pd.DataFrame(
        [
            {
                "scenario_id": sid,
                "ticks_processed": n,
                "ticks_clipped": 0,
                "bars_closed": bars_closed,
                "trades_count": len(trades),
                "orders_rejected": 0,
                "wins": wins,
                "losses": losses,
                "gross_profit": sum(tr["gross_pnl"] for tr in trades if tr["gross_pnl"] > 0),
                "gross_loss": sum(tr["gross_pnl"] for tr in trades if tr["gross_pnl"] < 0),
                "fees": sum(tr["fees"] for tr in trades),
                "swap": 0.0,
                "net_pnl": sum(tr["net_pnl"] for tr in trades),
                "final_equity": balance if n > 0 else start_balance,
                "max_drawdown": max_dd,
                "trades": trades,
                "equity_samples": [],
            }
        ]
    )


def attach_scenarios(ticks: DataFrame, scenarios: DataFrame) -> DataFrame:
    """Range-join ticks to scenarios (J3 scan sharing): every scenario gets
    its slice out of ONE scan. Scenarios are tiny -> broadcast; a tick
    belonging to k scenarios is duplicated k times, exactly the reference's
    per-scenario package copy."""
    cond = ticks["symbol"] == scenarios["symbol"]
    # Guard each bound independently: a scenarios frame may carry only one of
    # start_ts / end_ts.
    if "start_ts" in scenarios.columns:
        cond = cond & (
            scenarios["start_ts"].isNull() | (ticks["timestamp"] >= scenarios["start_ts"])
        )
    if "end_ts" in scenarios.columns:
        cond = cond & (
            scenarios["end_ts"].isNull() | (ticks["timestamp"] < scenarios["end_ts"])
        )
    return ticks.join(F.broadcast(scenarios.drop("broker_type")), cond).drop(
        scenarios["symbol"]
    )


def run_backtest(ticks: DataFrame, scenarios: DataFrame) -> DataFrame:
    """ticks(symbol,timestamp,time_msc[,collected_msc],bid,ask) x scenarios
    (SCENARIO_SCHEMA) -> one result row per scenario (REPLAY_RESULT_SCHEMA).

    Two scale decisions here:
    - Scenario CONFIG travels in a driver-side closure keyed by scenario_id,
      not as columns joined onto every tick: the pre-replay shuffle carries
      only (scenario_id, ts, time_msc, collected_msc, bid, ask), never the
      parameters map duplicated 10^5-10^6 times per scenario.
    - The shuffle is explicitly repartitioned to one partition per scenario:
      the replay stage is Python-CPU-bound, and AQE's bytes-based coalescing
      would merge the (small-in-bytes, expensive-in-CPU) scenario groups
      onto fewer cores. An explicit repartition(n, col) is exempt from AQE
      coalescing. The scenario table is tiny (driver metadata, same as the
      reference's scenario list), so collect() is free."""
    scen_rows = scenarios.collect()
    cfg = {r["scenario_id"]: r.asDict(recursive=True) for r in scen_rows}
    n = max(len(scen_rows), 1)

    slim_cols = ["scenario_id", "symbol"] + [
        c for c in ("start_ts", "end_ts") if c in scenarios.columns
    ]
    slim = scenarios.select(*slim_cols)
    tick_cols = [
        c
        for c in ("timestamp", "time_msc", "collected_msc", "bid", "ask", "tick_seq")
        if c in ticks.columns
    ]
    joined = (
        attach_scenarios(ticks, slim)
        .select("scenario_id", *tick_cols)
        .repartition(n, "scenario_id")
    )

    def replay(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _replay_core(pdf, cfg[key[0]])

    return joined.groupBy("scenario_id").applyInPandas(replay, REPLAY_RESULT_SCHEMA)


def trades_table(results: DataFrame) -> DataFrame:
    """Explode nested trades to a flat TRADE_SCHEMA-shaped table."""
    return results.select("scenario_id", F.explode("trades").alias("t")).select(
        "scenario_id", "t.*"
    )


def equity_table(results: DataFrame) -> DataFrame:
    return results.select("scenario_id", F.explode("equity_samples").alias("e")).select(
        "scenario_id", "e.*"
    )
