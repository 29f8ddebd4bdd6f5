"""Oracle-checked gate entries for the round-4 replay semantics: multi-
position pyramiding, partial close, order-modify/cancel lifecycle with
STOP_LIMIT conversion, and spot dual-balance accounting.

Same contract as the other oracle-checked replay gates (timeseries.py
replay_sma_oracle): zero latency and market-structure-only fills make the
state machine exactly SQL-expressible, so the DuckDB oracle re-derives every
trade record (or per-scenario summary) independently from the same parquet.

Reference semantics pinned here:
- multi-position book + per-position MAE/MFE: portfolio_manager.py
  open_positions / tests/simulation/multi_position/
- partial close (proportional P&L, PARTIAL record, unscaled running
  extrema): portfolio_manager.partial_close_position (:454-520),
  tests/simulation/partial_close/
- modify/cancel lifecycle (scheduled op applies at the NEXT tick past the
  delay, before price triggers): trade_simulator.py Phase 0 (#318),
  modify_limit_order (:724), cancel_limit_order; tests/simulation/
  modify_lifecycle/
- STOP_LIMIT: stop trigger converts to a limit at the stored limit price,
  possibly filling the same tick: trade_simulator.py:161-193
- spot dual-balance: buys spend quote / receive base, equity is portfolio
  value at mid: portfolio_manager.py:334-348,395-407,509-521 and
  tests/simulation/spot_trading/
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ._util import Query, t

_BAR_MS = 3_600_000
_SYMBOLS = ["click", "error", "purchase", "signup", "view"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events")


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        F.col("event_type").alias("symbol"),
        F.col("ts").alias("timestamp"),
        F.unix_millis("ts").alias("time_msc"),
        F.unix_millis("ts").alias("collected_msc"),
        (F.col("value") - 0.005).alias("bid"),
        (F.col("value") + 0.005).alias("ask"),
    )


def _scenarios(spark: SparkSession, rows):
    return spark.createDataFrame(
        rows,
        "scenario_id int, name string, symbol string, max_ticks int, "
        "tick_processing_budget_ms double, latency_seed int, latency_min_ms int, "
        "latency_max_ms int, parameters map<string,string>",
    )


# The shared oracle scaffold: per-symbol tick sequence (deterministic total
# order, the #385-stable sort), closed-bar index, and each closed bar's
# decision tick (= first tick of the next existing bucket). ``extra_ticks``
# lets a query cap ticks (max_ticks semantics).
def _base_sql(tick_cap: int | None = None) -> str:
    cap = f"WHERE rn <= {tick_cap}" if tick_cap else ""
    return f"""
base AS (
  SELECT event_type AS symbol, ts, epoch_ms(ts) AS ms,
         value - 0.005 AS bid, value + 0.005 AS ask
  FROM events
),
allticks AS (
  SELECT symbol, ts, ms, bid, ask, (bid + ask) / 2 AS mid,
         row_number() OVER (PARTITION BY symbol ORDER BY ms, ts, bid, ask) AS rn
  FROM base
),
ticks AS (
  SELECT *, ms // {_BAR_MS} AS bucket FROM allticks {cap}
),
nmax AS (SELECT symbol, max(rn) AS n FROM ticks GROUP BY 1),
buckets AS (
  SELECT symbol, bucket, min(rn) AS first_rn, max(rn) AS last_rn,
         row_number() OVER (PARTITION BY symbol ORDER BY bucket) AS bidx
  FROM ticks
  GROUP BY symbol, bucket
),
bars AS (
  SELECT b.symbol, b.bidx AS bar_idx, tk.mid AS close, nb.first_rn AS decision_rn
  FROM buckets b
  JOIN buckets nb ON nb.symbol = b.symbol AND nb.bidx = b.bidx + 1
  JOIN ticks tk ON tk.symbol = b.symbol AND tk.rn = b.last_rn
)"""


def _sid_case(cfg_base: int, alias: str = "symbol") -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {cfg_base + i + 1}" for i, s in enumerate(_SYMBOLS)
    )
    return f"CASE {alias} {whens} END"


def _sma_dec_sql(tag: str, fast: int, slow: int) -> str:
    """Closed-bar SMA condition (same flavor as the pyramid/scale_out
    strategies: active from bar `slow`, fast-over-slow strictly greater)."""
    return f"""
dec{tag} AS (
  SELECT symbol, bar_idx, decision_rn,
         (bar_idx >= {slow} AND
          avg(close) OVER (PARTITION BY symbol ORDER BY bar_idx
                           ROWS BETWEEN {fast - 1} PRECEDING AND CURRENT ROW)
            > avg(close) OVER (PARTITION BY symbol ORDER BY bar_idx
                               ROWS BETWEEN {slow - 1} PRECEDING AND CURRENT ROW)
         ) AS cond
  FROM bars
)"""


def _island_sql(tag: str) -> str:
    """Maximal runs of consecutive cond-true closed bars."""
    return f"""
isl{tag} AS (
  SELECT symbol, bar_idx, decision_rn,
         bar_idx - row_number() OVER (PARTITION BY symbol ORDER BY bar_idx) AS grp
  FROM dec{tag} WHERE cond
),
islinfo{tag} AS (
  SELECT symbol, grp, min(bar_idx) AS first_bar, max(bar_idx) AS last_bar
  FROM isl{tag} GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# 1. replay_pyramid_oracle — multi-position ladder, full trade-table check
# ---------------------------------------------------------------------------

_PYR_CONFIGS = [(3, 8, 3), (5, 13, 2)]  # (fast, slow, max_positions)


def replay_pyramid_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.replay import run_backtest, trades_table

    ticks = _ticks(spark, sf_dir)
    rows = []
    for ci, (fast, slow, maxpos) in enumerate(_PYR_CONFIGS):
        for si, sym in enumerate(_SYMBOLS):
            sid = ci * len(_SYMBOLS) + si + 1
            params = {
                "strategy": "pyramid",
                "fast": str(fast),
                "slow": str(slow),
                "max_positions": str(maxpos),
                "bar_ms": str(_BAR_MS),
                "equity_sample_every": "0",
            }
            rows.append((sid, f"pyr-{fast}-{slow}-{sym}", sym, None, None, sid, 0, 0, params))
    tr = trades_table(run_backtest(ticks, _scenarios(spark, rows)))
    return tr.select(
        "scenario_id",
        "trade_id",
        "position_id",
        "direction",
        F.round("lots", 6).alias("lots"),
        "close_type",
        "entry_ts",
        F.round("entry_price", 6).alias("entry_price"),
        "exit_ts",
        F.round("exit_price", 6).alias("exit_price"),
        F.round("gross_pnl", 6).alias("gross_pnl"),
        F.round("mae_pnl", 6).alias("mae_pnl"),
        F.round("mfe_pnl", 6).alias("mfe_pnl"),
        F.round("mae_price", 6).alias("mae_price"),
        F.round("mfe_price", 6).alias("mfe_price"),
        "exit_reason",
    )


def _pyr_cfg_sql(ci: int, fast: int, slow: int, maxpos: int) -> str:
    tag = f"_p{ci}"
    return f"""
{_sma_dec_sql(tag, fast, slow).lstrip()},
{_island_sql(tag).lstrip()},
openings{tag} AS (
  SELECT i.symbol, i.decision_rn AS entry_rn, o.last_bar
  FROM isl{tag} i
  JOIN islinfo{tag} o ON o.symbol = i.symbol AND o.grp = i.grp
  WHERE i.bar_idx < o.first_bar + {maxpos}
),
ptr{tag} AS (
  SELECT o.symbol, o.entry_rn,
         coalesce(d.decision_rn, n.n) AS exit_rn,
         coalesce(d.decision_rn - 1, n.n) AS ex_end,
         CASE WHEN d.decision_rn IS NULL THEN 'END' ELSE 'SIGNAL' END AS exit_reason
  FROM openings{tag} o
  JOIN nmax n ON n.symbol = o.symbol
  LEFT JOIN dec{tag} d ON d.symbol = o.symbol AND d.bar_idx = o.last_bar + 1
),
ptrx{tag} AS (
  SELECT p.*, te.ask AS entry_price, te.ms AS entry_ms,
         tx.bid AS exit_price, tx.ms AS exit_ms
  FROM ptr{tag} p
  JOIN ticks te ON te.symbol = p.symbol AND te.rn = p.entry_rn
  JOIN ticks tx ON tx.symbol = p.symbol AND tx.rn = p.exit_rn
),
pex{tag} AS (
  SELECT x.symbol, x.entry_rn, tk.rn, tk.bid AS mark,
         tk.bid - x.entry_price AS pnl
  FROM ptrx{tag} x
  JOIN ticks tk ON tk.symbol = x.symbol AND tk.rn BETWEEN x.entry_rn AND x.ex_end
),
pexagg{tag} AS (
  SELECT symbol, entry_rn, min(pnl) AS minp, max(pnl) AS maxp,
         max(CASE WHEN rmin = 1 THEN mark END) AS min_mark,
         max(CASE WHEN rmax = 1 THEN mark END) AS max_mark
  FROM (
    SELECT *,
           row_number() OVER (PARTITION BY symbol, entry_rn ORDER BY pnl ASC, rn ASC) AS rmin,
           row_number() OVER (PARTITION BY symbol, entry_rn ORDER BY pnl DESC, rn ASC) AS rmax
    FROM pex{tag}
  )
  GROUP BY 1, 2
),
pout{tag} AS (
  SELECT {_sid_case(ci * len(_SYMBOLS), "x.symbol")} AS scenario_id,
         CAST(row_number() OVER (PARTITION BY x.symbol ORDER BY x.exit_rn, x.entry_rn) - 1
              AS INTEGER) AS trade_id,
         CAST(row_number() OVER (PARTITION BY x.symbol ORDER BY x.entry_rn) - 1
              AS INTEGER) AS position_id,
         'LONG' AS direction,
         round(1.0, 6) AS lots,
         'FULL' AS close_type,
         make_timestamp(x.entry_ms * 1000) AS entry_ts,
         round(x.entry_price, 6) AS entry_price,
         make_timestamp(x.exit_ms * 1000) AS exit_ts,
         round(x.exit_price, 6) AS exit_price,
         round(x.exit_price - x.entry_price, 6) AS gross_pnl,
         round(least(0, e.minp), 6) AS mae_pnl,
         round(greatest(0, e.maxp), 6) AS mfe_pnl,
         round(CASE WHEN e.minp < 0 THEN e.min_mark ELSE x.entry_price END, 6) AS mae_price,
         round(CASE WHEN e.maxp > 0 THEN e.max_mark ELSE x.entry_price END, 6) AS mfe_price,
         x.exit_reason
  FROM ptrx{tag} x
  JOIN pexagg{tag} e ON e.symbol = x.symbol AND e.entry_rn = x.entry_rn
)"""


def _pyr_sql() -> str:
    blocks = ",\n".join(
        _pyr_cfg_sql(ci, fast, slow, maxpos)
        for ci, (fast, slow, maxpos) in enumerate(_PYR_CONFIGS)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM pout_p{ci}" for ci in range(len(_PYR_CONFIGS))
    )
    return f"WITH {_base_sql().lstrip()},\n{blocks}\n{union}"


REPLAY_PYRAMID_ORACLE_SQL = _pyr_sql()


# ---------------------------------------------------------------------------
# 2. replay_scaleout_oracle — partial close, full trade-table check
# ---------------------------------------------------------------------------

_SCO_CONFIGS = [(3, 8, 4), (5, 13, 6)]  # (fast, slow, hold_bars); fraction 0.5


def replay_scaleout_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.replay import run_backtest, trades_table

    ticks = _ticks(spark, sf_dir)
    rows = []
    for ci, (fast, slow, hold) in enumerate(_SCO_CONFIGS):
        for si, sym in enumerate(_SYMBOLS):
            sid = ci * len(_SYMBOLS) + si + 1
            params = {
                "strategy": "scale_out",
                "fast": str(fast),
                "slow": str(slow),
                "fraction": "0.5",
                "hold_bars": str(hold),
                "bar_ms": str(_BAR_MS),
                "equity_sample_every": "0",
            }
            rows.append((sid, f"sco-{fast}-{slow}-{sym}", sym, None, None, sid, 0, 0, params))
    tr = trades_table(run_backtest(ticks, _scenarios(spark, rows)))
    return tr.select(
        "scenario_id",
        "trade_id",
        "position_id",
        "direction",
        F.round("lots", 6).alias("lots"),
        "close_type",
        "entry_ts",
        F.round("entry_price", 6).alias("entry_price"),
        "exit_ts",
        F.round("exit_price", 6).alias("exit_price"),
        F.round("gross_pnl", 6).alias("gross_pnl"),
        F.round("mae_pnl", 6).alias("mae_pnl"),
        F.round("mfe_pnl", 6).alias("mfe_pnl"),
        "exit_reason",
    )


def _sco_cfg_sql(ci: int, fast: int, slow: int, hold: int) -> str:
    tag = f"_s{ci}"
    # One position per island; entry at the island's first bar. A partial
    # close of 0.5 lots fires at the decision tick of bar first_bar+hold IF
    # the island reaches it; remainder closes at the first false bar
    # (SIGNAL) or data end (END). Running-extremum pnl uses full lots before
    # the partial tick and the remaining 0.5 from the partial tick ON (the
    # excursion update runs after the drain on the partial tick).
    return f"""
{_sma_dec_sql(tag, fast, slow).lstrip()},
{_island_sql(tag).lstrip()},
pos{tag} AS (
  SELECT o.symbol, o.grp, o.first_bar, o.last_bar,
         d.decision_rn AS entry_rn,
         CASE WHEN o.last_bar >= o.first_bar + {hold} THEN dp.decision_rn END AS p_rn,
         coalesce(dx.decision_rn, n.n) AS exit_rn,
         coalesce(dx.decision_rn - 1, n.n) AS ex_end,
         CASE WHEN dx.decision_rn IS NULL THEN 'END' ELSE 'SIGNAL' END AS exit_reason
  FROM islinfo{tag} o
  JOIN dec{tag} d ON d.symbol = o.symbol AND d.bar_idx = o.first_bar
  LEFT JOIN dec{tag} dp ON dp.symbol = o.symbol AND dp.bar_idx = o.first_bar + {hold}
  LEFT JOIN dec{tag} dx ON dx.symbol = o.symbol AND dx.bar_idx = o.last_bar + 1
  JOIN nmax n ON n.symbol = o.symbol
),
posx{tag} AS (
  SELECT p.*, te.ask AS entry_price, te.ms AS entry_ms
  FROM pos{tag} p
  JOIN ticks te ON te.symbol = p.symbol AND te.rn = p.entry_rn
),
sex{tag} AS (
  SELECT x.symbol, x.entry_rn, tk.rn, tk.bid AS mark,
         (tk.bid - x.entry_price)
           * (CASE WHEN x.p_rn IS NOT NULL AND tk.rn >= x.p_rn THEN 0.5 ELSE 1.0 END) AS pnl
  FROM posx{tag} x
  JOIN ticks tk ON tk.symbol = x.symbol AND tk.rn BETWEEN x.entry_rn AND x.ex_end
),
-- running extrema snapshots: at the partial tick (window [entry, p_rn-1])
-- and at the final close (window [entry, ex_end])
sexagg{tag} AS (
  SELECT s.symbol, s.entry_rn, upto,
         min(s.pnl) AS minp, max(s.pnl) AS maxp,
         max(CASE WHEN rmin = 1 THEN mark END) AS min_mark,
         max(CASE WHEN rmax = 1 THEN mark END) AS max_mark
  FROM (
    SELECT w.symbol, w.entry_rn, w.upto, s0.rn, s0.mark, s0.pnl,
           row_number() OVER (PARTITION BY w.symbol, w.entry_rn, w.upto
                              ORDER BY s0.pnl ASC, s0.rn ASC) AS rmin,
           row_number() OVER (PARTITION BY w.symbol, w.entry_rn, w.upto
                              ORDER BY s0.pnl DESC, s0.rn ASC) AS rmax
    FROM (
      SELECT symbol, entry_rn, p_rn - 1 AS upto FROM posx{tag} WHERE p_rn IS NOT NULL
      UNION ALL
      SELECT symbol, entry_rn, ex_end AS upto FROM posx{tag}
    ) w
    JOIN sex{tag} s0 ON s0.symbol = w.symbol AND s0.entry_rn = w.entry_rn
                     AND s0.rn <= w.upto
  ) s
  GROUP BY 1, 2, 3
),
recs{tag} AS (
  -- PARTIAL record (0.5 lots at p_rn)
  SELECT x.symbol, x.entry_rn, x.p_rn AS close_rn, 0.5 AS lots, 'PARTIAL' AS close_type,
         'SIGNAL' AS exit_reason2, x.entry_price, x.entry_ms
  FROM posx{tag} x WHERE x.p_rn IS NOT NULL
  UNION ALL
  -- FULL remainder (0.5 if a partial happened, else 1.0)
  SELECT x.symbol, x.entry_rn, x.exit_rn AS close_rn,
         CASE WHEN x.p_rn IS NOT NULL THEN 0.5 ELSE 1.0 END AS lots,
         'FULL' AS close_type, x.exit_reason AS exit_reason2, x.entry_price, x.entry_ms
  FROM posx{tag} x
),
sout{tag} AS (
  SELECT {_sid_case(ci * len(_SYMBOLS), "r.symbol")} AS scenario_id,
         CAST(row_number() OVER (PARTITION BY r.symbol ORDER BY r.close_rn, r.entry_rn,
                                 CASE r.close_type WHEN 'PARTIAL' THEN 0 ELSE 1 END) - 1
              AS INTEGER) AS trade_id,
         CAST(dense_rank() OVER (PARTITION BY r.symbol ORDER BY r.entry_rn) - 1
              AS INTEGER) AS position_id,
         'LONG' AS direction,
         round(r.lots, 6) AS lots,
         r.close_type,
         make_timestamp(r.entry_ms * 1000) AS entry_ts,
         round(r.entry_price, 6) AS entry_price,
         make_timestamp(tx.ms * 1000) AS exit_ts,
         round(tx.bid, 6) AS exit_price,
         round((tx.bid - r.entry_price) * r.lots, 6) AS gross_pnl,
         round(least(0, e.minp), 6) AS mae_pnl,
         round(greatest(0, e.maxp), 6) AS mfe_pnl,
         r.exit_reason2 AS exit_reason
  FROM recs{tag} r
  JOIN ticks tx ON tx.symbol = r.symbol AND tx.rn = r.close_rn
  JOIN sexagg{tag} e ON e.symbol = r.symbol AND e.entry_rn = r.entry_rn
                     AND e.upto = r.close_rn - CASE r.close_type WHEN 'PARTIAL' THEN 1 ELSE 0 END
                     - CASE WHEN r.close_type = 'FULL' AND r.exit_reason2 = 'SIGNAL' THEN 1 ELSE 0 END
)"""


def _sco_sql() -> str:
    blocks = ",\n".join(
        _sco_cfg_sql(ci, fast, slow, hold)
        for ci, (fast, slow, hold) in enumerate(_SCO_CONFIGS)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM sout_s{ci}" for ci in range(len(_SCO_CONFIGS))
    )
    return f"WITH {_base_sql().lstrip()},\n{blocks}\n{union}"


REPLAY_SCALEOUT_ORACLE_SQL = _sco_sql()


# ---------------------------------------------------------------------------
# 3. replay_modify_oracle — modify/cancel lifecycle + STOP_LIMIT, summary
# ---------------------------------------------------------------------------

# (tag, entry_type, entry_offset, limit_offset, modify_after, modify_delta,
#  cancel_after): buy_hold places ONE entry order at the first closed bar and
# never cancels it by signal, isolating the lifecycle under test.
_MOD_CONFIGS = [
    ("moda", "limit", 10.0, 0.0, 3, 10.5, None),  # modify pulls limit above market
    ("modb", "limit", 10.0, 0.0, None, 0.0, 3),  # cancel before any fill
    ("modc", "stop_limit", 0.5, 1.0, None, 0.0, None),  # convert, wait for pullback
    ("modd", "stop_limit", 0.5, -1.0, None, 0.0, None),  # convert, same-tick fill path
]


def replay_modify_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.replay import run_backtest

    ticks = _ticks(spark, sf_dir)
    rows = []
    for ci, (tagname, etype, off, loff, mab, mdelta, cab) in enumerate(_MOD_CONFIGS):
        for si, sym in enumerate(_SYMBOLS):
            sid = ci * len(_SYMBOLS) + si + 1
            params = {
                "strategy": "buy_hold",
                "bar_ms": str(_BAR_MS),
                "equity_sample_every": "0",
                "entry_type": etype,
                "entry_offset": str(off),
                "limit_offset": str(loff),
            }
            if mab is not None:
                params["modify_after_bars"] = str(mab)
                params["modify_delta"] = str(mdelta)
            if cab is not None:
                params["cancel_after_bars"] = str(cab)
            rows.append((sid, f"{tagname}-{sym}", sym, None, None, sid, 0, 0, params))
    res = run_backtest(ticks, _scenarios(spark, rows))
    return res.select(
        "scenario_id",
        "trades_count",
        "orders_rejected",
        "orders_cancelled",
        F.round("net_pnl", 6).alias("net_pnl"),
        F.round("final_equity", 6).alias("final_equity"),
    )


def _mod_cfg_sql(ci: int, etype: str, off: float, loff: float, mab, mdelta, cab) -> str:
    tag = f"_m{ci}"
    # d1 = the decision tick of the first closed bar (buy_hold emits its one
    # LONG entry there, zero latency -> rests the same tick).
    d1 = f"""
d1{tag} AS (
  SELECT symbol, decision_rn AS d1_rn FROM bars WHERE bar_idx = 1
),
ord{tag} AS (
  SELECT d.symbol, d.d1_rn, te.ask AS a1, te.ms AS d1_ms
  FROM d1{tag} d JOIN ticks te ON te.symbol = d.symbol AND te.rn = d.d1_rn
)"""
    if etype == "limit":
        # trig0 = a1 - off; lifecycle op scheduled at the close of bar 1+N
        # (bars_rested reaches N there), applied at the first tick with
        # ms > that decision tick's ms.
        nbars = mab if mab is not None else cab
        op_sched = f"""
sched{tag} AS (
  SELECT o.symbol, o.d1_rn, o.a1, b.decision_rn AS sched_rn, ts.ms AS sched_ms
  FROM ord{tag} o
  LEFT JOIN bars b ON b.symbol = o.symbol AND b.bar_idx = 1 + {nbars}
  LEFT JOIN ticks ts ON ts.symbol = b.symbol AND ts.rn = b.decision_rn
),
apply{tag} AS (
  SELECT s.symbol, s.d1_rn, s.a1, s.sched_ms,
         (SELECT min(tk.rn) FROM ticks tk
          WHERE tk.symbol = s.symbol AND tk.ms > s.sched_ms) AS apply_rn
  FROM sched{tag} s
)"""
        if mab is not None:
            fill = f"""
fill{tag} AS (
  SELECT a.symbol,
         (SELECT min(tk.rn) FROM ticks tk
          WHERE tk.symbol = a.symbol AND tk.rn >= a.d1_rn
            AND ((a.apply_rn IS NOT NULL AND tk.rn >= a.apply_rn
                  AND tk.ask <= a.a1 - {off} + {mdelta})
                 OR ((a.apply_rn IS NULL OR tk.rn < a.apply_rn)
                     AND tk.ask <= a.a1 - {off}))) AS fill_rn,
         a.a1, a.apply_rn
  FROM apply{tag} a
),
fpx{tag} AS (
  SELECT f.symbol, f.fill_rn,
         CASE WHEN f.fill_rn IS NULL THEN NULL
              WHEN f.apply_rn IS NOT NULL AND f.fill_rn >= f.apply_rn
                THEN f.a1 - {off} + {mdelta}
              ELSE f.a1 - {off} END AS fill_price
  FROM fill{tag} f
)"""
        else:  # cancel config: only the pre-cancel window can fill
            fill = f"""
fill{tag} AS (
  SELECT a.symbol,
         (SELECT min(tk.rn) FROM ticks tk
          WHERE tk.symbol = a.symbol AND tk.rn >= a.d1_rn
            AND (a.apply_rn IS NULL OR tk.rn < a.apply_rn)
            AND tk.ask <= a.a1 - {off}) AS fill_rn,
         a.a1, a.apply_rn
  FROM apply{tag} a
),
fpx{tag} AS (
  SELECT f.symbol, f.fill_rn,
         CASE WHEN f.fill_rn IS NULL THEN NULL ELSE f.a1 - {off} END AS fill_price
  FROM fill{tag} f
)"""
        chain = f"{d1},\n{op_sched},\n{fill}"
    else:  # stop_limit: trig = a1 + off, limit = trig - loff
        chain = f"""{d1},
conv{tag} AS (
  SELECT o.symbol, o.d1_rn, o.a1,
         (SELECT min(tk.rn) FROM ticks tk
          WHERE tk.symbol = o.symbol AND tk.rn >= o.d1_rn
            AND tk.ask >= o.a1 + {off}) AS conv_rn
  FROM ord{tag} o
),
fill{tag} AS (
  SELECT c.symbol, c.a1,
         (SELECT min(tk.rn) FROM ticks tk
          WHERE tk.symbol = c.symbol AND tk.rn >= c.conv_rn
            AND tk.ask <= c.a1 + {off} - {loff}) AS fill_rn
  FROM conv{tag} c
  WHERE c.conv_rn IS NOT NULL
),
fpx{tag} AS (
  SELECT f.symbol, f.fill_rn,
         CASE WHEN f.fill_rn IS NULL THEN NULL
              ELSE f.a1 + {off} - {loff} END AS fill_price
  FROM fill{tag} f
)"""
    if cab is not None:
        # the cancel op counts once it APPLIES (a tick past the delay
        # exists) and the order had not filled first; END expiry of a
        # never-cancelled order is not a cancel (core parity)
        cancelled_expr = (
            "CASE WHEN fp.fill_rn IS NULL AND ap.apply_rn IS NOT NULL "
            "THEN 1 ELSE 0 END"
        )
        apply_join = f"LEFT JOIN apply{tag} ap ON ap.symbol = o.symbol"
    else:
        cancelled_expr = "0"
        apply_join = ""
    return f"""{chain},
mout{tag} AS (
  SELECT {_sid_case(ci * len(_SYMBOLS), "o.symbol")} AS scenario_id,
         CAST(CASE WHEN fp.fill_rn IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS trades_count,
         CAST(0 AS INTEGER) AS orders_rejected,
         CAST({cancelled_expr} AS INTEGER) AS orders_cancelled,
         round(coalesce(CASE WHEN fp.fill_rn IS NOT NULL
                             THEN tn.bid - fp.fill_price END, 0.0), 6) AS net_pnl,
         round(10000.0 + coalesce(CASE WHEN fp.fill_rn IS NOT NULL
                                       THEN tn.bid - fp.fill_price END, 0.0), 6) AS final_equity
  FROM ord{tag} o
  LEFT JOIN fpx{tag} fp ON fp.symbol = o.symbol
  {apply_join}
  JOIN nmax n ON n.symbol = o.symbol
  JOIN ticks tn ON tn.symbol = o.symbol AND tn.rn = n.n
)"""


def _mod_sql() -> str:
    blocks = ",\n".join(
        _mod_cfg_sql(ci, etype, off, loff, mab, mdelta, cab)
        for ci, (_, etype, off, loff, mab, mdelta, cab) in enumerate(_MOD_CONFIGS)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM mout_m{ci}" for ci in range(len(_MOD_CONFIGS))
    )
    return f"WITH {_base_sql().lstrip()},\n{blocks}\n{union}"


REPLAY_MODIFY_ORACLE_SQL = _mod_sql()


# ---------------------------------------------------------------------------
# 4. replay_spot_oracle — dual-balance walk, per-scenario summary
# ---------------------------------------------------------------------------

_SPOT_MAX_TICKS = 400
_SPOT_START = 100_000.0
_SPOT_BASE = 10.0
_SPOT_LOTS = 2.0
_SPOT_FEE = 0.1  # per side per lot


def replay_spot_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.replay import run_backtest

    ticks = _ticks(spark, sf_dir)
    rows = []
    for si, sym in enumerate(_SYMBOLS):
        sid = si + 1
        params = {
            "strategy": "sma_cross",
            "fast": "3",
            "slow": "8",
            "bar_ms": str(_BAR_MS),
            "equity_sample_every": "0",
            "spot_mode": "1",
            "start_balance": str(_SPOT_START),
            "base_start": str(_SPOT_BASE),
            "lots": str(_SPOT_LOTS),
            "fee_per_side": str(_SPOT_FEE),
        }
        rows.append((sid, f"spot-{sym}", sym, _SPOT_MAX_TICKS, None, sid, 0, 0, params))
    res = run_backtest(ticks, _scenarios(spark, rows))
    return res.select(
        "scenario_id",
        "trades_count",
        "orders_rejected",
        "wins",
        "losses",
        F.round("net_pnl", 6).alias("net_pnl"),
        F.round("final_equity", 6).alias("final_equity"),
    )


def _spot_sql() -> str:
    fast, slow = 3, 8
    fee_per_trade = 2 * _SPOT_FEE * _SPOT_LOTS  # entry + exit side
    return f"""
WITH {_base_sql(_SPOT_MAX_TICKS).lstrip()},
dec_sp AS (
  SELECT symbol, bar_idx, decision_rn,
         CASE WHEN bar_idx < {slow} THEN 0
              WHEN avg(close) OVER (PARTITION BY symbol ORDER BY bar_idx
                                    ROWS BETWEEN {fast - 1} PRECEDING AND CURRENT ROW)
                 > avg(close) OVER (PARTITION BY symbol ORDER BY bar_idx
                                    ROWS BETWEEN {slow - 1} PRECEDING AND CURRENT ROW)
              THEN 1 ELSE -1 END AS target
  FROM bars
),
flips_sp AS (
  SELECT symbol, entry_rn, dir
  FROM (
    SELECT symbol, decision_rn AS entry_rn, target AS dir,
           lag(target, 1, 0) OVER (PARTITION BY symbol ORDER BY bar_idx) AS prev
    FROM dec_sp
  )
  WHERE dir <> prev
),
trades_sp AS (
  SELECT f.symbol, f.dir, f.entry_rn,
         coalesce(lead(f.entry_rn) OVER (PARTITION BY f.symbol ORDER BY f.entry_rn), n.n)
           AS exit_rn
  FROM flips_sp f
  JOIN nmax n USING (symbol)
),
tr_sp AS (
  SELECT t.symbol, t.dir,
         CASE WHEN t.dir = 1 THEN te.ask ELSE te.bid END AS entry_price,
         CASE WHEN t.dir = 1 THEN tx.bid ELSE tx.ask END AS exit_price
  FROM trades_sp t
  JOIN ticks te ON te.symbol = t.symbol AND te.rn = t.entry_rn
  JOIN ticks tx ON tx.symbol = t.symbol AND tx.rn = t.exit_rn
),
pertrade_sp AS (
  SELECT symbol, dir, entry_price, exit_price,
         dir * (exit_price - entry_price) * {_SPOT_LOTS} AS gross,
         dir * (exit_price - entry_price) * {_SPOT_LOTS} - {fee_per_trade} AS net,
         -- quote-balance delta of the full open+close round trip
         CASE WHEN dir = 1
              THEN -({_SPOT_LOTS} * entry_price + {_SPOT_FEE * _SPOT_LOTS})
                   + ({_SPOT_LOTS} * exit_price - {_SPOT_FEE * _SPOT_LOTS})
              ELSE  ({_SPOT_LOTS} * entry_price - {_SPOT_FEE * _SPOT_LOTS})
                   - ({_SPOT_LOTS} * exit_price + {_SPOT_FEE * _SPOT_LOTS})
         END AS quote_delta
  FROM tr_sp
),
lastmid_sp AS (
  SELECT tk.symbol, tk.mid FROM ticks tk JOIN nmax n
    ON n.symbol = tk.symbol AND tk.rn = n.n
)
SELECT {_sid_case(0, "p.symbol")} AS scenario_id,
       CAST(count(*) AS INTEGER) AS trades_count,
       CAST(0 AS INTEGER) AS orders_rejected,
       CAST(sum(CASE WHEN p.net > 0 THEN 1 ELSE 0 END) AS INTEGER) AS wins,
       CAST(sum(CASE WHEN p.net < 0 THEN 1 ELSE 0 END) AS INTEGER) AS losses,
       round(sum(p.net), 6) AS net_pnl,
       round({_SPOT_START} + sum(p.quote_delta) + {_SPOT_BASE} * any_value(lm.mid), 6)
         AS final_equity
FROM pertrade_sp p
JOIN lastmid_sp lm ON lm.symbol = p.symbol
GROUP BY p.symbol
"""


REPLAY_SPOT_ORACLE_SQL = _spot_sql()


# ---------------------------------------------------------------------------
# 5. replay_trendchannel — the production-complexity decision logic, proving
#    the plugin surface at the reference's real strategy depth
#    (decision_logic/core/trend_channel_reference.py, 844 LoC). Rows-only:
#    the full order surface (resting entries with attached SL/TP, trailing
#    modifies, R-rung partial closes, cancel/re-price lifecycle) is not
#    SQL-expressible; determinism is pinned by pytest (same seed => same
#    trades) and every building block it drives has its own oracle gate.
# ---------------------------------------------------------------------------


def replay_trendchannel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.replay import run_backtest

    ticks = _ticks(spark, sf_dir)
    rows = []
    sid = 0
    for mode in ("limit_pullback", "stop_breakout"):
        for sym in _SYMBOLS:
            sid += 1
            params = {
                "strategy": "trend_channel",
                "entry_mode": mode,
                "bar_ms": str(_BAR_MS),
                "boll_period": "12",
                "gate_every_bars": "4",
                "gate_ma_period": "8",
                "max_positions": "2",
                "equity_sample_every": "0",
            }
            rows.append((sid, f"tc-{mode}-{sym}", sym, None, None, sid, 50, 2000, params))
    res = run_backtest(ticks, _scenarios(spark, rows))
    return res.select(
        "scenario_id",
        "ticks_processed",
        "bars_closed",
        "trades_count",
        "orders_rejected",
        "wins",
        "losses",
        F.round("net_pnl", 6).alias("net_pnl"),
        F.round("final_equity", 6).alias("final_equity"),
        F.round("max_drawdown", 6).alias("max_drawdown"),
    )


def bus_decode_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-bus ingress (round 11; SURVEY §2.9 production ingress): the
    gate ticks serialized onto the Kafka WIRE SHAPE (key/value binary +
    topic/partition/offset/timestamp — ``encode_bus_ticks``) and decoded
    back through ``decode_bus_ticks`` (``from_json`` + casts, the exact
    chain a readStream.format('kafka') source feeds), then aggregated per
    symbol. The oracle computes the same aggregates straight from events:
    a hash match proves the decoder inverts the producer wire exactly —
    types, epoch-ms clocks, and values — with zero Python in the path."""
    from ..streaming.bus import decode_bus_ticks as _dec
    from ..streaming.bus import encode_bus_ticks as _enc

    def _r4(col):  # deterministic cross-engine half-up rounding
        return F.floor(col * F.lit(10000.0) + 0.5) / F.lit(10000.0)

    ticks = _ticks(spark, sf_dir).select("symbol", "time_msc", "bid", "ask")
    out = _dec(_enc(ticks))
    return out.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.min("time_msc").alias("first_ms"),
        F.max("time_msc").alias("last_ms"),
        _r4(F.sum(F.col("bid").cast("decimal(28,6)")).cast("double")).alias(
            "bid_sum"
        ),
        _r4(F.sum(F.col("ask").cast("decimal(28,6)")).cast("double")).alias(
            "ask_sum"
        ),
        # the bus append stamp must round-trip into collected_msc verbatim
        # (the encoder stamps event time, so any skew is a decode bug)
        F.sum(F.col("collected_msc") - F.col("time_msc")).alias("clock_skew"),
    )


def bus_decode_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 signal path over the message bus (VERDICT r11 #7 — previously
    pytest-only): deterministic signals (every event with event_id%10==3,
    deduped to one per (symbol, ms)) are serialized onto the Kafka wire by
    ``encode_bus_signals``, decoded back by ``decode_bus_signals``, and
    driven through the engine's as-of projection against the tick feed —
    the exact consumption shape of the live signal worker. The oracle
    recomputes the signals straight from events and uses DuckDB's native
    ASOF JOIN; both sides compare epoch-ms longs (the wire's clock), so a
    hash match proves the signal decode inverts the producer exactly AND
    survives the downstream join semantics."""
    from ..operators.asof import asof_join
    from ..streaming.bus import decode_bus_signals as _dec
    from ..streaming.bus import encode_bus_signals as _enc

    ev = _events(spark, sf_dir)
    sigs = (
        ev.where(F.col("event_id") % 10 == 3)
        .groupBy(
            F.col("event_type").alias("symbol"),
            F.timestamp_millis(F.unix_millis("ts")).alias("sig_ts"),
        )
        .agg(F.max("value").alias("score"))
    )
    dec = _dec(_enc(sigs)).select(
        "symbol", F.unix_millis("sig_ts").alias("sig_ms"), "score"
    )
    ticks = _ticks(spark, sf_dir).select("symbol", "time_msc", "bid")
    j = asof_join(
        ticks, dec, on=["symbol"], left_ts="time_msc", right_ts="sig_ms"
    )
    return j.select(
        "symbol",
        "time_msc",
        F.round("bid", 6).alias("bid"),
        "sig_ms",
        F.round("score", 6).alias("score"),
    )


BUS_DECODE_SIGNALS_SQL = """
WITH sigs AS (
  SELECT event_type AS symbol, epoch_ms(ts) AS sig_ms, max(value) AS score
  FROM events WHERE event_id % 10 = 3
  GROUP BY 1, 2
),
ticks AS (
  SELECT event_type AS symbol, epoch_ms(ts) AS time_msc, value - 0.005 AS bid
  FROM events
)
SELECT t.symbol, t.time_msc, round(t.bid, 6) AS bid,
       s.sig_ms, round(s.score, 6) AS score
FROM ticks t
ASOF JOIN sigs s ON t.symbol = s.symbol AND t.time_msc >= s.sig_ms
"""


BUS_DECODE_TICKS_SQL = """
SELECT event_type AS symbol,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(min(epoch_ms(ts)) AS BIGINT) AS first_ms,
       CAST(max(epoch_ms(ts)) AS BIGINT) AS last_ms,
       floor(CAST(sum(CAST(value - 0.005 AS DECIMAL(28,6))) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS bid_sum,
       floor(CAST(sum(CAST(value + 0.005 AS DECIMAL(28,6))) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS ask_sum,
       CAST(0 AS BIGINT) AS clock_skew
FROM events
GROUP BY 1
"""


QUERIES: dict[str, Query] = {
    "bus_decode_ticks": Query(
        bus_decode_ticks,
        BUS_DECODE_TICKS_SQL,
        "Kafka-wire encode/decode round trip aggregated per symbol",
    ),
    "bus_decode_signals": Query(
        bus_decode_signals,
        BUS_DECODE_SIGNALS_SQL,
        "W7 signal decode over the bus, driven through the as-of projection",
    ),
    "replay_pyramid_oracle": Query(
        replay_pyramid_oracle,
        REPLAY_PYRAMID_ORACLE_SQL,
        "multi-position pyramiding replay, full trade table vs oracle",
    ),
    "replay_scaleout_oracle": Query(
        replay_scaleout_oracle,
        REPLAY_SCALEOUT_ORACLE_SQL,
        "partial-close replay, PARTIAL/FULL trade records vs oracle",
    ),
    "replay_modify_oracle": Query(
        replay_modify_oracle,
        REPLAY_MODIFY_ORACLE_SQL,
        "order modify/cancel lifecycle + STOP_LIMIT conversion vs oracle",
    ),
    "replay_spot_oracle": Query(
        replay_spot_oracle,
        REPLAY_SPOT_ORACLE_SQL,
        "spot dual-balance accounting replay vs oracle",
    ),
    "replay_trendchannel": Query(
        replay_trendchannel,
        None,
        "trend-channel production decision logic (rows-only, pytest-pinned)",
    ),
}
