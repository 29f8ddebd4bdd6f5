"""Extreme directional move scan (SURVEY §2.5 W10).

Reference: for window sizes [200,500,1000,2000] bars with stride = size/4,
anchor at each stride step and measure entry = open[start], max(high) /
min(low) over the forward window, window ATR = mean ATR over the window;
a candidate is a move >= 3.0 ATR with adverse excursion <= 1.5 ATR
(extreme_move_scanner.py:145-296); overlapping candidates are deduplicated
keeping the strongest (:361-389).

Spark-first: each window size is one pass of forward-frame window functions
(`rowsBetween(0, size-1)`) + a stride filter on row_number — no sliding
Python loop. Dedup is a strength-ranked self-anti-join on time overlap.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _atr_mult(move: F.Column) -> F.Column:
    """move / window ATR, null on a zero-ATR (flat) window — ANSI mode
    (Spark 4 default) would otherwise raise DIVIDE_BY_ZERO; a null multiple
    fails every >= threshold downstream, so flat windows drop out."""
    return F.when(F.col("window_atr") > 0, move / F.col("window_atr"))


def extreme_move_candidates(
    bars: DataFrame,
    window_sizes: Sequence[int] = (200, 500, 1000, 2000),
    min_atr_multiple: float = 3.0,
    max_adverse_atr: float = 1.5,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    atr: str = "atr",
) -> DataFrame:
    """Candidate extreme moves for every window size, both directions."""
    w = Window.partitionBy(key).orderBy(ts)
    base = bars.select(
        F.col(key).alias("key"),
        F.col(ts).alias("start_time"),
        "open",
        "high",
        "low",
        "close",
        F.col(atr).alias("__atr"),
        F.col("tick_count"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("__total"),
    )
    outs = []
    for size in window_sizes:
        stride = max(1, size // 4)
        fw = Window.partitionBy("key").orderBy("start_time").rowsBetween(0, size - 1)
        cand = (
            base.withColumn("window_high", F.max("high").over(fw))
            .withColumn("window_low", F.min("low").over(fw))
            .withColumn("window_atr", F.avg("__atr").over(fw))
            .withColumn("end_time", F.max(F.col("start_time")).over(fw))
            .withColumn("exit_close", F.last("close").over(fw))
            .withColumn("window_ticks", F.sum("tick_count").over(fw))
            .where(
                ((F.col("__rn") - 1) % stride == 0)
                & (F.col("__rn") + size - 1 <= F.col("__total"))
                & (F.col("window_atr") > 0)
            )
            .withColumn("bar_count", F.lit(size))
        )
        up = cand.select(
            "key",
            F.lit("LONG").alias("direction"),
            "start_time",
            "end_time",
            "bar_count",
            F.col("open").alias("entry_price"),
            F.col("window_high").alias("extreme_price"),
            F.col("exit_close").alias("exit_price"),
            _atr_mult(F.col("window_high") - F.col("open")).alias(
                "move_atr_multiple"
            ),
            _atr_mult(F.col("open") - F.col("window_low")).alias(
                "adverse_atr_multiple"
            ),
            "window_atr",
            F.col("window_ticks").alias("tick_count"),
        )
        down = cand.select(
            "key",
            F.lit("SHORT").alias("direction"),
            "start_time",
            "end_time",
            "bar_count",
            F.col("open").alias("entry_price"),
            F.col("window_low").alias("extreme_price"),
            F.col("exit_close").alias("exit_price"),
            _atr_mult(F.col("open") - F.col("window_low")).alias(
                "move_atr_multiple"
            ),
            _atr_mult(F.col("window_high") - F.col("open")).alias(
                "adverse_atr_multiple"
            ),
            "window_atr",
            F.col("window_ticks").alias("tick_count"),
        )
        outs.append(up.unionByName(down))
    all_cands = outs[0]
    for o in outs[1:]:
        all_cands = all_cands.unionByName(o)
    return all_cands.where(
        (F.col("move_atr_multiple") >= min_atr_multiple)
        & (F.col("adverse_atr_multiple") <= max_adverse_atr)
    )


def deduplicate_overlaps(cands: DataFrame, overlap_frac: float = 0.5) -> DataFrame:
    """Keep the strongest move per overlapping cluster: a candidate is dropped
    when a strictly stronger candidate (same key+direction) overlaps more than
    ``overlap_frac`` of its time span (extreme_move_scanner.py:361-389).

    Range self-join — Spark handles it as a broadcast-able theta join per
    (key, direction) group; candidate sets are tiny relative to bars, so this
    never dominates the plan.
    """
    a, b = cands.alias("a"), cands.alias("b")
    dur_a = F.unix_millis(F.col("a.end_time")) - F.unix_millis(F.col("a.start_time"))
    ov = F.least(
        F.unix_millis(F.col("a.end_time")), F.unix_millis(F.col("b.end_time"))
    ) - F.greatest(F.unix_millis(F.col("a.start_time")), F.unix_millis(F.col("b.start_time")))
    stronger = (F.col("b.move_atr_multiple") > F.col("a.move_atr_multiple")) | (
        (F.col("b.move_atr_multiple") == F.col("a.move_atr_multiple"))
        & (F.col("b.start_time") < F.col("a.start_time"))
    )
    cond = (
        (F.col("a.key") == F.col("b.key"))
        & (F.col("a.direction") == F.col("b.direction"))
        & (F.col("b.start_time") <= F.col("a.end_time"))
        & (F.col("b.end_time") >= F.col("a.start_time"))
        & (ov > overlap_frac * dur_a)
        & stronger
    )
    return a.join(b, cond, "left_anti")


def filter_moves_by_gaps(cands: DataFrame, gaps: DataFrame) -> DataFrame:
    """P6 — drop candidates whose start falls inside a detected data gap
    (weekend/holiday/large): range anti-join against operators.gaps.detect_gaps
    output (extreme_move_scanner.py:297-355). Gaps per symbol are few ->
    broadcast; the anti-join predicate runs map-side."""
    g = gaps.select(
        F.col("key").alias("__gk"),
        F.col("gap_start").alias("__gs"),
        F.col("gap_end").alias("__ge"),
    )
    cond = (
        (F.col("key") == F.col("__gk"))
        & (F.col("start_time") >= F.col("__gs"))
        & (F.col("start_time") < F.col("__ge"))
    )
    return cands.join(F.broadcast(g), cond, "left_anti")


def top_moves(cands: DataFrame, n: int = 10) -> DataFrame:
    """Strongest N per (key, direction) — §2.5 W14 top-N per direction."""
    w = Window.partitionBy("key", "direction").orderBy(
        F.desc("move_atr_multiple"), F.asc("start_time")
    )
    return cands.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= n)
