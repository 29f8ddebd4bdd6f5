"""Scenario data-preparation operators.

Spark re-expression of the reference's scenario data loading specials:
- warmup-bar selection (P4): the last N bars strictly before each scenario's
  start (reference: python/framework/data_preparation/
  shared_data_preparator.py:803-820).
- interval-overlap coverage join (J4): which indexed files/segments overlap a
  requested load range (reference: shared_data_preparator.py:363-411, and
  the file-level pruning at :652-677).

Scale notes: the scenario table is small by construction (hundreds of rows)
-> always broadcast; per-scenario top-N is a row_number over a per-scenario
window (shuffles bars once, keyed by scenario, no global sort). The overlap
join is broadcast too, so file-index rows never shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def warmup_bars(
    bars: DataFrame,
    scenarios: DataFrame,
    n: int,
    *,
    key: str = "symbol",
    ts: str = "bar_ts",
    start: str = "start_ts",
    scenario_col: str = "scenario",
) -> DataFrame:
    """Last ``n`` bars strictly before each scenario's start timestamp.

    ``scenarios`` must carry (scenario_col, key, start). Output adds
    ``bars_back`` (1 = the bar immediately preceding the start).
    """
    w = Window.partitionBy(scenario_col).orderBy(F.desc(ts))
    return (
        bars.join(F.broadcast(scenarios), key)
        .where(F.col(ts) < F.col(start))
        .withColumn("bars_back", F.row_number().over(w))
        .where(F.col("bars_back") <= n)
    )


def interval_overlap_join(
    files: DataFrame,
    ranges: DataFrame,
    *,
    key: str = "symbol",
    file_start: str = "min_ts",
    file_end: str = "max_ts",
    range_start: str = "start_ts",
    range_end: str = "end_ts",
) -> DataFrame:
    """Files/segments whose [file_start, file_end] overlaps a requested
    [range_start, range_end] (closed intervals), per range row.

    ``ranges`` is broadcast; the non-equi overlap predicate runs map-side
    after the equi-match on ``key``.
    """
    cond = (
        (files[key] == ranges[key])
        & (ranges[range_start] <= files[file_end])
        & (ranges[range_end] >= files[file_start])
    )
    return files.join(F.broadcast(ranges), cond).drop(ranges[key])
