"""Skew-mitigation utilities: salted two-phase aggregation (SCALE.md §4).

AQE's skew-join splitting covers joins, but a pathological GROUP BY key (one
symbol = 30% of all ticks) still lands one reducer with 30% of the data.
Salting splits each key into `n_salts` subkeys for a parallel partial
aggregate, then combines partials in a second (tiny) aggregate — the
classic two-phase shape. Only algebraic aggregates compose this way; the
helpers below cover the sum/count/min/max family (avg = sum/count at the
combine step).

The salt is derived from a hash of a row-unique column rather than rand():
same contract as operators/sampling.py — deterministic, re-runnable,
engine-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salt_column(unique_col: str, n_salts: int) -> Column:
    """Stable salt 0..n_salts-1 from a row-unique column (no rand(): reruns
    and retried tasks see identical salts)."""
    return F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    group_col: str,
    *,
    unique_col: str,
    n_salts: int = 16,
    sums: dict[str, str] | None = None,
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-safe aggregate: per (key, salt) partials, then a
    per-key combine. `sums` maps input column -> output alias; the row
    count always comes along as `count_alias`. Equivalent to a plain
    groupBy (sums/counts are algebraic) — pinned by the gate oracle —
    but the wide first exchange fans each hot key over n_salts reducers."""
    sums = sums or {}
    salted = df.withColumn("__salt", salt_column(unique_col, n_salts))
    partial = salted.groupBy(group_col, "__salt").agg(
        F.count(F.lit(1)).alias("__pc"),
        *[F.sum(src).alias(f"__ps_{alias}") for src, alias in sums.items()],
    )
    return partial.groupBy(group_col).agg(
        F.sum("__pc").alias(count_alias),
        *[F.sum(f"__ps_{alias}").alias(alias) for alias in sums.values()],
    )
