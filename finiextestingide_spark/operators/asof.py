"""As-of (backward) join — the reference's signal->tick lookup (SURVEY §2.3 J1).

The reference binary-searches a per-symbol snapshot list per tick
(signal_data_provider.py:41-60) and flags staleness when the matched snapshot
is older than max_staleness_minutes (abstract_signal_worker.py:159-226).

Spark-first encoding: union-by-time + last-non-null running window. One
shuffle on the join keys, one per-partition sort, no row explosion — this is
the scale-path as-of join: at 100 TB it is a single sort-merge-shaped pass,
and AQE's skew handling applies to the key shuffle. DuckDB's native ASOF
JOIN serves as the oracle.

Tie semantics: a right row with ts == left ts IS visible (<=, matching the
reference's bisect_right on `snapshot_ts <= tick_ts`); among several right
rows at the same (key, ts) the one latest in ``tiebreak`` order wins.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance_ms: int | None = None,
    stale_col: str = "is_stale",
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach to every left row the most recent right row with
    ``right_ts <= left_ts`` per join key.

    Non-key right column names must not collide with left columns (pre-rename
    on the caller side). ``how`` is 'inner' (drop unmatched left rows) or
    'left'. ``tolerance_ms`` adds a boolean ``stale_col`` (match older than
    the tolerance) instead of dropping late matches — the reference's
    staleness flip.

    When several right rows share the same (key, right_ts), the winner is the
    row greatest in ``tiebreak`` order (a right column name). When
    ``tiebreak`` is None, the fallback sort key is a struct of the ORDERABLE
    payload columns (map-typed columns are excluded — Spark cannot sort
    them), so the result is deterministic across runs and partitionings
    whenever at least one payload column is orderable, and right frames
    carrying MapType payloads still work.
    """
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on]
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload columns collide with left: {sorted(collisions)}")

    payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )

    # Right rows sort before left rows at equal ts => "<=" visibility.
    # Among right rows tied on (key, ts), ordering ascending by the tiebreak
    # makes F.last pick the greatest one deterministically; left rows carry
    # null __r so the extra keys are inert. The fallback key in BOTH branches
    # is a struct of only the ORDERABLE payload columns (minus the explicit
    # tiebreak, which already sorts first) — appending the full __r struct
    # would fail analysis on MapType payloads, and rows tied on the explicit
    # tiebreak value itself must still resolve deterministically.
    orderable = [
        f.name
        for f in right.select(*[F.col(c) for c in payload_cols]).schema.fields
        if _orderable(f.dataType) and f.name != tiebreak
    ]
    tie_keys = []
    if tiebreak is not None:
        tie_keys.append(F.col("__r").getField(tiebreak).asc_nulls_first())
    if orderable:
        tie_keys.append(
            F.struct(*[F.col("__r").getField(c) for c in orderable]).asc_nulls_first()
        )
    elif tiebreak is None:
        import warnings

        warnings.warn(
            "asof_join: no orderable right payload column and no explicit "
            "tiebreak — rows tied on (key, ts) resolve nondeterministically; "
            "pass tiebreak= to pin the winner.",
            stacklevel=2,
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"), *tie_keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__is_left") == 1)
    )
    if how == "inner":
        merged = merged.where(F.col("__match").isNotNull())
    out = merged.select("__l.*", *[F.col(f"__match.{c}").alias(c) for c in payload_cols])
    if tolerance_ms is not None:
        lms = _to_ms(out, left_ts)
        rms = _to_ms(out, right_ts)
        out = out.withColumn(stale_col, (lms - rms) > F.lit(tolerance_ms))
    return out


def _orderable(dt) -> bool:
    """True iff Spark can sort values of this type (no MapType anywhere)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _to_ms(df: DataFrame, col: str) -> F.Column:
    return F.col(col) if dict(df.dtypes)[col] == "bigint" else F.unix_millis(F.col(col))
