"""Streaming as-of signal join — the live path of J1/W7 (SURVEY §2.9).

The reference's live workers hold the most recent signal snapshot per symbol
in memory and resolve every tick against it (signal_data_provider.py:41-60
batch-side; worker staleness contract abstract_signal_worker.py:159-226).
Spark mapping: ticks and signals are two streams UNIONED into one keyed
envelope; a per-symbol stateful processor keeps exactly one value-state —
the latest (sig_ts, score) — and emits each tick enriched with it. State is
O(symbols), the same bound the reference's per-worker snapshot has; it
shards with the key across a cluster.

Implementation note: this targets `applyInPandasWithState` (GroupState).
Spark 4's `transformWithStateInPandas` is the successor API, but its Python
driver worker needs google.protobuf, which this environment doesn't ship —
the operator's semantics are API-agnostic (one bounded value-state per key)
and port mechanically.

Within-batch ordering mirrors the batch asof_join contract: rows are sorted
by (ts, signal-first) so a signal stamped exactly at a tick's timestamp IS
visible to that tick ("<=" semantics). Across micro-batches, arrival order
is event-time order for file/Kafka sources replaying history; a late signal
(arriving after a later-stamped tick was already emitted) updates state for
FUTURE ticks only — the reference's live pipeline has the identical
behavior, because it cannot rewrite ticks it already processed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("is_signal", BooleanType()),
        StructField("mid", DoubleType()),
        StructField("sig_ts", TimestampType()),
        StructField("score", DoubleType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("mid", DoubleType()),
        StructField("sig_ts", TimestampType()),
        StructField("score", DoubleType()),
        # feed-status envelope stamp (#434, abstract_signal_worker.py:200-203):
        # the framework owns this channel; true on a gap (no signal yet) or
        # when the served snapshot's age exceeds max_staleness_ms
        StructField("is_stale", BooleanType()),
    ]
)

# latest signal per symbol: (sig_ms epoch-ms, score)
_STATE_SCHEMA = StructType(
    [StructField("sig_ms", LongType()), StructField("score", DoubleType())]
)


def _resolve(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    max_staleness_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # pragma: no cover - no timeouts configured
        return
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    # signal-first at equal ts => "<=" visibility (batch asof contract);
    # global sort across chunks (multi-chunk groups must be ordered once)
    pdf = pdf.sort_values(["ts", "is_signal"], ascending=[True, False], kind="mergesort")
    sig_ms, score = state.get if state.exists else (None, None)
    (symbol,) = key
    out_ts, out_mid, out_sig, out_score, out_stale = [], [], [], [], []
    for is_sig, ts, mid, s_ts, s_score in zip(
        pdf["is_signal"], pdf["ts"], pdf["mid"], pdf["sig_ts"], pdf["score"]
    ):
        if is_sig:
            ms = s_ts.value // 1_000_000  # ns -> ms
            if sig_ms is None or ms >= sig_ms:
                sig_ms, score = ms, s_score
        else:
            out_ts.append(ts)
            out_mid.append(mid)
            out_sig.append(pd.Timestamp(sig_ms, unit="ms") if sig_ms is not None else pd.NaT)
            out_score.append(score)
            # staleness evaluated per tick against the SERVED snapshot, the
            # reference's _evaluate_stale: a gap is stale; age strictly over
            # the bound is stale. Because every tick re-evaluates, the flip
            # the reference's should_refresh watches for (feed dies, age
            # crosses the boundary while the snapshot stops changing) is
            # surfaced here as the is_stale transition between ticks.
            if sig_ms is None:
                out_stale.append(True)
            elif max_staleness_ms is None:
                out_stale.append(False)
            else:
                out_stale.append(ts.value // 1_000_000 - sig_ms > max_staleness_ms)
    if sig_ms is not None:
        state.update((int(sig_ms), float(score)))
    if out_ts:
        yield pd.DataFrame(
            {
                "symbol": symbol,
                "ts": out_ts,
                "mid": out_mid,
                "sig_ts": out_sig,
                "score": out_score,
                "is_stale": pd.Series(out_stale, dtype="bool"),
            }
        )


def envelope(ticks: DataFrame, signals: DataFrame) -> DataFrame:
    """Union ticks(symbol, ts, mid) and signals(symbol, sig_ts, score) into
    the keyed envelope stream."""
    t = ticks.select(
        "symbol",
        F.col("ts"),
        F.lit(False).alias("is_signal"),
        F.col("mid"),
        F.lit(None).cast("timestamp").alias("sig_ts"),
        F.lit(None).cast("double").alias("score"),
    )
    s = signals.select(
        "symbol",
        F.col("sig_ts").alias("ts"),
        F.lit(True).alias("is_signal"),
        F.lit(None).cast("double").alias("mid"),
        F.col("sig_ts"),
        F.col("score"),
    )
    return t.unionByName(s)


def asof_signal_stream(
    ticks: DataFrame, signals: DataFrame, *, max_staleness_ms: int | None = None
) -> DataFrame:
    """Streaming as-of join: every tick enriched with the latest signal at
    or before it (per symbol) plus the ``is_stale`` feed-status stamp —
    true on a gap or when the served signal is older than
    ``max_staleness_ms`` at the tick (None disables age-based staleness;
    gaps are always stale). The per-tick re-evaluation surfaces the
    reference's staleness FLIP (abstract_signal_worker.py:159-179): when
    the signal feed dies mid-session the snapshot stops changing but its
    age keeps growing, and the emitted column flips fresh->stale on the
    first tick past the boundary."""

    def fn(key, pdfs, state):
        return _resolve(key, pdfs, state, max_staleness_ms=max_staleness_ms)

    return (
        envelope(ticks, signals)
        .groupBy("symbol")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
