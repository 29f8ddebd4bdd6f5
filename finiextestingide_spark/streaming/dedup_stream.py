"""Streaming exact dedup — the live-ingest analogue of operators.dedup.

A training-data ingest firehose wants duplicates surfaced as documents
arrive, not in a nightly batch. Spark mapping: ``applyInPandasWithState``
keyed by the normalized-content md5; per-key GroupState holds exactly
(canonical_id = min doc id seen, group_size). The group row is emitted when
the key's feed goes idle (processing-time timeout) — the same
emit-on-quiescence contract as streaming/incremental_bars.py, which makes
the output deterministic regardless of how the source splits batches: the
final row per hash is the full-stream aggregate, batch-order-independent.

Batch parity: output equals ``SELECT content_hash, min(doc_id), count(*)
GROUP BY content_hash`` — pinned by the DuckDB oracle of the
``streaming_dedup_exact`` gate and a stream-vs-batch pytest.

State size: one (16-byte hash -> 2 longs) entry per distinct document
content — the same cardinality the batch groupBy shuffles. The compact
(min_id, n) aggregate is kept ACROSS timeout emissions (only the timeout
registration is dropped): a late re-appearance of the same content
continues the full-stream aggregate, so every emitted row is cumulative
and a merge-by-hash sink gets true UPDATE semantics (counts are
monotone, canonical_id is the all-time min). Exact dedup inherently
needs full-history state; dropping it on timeout would silently restart
groups and let a merge sink overwrite a correct count with a smaller one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.text import normalized_text

_OUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("canonical_id", LongType()),
        StructField("group_size", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("min_id", LongType()),
        StructField("n", LongType()),
        # count at the last emission — suppresses no-change re-emissions
        # (a PySpark timed-out key re-fires on every batch unless a new
        # timeout is registered, so the timer alone can't gate emission)
        StructField("emitted_n", LongType()),
    ]
)

# re-arm interval for an already-emitted idle key: long enough to keep the
# engine quiescent between feeds, short enough to bound how long a crashed
# upstream leaves a pending timer (a no-change fire emits nothing)
_IDLE_REARM_MS = 3_600_000


def _dedup_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    timeout_ms: int,
) -> Iterator[pd.DataFrame]:
    (h,) = key
    if state.hasTimedOut:
        if state.exists:
            # emit the cumulative row but KEEP the compact aggregate: a
            # re-appearing key continues from (min_id, n) and re-emits a
            # larger, still-cumulative row (UPDATE semantics for merge
            # sinks). Nothing is emitted when no new rows arrived since
            # the last emission.
            mn, n, emitted = state.get
            state.update((mn, n, n))
            state.setTimeoutDuration(_IDLE_REARM_MS)
            if n > emitted:
                yield pd.DataFrame(
                    {"content_hash": [h], "canonical_id": [mn], "group_size": [n]}
                )
        return
    mn, n, emitted = state.get if state.exists else (None, 0, 0)
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            mn = m if mn is None else min(mn, m)
            n += len(pdf)
    if mn is not None:
        state.update((int(mn), int(n), int(emitted)))
        state.setTimeoutDuration(timeout_ms)


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    heartbeat_ms: int = 3_000,
) -> DataFrame:
    """(content_hash, canonical_id, group_size) per distinct normalized
    content, emitted when the hash's feed has been idle ``heartbeat_ms``."""
    hashed = docs.select(
        F.md5(normalized_text(F.col(text))).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )

    def fn(key, pdfs, state):
        return _dedup_state(key, pdfs, state, timeout_ms=heartbeat_ms)

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
