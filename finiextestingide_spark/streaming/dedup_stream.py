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
            # each live doc weighs 1; a bootstrap seed row carries its
            # whole history group as (min_id, weight=n) — the fold is
            # commutative (min + weighted count), so seeds racing live
            # rows is just out-of-order arrival (the reconcile protocol)
            n += int(pdf["__w"].sum()) if "__w" in pdf.columns else len(pdf)
    if mn is not None:
        state.update((int(mn), int(n), int(emitted)))
        state.setTimeoutDuration(timeout_ms)


def bootstrap_dedup_state(
    docs: DataFrame, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """BATCH per-hash dedup snapshot from a history corpus — the bulk half
    of the batch-bootstrap/stream-tail protocol (round-10 item 3): exact
    dedup of months of history through the STREAM costs per-key-invocation
    overhead (SCALE.md §7: 23 s at sf1 where the batch groupBy is
    sub-second); this is ONE JVM hash aggregation, and
    ``streaming_exact_dedup(bootstrap=...)`` folds it in as weighted seed
    rows so the stream pays per-key cost only on the live tail.

    Returns ``(content_hash, min_id, n)`` — exactly the stream's per-key
    state."""
    return (
        docs.select(
            F.md5(normalized_text(F.col(text))).alias("content_hash"),
            F.col(id_col).cast("long").alias("doc_id"),
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("min_id"), F.count(F.lit(1)).alias("n"))
    )


def merged_dedup_view(snapshot: DataFrame, stream_rows: DataFrame) -> DataFrame:
    """SINK-MERGE form of the backfill protocol — the 100 TB path.

    The dedup aggregate is commutative (min of ids, sum of counts), so
    history does not need to flow through the stream AT ALL: run the batch
    ``bootstrap_dedup_state`` over history (one JVM aggregation), stream
    ONLY the tail with FRESH state, and merge at read time — this view
    takes the snapshot plus the stream's emitted rows (cumulative per
    hash; the latest per hash is used) and returns the exact batch dedup
    of history+tail. Measured at sf1: snapshot 5.3 s + tail-at-tail-cost,
    vs 23 s driving history through the per-key state machinery and a
    comparable cost folding 50k seed ROWS through it (the ``bootstrap=``
    seed-union pays per-KEY Python invocation on every seeded hash, so it
    only wins when distinct history hashes are few relative to tail
    traffic — e.g. a bar/session key space — not for an open-ended corpus).
    The stream's canonical ids are tail-local until merged; the view's ids
    are the all-time min."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy(F.col("group_size").desc())
    latest = (
        stream_rows.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "content_hash",
            F.col("canonical_id").alias("min_id"),
            F.col("group_size").alias("n"),
        )
    )
    return (
        snapshot.select("content_hash", "min_id", "n")
        .unionByName(latest)
        .groupBy("content_hash")
        .agg(F.min("min_id").alias("min_id"), F.sum("n").alias("n"))
    )


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    heartbeat_ms: int = 3_000,
    bootstrap: DataFrame | None = None,
    bootstrap_dir: str | None = None,
) -> DataFrame:
    """(content_hash, canonical_id, group_size) per distinct normalized
    content, emitted when the hash's feed has been idle ``heartbeat_ms``.

    ``bootstrap`` (+ ``bootstrap_dir``): cold-start/backfill seeding from a
    ``bootstrap_dedup_state`` snapshot via the shared ledger protocol
    (streaming/bootstrap.py — create-only parquet, one-shot file-source
    union, source-checkpoint dedup across restarts). Each seed row merges
    COMMUTATIVELY (min of ids, weighted count), so the emitted rows equal
    the batch dedup of history+tail without driving history through the
    per-key state machinery. NOTE the cost model: seeding pays per-KEY
    Python invocation on every seeded hash — right when the stream must
    emit history-true canonical ids/counts and the key space is moderate;
    for an open-ended corpus (distinct hashes ~ document count) use the
    SINK-MERGE protocol instead: stream the tail with fresh state and
    combine with the batch snapshot via ``merged_dedup_view``."""
    if (bootstrap is None) != (bootstrap_dir is None):
        raise ValueError("bootstrap and bootstrap_dir must be passed together")
    hashed = docs.select(
        F.md5(normalized_text(F.col(text))).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit(1).cast("long").alias("__w"),
    )
    if bootstrap is not None:
        from .bootstrap import persist_ledger

        seed_wire = bootstrap.select(
            F.col("content_hash"),
            F.col("min_id").cast("long").alias("doc_id"),
            F.col("n").cast("long").alias("__w"),
        )
        persist_ledger(seed_wire, bootstrap_dir)
        seed_src = (
            docs.sparkSession.readStream.schema(seed_wire.schema)
            .parquet(bootstrap_dir)
        )
        hashed = hashed.unionByName(seed_src)

    def fn(key, pdfs, state):
        return _dedup_state(key, pdfs, state, timeout_ms=heartbeat_ms)

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
