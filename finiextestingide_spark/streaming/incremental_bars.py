"""Stateful incremental bar rendering (R7) with idle-timeout closing (R8).

The reference's live bar renderer keeps ONE open bar per (symbol, timeframe)
and closes it when the first tick of the next bucket arrives (reference:
python/framework/bars/bar_renderer.py:123-214, state envelope
market_data_types.py:114-133); idle heartbeats can close a bar when the feed
goes quiet (process_tick_loop.py:52-107).

Spark mapping: `applyInPandasWithState` keyed by symbol — per-key GroupState
holds exactly the open-bar tuple (bounded state, the deque(maxlen=1000)
analogue is the downstream sink), and a processing-time timeout closes the
open bar when no tick arrives within the heartbeat interval, which the pure
watermark encoding in bars_stream.py cannot do (a watermark only advances on
new data).

Batch parity: for every bucket except each key's last (which only closes on
timeout/end), output equals operators.bars.ohlcv_bars — pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_BAR_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("bar_ts", TimestampType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("tick_count", LongType()),
    ]
)

# state tuple: (bucket_start_epoch_us, open, high, low, close, volume, n)
_STATE_SCHEMA = StructType(
    [
        StructField("bucket_us", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _render(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    bar_us: int,
    timeout_ms: int,
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    if state.hasTimedOut:
        if state.exists:
            b, o, h, lo, c, v, n = state.get
            state.remove()
            yield _bar_frame(symbol, b, o, h, lo, c, v, n, bar_us)
        return

    open_bar = list(state.get) if state.exists else None
    closed: list[tuple] = []
    # A group spanning several Arrow chunks (>maxRecordsPerBatch rows for one
    # symbol in a microbatch) must be ordered GLOBALLY: sorting each chunk
    # alone lets a tick from an earlier bucket arrive after a later bucket's
    # tick and close the open bar prematurely (duplicate bar_ts rows). State
    # is still one tuple; the concat is bounded by the per-key microbatch.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        keys = ["timestamp", "time_msc"]
        if "tick_seq" in pdf.columns:
            # monotone wire tiebreak: makes the fold order deterministic
            # even for ticks tied on (timestamp, time_msc) — and therefore
            # bit-identical to bootstrap_bar_state's sorted-aggregate seed
            keys.append("tick_seq")
        has_seed = "__is_seed" in pdf.columns
        if has_seed:
            # forming-bar seeds sort FIRST (before any tail tick); a key
            # whose state already exists ignores its seed — checkpoint
            # state outranks the ledger (the shared bootstrap contract)
            pdf = pdf.assign(
                __seed_after=1 - pdf["__is_seed"].fillna(0).astype("int64")
            )
            keys.insert(0, "__seed_after")
        pdf = pdf.sort_values(keys, kind="mergesort")
        us = pdf["timestamp"].astype("int64") // 1000  # ns -> us
        seed_l = pdf["__is_seed"].tolist() if has_seed else None
        rows = zip(range(len(pdf)), us, pdf["mid"], pdf["volume"])
        for i, t_us, price, vol in rows:
            if seed_l is not None and seed_l[i]:
                if open_bar is None:
                    open_bar = [
                        int(pdf["b_bucket_us"].iloc[i]),
                        float(pdf["b_open"].iloc[i]),
                        float(pdf["b_high"].iloc[i]),
                        float(pdf["b_low"].iloc[i]),
                        float(pdf["b_close"].iloc[i]),
                        float(pdf["b_volume"].iloc[i]),
                        int(pdf["b_n"].iloc[i]),
                    ]
                continue
            bucket = (int(t_us) // bar_us) * bar_us
            if open_bar is None:
                open_bar = [bucket, price, price, price, price, vol, 1]
            elif bucket == open_bar[0]:
                open_bar[2] = max(open_bar[2], price)
                open_bar[3] = min(open_bar[3], price)
                open_bar[4] = price
                open_bar[5] += vol
                open_bar[6] += 1
            else:  # first tick of a later bucket closes the open bar
                closed.append(tuple(open_bar))
                open_bar = [bucket, price, price, price, price, vol, 1]
    if open_bar is not None:
        state.update(tuple(open_bar))
        state.setTimeoutDuration(timeout_ms)
    if closed:
        yield pd.concat(
            [_bar_frame(symbol, *bar, bar_us) for bar in closed], ignore_index=True
        )


def _bar_frame(symbol, bucket_us, o, h, lo, c, v, n, bar_us) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "symbol": [symbol],
            "bar_ts": [pd.Timestamp(bucket_us, unit="us")],
            "open": [o],
            "high": [h],
            "low": [lo],
            "close": [c],
            "volume": [v],
            "tick_count": [n],
        }
    )


def bootstrap_bar_state(
    ticks: DataFrame, timeframe_ms: int = 60_000
) -> DataFrame:
    """BATCH forming-bar snapshot from a history ledger — the bulk half of
    the batch-bootstrap/stream-tail protocol for the incremental renderer
    (round-10 item 3; SCALE.md §7: driving history through the per-key
    state machinery cost 21 s at sf1 where the batch bar scan is
    sub-second). Returns one row per symbol: the LAST bucket's aggregates
    ``(symbol, bucket_us, open, high, low, close, volume, n)`` — exactly
    the stream's open-bar state. The volume is folded in (timestamp,
    time_msc[, tick_seq]) tick order via a sorted JVM aggregate, so the
    seeded float running sum is bit-identical to the one an uninterrupted
    stream would hold.

    Tie contract (ADVICE r10): ticks must be UNIQUE on (timestamp,
    time_msc) OR carry a monotone ``tick_seq`` column (picked up here and
    by the streaming renderer as the third sort key). Without either,
    ticks tied on both keys sort here by (mid, volume) while the stream's
    stable mergesort keeps arrival order — the seeded open/close and the
    float volume-sum order can then differ from an uninterrupted stream.

    History's CLOSED bars are the batch path's output
    (operators.bars.ohlcv_bars); pass this snapshot to
    ``incremental_bars(bootstrap=...)`` and stream only the tail."""
    bar_us = timeframe_ms * 1000
    us = F.unix_micros("timestamp")
    cols = [
        ticks["symbol"],
        us.alias("__us"),
        (us - F.pmod(us, F.lit(bar_us))).alias("bucket_us"),
        F.col("time_msc").cast("long").alias("__tie"),
    ]
    struct_keys = ["__us", "__tie"]
    if "tick_seq" in ticks.columns:
        cols.append(F.col("tick_seq").cast("long").alias("__seq3"))
        struct_keys.append("__seq3")
    rows = ticks.select(
        *cols,
        F.col("mid").cast("double").alias("__mid"),
        F.col("volume").cast("double").alias("__vol"),
    )
    per_bucket = rows.groupBy("symbol", "bucket_us").agg(
        F.sort_array(
            F.collect_list(F.struct(*struct_keys, "__mid", "__vol"))
        ).alias("__seq")
    )
    seq = F.col("__seq")
    return (
        per_bucket.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy(F.desc("bucket_us"))
            ),
        )
        .where(F.col("__rk") == 1)
        .select(
            "symbol",
            "bucket_us",
            seq[0]["__mid"].alias("open"),
            F.array_max(F.transform(seq, lambda x: x["__mid"])).alias("high"),
            F.array_min(F.transform(seq, lambda x: x["__mid"])).alias("low"),
            F.element_at(seq, -1)["__mid"].alias("close"),
            # the renderer's running float sum, in exact tick order
            F.aggregate(
                F.transform(seq, lambda x: x["__vol"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("volume"),
            F.size(seq).cast("long").alias("n"),
        )
    )


def incremental_bars(
    ticks: DataFrame,
    timeframe_ms: int = 60_000,
    *,
    heartbeat_ms: int = 30_000,
    bootstrap: DataFrame | None = None,
    bootstrap_dir: str | None = None,
) -> DataFrame:
    """Close-on-next-bucket bar stream over columns
    (symbol, timestamp, time_msc, mid, volume).

    A bar for bucket B is emitted when the first tick with bucket > B
    arrives for that symbol (exact reference semantics, including
    out-of-order-free input assumption), or when the symbol's feed is idle
    for ``heartbeat_ms`` of processing time.

    ``bootstrap`` (+ ``bootstrap_dir``): cold-start/backfill seeding from a
    ``bootstrap_bar_state`` snapshot via the shared ledger protocol
    (streaming/bootstrap.py — create-only parquet, one-shot file-source
    union, source-checkpoint dedup across restarts): each symbol's forming
    bar installs BEFORE any tail tick, so a restarted renderer that lost
    its checkpoint resumes mid-bar without replaying history; a key whose
    state already exists ignores its seed."""
    if (bootstrap is None) != (bootstrap_dir is None):
        raise ValueError("bootstrap and bootstrap_dir must be passed together")
    bar_us = timeframe_ms * 1000
    if bootstrap is not None:
        from .bootstrap import persist_ledger

        seed_wire = bootstrap.select(
            F.col("symbol"),
            F.timestamp_micros(F.col("bucket_us")).alias("timestamp"),
            F.lit(0).cast("long").alias("time_msc"),
            F.lit(None).cast("double").alias("mid"),
            F.lit(None).cast("double").alias("volume"),
            F.lit(1).alias("__is_seed"),
            F.col("bucket_us").cast("long").alias("b_bucket_us"),
            F.col("open").cast("double").alias("b_open"),
            F.col("high").cast("double").alias("b_high"),
            F.col("low").cast("double").alias("b_low"),
            F.col("close").cast("double").alias("b_close"),
            F.col("volume").cast("double").alias("b_volume"),
            F.col("n").cast("long").alias("b_n"),
        )
        persist_ledger(seed_wire, bootstrap_dir)
        seed_src = (
            ticks.sparkSession.readStream.schema(seed_wire.schema)
            .parquet(bootstrap_dir)
        )
        ticks = ticks.withColumn("__is_seed", F.lit(0)).unionByName(
            seed_src, allowMissingColumns=True
        )

    def fn(key, pdfs, state):
        return _render(key, pdfs, state, bar_us=bar_us, timeout_ms=heartbeat_ms)

    return ticks.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=_BAR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def drain_to_memory(
    bars: DataFrame,
    query_name: str,
    *,
    settle_secs: float = 5.0,
    max_secs: float = 120.0,
    await_state_drain: bool = False,
) -> None:
    """Run the stateful stream into an in-memory table until output settles,
    then stop.

    `trigger(availableNow)` never terminates under ProcessingTimeTimeout —
    pending timeouts keep scheduling (empty) microbatches — so
    `awaitTermination` would hang; instead poll the sink row count and stop
    once it has been stable for ``settle_secs`` (long enough for the
    heartbeat timeout batch to fire when heartbeat_ms < settle_secs*1000)
    AND the engine is quiescent: no trigger mid-flight and the most recent
    completed microbatch consumed zero input rows. Wall-clock stability
    alone truncates output on a loaded host where one slow microbatch takes
    longer than ``settle_secs`` without appending rows.
    """
    import time

    spark = bars.sparkSession
    q = (
        bars.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + max_secs
    last, stable_since = -1, time.time()
    prev_batch_id, batch_id_repeats = None, 0
    data_seen = False
    while time.time() < deadline and q.isActive:
        # sticky: has ANY completed batch consumed input rows yet? An initial
        # EMPTY batch completing before the data batch must not satisfy the
        # 0-input quiescence test (that returned an empty sink once on a
        # loaded host).
        if not data_seen:
            data_seen = any(
                (p or {}).get("numInputRows", 0) > 0 for p in q.recentProgress
            )
        n = spark.table(query_name).count()
        if n != last:
            last, stable_since = n, time.time()
        else:
            trigger_idle = not q.status.get("isTriggerActive", True)
            progress = q.lastProgress
            batch_id = progress.get("batchId") if progress else None
            # batch_id None means NO batch has completed yet — the stream is
            # still initializing, never "frozen" (on a loaded host the first
            # batch can take longer than settle_secs; exiting here returned
            # an empty sink once)
            if batch_id is not None and batch_id == prev_batch_id:
                batch_id_repeats += 1
            else:
                batch_id_repeats = 0
            prev_batch_id = batch_id
            # Two quiescence contracts, chosen by the caller:
            # - await_state_drain=True (emit-on-timeout streams): the
            #   precise signal is the stream's own state metrics — once a
            #   completed batch reports numRowsTotal == 0, every key has
            #   emitted and removed its state. Sink-stability plus a
            #   0-input completed batch is NOT sufficient there: under
            #   load, empty timeout-CHECK batches complete before the
            #   emissions fire and once truncated the output. Streams that
            #   deliberately KEEP compact state across timeout emissions
            #   (streaming dedup's cumulative (min_id, n, emitted_n)) never
            #   reach numRowsTotal == 0; for them the signal is a completed
            #   batch that consumed no input AND updated no state rows
            #   AFTER at least one emission reached the sink — the emission
            #   wave itself updates every fired key's state, so a 0-update
            #   idle batch means no timer is mid-flight. (availableNow keeps
            #   scheduling empty microbatches while ANY timer is registered,
            #   so the frozen-batchId fallback alone would wait out
            #   max_secs.)
            # - await_state_drain=False (streams whose residual state is
            #   deliberately never flushed, e.g. the incremental-bars gate
            #   with its beyond-horizon heartbeat): state never empties, so
            #   quiescence is a completed 0-input batch — all emissions come
            #   from data batches, none are pending.
            # Fallback for both: a frozen batchId across idle polls means
            # the engine will never schedule another batch — exit rather
            # than wait out max_secs.
            if await_state_drain:
                quiesced = False
                if progress is not None:
                    ops = progress.get("stateOperators") or []
                    drained = bool(ops) and all(
                        op.get("numRowsTotal", 1) == 0 for op in ops
                    )
                    # Kept-state streams: safe to exit only when (a) the
                    # current batch is fully idle (no input, no state
                    # updates) AND (b) the most recent DATA batch has
                    # already been followed by its timeout wave — every
                    # data batch re-arms its keys' timers, and the wave
                    # that fires them updates state with zero input, so a
                    # 0-input updates>0 batch AFTER the last input>0 batch
                    # is the evidence. Without (b), an idle CHECK batch
                    # completing between a data batch and its wave would
                    # truncate the wave's emissions (the race the old
                    # numRowsTotal==0 signal existed to prevent).
                    idle_now = (
                        last > 0
                        and progress.get("numInputRows", 1) == 0
                        and bool(ops)
                        and all(op.get("numRowsUpdated", 1) == 0 for op in ops)
                    )
                    wave_done = False
                    if idle_now:
                        last_data_bid = -1
                        last_wave_bid = -1
                        for p in q.recentProgress:
                            if not p:
                                continue
                            bid_ = p.get("batchId", -1)
                            if p.get("numInputRows", 0) > 0:
                                last_data_bid = max(last_data_bid, bid_)
                            else:
                                pops = p.get("stateOperators") or []
                                if any(
                                    op.get("numRowsUpdated", 0) > 0 for op in pops
                                ):
                                    last_wave_bid = max(last_wave_bid, bid_)
                        # data batch may have scrolled out of the progress
                        # buffer (last_data_bid -1): any wave still in the
                        # buffer necessarily came after it
                        wave_done = last_wave_bid >= 0 and last_wave_bid > last_data_bid
                    quiesced = drained or (idle_now and wave_done)
            else:
                quiesced = progress is not None and progress.get("numInputRows", 1) == 0
            if (
                data_seen
                and time.time() - stable_since >= settle_secs
                and (quiesced or (trigger_idle and batch_id_repeats >= 3))
            ):
                break
        time.sleep(0.5)
    stop_query_quietly(q, spark)


def stop_query_quietly(q, spark, idle_wait_secs: float = 5.0) -> None:
    """Stop a stateful stream without state-store abort noise (round-8
    item 6). ``q.stop()`` interrupts whatever micro-batch is mid-flight;
    under ProcessingTimeTimeout, availableNow keeps scheduling timeout-
    check batches forever, so the interrupt regularly lands mid-commit and
    the task logs 'Aborting commit' / HDFSBackedStateStore ERROR stacks.
    Harmless — every result was already drained and the abort-retry is the
    task protocol working — but it buries real errors in every gate log.
    Two layers: (1) wait (bounded) for the trigger to go idle so the stop
    lands BETWEEN batches; (2) during the stop itself, lower the four
    teardown-noisy log categories to OFF and restore them after — the
    window where they are dark is one where the only possible messages are
    the aborts of batches whose output nobody will read."""
    import time as _time

    deadline = _time.time() + idle_wait_secs
    while (
        _time.time() < deadline
        and q.isActive
        and q.status.get("isTriggerActive", False)
    ):
        _time.sleep(0.05)

    noisy = (
        "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
        "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
        "org.apache.spark.sql.execution.streaming.state",
        "org.apache.spark.executor.Executor",
        "org.apache.spark.scheduler.TaskSetManager",
        "org.apache.spark.util.Utils",
        "org.apache.spark.TaskContextImpl",
    )
    # prev accumulates category->level as each is silenced; a failure
    # mid-loop must NOT discard it — whatever was already set to OFF still
    # gets restored in the finally block (ADVICE r8: nulling the whole map
    # on a partial failure left categories dark for the rest of the session)
    prev: dict = {}
    configurator = None
    try:
        jvm = spark.sparkContext._jvm
        log_manager = jvm.org.apache.logging.log4j.LogManager
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        off = jvm.org.apache.logging.log4j.Level.OFF
    except Exception:  # pragma: no cover - alternate log backends
        configurator = None
    if configurator is not None:
        for name in noisy:
            try:
                prev[name] = log_manager.getLogger(name).getLevel()
                configurator.setLevel(name, off)
            except Exception:  # pragma: no cover - per-category failure
                prev.pop(name, None)  # this one wasn't silenced; skip it
    try:
        q.stop()
        q.awaitTermination()
    finally:
        if prev:
            # killed tasks log their abort stacks ASYNCHRONOUSLY after
            # awaitTermination returns (executor threads unwind on their
            # own schedule) — hold the categories dark briefly so the
            # restore doesn't race the very noise being suppressed
            _time.sleep(3.0)
            for name, level in prev.items():
                try:
                    configurator.setLevel(name, level)
                except Exception:  # pragma: no cover
                    pass
