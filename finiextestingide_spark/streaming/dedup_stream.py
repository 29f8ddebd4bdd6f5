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
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


def lsh_band_stream(
    docs: DataFrame,
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(bucket, doc_id) LSH band rows per arriving document — the
    row-local half of streaming near-dup.

    EXACT Python mirror of the batch construction (operators.dedup:
    ``normalized_text`` -> word n-gram shingles -> ``_mh_slice`` sliced-md5
    permutation minima -> md5 band hash), pinned by a pytest that compares
    this stream's rows against ``minhash_signatures`` + band hashing on
    the same corpus. Batch uses an exploded JVM aggregate because its
    input is a LAKE (the shuffle amortizes); a stream sees each document
    exactly once in one row, so the signature is computed row-local in an
    Arrow batch (mapInPandas) — no shuffle, no state, per-doc cost only.
    Documents with fewer than ``shingle_n`` words have no shingles and
    emit nothing (the batch contract)."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re

        n_dig = (num_hashes + 3) // 4
        for pdf in batches:
            out_bucket: list[str] = []
            out_id: list[int] = []
            for did, body in zip(pdf[id_col], pdf[text]):
                if body is None or pd.isna(did):
                    continue
                norm = re.sub(r"[^a-z0-9]+", " ", str(body).lower()).strip()
                words = norm.split(" ") if norm else []
                if len(words) < shingle_n:
                    continue
                mins: list[str | None] = [None] * num_hashes
                for j in range(len(words) - shingle_n + 1):
                    s = " ".join(words[j : j + shingle_n])
                    for d in range(n_dig):
                        h = hashlib.md5(f"{d}|{s}".encode()).hexdigest()
                        for o in range(4):
                            i = d * 4 + o
                            if i >= num_hashes:
                                break
                            sl = h[o * 8 : o * 8 + 8]
                            if mins[i] is None or sl < mins[i]:
                                mins[i] = sl
                for b in range(bands):
                    sig = "|".join(
                        mins[b * rows_per_band + r] for r in range(rows_per_band)
                    )
                    bh = hashlib.md5(sig.encode()).hexdigest()
                    out_bucket.append(f"{b}|{bh}")
                    out_id.append(int(did))
            yield pd.DataFrame({"bucket": out_bucket, "doc_id": out_id})

    return docs.mapInPandas(run, "bucket string, doc_id long")


_LSH_PAIR_SCHEMA = StructType(
    [StructField("id_a", LongType()), StructField("id_b", LongType())]
)

_LSH_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def bootstrap_lsh_state(
    docs: DataFrame,
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """BATCH ``(bucket, doc_id)`` band rows for a history corpus — the
    bulk half of the streaming LSH cold-start protocol (#355, reference
    algo_state_store.py:1-22: reconstruct state at startup from a durable
    snapshot instead of replaying history).

    Computed ENTIRELY JVM-side (``operators.dedup.minhash_signatures``
    partial aggregate + md5 band hash + one ``stack`` generate — no
    Python), producing bucket keys bit-identical to the stream's
    ``lsh_band_stream`` (``f"{{band}}|{{md5(sig-slice)}}"``; the same
    construction the batch/stream signature-parity pytest pins). A
    restarted or newly-attached ``streaming_lsh_candidates`` seeds its
    bucket state from these rows at batch speed, instead of replaying the
    entire corpus through the per-document Python MinHash map — the
    bulk-drive constant the engine's other keyed streams already avoid.

    Docs with fewer than ``shingle_n`` words emit nothing (the batch and
    stream contract alike)."""
    from ..operators.dedup import minhash_signatures, shingle_stream

    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    sigs = minhash_signatures(
        shingle_stream(docs, shingle_n, id_col=id_col, text=text),
        num_hashes,
        id_col=id_col,
    )
    hashed = sigs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[
            F.concat(
                F.lit(f"{b}|"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ),
            ).alias(f"__b{b}")
            for b in range(bands)
        ],
    )
    stack_args = ", ".join(f"__b{b}" for b in range(bands))
    return hashed.select(
        F.expr(f"stack({bands}, {stack_args}) as bucket"), "doc_id"
    )


def merged_lsh_view(history_pairs: DataFrame, stream_pairs: DataFrame) -> DataFrame:
    """Read-time merge completing the LSH backfill protocol: the full
    candidate-pair set over history+tail is the batch band join over
    HISTORY (``operators.dedup.lsh_candidate_pairs`` — JVM speed) union
    the stream's emitted pairs (tail×tail plus tail×history cross pairs —
    the cross pairs REQUIRE the bucket state to be seeded via
    ``bootstrap_lsh_state``, which is why seeding is the primary path,
    not an optimization). Distinct absorbs the band-level multiplicity of
    the stream's emissions; both inputs already order each pair id_a <
    id_b."""
    return (
        history_pairs.select("id_a", "id_b")
        .unionByName(stream_pairs.select("id_a", "id_b"))
        .distinct()
    )


def streaming_lsh_candidates(
    docs: DataFrame,
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text: str = "text",
    max_bucket_members: int = 10_000,
    bootstrap: DataFrame | None = None,
    bootstrap_dir: str | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup: candidate pairs surfaced AS
    DOCUMENTS ARRIVE (the ingest-firehose analogue of
    ``operators.dedup.lsh_candidate_pairs``, which the emitted pair SET
    equals once the feed drains — micro-batch slicing cannot change it,
    because an unordered pair is emitted exactly once, when its later
    member reaches the bucket).

    Shape: row-local band rows (``lsh_band_stream``) -> ONE keyed
    stateful op per band bucket holding the member-id list; a new member
    pairs with every existing member. Pairs repeat across bands exactly
    like the batch bucket-join before its ``distinct()`` — dedupe at the
    sink (or feed ``operators.dedup.verify_candidate_pairs``, which
    consumes distinct pairs).

    ``bootstrap`` (+ ``bootstrap_dir``): cold-start/backfill seeding from
    a ``bootstrap_lsh_state`` snapshot via the shared create-only ledger
    protocol (streaming/bootstrap.py — #355 discipline, same as the
    dedup/bars/reconcile/live streams). Seed rows populate bucket
    membership WITHOUT emitting pairs among themselves: history×history
    pairs are the batch band join's job (``lsh_candidate_pairs``, JVM
    speed); what seeding buys is (a) a restarted ingest stream that lost
    its checkpoint re-arms at batch speed instead of replaying the whole
    corpus through the per-doc Python MinHash map, and (b) new arrivals
    pair against the EXISTING lake (the tail×history cross pairs). Full
    pair set at read time = ``merged_lsh_view(batch_pairs, this stream)``.
    The one-file ledger guarantees every seed lands in batch 0, so a
    cross pair can never be missed by a seed arriving after its tail
    member. A doc present in both the snapshot and the tail (replay
    overlap) is absorbed by the per-bucket seen-set — seeded membership
    outranks the tail row, so no self-pairs and no double pairing.

    Scale posture: state is one id-list per OCCUPIED bucket, sharded by
    the bucket-key shuffle — the same cardinality the batch band-join
    shuffles. ``max_bucket_members`` is the streaming form of the pairs
    budget (a bucket at the cap has emitted ~cap^2/2 pairs — degenerate
    banding, the same condition the batch guards fail loud on): members
    beyond the cap are counted-and-dropped in state rather than pairing
    quadratically forever (seeds fill first — deterministically, in
    sorted id order); a real lake tunes bands/rows-per-band instead of
    raising the cap."""
    if (bootstrap is None) != (bootstrap_dir is None):
        raise ValueError("bootstrap and bootstrap_dir must be passed together")
    rows = lsh_band_stream(
        docs, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
        id_col=id_col, text=text,
    ).withColumn("__seed", F.lit(False))
    if bootstrap is not None:
        from .bootstrap import persist_ledger

        seed_wire = bootstrap.select(
            F.col("bucket"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit(True).alias("__seed"),
        )
        persist_ledger(seed_wire, bootstrap_dir)
        seed_src = (
            docs.sparkSession.readStream.schema(seed_wire.schema)
            .parquet(bootstrap_dir)
        )
        rows = rows.unionByName(seed_src)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover — no timeout armed
            return
        import pickle

        if state.exists:
            ids, dropped = pickle.loads(bytes(state.get[0]))
        else:
            ids, dropped = [], 0
        seen = set(ids)
        incoming: set[int] = set()
        incoming_seed: set[int] = set()
        for pdf in pdfs:
            if len(pdf):
                for did, sd in zip(pdf["doc_id"], pdf["__seed"]):
                    (incoming_seed if sd else incoming).add(int(did))
        pairs: list[tuple[int, int]] = []
        changed = False
        # seeds first: membership only, no pair emission (history pairs
        # are the batch join's; see docstring) — and filling membership
        # before live rows keeps the cap deterministic
        for did in sorted(incoming_seed):
            if did in seen:
                continue
            changed = True
            if len(ids) >= max_bucket_members:
                dropped += 1
                continue
            ids.append(did)
            seen.add(did)
        # sorted: a batch delivering {7, 3} to a bucket emits (3, 7)
        # regardless of arrival slicing — determinism of the pair SET
        for did in sorted(incoming - incoming_seed):
            if did in seen:
                continue
            changed = True
            if len(ids) >= max_bucket_members:
                dropped += 1
                continue
            pairs.extend((m, did) if m < did else (did, m) for m in ids)
            ids.append(did)
            seen.add(did)
        if changed:
            state.update((pickle.dumps((ids, dropped)),))
        if pairs:
            yield pd.DataFrame(pairs, columns=["id_a", "id_b"])

    return rows.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=_LSH_PAIR_SCHEMA,
        stateStructType=_LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
