"""Embedding similarity search: brute-force cosine top-k + IVF bucket path.

Numeric determinism contract (shared with the DuckDB oracle): elements are
cast float->double BEFORE any arithmetic, and dot/norm are LEFT-TO-RIGHT
sequential folds (F.aggregate with 0.0 init == DuckDB list_reduce). Two
engines executing the same fold over the same doubles produce bit-identical
results.

Scale notes:
- Brute force is one broadcast of the query vector + a single scan — the
  correct baseline up to ~10^8 vectors per query batch.
- IVF: vectors are pre-assigned to their nearest coarse centroid (one
  crossJoin against a broadcast centroid table, argmax via min_by struct) —
  at query time only nprobe centroid buckets are scanned. The assignment is
  a write-once, partition-by-centroid layout: at 100 TB the probe reads
  1/nlist of the data via partition pruning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    denom = norm(ad) * norm(bd)
    # null on a zero vector — matches DuckDB's divide-by-zero -> NULL, and
    # avoids the ANSI-mode DIVIDE_BY_ZERO error (Spark 4 default)
    return F.when(denom > 0, dot(ad, bd) / denom)


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``cosine`` with the per-vector norms supplied as columns.

    Bit-identical to ``cosine`` by construction: ``norm_a``/``norm_b`` must
    be ``norm(_as_double(vec))`` computed over the same vectors, so the
    expression tree below is the same IEEE754 operations on the same
    doubles — only the norm folds are evaluated once per VECTOR instead of
    once per PAIR. Spark's higher-order array functions (zip_with/
    aggregate) run interpreted (no codegen), so on a near-quadratic verify
    stage the three folds per pair are the dominant CPU; pre-computing the
    two norm folds per vector leaves one fold (the dot) per pair
    (guide §1.2 per-task work, applied to the §2.5-guarded candidate
    stage)."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot(_as_double(a), _as_double(b)) / denom)


def cosine_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str | None = None,
) -> DataFrame:
    """Brute-force top-k by cosine against a single-row query DataFrame."""
    qcol = query_vec_col or vec_col
    # r15: the query norm is a constant of the scan — computing it inside
    # the broadcast-side projection evaluates the fold once per QUERY ROW
    # (one) instead of once per scanned vector; same fold, same doubles,
    # bit-identical cosine (see cosine_prenormed).
    qn = query.select(
        F.col(qcol), norm(_as_double(F.col(qcol))).alias("__qnrm")
    )
    scored = vectors.alias("v").crossJoin(F.broadcast(qn.alias("__q"))).select(
        F.col(f"v.{id_col}").alias(id_col),
        cosine_prenormed(
            F.col(f"v.{vec_col}"),
            F.col(f"__q.{qcol}"),
            norm(_as_double(F.col(f"v.{vec_col}"))),
            F.col("__q.__qnrm"),
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k, id_col=id_col)


def _ranked_topk(scored: DataFrame, k: int, *, id_col: str) -> DataFrame:
    """Global top-k with a rank column, scale-safe: orderBy().limit(k) plans
    as TakeOrderedAndProject (per-partition heap of k rows + driver merge),
    never a single-partition sort of the full scored set; the rank window
    then runs over only the k surviving rows."""
    top = scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF coarse assignment: nearest centroid by cosine (argmax via
    max_by over a (cosine, -centroid_id) struct for deterministic ties)."""
    c = centroids.select(
        F.col(centroid_id), F.col(vec_col).alias("__cvec")
    )
    # r15: hoist the row-vector norm out of the per-centroid expression —
    # the crossJoin evaluates k cosines per row, and norm(vec) is the same
    # fold each time; computing it once per row leaves one fold (the dot)
    # plus the centroid norm per candidate. Bit-identical
    # (cosine_prenormed).
    scored = (
        vectors.withColumn("__vnrm", norm(_as_double(F.col(vec_col))))
        .crossJoin(F.broadcast(c))
        .select(
            id_col,
            vec_col,
            F.col(centroid_id),
            cosine_prenormed(
                F.col(vec_col),
                F.col("__cvec"),
                F.col("__vnrm"),
                norm(_as_double(F.col("__cvec"))),
            ).alias("__cos"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.col(centroid_id), F.struct(F.col("__cos"), (-F.col(centroid_id)).alias("nid"))
        ).alias(centroid_id)
    )
    return vectors.join(best, id_col)


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Search only the nprobe closest centroid buckets."""
    qv_col = F.col(f"__q.{vec_col}")
    probe = (
        centroids.alias("c")
        .crossJoin(F.broadcast(query.alias("__q")))
        .select(
            F.col(f"c.{centroid_id}").alias(centroid_id),
            cosine(F.col(f"c.{vec_col}"), qv_col).alias("__cos"),
        )
        .orderBy(F.desc("__cos"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id)
    )
    bucket = assigned.join(F.broadcast(probe), centroid_id)
    return cosine_topk(bucket, query, k, id_col=id_col, vec_col=vec_col)


def ivf_recall(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Recall@k AUDIT of the IVF path against brute-force ground truth,
    batched over a query set: per query, recall = |IVF top-k ∩ exact
    top-k| / k. The ANN determinism gates prove the bucketed path is
    reproducible; THIS measures whether it is any good — the number a user
    tunes nprobe against (the recall/probe trade-off).

    Shape: one broadcast of the query set against the vector scan (the
    standard batched brute-force), one broadcast against the centroid
    table for probes, and a bucket-pruned candidate join — per-query
    windows only ever run over k-bounded or bucket-bounded sets. The
    brute-force truth pass is O(|vectors| x |queries|) BY DEFINITION (it
    is the audit's ground truth): run it over a query SAMPLE at scale,
    never the full corpus. Self-matches (query id == vector id) are
    excluded from both sides.

    Measured on the sf0.01 synthetic embeddings (8 seed centroids, k=10,
    20 query points): nprobe=1 -> mean recall 0.465, nprobe=2 -> 0.615,
    nprobe=4 -> 0.815, nprobe=8 (all buckets) -> exactly 1.0 — the
    monotone curve a user walks until recall meets their floor, paying one
    more bucket scan per step. (Floor + monotonicity pinned by
    tests/test_operators.py::test_ivf_recall_floor_and_monotone.)
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))

    truth_scored = (
        assigned.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col(query_id))
        .select(
            query_id, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("__cos")
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("__cos"), F.asc(id_col))
    truth = (
        truth_scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select(query_id, id_col)
    )

    probe_scored = (
        centroids.select(F.col(centroid_id), F.col(vec_col).alias("__cvec"))
        .crossJoin(F.broadcast(q))
        .select(
            query_id,
            centroid_id,
            cosine(F.col("__cvec"), F.col("__qvec")).alias("__pcos"),
        )
    )
    pw = Window.partitionBy(query_id).orderBy(F.desc("__pcos"), F.asc(centroid_id))
    probes = (
        probe_scored.withColumn("__r", F.row_number().over(pw))
        .where(F.col("__r") <= nprobe)
        .select(query_id, centroid_id)
    )

    cand = (
        assigned.join(F.broadcast(probes), centroid_id)
        .where(F.col(id_col) != F.col(query_id))
        .join(F.broadcast(q), query_id)
        .select(
            query_id, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("__cos")
        )
    )
    ivf = (
        cand.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select(query_id, id_col)
    )

    hits = (
        ivf.join(truth, [query_id, id_col])
        .groupBy(query_id)
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        q.select(query_id)
        .join(hits, query_id, "left")
        .select(
            query_id,
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(F.coalesce("hits", F.lit(0)) / F.lit(float(k)), 6).alias("recall"),
        )
    )


def random_hyperplanes(nbits: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1), derived from md5
    so any engine (or the DuckDB oracle) can reproduce the exact matrix.
    This mirrors the production design: a precomputed projection matrix
    broadcast to executors, not per-row randomness."""
    import hashlib

    planes = []
    for j in range(nbits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{j}|{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / 2**31 - 1.0)
        planes.append(row)
    return planes


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string ('1' where dot(vec, h_j) >= 0): the
    random-hyperplane LSH bucket key. Cosine-similar vectors agree on most
    sign bits, so near neighbours share buckets with high probability."""
    vd = _as_double(vec)
    bits = []
    for h in planes:
        hd = F.array(*[F.lit(float(v)) for v in h])
        bits.append(F.when(dot(vd, hd) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_ann_topk(
    vectors: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random-hyperplane LSH: score only the query's bucket, exact
    cosine rank inside it. The bucket key is a write-once column — at scale,
    partition-by-bucket makes the probe a partition-pruned read of 1/2^nbits
    of the data, the same layout trick as ivf_topk (single probe here; add
    multiprobe by unioning flipped-bit buckets)."""
    sig = hyperplane_signature(F.col(vec_col), planes)
    tagged = vectors.withColumn("__bucket", sig)
    qtagged = query.withColumn("__qbucket", sig).select(
        F.col(vec_col).alias("__qvec"), "__qbucket"
    )
    bucket = tagged.join(
        F.broadcast(qtagged), F.col("__bucket") == F.col("__qbucket")
    )
    scored = bucket.select(
        F.col(id_col),
        F.col("__bucket").alias("bucket"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    return _ranked_topk(scored, k, id_col=id_col)


def lsh_ann_multiprobe(
    vectors: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    *,
    radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multiprobe LSH ANN: probe the query's bucket AND every bucket within
    Hamming distance <= radius (radius=1: nbits extra buckets). The probe
    set is ENUMERATED as bucket keys and equi-joined — not a distance
    predicate over all buckets — so the bucket column's partition pruning
    still applies at scale; recall rises because a near neighbour that
    disagrees on one sign bit is still probed."""
    if radius != 1:
        raise ValueError("only radius=1 is implemented")
    nbits = len(planes)
    sig = hyperplane_signature(F.col(vec_col), planes)
    tagged = vectors.withColumn("__bucket", sig)
    q = query.select(F.col(vec_col).alias("__qvec"), sig.alias("__qb"))
    flips = [F.col("__qb")]
    for i in range(1, nbits + 1):
        flipped = F.when(F.substring("__qb", i, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        flips.append(
            F.concat(F.substring("__qb", 1, i - 1), flipped, F.substring("__qb", i + 1, nbits - i))
        )
    probes = q.select("__qvec", F.explode(F.array(*flips)).alias("__bucket"))
    scored = tagged.join(F.broadcast(probes), "__bucket").select(
        F.col(id_col),
        F.col("__bucket").alias("bucket"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    return _ranked_topk(scored, k, id_col=id_col)


def lsh_neardup_pairs(
    vectors: DataFrame,
    planes: list[list[float]],
    min_cosine: float,
    *,
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_key: str | None = None,
    max_bucket_pairs: int | None = 25_000_000,
    max_total_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Threshold near-dup pairs via banded hyperplane LSH + exact verify —
    the SCALABLE path ``neardup_pairs_blocked``'s pairs-budget guard points
    to when a block would go quadratic (round-9 sf10 finding). The MinHash
    band-bucket pattern applied to embeddings: the nbits sign signature
    splits into ``bands`` contiguous bands; vectors sharing ANY full band
    (within ``extra_key`` if given) become candidates via an equi-join on
    (band, band_key[, extra_key]) — never an all-pairs stage — then every
    candidate is verified with the exact cosine, so emitted pairs are a
    SUBSET of the exact operator's output (recall < 1 near the threshold,
    by design; measure it with the recall-audit gate, don't assume it).
    Candidate probability for a pair at angle theta: 1-(1-(1-theta/pi)^r)^b
    with r = nbits/bands — tune bands/nbits to the threshold. Bucket skew
    is guarded by the same pairs budget as the exact operator (a
    degenerate bucket, e.g. all-zeros from centered data, is the LSH
    analogue of a hot block).

    Regime, stated honestly: banded LSH beats all-pairs only at HIGH
    thresholds. Candidate mass scales like b * n^2 / 2^r per key group
    (uniform buckets), so r buys selectivity and b buys recall; at e.g.
    cos >= 0.8 (theta 37deg, per-band p = 0.795^r), r=4/b=8 gives ~0.98
    recall with ~16x pruning. At a loose threshold like 0.35 (theta
    69deg, p_band = 0.14 at r=4) the b needed for high recall pushes the
    candidate mass back to ~n^2/2 — no sub-quadratic exact-recall method
    exists there, which is exactly what the companion recall-audit gate
    MEASURES per label instead of hiding. For loose-threshold neighbor
    needs at scale, use per-item top-k ANN (``lsh_ann_topk``/``ivf_topk``,
    both recall-audited) or a finer block key.

    TWO pairs budgets, both computed at planning time from ONE bucket
    histogram (round-10 sf10 finding): ``max_bucket_pairs`` bounds any
    single bucket (a degenerate hot bucket), and ``max_total_pairs``
    bounds SUM of C(n_b, 2) across ALL buckets and bands — the failure
    mode the per-bucket cap cannot see: at sf10 the gate's r=4 bands gave
    10 label groups x 4 bands x 16 buckets x ~780k pairs each = ~5e8
    candidates, every bucket individually under the cap, and the
    candidate join spilled past the machine's disk. Fail-loud guidance:
    longer bands (raise r), a finer extra_key, or the top-k ANN surface.
    Physical shape, chosen from the SAME planning histogram: above ~1M
    candidates the join carries IDS ONLY (band/key/id) and vectors
    re-join per deduped pair at verify time — carrying two float arrays
    through the n-squared-ish stage multiplied the shuffle ~30x for
    nothing; below that, one vector-carrying self-join skips the two
    re-joins (cheaper at small scale, measured). Budgets disarmed means
    no histogram, so the scale-safe id-only shape runs unconditionally."""
    nbits = len(planes)
    if nbits % bands:
        raise ValueError(f"nbits={nbits} not divisible by bands={bands}")
    r = nbits // bands
    extra = [extra_key] if extra_key else []
    budgets_armed = max_bucket_pairs is not None or max_total_pairs is not None
    base = vectors.select(F.col(id_col), *extra, F.col(vec_col))
    if budgets_armed:
        # r15 (guide §2.5 input skew + §1.2 per-task work): the hyperplane
        # signature is nbits interpreted array-folds per vector, computed in
        # the SCAN stage — a single-row-group input reads as one task and
        # serializes all of it. When the scan yields fewer partitions than
        # the session parallelism, redistribute the (id, vec) rows first so
        # the fan-out runs wide; a many-file lake scan already exceeds the
        # core count and is left untouched (scale-adaptive, no local-only
        # constant). Only armed alongside the budgets: the checkpoint below
        # then bounds the shuffled payload to the audited input.
        sc = vectors.sparkSession.sparkContext
        if base.rdd.getNumPartitions() < sc.defaultParallelism:
            base = base.repartition(sc.defaultParallelism)
    sig = hyperplane_signature(F.col(vec_col), planes)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring(sig, b * r + 1, r).alias("key"),
            )
            for b in range(bands)
        ]
    )
    tagged = base.select(
        F.col(id_col), *extra, F.explode(band_keys).alias("__bk")
    ).select(id_col, *extra, "__bk.band", "__bk.key")
    if budgets_armed:
        # The budget check below is an eager planning job over `tagged`;
        # materializing first (localCheckpoint — per-invocation, never
        # plan-matched across queries) lets that job double as the
        # materialization, so the main job's consumers (both self-join
        # sides) read the signature fan-out instead of re-deriving it
        # (the winnow_candidate_pairs r15 pattern).
        tagged = tagged.localCheckpoint()
    if max_bucket_pairs is not None or max_total_pairs is not None:
        hist = (
            tagged.groupBy("band", "key", *extra)
            .count()
            .select(
                (F.col("count") * (F.col("count") - 1) / 2).alias("__pairs"),
                "band",
                "key",
                "count",
            )
        )
        # ONE planning job for both budgets; the offending-bucket lookup
        # runs only on the error path
        stats = hist.agg(
            F.sum("__pairs").alias("t"), F.max("__pairs").alias("m")
        ).collect()[0]
        total = stats["t"] or 0
        worst = stats["m"] or 0
        if max_bucket_pairs is not None and worst > max_bucket_pairs:
            row = (
                hist.where(F.col("__pairs") == worst).limit(1).collect()[0]
            )
            n = row["count"]
            raise ValueError(
                f"lsh_neardup_pairs: bucket (band={row['band']}, "
                f"key={row['key']!r}) has {n} rows = {n * (n - 1) // 2} "
                f"candidate pairs > max_bucket_pairs={max_bucket_pairs}; "
                "add hyperplanes (longer bands) or a finer extra_key"
            )
        if max_total_pairs is not None and total > max_total_pairs:
            raise ValueError(
                f"lsh_neardup_pairs: {int(total)} candidate pairs across all "
                f"band buckets > max_total_pairs={max_total_pairs} — every "
                "bucket is under the per-bucket cap but their SUM makes the "
                "candidate join super-budget (the sf10 failure mode). Add "
                "hyperplanes per band (raise r = nbits/bands), use a finer "
                "extra_key, or route through the top-k ANN surface "
                "(lsh_ann_topk/ivf_topk)."
            )
    # Physical choice from the SAME planning histogram the budgets read
    # (an AQE-style decision on a measured stat, not a guess): with few
    # candidates, carrying the vectors through one self-join is cheaper
    # than the id-only join + two vector re-joins; at scale the id-only
    # shape wins ~30x on shuffle mass (the float arrays must never ride
    # the near-quadratic stage). Budgets disarmed -> no histogram -> the
    # scale-safe id-only shape unconditionally.
    carry_vectors = budgets_armed and total <= 1_000_000
    # Per-vector norm computed ONCE (`cosine_prenormed`): the verify stage
    # is near-quadratic in candidates, and the two norm folds per pair were
    # 2/3 of its interpreted array work. Same fold, same doubles — the
    # emitted cosine is bit-identical.
    normed = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        norm(_as_double(F.col(vec_col))).alias("__nrm"),
    )
    if carry_vectors:
        tagged = tagged.join(normed, id_col)
    a, b = tagged.alias("a"), tagged.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    for e in extra:
        cond = cond & (F.col(f"a.{e}") == F.col(f"b.{e}"))
    if carry_vectors:
        cand = (
            a.join(b, cond)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                *[F.col(f"a.{e}").alias(e) for e in extra],
                F.col(f"a.{vec_col}").alias("__va"),
                F.col(f"b.{vec_col}").alias("__vb"),
                F.col("a.__nrm").alias("__na"),
                F.col("b.__nrm").alias("__nb"),
            )
            # a pair found by several bands must verify (and emit) once
            .groupBy("id_a", "id_b")
            .agg(
                *[F.first(e).alias(e) for e in extra],
                F.first("__va").alias("__va"),
                F.first("__vb").alias("__vb"),
                F.first("__na").alias("__na"),
                F.first("__nb").alias("__nb"),
            )
        )
        return cand.select(
            "id_a", "id_b", *extra,
            cosine_prenormed(
                F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        ).where(F.col("cosine") >= min_cosine)
    cand = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[F.col(f"a.{e}").alias(e) for e in extra],
    ).distinct()
    va = normed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__nrm").alias("__nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", *extra,
            cosine_prenormed(
                F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def neardup_pairs_blocked(
    vectors: DataFrame,
    block_col: str,
    min_cosine: float = 0.9,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_pairs: int | None = 25_000_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocking-key groups (the exact
    analogue of LSH bucketing for embeddings: all-pairs only inside blocks).

    The join is quadratic WITHIN a block, so a skewed caller-chosen key is a
    silent O(n^2) bomb at scale. ``max_block_pairs`` guards the ACTUAL cost
    — the per-block candidate pair count n*(n-1)/2 — via a cheap
    planning-time count over just the block column (column-pruned scan,
    map-side combine), raising before the quadratic join is launched.

    A PAIRS budget, not a row cap, deliberately: the round-9 sf10 sweep
    caught the previous 50k ROW cap passing a 21.8k-row block (10 fixed
    labels over 200k vectors) whose 2.4e8 pairs/block x 10 blocks ground
    for 40+ minutes — a fixed-cardinality block key makes block size grow
    linearly with the lake, pair cost quadratically, and a row cap scales
    the wrong way. Exact threshold search within a block is O(n^2) by
    nature (at practical cosine thresholds the ball radius dwarfs any 1-D
    projection spread of high-dim unit vectors, so geometric pruning
    cannot help); when the budget trips, the scalable paths are the ANN
    surface (``lsh_ann_topk``/``ivf_topk``, recall-audited) or a
    finer/higher-cardinality block key. Pass ``None`` to skip the guard
    when the key is known-bounded (e.g. a write-once bucket id with
    enforced fanout)."""
    if max_block_pairs is not None:
        oversized = (
            vectors.groupBy(block_col)
            .count()
            .where(F.col("count") * (F.col("count") - 1) / 2 > max_block_pairs)
            .limit(1)
            .collect()
        )
        if oversized:
            row = oversized[0]
            n = row["count"]
            raise ValueError(
                f"neardup_pairs_blocked: block {row[block_col]!r} has "
                f"{n} rows = {n * (n - 1) // 2} candidate pairs > "
                f"max_block_pairs={max_block_pairs}; the within-block join "
                "is quadratic — choose a finer block key, use the ANN "
                "surface (lsh_ann_topk/ivf_topk), or raise max_block_pairs "
                "explicitly"
            )
    # r15: per-vector norm once (cosine_prenormed) — the within-block join
    # is quadratic, and the two norm folds per pair were 2/3 of its
    # interpreted array work; bit-identical by construction.
    normed = vectors.withColumn("__nrm", norm(_as_double(F.col(vec_col))))
    a, b = normed.alias("a"), normed.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{block_col}").alias(block_col),
            cosine_prenormed(
                F.col(f"a.{vec_col}"),
                F.col(f"b.{vec_col}"),
                F.col("a.__nrm"),
                F.col("b.__nrm"),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def assign_centroids_rowlocal(
    vectors: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF coarse assignment against DRIVER-SUPPLIED centroids as literal
    expressions — the row-local form of ``assign_centroids``, with the SAME
    deterministic tie rule (max cosine, then lowest centroid id, via an
    orderable (cosine, -id) struct).

    This is the STREAMING-SAFE shape: no join, no shuffle, no state — a
    narrow map any micro-batch (or continuous) stream applies at source
    parallelism. The trained quantizer is small by construction (k
    centroids, k*dim doubles — the output of ``lloyd_centroids``), so
    embedding it as literals is the streaming analogue of the batch form's
    ``F.broadcast``; at 1000 executors there is nothing to re-broadcast per
    micro-batch and nothing in the state store. Degenerate (zero) vectors:
    the cosine is null against EVERY centroid, and all three forms of this
    assignment agree on the result — the LOWEST centroid id. Here the
    all-null structs compare equal on ``c`` and fall through to ``n``; in
    the batch ``assign_centroids`` the max_by ordering struct is never
    null (only its ``__cos`` field is), so nothing is skipped and the same
    fall-through happens; and the DuckDB argmax oracle's
    ``ORDER BY ccos DESC, centroid_id`` ranks the all-null group by id.
    Verified empirically by test_rowlocal_zero_vector_matches_batch — a
    degenerate vector gets the identical assignment whether it arrives in
    the batch history or the streamed tail of a merged index.

    ``centroid_rows``: [(centroid_id, vector), ...] — collect them from the
    trained-quantizer frame; the caller owns keeping k bounded."""
    if not centroid_rows:
        raise ValueError("assign_centroids_rowlocal: no centroids supplied")
    # r15: the row-vector norm is the same fold for every centroid
    # candidate — compute it once per row (cosine_prenormed); the centroid
    # norms are folds over all-literal arrays, which ConstantFolding
    # already evaluates at plan time. k folds per row remain (the dots),
    # down from 3k. Bit-identical.
    vn = F.col("__vnrm_rl")
    cands = []
    for cid, cvec in centroid_rows:
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        cands.append(
            F.struct(
                cosine_prenormed(
                    F.col(vec_col), cv, vn, norm(_as_double(cv))
                ).alias("c"),
                F.lit(-int(cid)).cast("long").alias("n"),
            )
        )
    best = F.array_max(F.array(*cands))
    return (
        vectors.withColumn("__vnrm_rl", norm(_as_double(F.col(vec_col))))
        .withColumn(centroid_id, (-best["n"]).cast("long"))
        .drop("__vnrm_rl")
    )


def pq_encode(
    vectors: DataFrame,
    sub_centroids: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    code_prefix: str = "pq",
) -> DataFrame:
    """Product-quantization encoding: split each vector into m contiguous
    subspaces and store, per subspace, the index of the nearest (squared-L2)
    sub-centroid — the memory-compression half of IVF-PQ, the standard
    billion-vector ANN layout: a 64-dim float vector (256 B) becomes m
    small codes (m bytes at 256 codes), so the index fits in RAM at corpus
    sizes where raw vectors cannot.

    ``sub_centroids[j]`` is the codebook of subspace j (list of
    sub-vectors, all of the subspace's width). Codebooks are literals —
    k*dim doubles, the same driver-bounded posture as
    ``assign_centroids_rowlocal`` — so encoding is a stateless narrow map
    (no join, no shuffle; streams encode at source parallelism). Ties
    break to the LOWEST code index (deterministic cross-engine). Output
    adds one int column per subspace: ``{code_prefix}0..{code_prefix}{m-1}``
    (scalar columns, not an array — columnar parquet then stores each code
    stream contiguously, the layout ADC scans want)."""
    vd = _as_double(F.col(vec_col))
    out_cols = []
    offset = 0
    for j, book in enumerate(sub_centroids):
        if not book:
            raise ValueError(f"pq_encode: empty codebook for subspace {j}")
        width = len(book[0])
        cands = []
        for code, cvec in enumerate(book):
            if len(cvec) != width:
                raise ValueError(f"pq_encode: ragged codebook in subspace {j}")
            d = None
            for t, cval in enumerate(cvec):
                diff = F.element_at(vd, offset + t + 1) - F.lit(float(cval))
                term = diff * diff
                d = term if d is None else d + term
            # min distance, tie to lowest code: maximize (-d, -code)
            cands.append(
                F.struct((-d).alias("nd"), F.lit(-code).alias("nc"))
            )
        best = F.array_max(F.array(*cands))
        out_cols.append((-best["nc"]).cast("int").alias(f"{code_prefix}{j}"))
        offset += width
    return vectors.select("*", *out_cols)


def pq_adc_topk(
    codes: DataFrame,
    sub_centroids: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    code_prefix: str = "pq",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approximate squared-L2 of
    (query, vector) as the sum over subspaces of ||q_j - codebook_j[code_j]||²
    — the query stays un-quantized (asymmetric), the database side is its
    codes only.

    The per-subspace lookup tables are computed DRIVER-SIDE (m * k_codes
    floats) and compiled into a CASE-chain per code column, so the scan
    reads ONLY the code columns (the raw vectors never load — the entire
    point of PQ), does per-row constant-time lookups, and feeds
    TakeOrderedAndProject (per-partition k-row heap, no global sort).
    Ties break to the smaller id. Lookup entries are rounded to 6 decimals
    and summed as exact DECIMALs — summation-order independent, so any
    engine reproduces the ranking bit-for-bit."""
    tables = []
    offset = 0
    for j, book in enumerate(sub_centroids):
        width = len(book[0])
        qj = query_vec[offset : offset + width]
        lut = [
            round(sum((float(q) - float(c)) ** 2 for q, c in zip(qj, cvec)), 6)
            for cvec in book
        ]
        expr = F.lit(None).cast("decimal(18,6)")
        for code, dist in enumerate(lut):
            expr = F.when(
                F.col(f"{code_prefix}{j}") == code,
                F.lit(f"{dist:.6f}").cast("decimal(18,6)"),
            ).otherwise(expr)
        tables.append(expr)
        offset += width
    total = tables[0]
    for t in tables[1:]:
        total = total + t
    scored = codes.select(
        F.col(id_col), F.round(total.cast("double"), 6).alias("adc_dist")
    )
    # nulls LAST, not Spark's default nulls-first: a code value outside the
    # supplied codebook produces a NULL lookup total (codes and codebooks
    # are independent caller inputs, so a mismatch is reachable), and a
    # nulls-first sort would silently seat those rows at the top of the
    # top-k instead of excluding them.
    top = scored.orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def pq_recall(
    vectors: DataFrame,
    codes: DataFrame,
    sub_centroids: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    code_prefix: str = "pq",
) -> DataFrame:
    """Recall@k of the PQ-ADC path vs exact squared-L2 ground truth — the
    quality audit every ANN surface here carries (`ivf_recall`,
    `embedding_neardup_lsh_recall`): determinism gates prove the path is
    REPRODUCIBLE, this measures whether the compression is GOOD.

    Per query point: recall = |ADC top-k ∩ exact top-k| / k, self-match
    excluded on both sides. The query set is the bounded audit sample
    (collected once for the lookup tables — same driver posture as the
    batch centroid broadcast); ADC distances join through a broadcast
    (query, subspace, code) -> decimal-distance table against the
    STACKED code columns, so the multi-query form stays one scan of the
    codes + one broadcast join, no CASE-chain blow-up.

    Measured recall@10 curve on the gate corpus (sf0.01, 500 near-
    orthogonal synthetic 64-dim vectors, m=8 subspaces, 20 query points):

        seeded 8 codes (first-8-vector slices)   0.180
        TRAINED 8 codes  (pq_train_codebooks)    0.255
        TRAINED 16 codes (the gate config)       0.305
        TRAINED 32 codes                         0.305
        TRAINED 64 codes                         0.405

    Training (2 quantized Lloyd iterations per subspace) lifts recall ~40%
    at equal codebook size and the curve keeps rising with codebook size —
    the production point is 256 codes/subspace, beyond this corpus's 500
    vectors. The ceiling here is the data: near-orthogonal random vectors
    are PQ's worst case (no cluster structure for codebooks to exploit), so
    read the curve's SHAPE, not its absolute level, and re-run this audit
    on real embeddings before choosing m/k. An IVF coarse stage in front
    (`ivfpq_topk`) prunes the scan without changing the ADC ranking inside
    a cell. This audit exists so that tuning is measured, not assumed."""
    spark = vectors.sparkSession
    m = len(sub_centroids)
    qrows = queries.orderBy(query_id).collect()
    lut_rows = []
    for qr in qrows:
        qv = [float(x) for x in qr[vec_col]]
        offset = 0
        for j, book in enumerate(sub_centroids):
            width = len(book[0])
            qj = qv[offset : offset + width]
            for code, cvec in enumerate(book):
                d = round(sum((q - c) ** 2 for q, c in zip(qj, cvec)), 6)
                lut_rows.append((int(qr[query_id]), j, code, f"{d:.6f}"))
            offset += width
    lut = spark.createDataFrame(
        lut_rows, f"{query_id} long, j int, code int, __d string"
    ).select(query_id, "j", "code", F.col("__d").cast("decimal(18,6)").alias("__d"))

    stack_args = ", ".join(f"{j}, {code_prefix}{j}" for j in range(m))
    codes_long = codes.select(
        F.col(id_col), F.expr(f"stack({m}, {stack_args}) as (j, code)")
    )
    adc = (
        codes_long.join(F.broadcast(lut), ["j", "code"])
        .groupBy(query_id, id_col)
        .agg(F.round(F.sum("__d").cast("double"), 6).alias("__adc"))
        .where(F.col(id_col) != F.col(query_id))
    )
    wq = Window.partitionBy(query_id)
    adc_top = (
        adc.withColumn(
            "__r",
            F.row_number().over(wq.orderBy(F.asc("__adc"), F.asc(id_col))),
        )
        .where(F.col("__r") <= k)
        .select(query_id, id_col)
    )

    qv_col = F.col(f"__q.{vec_col}")
    vd = _as_double(F.col(f"v.{vec_col}"))
    qd = _as_double(qv_col)
    l2 = F.aggregate(
        F.zip_with(vd, qd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth = (
        vectors.alias("v")
        .crossJoin(F.broadcast(queries.alias("__q")))
        .where(F.col(f"v.{id_col}") != F.col(f"__q.{query_id}"))
        .select(
            F.col(f"__q.{query_id}").alias(query_id),
            F.col(f"v.{id_col}").alias(id_col),
            F.round(l2, 6).alias("__l2"),
        )
    )
    truth_top = (
        truth.withColumn(
            "__r",
            F.row_number().over(wq.orderBy(F.asc("__l2"), F.asc(id_col))),
        )
        .where(F.col("__r") <= k)
        .select(query_id, id_col)
    )
    hits = adc_top.join(truth_top, [query_id, id_col]).groupBy(query_id).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    base = queries.select(F.col(query_id))
    return (
        base.join(hits, query_id, "left")
        .select(
            query_id,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
    )


def lloyd_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """IVF coarse-quantizer TRAINING: deterministic quantized Lloyd k-means.

    Init = the k smallest-id vectors selected by ORDER BY id LIMIT k
    (TakeOrderedAndProject — works for sparse, offset, or string ids) and
    re-numbered to centroid_id 0..k-1 in id order — a write-once
    deterministic seed, no RNG. Each round assigns every vector to its
    nearest centroid by cosine
    (assign_centroids' deterministic tie-break) and recomputes centroids as
    the element-wise mean of their members, QUANTIZED to ``round_dp``
    decimals. The quantization is what makes the algorithm reproducible
    across engines: an unrounded mean differs in the last ulp between any
    two summation orders, and Lloyd amplifies that into different
    assignments next round — rounding at 1e-6 collapses both engines onto
    the same trajectory. Empty clusters keep their previous centroid.

    Scale shape per round: one broadcast crossJoin (k is small) + a
    max_by partial aggregate for assignment, then one shuffle keyed
    (centroid, dim position) for the means — dims travel as scalar rows, so
    skew is bounded by k*dim. Round results are localCheckpoint'd (k rows)
    to keep Catalyst analysis flat across iterations, the same lineage
    lesson as dedup.connected_components."""
    seeds = vectors.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k)
    rank_w = Window.orderBy(F.col(id_col))  # window over only the k seed rows
    centroids = (
        seeds.withColumn("centroid_id", (F.row_number().over(rank_w) - 1).cast("int"))
        .select(
            "centroid_id",
            F.transform(_as_double(F.col(vec_col)), lambda x: F.round(x, round_dp)).alias(
                vec_col
            ),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        assigned = assign_centroids(vectors, centroids, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select(
                "centroid_id", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("v"), round_dp).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("__new")
            )
        )
        centroids = (
            centroids.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("__new", F.col(vec_col)).alias(vec_col),
            )
            .localCheckpoint()
        )
    return centroids


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 as the left-to-right double fold — the same evaluation
    order as DuckDB's ``list_reduce(list_transform(...), (x,y) -> x+y)``,
    so both engines produce bit-identical distances (the `pq_recall` truth
    side already relies on this fold-order match)."""
    ad, bd = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """TRAIN product-quantization codebooks: deterministic quantized Lloyd
    k-means run independently in each of the ``m`` contiguous subspaces —
    the production path `pq_encode`'s docstring names (a seeded 8-code toy
    book measured recall@10 ≈ 0.18 on the gate corpus; trained books are
    how real PQ indexes reach useful recall, see the curve on `pq_recall`).

    One GROUPED Lloyd instead of m driver-looped ones: vectors explode to
    (subspace j, id, subvector) rows, and every training step carries ``j``
    as a key, so all m codebooks train in the same three-job-per-iteration
    plan — assignment is a broadcast join against the (m * k_codes)-row
    codebook table (bounded by construction, the one legitimate broadcast
    of this family) + a map-side-combined min_by per (j, id); means shuffle
    keyed (j, code, dim position), skew bounded by m * k_codes * width.
    Nothing here scales with corpus size except the two narrow passes over
    the subvector stream.

    Determinism mirrors ``lloyd_centroids`` exactly: seeds = the k_codes
    smallest-id subvectors per subspace (re-coded 0..k-1 in id order,
    rounded to ``round_dp``), squared-L2 assignment with ties to the
    LOWEST code, per-round means QUANTIZED to ``round_dp`` decimals (the
    rounding collapses both engines onto one trajectory — an unrounded
    mean differs in the last ulp between summation orders and Lloyd
    amplifies that into different assignments next round), empty clusters
    keep their previous centroid, per-round localCheckpoint (m * k_codes
    rows) to keep Catalyst analysis flat.

    DISCLOSED residual tolerance (ADVICE r13, same class as
    `lloyd_centroids`): the per-round mean is ``round(avg(raw doubles))``
    — the double avg is summation-order dependent, so a mean landing
    EXACTLY on a ``round_dp`` rounding boundary can round differently
    between partitionings/engines and fork the trained trajectory from
    that round on. An order-independent mean would require 6-dp-quantized
    INPUTS (the gate embeddings are full-precision floats, so that changes
    the trained books) or DECIMAL division (engine-divergent scale rules);
    the exposure is one boundary landing per (j, code, dim, round), has
    never been observed across 3 SFs + sf1 on the four consuming gates,
    and is accepted as the trained-PQ gate family's disclosed tolerance.

    Returns (j int, code int, ``vec_col`` array<double>) — feed through
    ``collect_codebooks`` into `pq_encode` / `pq_adc_topk` / `pq_recall`.
    The vector width is read from one planning-time row (bounded scalar
    collect, the `lloyd_centroids` posture)."""
    first = vectors.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    if first is None:
        raise ValueError("pq_train_codebooks: empty vectors frame")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"pq_train_codebooks: dim {dim} not divisible by m={m}")
    width = dim // m
    vd = _as_double(F.col(vec_col))
    subs = vectors.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(vd, j * width + 1, width).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("__s"),
    ).select(id_col, F.col("__s.j").alias("j"), F.col("__s.sv").alias("sv"))

    seed_w = Window.partitionBy("j").orderBy(F.col(id_col))
    codebooks = (
        subs.withColumn("__r", F.row_number().over(seed_w))
        .where(F.col("__r") <= k_codes)
        .select(
            "j",
            (F.col("__r") - 1).cast("int").alias("code"),
            F.transform(F.col("sv"), lambda x: F.round(x, round_dp)).alias("cv"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        scored = subs.join(F.broadcast(codebooks), "j").select(
            "j",
            id_col,
            "sv",
            "code",
            sq_l2(F.col("sv"), F.col("cv")).alias("__l2"),
        )
        assigned = (
            scored.groupBy("j", id_col)
            .agg(
                F.min_by(
                    F.struct("code", "sv"), F.struct(F.col("__l2"), F.col("code"))
                ).alias("__b")
            )
            .select("j", F.col("__b.code").alias("code"), F.col("__b.sv").alias("sv"))
        )
        means = (
            assigned.select("j", "code", F.posexplode("sv").alias("pos", "v"))
            .groupBy("j", "code", "pos")
            .agg(F.round(F.avg("v"), round_dp).alias("mv"))
            .groupBy("j", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s["mv"],
                ).alias("__new")
            )
        )
        codebooks = (
            codebooks.join(means, ["j", "code"], "left")
            .select("j", "code", F.coalesce("__new", F.col("cv")).alias("cv"))
            .localCheckpoint()
        )
    return codebooks.select("j", "code", F.col("cv").alias(vec_col))


def collect_codebooks(codebooks: DataFrame, *, vec_col: str = "embedding") -> list[list[list[float]]]:
    """Materialize a trained codebook frame (j, code, vec) into the nested
    list shape `pq_encode`/`pq_adc_topk`/`pq_recall` take. Bounded by
    construction: m * k_codes rows (the trained quantizer — same driver
    posture as `assign_centroids_rowlocal`'s centroid list)."""
    rows = codebooks.select("j", "code", vec_col).collect()
    if not rows:
        raise ValueError("collect_codebooks: empty codebook frame")
    m = max(int(r["j"]) for r in rows) + 1
    books: list[dict[int, list[float]]] = [dict() for _ in range(m)]
    for r in rows:
        books[int(r["j"])][int(r["code"])] = [float(x) for x in r[vec_col]]
    out = []
    for j, d in enumerate(books):
        if sorted(d) != list(range(len(d))):
            raise ValueError(f"collect_codebooks: non-contiguous codes in subspace {j}")
        out.append([d[c] for c in range(len(d))])
    return out


def ivfpq_topk(
    assigned: DataFrame,
    sub_centroids: list[list[list[float]]],
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    exclude_id=None,
) -> DataFrame:
    """IVF-PQ: coarse cell selection + asymmetric-distance top-k inside the
    probed cells — the composed layout of billion-vector indexes (FAISS's
    IVFADC): the coarse quantizer prunes the scan to nprobe/nlist of the
    corpus, PQ codes compress what is left to m bytes per vector, and the
    query stays un-quantized on both stages.

    ``assigned`` is the `assign_centroids` output (vectors + cell id);
    ``sub_centroids`` the trained codebooks (`pq_train_codebooks` through
    `collect_codebooks`). Probe selection scores the bounded centroid table
    against the literal query (cosine — the same coarse metric the
    assignment used) and keeps the nprobe best; the ADC stage is
    `pq_adc_topk`'s zero-exchange shape over only the probed cells' codes.

    Encode-at-query here keeps the operator self-contained for the gate
    corpus; the production layout runs `pq_encode` ONCE at ingest and
    stores the code columns partitioned by cell id, so a query reads
    nprobe/nlist of an m-bytes-per-vector table via partition pruning and
    the raw vectors never load."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    # probe selection sorts the CENTROID table, bounded by nlist (65k at
    # FAISS scale — one tiny TakeOrderedAndProject, never corpus-sized);
    # the codes-lake path (`ivfpq_lake_topk`) moves even this driver-side
    # so the probed cells become literal partition filters.
    probe = (
        centroids.select(
            F.col(centroid_id),
            cosine(F.col(vec_col), qv).alias("__pcos"),
        )
        .orderBy(F.desc("__pcos"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id)
    )
    bucket = assigned.join(F.broadcast(probe), centroid_id)
    if exclude_id is not None:
        bucket = bucket.where(F.col(id_col) != F.lit(exclude_id))
    codes = pq_encode(bucket, sub_centroids, vec_col=vec_col)
    return pq_adc_topk(codes, sub_centroids, query_vec, k, id_col=id_col)


def coarse_probes(
    centroid_rows: list[tuple[int, list[float]]],
    query_vec: list[float],
    nprobe: int,
    *,
    op: str = "coarse_probes",
) -> list[tuple[int, list[float]]]:
    """Driver-side coarse probe selection over the bounded quantizer: the
    ``nprobe`` centroids with max cosine(query, centroid), ties to the
    LOWEST centroid id — the same rule as `assign_centroids`. Shared by
    `ivfpq_residual_topk` (needs the centroid vector per probe for the
    query residual) and `ivfpq_lake_topk` (needs LITERAL cell ids so the
    probe becomes a partition filter on the codes lake — a DataFrame-side
    probe would be a join, not a prune).

    The cosine mirrors the engine fold exactly: left-to-right sums from
    0.0 (Python sum == F.aggregate == DuckDB list_reduce) and libm sqrt.
    Raises (ADVICE r13, named loud) when no centroid is probeable — a
    zero/degenerate query or all-zero centroid set leaves every coarse
    cosine undefined and the query cannot be routed."""
    import math

    if not centroid_rows:
        raise ValueError(f"{op}: no centroids supplied")

    def _cos(q, c):
        num = sum(float(a) * float(b) for a, b in zip(q, c))
        nq = math.sqrt(sum(float(a) * float(a) for a in q))
        nc = math.sqrt(sum(float(b) * float(b) for b in c))
        den = nq * nc
        return None if den <= 0 else num / den

    scored = []
    for cid, cvec in centroid_rows:
        cos = _cos(query_vec, cvec)
        if cos is not None:
            scored.append((-cos, cid, cvec))
    scored.sort(key=lambda t: (t[0], t[1]))
    if not scored:
        raise ValueError(
            f"{op}: no probeable centroid for query "
            "(all coarse cosines undefined — zero/degenerate query vector "
            "or centroid set)"
        )
    return [(cid, cvec) for _, cid, cvec in scored[:nprobe]]


def residual_vectors(
    assigned: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    out_col: str = "residual",
) -> DataFrame:
    """Per-vector coarse residual r = v - centroid(v) — the quantity real
    IVFADC (FAISS IVF-PQ) compresses: residuals concentrate near the origin
    inside each cell, so a shared PQ codebook spends its codes on the
    within-cell displacement instead of re-encoding the cell's absolute
    position, which is what makes PQ-on-residuals materially more accurate
    than PQ-on-raw-vectors at equal bits.

    One broadcast join against the bounded centroid table + an element-wise
    zip_with subtract — narrow, no shuffle beyond the broadcast; exact IEEE
    doubles on both engines (cast then subtract), so the downstream trained
    codebooks walk identical trajectories."""
    c = centroids.select(
        F.col(centroid_id), _as_double(F.col(vec_col)).alias("__cvec")
    )
    vd = _as_double(F.col(vec_col))
    return (
        assigned.join(F.broadcast(c), centroid_id)
        .withColumn(out_col, F.zip_with(vd, F.col("__cvec"), lambda x, y: x - y))
        .drop("__cvec")
    )


def ivfpq_residual_topk(
    assigned: DataFrame,
    sub_centroids: list[list[list[float]]],
    centroid_rows: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    exclude_id=None,
) -> DataFrame:
    """Residual IVF-PQ search — the full FAISS IVFADC query path: probe the
    nprobe coarse cells nearest the query, form the QUERY residual
    q - centroid_c PER CELL, and rank by asymmetric distance between that
    residual and the cells' residual-PQ codes. Approximates
    ||q - v||^2 = ||(q - c) - (v - c)||^2 per cell with both sides in
    residual space, so the coarse term cancels exactly and the codebook
    only ever measures within-cell displacement.

    ``sub_centroids`` must be TRAINED ON RESIDUALS (`residual_vectors` ->
    `pq_train_codebooks`); ``centroid_rows`` is the driver-collected coarse
    quantizer (k rows — the `assign_centroids_rowlocal` posture), needed
    row-side because each probed cell has its own query residual and LUT.
    Probe order: max cosine(q, c), ties to the lowest centroid id — the
    same rule as `assign_centroids`. Per-cell ADC plans are unioned;
    global top-k stays TakeOrderedAndProject; final ties break to the
    smaller id across cells.

    Encode-at-query keeps the gate self-contained; production encodes
    residuals once at ingest and stores code columns partitioned by cell,
    so a query reads nprobe/nlist of an m-bytes-per-vector table.

    MEASURED quality caveat (sf0.01 gate corpus, 500 near-orthogonal
    synthetic vectors, 8 cells, m=8, 16 trained codes, 20 queries,
    recall@10): raw-vector IVF-PQ (`ivfpq_topk`) 0.250/0.315 at
    nprobe 1/2; THIS residual path 0.200 FLAT across nprobe — extra
    probes never contribute. Mechanism, verified on the per-cell ADC
    distributions: with only 16 codes over 8-dim near-orthogonal
    residuals, quantized reconstructions collapse toward the cell's mean
    residual (~0), so the ADC estimate degenerates to ≈ ||q - c_cell||²
    — a per-cell CONSTANT (own cell: ADC median 0.77 vs true 1.66;
    neighbor cell: 1.67 vs 2.00) — and the nearest cell's candidates
    always outrank every other probe's. This is the textbook
    undertrained-PQ failure, amplified in residual space; the residual
    layout only pays off when codebooks preserve residual energy
    (FAISS-scale: 256 codes/subspace) AND cells have real cluster
    structure.

    r14 UPDATE — the crossover is now MEASURED, not asserted
    (scripts/ivfpq_recall_audit.py; full table in SCALE.md §9): 64-code
    books cure the collapse (residual 0.300/0.330 at nprobe 1/2 — probes
    contribute again) but raw still leads on the unstructured gate corpus
    (0.305/0.400); on a genuinely CLUSTERED corpus (σ=0.15 around 8 unit
    centers) residual beats raw at every size and the gap grows with
    codebook size (16 codes: 0.420 vs 0.390; 64 codes: 0.555 vs 0.465),
    converging back to parity as structure weakens (σ=0.40: equal).
    Decision rule: prefer residual when cells genuinely cluster and
    codebooks are ≥64/subspace; otherwise `ivfpq_topk` (raw) + nprobe."""
    probes = coarse_probes(
        centroid_rows, query_vec, nprobe, op="ivfpq_residual_topk"
    )

    plans = []
    for cid, cvec in probes:
        q_resid = [float(q) - float(c) for q, c in zip(query_vec, cvec)]
        bucket = assigned.where(F.col(centroid_id) == int(cid))
        if exclude_id is not None:
            bucket = bucket.where(F.col(id_col) != F.lit(exclude_id))
        resid = bucket.withColumn(
            "__resid",
            F.zip_with(
                _as_double(F.col(vec_col)),
                F.array(*[F.lit(float(c)) for c in cvec]),
                lambda x, y: x - y,
            ),
        )
        codes = pq_encode(resid, sub_centroids, vec_col="__resid")
        tables = []
        offset = 0
        for j, book in enumerate(sub_centroids):
            width = len(book[0])
            qj = q_resid[offset : offset + width]
            lut = [
                round(sum((float(q) - float(c)) ** 2 for q, c in zip(qj, cv)), 6)
                for cv in book
            ]
            expr = F.lit(None).cast("decimal(18,6)")
            for code, dist in enumerate(lut):
                expr = F.when(
                    F.col(f"pq{j}") == code,
                    F.lit(f"{dist:.6f}").cast("decimal(18,6)"),
                ).otherwise(expr)
            tables.append(expr)
            offset += width
        total = tables[0]
        for t in tables[1:]:
            total = total + t
        plans.append(
            codes.select(
                F.col(id_col), F.round(total.cast("double"), 6).alias("adc_dist")
            )
        )
    scored_df = plans[0]
    for p in plans[1:]:
        scored_df = scored_df.unionByName(p)
    top = scored_df.orderBy(
        F.asc_nulls_last("adc_dist"), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


_LAKE_MANIFEST = "_codebook_version.json"


def codebook_fingerprint(sub_centroids: list[list[list[float]]]) -> str:
    """Deterministic fingerprint of a trained codebook set: md5 over the
    shortest-round-trip JSON of the nested float lists (json.dumps uses
    repr-style floats, which round-trip IEEE doubles exactly), truncated
    to 16 hex chars. Codes are only meaningful relative to the books that
    produced them, so this IS the lake's schema version."""
    import hashlib
    import json

    canon = json.dumps(
        [[[float(x) for x in cent] for cent in sub] for sub in sub_centroids]
    )
    return hashlib.md5(canon.encode()).hexdigest()[:16]


def rotation_fingerprint(rotation: list[list[float]]) -> str:
    """Deterministic fingerprint of an OPQ rotation matrix — same
    md5-of-round-trip-JSON scheme as `codebook_fingerprint`: rotated
    codes are only meaningful relative to (rotation, books), so a
    rotate-at-ingest lake stamps BOTH."""
    import hashlib
    import json

    canon = json.dumps([[float(x) for x in row] for row in rotation])
    return hashlib.md5(canon.encode()).hexdigest()[:16]


def _lake_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path, _LAKE_MANIFEST)
    return jvm, hp, hp.getFileSystem(spark._jsc.hadoopConfiguration())


def write_lake_manifest(
    spark: SparkSession,
    path: str,
    sub_centroids: list[list[list[float]]],
    *,
    rotation: list[list[float]] | None = None,
) -> None:
    """Stamp ``path`` with its codebook fingerprint (sidecar
    ``_codebook_version.json`` — underscore-prefixed, so every parquet
    scan ignores it and the lake's data schema is untouched). Uses the
    Hadoop FileSystem API, so the stamp works on whatever storage the
    lake lives on (local in tests, HDFS/S3 at scale)."""
    import json

    jvm, hp, fs = _lake_fs(spark, path)
    payload = {
        "fingerprint": codebook_fingerprint(sub_centroids),
        "m": len(sub_centroids),
    }
    if rotation is not None:
        payload["rotation"] = rotation_fingerprint(rotation)
    out = fs.create(hp, True)
    try:
        out.write(bytearray(json.dumps(payload).encode()))
    finally:
        out.close()


def read_lake_manifest(spark: SparkSession, path: str) -> dict | None:
    """Read a lake root's codebook manifest; None for a pre-stamp lake."""
    import json

    jvm, hp, fs = _lake_fs(spark, path)
    if not fs.exists(hp):
        return None
    stream = fs.open(hp)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(txt)


def _verify_lake_codebooks(
    spark: SparkSession,
    paths: list[str],
    sub_centroids: list[list[list[float]]],
    op: str,
    *,
    rotation: list[list[float]] | None = None,
) -> None:
    """Fail loud when a stamped lake root was encoded by DIFFERENT books
    than the ones handed to the query/compaction (VERDICT r14 #4): a
    version-mismatched read would otherwise silently NULL-sink every row
    (query) or merge incompatible codes (compaction). Unstamped roots
    (pre-stamp lakes) pass unchecked — stamping is forward-looking."""
    want = codebook_fingerprint(sub_centroids)
    want_rot = rotation_fingerprint(rotation) if rotation is not None else None
    for p in paths:
        manifest = read_lake_manifest(spark, p)
        if manifest is None:
            continue
        if manifest.get("fingerprint") != want:
            raise ValueError(
                f"{op}: codes lake at {p!r} was encoded with codebook "
                f"version {manifest.get('fingerprint')}, but the supplied "
                f"books fingerprint as {want} — refusing to decode codes "
                "against the wrong codebooks (re-encode the lake or pass "
                "the books that built it)"
            )
        if manifest.get("rotation") != want_rot:
            raise ValueError(
                f"{op}: codes lake at {p!r} was encoded with OPQ rotation "
                f"{manifest.get('rotation')}, but the caller supplied "
                f"rotation {want_rot} — a rotate-at-ingest lake must be "
                "queried with the SAME rotation (and an unrotated lake "
                "with none)"
            )


def write_pq_lake(
    assigned: DataFrame,
    sub_centroids: list[list[list[float]]],
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    code_prefix: str = "pq",
    mode: str = "overwrite",
    rotation: list[list[float]] | None = None,
) -> None:
    """Materialize the IVF-PQ CODES LAKE — the production layout
    `ivfpq_topk`'s docstring names: `pq_encode` runs ONCE at ingest, and
    what is persisted is ONLY (id, m code columns), parquet-partitioned by
    coarse cell id. Raw vectors never reach the lake: at 100 TB of
    float32 embeddings the codes lake is m bytes/vector (a ~32× shrink at
    m=8 on 64-dim floats), and every query that follows reads
    nprobe/nlist of THAT via directory-level partition pruning
    (`ivfpq_lake_topk`).

    ``assigned`` is `assign_centroids` output (vectors + cell id);
    ``sub_centroids`` the trained codebooks (train on the SAME layout the
    query will use — raw vectors here; see `ivfpq_residual_topk`'s
    measured caveat before choosing residual books). Encoding is a
    stateless narrow map, so the write runs at source parallelism with no
    shuffle; per-cell directories keep each posting list's code streams
    contiguous (the scan shape ADC wants). Streaming ingest appends with
    the same layout via `streaming.ann_stream.streaming_pq_encode` +
    partitionBy on the writeStream."""
    m = len(sub_centroids)
    spark = assigned.sparkSession
    if mode == "append":
        # appending codes from DIFFERENT books (or a different rotation)
        # to a stamped lake would silently mix incompatible code spaces —
        # the mismatch the version stamp exists to catch (VERDICT r14 #4)
        _verify_lake_codebooks(
            spark, [path], sub_centroids, "write_pq_lake", rotation=rotation
        )
    src = assigned
    if rotation is not None:
        # OPQ rotate-at-ingest: cells were assigned on the UNROTATED
        # vectors (orthogonal R preserves cosines, so the cell layout is
        # identical); only the code space rotates. The rotation rides
        # the same narrow encode pass — zero extra exchange.
        src = opq_rotate(assigned, rotation, vec_col=vec_col)
    codes = pq_encode(src, sub_centroids, vec_col=vec_col,
                      code_prefix=code_prefix)
    cols = [id_col, centroid_id] + [f"{code_prefix}{j}" for j in range(m)]
    codes.select(*cols).write.mode(mode).partitionBy(centroid_id).parquet(path)
    # stamp AFTER the write: overwrite mode deletes the whole directory,
    # manifest included
    write_lake_manifest(spark, path, sub_centroids, rotation=rotation)


def ivfpq_lake_topk(
    spark: SparkSession,
    path: str | list[str],
    sub_centroids: list[list[list[float]]],
    centroid_rows: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 1,
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    code_prefix: str = "pq",
    exclude_id=None,
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ top-k over the persisted codes lake (`write_pq_lake`) — the
    query path of the production layout: probe selection runs DRIVER-SIDE
    over the bounded coarse quantizer (`coarse_probes`, the
    `assign_centroids_rowlocal` posture) so the probed cells arrive as
    LITERAL ids; the literal `centroid_id IN (...)` lands in the parquet
    scan's PartitionFilters (directory pruning — unprobed cells are never
    listed, let alone read), the scan's ReadSchema is id + code columns
    only (no vector column exists in the lake to mistakenly load), and
    scoring is `pq_adc_topk`'s zero-exchange shape: driver-built LUT
    CASE-chains per code column into TakeOrderedAndProject.

    Per query the work is nprobe/nlist of an m-bytes-per-vector table —
    at 1B vectors, nlist=65536, nprobe=8: ~122k rows of m small ints per
    query, no re-encode, no join, no shuffle. Ranking is IDENTICAL to
    `ivfpq_topk` over the same books/corpus (same LUT, same 6-dp DECIMAL
    sum, same tiebreak), so the two share one oracle; the gate pins that
    equality, and `tests/test_lake.py`-style plan tests pin the pruning.

    ``path`` may be a LIST of lake roots — the growing-index layout:
    batch history (`write_pq_lake`) + the streamed tail lake
    (`streaming.ann_stream.streaming_pq_lake_ingest`), both
    partitionBy(cell). Each root is scanned separately (its own partition
    discovery — one multi-root relation would need a shared basePath) and
    the probed slices union; every scan carries the same PartitionFilters,
    so pruning holds per root. Read the merged view after the tail has
    drained a trigger (the direct read lists files, bypassing the file
    sink's _spark_metadata commit log); compaction of tail into history
    is the codebook-rebuild boundary."""
    probes = coarse_probes(
        centroid_rows, query_vec, nprobe, op="ivfpq_lake_topk"
    )
    probe_ids = [int(cid) for cid, _ in probes]
    paths = [path] if isinstance(path, str) else list(path)
    _verify_lake_codebooks(
        spark, paths, sub_centroids, "ivfpq_lake_topk", rotation=rotation
    )
    if rotation is not None:
        # probe with the RAW query (cells live in unrotated space); score
        # with the rotated query (codes live in rotated space)
        query_vec = rotate_query(rotation, query_vec)
    scans = [spark.read.parquet(p) for p in paths]
    lake = scans[0]
    for s in scans[1:]:
        lake = lake.unionByName(s)
    lake = lake.where(F.col(centroid_id).isin(probe_ids))
    if exclude_id is not None:
        lake = lake.where(F.col(id_col) != F.lit(exclude_id))
    return pq_adc_topk(
        lake, sub_centroids, query_vec, k, id_col=id_col,
        code_prefix=code_prefix,
    )


def refine_topk(
    shortlist: DataFrame,
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """REFINE stage over any ADC shortlist (FAISS's IndexRefineFlat): the
    compressed index (`pq_adc_topk` / `ivfpq_topk` / `ivfpq_lake_topk`)
    returns a k' > k candidate shortlist cheaply; this re-ranks those k'
    ids by EXACT squared L2 against their raw vectors and keeps the true
    top-k. The standard recall fix for quantization error: ADC only has
    to get the answer into the shortlist, not rank it perfectly — at
    k' = 4k the ADC's within-shortlist ordering mistakes are repaired at
    the cost of k' raw-vector fetches per query.

    Scale shape: the shortlist is k' ids (driver-bounded by construction),
    broadcast onto the raw-vector table — ONE semi-join against the id-
    partitioned vector lake fetches k' rows; the exact distance is the
    deterministic `sq_l2` fold; final ranking is a k'-row sort. The raw
    vectors are touched ONLY for the shortlist — the full-corpus scan
    stays codes-only. Ties break to the smaller id; distances round to 6
    decimals (cross-engine exact: same fold, same doubles).

    MEASURED lift (scripts/ivfpq_recall_audit.py --refine 4, full table
    in SCALE.md §9): +0.15-0.23 absolute recall@10 on the worst-case
    near-orthogonal corpus, and near-perfect on clustered data — the
    production point (residual books, 64 codes, nprobe 1, refine 4x)
    measures 0.995 recall@10 vs 0.555 for ADC alone.

    Fail-loud contract (ADVICE r14): a shortlisted id ABSENT from the
    raw-vector table (lake/vector-table drift after compaction, a partial
    backfill) raises at execution time naming the id, instead of silently
    returning fewer than k repaired rows. The check is in-plan: the
    k'-bounded fetch broadcasts back onto the authoritative shortlist as
    a left join, so the vector table is still scanned exactly once; the
    shortlist SUB-PLAN appears twice in the final plan (once to prune the
    fetch, once as the join's left side) — both k'-row evaluations;
    callers re-ranking an expensive shortlist many times can .persist()
    it first.

    Output: (id_col, l2_dist, rank), rank 1..k."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    ids = shortlist.select(id_col)
    fetched = vectors.join(F.broadcast(ids), id_col).select(
        F.col(id_col), F.col(vec_col).alias("__vv")
    )
    cand = ids.join(F.broadcast(fetched), id_col, "left").select(
        F.col(id_col),
        F.when(
            F.col("__vv").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "refine_topk: shortlisted id absent from the "
                        "raw-vector table (lake/vector drift): "
                    ),
                    F.col(id_col).cast("string"),
                )
            ).cast("double"),
        )
        .otherwise(F.round(sq_l2(F.col("__vv"), qv), 6))
        .alias("l2_dist"),
    )
    top = cand.orderBy(F.asc("l2_dist"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.asc("l2_dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def ivfpq_residual_lake_topk(
    spark: SparkSession,
    path: str | list[str],
    sub_centroids: list[list[list[float]]],
    centroid_rows: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 1,
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    code_prefix: str = "pq",
    exclude_id=None,
) -> DataFrame:
    """Residual IVFADC over the persisted codes lake — the MEASURED
    production point served from the production layout (SCALE.md §9: on
    clustered corpora residual books beat raw and the refine stage lifts
    this configuration to ~0.995 recall@10). The lake holds RESIDUAL
    codes: build it with
    ``write_pq_lake(residual_vectors(assigned, centroids), books, path,
    vec_col="residual")`` — encode once at ingest, codes partitioned by
    cell, raw vectors and residuals never persisted.

    Query path mirrors `ivfpq_residual_topk` with the encode removed:
    driver-side probe selection (`coarse_probes`), PER-CELL query
    residual q - c and per-cell LUT (each probed cell has its own lookup
    table — the reason the scan is per cell, not one isin), each cell a
    partition-pruned codes-only scan scored by the decimal CASE chain,
    unioned into one nulls-last TakeOrderedAndProject. Ties to the
    smaller id across cells. Multi-root ``path`` as in `ivfpq_lake_topk`
    (history + streamed tail; `streaming_pq_lake_ingest` with a
    residual-books encode writes the tail)."""
    probes = coarse_probes(
        centroid_rows, query_vec, nprobe, op="ivfpq_residual_lake_topk"
    )
    paths = [path] if isinstance(path, str) else list(path)
    _verify_lake_codebooks(
        spark, paths, sub_centroids, "ivfpq_residual_lake_topk"
    )

    def _cell_scan():
        scans = [spark.read.parquet(p) for p in paths]
        out = scans[0]
        for s in scans[1:]:
            out = out.unionByName(s)
        return out

    plans = []
    for cid, cvec in probes:
        q_resid = [float(q) - float(c) for q, c in zip(query_vec, cvec)]
        bucket = _cell_scan().where(F.col(centroid_id) == int(cid))
        if exclude_id is not None:
            bucket = bucket.where(F.col(id_col) != F.lit(exclude_id))
        tables = []
        offset = 0
        for j, book in enumerate(sub_centroids):
            width = len(book[0])
            qj = q_resid[offset : offset + width]
            lut = [
                round(sum((float(q) - float(c)) ** 2 for q, c in zip(qj, cv)), 6)
                for cv in book
            ]
            expr = F.lit(None).cast("decimal(18,6)")
            for code, dist in enumerate(lut):
                expr = F.when(
                    F.col(f"{code_prefix}{j}") == code,
                    F.lit(f"{dist:.6f}").cast("decimal(18,6)"),
                ).otherwise(expr)
            tables.append(expr)
            offset += width
        total = tables[0]
        for t in tables[1:]:
            total = total + t
        plans.append(
            bucket.select(
                F.col(id_col), F.round(total.cast("double"), 6).alias("adc_dist")
            )
        )
    scored_df = plans[0]
    for p in plans[1:]:
        scored_df = scored_df.unionByName(p)
    top = scored_df.orderBy(
        F.asc_nulls_last("adc_dist"), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.asc_nulls_last("adc_dist"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def compact_pq_lake(
    spark: SparkSession,
    paths: list[str],
    out_path: str,
    *,
    sub_centroids: list[list[list[float]]] | None = None,
    rotation: list[list[float]] | None = None,
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
) -> None:
    """Fold the streamed TAIL lake(s) back into one history lake — the
    codebook-rebuild-boundary maintenance step the lake docstrings name:
    read every root (each with its own partition discovery, the
    `ivfpq_lake_topk` multi-root rule), union, and rewrite ONE
    partitionBy(cell) lake. Codes are immutable facts about (vector,
    codebook), so compaction is a pure re-layout: no dedup logic beyond
    dropping exact duplicate ids (a tail replayed into a fresh checkpoint
    after an at-least-once recovery; duplicate rows are BIT-IDENTICAL —
    the same vector through the same frozen books gives the same cell and
    codes — so any survivor is the right one). Run it when tails
    accumulate (many small files per cell slow the probe's directory
    listing) or at a codebook version bump (where the lake is re-encoded
    wholesale anyway).

    The rewrite is one id-keyed exchange at scan parallelism — the same
    cost class as the original ingest; do NOT compact per query.

    Codebook-version safety (VERDICT r14 #4): when ``sub_centroids`` is
    supplied, every STAMPED source must match its fingerprint; without
    it, all stamped sources must agree with EACH OTHER — merging lakes
    encoded by different books is exactly the silent corruption the
    stamp exists to catch. The common manifest (or the supplied books')
    propagates to the compacted output."""
    import os

    if not paths:
        raise ValueError("compact_pq_lake: no source lakes supplied")
    # Normalize before comparing (ADVICE r14): raw string equality lets a
    # trailing slash, a relative spelling, or a symlink of the same
    # directory bypass the guard — and overwrite mode would then clobber
    # a source lake mid-read. realpath resolves symlinks and dot
    # segments; rstrip removes trailing separators.
    def _norm(p: str) -> str:
        return os.path.realpath(os.path.abspath(p)).rstrip(os.sep)

    if _norm(out_path) in {_norm(p) for p in paths}:
        raise ValueError(
            "compact_pq_lake: out_path must not be a source lake "
            "(the rewrite would read its own partial output)"
        )
    if sub_centroids is not None:
        _verify_lake_codebooks(
            spark, paths, sub_centroids, "compact_pq_lake", rotation=rotation
        )
        out_manifest = {
            "fingerprint": codebook_fingerprint(sub_centroids),
            "m": len(sub_centroids),
        }
        if rotation is not None:
            out_manifest["rotation"] = rotation_fingerprint(rotation)
    else:
        stamped = {
            p: m for p in paths if (m := read_lake_manifest(spark, p))
        }
        prints = {
            (m["fingerprint"], m.get("rotation")) for m in stamped.values()
        }
        if len(prints) > 1:
            detail = ", ".join(
                f"{p!r}={m['fingerprint']}/{m.get('rotation')}"
                for p, m in stamped.items()
            )
            raise ValueError(
                "compact_pq_lake: source lakes were encoded with DIFFERENT "
                f"codebook/rotation versions ({detail}) — merging them "
                "would mix incompatible code spaces; re-encode to one "
                "codebook first"
            )
        out_manifest = next(iter(stamped.values()), None)
    scans = [spark.read.parquet(p) for p in paths]
    lake = scans[0]
    for s in scans[1:]:
        lake = lake.unionByName(s)
    merged = lake.dropDuplicates([id_col])
    merged.write.mode("overwrite").partitionBy(centroid_id).parquet(out_path)
    if out_manifest is not None:
        import json as _json

        jvm, hp, fs = _lake_fs(spark, out_path)
        out = fs.create(hp, True)
        try:
            out.write(bytearray(_json.dumps(out_manifest).encode()))
        finally:
            out.close()


def ivfpq_lake_batch_topk(
    spark: SparkSession,
    path: str | list[str],
    sub_centroids: list[list[list[float]]],
    centroid_rows: list[tuple[int, list[float]]],
    queries: DataFrame,
    k: int = 10,
    *,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    query_id: str = "query_id",
    code_prefix: str = "pq",
    exclude_self: bool = False,
    max_lut_rows: int | None = 4_000_000,
) -> DataFrame:
    """BATCHED IVF-PQ over the codes lake — the throughput path: a QUERY
    SET amortizes one pruned scan instead of paying a plan per query
    (the production serving shape; `ivfpq_lake_topk` is the single-query
    form and the per-query parity pin).

    The query batch is collected driver-side (the bounded audit-sample
    posture of `pq_recall` — a serving tier feeds batches of
    hundreds/thousands; an unbounded stream is chunked into such batches
    upstream). Per query the driver builds the coarse probes
    (`coarse_probes`, same rule everywhere) and the decimal ADC lookup
    table; both become SMALL broadcast tables:

    - probe table (query_id, cell): joined to the lake on the partition
      column, restricting each query to its probed cells;
    - the scan itself is STATICALLY pruned to the UNION of all probed
      cells via a literal isin PartitionFilter (at nlist=65k and a
      1k-query batch with nprobe=8 that union is still <=8k of 65k
      directories — the batch never un-prunes the scan);
    - LUT table (query_id, j, code, decimal d): joined to the STACKED
      code columns, then one (query, vector)-keyed exact DECIMAL sum —
      map-side combined, m rows in, one row out.

    Ranking per query: window top-k over the probed candidates (nulls
    last — codebook/codes mismatch sinks, as in `pq_adc_topk`), ties to
    the smaller id. Output (query_id, id_col, adc_dist, rank); identical
    per query to `ivfpq_lake_topk` (parity pinned by property test).
    ``exclude_self`` drops candidates whose id equals the query id (the
    audit convention when queries are corpus members)."""
    m = len(sub_centroids)
    qrows = queries.orderBy(query_id).collect()
    if not qrows:
        raise ValueError("ivfpq_lake_batch_topk: empty query batch")
    # planning-time LUT budget (VERDICT r14 #5, the winnow_candidate_pairs
    # budget posture): the driver materializes batch x sum(codes-per-book)
    # LUT rows before anything distributed runs — an oversized batch must
    # fail loud naming the knob, not OOM the driver mid-build
    codes_per_query = sum(len(book) for book in sub_centroids)
    lut_budget = len(qrows) * codes_per_query
    if max_lut_rows is not None and lut_budget > max_lut_rows:
        raise ValueError(
            f"ivfpq_lake_batch_topk: the driver-built ADC LUT would hold "
            f"{lut_budget} rows ({len(qrows)} queries x {codes_per_query} "
            f"(m x codes) per query), exceeding max_lut_rows="
            f"{max_lut_rows}. Chunk the query set into smaller batches "
            "upstream, or raise max_lut_rows (pass None to disable) if "
            "the driver has the memory."
        )
    probe_rows, lut_rows = [], []
    for qr in qrows:
        qid = int(qr[query_id])
        qv = [float(x) for x in qr[vec_col]]
        for cid, _ in coarse_probes(
            centroid_rows, qv, nprobe, op="ivfpq_lake_batch_topk"
        ):
            probe_rows.append((qid, int(cid)))
        offset = 0
        for j, book in enumerate(sub_centroids):
            width = len(book[0])
            qj = qv[offset : offset + width]
            for code, cvec in enumerate(book):
                d = round(sum((q - c) ** 2 for q, c in zip(qj, cvec)), 6)
                lut_rows.append((qid, j, code, f"{d:.6f}"))
            offset += width
    probes = spark.createDataFrame(
        probe_rows, f"{query_id} long, {centroid_id} long"
    )
    lut = spark.createDataFrame(
        lut_rows, f"{query_id} long, j int, code int, __d string"
    ).select(
        query_id, "j", "code", F.col("__d").cast("decimal(18,6)").alias("__d")
    )

    all_cells = sorted({c for _, c in probe_rows})
    paths = [path] if isinstance(path, str) else list(path)
    _verify_lake_codebooks(
        spark, paths, sub_centroids, "ivfpq_lake_batch_topk"
    )
    scans = [spark.read.parquet(p) for p in paths]
    lake = scans[0]
    for s in scans[1:]:
        lake = lake.unionByName(s)
    lake = lake.where(F.col(centroid_id).isin(all_cells))

    cand = lake.join(F.broadcast(probes), centroid_id)
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col(query_id))
    stack_args = ", ".join(f"{j}, {code_prefix}{j}" for j in range(m))
    codes_long = cand.select(
        F.col(query_id),
        F.col(id_col),
        F.expr(f"stack({m}, {stack_args}) as (j, code)"),
    )
    # LEFT join + an m-row completeness check: a code value outside the
    # codebook must NULL the whole distance (sinking nulls-last, exactly
    # like pq_adc_topk's CASE chain) — an inner join would silently drop
    # the subspace and UNDERSTATE the distance instead.
    scored = (
        codes_long.join(F.broadcast(lut), [query_id, "j", "code"], "left")
        .groupBy(query_id, id_col)
        .agg(
            F.when(
                F.count("__d") == m,
                F.round(F.sum("__d").cast("double"), 6),
            ).alias("adc_dist")
        )
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.asc_nulls_last("adc_dist"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "adc_dist", "rank")
    )


def refine_batch_topk(
    shortlists: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Batched refine — the second half of the serving path: re-rank every
    query's ADC shortlist (`ivfpq_lake_batch_topk` output, or any
    (query_id, id) candidate frame) by EXACT squared L2 in ONE plan. The
    shortlist union is k' x |batch| ids (bounded by construction) and
    broadcasts onto the raw-vector table — one semi-join fetches every
    needed vector exactly once even when queries share candidates; the
    query vectors join back by id (the batch is the small side) and the
    exact distance is the deterministic `sq_l2` fold; per-query window
    top-k closes. Raw vectors are touched ONLY for shortlisted ids — the
    full-corpus scan upstream stayed codes-only.

    Fail-loud contract (ADVICE r14, same as `refine_topk`): a
    shortlisted id with no raw vector raises at execution time naming
    the id — the fetch broadcasts back onto the pair frame as a left
    join (both sides k'x|batch|-bounded), so an incomplete repair can
    never silently return short.

    Output: (query_id, id_col, l2_dist, rank), rank 1..k per query —
    per query identical to the single-query `refine_topk` (parity pinned
    by pytest)."""
    pairs = shortlists.select(query_id, id_col)
    fetched = vectors.join(
        F.broadcast(pairs.select(id_col).distinct()), id_col
    ).select(F.col(id_col), F.col(vec_col).alias("__vv"))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    scored = (
        pairs.join(F.broadcast(fetched), id_col, "left")
        .join(F.broadcast(q), query_id)
        .select(
            query_id,
            id_col,
            F.when(
                F.col("__vv").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "refine_batch_topk: shortlisted id absent "
                            "from the raw-vector table (lake/vector "
                            "drift): "
                        ),
                        F.col(id_col).cast("string"),
                    )
                ).cast("double"),
            )
            .otherwise(F.round(sq_l2(F.col("__vv"), F.col("__qv")), 6))
            .alias("l2_dist"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("l2_dist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "l2_dist", "rank")
    )


# --- OPQ: learned rotation before product quantization (VERDICT r14 #3;
#     Ge et al., "Optimized Product Quantization", CVPR 2013 — FAISS's
#     default preprocessing for the codes-lake operating point). PQ
#     quantizes contiguous subspaces independently, so it wastes budget
#     when variance is unevenly spread or correlated ACROSS subspace
#     boundaries; an orthogonal rotation R applied before encoding
#     re-balances per-subspace energy. Compose as: opq_rotate -> the
#     existing pq_train_codebooks / pq_encode / ADC pipeline unchanged
#     (queries rotate by the same R before LUT construction). ---


def opq_rotate(
    vectors: DataFrame,
    rotation: list[list[float]],
    *,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> Column | DataFrame:
    """Apply a LITERAL d x d rotation to a vector column: out[i] =
    sum_j R[i][j] * v[j], each output dim the same left-to-right
    `dot` fold the whole similarity family uses — so two engines given
    the same literal matrix produce bit-identical rotated doubles (the
    oracle unrolls the identical expression). The rotation is pure
    narrow compute (no shuffle, no UDF); at d=64 the plan carries 64
    codegen'd 64-term folds. For d in the thousands, swap in a
    pandas_udf matmul — the call signature stays the same.

    Returns ``vectors`` with ``out_col`` (default: ``vec_col`` replaced)
    holding the rotated array<double>."""
    d = len(rotation)
    if any(len(r) != d for r in rotation):
        raise ValueError("opq_rotate: rotation must be square")
    vd = _as_double(F.col(vec_col))
    rotated = F.array(
        *[
            dot(F.array(*[F.lit(float(x)) for x in row]), vd)
            for row in rotation
        ]
    )
    return vectors.withColumn(out_col or vec_col, rotated)


def rotate_query(rotation: list[list[float]], query_vec: list[float]) -> list[float]:
    """Driver-side mirror of `opq_rotate` for the query vector: the SAME
    left-to-right fold (Python sum() == F.aggregate == list_reduce over
    identical doubles), so the LUT built from the rotated query matches
    the oracle's SQL-rotated query bit-for-bit."""
    out = []
    for row in rotation:
        acc = 0.0
        for r, q in zip(row, query_vec):
            acc = acc + float(r) * float(q)
        out.append(acc)
    return out


def deterministic_rotation(dim: int, n_givens: int | None = None) -> list[list[float]]:
    """A CONFIG-GRADE dense orthogonal matrix built from a fixed chain of
    Givens rotations in pure Python double arithmetic — bit-stable on
    every platform (no LAPACK/BLAS in the path), so the gate can embed
    it as literals on both engine sides. Angle/plane schedule is a fixed
    function of the chain index; after ~2d rotations every coordinate
    has mixed across subspace boundaries. This is the deterministic
    stand-in the OPQ GATE uses; production training learns R with
    `opq_train_rotation`."""
    n = n_givens if n_givens is not None else 2 * dim
    rot = [[1.0 if i == j else 0.0 for j in range(dim)] for i in range(dim)]
    for k in range(n):
        i = k % dim
        j = (k * 7 + 3) % dim
        if i == j:
            continue
        theta = 0.3 + 0.05 * (k % 13)
        import math

        c, s = math.cos(theta), math.sin(theta)
        for col in range(dim):
            a, b = rot[i][col], rot[j][col]
            rot[i][col] = c * a - s * b
            rot[j][col] = s * a + c * b
    return rot


def opq_train_rotation(
    vectors: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    *,
    iters: int = 3,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """LEARN the OPQ rotation by alternating minimization (the non-
    parametric OPQ of Ge et al. / FAISS OPQMatrix): repeat
    (1) train PQ codebooks on the rotated data (the existing
    deterministic grouped-Lloyd `pq_train_codebooks`), (2) re-solve the
    rotation as the orthogonal Procrustes optimum R = V U^T from
    svd(M), M = X^T X_hat — X the raw vectors, X_hat the codebook
    reconstruction of the rotated vectors. Returns (rotation, books)
    ready for `opq_rotate` + `pq_encode`.

    Scale shape: per alternation, PQ training's two narrow passes plus
    ONE map-side-combined aggregate for M — vectors explode to (row,
    out-dim) pairs (d rows per vector) and d per-dim sums accumulate the
    d x d correlation; the d^2-double M collects to the driver (bounded
    by construction) where numpy's d x d SVD runs in microseconds. Train
    on a bounded sample (FAISS default ~100k vectors) — the learned R
    generalizes; the full corpus only pays the narrow `opq_rotate` map
    at encode time.

    Determinism note: M's double sums are summation-order dependent, so
    the LEARNED rotation is run-stable but not cross-engine-gateable;
    the gate therefore exercises the rotation COMPOSITION with a
    `deterministic_rotation`, and the learned path is covered by pytest
    (orthogonality + quantization-error reduction) and the recall audit
    (scripts/ivfpq_recall_audit.py --opq)."""
    import numpy as np

    first = vectors.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    if first is None:
        raise ValueError("opq_train_rotation: empty vectors frame")
    d = int(first["d"])
    if d % m != 0:
        raise ValueError(f"opq_train_rotation: dim {d} not divisible by m={m}")
    rot = [[1.0 if i == j else 0.0 for j in range(d)] for i in range(d)]
    books: list[list[list[float]]] = []
    for _ in range(iters):
        rotated = opq_rotate(vectors, rot, vec_col=vec_col, out_col="__rot")
        cb = pq_train_codebooks(
            rotated.select(F.col(id_col), F.col("__rot").alias(vec_col)),
            m=m,
            k_codes=k_codes,
            iters=pq_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
        books = collect_codebooks(cb, vec_col=vec_col)
        codes = pq_encode(
            rotated, books, vec_col="__rot", code_prefix="__opq"
        )
        width = d // m
        recon_parts = []
        for j, book in enumerate(books):
            expr = F.array(*[F.lit(0.0)] * width)
            for code, cvec in enumerate(book):
                expr = (
                    F.when(
                        F.col(f"__opq{j}") == code,
                        F.array(*[F.lit(float(x)) for x in cvec]),
                    ).otherwise(expr)
                )
            recon_parts.append(expr)
        recon = F.concat(*recon_parts)
        vd = _as_double(F.col(vec_col))
        pairs = codes.select(
            vd.alias("__x"), recon.alias("__xh")
        ).select(
            F.posexplode("__x").alias("__i", "__xi"), F.col("__xh")
        )
        mrows = (
            pairs.groupBy("__i")
            .agg(
                *[
                    F.sum(
                        F.col("__xi") * F.element_at(F.col("__xh"), j + 1)
                    ).alias(f"__m{j}")
                    for j in range(d)
                ]
            )
            .collect()
        )
        M = np.zeros((d, d))
        for r in mrows:
            for j in range(d):
                M[int(r["__i"])][j] = float(r[f"__m{j}"])
        u, _s, vt = np.linalg.svd(M)
        rot = (vt.T @ u.T).tolist()
    # final books must pair with the FINAL rotation (each loop iteration
    # updates R after training, so the in-loop books lag one alternation)
    rotated = opq_rotate(vectors, rot, vec_col=vec_col, out_col="__rot")
    cb = pq_train_codebooks(
        rotated.select(F.col(id_col), F.col("__rot").alias(vec_col)),
        m=m,
        k_codes=k_codes,
        iters=pq_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    return rot, collect_codebooks(cb, vec_col=vec_col)
