"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- Exact dedup: hash-groupBy on a md5 fingerprint — one shuffle keyed by the
  16-byte hash, never by the document text (at 100 TB the shuffle carries
  hashes, not bodies).
- N-gram Jaccard: shingle inverted-index join (explode distinct shingles,
  self-join on shingle, count per pair). Quadratic only within a shingle's
  posting list — the LSH path below is the scale path when posting lists
  explode.
- MinHash+LSH: k permutations simulated by md5(i || shingle); the min is
  taken over the HEX STRING ordering, which is a valid uniform permutation
  min and — deliberately — reproducible in any engine with md5 (our DuckDB
  oracle included). Signatures band-hashed; only same-bucket pairs are
  verified. Band join is a shuffle on (band_id, band_hash): bounded fan-out,
  no all-pairs stage anywhere.
- SimHash: 64-bit majority-vote signature from the md5 of each shingle;
  near-dup = small Hamming distance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import normalized_text


def token_positions(
    docs: DataFrame, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(id_col, pos, w) — normalized word occurrences with their position.
    The shared tokenize front of shingle_stream and winnow_fingerprints;
    callers that need both (curate_corpus) compute it once and pass it to
    each via their ``words=`` parameter."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text)), " ")).alias("pos", "w"),
    ).where(F.col("w") != "")


def shingle_stream(
    docs: DataFrame,
    n: int = 3,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Word n-gram shingles per document, one row per OCCURRENCE (duplicates
    kept — cheaper by one exchange; use word_shingles when per-doc
    distinctness matters to the consumer).

    Formulated as posexplode + window `lead` so every stage stays inside
    whole-stage codegen. The obvious alternative — building the shingle
    array row-local with `F.transform(F.sequence(...), ...)` — measured
    ~50x slower: Spark evaluates higher-order functions on the interpreted
    path (one expression-tree walk + allocations per element). Shuffle
    profile: exactly one exchange, keyed by doc id — the window sort over
    the EXPLODED word stream (short strings); the document body itself is
    never shuffled. That exchange also redistributes a narrow scan (a
    single-row-group file reads as one task) to full parallelism before the
    CPU-dense md5 fan-out downstream, so no explicit repartition of the
    document frame is needed — an earlier docs-level repartition here both
    shuffled full bodies (violating this contract) and added bench
    variance, and was removed.

    ``words`` (r15): a caller that already holds the token_positions frame
    passes it here so the corpus is not re-tokenized."""
    from pyspark.sql import Window

    if words is None:
        words = token_positions(docs, id_col=id_col, text=text)
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", k).over(win) for k in range(1, n)]
    return (
        words.select(
            F.col(id_col),
            F.concat_ws(" ", *parts).alias("shingle"),
            parts[-1].isNotNull().alias("_full"),
        )
        .where("_full")
        .select(id_col, "shingle")
    )


def word_shingles(docs: DataFrame, n: int = 3, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document, one row per shingle."""
    return shingle_stream(docs, n, id_col=id_col, text=text).distinct()


def shingle_sets(docs: DataFrame, n: int = 3, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document distinct shingle set as an array column (grouped view of
    word_shingles)."""
    return (
        word_shingles(docs, n, id_col=id_col, text=text)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("shingles"))
    )


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Canonical id per exact-normalized-content group (min id wins)."""
    from pyspark.sql import Window

    h = F.md5(normalized_text(F.col(text)))
    w = Window.partitionBy("content_hash")
    return (
        docs.select(F.col(id_col), h.alias("content_hash"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def exact_dedup_keep_best(
    docs: DataFrame,
    score: Column,
    *,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exact dedup with a QUALITY keep-policy: within each normalized-
    content group the row with the highest ``score`` survives (ties break
    to the smallest id) — the curation variant of exact_dedup, where
    canonical-by-min-id would throw away the best copy. The argmax is a
    row_number over (score DESC, id ASC) broadcast back through a first_value
    window — works for ANY orderable id type (string doc_ids included),
    unlike the previous max_by-on-(score, -id) struct that required a
    numeric id."""
    from pyspark.sql import Window

    h = F.md5(normalized_text(F.col(text)))
    w = Window.partitionBy("content_hash")
    wo = w.orderBy(F.col("__score").desc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), score.alias("__score"), h.alias("content_hash"))
        .withColumn(
            "keep_id",
            F.first(id_col).over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .select(
            id_col,
            "content_hash",
            F.col("__score").alias("score"),
            "keep_id",
            "group_size",
            (F.col(id_col) != F.col("keep_id")).alias("is_dropped"),
        )
    )


def jaccard_pairs(
    shingles: DataFrame,
    min_intersection: int = 2,
    min_jaccard: float = 0.0,
    *,
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All document pairs sharing >= min_intersection shingles with their
    exact Jaccard similarity.

    ``max_doc_freq`` caps posting-list length: shingles appearing in more
    than that many documents are dropped from the ENTIRE computation
    (intersection AND per-doc sizes), so the result is the exact Jaccard on
    the capped shingle universe. Without the cap, one boilerplate shingle
    ("all rights reserved") shared by 10^6 documents makes the self-join
    quadratic inside its posting list — at 100 TB the cap is what keeps the
    inverted-index path usable; the hot set itself is tiny, so the filter is
    a broadcast anti-join, not a second shuffle."""
    if max_doc_freq is not None:
        hot = (
            shingles.groupBy("shingle")
            .agg(F.count_distinct(id_col).alias("__df"))
            .where(F.col("__df") > max_doc_freq)
            .select("shingle")
        )
        shingles = shingles.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("intersection"))
        .where(F.col("intersection") >= min_intersection)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    # NO broadcast hint on the sizes side: sizes has one row per DOCUMENT,
    # which at lake scale is billions of rows — forcing it into a broadcast
    # fails regardless of how tight the pairs budget is. Unhinted, AQE
    # broadcasts the small side it measures at runtime (the aggregated,
    # threshold-filtered pairs table — bounded, while sizes is unbounded).
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection") / (F.col("n_a") + F.col("n_b") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("id_a", "id_b", "intersection", "n_a", "n_b", "jaccard")


def _mh_slice(i: int) -> F.Column:
    """Permutation i = an 8-hex (32-bit) slice of a salted md5(shingle):
    two digests cover eight permutations (4x fewer hashes than one salted
    md5 per permutation — the split-the-bits MinHash construction). The
    slice must stay WIDE: a 16-bit slice was tried and the min of ~100
    draws from 2^16 concentrates near zero, flooding the LSH bands with
    fake collisions; 32-bit slices keep band agreement ≈ true signature
    agreement."""
    digest = F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("shingle")))
    return F.substring(digest, (i % 4) * 8 + 1, 8)


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, *, id_col: str = "doc_id"
) -> DataFrame:
    """k sliced-md5 permutation minima per doc (hex-string ordering), from
    exploded shingles via a codegen'd partial aggregate (map-side combine,
    one shuffle of k×8-byte rows per doc).

    Deliberately NOT an `array_min(transform(..., md5))` over a shingle-array
    column: Spark evaluates higher-order functions interpreted (no
    whole-stage codegen), which measured ~50× slower than the exploded
    aggregate for the same md5 count."""
    aggs = [F.min(_mh_slice(i)).alias(f"mh_{i}") for i in range(num_hashes)]
    return shingles.groupBy(id_col).agg(*aggs)


def shingle_set_table(shingles: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingles array, n) from exploded shingles — one groupBy
    exchange, reused by both sides of the verify join. n is the DISTINCT
    shingle count (collect_set dedups), so duplicate occurrences in the
    input are fine."""
    sets = shingles.groupBy(id_col).agg(F.collect_set("shingle").alias("shingles"))
    return sets.withColumn("n", F.size("shingles"))


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 64, bands: int = 16, *, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket."""
    rows_per_band = num_hashes // bands
    # one row per (doc, band) via stack() — a single generate over one pass
    # of the signature table, instead of a `bands`-way union that duplicates
    # the signature subtree per branch (and 2x again across the self-join).
    hashed = signatures.select(
        F.col(id_col),
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias(f"__h{b}")
            for b in range(bands)
        ],
    )
    stack_args = ", ".join(f"{b}, __h{b}" for b in range(bands))
    buckets = hashed.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_args}) as (band_id, band_hash)"),
    )
    a, b_ = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def verify_candidate_pairs(
    cands: DataFrame,
    sets: DataFrame,
    min_jaccard: float = 0.0,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard for CANDIDATE pairs only: join each side's shingle array
    and intersect row-local. Cost is O(|candidates|), never the all-pairs
    inverted-index join — at 100 TB this is two hash joins keyed on doc id
    plus a per-row array_intersect."""
    a = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    b = sets.select(
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("intersection", F.size(F.array_intersect("sh_a", "sh_b")))
        # a band collision between docs sharing NO shingle is a hash
        # accident, not a candidate — drop it regardless of the threshold
        .where(F.col("intersection") >= 1)
        .withColumn(
            "jaccard",
            F.col("intersection") / (F.col("n_a") + F.col("n_b") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "intersection", "n_a", "n_b", "jaccard")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.5,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline: shingle (map) -> ONE combined per-doc aggregate
    (k minhash minima AND the distinct-shingle set in the same exchange,
    partial-agg/map-side combined) -> band bucket-join (the ONLY
    quadratic-risk shuffle, bounded by bucket fan-out) -> exact verify on
    CANDIDATE pairs only (array_intersect after two id joins). No all-pairs
    stage anywhere. The single aggregate is referenced three times (banding,
    verify side a, verify side b) and computed once via ReuseExchange —
    fusing the former separate sigs/sets aggregates halves the exchanges
    over the shingle stream."""
    # duplicate shingle occurrences are harmless to BOTH consumers (min is
    # idempotent, collect_set dedups), so skip word_shingles' distinct
    # exchange and aggregate the raw occurrence stream directly.
    # ``shingles`` (r15): a caller that already holds the raw occurrence
    # stream (curate_corpus shares one materialized pass between this
    # pipeline and decontamination) passes it here so the corpus is not
    # re-tokenized; must be exactly shingle_stream(docs, shingle_n).
    sh = (
        shingles
        if shingles is not None
        else shingle_stream(docs, shingle_n, id_col=id_col, text=text)
    )
    combined = sh.groupBy(id_col).agg(
        F.collect_set("shingle").alias("shingles"),
        *[F.min(_mh_slice(i)).alias(f"mh_{i}") for i in range(num_hashes)],
    )
    sigs = combined.select(id_col, *[f"mh_{i}" for i in range(num_hashes)])
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col=id_col)
    sets = combined.select(id_col, "shingles", F.size("shingles").alias("n"))
    return verify_candidate_pairs(cands, sets, min_jaccard, id_col=id_col).select(
        "id_a", "id_b", "intersection", "jaccard"
    )


def connected_components(
    edges: DataFrame, *, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components of the near-dup pair graph by min-label
    propagation (Pregel-lite): every node starts labeled with itself; each
    round every node takes the min label over {self} ∪ neighbours; converges
    in <= graph-diameter rounds.

    Scale posture: one shuffle per round keyed on node id; each round's
    result is CHECKPOINTED (lineage truncated), because caching alone is not
    enough — persisted data short-circuits execution but Catalyst still
    re-analyzes the full round-over-round plan, and analysis time grows
    superlinearly (measured 2s -> 16s by round 4 on an 869-node graph).
    `localCheckpoint` keeps rounds flat; swap for reliable `checkpoint()`
    on a cluster where executor loss matters. The convergence probe is a
    scalar count per round — the one deliberate driver-side action an
    iterative algorithm needs. Near-dup clusters have tiny diameters (dup
    groups are cliques through their canonical pivots), so rounds ~ 3-5.

    Each round also POINTER-DOUBLES (label <- label(label), valid because
    every label is itself a node id): a chain of diameter d converges in
    O(log d) rounds, so max_iter=25 covers any graph that fits a cluster.
    If the loop still exits unconverged, this RAISES instead of silently
    returning split clusters (a 26+-node chain with plain propagation used
    to truncate quietly)."""
    # Persist the symmetric edge list FIRST: without this, every round's
    # join re-evaluates the upstream pipeline that produced the edges (for
    # near-dup clustering that is the entire MinHash+LSH DAG — measured 3x
    # the total wall at sf0.1).
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        # r15 round-shape optimization (guide §1.2/§2.4): one eager job per
        # round instead of three. The intermediate `stepped` table is no
        # longer checkpointed — its three references below are identical
        # subtrees ending in the same exchange, which ReuseExchange computes
        # once inside the single new_labels job — and the previous round's
        # label rides through as `__old`, so convergence is read off the
        # checkpointed result with a plain scan instead of a separate
        # join-count job.
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("label"),
                    F.lit(None).cast(labels.schema["label"].dataType).alias("__old"))
        )
        stepped = (
            labels.select("node", "label", F.col("label").alias("__old"))
            .union(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("__old").alias("__old"))
        )
        # pointer doubling: follow node -> label -> label(label); labels are
        # node ids, so the hop is a self-join of the stepped table
        hop = (
            stepped.alias("x")
            .join(stepped.alias("y"), F.col("x.label") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.label").alias("label"),
                    F.lit(None).cast(labels.schema["label"].dataType).alias("__old"))
        )
        new_full = (
            stepped.union(hop)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("__old").alias("__old"))
        ).localCheckpoint()
        # every node has exactly one prior-label row in the union, so __old
        # is that prior label and the convergence probe is a narrow scan of
        # the just-materialized checkpoint — no join, no extra pass
        changed = new_full.where(F.col("label") != F.col("__old")).count()
        labels = new_full.select("node", "label")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter; results "
            "would be split clusters, refusing to return them"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def neardup_clusters(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.0,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH pairs -> connected components -> (doc, cluster, size).
    Singleton documents (no near-dup partner) are excluded — at scale you
    left-join this table back to assign every other doc its own id."""
    pairs = minhash_lsh_dedup(
        docs,
        shingle_n,
        num_hashes,
        bands,
        min_jaccard,
        id_col=id_col,
        text=text,
        shingles=shingles,
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias(id_col), "cluster_id", "cluster_size"
    )


def _hex_char_value(c: Column) -> Column:
    """Value 0..15 of a lowercase hex character, via ascii() (portable across
    Spark and the DuckDB oracle)."""
    a = F.ascii(c)
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def simhash_signatures(
    shingles: DataFrame, *, id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash from md5(shingle): majority vote per bit position,
    emitted as a 16-char hex string (sum > 0 -> bit 1)."""
    hexes = bits // 4
    with_h = shingles.select(F.col(id_col), F.md5("shingle").alias("h"))
    # one row per (doc, hex position): the hex digit value 0..15
    pos = with_h.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(hexes - 1))).alias("p"),
        F.col("h"),
    ).select(
        F.col(id_col),
        "p",
        _hex_char_value(F.col("h").substr(F.col("p") + 1, F.lit(1))).alias("v"),
    )
    # vote per bit within the hex digit: +1 if set else -1
    votes = pos.select(
        F.col(id_col),
        "p",
        *[
            (F.when(F.shiftright(F.col("v"), 3 - b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
                f"b{b}"
            )
            for b in range(4)
        ],
    ).groupBy(id_col, "p").agg(*[F.sum(f"b{b}").alias(f"s{b}") for b in range(4)])
    digit = (
        F.when(F.col("s0") > 0, 8).otherwise(0)
        + F.when(F.col("s1") > 0, 4).otherwise(0)
        + F.when(F.col("s2") > 0, 2).otherwise(0)
        + F.when(F.col("s3") > 0, 1).otherwise(0)
    )
    return (
        votes.withColumn("d", digit)
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "d"))),
                    lambda s: F.substring(F.lit("0123456789abcdef"), s["d"].cast("int") + 1, 1),
                ),
            ).alias("simhash")
        )
    )


def neardup_dedup_keep_best(
    docs: DataFrame,
    score: Column,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.0,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Cluster-level curation — the end-to-end near-dup dedup decision a
    training-data pipeline actually ships: MinHash+LSH near-dup clusters
    (connected components over the verified pair graph), then within each
    cluster the row with the highest ``score`` survives (ties to the
    smallest id). Documents with no near-dup partner form singleton clusters
    and keep themselves.

    Output: (doc_id, cluster_id, score, keep_id, cluster_size, is_dropped).
    Scale shape: the clustering reuses the no-all-pairs LSH pipeline; the
    keep-policy adds one window over cluster_id — shuffle keyed by cluster
    id carrying (id, score), never text."""
    from pyspark.sql import Window

    clusters = neardup_clusters(
        docs,
        shingle_n,
        num_hashes,
        bands,
        min_jaccard,
        id_col=id_col,
        text=text,
        shingles=shingles,
    ).select(id_col, "cluster_id")
    labeled = (
        docs.select(F.col(id_col), score.alias("__score"))
        .join(clusters, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )
    w = Window.partitionBy("cluster_id")
    wo = w.orderBy(F.col("__score").desc(), F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        labeled.withColumn("keep_id", F.first(id_col).over(wo))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            id_col,
            "cluster_id",
            F.col("__score").alias("score"),
            "keep_id",
            "cluster_size",
            (F.col(id_col) != F.col("keep_id")).alias("is_dropped"),
        )
    )
