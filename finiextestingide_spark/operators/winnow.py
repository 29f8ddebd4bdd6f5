"""Winnowing document fingerprints — substring-level near-dup detection.

Implements the winnowing local fingerprinting scheme (Schleimer, Wilkerson,
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003 — the MOSS algorithm): hash every word k-gram, slide a window of `w`
consecutive k-gram hashes, and keep each window's minimum. The guarantee is
LOCAL: any shared run of at least k + w - 1 words between two documents
shares at least one selected fingerprint, so documents that duplicate a
SPAN (a quoted paragraph, boilerplate, a copied license block) collide even
when their whole-document signatures (MinHash over the full shingle set,
`operators/dedup.py:197`) do not — the capability class of span-level
training-data dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"), approximated with fingerprints instead of suffix
arrays so it stays one shuffle on Spark.

Relationship to the rest of the dedup surface:
- exact/MinHash/SimHash (`operators/dedup.py`) answer "are these DOCUMENTS
  near-identical"; winnowing answers "do these documents SHARE A SPAN".
- the pair stage reuses the inverted-index discipline of
  ``jaccard_pairs`` (`operators/dedup.py:135`): a df-cap drops boilerplate
  fingerprints before the posting-list self-join, and a planning-time
  pairs budget fails loud before a quadratic bucket is launched.

Determinism: k-gram hashes are md5 hex strings compared lexicographically —
reproducible in any engine with md5 (the DuckDB oracle mirrors 1:1).

Scale shape: ONE exchange keyed by doc id feeds the whole fingerprint
construction (the window sort over the exploded word stream — short
strings, never full bodies); the k-gram `lead`, the hash, and the
windowed min/count all run over that single sort (verified in the plan:
two Window nodes share one Sort). The final per-doc distinct adds one
map-side-combined aggregate exchange on (doc, fp) — selected fingerprints
only, ~2/(w+1) of the gram stream. The
fingerprint set per doc is ~n_grams / ((w+1)/2) in expectation — the 2/(w+1)
density bound from the paper — so downstream joins carry a tunable fraction
of the corpus, never the corpus itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window



def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 5,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Distinct winnowing fingerprints per document: (id_col, fp).

    ``fp`` is the md5 of a word k-gram that was minimal in at least one
    window of ``window`` consecutive k-gram hashes. We emit the distinct
    set of selected VALUES (positions dropped): cross-document matching
    keys on hash equality only, and every per-window minimum is by
    definition a selected fingerprint, so the value set is exactly the
    winnowing fingerprint set.

    Documents shorter than k + window - 1 words produce no fingerprints
    (no full window exists) — the scheme's stated minimum match length.

    ``words`` (r15): a caller that already holds the token_positions frame
    (see dedup.token_positions) passes it here so the corpus is not
    re-tokenized.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k={k} and window={window} must be >= 1")
    if words is None:
        # the ONE tokenize definition (ADVICE r15): this must stay the
        # same expression shingle_stream consumes, or the shared-words
        # path (curate_corpus passes words=) would silently diverge from
        # the self-computed one
        from .dedup import token_positions

        words = token_positions(docs, id_col=id_col, text=text)
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(win) for j in range(1, k)]
    grams = words.select(
        F.col(id_col),
        F.col("pos"),
        F.md5(F.concat_ws(" ", *parts)).alias("h"),
        parts[-1].isNotNull().alias("_full"),
    ).where("_full")
    # Same partitioning + ordering as `win`, so the exchange and sort are
    # reused — the whole operator is one shuffle.
    fwin = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    sel = grams.select(
        F.col(id_col),
        F.min("h").over(fwin).alias("fp"),
        F.count(F.lit(1)).over(fwin).alias("_cnt"),
    ).where(F.col("_cnt") == window)
    return sel.select(id_col, "fp").distinct()


def winnow_candidate_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    *,
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    max_pairs: int | None = 25_000_000,
    fps_materialized: bool = False,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints, with
    the span-containment score shared / min(n_a, n_b) — the right metric
    for substring duplication, where a small document wholly quoted inside
    a large one should score ~1.0 even though whole-doc Jaccard is tiny.

    Output: (id_a, id_b, shared, n_a, n_b, containment), id_a < id_b.

    Scale guards (both the lesson of `jaccard_pairs` /
    `neardup_pairs_blocked`):
    - ``max_doc_freq`` drops fingerprints present in more than that many
      documents from the WHOLE computation (shared counts AND per-doc
      sizes) — one boilerplate span shared by 10^6 docs makes its posting
      list quadratic; the hot set is tiny, so the filter is a broadcast
      anti-join, not a second shuffle.
    - ``max_pairs`` is a planning-time budget on the TOTAL candidate pair
      count sum(df*(df-1)/2) after the cap — a column-pruned count with
      map-side combine that fails loud BEFORE the self-join is launched,
      naming the knobs. Pass None to skip when the fingerprint density was
      already tuned (larger `window` in winnow_fingerprints lowers it).

    ``fps_materialized=True`` (r15): the caller guarantees ``fps`` is
    already materialized (e.g. `curate_corpus` localCheckpoints it so the
    containment sizes share it) — skips the internal checkpoint below, so
    the fingerprint set is not copied a second time. The budget count
    still runs.
    """
    fps = fps.select(F.col(id_col), "fp")
    if max_doc_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count_distinct(id_col).alias("__df"))
            .where(F.col("__df") > max_doc_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    if max_pairs is not None:
        # r15 optimization (guide §5 caching rule: reused AND expensive to
        # recompute): the budget check below already pays an eager planning
        # job over the full fingerprint construction; materializing the
        # capped frame first (localCheckpoint, lineage cut) means that job
        # doubles as the materialization and the main job's three consumers
        # (both self-join sides + the sizes aggregate) read it instead of
        # re-deriving the fingerprint pass a second time. A checkpoint —
        # unlike a persist — is never plan-matched across separately-built
        # queries, so repeated invocations each recompute from the parquet
        # inputs. Disarmed budgets keep the builder fully lazy, unchanged.
        if not fps_materialized:
            fps = fps.localCheckpoint()
        total = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p"))
            .collect()[0]["p"]
        )
        if total is not None and total > max_pairs:
            raise ValueError(
                f"winnow_candidate_pairs: {int(total)} candidate pairs > "
                f"max_pairs={max_pairs}; the posting-list self-join is "
                "quadratic per fingerprint — lower max_doc_freq, raise the "
                "winnowing window (fewer fingerprints per doc), or raise "
                "max_pairs if the cost is intended."
            )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    # NO broadcast hint on sizes (one row per doc — unbounded at lake
    # scale); AQE broadcasts the max_pairs-bounded pairs side at runtime.
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", F.col("shared") / F.least("n_a", "n_b"))
        .select("id_a", "id_b", "shared", "n_a", "n_b", "containment")
    )


def containment_dedup(
    fps: DataFrame,
    pairs: DataFrame,
    min_containment: float = 0.8,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-containment keep-policy: drop every document whose winnowing
    fingerprints are >= ``min_containment`` contained in a LARGER document
    (more fingerprints; ties to the smaller id) — the decision rule for
    quote-inclusion dups, where the small doc is redundant but whole-doc
    Jaccard never fires.

    Deliberately a GREEDY single pass, not iterative set cover: a doc is
    dropped when ANY containment edge points to a bigger doc, even if that
    bigger doc is itself dropped by a yet-bigger one — the chain's maximal
    document always survives (its edges all point downward), so coverage is
    preserved; intermediate links are dropped as redundant, which is the
    aggressive-but-safe curation choice and keeps the operator one
    aggregation instead of an iterative fixpoint (the
    `connected_components` cost this rule exists to avoid).

    Output: (id_col, n_fps, is_dropped, dropped_into) — one row per doc in
    ``fps`` (the `winnow_fingerprints` output; a doc too short to
    fingerprint has nothing to be contained in and is trivially kept by
    omission). ``dropped_into`` is the largest containing doc (null if
    kept). Shuffle profile: one count aggregate for sizes + one max_by
    aggregation over the directed edge list; ``pairs`` comes from
    ``winnow_candidate_pairs`` (already budget-guarded)."""
    edges = pairs.where(F.col("containment") >= min_containment)
    # direct each qualifying edge small -> big (bigger fp set wins; tie to
    # smaller id), then keep the single biggest target per dropped doc
    small_is_a = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") > F.col("id_b"))
    )
    directed = edges.select(
        F.when(small_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("small_id"),
        F.when(small_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias("big_id"),
        F.when(small_is_a, F.col("n_b")).otherwise(F.col("n_a")).alias("big_n"),
    )
    # min_by over (-big_n, big_id): largest fp-set wins, ties to the SMALLER
    # big id — expressed as a minimization so the id field is used as-is
    # (negating the id to phrase it as max_by breaks string doc ids, which
    # winnow_fingerprints otherwise supports).
    drops = directed.groupBy("small_id").agg(
        F.min_by(
            F.col("big_id"), F.struct((-F.col("big_n")).alias("nn"), F.col("big_id"))
        ).alias("dropped_into")
    )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_fps"))
    return (
        sizes.join(drops.withColumnRenamed("small_id", id_col), id_col, "left")
        .withColumn("is_dropped", F.col("dropped_into").isNotNull())
        .select(id_col, "n_fps", "is_dropped", "dropped_into")
    )
