"""End-to-end corpus curation: the one-call pipeline a training-data job
actually ships, composed from the engine's audited stages.

A pre-training corpus pass runs, in practice, four independent judgments
per document — exact duplication, near duplication, quality, and benchmark
contamination — then keeps the documents that pass all four. This module
wires the engine's existing operators into that decision table:

- exact dedup, quality keep-policy   (`dedup.exact_dedup_keep_best`)
- MinHash+LSH near-dup clusters, cluster keep-best
                                     (`dedup.neardup_dedup_keep_best`)
- Gopher/MassiveText quality rules   (`text.gopher_quality_flags`)
- eval-set n-gram contamination      (`text.decontaminate`)

The flags are deliberately INDEPENDENT (each computed over the full input,
not over the survivors of the previous stage): a curation report needs to
say *every* reason a document was dropped — sequential stages under-count
overlap (a near-dup that also fails quality shows up in whichever stage
ran first) and make the pipeline's output depend on stage order. ``kept``
is the conjunction.

Scale shape: each stage is the already-audited plan of its operator (see
PLANS.md); this module adds only id-keyed joins of (id, flag) rows — the
document bodies are read in the stage scans and never travel through the
final joins. At lake scale the four stages share one scan per stage the
same way the gate queries do; persist the input once if the scans dominate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import exact_dedup, exact_dedup_keep_best, neardup_dedup_keep_best, word_shingles
from .text import (
    decontaminate,
    gopher_quality_flags,
    quality_score,
    whitespace_token_count,
)
from .winnow import containment_dedup, winnow_candidate_pairs, winnow_fingerprints


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    eval_filter: Column | None = None,
    score: Column | None = None,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.0,
    max_contamination: float = 0.1,
    min_words: int = 50,
    min_stop_hits: int = 2,
    winnow_k: int | None = None,
    winnow_w: int = 4,
    winnow_min_shared: int = 2,
    winnow_max_doc_freq: int | None = None,
    winnow_max_pairs: int | None = 25_000_000,
    min_containment: float = 0.8,
    quality_flags: DataFrame | None = None,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document curation decision table.

    Output: (id_col, score, is_exact_dup, is_near_dup[, is_contained],
    fails_quality, contamination, is_contaminated, kept) — one row per
    input document.

    ``eval_docs`` is the held-out benchmark corpus; a document whose
    shingle overlap with it exceeds ``max_contamination`` is flagged (and a
    benchmark document that leaked into the input is ~fully contaminated,
    which is exactly the removal decontamination exists for). ``score``
    defaults to the engine's deterministic quality heuristic rounded to 6
    decimals (cross-engine reproducible keep-best ties).

    ``eval_filter`` (r16, pass INSTEAD of ``eval_docs``): when the eval set
    is a SLICE of the input corpus (a predicate over ``id_col``), its
    shingles are derived from the one shared shingle pass —
    ``sh_stream.where(eval_filter).distinct()`` — instead of re-tokenizing
    the slice from the raw documents (word_shingles(docs.where(f)) and the
    filtered shared stream are the same rows: filtering by id commutes with
    per-document tokenization). Exactly one of the two must be given.

    ``winnow_k`` (opt-in) adds the FIFTH judgment — span containment: a
    document whose winnowing fingerprints are >= ``min_containment``
    contained in a larger document is flagged ``is_contained`` and dropped
    (`winnow.containment_dedup`). This is the quoted-inclusion dup class
    whole-doc MinHash never fires on: a short doc pasted inside a long one
    has low whole-doc Jaccard but ~1.0 span containment. Independent like
    the other four flags (computed over the full input); a doc too short
    to fingerprint is trivially uncontained.

    EAGER caveat (ADVICE r13): with ``winnow_k`` set and
    ``winnow_max_pairs`` not None, the candidate-pair budget check runs a
    planning-time Spark action (one column-pruned count over the
    fingerprint frame) inside this otherwise-lazy builder — the fail-loud
    guard `winnow.winnow_candidate_pairs` documents. Pass
    ``winnow_max_pairs=None`` to keep the builder fully lazy when the
    fingerprint density is already tuned (the count is then also not
    computed twice).

    ``quality_flags`` (opt-in) injects PRECOMPUTED per-document Gopher
    verdicts — a (``id_col``, keep boolean) frame, e.g. the
    batch-history + streamed-tail merged view from
    `streaming.quality_stream` — in place of recomputing
    `gopher_quality_flags` here. This is how quality-on-ingest composes
    into the decision table: documents arrive pre-judged by the stream,
    and curation consumes the judgments unchanged (the flags are pure
    functions of the document, so streamed == batch bit-for-bit; the
    streaming_curated_corpus gate pins that against the full-batch
    oracle). The frame must cover every input document; ``min_words`` /
    ``min_stop_hits`` are ignored when it is supplied. The coverage
    requirement is ENFORCED, not assumed (ADVICE r14): exact replayed
    rows (the at-least-once streamed-tail recovery case) collapse via a
    map-side-combined per-id fold, a document missing from the frame
    raises at execution time (naming the id) instead of silently
    vanishing from the output, and two rows that DISAGREE about one
    document also raise (a replay never disagrees; disagreement means
    the caller merged flags from two different rule versions)."""
    if (eval_docs is None) == (eval_filter is None):
        raise ValueError("pass exactly one of eval_docs or eval_filter")
    sc = score if score is not None else F.round(quality_score(F.col(text)), 6)

    exact = exact_dedup_keep_best(docs, sc, id_col=id_col, text=text).select(
        F.col(id_col),
        F.col("score"),
        F.col("is_dropped").alias("is_exact_dup"),
    )

    # r15 (guide §2.4/§5): the near-dup chain and the decontamination train
    # side both consume the SAME word-shingle stream (near-dup aggregates
    # the raw occurrences, decon its per-doc distinct view) — build it once
    # here and hand it to both, instead of letting each stage re-tokenize
    # the corpus. On the budget-armed (already-eager, see below) path the
    # stream is materialized with one localCheckpoint job, so the corpus is
    # tokenized+window-sorted exactly once for {near-dup, decon-hits,
    # decon-sizes} (the exec plan formerly ran that pass three times);
    # per-invocation, never shared across separately-built queries.
    # Measured (interleaved same-box A/B, min of clean samples): sf0.1
    # 7.99 -> 6.98 s (0.87x), synthetic sf1 33.9 -> 28.6 s (0.84x).
    from .dedup import shingle_stream, token_positions

    # r16: the FINIEX_CURATION_SHARE_WORDS escape hatch is GONE (ADVICE
    # r15: an undocumented, parity-untested config fork). The shared
    # token pass is the oracle-verified shape at 3 SFs; an escape hatch
    # that silently changed the plan but not the results was risk, not
    # safety. Storage note (ADVICE r15): on the budget-armed path BOTH the
    # token-occurrence stream and the shingle stream below are
    # localCheckpointed — two corpus-sized frames pinned in executor-local
    # storage for the life of the job, and localCheckpoint does not
    # survive executor loss; for very large corpora prefer reliable
    # checkpoint() storage or winnow_max_pairs=None (fully lazy, no pins).
    _eager = winnow_k is not None and winnow_max_pairs is not None
    words = token_positions(docs, id_col=id_col, text=text)
    if _eager:
        words = words.localCheckpoint()
    sh_stream = shingle_stream(
        docs, shingle_n, id_col=id_col, text=text, words=words
    )
    if _eager:
        # the builder is already eager on this path (fps checkpoint + pairs
        # budget below) — one more small up-front job; the lazy contract
        # (winnow_max_pairs=None / no winnow) stays lazy: the shared frame
        # is then only a common subtree, not a materialization.
        sh_stream = sh_stream.localCheckpoint()

    def _build_near() -> DataFrame:
        return neardup_dedup_keep_best(
            docs,
            sc,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
            id_col=id_col,
            text=text,
            shingles=sh_stream,
        ).select(F.col(id_col), F.col("is_dropped").alias("is_near_dup"))

    def _build_cont() -> DataFrame | None:
        if winnow_k is None:
            return None
        fps = winnow_fingerprints(
            docs, winnow_k, winnow_w, id_col=id_col, text=text, words=words
        )
        materialized = False
        if winnow_max_pairs is not None:
            # r15: the pairs budget below runs an eager planning count
            # over the fingerprints anyway; materializing them first
            # (localCheckpoint — per-invocation, never shared across
            # separately-built queries) lets that job double as the
            # materialization, so the main job's containment sizes and
            # pair-join sides read it rather than re-running the
            # fingerprint construction (one full shingle window pass
            # saved). max_pairs=None keeps the builder fully lazy
            # (ADVICE r13 contract).
            fps = fps.localCheckpoint()
            materialized = True
        pairs = winnow_candidate_pairs(
            fps,
            winnow_min_shared,
            id_col=id_col,
            max_doc_freq=winnow_max_doc_freq,
            max_pairs=winnow_max_pairs,
            # already checkpointed above — don't copy the set twice
            fps_materialized=materialized,
        )
        return containment_dedup(fps, pairs, min_containment, id_col=id_col).select(
            F.col(id_col), F.col("is_dropped").alias("__contained")
        )

    if winnow_k is not None and winnow_max_pairs is not None:
        # r15 (guide §2.6 — overlap independent jobs): BOTH of these
        # builders run eager planning-time Spark jobs — the near-dup side
        # drives the connected-components rounds, the winnow side the
        # fingerprint checkpoint + pairs budget count. The chains are
        # independent until the final decision-table join, and each leaves
        # long scheduler tails on its small shuffles, so building them from
        # two driver threads lets the FIFO scheduler back-fill one chain's
        # idle executors with the other's tasks (same results: each chain
        # is unchanged, only their wall-clocks overlap).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            near_f = pool.submit(_build_near)
            cont_f = pool.submit(_build_cont)
            near = near_f.result()
            cont = cont_f.result()
    else:
        near = _build_near()
        cont = _build_cont()
    if quality_flags is not None:
        # Fail-loud injection (ADVICE r14). Replayed identical rows fold
        # to one (min==max); conflicting verdicts or a missing document
        # raise at execution time rather than silently dropping /
        # duplicating decision rows. The fold is a plain map-side-
        # combinable aggregate (no window), so the guard costs one
        # narrow-shuffle pass over the flags frame at scale.
        folded = quality_flags.groupBy(id_col).agg(
            F.min((~F.col("keep")).cast("int")).alias("__fq_min"),
            F.max((~F.col("keep")).cast("int")).alias("__fq_max"),
        )
        flags = folded.select(
            F.col(id_col),
            F.when(
                F.col("__fq_min") != F.col("__fq_max"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "curate_corpus: conflicting quality_flags rows for "
                            "document "
                        ),
                        F.col(id_col).cast("string"),
                    )
                ).cast("boolean"),
            )
            .otherwise(F.col("__fq_max") == 1)
            .alias("fails_quality"),
        )
        quality = (
            docs.select(F.col(id_col))
            .join(flags, id_col, "left")
            .select(
                F.col(id_col),
                F.when(
                    F.col("fails_quality").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "curate_corpus: quality_flags is missing "
                                "document "
                            ),
                            F.col(id_col).cast("string"),
                        )
                    ).cast("boolean"),
                )
                .otherwise(F.col("fails_quality"))
                .alias("fails_quality"),
            )
        )
    else:
        g = gopher_quality_flags(
            F.col(text), min_words=min_words, min_stop_hits=min_stop_hits
        )
        quality = docs.select(F.col(id_col), (~g["keep"]).alias("fails_quality"))
    if eval_filter is not None:
        # r16 (VERDICT r15 #5): the eval slice's shingles come from the
        # SAME shared (possibly checkpointed) pass — the last tokenize
        # Generate in the curated plan disappears
        ev_shingles = sh_stream.where(eval_filter).distinct()
    else:
        ev_shingles = word_shingles(
            eval_docs, shingle_n, id_col=id_col, text=text
        )
    decon = decontaminate(
        # word_shingles(docs, n) IS shingle_stream(docs, n).distinct()
        # (pinned by test_precomputed_shingles_parity) — reuse the shared
        # (possibly checkpointed) stream instead of re-tokenizing
        sh_stream.distinct(),
        ev_shingles,
        max_contamination,
        id_col=id_col,
        train_ids=docs,
    ).select(
        F.col(id_col),
        F.col("contamination"),
        (~F.col("keep")).alias("is_contaminated"),
    )
    out = exact.join(near, id_col).join(quality, id_col).join(decon, id_col)
    kept = (
        ~F.col("is_exact_dup")
        & ~F.col("is_near_dup")
        & ~F.col("fails_quality")
        & ~F.col("is_contaminated")
    )
    cols = [
        id_col,
        "score",
        "is_exact_dup",
        "is_near_dup",
        "fails_quality",
        "contamination",
        "is_contaminated",
        "kept",
    ]
    if winnow_k is not None:
        out = out.join(cont, id_col, "left").withColumn(
            "is_contained", F.coalesce(F.col("__contained"), F.lit(False))
        )
        kept = kept & ~F.col("is_contained")
        cols.insert(4, "is_contained")
    return out.withColumn("kept", kept).select(*cols)


def source_quality_rollup(
    docs: DataFrame,
    *,
    min_words: int = 50,
    min_stop_hits: int = 2,
    id_col: str = "doc_id",
    text: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source curation scorecard: the roll-up a corpus owner reads to
    decide which SOURCES to keep, reweight, or recrawl — doc count, token
    mass, mean quality, corpus-wide exact-dup rate attributed to the
    source, and the Gopher keep rate.

    ``dup_rate`` counts a source's docs that are non-canonical members of a
    CORPUS-WIDE content group (which sources bring copies of material that
    exists elsewhere) — per-source-only dedup would hide cross-source
    mirroring, the common case.

    Scale shape: one linear scan computes tokens/quality/keep per doc; the
    exact-dedup hash groupBy is the only other exchange; the roll-up is a
    map-side-combined aggregate keyed by source (cardinality = number of
    sources, tiny). Output one row per source, ordered by source."""
    t = F.col(text)
    g = gopher_quality_flags(t, min_words=min_words, min_stop_hits=min_stop_hits)
    per_doc = docs.select(
        F.col(id_col),
        F.col(source_col),
        whitespace_token_count(t).cast("long").alias("__tokens"),
        F.round(quality_score(t), 6).alias("__quality"),
        g["keep"].alias("__gopher_keep"),
    )
    dups = exact_dedup(docs, id_col=id_col, text=text).select(
        F.col(id_col), F.col("is_duplicate")
    )
    # mean quality via an EXACT decimal sum (order-independent) divided as
    # double — the cross-engine determinism rule for float aggregates
    return (
        per_doc.join(dups, id_col)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__tokens").cast("long").alias("n_tokens"),
            F.sum(F.col("__quality").cast("decimal(18,6)")).alias("__qsum"),
            F.sum(F.col("is_duplicate").cast("long")).alias("__dups"),
            F.sum(F.col("__gopher_keep").cast("long")).alias("__keeps"),
        )
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("__qsum").cast("double") / F.col("n_docs"), 6).alias("avg_quality"),
            F.round(F.col("__dups").cast("double") / F.col("n_docs"), 6).alias("dup_rate"),
            F.round(F.col("__keeps").cast("double") / F.col("n_docs"), 6).alias(
                "gopher_keep_rate"
            ),
        )
        .orderBy(source_col)
    )
