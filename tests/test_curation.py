"""End-to-end corpus curation (operators/curation.py): each drop reason
fires independently on a hand-built corpus, overlaps are reported on every
flag, and kept is the conjunction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finiextestingide_spark.operators.curation import curate_corpus


def _corpus(spark):
    base = "the quick brown fox jumps over a lazy dog near the old stone bridge today"
    near = base.replace("today", "tonight")  # high-Jaccard near-dup of base
    rows = [
        (1, base),                      # survivor (best score in its groups)
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1, not exact
        (4, "short text the end"),      # fails quality (word count)
        (5, "alpha beta gamma the delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron"),  # clean keeper
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flags_fire_independently(spark):
    docs = _corpus(spark)
    # eval corpus = doc 5's text -> doc 5 is fully contaminated
    ev = docs.where(F.col("doc_id") == 5)
    out = {
        r.doc_id: r
        for r in curate_corpus(
            docs, ev, min_words=10, min_stop_hits=1, min_jaccard=0.3
        ).collect()
    }
    assert len(out) == 5
    # exact-dup group {1,2}: equal scores, tie to smallest id -> 2 dropped
    assert not out[1].is_exact_dup and out[2].is_exact_dup
    # near-dup cluster {1,2,3}: 3 is not exact-dup but is near-dup
    assert out[3].is_near_dup and not out[3].is_exact_dup
    # quality: doc 4 too short
    assert out[4].fails_quality and not out[1].fails_quality
    # contamination: doc 5 overlaps the eval set fully
    assert out[5].is_contaminated and out[5].contamination == 1.0
    assert not out[1].is_contaminated
    # kept = conjunction: only doc 1 passes everything
    assert {d for d, r in out.items() if r.kept} == {1}


def test_no_eval_overlap_keeps_clean_docs(spark):
    docs = _corpus(spark).where(F.col("doc_id").isin(1, 5))
    ev = docs.sparkSession.createDataFrame(
        [(99, "completely unrelated benchmark text with many other words")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in curate_corpus(docs, ev, min_words=10, min_stop_hits=1).collect()
    }
    assert out[1].kept and out[5].kept
    assert all(not r.is_contaminated for r in out.values())


def test_span_containment_fifth_judgment(spark):
    # A short doc quoted wholesale inside a much longer one: whole-doc
    # Jaccard is LOW (the long doc has many extra shingles) so MinHash
    # alone keeps it — only the span-containment judgment catches it.
    quote = (
        "the ancient library on the hill kept scrolls of maps and letters "
        "from distant lands over many long years of quiet study"
    )
    filler1 = (
        "morning light drifts across the valley while farmers tend their "
        "quiet fields and rivers move beneath old wooden bridges toward the sea"
    )
    filler2 = (
        "evening shadows settle over the town as lanterns glow along narrow "
        "streets and travelers rest beside warm fires until dawn arrives"
    )
    rows = [
        (1, quote),                            # wholly contained in 2
        (2, f"{filler1} {quote} {filler2}"),   # the containing doc
        (3, "totally unrelated clean text about rivers mountains valleys "
            "and the weather patterns of the northern hemisphere today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(99, "separate benchmark corpus with its own words entirely")],
        "doc_id long, text string",
    )
    base = dict(min_words=5, min_stop_hits=1, min_jaccard=0.5)
    # without the winnow judgment: doc 1 passes (not an exact or near dup)
    plain = {
        r.doc_id: r for r in curate_corpus(docs, ev, **base).collect()
    }
    assert not plain[1].is_near_dup and plain[1].kept
    assert "is_contained" not in plain[1].asDict()
    # with it: doc 1 is flagged contained and dropped; 2 and 3 survive
    spans = {
        r.doc_id: r
        for r in curate_corpus(
            docs, ev, winnow_k=3, winnow_w=4, winnow_min_shared=2, **base
        ).collect()
    }
    assert spans[1].is_contained and not spans[1].is_near_dup
    assert not spans[1].kept
    assert spans[2].kept and spans[3].kept
    assert not spans[2].is_contained and not spans[3].is_contained


def test_winnow_max_pairs_none_skips_budget_action(spark, monkeypatch):
    # ADVICE r13: the default pair budget runs a planning-time collect()
    # inside winnow_candidate_pairs; max_pairs=None must build the pair
    # frame without launching a single Spark job, and curate_corpus must
    # forward its winnow_max_pairs passthrough so callers can opt out.
    # (curate_corpus itself stays eager regardless — connected_components
    # is iterative — so the laziness assertion targets the winnow stage.)
    from finiextestingide_spark.operators import curation, winnow

    fps = spark.createDataFrame(
        [(1, 11), (1, 12), (2, 11), (2, 12)], "doc_id long, fp long"
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    lazy = winnow.winnow_candidate_pairs(fps, 2, max_pairs=None)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "max_pairs=None still launched a budget job"
    assert {"id_a", "id_b", "containment"} <= set(lazy.columns)
    # the default budget DOES run a job (the documented eager guard)
    winnow.winnow_candidate_pairs(fps, 2)
    assert len(tracker.getJobIdsForGroup(None) or []) > after

    # passthrough: curate_corpus hands winnow_max_pairs to the pair stage
    seen = {}
    real = winnow.winnow_candidate_pairs

    def spy(fps_, min_shared, **kw):
        seen.update(kw)
        return real(fps_, min_shared, **kw)

    monkeypatch.setattr(curation, "winnow_candidate_pairs", spy)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "unrelated benchmark words only here")], "doc_id long, text string"
    )
    df = curation.curate_corpus(
        docs, ev, min_words=2, min_stop_hits=0, winnow_k=3,
        winnow_max_pairs=None,
    )
    assert seen.get("max_pairs", "unset") is None
    assert "is_contained" in df.columns  # still the five-judgment shape


def test_precomputed_shingles_parity(spark):
    # r15 optimization: curate_corpus tokenizes the corpus once and hands
    # the shingle stream to both the near-dup chain and decontamination.
    # The injection contract: minhash_lsh_dedup(docs, shingles=s) with
    # s = shingle_stream(docs, n) must equal the self-computed path, and
    # word_shingles(docs, n) must equal shingle_stream(docs, n).distinct()
    # (the identity the decon side relies on).
    from finiextestingide_spark.operators.dedup import (
        minhash_lsh_dedup,
        shingle_stream,
        word_shingles,
    )

    docs = _corpus(spark)
    base = minhash_lsh_dedup(docs, 3, min_jaccard=0.3)
    shared = minhash_lsh_dedup(
        docs, 3, min_jaccard=0.3, shingles=shingle_stream(docs, 3)
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shared.collect())
    )
    ws = sorted(map(tuple, word_shingles(docs, 3).collect()))
    ss = sorted(map(tuple, shingle_stream(docs, 3).distinct().collect()))
    assert ws == ss


def test_quality_flags_replayed_rows_fold(spark):
    # At-least-once recovery replays identical flag rows; the per-id fold
    # collapses them so the decision table stays one-row-per-doc
    # (ADVICE r14: an inner join used to duplicate decision rows).
    docs = _corpus(spark)
    ev = docs.where(F.col("doc_id") == 99)  # empty eval set
    flags = spark.createDataFrame(
        [(i, i != 4) for i in (1, 2, 3, 4, 5)] + [(4, False), (5, True)],
        "doc_id long, keep boolean",
    )
    out = {
        r.doc_id: r
        for r in curate_corpus(docs, ev, quality_flags=flags).collect()
    }
    assert len(out) == 5
    assert out[4].fails_quality and not out[5].fails_quality


def test_quality_flags_missing_doc_raises(spark):
    # A document absent from the injected flags used to vanish silently
    # from the output; now the left-join guard raises naming the id.
    import pytest

    docs = _corpus(spark)
    ev = docs.where(F.col("doc_id") == 99)
    flags = spark.createDataFrame(
        [(i, True) for i in (1, 2, 3, 5)], "doc_id long, keep boolean"
    )
    with pytest.raises(Exception, match="quality_flags is missing document"):
        curate_corpus(docs, ev, quality_flags=flags).collect()


def test_quality_flags_conflicting_rows_raise(spark):
    # Two rows that DISAGREE about one document mean merged flags from
    # different rule versions — fail loud, never pick one arbitrarily.
    import pytest

    docs = _corpus(spark)
    ev = docs.where(F.col("doc_id") == 99)
    flags = spark.createDataFrame(
        [(i, True) for i in (1, 2, 3, 4, 5)] + [(4, False)],
        "doc_id long, keep boolean",
    )
    with pytest.raises(Exception, match="conflicting quality_flags"):
        curate_corpus(docs, ev, quality_flags=flags).collect()


def test_eval_filter_matches_eval_docs(spark):
    """r16: eval_filter derives the eval shingles from the shared tokenize
    pass; its decision table must equal the eval_docs form row for row
    (including the winnow-armed eager path, where the shared stream is the
    checkpointed one)."""
    docs = _corpus(spark)
    flt = F.col("doc_id") % 2 == 1
    for extra in ({}, {"winnow_k": 2, "winnow_w": 2, "winnow_min_shared": 1}):
        a = sorted(
            curate_corpus(
                docs, docs.where(flt), min_words=10, min_stop_hits=1,
                min_jaccard=0.3, **extra,
            ).collect()
        )
        b = sorted(
            curate_corpus(
                docs, eval_filter=flt, min_words=10, min_stop_hits=1,
                min_jaccard=0.3, **extra,
            ).collect()
        )
        assert a == b


def test_eval_docs_filter_exclusive(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="exactly one"):
        curate_corpus(docs)
    with pytest.raises(ValueError, match="exactly one"):
        curate_corpus(docs, docs, eval_filter=F.col("doc_id") == 1)
