"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (regexp_count / split / md5) — JVM-side,
codegen-friendly, linear scans with full predicate pushdown. These extend the
reference's signal-data path to the LLM-data-pipeline surface required at
100 TB (language ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# BPE-ish tokenizer regex: letter runs, digit runs, single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# Tiny deterministic marker lexicons for heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "una"),
}


def normalized_text(text: Column) -> Column:
    """lower + collapse non-alnum runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n > 0, F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")) / n).otherwise(F.lit(0.0))


def stopword_count(text: Column, stopwords=STOPWORDS) -> Column:
    pat = r"\b(" + "|".join(stopwords) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def marker_count(text: Column, markers: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: token-count saturation x
    (1 - punctuation ratio) x non-stopword share."""
    n_tok = whitespace_token_count(text).cast("double")
    sat = F.least(n_tok / 100.0, F.lit(1.0))
    stop_share = F.when(n_tok > 0, stopword_count(text) / n_tok).otherwise(F.lit(0.0))
    return sat * (1.0 - punct_ratio(text)) * (1.0 - F.least(stop_share, F.lit(1.0)))


def predict_lang(text: Column) -> Column:
    """Marker-lexicon argmax with fixed precedence en > de > fr > es;
    all-zero -> 'und' (undetermined)."""
    c = {lang: marker_count(text, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*c.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):  # precedence order on ties
        expr = expr.when(c[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """md5 of the normalized text — exact-dup document fingerprint."""
    return F.md5(normalized_text(text))


def tfidf_topterms(
    docs: DataFrame, k: int = 3, *, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Top-k TF-IDF terms per document: tfidf = tf * ln(N / df).

    Shuffle profile at scale: one groupBy (doc, term) with map-side combine
    for tf, one groupBy term for df (term rows only, never text), a
    broadcast join of the (tiny) df table back — the corpus size N is a
    scalar aggregate cross-joined as a broadcast, not a collect. Ranking is
    on the 6-decimal-rounded score with term as tiebreak, so top-k sets are
    reproducible across engines."""
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "term_rank")
    )


def with_text_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    t = F.col(text)
    return docs.select(
        "*",
        whitespace_token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_count(t).alias("n_stopwords"),
        quality_score(t).alias("quality"),
        predict_lang(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def ngram_contamination(
    train_shingles: DataFrame,
    eval_shingles: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check — the train/test n-gram overlap audit a
    training-data pipeline runs before any eval claim: for each EVAL document,
    the fraction of its distinct n-grams that appear anywhere in the TRAIN
    corpus.

    Inputs are distinct (doc, shingle) streams (operators.dedup.word_shingles
    output). Scale shape: the train side collapses to its DISTINCT shingle
    set once (map-side combine), the overlap is one shuffle join keyed on the
    shingle string, and shuffled rows carry (short shingle, eval doc id) —
    never document bodies. At 100 TB train / small eval the join naturally
    prunes to the eval side's shingles; with a small benchmark the optimizer
    broadcast path applies.

    Output: (doc_id, n_shingles, n_contaminated, contamination) per eval doc,
    with contamination = n_contaminated / n_shingles.
    """
    train_set = train_shingles.select("shingle").distinct()
    ev = eval_shingles.select(F.col(id_col), F.col("shingle"))
    hits = (
        ev.join(train_set, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    sizes = ev.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        sizes.join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn(
            "contamination", F.col("n_contaminated") / F.col("n_shingles")
        )
        .select(id_col, "n_shingles", "n_contaminated", "contamination")
    )
