"""Deterministic sampling for training-data curation.

`DataFrame.sample()` is seed-dependent per partition split, so re-running a
pipeline (or re-reading with a different partition layout) changes the
sample. At 100 TB the curation contract is "this exact row set, every run,
on any engine": derive the sampling decision from a content-stable hash of
the row key, never from RNG state. The same md5-prefix bucket is computable
in any engine (our DuckDB oracle included), so samples are auditable.

This generalizes the reference's 10%-sampled index statistics
(tick_index_manager.py:169-194) into a reproducible primitive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket 0..buckets-1 from the first 16 bits of md5 of the key's
    string form. 16 bits are uniform enough for percent-level sampling, and
    the hex-digit arithmetic mirrors into any SQL dialect via ascii()
    (engines disagree on hex-to-int casts; they agree on ascii)."""
    h = F.md5(key.cast("string"))
    val = F.lit(0)
    for p in range(4):
        c = F.ascii(F.substring(h, p + 1, 1))
        digit = F.when(c >= 97, c - 87).otherwise(c - 48)
        val = val * 16 + digit
    return (val % buckets).cast("int")


def sample_deterministic(
    df: DataFrame, rate_pct: int, *, key_col: str = "doc_id", bucket_col: str = "sample_bucket"
) -> DataFrame:
    """Keep rows whose hash bucket falls below rate_pct (of 100). A pure
    filter — pushes to the scan, no shuffle, identical row set every run."""
    return df.withColumn(bucket_col, hash_bucket(F.col(key_col))).where(
        F.col(bucket_col) < rate_pct
    )


def stratified_sample_counts(
    df: DataFrame, strata_col: str, rate_pct: int, *, key_col: str = "doc_id"
) -> DataFrame:
    """Per-stratum audit: total rows vs deterministically-sampled rows.
    One groupBy over (stratum) with a conditional count — the audit the
    curation pipeline ships next to the sample itself."""
    bucket = hash_bucket(F.col(key_col))
    return df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((bucket < rate_pct).cast("long")).alias("n_sampled"),
    )


def token_budget_sample(
    scored_docs,
    budget_tokens: int,
    *,
    group: str = "lang",
    tokens: str = "n_tokens",
    score: str = "quality",
    id_col: str = "doc_id",
):
    """Data-mixing selection: per ``group`` (language/domain), keep the
    RANK-PREFIX of highest-``score`` documents whose cumulative token count
    stays within ``budget_tokens`` — the budgeted curation step that turns
    a scored corpus into a training mix.

    This is a prefix cut, NOT greedy skip-and-continue: rank by
    (score DESC, id ASC); a document is kept iff the cumulative tokens of
    ALL higher-or-equal-ranked docs including it stay within budget. The
    first overflowing doc therefore ends the selection for its group even
    if smaller lower-ranked docs would still fit — the rule trades a
    little budget utilization for a pure windowed plan (no sequential
    scan). Use ``token_budget_sample_greedy`` when utilization matters
    more. One window pass per group — the shuffle carries
    (id, score, tokens), never text; at 100 TB the group-partitioned sort
    is the same shape as any per-key top-k."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(
        F.col(score).desc(), F.col(id_col).asc()
    )
    cum = F.sum(tokens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        scored_docs.withColumn("cum_tokens", cum)
        .withColumn("selected", F.col("cum_tokens") <= budget_tokens)
        .select(id_col, group, tokens, score, "cum_tokens", "selected")
    )


def token_budget_sample_greedy(
    scored_docs,
    budget_tokens: int,
    *,
    group: str = "lang",
    tokens: str = "n_tokens",
    score: str = "quality",
    id_col: str = "doc_id",
):
    """True greedy skip-and-continue budget selection: per ``group``, walk
    documents in (score DESC, id ASC) order and keep each one iff the sum
    of KEPT tokens including it stays within ``budget_tokens`` — an
    oversized mid-rank doc is skipped and the walk continues, so smaller
    lower-ranked docs can still fill the budget (maximal utilization under
    the ranking, unlike token_budget_sample's prefix cut).

    The kept-sum is inherently sequential (it depends on which earlier docs
    were kept), so this is an Arrow-batched applyInPandas per group, not a
    window: the shuffle carries only (id, group, tokens, score) — never
    text — and each group's walk is a single in-memory pass. At 100 TB the
    per-group partition is the same memory bound as any per-key stateful
    op; groups are languages/domains, so cardinality is small and rows per
    group are bounded by the corpus mix."""
    import pandas as pd

    cols = [id_col, group, tokens, score]

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        kept_sum = 0
        kept_cum, selected = [], []
        for t in pdf[tokens]:
            t = int(t)
            if kept_sum + t <= budget_tokens:
                kept_sum += t
                selected.append(True)
            else:
                selected.append(False)
            kept_cum.append(kept_sum)
        pdf["kept_tokens"] = pd.Series(kept_cum, dtype="int64")
        pdf["selected"] = pd.Series(selected, dtype="bool")
        return pdf

    narrow = scored_docs.select(*cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in narrow.schema)
    out_schema = f"{schema}, kept_tokens bigint, selected boolean"
    return narrow.groupBy(group).applyInPandas(walk, out_schema)


def quality_quantile_filter(
    scored_docs,
    keep_top_frac: float,
    *,
    group: str = "lang",
    score: str = "quality",
    id_col: str = "doc_id",
):
    """Per-group quantile gate: flag the top ``keep_top_frac`` of documents
    by ``score`` within each group — "keep the best 40% per language", the
    relative-threshold sibling of token_budget_sample's absolute budget.

    percent_rank() over (group, score DESC) is engine-portable ANSI (ties
    share a rank on both Spark and DuckDB, so the kept set is deterministic
    without a tiebreak column); one window pass per group, shuffle carries
    (id, group, score) only. A group with a single doc has percent_rank 0
    and is always kept."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(F.col(score).desc())
    pr = F.percent_rank().over(w)
    return scored_docs.select(
        id_col,
        group,
        score,
        F.round(pr, 6).alias("score_pct_rank"),
        (pr <= keep_top_frac).alias("selected"),
    )
