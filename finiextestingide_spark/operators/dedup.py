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


def word_shingles(docs: DataFrame, n: int = 3, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document. Documents shorter than n
    words produce no shingles (guarded: F.sequence would count down)."""
    words = F.split(normalized_text(F.col(text)), " ")
    shingle = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(shingle).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
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


def jaccard_pairs(
    shingles: DataFrame,
    min_intersection: int = 2,
    min_jaccard: float = 0.0,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """All document pairs sharing >= min_intersection shingles with their
    exact Jaccard similarity."""
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
    out = (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection") / (F.col("n_a") + F.col("n_b") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("id_a", "id_b", "intersection", "n_a", "n_b", "jaccard")


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 8, *, id_col: str = "doc_id"
) -> DataFrame:
    """k md5-permutation minima per doc (hex-string ordering)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4, *, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket."""
    rows_per_band = num_hashes // bands
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    buckets = band_rows[0]
    for br in band_rows[1:]:
        buckets = buckets.unionByName(br)
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


def minhash_lsh_dedup(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.5,
    *,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Full pipeline: shingle -> minhash -> band -> bucket-join -> exact-verify."""
    sh = word_shingles(docs, shingle_n, id_col=id_col, text=text)
    sigs = minhash_signatures(sh, num_hashes, id_col=id_col)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col=id_col)
    verified = jaccard_pairs(sh, min_intersection=1, min_jaccard=min_jaccard, id_col=id_col)
    return cands.join(verified, ["id_a", "id_b"]).select(
        "id_a", "id_b", "intersection", "jaccard"
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
