"""Quality-filter-on-ingest: Gopher/MassiveText rules over a document
STREAM — the curation decision a production training-data pipeline makes
as documents ARRIVE, not in a nightly batch: a crawler's output flows
through the rule set and lands already flagged, so downstream consumers
(dedup, mixing, training-set cuts) read a pre-judged corpus.

Extends the §2.9 streaming discipline to the text-quality surface with the
engine's cheapest streaming posture (the `streaming_ivf_assign` /
`streaming_pq_encode` class): every Gopher rule is a pure Column
expression over the single document (regex counts, length ratios —
`operators/text.py gopher_quality_flags`), so the stream is a STATELESS
narrow map at source parallelism. No watermark, no state store, nothing to
bootstrap: restart is idempotent, backfill is the batch form + a plain
union (`merged_quality_flags`), and #355 cold-start is satisfied with no
protocol at all. The per-doc judgments are also exactly the quality side
of `curation.curate_corpus` — the streamed flags can be joined into the
decision table unchanged.

Threshold changes (min_words etc.) are a restart boundary like quantizer
bumps: flags are pure functions of (document, thresholds), so re-flagging
history after a threshold change is one batch pass, never stream state
surgery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.text import gopher_quality_flags


def streaming_quality_flags(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text: str = "text",
    min_words: int = 50,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Apply the Gopher rule set to a document stream; returns one flags row
    per arriving document (same shape as the batch `gopher_quality` gate)."""
    if not stream.isStreaming:
        raise ValueError("streaming_quality_flags expects a streaming DataFrame")
    g = gopher_quality_flags(
        F.col(text), min_words=min_words, min_stop_hits=min_stop_hits
    )
    return stream.select(
        F.col(id_col),
        g["n_words"].alias("n_words"),
        F.round(g["mean_word_len"], 6).alias("mean_word_len"),
        F.round(g["symbol_word_ratio"], 6).alias("symbol_word_ratio"),
        F.round(g["bullet_line_frac"], 6).alias("bullet_line_frac"),
        F.round(g["ellipsis_line_frac"], 6).alias("ellipsis_line_frac"),
        F.round(g["alpha_word_frac"], 6).alias("alpha_word_frac"),
        g["stop_hits"].alias("stop_hits"),
        g["keep"].alias("keep"),
    )


def merged_quality_flags(batch_flags: DataFrame, streamed_flags: DataFrame) -> DataFrame:
    """Read view of the fully-flagged corpus: batch-flagged history UNION
    the streamed tail — stateless judgment, plain union by name."""
    return batch_flags.unionByName(streamed_flags)
