"""finiextestingide_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dc-deal/FiniexTestingIDE.

Not a port: every operator from the reference (see SURVEY.md §2) is
re-expressed idiomatically on Spark — DataFrame/SQL over partitioned Parquet,
window functions and groupBy().agg() for the analytics, applyInPandas for the
one irreducibly sequential piece (the per-scenario replay state machine).

Layout:
    session    — SparkSession factory with scale-oriented defaults
    schemas    — explicit StructTypes for every table contract (§1.2)
    sources/   — ingest (MQL5 JSON, signal JSONL), parquet lake, run ledger
    functions/ — scalar expression library (§2.7)
    operators/ — bars, indicators, as-of joins, gaps, discovery, replay,
                 dedup/similarity/text (LLM-data-pipeline extensions)
    gate/      — the driver-facing query registry with DuckDB oracle SQL
    streaming/ — Structured Streaming live path (§2.9)
"""

__version__ = "0.1.0"
