"""Driver-facing query registry (__spark_entry__ contract).

Each entry pairs a Spark implementation (built from the operator library)
with the ANSI-SQL oracle DuckDB runs on the same parquet tables. Entries
without oracle SQL are the genuinely non-SQL-expressible operators
(recursive EMA family, the stateful replay) — the driver records a weaker
rows-only check for those and they carry golden-value pytest coverage
instead.

Cross-engine determinism policy (every query obeys it):
- float aggregates over data-dependent doubles are either computed on exact
  DECIMAL casts (sums) or rounded to 6 decimals on BOTH sides;
- integer sums are CAST to BIGINT in DuckDB (it widens to HUGEINT);
- raw event timestamps are emitted as epoch-millisecond BIGINTs; bucket
  starts (exact minute boundaries) are emitted as timestamps;
- every computed column is aliased identically on both sides;
- ties in any top-k are broken by a unique key.
"""

from __future__ import annotations

from ._util import Query  # noqa: F401


def all_queries() -> dict[str, Query]:
    from . import llmdata, relational, replay_ext, timeseries

    out: dict[str, Query] = {}
    for mod in (relational, timeseries, llmdata, replay_ext):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate gate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
