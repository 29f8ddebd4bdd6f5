#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every gate query on
Spark AND its DuckDB oracle, canonicalize both frames, and require exact
equality (what an order-insensitive value-hash needs).

Usage: python scripts/check_gate.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from finiextestingide_spark.gate import all_queries  # noqa: E402
from finiextestingide_spark.session import build_session  # noqa: E402
from finiextestingide_spark.sources.tables import TABLES  # noqa: E402
from finiextestingide_spark.testing import compare_frames  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    qs = all_queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = build_session("check-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    failures = 0
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        if q.sql is None:
            print(f"ok    {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            oracle_pdf = con.execute(q.sql).df()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            failures += 1
            continue
        issues = compare_frames(spark_pdf, oracle_pdf)
        if issues:
            failures += 1
            print(f"FAIL  {name} ({len(spark_pdf)} vs {len(oracle_pdf)} rows):")
            for i in issues:
                print(f"      {i}")
        else:
            print(f"PASS  {name}: {len(spark_pdf)} rows, {time.time()-t0:.1f}s")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
