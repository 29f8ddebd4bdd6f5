#!/usr/bin/env python
"""Full-registry correctness verification at synthetic sf1 (round-6 #5).

SCALE.md §6c measured 5 queries at sf1; this drives the WHOLE gate registry
against the same 10x-synthesized data (scripts/scale_check.build_synth) and
records per-query Spark wall, oracle wall, and status into a markdown table
(SF1.md by default). DuckDB oracles get a watchdog timeout (interrupt from
a timer thread) so one quadratic oracle cannot wedge the run — a timeout is
recorded as its own status, distinct from a correctness failure: the SPARK
side still ran and its wall time is the scaling signal.

    python scripts/sf1_check.py                  # build (if absent) + run all
    python scripts/sf1_check.py minhash_lsh_pairs  # subset
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from finiextestingide_spark.gate import all_queries  # noqa: E402
from finiextestingide_spark.sources.tables import TABLES  # noqa: E402
from finiextestingide_spark.testing import compare_frames  # noqa: E402
from scripts.check_gate import vanilla_session  # noqa: E402
from scripts.scale_check import build_synth  # noqa: E402


def run_oracle_with_timeout(con, sql: str, timeout_s: float):
    """Execute oracle SQL; a timer thread interrupts a per-query CURSOR at
    the deadline. Returns (df, elapsed, timed_out).

    The cursor (a child connection sharing the database and views) is
    created fresh per call and closed afterwards, so a watchdog that fires
    just as execute() completes interrupts only this query's connection —
    a pending interrupt can never leak into the NEXT query's execution and
    misreport it as a timeout."""
    timed_out = threading.Event()
    cur = con.cursor()

    def watchdog():
        timed_out.set()
        cur.interrupt()

    timer = threading.Timer(timeout_s, watchdog)
    timer.start()
    t0 = time.time()
    try:
        df = cur.execute(sql).df()
        return df, time.time() - t0, False
    except duckdb.InterruptException:
        return None, time.time() - t0, True
    except Exception:
        if timed_out.is_set():
            return None, time.time() - t0, True
        raise
    finally:
        timer.cancel()
        cur.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/sf1_synth")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--oracle-timeout", type=float, default=900.0)
    ap.add_argument("--out", default="SF1.md")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = vanilla_session()
    spark.sparkContext.setLogLevel("ERROR")
    if args.rebuild or not os.path.exists(f"{args.scratch}/documents.parquet"):
        print("building 10x synthetic sf1 ...", file=sys.stderr)
        from finiextestingide_spark.session import build_session  # noqa: F401

        build_synth(spark, args.scratch)

    qs = all_queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.scratch}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files; driver-shipped
        # (symlinked) tables are single files — glob the former
        pattern = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")

    rows = []
    failures = 0
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, args.scratch).toPandas()
            spark_s = time.time() - t0
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            rows.append((name, None, None, "SPARK-ERROR"))
            failures += 1
            continue
        if q.sql is None:
            print(f"ok    {name}: rows-only ({len(spark_pdf)} rows, {spark_s:.1f}s)")
            rows.append((name, spark_s, None, f"rows-only ({len(spark_pdf)})"))
            continue
        try:
            oracle_pdf, oracle_s, timed_out = run_oracle_with_timeout(
                con, q.sql, args.oracle_timeout
            )
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            rows.append((name, spark_s, None, "ORACLE-ERROR"))
            failures += 1
            continue
        if timed_out:
            print(
                f"ok*   {name}: spark {spark_s:.1f}s ({len(spark_pdf)} rows); "
                f"oracle timed out > {args.oracle_timeout:.0f}s"
            )
            rows.append((name, spark_s, oracle_s, "oracle-timeout"))
            continue
        issues = compare_frames(spark_pdf, oracle_pdf)
        if not issues:
            print(f"PASS  {name}: {len(spark_pdf)} rows, spark {spark_s:.1f}s, oracle {oracle_s:.1f}s")
            rows.append((name, spark_s, oracle_s, "PASS"))
            continue
        # exact hash failed: retry under a disclosed float tolerance —
        # at 10x data, double accumulations in different summation orders
        # legitimately diverge past a round-to-6 boundary. A PASS~ is
        # reported separately from an exact PASS.
        tol_issues = compare_frames(
            spark_pdf, oracle_pdf, float_atol=1e-4, float_rtol=1e-9
        )
        if not tol_issues:
            print(
                f"PASS~ {name}: exact hash missed, within float tolerance "
                f"(atol 1e-4) — {issues[0]}"
            )
            rows.append((name, spark_s, oracle_s, "PASS~ (float tol)"))
        else:
            failures += 1
            print(f"FAIL  {name} ({len(spark_pdf)} vs {len(oracle_pdf)} rows):")
            for i in tol_issues:
                print(f"      {i}")
            rows.append((name, spark_s, oracle_s, "MISMATCH"))

    n_pass = sum(1 for r in rows if r[3] == "PASS")
    n_tol = sum(1 for r in rows if r[3].startswith("PASS~"))
    n_rows_only = sum(1 for r in rows if r[3].startswith("rows-only"))
    n_timeout = sum(1 for r in rows if r[3] == "oracle-timeout")
    print(
        f"\n{n_pass} hash-matched, {n_tol} float-tolerance, {n_rows_only} rows-only, "
        f"{n_timeout} oracle-timeout, {failures} failed, of {len(names)}"
    )

    with open(args.out, "w") as f:
        f.write(
            "# SF1.md — full-registry verification at synthetic sf1 (10x sf0.1)\n\n"
            f"Data: `{args.scratch}` built by `scripts/scale_check.build_synth` "
            "(lineitem/events/documents x10 with offset keys / shifted time / "
            "per-replica tokens; other tables shared). Every registry query runs "
            "on Spark (local[32]) against this data and, where an oracle exists, "
            "is hash-compared to DuckDB on the SAME data. `oracle-timeout` means "
            "the DUCKDB side exceeded the per-query budget "
            f"({args.oracle_timeout:.0f}s) — the Spark side completed; its wall "
            "time is the scaling signal.\n\n"
            "| query | spark s | oracle s | status |\n|---|---|---|---|\n"
        )
        for name, ss, os_, status in rows:
            f.write(
                f"| {name} | {'' if ss is None else f'{ss:.1f}'} "
                f"| {'' if os_ is None else f'{os_:.1f}'} | {status} |\n"
            )
        f.write(
            f"\nTotals: **{n_pass} hash-matched**, {n_tol} within float tolerance "
            f"(atol 1e-4 — 10x-longer double accumulations in different summation "
            f"orders), {n_rows_only} rows-only, {n_timeout} oracle-timeout, "
            f"{failures} failed, of {len(names)}.\n"
        )
    print(f"wrote {args.out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
