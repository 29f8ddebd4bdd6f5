#!/usr/bin/env python
"""Round-15 optimization profiler: decompose each expensive headline query
into (a) fn-build time (eager planning actions: CC rounds, budget counts,
stream drives) and (b) noop-sink execution time, per guide §1. Also dumps
.explain('formatted') to plans/r15/<query>_<tag>.txt.

Usage: python scripts/profile_r15.py [--tag before|after] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finiextestingide_spark.gate import all_queries  # noqa: E402
from finiextestingide_spark.session import build_session  # noqa: E402

DEFAULT = [
    "curated_corpus",
    "merged_reconcile_view",
    "ngram_mkn_perplexity",
    "embedding_neardup_lsh",
    "bus_decode_ticks",
    "streaming_reconcile_restart",
    "replay_loadtest_40",
    "winnow_pairs",
    "drift_audit",
    "modified_kn_perplexity",
    "pricing_summary",
    "minhash_lsh_pairs",
    "bigram_perplexity",
    "extreme_moves_hourly",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    spark = build_session("profile-r15")
    spark.sparkContext.setLogLevel("ERROR")

    from bench import warmup

    warmup(spark, args.sf)

    qs = all_queries()
    names = args.queries or DEFAULT
    for name in names:
        q = qs[name]
        builds, execs = [], []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}: build #{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: exec #{i}")
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.sparkContext.setJobDescription(None)
        bmin, emin = min(builds), min(execs)
        print(
            f"{name:32s} build_min={bmin:7.3f} exec_min={emin:7.3f} "
            f"total_min={bmin + emin:7.3f}  builds={[round(b,3) for b in builds]} "
            f"execs={[round(e,3) for e in execs]}",
            flush=True,
        )
        if not args.no_explain:
            import io
            from contextlib import redirect_stdout

            df = q.fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
