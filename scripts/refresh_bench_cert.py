#!/usr/bin/env python
"""Re-measure and commit the benchmark certificate that
tests/test_bench_certificate.py gates against.

Run after a deliberate performance change, review the diff, and commit the
new certificate alongside the change that justified it — the reference's
committed-report workflow (tests/simulation/benchmark/conftest.py:300-390).

    python scripts/refresh_bench_cert.py            # sf0.01 (the gated SF)
"""

from __future__ import annotations

import json
import os
import sys
from datetime import date

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from finiextestingide_spark.session import build_session  # noqa: E402

CERT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_certificates",
    "cert_sf0.01.json",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("bench-cert")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warmup(spark, sf_dir)
    timings = bench.time_queries(spark, sf_dir)
    spark.stop()
    cert = {
        "sf_dir": sf_dir,
        "created": date.today().isoformat(),
        "expires_days": 90,
        # Band per query: fail when measured > max(base * tolerance,
        # base + abs_slack_sec). The multiplicative band catches real
        # regressions (round 3's minhash was 8x); the absolute slack (sized from an
        # observed 5s co-tenant noise spike) keeps short sf0.01 queries
        # from flagging on scheduler noise.
        "tolerance": 3.0,
        "abs_slack_sec": 5.0,
        "queries": timings,
        "total_sec": round(sum(timings.values()), 4),
    }
    os.makedirs(os.path.dirname(CERT_PATH), exist_ok=True)
    with open(CERT_PATH, "w") as f:
        json.dump(cert, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {CERT_PATH}: total {cert['total_sec']}s over {len(timings)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
