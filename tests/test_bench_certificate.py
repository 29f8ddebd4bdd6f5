"""In-repo performance regression gate — the reference's benchmark-
certificate model (tests/simulation/benchmark/conftest.py:300-390,
test_throughput_regression.py:29-53): a committed JSON report with
tolerance bands and an expiry, failing CI when a headline query regresses
past its band. Round 3's 62% bench swing (an 8x minhash regression hidden
behind driver-only measurement) would have failed here in-repo.

Bands: fail when measured > max(base * tolerance, base + abs_slack_sec).
The multiplicative band catches real regressions; the absolute slack keeps
sub-second sf0.01 queries from flagging on scheduler noise. Refresh with
scripts/refresh_bench_cert.py after a deliberate perf change and commit
the new certificate with that change.
"""

from __future__ import annotations

import json
import os
from datetime import date, timedelta

import pytest

import bench

CERT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_certificates",
    "cert_sf0.01.json",
)


@pytest.fixture(scope="module")
def cert():
    with open(CERT_PATH) as f:
        return json.load(f)


def test_certificate_not_expired(cert):
    """90-day expiry, the reference's staleness rule: a certificate that
    outlives its measurement context stops being a meaningful baseline."""
    created = date.fromisoformat(cert["created"])
    assert date.today() <= created + timedelta(days=cert["expires_days"]), (
        f"benchmark certificate expired (created {cert['created']}); "
        "re-measure with scripts/refresh_bench_cert.py"
    )


def test_certificate_covers_headline(cert):
    assert set(cert["queries"]) == set(bench.HEADLINE)


def test_headline_queries_within_certificate_bands(spark, cert):
    sf_dir = os.environ.get("SPARK_GRAFT_BENCH_SF_DIR", cert["sf_dir"])
    if not os.path.exists(sf_dir):
        pytest.skip(f"benchmark testdata not present: {sf_dir}")
    bench.warmup(spark, sf_dir)
    measured = bench.time_queries(spark, sf_dir, runs=3)
    tol, slack = cert["tolerance"], cert["abs_slack_sec"]
    failures = []
    for name, base in sorted(cert["queries"].items()):
        allowed = max(base * tol, base + slack)
        got = measured[name]
        if got > allowed:
            failures.append(f"{name}: {got:.2f}s > allowed {allowed:.2f}s (cert {base:.2f}s)")
    assert not failures, "benchmark regression past certificate bands:\n" + "\n".join(failures)
    # the whole-suite band guards distributed small regressions no single
    # query trips
    total_allowed = cert["total_sec"] * 2.0
    assert sum(measured.values()) <= total_allowed, (
        f"total {sum(measured.values()):.2f}s > {total_allowed:.2f}s "
        f"(certificate total {cert['total_sec']:.2f}s x 2.0)"
    )
