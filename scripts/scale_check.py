#!/usr/bin/env python
"""sf1-scale spot-check: synthesize 10x data from sf0.1 and measure how the
most expensive headline queries actually scale (SCALE.md records results).

The driver ships no sf1 testdata, so this builds an sf1-shaped directory in
a scratch dir (default /tmp/sf1_synth) from sf0.1:

- lineitem x10: replicas with offset order keys (6M rows, TPC-H sf1 shape)
- events    x10: replicas shifted in time past the prior span (a 10x-longer
  history per symbol — the shape window scans and replay see at scale)
- documents x10: replicas with offset doc ids and a per-replica token
  appended to the text, so shingle relationships repeat WITHIN a replica
  but no artificial cross-replica duplicate groups appear (replicating
  text verbatim would make every doc a 10-way near-dup cluster and blow
  the pair count quadratically — not what 10x organic data looks like)
- every other table: symlinked from sf0.1 unchanged

Then each target query runs at sf0.1 and at the synthetic sf1, median of
`--runs` (default 3), and the ratio is printed. Linear-ish ratios (<= ~12x
for 10x data on a fixed 32-core box) mean no quadratic stage or skew cliff
is hiding below the sf0.1 horizon.

    python scripts/scale_check.py            # build (if absent) + measure
    python scripts/scale_check.py --rebuild  # force rebuild
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from finiextestingide_spark.session import build_session  # noqa: E402
from finiextestingide_spark.sources.tables import TABLES  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
TARGETS = [
    "pricing_summary",
    "extreme_moves_hourly",
    "minhash_lsh_pairs",
    "contamination_3gram",
    "replay_loadtest_40",
]


def build_synth(
    spark, dest: str, *, src: str = SRC, replicas: int = REPLICAS,
    doc_perturb: str = "token",
) -> None:
    """Synthesize ``replicas``x data from ``src`` into ``dest``.

    ``doc_perturb``: how document replicas are made textually distinct —
    "token" appends one per-replica token (the sf1 scheme: keeps replicas
    of one base doc similar, which after TWO decades of stacking would
    turn every base doc into a 100-way near-dup cluster and measure the
    data artifact, not the engine); "caesar" rotates the lowercase
    alphabet per replica via translate() — word boundaries, lengths and
    within-replica dup structure are preserved exactly, but shingle sets
    are DISJOINT across replicas, so relationship counts scale linearly
    the way organically grown data would."""
    if doc_perturb == "caesar" and replicas > 26:
        # rotation r and r+26 alias (r % 26), silently reintroducing the
        # cross-replica near-dup artifact the scheme exists to avoid
        # (ADVICE r8) — fail loud instead of degrading the guarantee
        raise ValueError(
            f"doc_perturb='caesar' supports at most 26 distinct replicas "
            f"(alphabet rotations); got replicas={replicas}. Use "
            f"doc_perturb='token' or compose a second distinctness scheme."
        )
    os.makedirs(dest, exist_ok=True)

    # lineitem: offset order keys per replica
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    parts = [
        li.withColumn("l_orderkey", (F.col("l_orderkey") + F.lit(r * (max_ok + 1))))
        for r in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")

    # events: shift each replica past the prior time span
    ev = spark.read.parquet(f"{src}/events.parquet")
    ts_col = "ts"
    bounds = ev.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"), F.max("event_id").alias("me")
    ).collect()[0]
    # ts may be TIMESTAMP(NANOS)-as-long or a real timestamp depending on
    # generation; handle both by working in whatever type the column has
    dtype = dict(ev.dtypes)[ts_col]
    parts = []
    for r in range(replicas):
        p = ev.withColumn("event_id", F.col("event_id") + F.lit(r * (bounds["me"] + 1)))
        if dtype.startswith("timestamp"):
            shift_s = int((bounds["hi"] - bounds["lo"]).total_seconds()) + 3600
            p = p.withColumn(ts_col, F.col(ts_col) + F.expr(f"INTERVAL {r * shift_s} SECOND"))
        else:  # ns-epoch long
            shift_ns = int(bounds["hi"] - bounds["lo"]) + 3_600_000_000_000
            p = p.withColumn(ts_col, F.col(ts_col) + F.lit(r * shift_ns))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/events.parquet")

    # documents: offset ids + per-replica textual distinctness
    dc = spark.read.parquet(f"{src}/documents.parquet")
    max_id = dc.agg(F.max("doc_id")).collect()[0][0]
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def perturb(col, r):
        if doc_perturb == "caesar":
            if r == 0:
                return col
            rot = alpha[r % 26 :] + alpha[: r % 26]
            return F.translate(col, alpha, rot)
        return F.concat(col, F.lit(f" replica{r}tok"))

    parts = [
        dc.withColumn("doc_id", F.col("doc_id") + F.lit(r * (max_id + 1))).withColumn(
            "text", perturb(F.col("text"), r)
        )
        for r in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/documents.parquet")

    replicate_embeddings(spark, src, dest, replicas=replicas)

    for t in TABLES:
        link = f"{dest}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(os.path.realpath(f"{src}/{t}.parquet"), link)




def replicate_embeddings(spark, src: str, dest: str, *, replicas: int) -> None:
    """embeddings: offset ids + a per-replica ORTHOGONAL transform (cyclic
    coordinate shift by r composed with hash-derived +-1 sign flips).
    Orthogonality preserves every norm and pairwise dot WITHIN a replica
    (so per-replica neighborhood structure is exactly the organic one),
    while a transformed copy of a base vector is generically near-
    orthogonal to the original — no artificial cross-replica near-dup
    clusters, the embedding analogue of the caesar/token document
    perturbation (round-9 item 3: the ANN surface gets measured 10x/100x
    rows instead of constant-input ones).

    Signs come from xxhash64(i, r), NOT an algebraic pattern, and EVERY
    replica (r = 0 included) gets a nontrivial sign pattern: sf10 is built
    from the sf1 synth, so replicas carry COMPOSED transforms T_r2∘T_r1,
    and the old parity pattern parity(r*(i+1)) collided under composition
    (T2∘T2 == T4∘T0, T1∘T3 == T3∘T1 — ADVICE r9), planting exact duplicate
    copies across replicas; an identity r=0 would likewise make
    T_a∘T_0 == T_0∘T_a collide for every a. With hash signs on all
    replicas, composed patterns differ except with probability ~2^-dim per
    pair (pinned by tests/test_scale_synth.py), for ANY replica count — no
    caesar-style replica bound is needed. r=0 keeps vec_ids but applies
    its sign reflection: a global orthogonal map, so all within-replica
    structure (norms, dots, neighborhoods) is still exactly the organic
    one. Callable standalone to refresh an existing synth dir in place."""
    em = spark.read.parquet(f"{src}/embeddings.parquet")
    max_vid = em.agg(F.max("vec_id")).collect()[0][0]
    parts = []
    for r in range(replicas):
        p = em.withColumn("vec_id", F.col("vec_id") + F.lit(r * (max_vid + 1)))
        n = F.size("embedding")
        idx = F.sequence(F.lit(0), n - 1)
        # NOTE: single-arg lambda only — F.transform dispatches on lambda
        # arity, so adding a default-bound second arg would make it the
        # (element, index) form. The expression is built eagerly this loop
        # iteration, so the plain closure over r is safe.
        rot = F.transform(
            idx,
            lambda i: F.element_at(F.col("embedding"), ((i + F.lit(r)) % n) + 1)
            * (1 - 2 * F.pmod(F.xxhash64(i, F.lit(r)), F.lit(2))),
        ).cast("array<float>")
        p = p.withColumn("embedding", rot)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    emb_dest = f"{dest}/embeddings.parquet"
    if os.path.islink(emb_dest):
        # older synths symlinked embeddings to the READ-ONLY testdata; an
        # overwrite through the link would try to write there — unlink first
        os.unlink(emb_dest)
    out.write.mode("overwrite").parquet(emb_dest)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/sf1_synth")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("targets", nargs="*", default=TARGETS)
    args = ap.parse_args()

    spark = build_session("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    if args.rebuild or not os.path.exists(f"{args.scratch}/documents.parquet"):
        print("building 10x synthetic data ...", file=sys.stderr)
        build_synth(spark, args.scratch)

    import bench

    bench.warmup(spark, SRC)  # JVM/codegen/worker-pool costs out of band
    results = {}
    for name in args.targets or TARGETS:
        base = bench.time_queries(spark, SRC, names=[name], runs=args.runs)[name]
        big = bench.time_queries(spark, args.scratch, names=[name], runs=args.runs)[name]
        results[name] = {
            "sf0.1_sec": base,
            "sf1_sec": big,
            "ratio": round(big / base, 2) if base else None,
        }
        print(json.dumps({name: results[name]}))
    print(json.dumps({"scale_check": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
