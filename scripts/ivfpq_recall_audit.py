"""Residual-vs-raw IVF-PQ recall audit (VERDICT r13 #2).

Measures recall@k of `ivfpq_topk` (PQ books trained on raw vectors) vs
`ivfpq_residual_topk` (true IVFADC: books trained on coarse residuals)
against exact L2 ground truth, at configurable codebook size and nprobe.

Two corpora:
- ``gate``: the sf0.01 synthetic embeddings (near-orthogonal — PQ's worst
  case; the r13 audit ran 16 codes here and found residual FLAT at 0.200
  with a verified collapse-to-cell-mean mechanism).
- ``clustered``: a synthetic corpus WITH real cluster structure (C centers,
  Gaussian displacement sigma), the regime the residual layout exists for:
  residuals concentrate near the origin, so residual books spend their
  codes on within-cell displacement instead of absolute position. The
  coarse quantizer is the TRUE centers — the favorable case.

Usage:
    python scripts/ivfpq_recall_audit.py --corpus gate --codes 16 64
    python scripts/ivfpq_recall_audit.py --corpus clustered --codes 16 64 \
        --sigma 0.15

Prints one table row per (layout, codes, nprobe); paste results into
SCALE.md §9. Ground truth is exact squared-L2 computed in numpy (it is
the REFERENCE, not the system under test); the rankings being audited
come from the real operators.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402

from finiextestingide_spark.operators import similarity as sim  # noqa: E402

N_QUERIES = 20
K = 10


def gate_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([int(r["vec_id"]) for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in rows[:8]]
    return emb, ids, X, cents


def clustered_corpus(spark, n=500, dim=64, n_clusters=8, sigma=0.15, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n)
    X = centers[labels] + rng.normal(0.0, sigma, size=(n, dim))
    ids = np.arange(n)
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    cents = [(int(c), [float(v) for v in centers[c]])
             for c in range(n_clusters)]
    return emb, ids, X, cents


def exact_topk(X, ids, qi, k):
    d = ((X - X[qi]) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))
    out = [int(ids[j]) for j in order if ids[j] != ids[qi]]
    return set(out[:k])


def audit(spark, emb, ids, X, cent_rows, k_codes, nprobes, layout):
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cent_rows],
        "centroid_id long, embedding array<double>",
    )
    assigned = sim.assign_centroids(emb, cents_df).localCheckpoint()
    if layout == "residual":
        train_src = sim.residual_vectors(assigned, cents_df)
        vec_col = "residual"
    else:
        train_src = emb
        vec_col = "embedding"
    cb = sim.pq_train_codebooks(
        train_src, m=8, k_codes=k_codes, iters=2, vec_col=vec_col
    )
    books = sim.collect_codebooks(cb, vec_col=vec_col)

    qids = [int(i) for i in ids[:N_QUERIES]]
    out = {}
    for nprobe in nprobes:
        hits = 0
        for qid in qids:
            qi = int(np.where(ids == qid)[0][0])
            q = [float(v) for v in X[qi]]
            if layout == "residual":
                top = sim.ivfpq_residual_topk(
                    assigned, books, cent_rows, q, K,
                    nprobe=nprobe, exclude_id=qid,
                )
            else:
                top = sim.ivfpq_topk(
                    assigned, books, cents_df, q, K,
                    nprobe=nprobe, exclude_id=qid,
                )
            got = {int(r["vec_id"]) for r in top.collect()}
            hits += len(got & exact_topk(X, ids, qi, K))
        out[nprobe] = hits / (len(qids) * K)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", choices=["gate", "clustered"], default="gate")
    ap.add_argument("--codes", type=int, nargs="+", default=[16])
    ap.add_argument("--nprobe", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--sigma", type=float, default=0.15)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("ivfpq_recall_audit")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.corpus == "gate":
        emb, ids, X, cents = gate_corpus(spark, args.sf_dir)
    else:
        emb, ids, X, cents = clustered_corpus(spark, sigma=args.sigma)

    print(f"corpus={args.corpus} n={len(ids)} queries={N_QUERIES} k={K}"
          + (f" sigma={args.sigma}" if args.corpus == "clustered" else ""))
    for k_codes in args.codes:
        for layout in ("raw", "residual"):
            r = audit(spark, emb, ids, X, cents, k_codes, args.nprobe, layout)
            row = " ".join(f"nprobe{p}={r[p]:.3f}" for p in args.nprobe)
            print(f"codes={k_codes:3d} layout={layout:8s} {row}", flush=True)


if __name__ == "__main__":
    main()
