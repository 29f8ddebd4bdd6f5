"""Residual-vs-raw IVF-PQ recall audit (VERDICT r13 #2).

Measures recall@k of the raw-vector IVF-PQ layout (`ivfpq_topk` semantics)
vs the residual layout / true IVFADC (`ivfpq_residual_topk` semantics)
against exact L2 ground truth, at configurable codebook size and nprobe.

What is REAL Spark and what is mirrored: the trained codebooks
(`pq_train_codebooks`), the coarse assignment (`assign_centroids`), and
the code columns (`pq_encode`, incl. over `residual_vectors`) are produced
by the actual operators. The per-query probe + LUT + ADC ranking is
mirrored in numpy — bit-faithfully: the probe rule is max cosine / lowest
id (`coarse_probes`), LUT entries round to 6 dp and sum exactly, ranking
ties to the smaller id — because the Spark scoring path is already
oracle-pinned by the ivfpq_topk_10 / ivfpq_residual_topk_10 gates; a
per-query Spark plan x 80 configurations is measurement overhead, not
extra evidence. (The r13 audit ran the full Spark path at 16 codes and
matches these numbers.)

Two corpora:
- ``gate``: the sf0.01 synthetic embeddings (near-orthogonal — PQ's worst
  case; the r13 audit found residual FLAT at 0.200 with a verified
  collapse-to-cell-mean mechanism).
- ``clustered``: a synthetic corpus WITH real cluster structure (C unit
  centers, Gaussian displacement sigma; coarse quantizer = the true
  centers), the regime the residual layout exists for.

Usage:
    python scripts/ivfpq_recall_audit.py --corpus gate --codes 16 64
    python scripts/ivfpq_recall_audit.py --corpus clustered --codes 16 64 \
        --sigma 0.15

Prints one row per (codes, layout); paste into SCALE.md §9.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession  # noqa: E402

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


def spark_artifacts(spark, emb, cent_rows, k_codes, layout):
    """The REAL operator outputs: assignment, trained books, codes — and,
    for the opq layouts, the LEARNED rotation (opq_train_rotation, the
    alternating-Procrustes loop; r15). Coarse assignment is rotation-
    invariant (orthogonal R preserves cosines), so the cells come from
    the unrotated vectors for every layout and OPQ changes only the code
    space, exactly like FAISS's OPQ pretransform over an IVF index."""
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cent_rows],
        "centroid_id long, embedding array<double>",
    )
    assigned = sim.assign_centroids(emb, cents_df).localCheckpoint()
    rot = None
    if layout in ("opq", "opq_residual"):
        if layout == "opq_residual":
            src = sim.residual_vectors(assigned, cents_df)
            vec_col = "residual"
        else:
            src = assigned
            vec_col = "embedding"
        rot, books = sim.opq_train_rotation(
            src, m=8, k_codes=k_codes, iters=3, pq_iters=2, vec_col=vec_col
        )
        codes_src = sim.opq_rotate(src, rot, vec_col=vec_col)
    else:
        if layout == "residual":
            train_src = sim.residual_vectors(assigned, cents_df)
            vec_col = "residual"
            codes_src = train_src
        else:
            train_src = emb
            vec_col = "embedding"
            codes_src = assigned
        cb = sim.pq_train_codebooks(
            train_src, m=8, k_codes=k_codes, iters=2, vec_col=vec_col
        )
        books = sim.collect_codebooks(cb, vec_col=vec_col)
    codes_df = sim.pq_encode(codes_src, books, vec_col=vec_col)
    m = len(books)
    rows = codes_df.select(
        "vec_id", "centroid_id", *[f"pq{j}" for j in range(m)]
    ).collect()
    code_map = {
        int(r["vec_id"]): (int(r["centroid_id"]),
                           [int(r[f"pq{j}"]) for j in range(m)])
        for r in rows
    }
    return books, code_map, rot


def mirror_probe(cent_rows, q, nprobe):
    scored = []
    for cid, cv in cent_rows:
        cv = np.asarray(cv)
        den = float(np.sqrt((q * q).sum())) * float(np.sqrt((cv * cv).sum()))
        if den > 0:
            scored.append((-float(q @ cv), cid, cv))
    scored.sort(key=lambda t: (t[0], t[1]))
    return [(cid, cv) for _, cid, cv in scored[:nprobe]]


def mirror_adc_topk(books, code_map, ids, q_for_cell, probe_cells, k,
                    exclude_id):
    """ADC ranking over the probed cells, mirroring pq_adc_topk /
    ivfpq_residual_topk exactly: 6-dp-rounded LUT entries, exact sum,
    ties to the smaller id."""
    m = len(books)
    w = len(books[0][0])
    scored = []
    for cell, qv in probe_cells:
        luts = []
        for j in range(m):
            qj = qv[j * w:(j + 1) * w]
            luts.append([round(float(((qj - np.asarray(c)) ** 2).sum()), 6)
                         for c in books[j]])
        for vid in ids:
            vid = int(vid)
            if vid == exclude_id:
                continue
            vcell, vcodes = code_map[vid]
            if vcell != cell:
                continue
            d = round(sum(luts[j][vcodes[j]] for j in range(m)), 6)
            scored.append((d, vid))
    scored.sort()
    return {vid for _, vid in scored[:k]}


def audit(spark, emb, ids, X, cent_rows, k_codes, nprobes, layout,
          refine_mult=0):
    books, code_map, rot = spark_artifacts(
        spark, emb, cent_rows, k_codes, layout
    )
    R = np.array(rot) if rot is not None else None
    qids = [int(i) for i in ids[:N_QUERIES]]
    idx_of = {int(v): i for i, v in enumerate(ids)}
    out, out_ref = {}, {}
    for nprobe in nprobes:
        hits = hits_ref = 0
        for qid in qids:
            qi = int(np.where(ids == qid)[0][0])
            q = X[qi]
            probes = mirror_probe(cent_rows, q, nprobe)
            if layout == "residual":
                probe_cells = [(cid, q - cv) for cid, cv in probes]
            elif layout == "opq_residual":
                probe_cells = [(cid, R @ (q - cv)) for cid, cv in probes]
            elif layout == "opq":
                probe_cells = [(cid, R @ q) for cid, _ in probes]
            else:
                probe_cells = [(cid, q) for cid, _ in probes]
            want = exact_topk(X, ids, qi, K)
            got = mirror_adc_topk(
                books, code_map, ids, q, probe_cells, K, exclude_id=qid
            )
            hits += len(got & want)
            if refine_mult:
                short = mirror_adc_topk(
                    books, code_map, ids, q, probe_cells, refine_mult * K,
                    exclude_id=qid,
                )
                # refine_topk semantics: exact L2 rerank of ONLY the
                # shortlist, ties to the smaller id
                rer = sorted(
                    (float(((X[idx_of[v]] - q) ** 2).sum()), v) for v in short
                )
                hits_ref += len({v for _, v in rer[:K]} & want)
        out[nprobe] = hits / (len(qids) * K)
        out_ref[nprobe] = hits_ref / (len(qids) * K)
    return (out, out_ref) if refine_mult else (out, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", choices=["gate", "clustered"], default="gate")
    ap.add_argument("--codes", type=int, nargs="+", default=[16])
    ap.add_argument("--nprobe", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--sigma", type=float, default=0.15)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--layouts", nargs="+", default=None,
                    choices=["raw", "residual", "opq", "opq_residual"],
                    help="layouts to audit (default: all four)")
    ap.add_argument("--refine", type=int, default=0, metavar="MULT",
                    help="also report recall after exact-L2 refine of a "
                         "MULT*k ADC shortlist (refine_topk semantics)")
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
    layouts = ("raw", "residual", "opq", "opq_residual")
    if args.layouts:
        layouts = tuple(args.layouts)
    for k_codes in args.codes:
        for layout in layouts:
            r, rr = audit(spark, emb, ids, X, cents, k_codes, args.nprobe,
                          layout, refine_mult=args.refine)
            row = " ".join(f"nprobe{p}={r[p]:.3f}" for p in args.nprobe)
            print(f"codes={k_codes:3d} layout={layout:12s} {row}", flush=True)
            if rr is not None:
                row = " ".join(f"nprobe{p}={rr[p]:.3f}" for p in args.nprobe)
                print(f"codes={k_codes:3d}   +refine{args.refine}x {row}",
                      flush=True)


if __name__ == "__main__":
    main()
