"""IVF-PQ codes lake: ingest-encode cost vs per-query cost (VERDICT r13 #1
done-criterion — the SCALE.md row).

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1):
- train: pq_train_codebooks + collect (write-once, corpus-proportional only
  in its two narrow passes — measured for context, amortized over the
  index lifetime);
- ingest: write_pq_lake wall (assign + encode + partitioned write — paid
  ONCE per corpus);
- query_lake: ivfpq_lake_topk min-of-N (partition-pruned codes-only scan);
- query_inplace: ivfpq_topk min-of-N (the self-contained form that
  re-encodes the probed bucket at query time).

The point of the lake is the last two numbers' ratio: the per-query
encode work moves to ingest, so the lake query should be strictly
cheaper and its advantage grows with corpus size (the in-place form
re-encodes every probed vector on every query).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402

from finiextestingide_spark.operators import similarity as sim  # noqa: E402

RUNS = 5


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pq_lake_cost")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb.count()  # warm scan
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    centroid_rows = [
        (int(r["centroid_id"]), [float(x) for x in r["embedding"]])
        for r in centroids.collect()
    ]
    query = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]

    t0 = time.time()  # wall-clock-ok: measurement script, not operator surface
    cb = sim.pq_train_codebooks(emb, m=8, k_codes=16, iters=2)
    books = sim.collect_codebooks(cb)
    t_train = time.time() - t0  # wall-clock-ok: measurement script

    lake = "/tmp/pq_lake_cost"
    t0 = time.time()  # wall-clock-ok: measurement script
    assigned = sim.assign_centroids(emb, centroids)
    sim.write_pq_lake(assigned, books, lake)
    t_ingest = time.time() - t0  # wall-clock-ok: measurement script

    assigned = assigned.localCheckpoint()  # comparable in-place baseline

    def timed(fn):
        walls = []
        for _ in range(RUNS):
            t = time.time()  # wall-clock-ok: measurement script
            fn().collect()
            walls.append(time.time() - t)  # wall-clock-ok: measurement script
        return min(walls)

    q_lake = timed(lambda: sim.ivfpq_lake_topk(
        spark, lake, books, centroid_rows, query, 10, nprobe=1, exclude_id=0
    ))
    q_inplace = timed(lambda: sim.ivfpq_topk(
        assigned, books, centroids, query, 10, nprobe=1, exclude_id=0
    ))
    q_refined = timed(lambda: sim.refine_topk(
        sim.ivfpq_lake_topk(spark, lake, books, centroid_rows, query, 40,
                            nprobe=1, exclude_id=0),
        emb, query, 10,
    ))

    import json
    print(json.dumps({
        "sf_dir": sf_dir,
        "train_secs": round(t_train, 3),
        "ingest_secs": round(t_ingest, 3),
        "query_lake_min": round(q_lake, 3),
        "query_inplace_min": round(q_inplace, 3),
        "query_lake_refined_min": round(q_refined, 3),
        "runs": RUNS,
    }))


if __name__ == "__main__":
    main()
