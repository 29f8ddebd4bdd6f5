"""Scale-synth data integrity (ADVICE r9, medium).

The sf10 sweep data is built by applying scripts/scale_check's embedding
replication TWICE (base -> sf1 synth -> sf10 synth), so replica vectors
carry COMPOSED orthogonal transforms T_q∘T_r. The old algebraic sign
pattern collided under composition (T2∘T2 == T4∘T0, T1∘T3 == T3∘T1), and
an identity r=0 makes T_a∘T_0 == T_0∘T_a collide for every a — either way
the synthetic set contains exact duplicate copies of base vectors across
replicas, and the ANN/near-dup scaling targets partly measure that data
artifact instead of the engine. These tests pin that the hash-sign scheme
produces pairwise-DISTINCT composed replicas, and that each replica is
still an exact isometry (norms preserved).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _two_stage_replicas(spark, tmp_path, replicas: int) -> dict[int, np.ndarray]:
    from scripts.scale_check import replicate_embeddings

    base = tmp_path / "base"
    s1 = tmp_path / "stage1"
    s2 = tmp_path / "stage2"
    for d in (base, s1, s2):
        d.mkdir(exist_ok=True)
    vec = [float(k + 1) for k in range(16)]  # distinct magnitudes
    spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")
    replicate_embeddings(spark, str(base), str(s1), replicas=replicas)
    replicate_embeddings(spark, str(s1), str(s2), replicas=replicas)
    rows = spark.read.parquet(f"{s2}/embeddings.parquet").collect()
    return {r["vec_id"]: np.array(r["embedding"]) for r in rows}


def test_composed_replicas_pairwise_distinct(spark, tmp_path):
    """replicas=5 twice -> 25 composed copies of ONE base vector, covering
    the ADVICE-named collision pairs (T2∘T2 vs T4∘T0, T1∘T3 vs T3∘T1) and
    the identity-composition pairs (T_a∘T_0 vs T_0∘T_a). All 25 must be
    pairwise distinct."""
    out = _two_stage_replicas(spark, tmp_path, replicas=5)
    assert len(out) == 25
    keys = sorted(out)
    for a in range(len(keys)):
        for b in range(a + 1, len(keys)):
            assert not np.array_equal(out[keys[a]], out[keys[b]]), (
                keys[a],
                keys[b],
            )


def test_replica_transform_is_isometry(spark, tmp_path):
    """Every composed replica preserves the base vector's norm exactly
    (shift + sign flips are orthogonal), so per-replica neighborhood
    structure stays the organic one."""
    out = _two_stage_replicas(spark, tmp_path, replicas=3)
    base_norm = np.linalg.norm([float(k + 1) for k in range(16)])
    for vid, v in out.items():
        assert abs(np.linalg.norm(v) - base_norm) < 1e-3, vid
        # a permutation-with-signs: the multiset of |coords| is preserved
        assert sorted(np.abs(v).round(3).tolist()) == [
            float(k + 1) for k in range(16)
        ], vid
