"""Characterize dedup_embedding_cosine's scale curve (r6 VERDICT
task 4): wall + candidate-pair volume at 1x/4x/10x embeddings, fitted
growth exponents, and the bucket_cap recall/cost dial measured against
planted-copy ground truth at the largest tier.

The scaled tiers plant SCALE-1 jittered copies per base vector
(bench._scaled_dir), i.e. near-dup CLUSTERS of size SCALE — so the
true-pair count grows ~quadratically in SCALE (C(SCALE,2) pairs per
base).  The question this script answers: does the WALL track the
candidate volume (plan is linear in real work) or the input size
(plan has a superlinear defect)?  r6 saw 5.7x wall for 10x input and
left the exponent uncharacterized.

    python scripts/emb_cosine_scale.py          # ~8 min, idle box
    SPARK_GRAFT_EMB_SCALES=1,4 ... (smoke)

Writes one JSON line to BENCH/EMB_COSINE.json and stdout.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (OPENBLAS_CORETYPE pre-numpy)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_EMB_SCALES", "1,4,10").split(",")]
CAPS = [None, 64, 16]
THRESHOLD = 0.35


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _force, _scaled_dir
    from ocr_pytorch_spark.operators import similarity as S
    from ocr_pytorch_spark.operators.dedup import embedding_neardup_pairs
    from ocr_pytorch_spark.operators.similarity import (array_dot,
                                                        quant4)
    from ocr_pytorch_spark.sources.session import get_spark

    spark = get_spark(app="emb-cosine-scale",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def _emb(scale: int):
        d = _scaled_dir(spark, sf_dir=SF_DIR, scale=scale)
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    def _cand_count(emb) -> int:
        # the candidate stage of embedding_neardup_pairs, pre-verify
        keys = S.lsh_band_keys(emb).repartition("band_idx", "bucket")
        probe = S.probe_keys(keys, S.N_PLANES, S.BANDS)
        p = probe.select(F.col("vec_id").alias("pv"), "band_idx",
                         "bucket")
        return (p.join(keys, ["band_idx", "bucket"])
                .where(F.col("pv") != F.col("vec_id"))
                .select(F.least("pv", "vec_id").alias("vec_a"),
                        F.greatest("pv", "vec_id").alias("vec_b"))
                .distinct().count())

    # --- scale curve -------------------------------------------------
    tiers = {}
    for sc in SCALES:
        emb = _emb(sc)
        n_vec = emb.count()
        _force(embedding_neardup_pairs(emb, THRESHOLD))  # warm
        t0 = time.time()
        n_out = embedding_neardup_pairs(emb, THRESHOLD).count()
        wall = time.time() - t0
        tiers[sc] = {"n_vectors": n_vec,
                     "candidate_pairs": _cand_count(emb),
                     "output_pairs": n_out,
                     "wall_sec": round(wall, 2)}

    def _exp(metric: str, a: int, b: int) -> float:
        return round(math.log(tiers[b][metric] / tiers[a][metric])
                     / math.log(b / a), 2)

    lo, hi = min(SCALES), max(SCALES)
    exponents = {
        "wall_vs_scale": _exp("wall_sec", lo, hi),
        "candidates_vs_scale": _exp("candidate_pairs", lo, hi),
        # the plan-quality number: wall growth per unit of real work
        "wall_vs_candidates": round(
            math.log(tiers[hi]["wall_sec"] / tiers[lo]["wall_sec"])
            / math.log(tiers[hi]["candidate_pairs"]
                       / tiers[lo]["candidate_pairs"]), 2),
    }

    # --- bucket_cap dial at the largest tier --------------------------
    # ground truth: planted within-cluster pairs (copy c gets
    # vec_id = base + c*max_vec) whose EXACT cosine >= threshold
    emb = _emb(hi)
    base_dir = _scaled_dir(spark, sf_dir=SF_DIR, scale=1)
    max_vec = (spark.read.parquet(
        os.path.join(base_dir, "embeddings.parquet"))
        .agg(F.max("vec_id")).collect()[0][0]) + 1
    m = emb.select("vec_id",
                   F.pmod("vec_id", F.lit(max_vec)).alias("cluster"))
    a = m.select(F.col("vec_id").alias("vec_a"), "cluster")
    b = m.select(F.col("vec_id").alias("vec_b"), "cluster")
    vt = S.vectors_with_norm(emb)
    truth = (a.join(b, "cluster")
             .where(F.col("vec_a") < F.col("vec_b"))
             .join(vt.select(F.col("vec_id").alias("vec_a"),
                             F.col("vec").alias("va"),
                             F.col("nrm").alias("na")), "vec_a")
             .join(vt.select(F.col("vec_id").alias("vec_b"),
                             F.col("vec").alias("vb"),
                             F.col("nrm").alias("nb")), "vec_b")
             .where(quant4(array_dot(F.col("va"), F.col("vb"))
                           / (F.col("na") * F.col("nb")))
                    >= THRESHOLD)
             .select("vec_a", "vec_b"))
    truth.cache()
    n_truth = truth.count()

    dial = {}
    for cap in CAPS:
        label = "uncapped" if cap is None else f"cap{cap}"
        _force(embedding_neardup_pairs(emb, THRESHOLD,
                                       bucket_cap=cap))  # warm
        t0 = time.time()
        found = (embedding_neardup_pairs(emb, THRESHOLD, bucket_cap=cap)
                 .select("vec_a", "vec_b"))
        n_hit = found.join(truth, ["vec_a", "vec_b"]).count()
        wall = time.time() - t0
        dial[label] = {"wall_sec": round(wall, 2),
                       "planted_recall": round(n_hit / max(n_truth, 1),
                                               4)}
    truth.unpersist()

    result = {"metric": "emb_cosine_scale_curve",
              "threshold": THRESHOLD,
              "tiers": {str(k): v for k, v in tiers.items()},
              "exponents": exponents,
              "cap_dial_tier": hi,
              "planted_true_pairs": n_truth,
              "cap_dial": dial}
    line = json.dumps(result)
    os.makedirs(os.path.join(REPO_ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO_ROOT, "BENCH", "EMB_COSINE.json"),
              "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
