"""Characterize dedup_embedding_cosine's scale curve (r6 VERDICT
task 4; reworked for r7 task 2): wall + candidate-pair volume at
1x/4x/10x embeddings for BOTH candidate plans —

* ``lsh``: pure banded sign-projection (the pre-r8 plan).  Fixed 2^r
  keyspace per band, so on clustered corpora bucket population grows
  with n and candidates go quadratic (r7 measured exponent 2.0).
* ``ivf`` (the shipped plan since r8): IVF-precluster first — every
  vector is assigned to its 3 nearest of ``max(16, n/128)`` cells
  (embedding_neardup_pairs' default ``n_cell_probe=3``) and band
  buckets only pair within a cell — so cell population stays
  constant as the corpus grows and candidates stay ~linear plus the
  true pairs themselves.

The scaled tiers plant SCALE-1 jittered copies per base vector
(bench._scaled_dir), i.e. near-dup CLUSTERS of size SCALE — so the
true-pair count itself grows ~quadratically in SCALE and candidate
exponents must be read against the truth exponent, not 1.0.  Recall
is measured against planted-copy ground truth at the largest tier at
BOTH the demo threshold (0.35) and the realistic near-dup tier (0.9).
The bucket_cap dial is kept as the documented LAST-RESORT fuse — it
trades recall for cost wherever it fires (r7: 0.43 recall at cap64)
— not as the scaling plan.

    python scripts/emb_cosine_scale.py          # ~15 min, idle box
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
CELL_TARGET = 128           # production dial: n_cells ~ n / CELL_TARGET


def _n_cells(n_vec: int) -> int:
    return max(16, n_vec // CELL_TARGET)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _force, _scaled_dir
    from ocr_pytorch_spark.operators import similarity as S
    from ocr_pytorch_spark.operators.dedup import (
        embedding_neardup_candidates, embedding_neardup_pairs)
    from ocr_pytorch_spark.operators.similarity import (array_dot,
                                                        quant4)
    from ocr_pytorch_spark.sources.session import get_spark

    spark = get_spark(app="emb-cosine-scale",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def _emb(scale: int):
        d = _scaled_dir(spark, sf_dir=SF_DIR, scale=scale)
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    # --- scale curve, both candidate plans ----------------------------
    tiers = {}
    for sc in SCALES:
        emb = _emb(sc)
        n_vec = emb.count()
        row = {"n_vectors": n_vec, "n_cells": _n_cells(n_vec)}
        for plan, kw in (("lsh", {}),
                         ("ivf", {"n_cells": _n_cells(n_vec)})):
            _force(embedding_neardup_pairs(emb, THRESHOLD, **kw))
            t0 = time.time()
            n_out = embedding_neardup_pairs(emb, THRESHOLD,
                                            **kw).count()
            wall = time.time() - t0
            row[plan] = {
                "candidate_pairs":
                    embedding_neardup_candidates(emb, **kw).count(),
                "output_pairs": n_out,
                "wall_sec": round(wall, 2)}
        tiers[sc] = row

    lo, hi = min(SCALES), max(SCALES)

    def _exp(plan: str, metric: str) -> float:
        return round(
            math.log(tiers[hi][plan][metric]
                     / max(tiers[lo][plan][metric], 1))
            / math.log(hi / lo), 2)

    exponents = {
        plan: {
            "wall_vs_scale": _exp(plan, "wall_sec"),
            "candidates_vs_scale": _exp(plan, "candidate_pairs"),
            "wall_vs_candidates": round(
                math.log(tiers[hi][plan]["wall_sec"]
                         / tiers[lo][plan]["wall_sec"])
                / math.log(tiers[hi][plan]["candidate_pairs"]
                           / max(tiers[lo][plan]["candidate_pairs"],
                                 1)), 2),
        } for plan in ("lsh", "ivf")}

    # --- planted-truth recall at the largest tier ----------------------
    # ground truth: planted within-cluster pairs (copy c gets
    # vec_id = base + c*max_vec) whose EXACT cosine >= threshold
    emb = _emb(hi)
    n_vec_hi = tiers[hi]["n_vectors"]
    base_dir = _scaled_dir(spark, sf_dir=SF_DIR, scale=1)
    max_vec = (spark.read.parquet(
        os.path.join(base_dir, "embeddings.parquet"))
        .agg(F.max("vec_id")).collect()[0][0]) + 1
    m = emb.select("vec_id",
                   F.pmod("vec_id", F.lit(max_vec)).alias("cluster"))
    a = m.select(F.col("vec_id").alias("vec_a"), "cluster")
    b = m.select(F.col("vec_id").alias("vec_b"), "cluster")
    vt = S.vectors_with_norm(emb)
    cluster_cos = (a.join(b, "cluster")
                   .where(F.col("vec_a") < F.col("vec_b"))
                   .join(vt.select(F.col("vec_id").alias("vec_a"),
                                   F.col("vec").alias("va"),
                                   F.col("nrm").alias("na")), "vec_a")
                   .join(vt.select(F.col("vec_id").alias("vec_b"),
                                   F.col("vec").alias("vb"),
                                   F.col("nrm").alias("nb")), "vec_b")
                   .select("vec_a", "vec_b",
                           quant4(array_dot(F.col("va"), F.col("vb"))
                                  / (F.col("na") * F.col("nb")))
                           .alias("cos")))
    cluster_cos.cache()
    cluster_cos.count()

    def _recall(found, tau: float):
        truth = cluster_cos.where(F.col("cos") >= tau) \
            .select("vec_a", "vec_b")
        n_truth = truth.count()
        n_hit = found.join(truth, ["vec_a", "vec_b"]).count()
        return n_truth, round(n_hit / max(n_truth, 1), 4)

    recall = {}
    for tau in (THRESHOLD, 0.9):
        found = (embedding_neardup_pairs(
            emb, tau, n_cells=_n_cells(n_vec_hi))
            .select("vec_a", "vec_b"))
        n_truth, rec = _recall(found, tau)
        recall[f"tau{tau}"] = {"planted_true_pairs": n_truth,
                               "ivf_planted_recall": rec}

    # --- bucket_cap dial (LAST-RESORT fuse, not the plan) --------------
    dial = {}
    for cap in CAPS:
        label = "uncapped" if cap is None else f"cap{cap}"
        _force(embedding_neardup_pairs(emb, THRESHOLD,
                                       bucket_cap=cap))  # warm
        t0 = time.time()
        found = (embedding_neardup_pairs(emb, THRESHOLD, bucket_cap=cap)
                 .select("vec_a", "vec_b"))
        _, rec = _recall(found, THRESHOLD)
        wall = time.time() - t0
        dial[label] = {"wall_sec": round(wall, 2),
                       "planted_recall": rec}
    cluster_cos.unpersist()

    result = {"metric": "emb_cosine_scale_curve",
              "threshold": THRESHOLD,
              "cell_target": CELL_TARGET,
              "tiers": {str(k): v for k, v in tiers.items()},
              "exponents": exponents,
              "recall_tier": hi,
              "ivf_recall": recall,
              "cap_dial_tier": hi,
              "cap_dial_note": "bucket_cap is the viral-bucket fuse, "
                               "not the scaling plan (use n_cells)",
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
