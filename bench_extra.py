"""Optimization-round helper bench (r9): times a SUBSET of the
headline queries with the exact bench.py methodology (same scaled
tier, same noop sink, one untimed warmup + min-of-N) so a single
query can be iterated on without paying the full ~5-minute run.

bench.py itself is FROZEN for driver measurement; this file is the
working-bench the round's before/after numbers in OPTIMIZATION_r09.md
cite for per-query isolation.

Usage: python bench_extra.py [query ...]      (default: the top-12)
       SPARK_GRAFT_BENCH_REPS=2 python bench_extra.py dsir_topk
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401

DEFAULT = [
    "dedup_embedding_cosine", "sim_pq_topk", "semdedup", "dsir_topk",
    "sim_lsh_topk", "lm_perplexity", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "gate_ablation", "corpus_overlap_minhash",
    "pdf_text_extract", "tfidf_topk",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    import bench as B
    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark

    names = sys.argv[1:] or DEFAULT
    print("gemm_pre:", B._gemm_anchor(), flush=True)
    spark = get_spark(app="ocr_pytorch_spark-bench-extra", cpus=B.CPUS)
    qs = E.queries()
    run_dir = B._scaled_dir(spark)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        thunk = lambda: _force(qs[name](spark, run_dir))  # noqa: E731
        thunk()  # untimed warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            thunk()
            ts.append(time.time() - t0)
        timings[name] = round(min(ts), 3)
        print(f"{name:28s} {min(ts):6.2f}  (max {max(ts):.2f})",
              flush=True)
    spark.stop()
    print("gemm_post:", B._gemm_anchor(), flush=True)
    print(json.dumps({"queries": timings, "reps": reps}))


if __name__ == "__main__":
    main()
