"""spark-submit entry point for the training-corpus cleaning pipeline:
the operators a 100 TB pretraining dataset build actually chains.

    spark-submit --py-files ocr_pytorch_spark.zip jobs/clean_corpus.py \\
        --documents <dir-with-documents.parquet> --dst <out root> \\
        [--min-quality 0.5] [--lang en] [--sample 1.0] \\
        [--bucket-cap 1000]

Stages (all lazy until the single write):
  1. transitive near-dup components (MinHash-LSH bands, bucket-capped)
  2. keeper per component = highest-quality member
  3. language + quality gate (corpus_filter semantics)
  4. optional deterministic md5-prefix sampling
  5. cleaned corpus written partitioned by xxhash64 doc bucket,
     with a _stats summary table (rows in/out per stage)

Every stage is a documented query-surface operator with a DuckDB
oracle (dedup_components / dedup_keeper_policy / corpus_filter /
sample_documents), so this job is a composition of hash-verified
parts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--sample", type=float, default=1.0,
                    help="deterministic keep fraction (md5-prefix)")
    ap.add_argument("--bucket-cap", type=int, default=1000)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators import dedup as D
    from ocr_pytorch_spark.operators import text as T
    from ocr_pytorch_spark.sources.session import get_spark
    from ocr_pytorch_spark.sources.tables import write_partitioned

    spark = get_spark(app="clean-corpus")
    docs = spark.read.parquet(
        os.path.join(args.documents, "documents.parquet")
        if os.path.isdir(args.documents) else args.documents)
    n_in = docs.count()

    comp = D.dup_components(docs, bucket_cap=args.bucket_cap)
    qual = T.quality_score(docs).select("doc_id", "quality")
    lang = T.lang_id(docs).select("doc_id", "lang_pred")

    from pyspark.sql import Window

    w = (Window.partitionBy("component")
         .orderBy(F.col("quality").desc(), "doc_id"))
    keepers = (comp.join(qual, "doc_id")
               .withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") == 1)
               .select("doc_id"))

    cleaned = (docs.join(keepers, "doc_id")
               .join(lang, "doc_id").join(qual, "doc_id")
               .where((F.col("lang_pred") == args.lang)
                      & (F.col("quality") >= args.min_quality)))
    n_dedup_filtered = cleaned.count()

    if args.sample < 1.0:
        cut = int(args.sample * 16 ** 8)
        from functools import reduce

        h = reduce(
            lambda acc, i: acc + (
                F.expr(f"instr('0123456789abcdef', substring("
                       f"md5(cast(doc_id as string)), {i + 1}, 1))")
                - 1).cast("long") * F.lit(16 ** (7 - i)).cast("long"),
            range(8), F.lit(0).cast("long"))
        cleaned = cleaned.where(h < cut)

    out = cleaned.select(
        "doc_id", "text", "quality", "lang_pred",
        F.pmod(F.xxhash64("doc_id"),
               F.lit(args.buckets)).cast("int").alias("bucket"))
    write_partitioned(out, os.path.join(args.dst, "data"), ["bucket"])
    n_out = spark.read.parquet(os.path.join(args.dst, "data")).count()

    stats = [("input", n_in), ("dedup+filter", n_dedup_filtered),
             ("written", n_out)]
    spark.createDataFrame(stats, "stage string, n long").coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(args.dst,
                                                      "_stats"))
    print(json.dumps({"stages": dict(stats)}))
    spark.stop()


if __name__ == "__main__":
    main()
