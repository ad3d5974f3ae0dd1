"""Headline benchmark for the driver: runs the engine's flagship queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "ocr_docs_per_sec": ...}

Each query is forced end-to-end with a noop-format write (no driver
collect, no column pruning shortcuts).
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

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OCR_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_OCR_DOCS", "512"))
OCR_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_OCR_IMAGES", "256"))
# fixture multiplier for documents/embeddings (VERDICT r3 task 5: grow
# the tier until the top queries run long enough that host noise can't
# masquerade as a plan regression).  Copies carry near-duplicate (not
# identical) content so dedup/LSH neighbor structure grows ~linearly.
SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "2"))

HEADLINE = [
    "tpch_q1", "tpch_q6", "broadcast_dim_join", "tpch_q3_topk",
    "range_self_join", "window_reading_order", "sessionize",
    "group_linefit_regr", "explode_reassemble",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_topk_cosine", "sim_lsh_topk",
    "text_quality", "text_fingerprint", "multimodal_features",
    "html_main_block", "pdf_text_extract",
    "dedup_lines", "pii_redact", "tfidf_topk",
    "png_ocr_extract",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark

    spark = get_spark(app="ocr_pytorch_spark-bench", cpus=CPUS)
    qs = E.queries()
    timings: dict[str, float] = {}

    # warm the JVM, python workers, and per-worker weight caches once
    # (excluded from timings — steady-state numbers)
    _force(qs["filter_threshold"](spark, SF_DIR))
    _force(qs["ocr_extract"](spark, "/root/testdata/sf0.001"))

    # min of 2 reps per query: this host carries intermittent external
    # load (harness workers at 100-200% CPU) and +-25% thermal noise —
    # a single pass can read 3x slow through no fault of the plan
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name in HEADLINE:
        best = None
        for _ in range(reps):
            t0 = time.time()
            _force(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # flagship OCR extraction: docs/sec over a bench-scale interleaved set
    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.models import weights as W
    from ocr_pytorch_spark.operators.extract import (extract,
                                                     file_weights_spec)
    from pyspark.sql import functions as F

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .where(F.col("doc_id") < OCR_DOCS))
    ref = F.concat(F.lit("img-bench-"),
                   F.lpad((F.col("doc_id") % OCR_IMAGES).cast("string"),
                          5, "0"))
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"),
                     F.col("text").alias("text"),
                     F.lit(None).cast("string").alias("media_ref"),
                     F.lit(0).cast("int").alias("offset")),
            F.struct(F.lit("media").alias("kind"),
                     F.lit(None).cast("string").alias("text"),
                     ref.alias("media_ref"),
                     F.lit(1).cast("int").alias("offset")),
        ).alias("spans"))
    img_rows = datagen.gen_images(
        [f"img-bench-{i:05d}" for i in range(OCR_IMAGES)])
    imgs = spark.createDataFrame(
        [(r["media_ref"], r["height"], r["width"], r["channels"],
          bytearray(r["data"])) for r in img_rows],
        "media_ref string, height int, width int, channels int, "
        "data binary")
    W.load_bundled()  # ensure weights/*.npz exist
    n_docs = inter.count()
    ocr_sec = None
    for _ in range(reps):
        t0 = time.time()
        _force(extract(inter, imgs, file_weights_spec(),
                       PipelineConfig.fixture()))
        dt = time.time() - t0
        ocr_sec = dt if ocr_sec is None else min(ocr_sec, dt)
    timings["ocr_extract"] = round(ocr_sec, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "ocr_docs_per_sec": round(n_docs / ocr_sec, 2),
        "ocr_docs": n_docs,
        "ocr_distinct_images": OCR_IMAGES,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
