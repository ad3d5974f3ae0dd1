"""spark-submit entry point for the extraction job (north_star launch
shape):

    spark-submit --master <cluster> \\
        --py-files ocr_pytorch_spark.zip \\
        --files weights/ctpn.npz,weights/crnn.npz \\
        jobs/extract.py --documents <path-or-table> --images <path> \\
        --dst <output root> [--buckets 256] [--no-resume]

Weights resolve on executors via SparkFiles when the local path is
absent (see operators/extract._resolve_path); output is bucketed with
lineage/metrics so a failed run resumes idempotently.
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
    ap.add_argument("--images", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--detect-height", type=int, default=None)
    args = ap.parse_args()

    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.models import weights as W
    from ocr_pytorch_spark.plans.lineage import run_extract_job
    from ocr_pytorch_spark.sources.session import get_spark

    W.load_bundled()  # generate fixture weights if absent
    spark = get_spark(app="ocr-extract-job")
    cfg = (PipelineConfig(detect_height=args.detect_height)
           if args.detect_height else PipelineConfig.fixture())
    docs = spark.read.parquet(args.documents)
    imgs = spark.read.parquet(args.images)
    summary = run_extract_job(spark, docs, imgs, args.dst, cfg,
                              buckets=args.buckets,
                              resume=not args.no_resume)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
