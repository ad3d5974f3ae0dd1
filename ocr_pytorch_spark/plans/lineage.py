"""Per-partition checkpointed lineage + metrics for idempotent resume.

North-star requirement (BASELINE.json): "per-partition checkpointed
lineage + metrics tables so any failed partition resumes idempotently."

Layout under the destination root:

    <dst>/data/bucket=<k>/...   extracted spans, hash-bucketed by doc_id
    <dst>/_lineage/...          one row per (bucket, attempt) commit
    <dst>/_metrics/...          per-bucket row/span counts per attempt

Protocol (SURVEY.md §4.3):
* ``bucket = pmod(xxhash64(doc_id), B)`` — deterministic, so a doc
  always lands in the same bucket across attempts.
* A bucket is COMMITTED iff a lineage row with status='ok' exists.
* The data write uses dynamic partition overwrite (Iceberg
  overwritePartitions / Parquet partitionOverwriteMode=dynamic), so
  re-running a bucket atomically replaces any partial files from a
  crashed attempt; lineage rows are appended only after the data write
  returns, making commit the last step.
* Resume = anti-join pending buckets against committed lineage and
  process only those.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark.operators.extract import (extract,
                                                 file_weights_spec,
                                                 ocr_timing_accumulator)

LINEAGE_SCHEMA = ("bucket int, doc_id_min string, doc_id_max string, "
                  "n_docs long, status string, attempt int, wall_ms long")
METRICS_SCHEMA = ("stage string, bucket int, n_rows long, n_spans long, "
                  "attempt int, wall_ms long")


def _read_optional(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # Probe by attempting the read, not os.path.exists: dst may live on
    # HDFS/S3 where a driver-local stat is always false and would make
    # resume silently reprocess everything.
    try:
        df = spark.read.schema(schema).parquet(path)
        df.head(1)
        return df
    except Exception:
        return spark.createDataFrame([], schema)


def committed_buckets(spark: SparkSession, dst: str) -> set[int]:
    lin = _read_optional(spark, os.path.join(dst, "_lineage"),
                         LINEAGE_SCHEMA)
    return {r["bucket"] for r in
            lin.where(F.col("status") == "ok").select("bucket")
            .distinct().collect()}


def run_bucketed_write(spark: SparkSession, out: DataFrame, dst: str,
                       buckets: int = 32, resume: bool = True,
                       stage: str = "corpus",
                       data_subdir: str = "data",
                       key: str = "doc_id",
                       payload_col: str | None = None) -> dict:
    """Generic bucketed lineage commit for corpus jobs whose output is
    a deterministic function of the FULL input (web_corpus's
    line-dedup/decontam are corpus-global, so unlike the OCR job the
    compute cannot be pruned to pending buckets — but the WRITE can):
    assign ``bucket = pmod(xxhash64(key), B)``, skip committed
    buckets, dynamic-partition-overwrite the pending ones, and append
    lineage + metrics rows only after the data write returns.  A
    killed run resumes by rewriting only uncommitted buckets; since
    the upstream plan is deterministic, re-derived bucket contents are
    identical, so the resume is idempotent.  ``payload_col``: a column
    whose total length lands in the metrics n_spans slot (e.g. text
    chars kept)."""
    t0 = time.time()
    done = committed_buckets(spark, dst) if resume else set()
    out_b = out.withColumn(
        "bucket", F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int"))
    if done:
        out_b = out_b.where(~F.col("bucket").isin(*done))
    if len(done) >= buckets:
        return {"buckets_total": buckets, "buckets_skipped": len(done),
                "docs_processed": 0, "wall_ms": 0}
    data_dir = os.path.join(dst, data_subdir)
    from ocr_pytorch_spark.sources.tables import (read_partitioned,
                                                  write_partitioned)
    write_partitioned(out_b, data_dir, ["bucket"])

    # commit: lineage + metrics appended only after the data write
    wall_ms = int((time.time() - t0) * 1000)
    prev = _read_optional(spark, os.path.join(dst, "_lineage"),
                          LINEAGE_SCHEMA)
    prev_attempt = {r["bucket"]: r["max_a"] for r in
                    prev.groupBy("bucket")
                    .agg(F.max("attempt").alias("max_a")).collect()}
    size_agg = (F.sum(F.length(payload_col)) if payload_col
                else F.lit(0)).alias("n_spans")
    try:
        readback = read_partitioned(spark, data_dir)
    except Exception:
        # A fully-filtered corpus writes ZERO parquet files, so the
        # readback has no schema to infer (UNABLE_TO_INFER_SCHEMA).
        # Fall back to an empty frame with the writer's schema so the
        # commit-empty-buckets path below still appends zero-doc
        # lineage/metrics rows — otherwise resume recomputes and
        # crashes forever (r7 ADVICE medium).
        readback = spark.createDataFrame([], out_b.schema)
    stats = {int(r["bucket"]): r for r in (
        readback
        .where(~F.col("bucket").isin(*done) if done else F.lit(True))
        .groupBy("bucket")
        .agg(F.min(key).alias("doc_id_min"),
             F.max(key).alias("doc_id_max"),
             F.count("*").alias("n_docs"), size_agg)
        .collect())}
    # commit EVERY pending bucket, including ones the gates emptied —
    # otherwise an all-filtered bucket would be recomputed on every
    # resume forever
    pending = sorted(set(range(buckets)) - done)
    lineage_rows = [
        (b,
         str(stats[b]["doc_id_min"]) if b in stats else "",
         str(stats[b]["doc_id_max"]) if b in stats else "",
         int(stats[b]["n_docs"]) if b in stats else 0, "ok",
         int(prev_attempt.get(b, 0)) + 1, wall_ms)
        for b in pending]
    metrics_rows = [
        (stage, b,
         int(stats[b]["n_docs"]) if b in stats else 0,
         int(stats[b]["n_spans"] or 0) if b in stats else 0,
         int(prev_attempt.get(b, 0)) + 1, wall_ms)
        for b in pending]
    spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(os.path.join(dst, "_lineage"))
    spark.createDataFrame(metrics_rows, METRICS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(os.path.join(dst, "_metrics"))
    return {"buckets_total": buckets, "buckets_skipped": len(done),
            "docs_processed": int(sum(r["n_docs"]
                                      for r in stats.values())),
            "wall_ms": wall_ms}


def run_extract_job(spark: SparkSession, documents: DataFrame,
                    images: DataFrame, dst: str,
                    cfg: PipelineConfig | None = None,
                    buckets: int = 32, resume: bool = True,
                    weights_spec: dict | None = None,
                    data_table: str | None = None) -> dict:
    """Run the extraction into <dst> with bucketed lineage; returns a
    summary dict.  Safe to re-run after any failure: committed buckets
    are skipped, uncommitted ones are atomically overwritten.

    ``data_table``: optional catalog identifier (e.g.
    ``local.db.spans``) — with an Iceberg runtime on the classpath the
    span data then lands in a native Iceberg table via the pluggable
    writer (sources/tables.write_partitioned) instead of
    ``<dst>/data`` Parquet; lineage/metrics stay at ``<dst>``
    (tests/test_iceberg_native.py)."""
    cfg = cfg or PipelineConfig.fixture()
    t0 = time.time()
    done = committed_buckets(spark, dst) if resume else set()
    docs_b = documents.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int"))
    if done:
        docs_b = docs_b.where(~F.col("bucket").isin(*done))
    pending_docs = docs_b.persist()
    n_pending = pending_docs.count()
    if n_pending == 0:
        pending_docs.unpersist()
        return {"buckets_total": buckets, "buckets_skipped": len(done),
                "docs_processed": 0, "wall_ms": 0}

    # per-partition OCR walls flow back through an accumulator and
    # land in _metrics as stage='ocr_partition' rows — the straggler
    # observability the bucket-level rows can't give (all buckets
    # commit from ONE job, so their wall_ms is the job wall)
    timing_acc = ocr_timing_accumulator(spark)
    out = extract(pending_docs.drop("bucket"), images,
                  weights_spec or file_weights_spec(), cfg,
                  timing_acc=timing_acc)
    out_b = out.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int"))
    data_dir = data_table or os.path.join(dst, "data")
    # the pluggable writer pins dynamic partition overwrite (Parquet)
    # or uses overwritePartitions (Iceberg): under a harness-owned
    # session left at Spark's default ("static"), a resume would
    # otherwise truncate data/ wholesale and delete committed buckets
    # that _lineage still marks ok.
    from ocr_pytorch_spark.sources.tables import (read_partitioned,
                                                  write_partitioned)
    write_partitioned(out_b, data_dir, ["bucket"])

    # commit: lineage + metrics appended only after the data write
    wall_ms = int((time.time() - t0) * 1000)
    prev = _read_optional(spark, os.path.join(dst, "_lineage"),
                          LINEAGE_SCHEMA)
    prev_attempt = {r["bucket"]: r["max_a"] for r in
                    prev.groupBy("bucket")
                    .agg(F.max("attempt").alias("max_a")).collect()}
    stats = (
        read_partitioned(spark, data_dir)
        .where(~F.col("bucket").isin(*done) if done else F.lit(True))
        .groupBy("bucket")
        .agg(F.min("doc_id").alias("doc_id_min"),
             F.max("doc_id").alias("doc_id_max"),
             F.count("*").alias("n_docs"),
             F.sum(F.size("spans")).alias("n_spans"))
        .collect())
    lineage_rows = [(int(r["bucket"]), r["doc_id_min"], r["doc_id_max"],
                     int(r["n_docs"]), "ok",
                     int(prev_attempt.get(r["bucket"], 0)) + 1, wall_ms)
                    for r in stats]
    metrics_rows = [("extract", int(r["bucket"]), int(r["n_docs"]),
                     int(r["n_spans"]),
                     int(prev_attempt.get(r["bucket"], 0)) + 1, wall_ms)
                    for r in stats]
    attempt_no = max([a for a in prev_attempt.values()] or [0]) + 1
    metrics_rows += [("ocr_partition", int(pid), int(n_imgs), 0,
                      attempt_no, int(w_ms))
                     for pid, n_imgs, w_ms in timing_acc.value]
    spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(os.path.join(dst, "_lineage"))
    spark.createDataFrame(metrics_rows, METRICS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(os.path.join(dst, "_metrics"))
    pending_docs.unpersist()
    return {"buckets_total": buckets, "buckets_skipped": len(done),
            "docs_processed": n_pending, "wall_ms": wall_ms}
