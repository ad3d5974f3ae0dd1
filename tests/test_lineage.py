"""Layer-4 test (SURVEY.md §5.2): kill/resume idempotence — a partially
committed job, resumed, must converge to the same table as a clean run,
with no duplicate lineage commits."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.plans import lineage as L

N_DOCS = 12
BUCKETS = 8


@pytest.fixture(scope="module")
def fixture_tables(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("linfix")
    doc_path, img_path = datagen.write_fixture(str(out), N_DOCS)
    return spark.read.parquet(doc_path), spark.read.parquet(img_path)


def _table_rows(spark, dst):
    df = spark.read.parquet(os.path.join(dst, "data"))
    return sorted(
        (r["doc_id"],
         tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]))
        for r in df.select("doc_id", "spans").collect())


def test_resume_converges_to_clean_run(spark, fixture_tables,
                                       bundled_weights, fixture_cfg,
                                       tmp_path_factory):
    docs_df, imgs_df = fixture_tables
    ctpn_w, crnn_w = bundled_weights

    # clean one-shot run
    dst_clean = str(tmp_path_factory.mktemp("clean"))
    s1 = L.run_extract_job(spark, docs_df, imgs_df, dst_clean,
                           fixture_cfg, buckets=BUCKETS)
    assert s1["docs_processed"] == N_DOCS
    clean_rows = _table_rows(spark, dst_clean)

    # crashed run: only docs of half the buckets got processed+committed
    dst = str(tmp_path_factory.mktemp("crashed"))
    docs_b = docs_df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(BUCKETS)).cast("int"))
    half = docs_b.where(F.col("bucket") < BUCKETS // 2).drop("bucket")
    L.run_extract_job(spark, half, imgs_df, dst, fixture_cfg,
                      buckets=BUCKETS)
    committed = L.committed_buckets(spark, dst)
    assert committed and all(b < BUCKETS // 2 for b in committed)

    # simulate partial uncommitted files from the crash: garbage parquet
    # in an uncommitted bucket partition
    victim = BUCKETS // 2
    garbage_dir = os.path.join(dst, "data", f"bucket={victim}")
    os.makedirs(garbage_dir, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": ["GARBAGE"], "spans": pa.array(
            [[]], pa.list_(pa.struct([
                ("kind", pa.string()), ("text", pa.string()),
                ("media_ref", pa.string()), ("offset", pa.int32())])))}),
        os.path.join(garbage_dir, "part-garbage.parquet"))

    # resume with the full input
    s2 = L.run_extract_job(spark, docs_df, imgs_df, dst, fixture_cfg,
                           buckets=BUCKETS)
    assert s2["buckets_skipped"] == len(committed)

    rows = _table_rows(spark, dst)
    assert rows == clean_rows  # identical final table, garbage gone
    assert all(r[0] != "GARBAGE" for r in rows)

    # no duplicate ok-commits per bucket
    lin = spark.read.parquet(os.path.join(dst, "_lineage"))
    dup = (lin.where(F.col("status") == "ok")
           .groupBy("bucket", "attempt").count()
           .where(F.col("count") > 1).count())
    assert dup == 0

    # second resume is a no-op
    s3 = L.run_extract_job(spark, docs_df, imgs_df, dst, fixture_cfg,
                           buckets=BUCKETS)
    assert s3["docs_processed"] == 0


def test_metrics_table_written(spark, fixture_tables, bundled_weights,
                               fixture_cfg, tmp_path_factory):
    docs_df, imgs_df = fixture_tables
    ctpn_w, crnn_w = bundled_weights
    dst = str(tmp_path_factory.mktemp("metrics"))
    L.run_extract_job(spark, docs_df, imgs_df, dst, fixture_cfg,
                      buckets=4)
    m = spark.read.parquet(os.path.join(dst, "_metrics"))
    rows = m.collect()
    stages = {r["stage"] for r in rows}
    assert stages == {"extract", "ocr_partition"}
    assert sum(r["n_rows"] for r in rows
               if r["stage"] == "extract") == N_DOCS
    # per-partition OCR walls (straggler observability): one row per
    # OCR task, image counts summing to the distinct refs OCR'd
    tim = [r for r in rows if r["stage"] == "ocr_partition"]
    assert tim and all(r["wall_ms"] >= 0 for r in tim)
    n_distinct_refs = (docs_df.selectExpr("explode(spans) s")
                       .where("s.kind = 'media'")
                       .select("s.media_ref").distinct().count())
    assert sum(r["n_rows"] for r in tim) == n_distinct_refs


def test_resume_preserves_committed_under_static_overwrite(
        spark, fixture_tables, bundled_weights, fixture_cfg,
        tmp_path_factory):
    """ADVICE r1: resume must not rely on the session-level
    partitionOverwriteMode — under Spark's default 'static' a resume
    would truncate data/ and silently delete committed buckets."""
    docs_df, imgs_df = fixture_tables
    dst = str(tmp_path_factory.mktemp("staticmode"))

    docs_b = docs_df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(BUCKETS)).cast("int"))
    half = docs_b.where(F.col("bucket") < BUCKETS // 2).drop("bucket")

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        L.run_extract_job(spark, half, imgs_df, dst, fixture_cfg,
                          buckets=BUCKETS)
        committed = L.committed_buckets(spark, dst)
        assert committed
        before = {r[0] for r in _table_rows(spark, dst)}

        L.run_extract_job(spark, docs_df, imgs_df, dst, fixture_cfg,
                          buckets=BUCKETS)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = {r[0] for r in _table_rows(spark, dst)}
    # every committed doc survived the resume, full input now present
    assert before <= after
    assert len(after) == N_DOCS


def test_bucketed_write_empty_output_commits(spark, tmp_path_factory):
    """ADVICE r7 (medium): a fully-filtered corpus (zero output rows)
    must still commit every pending bucket — previously the stats
    readback threw UNABLE_TO_INFER_SCHEMA (no parquet files written)
    and resume recomputed-and-crashed forever."""
    dst = str(tmp_path_factory.mktemp("emptyout"))
    empty = spark.createDataFrame([], "doc_id string, text string")

    stats = L.run_bucketed_write(spark, empty, dst, buckets=4,
                                 stage="clean_corpus",
                                 payload_col="text")
    assert stats["docs_processed"] == 0
    assert stats["buckets_skipped"] == 0
    # all 4 zero-doc buckets committed -> lineage rows exist
    assert L.committed_buckets(spark, dst) == {0, 1, 2, 3}

    # resume short-circuits instead of recomputing (and crashing)
    stats2 = L.run_bucketed_write(spark, empty, dst, buckets=4,
                                  stage="clean_corpus",
                                  payload_col="text")
    assert stats2["buckets_skipped"] == 4
    assert stats2["docs_processed"] == 0
