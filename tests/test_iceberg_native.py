"""The pluggable Iceberg writer (SURVEY §7.2, VERDICT r3 task 7).

Two layers:

* Dispatch tests run EVERYWHERE: write_partitioned must route catalog
  identifiers to the DataFrameWriterV2 create/overwritePartitions/
  append surface when the runtime is present (stubbed here), and fall
  back to dynamic-overwrite Parquet otherwise.
* The end-to-end test runs ONLY where an Iceberg runtime jar exists
  (skipped-not-silent in this sandbox): a subprocess builds a session
  with a hadoop catalog, runs run_extract_job(data_table=...), and
  checks the SnapTable invariants — time travel to the first snapshot
  and an incremental snapshot-range read — against the real catalog.
"""

import glob
import os
import subprocess
import sys

import pytest

from ocr_pytorch_spark.sources import tables as T

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark
    pats = [os.path.join(os.path.dirname(pyspark.__file__), "jars",
                         "*iceberg-spark-runtime*.jar")]
    home = os.environ.get("SPARK_HOME")
    if home:
        pats.append(os.path.join(home, "jars",
                                 "*iceberg-spark-runtime*.jar"))
    for p in pats:
        hits = glob.glob(p)
        if hits:
            return hits[0]
    return None


_JAR = _find_iceberg_jar()


def test_is_table_ident():
    assert T.is_table_ident("local.db.spans")
    assert not T.is_table_ident("/tmp/out.a.b")
    assert not T.is_table_ident("dst/data")
    assert not T.is_table_ident("plain")


class _RecordingWriter:
    def __init__(self, log):
        self.log = log

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", len(cols)))
        return self

    def create(self):
        self.log.append(("create",))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions",))

    def append(self):
        self.log.append(("append",))


class _FakeCatalog:
    def __init__(self, exists):
        self._exists = exists

    def tableExists(self, name):
        return self._exists


class _FakeSession:
    def __init__(self, exists):
        self.catalog = _FakeCatalog(exists)


class _FakeDF:
    def __init__(self, exists, log):
        self.sparkSession = _FakeSession(exists)
        self.log = log

    def writeTo(self, dst):
        self.log.append(("writeTo", dst))
        return _RecordingWriter(self.log)


@pytest.mark.parametrize("exists,mode,expect", [
    (False, "overwrite", ("partitionedBy", "create")),
    (True, "overwrite", ("overwritePartitions",)),
    (True, "append", ("append",)),
])
def test_write_partitioned_iceberg_dispatch(spark, monkeypatch, exists,
                                            mode, expect):
    # `spark` unused directly, but F.col() needs an active context
    monkeypatch.setattr(T, "iceberg_available", lambda spark: True)
    log = []
    df = _FakeDF(exists, log)
    T.write_partitioned(df, "local.db.spans", ["bucket"], mode=mode)
    ops = [e[0] for e in log]
    assert ops[:2] == ["writeTo", "using"]
    for op in expect:
        assert op in ops, (ops, expect)
    # never both create and a write-mode op
    assert not ({"create"} <= set(ops)
                and {"overwritePartitions", "append"} & set(ops))


def test_write_partitioned_parquet_fallback(spark, tmp_path):
    df = spark.range(0, 20).selectExpr("id", "id % 4 AS bucket")
    dst = str(tmp_path / "t")
    T.write_partitioned(df, dst, ["bucket"])
    back = T.read_partitioned(spark, dst)
    assert back.count() == 20
    # dynamic overwrite: rewriting bucket 0 must not truncate 1-3
    T.write_partitioned(
        spark.range(100, 105).selectExpr("id", "0 AS bucket"),
        dst, ["bucket"])
    back = T.read_partitioned(spark, dst)
    assert back.where("bucket != 0").count() == 15
    assert back.where("bucket = 0").count() == 5


_CHILD = """
import os, sys
import ocr_pytorch_spark  # BLAS env before numpy (PYTHONPATH set by parent)
from pyspark.sql import SparkSession, functions as F
warehouse, jar, jobdir = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
from ocr_pytorch_spark.sources import tables as T
assert T.iceberg_available(spark)
tbl = "local.db.spans_it"
df1 = spark.range(0, 10).selectExpr("id", "id % 2 AS bucket")
T.write_partitioned(df1, tbl, ["bucket"])          # create
snap_sql = ("SELECT snapshot_id FROM " + tbl
            + ".snapshots ORDER BY committed_at")
s1 = spark.sql(snap_sql).collect()[0][0]
df2 = spark.range(10, 25).selectExpr("id", "id % 2 AS bucket")
T.write_partitioned(df2, tbl, ["bucket"], mode="append")
snaps = [r[0] for r in spark.sql(snap_sql).collect()]
assert len(snaps) >= 2
# time travel: the first snapshot still reads the original 10 rows
tt = spark.read.option("snapshot-id", s1).format("iceberg").load(tbl)
assert tt.count() == 10, tt.count()
assert spark.read.table(tbl).count() == 25
# incremental read: only the rows appended between the snapshots
inc = (spark.read.format("iceberg")
       .option("start-snapshot-id", snaps[0])
       .option("end-snapshot-id", snaps[-1]).load(tbl))
assert inc.count() == 15, inc.count()
# the extraction job itself lands spans in the catalog table
from ocr_pytorch_spark.plans.lineage import run_extract_job
from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.models import weights as W
W.load_bundled()
docs = datagen.gen_documents(8)
ddf = spark.createDataFrame(
    [(d["doc_id"], d["spans"]) for d in docs],
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>")
imgs = datagen.gen_images(datagen.media_refs_of(docs))
idf = spark.createDataFrame(
    [(r["media_ref"], r["height"], r["width"], r["channels"],
      bytearray(r["data"])) for r in imgs],
    "media_ref string, height int, width int, channels int, "
    "data binary")
out_tbl = "local.db.extract_spans"
summary = run_extract_job(spark, ddf, idf, jobdir,
                          PipelineConfig.fixture(), buckets=4,
                          data_table=out_tbl)
assert spark.read.table(out_tbl).count() > 0
print("ICEBERG_NATIVE_OK")
spark.stop()
"""


@pytest.mark.skipif(_JAR is None, reason=(
    "no Iceberg runtime jar on this host — the native-catalog branch "
    "is exercised only where the jar exists (dispatch logic is tested "
    "above regardless)"))
def test_iceberg_native_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", _CHILD,
         str(tmp_path / "wh"), _JAR, str(tmp_path / "job")],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ICEBERG_NATIVE_OK" in r.stdout
