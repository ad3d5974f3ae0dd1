"""Snapshot table layer (sources/snaptable.py): commit atomicity,
time travel, incremental reads, manifest file-skipping, compaction,
snapshot expiry."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_pytorch_spark.sources import snaptable


@pytest.fixture()
def docs(spark):
    return (spark.range(0, 300)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") * 7 % 100).alias("n_chars")))


def test_append_read_time_travel(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    assert t.current_version() == 0 and t.read().count() == 0
    v1 = t.append(docs.where("doc_id < 100"))
    v2 = t.append(docs.where("doc_id >= 100 AND doc_id < 300"))
    assert (v1, v2) == (1, 2)
    assert t.read(1).count() == 100
    assert t.read(2).count() == 300
    assert t.read().agg(F.min("doc_id"), F.max("doc_id")) \
            .collect()[0][0:2] == (0, 299)


def test_incremental_read(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs.where("doc_id < 100"))
    t.append(docs.where("doc_id >= 100 AND doc_id < 250"))
    t.append(docs.where("doc_id >= 250"))
    inc = t.incremental(1, 3)
    assert inc.count() == 200
    assert inc.agg(F.min("doc_id")).collect()[0][0] == 100
    # full-window incremental == everything
    assert t.incremental(0).count() == 300


def test_compaction_preserves_time_travel(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    for lo in range(0, 300, 50):
        t.append(docs.where(f"doc_id >= {lo} AND doc_id < {lo + 50}")
                 .coalesce(1))
    n_files_before = len(t.snapshot()["manifest"])
    assert n_files_before == 6
    v = t.compact(target_file_rows=1000)
    assert len(t.snapshot(v)["manifest"]) == 1
    # same rows pre/post compaction, and the old snapshot still reads
    assert t.read(v).count() == 300
    assert t.read(6).count() == 300
    assert sorted(r["doc_id"] for r in t.read(v).collect()) == \
        sorted(r["doc_id"] for r in t.read(6).collect())
    # incremental across a compaction is refused, not silently wrong
    with pytest.raises(ValueError):
        t.incremental(2, v)


def test_scan_range_skips_files(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    for lo in range(0, 300, 50):
        t.append(docs.where(f"doc_id >= {lo} AND doc_id < {lo + 50}")
                 .coalesce(1))
    df, pruning = t.scan_range("doc_id", 120, 130)
    assert pruning == {"files_total": 6, "files_read": 1}
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(120, 131))
    # range straddling two files
    df2, p2 = t.scan_range("doc_id", 95, 105)
    assert p2["files_read"] == 2 and df2.count() == 11


def test_crash_orphan_snapshot_invisible(spark, docs, tmp_path):
    """A crash after staging the snapshot json but before the pointer
    swap leaves an orphan readers never see; the next commit
    overwrites it."""
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs.where("doc_id < 100"))
    orphan = {"version": 2, "parent": 1, "operation": "append",
              "schema": t.snapshot()["schema"],
              "manifest": [{"path": "/nonexistent", "n_rows": 9,
                            "bounds": {}}]}
    with open(t._snap_path(2), "w") as f:
        json.dump(orphan, f)
    assert t.current_version() == 1
    assert t.read().count() == 100
    v = t.append(docs.where("doc_id >= 100 AND doc_id < 120"))
    assert v == 2 and t.read().count() == 120
    assert "/nonexistent" not in [e["path"] for e in
                                  t.snapshot(2)["manifest"]]


def test_schema_mismatch_rejected(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs)
    with pytest.raises(ValueError):
        t.append(docs.withColumn("extra", F.lit(1)))


def test_expire_snapshots(spark, docs, tmp_path):
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs.where("doc_id < 100").coalesce(1))
    t.append(docs.where("doc_id >= 100").coalesce(1))
    old_files = [e["path"] for e in t.snapshot(1)["manifest"]]
    t.compact(target_file_rows=1000)            # v3 rewrites everything
    removed = t.expire_snapshots(keep_last=1)
    assert removed == 2  # both pre-compaction files deleted
    assert all(not os.path.exists(p) for p in old_files)
    assert t.read().count() == 300              # current still reads
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)
