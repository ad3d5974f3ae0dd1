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


def test_merge_copy_on_write(spark, docs, tmp_path):
    """MERGE rewrites only the files whose key bounds overlap the
    incoming keys; untouched files carry into the new snapshot BY
    REFERENCE (same path), and time travel still sees pre-merge
    values."""
    t = snaptable.create(spark, str(tmp_path / "t"))
    for lo in range(0, 300, 100):
        t.append(docs.where(f"doc_id >= {lo} AND doc_id < {lo + 100}")
                 .coalesce(1))
    before = {e["path"] for e in t.snapshot()["manifest"]}
    # upsert: update docs 120-129 (new n_chars) + insert 1000-1004
    upd = (spark.range(120, 130).select(
               F.col("id").alias("doc_id"),
               F.lit(7777).cast("long").alias("n_chars"))
           .union(spark.range(1000, 1005).select(
               F.col("id").alias("doc_id"),
               F.lit(8888).cast("long").alias("n_chars"))))
    v = t.merge(upd, key="doc_id")
    after = {e["path"] for e in t.snapshot(v)["manifest"]}
    # files [0,99] and [200,299] carried by reference; [100,199] went
    assert len(before & after) >= 1
    kept_old = before & after
    for e in t.snapshot(1)["manifest"]:
        assert e["path"] in kept_old  # the untouched first file
    # merged values visible, old values replaced, inserts present
    cur = t.read(v)
    assert cur.count() == 305
    got = {r["doc_id"]: r["n_chars"]
           for r in cur.where("doc_id IN (120, 1000, 50)").collect()}
    assert got[120] == 7777 and got[1000] == 8888
    assert got[50] == 50 * 7 % 100
    # time travel: pre-merge snapshot unchanged
    old = t.read(3).where("doc_id = 120").collect()[0]["n_chars"]
    assert old == 120 * 7 % 100
    # incremental across a merge refuses
    with pytest.raises(ValueError):
        t.incremental(2, v)


def test_merge_all_rows_replaced_in_touched_file(spark, docs, tmp_path):
    """Upserting every key of a file leaves no survivors to rewrite —
    the empty-survivor write must not corrupt the manifest."""
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs.where("doc_id < 10").coalesce(1))
    t.append(docs.where("doc_id >= 200").coalesce(1))
    upd = (spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(1).cast("long").alias("n_chars")))
    v = t.merge(upd, key="doc_id")
    cur = t.read(v)
    assert cur.count() == 110
    assert cur.where("doc_id < 10").agg(
        F.sum("n_chars")).collect()[0][0] == 10


def test_cdc_across_merge(spark, docs, tmp_path):
    """cdc() captures an upsert as delete+insert and pure inserts as
    insert — across the merge boundary incremental() refuses."""
    t = snaptable.create(spark, str(tmp_path / "t"))
    t.append(docs.where("doc_id < 100").coalesce(1))
    upd = (spark.range(5, 8).select(
               F.col("id").alias("doc_id"),
               F.lit(9999).cast("long").alias("n_chars"))
           .union(spark.range(500, 502).select(
               F.col("id").alias("doc_id"),
               F.lit(1111).cast("long").alias("n_chars"))))
    v = t.merge(upd, key="doc_id")
    changes = t.cdc(1, v).collect()
    ins = {(r["doc_id"], r["n_chars"]) for r in changes
           if r["_change"] == "insert"}
    dels = {(r["doc_id"], r["n_chars"]) for r in changes
            if r["_change"] == "delete"}
    assert ins == {(5, 9999), (6, 9999), (7, 9999),
                   (500, 1111), (501, 1111)}
    assert dels == {(d, d * 7 % 100) for d in (5, 6, 7)}
