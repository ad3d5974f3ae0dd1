"""Snapshot-versioned table layer: the Iceberg table model
(snapshots + manifests + per-file column stats) on plain Parquet.

The north rule targets Iceberg tables; the sandbox has no Iceberg
runtime jar (``tables.iceberg_available``), so this module implements
the table-format *semantics* the engine relies on, following the
public Apache Iceberg spec's concepts (snapshot list, manifest of
immutable data files with column bounds, atomic pointer commit):

    <root>/data/<uuid>/part-*.parquet    immutable data files
    <root>/metadata/snap-<v>.json        snapshot: schema + manifest
    <root>/metadata/_current             pointer file, content "<v>"

* **Commit protocol**: a snapshot json is staged then ``os.replace``d
  into place, and the ``_current`` pointer is ``os.replace``d last —
  both atomic on POSIX.  A crash between the two leaves an orphan
  snapshot json that readers never see (they follow the pointer) and
  the next commit safely overwrites.  Real deployments swap the
  pointer with a catalog CAS (what Iceberg's catalog does); the
  on-disk layout here is the single-writer + crash-safe subset.
* **Time travel**: ``read(version=v)`` loads exactly snapshot v's
  manifest.  Compaction rewrites files into a new snapshot but never
  deletes old files, so prior versions stay readable until
  ``expire_snapshots``.
* **Incremental read**: ``incremental(v0, v1)`` reads only data files
  added after v0 — append-diff CDC without replaying the table.
* **File skipping**: every manifest entry carries per-column
  [min, max] bounds (Iceberg gets these from Parquet footers; we
  aggregate them at write time), and ``scan_range`` prunes
  non-overlapping files BEFORE Spark ever lists them — at 10^12 rows
  this manifest-level pruning is what turns a point query over a
  sorted/bucketed table from a full scan into a handful of file
  reads.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def _schema_sig(schema_json: str) -> list[tuple]:
    """(name, type) pairs — schema compatibility ignores nullability
    and metadata (a parquet round trip flips nullable, and Iceberg
    permits nullable widening)."""
    return [(f["name"], json.dumps(f["type"], sort_keys=True))
            for f in json.loads(schema_json)["fields"]]


def _stats_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields
            if f.dataType.typeName() in
            ("long", "integer", "short", "byte", "double", "float",
             "string", "date", "timestamp")]


class SnapTable:
    """Handle to a snapshot-versioned table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta = os.path.join(root, "metadata")

    # --- metadata plumbing ---
    def _pointer(self) -> str:
        return os.path.join(self.meta, "_current")

    def current_version(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _snap_path(self, v: int) -> str:
        return os.path.join(self.meta, f"snap-{v}.json")

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "parent": None, "schema": None,
                    "manifest": []}
        with open(self._snap_path(v)) as f:
            return json.load(f)

    def _commit(self, snap: dict) -> int:
        """Stage-then-rename the snapshot json, then swap the pointer.
        Both renames are atomic; the pointer swap is the commit."""
        os.makedirs(self.meta, exist_ok=True)
        v = snap["version"]
        tmp = self._snap_path(v) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._snap_path(v))
        ptmp = self._pointer() + f".tmp-{uuid.uuid4().hex}"
        with open(ptmp, "w") as f:
            f.write(str(v))
        os.replace(ptmp, self._pointer())
        return v

    # --- writes ---
    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write df as an immutable file set and return manifest
        entries with row counts and per-column [min, max] bounds."""
        d = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("error").parquet(d)
        try:
            back = self.spark.read.parquet(d)
        except Exception:
            return []  # every partition empty: no part files written
        cols = _stats_cols(back)
        aggs = [F.count("*").alias("#n")]
        for c in cols:
            aggs += [F.min(c).alias(f"min#{c}"), F.max(c).alias(f"max#{c}")]
        rows = (back.groupBy(F.input_file_name().alias("#f"))
                .agg(*aggs).collect())

        def js(v):
            return v if isinstance(v, (int, float, str, type(None))) \
                else str(v)

        return [{"path": r["#f"].replace("file:", "", 1) or r["#f"],
                 "n_rows": int(r["#n"]),
                 "bounds": {c: [js(r[f"min#{c}"]), js(r[f"max#{c}"])]
                            for c in cols}}
                for r in rows]

    def append(self, df: DataFrame) -> int:
        """Commit a new snapshot = parent manifest + df's files."""
        cur = self.snapshot()
        if cur["schema"] is not None and \
                _schema_sig(cur["schema"]) != _schema_sig(df.schema.json()):
            raise ValueError("schema mismatch on append")
        entries = self._write_files(df)
        return self._commit({
            "version": cur["version"] + 1, "parent": cur["version"],
            "operation": "append", "schema": df.schema.json(),
            "manifest": cur["manifest"] + entries})

    def merge(self, df: DataFrame, key: str) -> int:
        """Copy-on-write MERGE (upsert on ``key``): data files whose
        [min, max] bounds on ``key`` overlap the incoming key range
        are rewritten without the replaced rows; every other file is
        carried into the new snapshot BY REFERENCE (no IO).  This is
        the Iceberg copy-on-write write path: at 10^12 rows an upsert
        touching one shard rewrites a handful of files, not the
        table.  Incoming rows are appended as new files."""
        cur = self.snapshot()
        if cur["schema"] is not None and \
                _schema_sig(cur["schema"]) != _schema_sig(df.schema.json()):
            raise ValueError("schema mismatch on merge")
        keys = df.select(key)
        bounds = keys.agg(F.min(key), F.max(key)).collect()[0]
        lo, hi = bounds[0], bounds[1]
        touched = [e for e in cur["manifest"]
                   if key not in e["bounds"]
                   or e["bounds"][key][0] is None
                   or not (e["bounds"][key][1] < lo
                           or e["bounds"][key][0] > hi)]
        kept = [e for e in cur["manifest"] if e not in touched]
        entries = list(kept)
        if touched:
            survivors = (self._load(touched, cur["schema"])
                         .join(F.broadcast(keys), key, "left_anti"))
            entries += self._write_files(survivors)
        entries += self._write_files(df)
        return self._commit({
            "version": cur["version"] + 1, "parent": cur["version"],
            "operation": "merge", "schema": df.schema.json()
            if cur["schema"] is None else cur["schema"],
            "manifest": entries})

    def compact(self, target_file_rows: int = 1 << 20) -> int:
        """Rewrite the current manifest into ~evenly sized files
        (small-file compaction).  Old snapshots keep reading the old
        files — nothing is deleted here."""
        cur = self.snapshot()
        if not cur["manifest"]:
            return cur["version"]
        total = sum(e["n_rows"] for e in cur["manifest"])
        n_out = max(1, (total + target_file_rows - 1) // target_file_rows)
        df = self.read().repartition(n_out)
        entries = self._write_files(df)
        return self._commit({
            "version": cur["version"] + 1, "parent": cur["version"],
            "operation": "compact", "schema": cur["schema"],
            "manifest": entries})

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop snapshot jsons older than the newest ``keep_last`` and
        delete data files no surviving snapshot references."""
        cur = self.current_version()
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        live: set[str] = set()
        for v in keep:
            live |= {e["path"] for e in self.snapshot(v)["manifest"]}
        removed = 0
        for v in range(1, cur + 1):
            if v in keep:
                continue
            for e in self.snapshot(v)["manifest"]:
                if e["path"] not in live and os.path.exists(e["path"]):
                    os.remove(e["path"])
                    removed += 1
            os.remove(self._snap_path(v))
        return removed

    # --- reads ---
    def _load(self, entries: list[dict], schema_json: str | None) -> DataFrame:
        if not entries:
            from pyspark.sql.types import StructType
            schema = StructType.fromJson(json.loads(schema_json)) \
                if schema_json else StructType([])
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*[e["path"] for e in entries])

    def read(self, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        return self._load(snap["manifest"], snap["schema"])

    def incremental(self, from_version: int,
                    to_version: int | None = None) -> DataFrame:
        """Rows added strictly after ``from_version`` (append-diff).
        Raises if a compaction rewrote history in the window — rewritten
        files can't be attributed to an append delta."""
        to = self.snapshot(to_version)
        base = {e["path"] for e in
                self.snapshot(from_version)["manifest"]}
        v = to["version"]
        while v > from_version:
            s = self.snapshot(v)
            if s.get("operation") in ("compact", "merge"):
                raise ValueError(
                    f"snapshot {v} is a {s['operation']}; incremental "
                    f"window ({from_version}, {to['version']}] is not "
                    f"append-only")
            v = s["parent"]
        new = [e for e in to["manifest"] if e["path"] not in base]
        return self._load(new, to["schema"])

    def cdc(self, from_version: int,
            to_version: int | None = None) -> DataFrame:
        """Row-level change capture between ANY two versions — works
        across merges and compactions, where ``incremental`` refuses:
        inserts are rows only in the newer version, deletes only in
        the older (an update surfaces as delete+insert).  Full
        exceptAll diff, so it reads both versions; for append-only
        windows ``incremental`` is the cheap path."""
        a = self.read(from_version)
        b = self.read(to_version)
        return (b.exceptAll(a)
                .withColumn("_change", F.lit("insert"))
                .unionByName(a.exceptAll(b)
                             .withColumn("_change", F.lit("delete"))))

    def scan_range(self, col: str, lo, hi,
                   version: int | None = None) -> tuple[DataFrame, dict]:
        """Manifest-pruned range scan: only files whose [min, max]
        bounds overlap [lo, hi] are read (the residual filter still
        applies row-level).  Returns (df, {files_total, files_read})."""
        snap = self.snapshot(version)
        kept = [e for e in snap["manifest"]
                if col not in e["bounds"]
                or e["bounds"][col][0] is None
                or not (e["bounds"][col][1] < lo
                        or e["bounds"][col][0] > hi)]
        df = self._load(kept, snap["schema"])
        if kept:
            df = df.where((F.col(col) >= lo) & (F.col(col) <= hi))
        return df, {"files_total": len(snap["manifest"]),
                    "files_read": len(kept)}


def create(spark: SparkSession, root: str) -> SnapTable:
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    return SnapTable(spark, root)
