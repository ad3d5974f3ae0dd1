"""Train-side dataset scans (SURVEY.md §2.1 S4/S6), Spark-native.

The extraction engine doesn't train models, but the reference's dataset
formats are part of its API surface, so the readers exist as DataFrame
sources:

* ``read_infofile`` — CRNN label file: one ``path<TAB>label`` line per
  text-line image (train_code/train_crnn/mydataset.py:155-171).
* ``read_icdar_gt`` — ICDAR ``gt_*.txt``: 8-coord polygon lines; parsed
  to axis-aligned boxes and sliced into width-16 proposal strips the way
  CTPN trains (train_code/train_ctpn/data/dataset.py:132-162,
  box_transfer_v2) — expressed with split/sequence/explode instead of
  the reference's Python loops.

VOC XML ground truth (S5) needs an XML datasource jar that the sandbox
lacks; ``read_voc_xml`` falls back to a regexp-based line parser good
enough for the single-bndbox-per-element layout the reference consumes
(train_code/train_ctpn/data/dataset.py:18-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_infofile(spark: SparkSession, path: str) -> DataFrame:
    """path<TAB>label lines -> (path string, label string)."""
    return (spark.read.option("sep", "\t")
            .schema("path string, label string").csv(path))


def read_icdar_gt(spark: SparkSession, path: str,
                  strip_width: int = 16) -> DataFrame:
    """ICDAR gt lines 'x1,y1,x2,y2,x3,y3,x4,y4[,label]' ->
    (file, xmin, ymin, xmax, ymax, strip_x1, strip_x2) — one row per
    16-px-wide proposal strip covering the box (box_transfer_v2
    semantics: strips on the stride-16 grid spanning [xmin, xmax))."""
    raw = (spark.read.text(path)
           .withColumn("file", F.input_file_name())
           .where(F.length(F.trim("value")) > 0))
    coords = F.split(F.regexp_replace("value", r"﻿", ""), ",")
    xs = [coords.getItem(i).cast("double") for i in (0, 2, 4, 6)]
    ys = [coords.getItem(i).cast("double") for i in (1, 3, 5, 7)]
    boxes = raw.select(
        "file",
        F.least(*xs).alias("xmin"), F.least(*ys).alias("ymin"),
        F.greatest(*xs).alias("xmax"), F.greatest(*ys).alias("ymax"))
    # strips: k from floor(xmin/16) to ceil(xmax/16)-1
    k0 = F.floor(F.col("xmin") / strip_width).cast("int")
    k1 = (F.ceil(F.col("xmax") / strip_width) - 1).cast("int")
    return (boxes
            .withColumn("k", F.explode(F.sequence(k0, F.greatest(k1, k0))))
            .select("file", "xmin", "ymin", "xmax", "ymax",
                    (F.col("k") * strip_width).alias("strip_x1"),
                    ((F.col("k") + 1) * strip_width).alias("strip_x2")))


def read_voc_xml(spark: SparkSession, path: str) -> DataFrame:
    """Minimal VOC bndbox reader: extracts (file, xmin, ymin, xmax,
    ymax) via regexp over the raw XML text (no spark-xml jar needed for
    the flat layout the reference reads)."""
    raw = spark.read.option("wholetext", True).text(path) \
        .withColumn("file", F.input_file_name())
    box = F.regexp_extract_all(
        "value",
        F.lit(r"<bndbox>\s*<xmin>(\d+)</xmin>\s*<ymin>(\d+)</ymin>"
              r"\s*<xmax>(\d+)</xmax>\s*<ymax>(\d+)</ymax>"), 0)
    exploded = raw.select("file", F.explode(box).alias("b"))
    def grab(tag):
        return F.regexp_extract("b", f"<{tag}>(\\d+)</{tag}>", 1) \
            .cast("int").alias(tag)
    return exploded.select("file", grab("xmin"), grab("ymin"),
                           grab("xmax"), grab("ymax"))
