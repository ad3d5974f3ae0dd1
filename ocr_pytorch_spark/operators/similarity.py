"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: embeddings exploded to
  (vec_id, pos, val) rows, joined to the (small, broadcast) query rows on
  position, one groupBy for dot/norms.  The explode keeps everything in
  whole-stage codegen (no Python), the per-query work is a shuffle of
  (candidate, component) products — exact and embarrassingly parallel,
  the correct baseline at any scale.
* ``lsh_cosine_topk`` — the scale path: sign-random-projection LSH.
  Hyperplane weights are a pure function of (plane, dim) via md5 hex
  digits (engine-portable, no stored model); candidates = vectors whose
  bucket matches the query's, then exact cosine within the bucket.  At
  10^12 vectors the bucket join replaces the all-pairs product with an
  equi-join on (bucket), trading recall for a ~2^planes fan-in cut.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ocr_pytorch_spark.functions import HEX, quant4


def _exploded(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val"))


def _pair_cosine(qe: DataFrame, ce: DataFrame) -> DataFrame:
    """(q_id, vec_id, cos) from exploded query/candidate component rows;
    cosine computed in float64 with a fixed formula both engines share."""
    q = qe.select(F.col("vec_id").alias("q_id"), "pos",
                  F.col("val").cast("double").alias("qv"))
    c = ce.select("vec_id", "pos", F.col("val").cast("double").alias("cv"))
    return (
        q.join(c, "pos")
        .where(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("dot"),
             F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("qn"),
             F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cn"))
        .select("q_id", "vec_id",
                quant4(F.col("dot") / (F.col("qn") * F.col("cn")))
                .alias("cos"))
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine for query vec_ids < n_queries.
    Deterministic tie-break on vec_id. Output: q_id, vec_id, cos, rank."""
    qe = _exploded(embeddings.where(F.col("vec_id") < n_queries))
    ce = _exploded(embeddings)
    cos = _pair_cosine(qe, ce)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (cos.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def lsh_buckets(embeddings: DataFrame, n_planes: int = 4) -> DataFrame:
    """(vec_id, bucket) via sign-random-projections with md5-derived
    weights, computed on exploded rows (portable to DuckDB SQL)."""
    ex = _exploded(embeddings).select(
        "vec_id", "pos", F.col("val").cast("double").alias("v"))
    proj_aggs = []
    for p in range(n_planes):
        w = (F.expr(
            f"instr('{HEX}', substring(md5(concat('{p}:', "
            f"cast(pos as string))), 1, 1))") - 1) - 7.5
        proj_aggs.append(F.sum(F.col("v") * w).alias(f"proj{p}"))
    projs = ex.groupBy("vec_id").agg(*proj_aggs)
    bucket = reduce(
        lambda acc, p: acc + F.when(F.col(f"proj{p}") > 0,
                                    F.lit(2 ** p)).otherwise(F.lit(0)),
        range(n_planes), F.lit(0))
    return projs.select("vec_id", bucket.cast("int").alias("bucket"))


def lsh_cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                    k: int = 10, n_planes: int = 4) -> DataFrame:
    """ANN top-k: exact cosine restricted to the query's LSH bucket.
    Output: q_id, vec_id, cos, rank (rank within bucket)."""
    buckets = lsh_buckets(embeddings, n_planes)
    emb_b = embeddings.join(buckets, "vec_id")
    exploded_b = emb_b.select(
        "vec_id", "bucket",
        F.posexplode("embedding").alias("pos", "val"))
    qq = (exploded_b.where(F.col("vec_id") < n_queries)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("bucket").alias("qb"),
                  F.col("pos").alias("qpos"),
                  F.col("val").cast("double").alias("qv")))
    cc = exploded_b.select(
        "vec_id", "bucket", "pos",
        F.col("val").cast("double").alias("cv"))
    cos = (
        qq.join(cc, (F.col("qpos") == F.col("pos"))
                & (F.col("qb") == F.col("bucket")))
        .where(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("dot"),
             F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("qn"),
             F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cn"))
        .select("q_id", "vec_id",
                quant4(F.col("dot") / (F.col("qn") * F.col("cn")))
                .alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (cos.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
