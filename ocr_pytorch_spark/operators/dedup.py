"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale notes (100 TB story):
* exact: one shuffle on the text hash — never on text bodies.
* MinHash+LSH: shingle explode is map-side; signatures are one groupBy
  on doc_id; candidate generation is an equi-join on band keys (small
  rows), NOT an all-pairs comparison — the classic O(n) near-dup path.
* SimHash: pure map-side arithmetic + one groupBy; the 16-bit key then
  buckets near-dups for cheap verification.
* n-gram Jaccard: restricted to candidate buckets (length prefix) so the
  pair join stays linear-ish; the verify join moves only (doc_id, word)
  rows.
* embedding-cosine: candidates restricted to sign-random-projection
  buckets (shared with operators/similarity.py), exact cosine verify —
  the all-pairs product never materializes.

All hashes are md5-hex based so every operator has a bit-exact DuckDB
oracle (see functions/__init__.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ocr_pytorch_spark.functions import HEX, quant4
from ocr_pytorch_spark.operators.text import word_ngrams


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Per-doc content hash + duplicate-group size (group over the full
    md5 of the text; keeper = lexicographically-first doc_id).
    Output: doc_id, text_hash, dup_count, is_keeper."""
    h = documents.select("doc_id", F.md5("text").alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return h.select(
        "doc_id", "text_hash",
        F.count("*").over(w).alias("dup_count"),
        (F.min("doc_id").over(w) == F.col("doc_id")).alias("is_keeper"),
    )


def minhash_signatures(documents: DataFrame, k: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """k-component MinHash over word shingles: component i is
    MIN(md5('<i>:' || shingle)) — string-min over a cryptographic hash is
    a uniform minwise hash and is engine-portable.
    Output: doc_id, mh0..mh{k-1}."""
    grams = word_ngrams(documents, shingle_n)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("gram"))))
            .alias(f"mh{i}") for i in range(k)]
    return grams.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(documents: DataFrame, k: int = 8, bands: int = 4
                      ) -> DataFrame:
    """LSH banding: k/bands rows per band; docs sharing any band key are
    candidate near-dup pairs.  Output: doc_a, doc_b (doc_a < doc_b),
    n_bands (how many bands matched)."""
    rows = k // bands
    sigs = minhash_signatures(documents, k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    banded = sigs.select("doc_id", *band_cols)
    # the band table feeds BOTH sides of the candidate self-join; persist
    # it so the shingle-explode + 8 min-aggs lineage runs once (at real
    # scale you'd materialize signatures to a table instead)
    banded = banded.persist()
    # long form: (band_idx, key, doc_id)
    stacked = banded.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     F.col(f"band{b}").alias("key"))
            for b in range(bands)])).alias("bk"),
    ).select("doc_id", "bk.band_idx", "bk.key")
    a = stacked.alias("a")
    b = stacked.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_bands"))
    )
    return pairs


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """16-bit SimHash over word tokens: token hash = first 4 hex chars of
    md5(word) decoded portably; per-bit weighted majority.
    Output: doc_id, simhash (long)."""
    from ocr_pytorch_spark.functions import word_rows

    w = word_rows(documents).select(
        "doc_id",
        reduce(
            lambda acc, i: acc + (
                (F.expr(f"instr('{HEX}', substring(md5(word), {i + 1}, 1))")
                 - 1) * (16 ** (3 - i))),
            range(4), F.lit(0)).alias("code"),
    )
    bit_sums = w.groupBy("doc_id").agg(*[
        F.sum(((F.floor(F.col("code") / (2 ** j)) % 2) * 2 - 1))
        .alias(f"s{j}") for j in range(bits)])
    sim = reduce(
        lambda acc, j: acc + F.when(F.col(f"s{j}") > 0,
                                    F.lit(2 ** j)).otherwise(F.lit(0)),
        range(bits), F.lit(0))
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def embedding_neardup_pairs(embeddings: DataFrame,
                            threshold: float = 0.35,
                            n_planes: int = 4) -> DataFrame:
    """Embedding-cosine near-dup detection: candidates = vector pairs in
    the same sign-random-projection bucket (the O(n) scale path — the
    all-pairs product never materializes), verified by exact cosine.
    Output: vec_a, vec_b (vec_a < vec_b), cos >= threshold."""
    from ocr_pytorch_spark.operators.similarity import lsh_buckets

    buckets = lsh_buckets(embeddings, n_planes)
    # component rows feed both sides of the pair join; persist so the
    # bucket computation + explode lineage runs once
    ex = (embeddings.join(buckets, "vec_id")
          .select("vec_id", "bucket",
                  F.posexplode("embedding").alias("pos", "val"))
          .select("vec_id", "bucket", "pos",
                  F.col("val").cast("double").alias("v"))).persist()
    a = ex.select(F.col("vec_id").alias("vec_a"),
                  F.col("bucket").alias("ba"),
                  F.col("pos").alias("pa"), F.col("v").alias("va"))
    b = ex.select(F.col("vec_id").alias("vec_b"), "bucket", "pos",
                  F.col("v").alias("vb"))
    pairs = (
        a.join(b, (F.col("pa") == F.col("pos"))
               & (F.col("ba") == F.col("bucket"))
               & (F.col("vec_a") < F.col("vec_b")))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"),
             F.sqrt(F.sum(F.col("va") * F.col("va"))).alias("na"),
             F.sqrt(F.sum(F.col("vb") * F.col("vb"))).alias("nb"))
        .select("vec_a", "vec_b",
                quant4(F.col("dot") / (F.col("na") * F.col("nb")))
                .alias("cos"))
        .where(F.col("cos") >= threshold))
    return pairs


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.5,
                        prefix_len: int = 12) -> DataFrame:
    """Near-dup verification: candidate pairs bucketed by a text prefix
    (keeps the pair join linear), then exact word-set Jaccard.
    Output: doc_a, doc_b, jaccard (rounded 4dp), only pairs >= threshold.
    """
    docs = documents.select(
        "doc_id", F.substring("text", 1, prefix_len).alias("bucket"))
    cand = (docs.alias("a").join(
        docs.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b")))
    from ocr_pytorch_spark.functions import word_rows

    # distinct words feed three consumers (sizes + both join sides)
    dw = word_rows(documents).select("doc_id", "word").distinct().persist()
    sizes = dw.groupBy("doc_id").agg(F.count("*").alias("n"))
    # intersection size via double equi-join on the word
    dwa = dw.select(F.col("doc_id").alias("doc_a"),
                    F.col("word").alias("w"))
    dwb = dw.select(F.col("doc_id").alias("doc_b"),
                    F.col("word").alias("w"))
    inter = (cand.join(dwa, "doc_a").join(dwb, ["doc_b", "w"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i")))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("doc_a"),
                              F.col("n").alias("na")), "doc_a")
           .join(sizes.select(F.col("doc_id").alias("doc_b"),
                              F.col("n").alias("nb")), "doc_b")
           .select("doc_a", "doc_b",
                   quant4(F.col("i") / (F.col("na") + F.col("nb")
                                        - F.col("i")))
                   .alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    return out
