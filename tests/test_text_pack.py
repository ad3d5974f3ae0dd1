"""chunk_documents + pack_sequences (operators/text.py) invariants.

The exact-value parity vs DuckDB is covered by the contract test
(`doc_chunks` / `pack_sequences` oracle keys); these check the
structural guarantees the SQL hash can't articulate.
"""

import math

import pytest
from pyspark.sql import Window, functions as F

from ocr_pytorch_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_SMALL
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_chunks_cover_and_overlap(spark, docs):
    out = T.chunk_documents(docs, chunk_tokens=10, overlap=4).cache()
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n"))
    joined = (out.groupBy("doc_id")
              .agg(F.count("*").alias("n_chunks"),
                   F.max("chunk_idx").alias("max_idx"),
                   F.sum("n_tokens").alias("tok_sum"))
              .join(toks, "doc_id"))
    rows = joined.collect()
    assert rows
    for r in rows:
        stride = 10 - 4
        expect = max(1, math.ceil((r["n"] - 4) / stride))
        assert r["n_chunks"] == expect, r
        assert r["max_idx"] == expect - 1
        # overlap accounting: chunks re-count `overlap` tokens at each
        # seam; the final chunk is the only one that may be short
        assert r["tok_sum"] == r["n"] + 4 * (expect - 1)
    # every chunk except possibly the last is exactly chunk_tokens
    bad = (out.withColumn(
        "is_last",
        F.col("chunk_idx") == F.max("chunk_idx").over(
            Window.partitionBy("doc_id")))
        .where(~F.col("is_last") & (F.col("n_tokens") != 10)))
    assert bad.count() == 0
    out.unpersist()


def test_pack_sequences_partitions_every_doc(spark, docs):
    budget = 128
    out = T.pack_sequences(docs, budget=budget).cache()
    toks = docs.select(
        "doc_id",
        F.greatest(F.size(F.split("text", " ")), F.lit(1))
        .alias("n_tok"))
    # per-doc: slices are disjoint, contiguous, and cover all tokens
    per_doc = (out.groupBy("doc_id")
               .agg(F.sum("n_tokens").alias("covered"),
                    F.min("doc_off").alias("min_off"))
               .join(toks, "doc_id"))
    assert per_doc.where(
        (F.col("covered") != F.col("n_tok"))
        | (F.col("min_off") != 0)).count() == 0
    # per-sequence: every sequence is exactly `budget` tokens except
    # the last one
    per_seq = out.groupBy("seq_id").agg(F.sum("n_tokens").alias("n"))
    last = per_seq.agg(F.max("seq_id")).collect()[0][0]
    assert per_seq.where(
        (F.col("seq_id") != last) & (F.col("n") != budget)
    ).count() == 0
    out.unpersist()


def test_pack_sequences_partition_count_invariant(spark, docs):
    """The two-phase prefix sum must give the same packing whatever
    the range-partition count — the offsets, not the partitioning,
    define the result."""
    a = T.pack_sequences(docs, budget=96, range_partitions=2)
    b = T.pack_sequences(docs, budget=96, range_partitions=13)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_chunk_documents_rejects_bad_overlap():
    with pytest.raises(ValueError):
        T.chunk_documents(None, chunk_tokens=8, overlap=8)


def test_stratified_sample_temperature_shape(spark):
    """Rates follow min(1, c/sqrt(n_lang)): a tiny stratum is kept
    wholesale (cutoff saturates at 16^8) while a large stratum is
    down-sampled near c*sqrt(n); sampling is deterministic (same
    rows on re-run)."""
    from ocr_pytorch_spark.operators.text import stratified_sample
    rows = ([(f"big-{i:05d}", "big") for i in range(4000)]
            + [(f"tiny-{i}", "tiny") for i in range(16)])
    d = spark.createDataFrame(rows, "doc_id string, lang string")
    out = stratified_sample(d, c=8.0).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # tiny stratum: rate = min(1, 8/4) = 1 -> everything kept
    assert len(by_lang["tiny"]) == 16
    # big stratum: target ~ 8*sqrt(4000) ~ 506; binomial 5-sigma
    n_big = len(by_lang["big"])
    assert 400 < n_big < 620, n_big
    # deterministic: identical keep-set on re-run
    out2 = stratified_sample(d, c=8.0).collect()
    assert {r["doc_id"] for r in out2} == (by_lang["big"]
                                           | by_lang["tiny"])
