"""Corpus health report job (jobs/corpus_report.py): every section
present, internally consistent, and derived from the oracle-verified
operator surface."""

import os


def test_corpus_report_sections(spark):
    from jobs.corpus_report import run
    from tests.conftest import SF_MED

    docs = spark.read.parquet(os.path.join(SF_MED,
                                           "documents.parquet"))
    n = docs.count()
    rep = run(spark, docs)

    assert rep["volume"]["docs"] == n
    assert rep["volume"]["bpe_tokens"] >= rep["volume"]["ws_tokens"]

    # split partitions the corpus
    assert sum(v["n_docs"] for v in rep["split"].values()) == n
    assert set(rep["split"]) <= {"train", "val", "test"}

    # gate Venn partitions the corpus too
    assert sum(g["n_docs"] for g in rep["gates"]) == n
    kept = [g for g in rep["gates"] if g["kept"]]
    assert all(not (g["fail_rep"] or g["fail_quality"]
                    or g["fail_lang"]) for g in kept)

    assert 0.0 <= rep["gate_auc"]["auc"] <= 1.0
    assert rep["gate_auc"]["n_pos"] + rep["gate_auc"]["n_neg"] == n

    assert rep["source_skew"] and all(
        s["docs"] > 0 for s in rep["source_skew"])
    assert all(0.0 <= o["jaccard_est"] <= 1.0
               for o in rep["source_overlap_top"])
    assert rep["exact_dup"]["docs"] == n


def test_corpus_report_single_class_auc_null(spark):
    """ADVICE r7: a single-class corpus (every doc the same lang) has
    no Mann-Whitney denominator — the report must emit auc: None, not
    die on None / 1e6."""
    from jobs.corpus_report import run
    from tests.conftest import SF_MED

    docs = (spark.read.parquet(os.path.join(SF_MED,
                                            "documents.parquet"))
            .limit(40))
    # force single-class: classifier_auc labels on the lang column
    from pyspark.sql import functions as F
    docs = docs.withColumn("lang", F.lit("en"))
    rep = run(spark, docs)
    assert rep["gate_auc"]["n_neg"] == 0
    assert rep["gate_auc"]["auc"] is None
