"""End-to-end training-corpus cleaning job (jobs/clean_corpus.py):
near-dup components -> keeper policy -> lang/quality gates -> bucketed
lineage commit, with kill/resume idempotence."""

import os

from pyspark.sql import functions as F


def _docs(spark):
    from ocr_pytorch_spark import datagen

    rows = [(int(d["doc_id"][4:]),
             " ".join(s["text"] for s in d["spans"]
                      if s["kind"] == "text" and s["text"]))
            for d in datagen.gen_documents(40)]
    # planted near-dup: a noisy copy of doc 0 that the component
    # keeper policy must collapse
    ws = rows[0][1].split()
    if ws:
        ws[len(ws) // 2] = "zq"
    rows.append((9000, " ".join(ws)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows(spark, dst):
    df = spark.read.parquet(os.path.join(dst, "data"))
    return sorted((r["doc_id"], r["text"], r["lang_pred"])
                  for r in df.select("doc_id", "text",
                                     "lang_pred").collect())


def test_clean_corpus_job_and_resume(spark, tmp_path_factory):
    import shutil

    from jobs.clean_corpus import run
    from ocr_pytorch_spark.plans.lineage import (LINEAGE_SCHEMA,
                                                 committed_buckets)

    buckets = 8
    docs = _docs(spark)

    dst_clean = str(tmp_path_factory.mktemp("cc_clean"))
    s1 = run(spark, docs, dst_clean, min_quality=0.0, lang="en",
             buckets=buckets)
    assert s1["input"] == 41
    assert 0 < s1["dedup+filter"] <= 41
    clean = _corpus_rows(spark, dst_clean)
    assert clean
    ids = {r[0] for r in clean}
    assert not (0 in ids and 9000 in ids)  # dup pair collapsed
    lin = spark.read.parquet(os.path.join(dst_clean, "_lineage"))
    assert lin.where(F.col("status") == "ok").count() == buckets
    st = spark.read.parquet(os.path.join(dst_clean, "_stats"))
    assert st.collect()[0]["input"] == 41

    # crash simulation: full output, only half the buckets committed
    dst = str(tmp_path_factory.mktemp("cc_crash"))
    run(spark, docs, dst, min_quality=0.0, lang="en", buckets=buckets)
    keep = [tuple(r) for r in spark.read.parquet(
        os.path.join(dst, "_lineage")).collect()
        if r["bucket"] < buckets // 2]
    shutil.rmtree(os.path.join(dst, "_lineage"))
    spark.createDataFrame(keep, LINEAGE_SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(dst, "_lineage"))
    assert committed_buckets(spark, dst) == set(range(buckets // 2))

    s2 = run(spark, docs, dst, min_quality=0.0, lang="en",
             buckets=buckets)
    assert s2["buckets_skipped"] == buckets // 2
    assert _corpus_rows(spark, dst) == clean

    # second resume short-circuits
    s3 = run(spark, docs, dst, min_quality=0.0, lang="en",
             buckets=buckets)
    assert s3["docs_processed"] == 0
    assert s3["buckets_skipped"] == buckets
