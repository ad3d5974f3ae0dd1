"""End-to-end web-extraction pipeline (jobs/web_corpus.py): raw pages
-> main content -> repetition gate -> decontamination -> bucketed
corpus, with stage stats."""

import os


def test_web_corpus_job_end_to_end(spark, tmp_path_factory):
    from ocr_pytorch_spark import datagen
    from jobs.web_corpus import run

    src = tmp_path_factory.mktemp("wcsrc")
    dst = str(tmp_path_factory.mktemp("wcdst"))
    # flat (doc_id, text) docs — 40 normal + 1 hyper-repetitive spam
    rows = [(str(d["doc_id"]),
             " ".join(s["text"] for s in d["spans"]
                      if s["kind"] == "text" and s["text"]))
            for d in datagen.gen_documents(40)]
    rows.append(("spam-doc", "buy now " * 50))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    stats = run(spark, docs, dst, min_words=4)
    assert stats["docs_in"] == 41
    # the spam doc dies at the repetition gate
    assert stats["after_repetition_gate"] < 41
    # each later stage only narrows, and survivors remain
    assert (stats["after_repetition_gate"]
            >= stats["after_quality_gate"]
            >= stats["after_line_dedup"]
            >= stats["after_decontam"])
    assert stats["after_decontam"] > 0
    out = spark.read.parquet(os.path.join(dst, "web_corpus"))
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert "spam-doc" not in ids
    assert out.count() == stats["after_decontam"]
    # extracted text is boilerplate-free
    sample = out.limit(5).collect()
    assert all("BUY NOW" not in r["text"] and "<" not in r["text"]
               for r in sample)
    # stats table written
    st = spark.read.parquet(os.path.join(dst, "_stats")).collect()[0]
    assert st["docs_in"] == 41
