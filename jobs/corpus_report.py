"""spark-submit entry point for the corpus health report: the
read-only diagnostic sweep a team runs over a candidate training
corpus BEFORE kicking off the expensive cleaning/training builds.

    spark-submit --py-files ocr_pytorch_spark.zip jobs/corpus_report.py \\
        --documents <dir-with-documents.parquet> [--out report.json]

Sections (every one an oracle-verified query-surface operator):
  * volume: docs / chars / token totals (token_count)
  * split:  train/val/test hash-split accounting (dataset_split)
  * gates:  repetition x quality x language failure Venn
            (gate_ablation) — which gate uniquely kills volume
  * gate_auc: is the quality score actually ranking in-language docs
            higher? (classifier_auc)
  * skew:   heaviest sources + ratio-to-uniform (skew_profile on the
            source column) — the pre-salting diagnostic
  * overlap: corpus-pair MinHash Jaccard estimates between sources
            (corpus_overlap_minhash), flagging near-identical feeds
  * dedup:  exact-hash duplicate share (exact_dedup keeper stats)

Everything is one pass per section over the documents table; the
report is a single JSON object on stdout (and --out).  Read-only:
nothing is written to the corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(spark, docs) -> dict:
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators import dedup as D
    from ocr_pytorch_spark.operators import text as T
    from ocr_pytorch_spark.operators.indexing import skew_profile

    report: dict = {}

    vol = (T.token_count(docs)
           .agg(F.count("*").alias("docs"),
                F.sum("ws_tokens").alias("ws_tokens"),
                F.sum("bpe_tokens").alias("bpe_tokens"),
                F.sum("subword_est").alias("subword_est")).first())
    report["volume"] = {k: int(vol[k]) for k in
                        ("docs", "ws_tokens", "bpe_tokens",
                         "subword_est")}

    report["split"] = {
        r["split"]: {"n_docs": int(r["n_docs"]),
                     "total_chars": int(r["total_chars"])}
        for r in T.dataset_split(docs).collect()}

    report["gates"] = [
        {"fail_rep": bool(r["fail_rep"]),
         "fail_quality": bool(r["fail_quality"]),
         "fail_lang": bool(r["fail_lang"]),
         "n_docs": int(r["n_docs"]), "kept": bool(r["kept"])}
        for r in T.gate_ablation(docs).collect()]

    auc = T.classifier_auc(docs).first()
    # Single-class corpora (zero en or zero non-en docs) make the
    # Mann-Whitney denominator 0 -> auc_micro NULL; report null
    # instead of dying on None / 1e6 (r7 ADVICE).
    report["gate_auc"] = {"n_pos": int(auc["n_pos"]),
                          "n_neg": int(auc["n_neg"]),
                          "auc": (auc["auc_micro"] / 1e6
                                  if auc["auc_micro"] is not None
                                  else None)}

    report["source_skew"] = [
        {"source": r["source"], "docs": int(r["cnt"]),
         "share_ppm": int(r["share_ppm"]),
         "ratio_to_uniform_pct": int(r["ratio_pct"])}
        for r in skew_profile(docs, key="source", k=5).collect()]

    report["source_overlap_top"] = [
        {"a": r["source_a"], "b": r["source_b"],
         "jaccard_est": r["jaccard_est_micro"] / 1e6}
        for r in (D.corpus_overlap_minhash(docs)
                  .orderBy(F.col("jaccard_est_micro").desc(),
                           "source_a", "source_b")
                  .limit(5).collect())]

    dup = (D.exact_dedup(docs)
           .agg(F.count("*").alias("docs"),
                F.sum(F.when(F.col("is_keeper"), 0).otherwise(1))
                .alias("exact_dupes")).first())
    report["exact_dup"] = {
        "docs": int(dup["docs"]),
        "exact_dupes": int(dup["exact_dupes"] or 0),
        "dup_share": round((dup["exact_dupes"] or 0)
                           / max(dup["docs"], 1), 6)}
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ocr_pytorch_spark.sources.session import get_spark

    spark = get_spark(app="corpus-report")
    docs = spark.read.parquet(
        os.path.join(args.documents, "documents.parquet")
        if os.path.isdir(args.documents) else args.documents)
    report = run(spark, docs)
    line = json.dumps(report)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
