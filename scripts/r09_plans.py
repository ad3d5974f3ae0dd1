"""Capture .explain('formatted') for the r9-touched queries into
plans/r09/<query>_<tag>.txt  (tag = before | after).

Usage: python scripts/r09_plans.py before [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401

SF = "/root/testdata/sf0.01"

DEFAULT = [
    "dedup_embedding_cosine", "sim_pq_codes", "sim_pq_topk", "semdedup",
    "sim_ivf_cells", "sim_ivf_topk", "dsir_topk", "sim_lsh_topk",
    "lm_perplexity", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_minhash_sig", "gate_ablation", "corpus_overlap_minhash",
    "pdf_text_extract", "tfidf_topk", "bm25_topk", "boilerplate_blocks",
    "robots_match", "dedup_incremental", "sim_topk_cosine",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark

    out_dir = os.path.join(REPO_ROOT, "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="r09-plans", cpus="8")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "->", f"{name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
