"""ANN quality: LSH-bucketed top-k is a recall/cost trade — measure its
recall against the exact brute-force top-k instead of assuming it."""

from ocr_pytorch_spark.operators import similarity as S
from ocr_pytorch_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_lsh_recall_against_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    exact = S.cosine_topk(emb, n_queries=5, k=10).collect()
    approx = S.lsh_cosine_topk(emb, n_queries=5, k=10).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["q_id"], set()).add(r["vec_id"])

    assert set(exact_sets) == set(approx_sets) == set(range(5))
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 10
               for q in exact_sets]
    mean_recall = sum(recalls) / len(recalls)
    # 4 hyperplanes ~ 1/16 of the space per bucket: recall is traded for
    # a ~16x candidate cut; it must still be clearly better than random
    # (random 10-of-500 recall ~= 0.02)
    assert mean_recall >= 0.1, f"LSH recall collapsed: {recalls}"

    # every LSH hit must agree with the exact cosine value
    exact_cos = {(r["q_id"], r["vec_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["q_id"], r["vec_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9
