"""PageRank (operators/graph.py) semantics.

Exact-value parity vs DuckDB is the `pagerank` contract key; these
check what the hash can't: probability-mass conservation (the
dangling-redistribution term is doing its job) and rank ordering
reacting to in-degree.
"""

import pytest
from pyspark.sql import functions as F

from ocr_pytorch_spark.operators import graph as G


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_SMALL
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_rank_mass_conserved(spark, docs):
    out = G.pagerank(docs, iters=4)
    n = docs.count()
    total = out.agg(F.sum("rank_x_n_q4")).collect()[0][0]
    # sum of rank == 1 (scaled: == n); quant4 rounding gives each row
    # up to 5e-5 absolute slack
    assert abs(total - n) < 5e-5 * n + 0.01, (total, n)


def test_high_indegree_outranks_dangling(spark, docs):
    n = docs.count()
    out = {r["node"]: r["rank_x_n_q4"]
           for r in G.pagerank(docs, iters=4).collect()}
    edges = G.link_edges(docs, n)
    indeg = {r["dst"]: r["c"] for r in
             edges.groupBy("dst").agg(F.count("*").alias("c"))
             .collect()}
    top = max(indeg, key=lambda k: indeg[k])
    zero = next(v for v in range(n) if v not in indeg)
    assert out[top] > out[zero]
    # every node keeps at least the teleport floor (1-d)/n, scaled: x n
    assert min(out.values()) >= (1 - G.DAMPING) - 1e-3
