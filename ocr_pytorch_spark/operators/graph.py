"""Iterative graph analytics over the corpus: PageRank.

Web-corpus pipelines rank hosts/documents by link authority before
sampling (the quality-weighted crawl mix); this is the engine's
iterative-join family alongside the BSP/star dup-components in
``operators/dedup.py``.

The link graph is derived deterministically from ``documents`` so the
DuckDB oracle can rebuild it bit-for-bit: every doc except the
``doc_id % 11 == 0`` ones (deliberate DANGLING nodes — they exercise
the redistribution term) links to three affine-mapped targets.

Scale notes (the 10^12-row story):

* ranks/edges are skinny (node, double) rows; each iteration is one
  shuffle-join on src + one aggregation on dst — the canonical
  PageRank dataflow.  Pre-partitioning edges by src lets Spark reuse
  the exchange across iterations.
* the dangling-mass term is ONE scalar aggregate per iteration
  (driver receives 8 doubles total, never rows).
* ``localCheckpoint`` truncates the growing lineage each iteration so
  the plan stays O(1)-deep instead of O(iterations)-deep — without it
  the optimizer re-analyzes an 8-join-deep tree every action and a
  lost executor would recompute the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_pytorch_spark.functions import quant4, quant4_sql

EDGE_MAPS = ((31, 7), (17, 3), (5, 11))
DANGLING_MOD = 11
DAMPING = 0.85
ITERS = 8


def link_edges(documents: DataFrame, n: int) -> DataFrame:
    """(src, dst) rows of the deterministic link graph."""
    e = None
    for p, q in EDGE_MAPS:
        part = (documents
                .where(F.col("doc_id") % DANGLING_MOD != 0)
                .select(F.col("doc_id").alias("src"),
                        ((F.col("doc_id") * p + q) % n).alias("dst")))
        e = part if e is None else e.unionByName(part)
    return e


def pagerank(documents: DataFrame, iters: int = ITERS,
             damping: float = DAMPING) -> DataFrame:
    """PageRank with uniform dangling-mass redistribution, ``iters``
    synchronous iterations from the uniform start.

    Output: (node, rank_x_n_q4) — rank scaled by N (so values are
    O(1)) and 4dp-quantized for cross-engine hashing."""
    n = documents.count()  # scalar; the graph size
    nodes = documents.select(F.col("doc_id").alias("node"))
    edges = link_edges(documents, n)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges = edges.join(deg, "src").persist()
    # static dangling flag riding along with the rank rows
    nodes_f = (nodes.join(deg, nodes.node == deg.src, "left")
               .select("node", F.col("deg").isNull().alias("dang"))
               .persist())
    ranks = nodes_f.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        dangling = (ranks.where("dang").agg(F.sum("rank"))
                    .collect()[0][0] or 0.0)  # one double per iter
        contribs = (edges.join(ranks, edges.src == ranks.node)
                    .select("dst",
                            (F.col("rank") / F.col("deg")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("contrib")))
        ranks = (nodes_f
                 .join(contribs, nodes_f.node == contribs.dst, "left")
                 .select("node", "dang",
                         (F.lit((1.0 - damping) / n)
                          + damping * (F.coalesce(F.col("contrib"),
                                                  F.lit(0.0))
                                       + F.lit(dangling / n)))
                         .alias("rank")))
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node", quant4(F.col("rank") * n).alias("rank_x_n_q4"))


def pagerank_oracle_sql(iters: int = ITERS,
                        damping: float = DAMPING) -> str:
    # MATERIALIZED is load-bearing: each r{i+1} references r{i} twice
    # (dangling sum + contribs), so inlined CTEs re-evaluate the whole
    # chain 2^iters times (measured: 80s -> <1s at 500 nodes)
    edge_sel = "\n          UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {p} + {q}) % nn.n AS dst "
        f"FROM documents CROSS JOIN nn "
        f"WHERE doc_id % {DANGLING_MOD} <> 0"
        for p, q in EDGE_MAPS)
    sql = [f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        nodes AS (SELECT doc_id AS node FROM documents),
        edges AS MATERIALIZED (
          {edge_sel}
        ),
        deg AS MATERIALIZED (SELECT src, count(*) AS deg
                             FROM edges GROUP BY src),
        nf AS (
          SELECT node, deg.src IS NULL AS dang
          FROM nodes LEFT JOIN deg ON nodes.node = deg.src
        ),
        r0 AS MATERIALIZED (SELECT node, dang, 1.0 / nn.n AS rank
               FROM nf CROSS JOIN nn)"""]
    for i in range(iters):
        sql.append(f""",
        d{i} AS MATERIALIZED (
          SELECT COALESCE(sum(rank), 0) AS m FROM r{i} WHERE dang),
        c{i} AS MATERIALIZED (
          SELECT e.dst AS node, sum(r.rank / deg.deg) AS contrib
          FROM r{i} r
          JOIN edges e ON e.src = r.node
          JOIN deg ON deg.src = e.src
          GROUP BY e.dst
        ),
        r{i + 1} AS MATERIALIZED (
          SELECT nf.node, nf.dang,
                 (1.0 - {damping}) / nn.n
                 + {damping} * (COALESCE(c.contrib, 0)
                                + d{i}.m / nn.n) AS rank
          FROM nf CROSS JOIN nn CROSS JOIN d{i}
          LEFT JOIN c{i} c ON c.node = nf.node
        )""")
    sql.append(f"""
        SELECT node,
               {quant4_sql(f'rank * (SELECT n FROM nn)')}
                 AS rank_x_n_q4
        FROM r{iters}""")
    return "".join(sql)
