"""Distributed BPE tokenizer training (Sennrich-style byte-pair
encoding over a word-frequency vocabulary).

The map-reduce formulation every large-scale tokenizer trainer uses:
the corpus compresses to a (word, count) vocabulary first (one
shuffle, tiny result), and each merge round counts adjacent symbol
pairs WEIGHTED by word count — so the per-round shuffle carries
(pair, count) rows bounded by |vocab| x max_word_len, never corpus
tokens.  The argmax pair per round is a 1-row collect (same pattern
as the BSP convergence check in ``dedup.dup_components``), and the
merge itself is a map-side left-to-right greedy fold over each
word's symbol array.  At 10^12 documents the vocabulary is the only
state that moves; rounds are O(n_merges) tiny jobs over it.

``bpe_pair_counts`` (the first round's pair table) is SQL-expressible
and oracle-checked as ``bpe_top_pairs``; the iterative ``bpe_train``
is verified in pytest against an independent pure-Python reference
implementation of the same algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def word_vocab(documents: DataFrame) -> DataFrame:
    """(word, n): corpus word-frequency vocabulary — BPE's input."""
    return (documents
            .select(F.explode(F.split("text", " ")).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("n")))


def bpe_pair_counts(documents: DataFrame, k: int = 20) -> DataFrame:
    """First BPE round: adjacent character-pair counts weighted by
    word frequency, top-k.  Output: pair ('a b'), n, rank."""
    vocab = word_vocab(documents).where(F.length("word") > 1)
    pairs = vocab.select(
        F.explode(F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> concat(substring(word, i, 1), ' ', "
            "substring(word, i + 1, 1)))")).alias("pair"),
        "n")
    counts = pairs.groupBy("pair").agg(F.sum("n").alias("n"))
    # distributed top-k first (TakeOrderedAndProject), then rank the
    # k survivors — see top_ngrams_corpus
    topk = counts.orderBy(F.col("n").desc(), "pair").limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return topk.withColumn("rank",
                           F.row_number().over(w).cast("long"))


def bpe_pair_counts_oracle_sql(k: int = 20) -> str:
    return f"""
        WITH v AS (
          SELECT word, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
          WHERE length(word) > 1 GROUP BY word
        ), p AS (
          SELECT substr(word, CAST(g.i AS INT), 1) || ' ' ||
                 substr(word, CAST(g.i AS INT) + 1, 1) AS pair, n
          FROM v, LATERAL (SELECT unnest(range(1,
               CAST(length(word) AS BIGINT))) AS i) g
        ), c AS (
          SELECT pair, CAST(sum(n) AS BIGINT) AS n
          FROM p GROUP BY pair
        )
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair)
                    AS BIGINT) AS rank
        FROM c QUALIFY rank <= {k}"""


def _merge_expr(a: str, b: str) -> str:
    """Left-to-right greedy merge of adjacent (a, b) -> a||b inside a
    symbol array, as a SQL fold (runs map-side, whole-stage codegen
    keeps it JVM-only)."""
    q = lambda s: s.replace("'", "\\'")  # noqa: E731
    a, b, ab = q(a), q(b), q(a) + q(b)
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]), "
        f"(acc, x) -> CASE WHEN element_at(acc, -1) = '{a}' "
        f"AND x = '{b}' THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array('{ab}')) ELSE concat(acc, array(x)) END) END")


def bpe_train(documents: DataFrame, n_merges: int = 8) -> list[dict]:
    """Learn ``n_merges`` BPE merges; ties broken by pair asc (a
    deterministic convention — reference trainers break ties by
    insertion order, which is not reproducible across partitionings).
    Returns [{step, left, right, merged, n}]."""
    vocab = (word_vocab(documents)
             .withColumn("syms", F.expr(
                 "transform(sequence(1, length(word)), "
                 "i -> substring(word, i, 1))"))
             .select("n", "syms")
             .localCheckpoint())
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        pairs = (vocab.where(F.size("syms") >= 2)
                 .select(F.explode(F.expr(
                     "transform(sequence(1, size(syms) - 1), "
                     "i -> struct(syms[i - 1] AS l, syms[i] AS r))"))
                     .alias("p"), "n")
                 .groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt")))
        top = (pairs.orderBy(F.col("cnt").desc(), "l", "r")
               .limit(1).collect())
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append({"step": step, "left": a, "right": b,
                       "merged": a + b, "n": cnt})
        vocab = (vocab.withColumn("syms", F.expr(_merge_expr(a, b)))
                 .localCheckpoint())
    return merges


def bpe_encode(df: DataFrame, merges: list[dict],
               col: str = "word") -> DataFrame:
    """Inference-side tokenizer: apply learned merges in order,
    one map-side projection per merge (Catalyst collapses the chain
    into a single codegen stage).  Adds a ``syms`` array column."""
    out = df.withColumn("syms", F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> substring({col}, i, 1))"))
    for m in merges:
        out = out.withColumn(
            "syms", F.expr(_merge_expr(m["left"], m["right"])))
    return out
