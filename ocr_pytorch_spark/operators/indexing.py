"""Corpus indexing operators: TF-IDF term ranking, inverted index,
corpus-wide heavy hitters, and Z-order clustering keys.

Scale notes (100 TB story):
* ``tfidf_topk``: (doc, word) counts are one shuffle with map-side
  combine; document frequencies aggregate from those counts (no
  second scan); the per-doc top-k is a bounded window over ~|vocab|
  rows per doc.  Ranking uses the 4dp-quantized score so the order is
  engine-stable (raw double ties could rank differently across
  engines at the ulp level).
* ``inverted_index``: the classic posting-list build has a stopword
  skew problem — ``collect_set`` over "the" accumulates every doc_id
  in the corpus on one reducer.  The build is therefore two-phase:
  document frequencies first (cheap count shuffle), then the high-df
  term set (tiny) broadcasts back as an exclusion list so posting
  lists are only materialized for selective terms.  Excluded terms
  still appear with their df and a NULL posting list.
* ``top_ngrams_corpus``: partial aggregation collapses repeated
  bigrams map-side; the global top-k is a single ordered limit (Spark
  executes TakeOrderedAndProject — no full sort).
* ``zorder_key``: bit-interleaving two dimensions gives multi-column
  locality for the snapshot layer's manifest pruning
  (``snaptable.scan_range``): sorting by z-order before writing makes
  file [min, max] bounds tight in BOTH dimensions, so range scans on
  either column skip files (Delta/Iceberg OPTIMIZE ZORDER does the
  same thing).  Pure integer arithmetic — bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_pytorch_spark.functions import quant4


def _word_rows(documents: DataFrame) -> DataFrame:
    # deliberately NO fan_out here (r9): this explode feeds pure
    # codegen count aggregations — cheap enough per row that the
    # repartition costs more than the extra parallelism buys
    # (measured bm25 0.99s -> 1.58s with fan_out); fan_out pays only
    # where per-row work is interpreted (array math, md5 chains)
    return documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word"))


def tfidf_topk(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1).
    Output: doc_id, word, tf, score (4dp), rank."""
    # corpus size as a broadcast 1-row relation (r9): documents.count()
    # was a separate per-invocation driver action (the oracle already
    # phrases it as CROSS JOIN n)
    nrow = documents.agg(F.count("*").alias("n_docs"))
    tf = (_word_rows(documents).groupBy("doc_id", "word")
          .agg(F.count("*").alias("tf")))
    df_ = (tf.groupBy("word")
           .agg(F.count("*").alias("df")))
    # broadcast the df side (r9): it is vocab-shaped; without the hint
    # the planner sort-merge-joined, re-shuffling the full (doc, word)
    # tf relation by word just to attach one count per term
    scored = (tf.join(F.broadcast(df_), "word")
              .crossJoin(F.broadcast(nrow))
              .withColumn(
                  "score",
                  quant4(F.col("tf")
                         * (F.log((F.col("n_docs") + 1.0)
                                  / (F.col("df") + 1.0)) + 1.0))))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word"))
    return (scored.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .where(F.col("rank") <= k)
            .select("doc_id", "word", "tf", "score", "rank"))


def tfidf_topk_oracle_sql(k: int = 3) -> str:
    """DuckDB oracle for tfidf_topk (N computed in-query)."""
    return f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), tf AS (
          SELECT doc_id, word, count(*) AS tf
          FROM w GROUP BY doc_id, word
        ), df AS (
          SELECT word, count(*) AS df FROM tf GROUP BY word
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.word, tf.tf,
                 floor((tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0))
                        + 1.0)) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN df USING (word) CROSS JOIN n
        ), ranked AS (
          SELECT doc_id, word, tf, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, word) AS BIGINT) AS rank
          FROM scored
        )
        SELECT doc_id, word, tf, score, rank
        FROM ranked WHERE rank <= {k}"""


def inverted_index(documents: DataFrame,
                   max_df: int = 6,
                   postings_cap: int = 20) -> DataFrame:
    """Two-phase posting-list build over 3-word shingle terms (phrase
    index; single words are all stopword-grade in this corpus).
    Terms with df > max_df (the stopword/skew band) keep their df but
    a NULL posting list; the rest get the first ``postings_cap``
    doc_ids (lexicographic ascending).
    Output: term, df, postings (comma-joined string or NULL)."""
    pairs = (documents
             .select("doc_id", F.split("text", " ").alias("ws"))
             .select("doc_id", F.explode(F.expr(
                 "transform(sequence(0, size(ws) - 3), "
                 "i -> concat_ws(' ', slice(ws, i + 1, 3)))"))
                 .alias("term"))
             .distinct())
    df_ = pairs.groupBy("term").agg(F.count("*").alias("df"))
    hot = df_.where(F.col("df") > max_df).select("term")
    cold_postings = (
        pairs.join(F.broadcast(hot), "term", "left_anti")
        .groupBy("term")
        .agg(F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_list(
                F.col("doc_id").cast("string"))), 1, postings_cap))
            .alias("postings")))
    return (df_.join(cold_postings, "term", "left")
            .select("term", "df", "postings"))


def inverted_index_oracle_sql(max_df: int = 6,
                              postings_cap: int = 20) -> str:
    return f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), pairs AS (
          SELECT DISTINCT doc_id,
                 array_to_string(ws[g.i + 1 : g.i + 3], ' ') AS term
          FROM w, LATERAL (SELECT unnest(range(0,
               CAST(len(ws) - 2 AS BIGINT))) AS i) g
        ), df AS (
          SELECT term, count(*) AS df FROM pairs GROUP BY term
        ), cold AS (
          SELECT term,
                 array_to_string(
                   (list(CAST(doc_id AS VARCHAR)
                         ORDER BY CAST(doc_id AS VARCHAR)))
                   [1:{postings_cap}], ',') AS postings
          FROM pairs
          WHERE term IN (SELECT term FROM df WHERE df <= {max_df})
          GROUP BY term
        )
        SELECT df.term, df.df, cold.postings
        FROM df LEFT JOIN cold USING (term)"""


def top_ngrams_corpus(documents: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word bigrams (heavy hitters).
    Output: bigram, n, rank — ties broken by bigram asc."""
    words = documents.select(
        "doc_id", F.split("text", " ").alias("ws"))
    bigrams = words.select(F.explode(F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> concat(ws[i - 1], ' ', ws[i]))")).alias("bigram"))
    counts = bigrams.groupBy("bigram").agg(F.count("*").alias("n"))
    # distributed top-k FIRST (TakeOrderedAndProject — every partition
    # prunes to k, no global sort), then rank the k survivors; a bare
    # row_number() window would funnel every count to one task
    topk = counts.orderBy(F.col("n").desc(), "bigram").limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return topk.withColumn("rank",
                           F.row_number().over(w).cast("long"))


def top_ngrams_corpus_oracle_sql(k: int = 20) -> str:
    return f"""
        WITH w AS (
          SELECT string_split(text, ' ') AS ws FROM documents
        ), b AS (
          SELECT ws[g.i] || ' ' || ws[g.i + 1] AS bigram
          FROM w, LATERAL (SELECT unnest(range(1,
               CAST(len(ws) AS BIGINT))) AS i) g
        ), c AS (
          SELECT bigram, count(*) AS n FROM b GROUP BY bigram
        )
        SELECT bigram, n,
               CAST(row_number() OVER (ORDER BY n DESC, bigram)
                    AS BIGINT) AS rank
        FROM c QUALIFY rank <= {k}"""


# --- Z-order clustering -------------------------------------------------

ZORDER_BITS = 16


def zorder_key(a, b, bits: int = ZORDER_BITS):
    """Interleave the low ``bits`` bits of two non-negative integer
    columns (a in even positions, b in odd) — the Morton/Z-order key.
    Built from shifts and adds only, so the identical arithmetic runs
    in DuckDB."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a, i) % 2, 2 * i)
             + F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1))
    return z.cast("long")


def zorder_key_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({b} // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_cluster(documents: DataFrame,
                   cols: tuple[str, str] = ("doc_id", "n_chars")
                   ) -> DataFrame:
    """Documents keyed and range-sorted by Z-order over two columns —
    the write-side clustering that makes ``snaptable.scan_range``
    prune on either column.  Output: doc_id, <b>, z."""
    a, b = cols
    return (documents
            .select(a, b, zorder_key(a, b).alias("z"))
            .repartitionByRange(
                documents.sparkSession.sparkContext.defaultParallelism,
                "z")
            .sortWithinPartitions("z"))


def phrase_lookup(documents: DataFrame) -> DataFrame:
    """Inverted-index READ path: find the corpus's most frequent
    3-word phrase (argmax df, ties -> term asc, so the probe is
    deterministic and self-contained) and return every document
    containing it.  The probe term is a 1-row broadcast against the
    (term, doc_id) pairs — the lookup never shuffles the corpus,
    which is the point of having the index.
    Output: doc_id, term."""
    pairs = (documents
             .select("doc_id", F.split("text", " ").alias("ws"))
             .select("doc_id", F.explode(F.expr(
                 "transform(sequence(0, size(ws) - 3), "
                 "i -> concat_ws(' ', slice(ws, i + 1, 3)))"))
                 .alias("term"))
             .distinct())
    df_ = pairs.groupBy("term").agg(F.count("*").alias("df"))
    top = (df_.orderBy(F.col("df").desc(), "term").limit(1)
           .select("term"))
    return pairs.join(F.broadcast(top), "term").select("doc_id", "term")


def phrase_lookup_oracle_sql() -> str:
    return """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), pairs AS (
          SELECT DISTINCT doc_id,
                 array_to_string(ws[g.i + 1 : g.i + 3], ' ') AS term
          FROM w, LATERAL (SELECT unnest(range(0,
               CAST(len(ws) - 2 AS BIGINT))) AS i) g
        ), df AS (
          SELECT term, count(*) AS df FROM pairs GROUP BY term
        ), top AS (
          SELECT term FROM df ORDER BY df DESC, term LIMIT 1
        )
        SELECT doc_id, term FROM pairs JOIN top USING (term)"""


# --- Bloom filter sketch ------------------------------------------------

BLOOM_WORDS = 16         # 16 x 32 = 512 bits; 32-bit words keep every
BLOOM_BITS = 32          # shift clear of the BIGINT sign bit in BOTH
BLOOM_HASHES = 3         # engines (DuckDB << and Spark shiftleft)


def _bloom_positions_expr(key_sql: str) -> list[str]:
    """k md5-slice hash positions in [0, 512) for a key expression —
    identical arithmetic in Spark SQL and DuckDB (instr/substring/md5
    are in the shared dialect subset)."""
    out = []
    for i in range(BLOOM_HASHES):
        digits = " + ".join(
            f"(instr('0123456789abcdef', substring(md5(concat("
            f"'{i}:', {key_sql})), {d + 1}, 1)) - 1)"
            f" * cast({16 ** (7 - d)} as bigint)"
            for d in range(8))
        out.append(f"(({digits}) % {BLOOM_WORDS * BLOOM_BITS})")
    return out


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """512-bit Bloom filter over the distinct keys of ``key_col`` as
    16 (word_idx, bits) rows — a mergeable sketch: bit_or partial
    aggregation means each executor folds its partition's keys into
    16 longs map-side and the shuffle moves 16 rows per partition.
    At 10^12 rows this (or Spark's native bloom join) is how a big
    probe side prunes against a big build side without shuffling
    either."""
    pos = _bloom_positions_expr("cast(k as string)")
    keys = df.select(F.col(key_col).alias("k")).distinct()
    hashed = keys.select(F.explode(F.array(
        *[F.expr(p).cast("long") for p in pos])).alias("h"))
    return (hashed
            .select((F.col("h") / BLOOM_BITS).cast("long")
                    .alias("word_idx"),
                    (F.col("h") % BLOOM_BITS).cast("int").alias("bit"))
            .groupBy("word_idx")
            .agg(F.bit_or(F.expr("shiftleft(cast(1 as bigint), bit)"))
                 .alias("bits")))


def bloom_probe_stats(build_df: DataFrame, build_key: str,
                      probe_df: DataFrame,
                      probe_key: str) -> DataFrame:
    """Probe every distinct ``probe_key`` against the Bloom filter of
    ``build_key`` and report (n_probed, n_candidates, n_members,
    n_false_positives).  The 16-row filter broadcasts; a candidate
    must hit all k positions; membership ground truth comes from a
    semi-join, so the sketch's false-positive rate is measured, not
    assumed.  No false negatives by construction (the test and the
    oracle both assert candidates >= members)."""
    bloom = bloom_build(build_df, build_key)
    pos = _bloom_positions_expr("cast(k as string)")
    probes = (probe_df.select(F.col(probe_key).alias("k")).distinct()
              .select("k", F.explode(F.array(
                  *[F.expr(p).cast("long") for p in pos])).alias("h"))
              .select("k",
                      (F.col("h") / BLOOM_BITS).cast("long")
                      .alias("word_idx"),
                      (F.col("h") % BLOOM_BITS).cast("int")
                      .alias("bit")))
    hits = (probes.join(F.broadcast(bloom), "word_idx")
            .where(F.expr("(shiftright(bits, bit) & 1) = 1"))
            .groupBy("k").agg(F.count("*").alias("n_hit"))
            .where(F.col("n_hit") == BLOOM_HASHES)
            .select("k"))
    # ONE aggregation job (r4 VERDICT task 6; was three driver
    # counts): flag each distinct probe key as candidate / member and
    # fold the stats with conditional sums.  The membership join
    # against the distinct build keys is fixture-tier GROUND TRUTH for
    # measuring the sketch's FP rate — the production probe path is
    # `hits` alone (broadcast bloom, no build-side join).
    cand = hits.withColumn("is_cand", F.lit(1))
    memb = (build_df.select(F.col(build_key).alias("k")).distinct()
            .withColumn("is_mem", F.lit(1)))
    flagged = (probe_df.select(F.col(probe_key).alias("k")).distinct()
               .join(cand, "k", "left")
               .join(memb, "k", "left")
               .select(F.coalesce("is_cand", F.lit(0)).alias("c"),
                       F.coalesce("is_mem", F.lit(0)).alias("m")))
    # coalesce: F.sum over zero rows is NULL — an empty probe set must
    # report 0s, matching the pre-r5 three-count contract (r5 ADVICE)
    return flagged.agg(
        F.count("*").cast("long").alias("n_probed"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long")
        .alias("n_candidates"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long")
        .alias("n_members"),
        F.coalesce(F.sum(F.col("c") * (1 - F.col("m"))), F.lit(0))
        .cast("long").alias("n_false_positives"))


def bloom_probe_stats_oracle_sql(build_table: str, build_key: str,
                                 probe_table: str,
                                 probe_key: str) -> str:
    pos = _bloom_positions_expr("cast(k as varchar)")
    arr = ", ".join(pos)
    return f"""
        WITH bkeys AS (
          SELECT DISTINCT {build_key} AS k FROM {build_table}
        ), bpos AS (
          SELECT CAST(u.h AS BIGINT) AS h
          FROM bkeys, LATERAL (SELECT unnest([{arr}]) AS h) u
        ), bloom AS (
          SELECT h // {BLOOM_BITS} AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(h % {BLOOM_BITS}
                        AS INT)) AS bits
          FROM bpos GROUP BY 1
        ), pkeys AS (
          SELECT DISTINCT {probe_key} AS k FROM {probe_table}
        ), ppos AS (
          SELECT k, CAST(u.h AS BIGINT) // {BLOOM_BITS} AS word_idx,
                 CAST(CAST(u.h AS BIGINT) % {BLOOM_BITS} AS INT)
                   AS bit
          FROM pkeys, LATERAL (SELECT unnest([{arr}]) AS h) u
        ), hits AS (
          SELECT p.k FROM ppos p JOIN bloom b USING (word_idx)
          WHERE (b.bits >> p.bit) & 1 = 1
          GROUP BY p.k HAVING count(*) = {BLOOM_HASHES}
        ), members AS (
          SELECT k FROM pkeys WHERE k IN (SELECT k FROM bkeys)
        )
        SELECT (SELECT count(*) FROM pkeys) AS n_probed,
               (SELECT count(*) FROM hits) AS n_candidates,
               (SELECT count(*) FROM members) AS n_members,
               (SELECT count(*) FROM hits)
                 - (SELECT count(*) FROM members)
                 AS n_false_positives"""


# --- HyperLogLog sketch -------------------------------------------------

HLL_BUCKETS = 64
HLL_ALPHA = 0.709      # alpha_64 from the published HLL constants


def _hll_rank_sql(tail_sql: str) -> str:
    """True bit-level HLL rank of a 32-bit hex tail, in the shared
    SQL dialect: 4 x (leading zero hex digits) + extra zero bits of
    the first non-zero digit + 1 (33 when the tail is all zeros)."""
    lz = f"length(regexp_extract({tail_sql}, '^(0*)', 1))"
    digit = (f"(instr('0123456789abcdef', "
             f"substring({tail_sql}, {lz} + 1, 1)) - 1)")
    extra = (f"CASE WHEN {digit} >= 8 THEN 0 "
             f"WHEN {digit} >= 4 THEN 1 "
             f"WHEN {digit} >= 2 THEN 2 ELSE 3 END")
    return (f"CASE WHEN {lz} >= 8 THEN 33 "
            f"ELSE {lz} * 4 + {extra} + 1 END")


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Cross-engine-exact HyperLogLog distinct estimate: bucket =
    first-8-hex of md5 mod 64; rank = leading-zero BITS of the next
    32 hash bits + 1 (bit-exact via hex arithmetic).  Every term
    2^-rank and the empty-bucket 1.0s are exact dyadic doubles whose
    sum is order-INDEPENDENT, so Spark and DuckDB agree bitwise and
    the estimate is oracle-checkable (Spark's native
    approx_count_distinct stays the rows-only production path).
    The sketch itself is one groupBy(bucket).max(rank) — mergeable,
    64 rows total whatever the input size; the published small-range
    (linear counting) correction applies below 2.5m.
    Output: m, n_present, hll_est (4dp).  The exact distinct count is
    deliberately NOT computed here — at 100 TB that full-shuffle
    distinct scan is exactly what the sketch exists to avoid; tests
    and the DuckDB oracle verify the estimate against ground truth at
    fixture scale instead (VERDICT r3 task 6)."""
    h8 = F.expr(f"substring(md5(cast({col} as string)), 1, 8)")
    bucket_expr = " + ".join(
        f"(instr('0123456789abcdef', substring(md5(cast({col} as "
        f"string)), {d + 1}, 1)) - 1) * cast({16 ** (7 - d)} as bigint)"
        for d in range(8))
    tail_sql = f"substring(md5(cast({col} as string)), 9, 8)"
    rank_sql = _hll_rank_sql(tail_sql)
    rows = df.select(
        (F.expr(f"({bucket_expr})") % HLL_BUCKETS).alias("bucket"),
        F.expr(rank_sql).cast("int").alias("rank"))
    buckets = rows.groupBy("bucket").agg(F.max("rank").alias("r"))
    agg = buckets.agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"))
    spark = df.sparkSession
    row = agg.collect()[0]
    import math

    m = HLL_BUCKETS
    n_present = int(row["n_present"])
    s = float(row["s"]) + (m - n_present) * 1.0
    est = HLL_ALPHA * m * m / s
    # published small-range correction: linear counting while the
    # raw estimate is under 2.5m and empty buckets remain
    if est <= 2.5 * m and n_present < m:
        est = m * math.log(m / float(m - n_present))
    est_q = math.floor(est * 10000 + 0.5) / 10000
    return spark.createDataFrame(
        [(m, n_present, est_q)],
        "m long, n_present long, hll_est double")


def hll_distinct_oracle_sql(table: str, col: str) -> str:
    bucket = " + ".join(
        f"(instr('0123456789abcdef', substring(md5(cast({col} as "
        f"varchar)), {d + 1}, 1)) - 1) * cast({16 ** (7 - d)} as bigint)"
        for d in range(8))
    return f"""
        WITH r AS (
          SELECT ({bucket}) % {HLL_BUCKETS} AS bucket,
                 {_hll_rank_sql(
                     f"substring(md5(cast({col} as varchar)), 9, 8)")}
                   AS rank
          FROM {table}
        ), b AS (
          SELECT bucket, max(rank) AS r FROM r GROUP BY bucket
        ), agg AS (
          SELECT count(*) AS n_present,
                 sum(power(2.0, -r)) AS s
          FROM b
        )
        , est AS (
          SELECT n_present,
                 {HLL_ALPHA} * {HLL_BUCKETS} * {HLL_BUCKETS}
                   / (s + ({HLL_BUCKETS} - n_present) * 1.0) AS raw
          FROM agg
        )
        SELECT CAST({HLL_BUCKETS} AS BIGINT) AS m,
               CAST(n_present AS BIGINT) AS n_present,
               floor((CASE WHEN raw <= 2.5 * {HLL_BUCKETS}
                            AND n_present < {HLL_BUCKETS}
                      THEN {HLL_BUCKETS} * ln({HLL_BUCKETS}
                           / CAST({HLL_BUCKETS} - n_present AS DOUBLE))
                      ELSE raw END) * 10000 + 0.5) / 10000 AS hll_est
        FROM est"""


# --- BM25 retrieval scoring (r6) -----------------------------------------

def bm25_topk(documents: DataFrame, k: int = 20,
              n_query_terms: int = 8) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene's non-negative idf variant)
    document ranking for a data-derived query: the ``n_query_terms``
    most frequent mid-band terms (2 <= df, df*4 <= N — above noise,
    below stopword grade), ranked (df desc, word).  The query being a
    deterministic function of the corpus keeps the key input-driven at
    every scale factor with no hardcoded vocabulary.

    Scale shape (100 TB story): (doc, word) tf counts are ONE shuffle
    with map-side combine; dl (doc length) and df both derive from tf
    with no second corpus scan; the query-term set (8 rows) and the
    corpus stats (1 row) come back as broadcasts, so scoring is a
    map-side semi-join of tf against 8 terms — only matching rows
    survive to the per-doc aggregation; the global top-k is
    TakeOrderedAndProject (no full sort).

    Engine parity: per-(doc, term) scores are rounded HALF-UP to
    integer micro-units BEFORE the per-doc sum, so the aggregation is
    order-independent bigint addition — a float sum's result would
    depend on reduction order and differ between engines at the ulp.
    Output: rank, doc_id, score_micro (bigint, BM25 * 1e6)."""
    # corpus size as a broadcast 1-row relation (r9): documents.count()
    # was a separate per-invocation driver action; riding it through
    # the (8-row) qterms relation keeps it out of the wide scans
    nrow = documents.agg(F.count("*").alias("n_docs"))
    w = _word_rows(documents)
    # (tf also feeds the broadcast qterms/stats subqueries, which
    # recompute the count pipeline independently — an r9
    # localCheckpoint attempt to share it measured SLOWER warm (0.82
    # vs 0.72 s): broadcast jobs overlap asynchronously, the eager
    # checkpoint serializes.)
    tf = (w.groupBy("doc_id", "word")
          .agg(F.count("*").alias("tf")))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.sum("dl").alias("tw"),
                   F.count("*").alias("nd"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    qterms = (dfreq
              .crossJoin(F.broadcast(nrow))
              .where((F.col("df") >= 2)
                     & (F.col("df") * 4 <= F.col("n_docs")))
              .orderBy(F.col("df").desc(), "word")
              .limit(n_query_terms))
    avgdl = F.col("tw").cast("double") / F.col("nd").cast("double")
    idf = F.log(F.lit(1.0)
                + ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(1.2) * (F.lit(0.25)
                             + F.lit(0.75)
                             * (F.col("dl").cast("double") / avgdl)))
    tfn = (F.col("tf") * F.lit(2.2)) / denom
    micro = F.floor((idf * tfn) * F.lit(1000000.0)
                    + F.lit(0.5)).cast("long")
    scored = (tf.join(F.broadcast(qterms), "word")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", micro.alias("micro")))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.sum("micro").alias("score_micro")))
    top = (per_doc.orderBy(F.col("score_micro").desc(), "doc_id")
           .limit(k))
    rw = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    return (top.withColumn("rank",
                           F.row_number().over(rw).cast("long"))
            .select("rank", "doc_id", "score_micro"))


def bm25_topk_oracle_sql(k: int = 20, n_query_terms: int = 8) -> str:
    """DuckDB oracle for bm25_topk — identical arithmetic, identical
    micro-unit rounding before the per-doc sum."""
    return f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), tf AS (
          SELECT doc_id, word, count(*) AS tf
          FROM w GROUP BY doc_id, word
        ), dl AS (
          SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
        ), stats AS (
          SELECT sum(dl) AS tw, count(*) AS nd FROM dl
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        dfreq AS (
          SELECT word, count(*) AS df FROM tf GROUP BY word
        ), qterms AS (
          SELECT word, df FROM dfreq CROSS JOIN n
          WHERE df >= 2 AND df * 4 <= n_docs
          ORDER BY df DESC, word LIMIT {n_query_terms}
        ), scored AS (
          SELECT tf.doc_id,
                 CAST(floor((ln(1.0 + ((n.n_docs - qterms.df) + 0.5)
                                 / (qterms.df + 0.5))
                      * ((tf.tf * 2.2)
                         / (tf.tf + 1.2 * (0.25 + 0.75
                             * (CAST(dl.dl AS DOUBLE)
                                / (CAST(stats.tw AS DOUBLE)
                                   / CAST(stats.nd AS DOUBLE)))))))
                      * 1000000.0 + 0.5) AS BIGINT) AS micro
          FROM tf
          JOIN qterms USING (word)
          JOIN dl USING (doc_id)
          CROSS JOIN stats CROSS JOIN n
        ), per_doc AS (
          SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
          FROM scored GROUP BY doc_id
        ), top AS (
          SELECT doc_id, score_micro FROM per_doc
          ORDER BY score_micro DESC, doc_id LIMIT {k}
        )
        SELECT CAST(row_number() OVER (ORDER BY score_micro DESC,
                                       doc_id) AS BIGINT) AS rank,
               doc_id, score_micro
        FROM top"""


# --- join-key skew profile (r6) ------------------------------------------

def skew_profile(events: DataFrame, key: str = "user_id",
                 k: int = 20) -> DataFrame:
    """Heavy-key diagnostic for a prospective join/aggregation key —
    the measurement you run BEFORE choosing a salting factor (the
    repo's ``salted_join`` consumes exactly this): per-key row counts,
    each heavy key's corpus share in ppm, and its ratio to the
    uniform-key average in percent.

    Scale shape: one count shuffle with map-side combine (the profile
    of a 10^12-row key column moves |distinct keys| rows, not data
    rows); the corpus totals are a 1-row broadcast; the top-k is
    TakeOrderedAndProject.  All outputs are exact integers (floor of
    double ratios of exact ints — identical IEEE ops both engines).
    Output: rank, <key>, cnt, share_ppm, ratio_pct."""
    counts = events.groupBy(key).agg(F.count("*").alias("cnt"))
    stats = counts.agg(F.sum("cnt").alias("total"),
                       F.count("*").alias("nk"))
    share_ppm = F.floor((F.col("cnt") * F.lit(1000000.0))
                        / F.col("total")).cast("long")
    ratio_pct = F.floor(((F.col("cnt") * F.col("nk")) * F.lit(100.0))
                        / F.col("total")).cast("long")
    top = (counts.crossJoin(F.broadcast(stats))
           .orderBy(F.col("cnt").desc(), key)
           .limit(k))
    rw = Window.orderBy(F.col("cnt").desc(), key)
    return (top.withColumn("rank",
                           F.row_number().over(rw).cast("long"))
            .select("rank", key, "cnt",
                    share_ppm.alias("share_ppm"),
                    ratio_pct.alias("ratio_pct")))


def skew_profile_oracle_sql(key: str = "user_id", k: int = 20,
                            table: str = "events") -> str:
    """DuckDB oracle for skew_profile."""
    return f"""
        WITH counts AS (
          SELECT {key}, count(*) AS cnt FROM {table} GROUP BY {key}
        ), stats AS (
          SELECT sum(cnt) AS total, count(*) AS nk FROM counts
        ), top AS (
          SELECT {key}, cnt, total, nk
          FROM counts CROSS JOIN stats
          ORDER BY cnt DESC, {key} LIMIT {k}
        )
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, {key})
                    AS BIGINT) AS rank,
               {key}, cnt,
               CAST(floor((cnt * 1000000.0) / total) AS BIGINT)
                 AS share_ppm,
               CAST(floor(((cnt * nk) * 100.0) / total) AS BIGINT)
                 AS ratio_pct
        FROM top"""
