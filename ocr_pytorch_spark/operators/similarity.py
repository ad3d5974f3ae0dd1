"""Similarity search over embedding columns (array<float>).

All cosine math is array-native (``functions.array_dot``: zip_with +
sequential float64 fold, whole-stage codegen) — a candidate pair moves
ONE row through the shuffle, never ``dim`` exploded component rows.

* ``cosine_topk`` — exact brute-force baseline: broadcast the (small)
  query set against every candidate row; one linear pass at any scale.
  Top-k selection is two-phase (per-partition prune, then global rank)
  so no single task ever sorts the full corpus.
* ``lsh_band_keys`` / ``lsh_cosine_topk`` — the scale path:
  sign-random-projection LSH with BANDED keys and Hamming<=1
  multi-probe.  ``n_planes`` planes split into ``bands`` bands of
  ``r = n_planes // bands`` sign bits; two vectors are candidates when
  any band key matches within Hamming distance 1 (probe side explodes
  1+r keys).  ``r`` is the bucket-granularity dial: keyspace per band
  is 2^r, so at 10^12 vectors you raise ``r`` (e.g. 20-24) to keep
  bucket population bounded; ``bands`` and multi-probe buy recall back.
  Defaults (32 planes, 4 bands of 8) give 256 buckets/band at demo
  scale and >=0.999 recall at real near-dup thresholds (cos >= 0.9).

Hyperplane weights are a pure function of (plane, component) via md5
hex digits — engine-portable, no stored model, embedded as literal
arrays so no per-row hashing (see ``functions.plane_weight``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ocr_pytorch_spark.functions import (array_dot, as_double_array,
                                         fan_out, quant4, weights_matrix)

# Shared defaults — the DuckDB oracles in __spark_entry__.py are
# generated from the same constants.
N_PLANES = 32
BANDS = 4
DIM = 64


def vectors_with_norm(embeddings: DataFrame) -> DataFrame:
    """(vec_id, vec: array<double>, nrm) — the verify-side dimension
    table.  At real scale this is materialized once (bucketed by
    vec_id) instead of recomputed per consumer.

    fan_out (r9): the array math here and in every consumer is
    higher-order-function expressions, which Spark evaluates
    INTERPRETED (no codegen) — per-row cost is high enough that scan
    parallelism is the wall.  A small local parquet arrives as ~4
    splits on a 32-core box, serializing the map-side compute 8x;
    fan_out repartitions ONLY under-partitioned inputs and is a no-op
    at real scale (thousands of splits)."""
    vec = as_double_array(F.col("embedding"))
    return (fan_out(embeddings).select("vec_id", vec.alias("vec"))
            .withColumn("nrm",
                        F.sqrt(array_dot(F.col("vec"), F.col("vec")))))


def _pair_cos(va, vb, na, nb):
    return quant4(array_dot(va, vb) / (na * nb))


def _two_phase_topk(cos: DataFrame, k: int) -> DataFrame:
    """Global top-k per q_id without a single-task full sort: prune to
    k within each input partition first (map-side), then rank the
    survivors.  The per-partition top-k is a superset of the global
    top-k under the same total order (cos desc, vec_id), so the result
    is exact and deterministic."""
    order = [F.col("cos").desc(), F.col("vec_id")]
    wp = Window.partitionBy("q_id", "part").orderBy(*order)
    wg = Window.partitionBy("q_id").orderBy(*order)
    return (cos.withColumn("part", F.spark_partition_id())
            .withColumn("prank", F.row_number().over(wp))
            .where(F.col("prank") <= k)
            .withColumn("rank", F.row_number().over(wg))
            .where(F.col("rank") <= k)
            .select("q_id", "vec_id", "cos", "rank"))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine for query vec_ids < n_queries.
    Deterministic tie-break on vec_id. Output: q_id, vec_id, cos, rank.
    """
    vt = vectors_with_norm(embeddings)
    q = (vt.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("vec").alias("qv"), F.col("nrm").alias("qn")))
    cos = (vt.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
           .select("q_id", "vec_id",
                   _pair_cos(F.col("qv"), F.col("vec"),
                             F.col("qn"), F.col("nrm")).alias("cos")))
    return _two_phase_topk(cos, k)


def projs_col(vec_col, n_planes: int = N_PLANES,
              dim: int = DIM):
    """All n_planes sign-projection dot products of one array<double>
    vector column as a single array expression (one 2D weight literal
    + one transform — a per-plane column fan-out makes Catalyst
    analysis/codegen the dominant cost at small scale)."""
    return F.transform(weights_matrix(n_planes, dim),
                       lambda wrow: array_dot(vec_col, wrow))


def band_structs_col(n_planes: int = N_PLANES, bands: int = BANDS):
    """array<struct<band_idx,bucket>> of banded sign keys from a
    ``projs`` column (r sign bits per band)."""
    r = n_planes // bands
    band_structs = []
    for b in range(bands):
        key = reduce(
            lambda acc, j: acc + F.when(
                F.col("projs")[b * r + j] > 0,
                F.lit(2 ** j)).otherwise(F.lit(0)),
            range(r), F.lit(0))
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"),
                     key.cast("int").alias("bucket")))
    return F.array(*band_structs)


def lsh_band_keys(embeddings: DataFrame, n_planes: int = N_PLANES,
                  bands: int = BANDS, dim: int = DIM) -> DataFrame:
    """(vec_id, band_idx, bucket): per-band sign-projection keys.
    Projections are ``bands * r`` literal-weight dot products per row —
    pure map-side codegen, one explode to band rows (skinny: 3 ints)."""
    vec = as_double_array(F.col("embedding"))
    # fan_out: the n_planes interpreted dot products per row need scan
    # parallelism on small local inputs (no-op at scale)
    df = fan_out(embeddings).select(
        "vec_id", projs_col(vec, n_planes, dim).alias("projs"))
    return (df
            .select("vec_id",
                    F.explode(band_structs_col(n_planes, bands))
                    .alias("bk"))
            .select("vec_id", "bk.band_idx", "bk.bucket"))


def probe_keys(keys: DataFrame, n_planes: int = N_PLANES,
               bands: int = BANDS) -> DataFrame:
    """Hamming<=1 multi-probe expansion of (vec_id, band_idx, bucket):
    1 + r probe keys per band row (the key itself plus each single-bit
    flip).  Probing multiplies lookups, not bucket sizes."""
    r = n_planes // bands
    probes = F.array(F.col("bucket"),
                     *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
                       for j in range(r)])
    return keys.select("vec_id", "band_idx",
                       F.explode(probes).alias("bucket"))


def cap_buckets(keys: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Optionally drop band buckets with more than ``bucket_cap``
    members — the hard bound that keeps one viral cluster from turning
    a band bucket quadratic.  Dropped buckets are observable via
    ``bucket_sizes`` (no silent truncation at scale: emit that table
    to a metrics sink)."""
    if bucket_cap is None:
        return keys
    w = Window.partitionBy("band_idx", "bucket")
    return (keys.withColumn("_n", F.count("*").over(w))
            .where(F.col("_n") <= bucket_cap).drop("_n"))


def bucket_sizes(keys: DataFrame) -> DataFrame:
    """(band_idx, bucket, n) — the skew/drop observability companion to
    cap_buckets."""
    return keys.groupBy("band_idx", "bucket").agg(
        F.count("*").alias("n"))


def _neg_cos_micro(va, vb, na, nb):
    """quant4-cosine as a NEGATED integer numerator (floor(cos * 1e4
    + 0.5)): two quant4 doubles order exactly as their integer
    numerators (k -> k/1e4 is monotone and injective at 4dp), so
    ascending (neg_micro, cell) struct order == the window's
    (quant4 cos DESC, cell ASC) — same values, same ties."""
    return -F.floor(array_dot(va, vb) / (na * nb) * 10000
                    + F.lit(0.5)).cast("long")


def _with_cells(vt: DataFrame, cents_src: DataFrame, n_centroids: int,
                n_assign: int, col: str = "cells") -> DataFrame:
    """Attach the IVF assignment MAP-SIDE: ``vt`` (vec_id, vec, nrm)
    gains a ``cells`` array of its ``n_assign`` nearest centroids —
    computed per ROW against a one-row broadcast of the centroid
    array, so the corpus is neither exploded to (vec x centroid) rows
    nor shuffled for a per-vec_id rank window (r9: the old
    crossJoin + row_number plan exchanged and sorted the whole corpus
    just to argmin 16 candidates per row)."""
    cents = (cents_src.where(F.col("vec_id") < n_centroids)
             .select(F.struct(
                 F.col("vec_id").alias("cell"),
                 F.col("vec").alias("cv"),
                 F.col("nrm").alias("cn")).alias("c")))
    carr = cents.agg(F.collect_list("c").alias("_cents"))
    ranked = F.array_sort(F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _neg_cos_micro(F.col("vec"), c["cv"],
                           F.col("nrm"), c["cn"]).alias("nc"),
            c["cell"].alias("cell"))))
    cells = F.transform(F.slice(ranked, 1, n_assign),
                        lambda s: s["cell"])
    return (vt.crossJoin(F.broadcast(carr))
            .withColumn(col, cells).drop("_cents"))


def ivf_cells(embeddings: DataFrame,
              n_centroids: int = 16,
              n_assign: int = 1) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    ``n_assign`` nearest-by-cosine centroids (1 = classic hard
    assignment; 2+ = the multi-assignment used by the near-dup
    precluster so a pair sitting on a cell boundary still shares a
    cell).  Centroids here are a deterministic sample
    (vec_id < n_centroids) — a real deployment trains k-means
    offline and broadcasts the trained codebook; the assignment plan
    (broadcast the k centroids against one linear scan with a
    per-row argmin — r9: map-side array sort/slice, no corpus
    exchange, no rank window) is identical either way and is the
    part that must scale.  Output: vec_id, cell (n_assign rows per
    vec)."""
    vt = vectors_with_norm(embeddings)
    wc = _with_cells(vt, vt, n_centroids, n_assign)
    return wc.select("vec_id", F.explode("cells").alias("cell"))


def ivf_cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                    k: int = 10, n_centroids: int = 16,
                    n_probe: int = 2) -> DataFrame:
    """IVF ANN top-k: each query probes its n_probe nearest cells and
    ranks exact cosine within them — the candidate set is
    ~n_probe/n_centroids of the corpus, cut by the cell equi-join (the
    standard IVF trade; raise n_centroids with corpus size so cells
    stay bounded).  Output: q_id, vec_id, cos, rank."""
    vt = vectors_with_norm(embeddings)
    cells = ivf_cells(embeddings, n_centroids)
    # query-side probe selection is the same map-side argmin (r9) —
    # no rank window, no exchange of the (tiny) query frame
    qwc = _with_cells(vt.where(F.col("vec_id") < n_queries), vt,
                      n_centroids, n_probe)
    probed = qwc.select(F.col("vec_id").alias("q_id"),
                        F.explode("cells").alias("cell"))
    q = (vt.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("vec").alias("qv"), F.col("nrm").alias("qn")))
    cand = (cells.join(F.broadcast(probed), "cell")
            .where(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "vec_id"))
    cos = (cand.join(vt, "vec_id").join(F.broadcast(
        q.select("q_id", "qv", "qn")), "q_id")
        .select("q_id", "vec_id",
                _pair_cos(F.col("qv"), F.col("vec"),
                          F.col("qn"), F.col("nrm")).alias("cos")))
    return _two_phase_topk(cos, k)


def lsh_cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                    k: int = 10, n_planes: int = N_PLANES,
                    bands: int = BANDS, dim: int = DIM,
                    bucket_cap: int | None = None) -> DataFrame:
    """ANN top-k: exact cosine restricted to banded multi-probe LSH
    candidates (query side probes Hamming<=1 per band).
    Output: q_id, vec_id, cos, rank (rank within candidate set)."""
    keys = cap_buckets(lsh_band_keys(embeddings, n_planes, bands, dim),
                       bucket_cap)
    # one exchange on the join key -> the projection lineage runs once
    # and both the query-probe side and the join reuse it.  (An r9
    # variant derived the probe keys from the filtered n_queries rows
    # and dropped this repartition — consistently SLOWER, 2.8 vs
    # 1.9 s warm: the materialized exchange is what lets the probe
    # subquery and the join share the projection work.)
    keys = keys.repartition("band_idx", "bucket")
    qprobe = (probe_keys(keys.where(F.col("vec_id") < n_queries),
                         n_planes, bands)
              .withColumnRenamed("vec_id", "q_id"))
    cand = (F.broadcast(qprobe).join(keys, ["band_idx", "bucket"])
            .where(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "vec_id").distinct())
    vt = vectors_with_norm(embeddings)
    # r9: only the n_queries query vectors broadcast — the old plan
    # broadcast the ENTIRE vector table as the q side even though
    # cand only ever carries q_id < n_queries (at corpus scale that
    # is a broadcast of the corpus; here it was 1600x the rows
    # needed).  Join result is identical.
    q = (vt.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("vec").alias("qv"), F.col("nrm").alias("qn")))
    cos = (cand.join(vt, "vec_id").join(F.broadcast(q), "q_id")
           .select("q_id", "vec_id",
                   _pair_cos(F.col("qv"), F.col("vec"),
                             F.col("qn"), F.col("nrm")).alias("cos")))
    return _two_phase_topk(cos, k)


def semantic_dedup(embeddings: DataFrame, n_centroids: int = 16,
                   tau: float = 0.9) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the corpus (IVF cells — the
    paper's k-means stage), then WITHIN each cell drop every item that
    has cosine >= tau with a lower-id item; the lowest id of each
    duplicate neighborhood survives.  Output: (vec_id, cell,
    keep boolean).

    Scale shape: the only pairwise work is the within-cell self-join —
    one ~16-byte row per candidate pair, never dim-exploded — and cell
    population is the dial: raise n_centroids with corpus size (the
    paper uses 50k clusters at 10^9 docs) so cells stay bounded and
    the join stays quadratic-in-cell, linear-in-corpus.  The centroid
    assignment is one broadcast scan (ivf_cells); nothing else
    shuffles the corpus more than once.
    """
    vt = vectors_with_norm(embeddings)
    # r9: the assignment is computed MAP-SIDE per row (_with_cells —
    # no crossJoin row blow-up, no rank window, no vt x cells join),
    # and the (vec, nrm, cell) frame is localCheckpoint-materialized
    # ONCE.  The checkpoint is load-bearing beyond sharing across the
    # three consumers (both self-join sides + the final keep join):
    # higher-order-function expressions are INTERPRETED (never
    # codegen'd), and the optimizer's constraint inference copies
    # join-key/filter isnotnull() predicates — with an un-truncated
    # lineage those predicates embed the whole 16-centroid argmin and
    # the norm dot product, re-evaluating them several times per row
    # (measured 9.2s vs 2.4s at the bench tier).  Checkpoint blocks
    # are reclaimed by the ContextCleaner once the frame is
    # unreferenced (same rationale as r8's checkpoint of the old
    # shuffle-produced assignment).
    vc = (_with_cells(vt, vt, n_centroids, 1)
          .select("vec_id", "vec", "nrm",
                  F.element_at(F.col("cells"), 1).alias("cell"))
          .localCheckpoint())
    hi = vc.select(F.col("vec_id").alias("id_hi"),
                   F.col("vec").alias("vh"), F.col("nrm").alias("nh"),
                   "cell")
    lo = vc.select(F.col("vec_id").alias("id_lo"),
                   F.col("vec").alias("vl"), F.col("nrm").alias("nl"),
                   "cell")
    dropped = (hi.join(lo, "cell")
               .where(F.col("id_lo") < F.col("id_hi"))
               .where(_pair_cos(F.col("vh"), F.col("vl"),
                                F.col("nh"), F.col("nl"))
                      >= F.lit(tau))
               .select(F.col("id_hi").alias("vec_id"))
               .distinct())
    return (vc.select("vec_id", "cell")
            .join(dropped.withColumn("dropped", F.lit(1)),
                  "vec_id", "left")
            .select("vec_id", "cell",
                    F.col("dropped").isNull().alias("keep")))


# --- product quantization (r8) ------------------------------------------

PQ_M = 8        # subspaces
PQ_KS = 16      # codebook entries per subspace


def _pq_subdist_micro(vec_col, cent_col, m: int, sub: int):
    """Array of m per-subspace squared-L2 distances between two
    dim-length vectors, each quantized to an order-independent
    micro-unit BIGINT (floor(d2 * 1e4 + 0.5)) — integer distances make
    every downstream argmin/sum reproducible across engines
    regardless of float summation order."""
    def d2(j):
        a = F.slice(vec_col, j * sub + 1, sub)
        b = F.slice(cent_col, j * sub + 1, sub)
        val = (array_dot(a, a) - 2 * array_dot(a, b)
               + array_dot(b, b))
        return F.floor(val * 10000 + F.lit(0.5)).cast("long")
    return F.array(*[d2(j) for j in range(m)])


def pq_codes(embeddings: DataFrame, m: int = PQ_M, ks: int = PQ_KS,
             dim: int = DIM) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m``
    subvectors of dim/m components and store, per subspace, the id of
    the nearest (squared-L2) of ``ks`` codebook entries — the memory
    dial for ANN at corpus scale: 10^12 float32x64 vectors are 256 TB,
    their m=8 x 4-bit PQ codes are 4 TB and fit a serving tier.
    Codebook entries are the deterministic sample vec_id < ks (a real
    deployment k-means-trains per-subspace codebooks offline and
    broadcasts them — the assignment plan, one broadcast scan with
    per-row integer argmin, is identical and is the part that must
    scale).

    Engine parity: per-subspace distances are micro-unit BIGINTs and
    the argmin-with-lowest-code-tiebreak is the single integer
    MIN(du * ks + code) — no float compare anywhere.
    Output: vec_id, c0..c{m-1} (int codes)."""
    sub = dim // m
    vec = as_double_array(F.col("embedding"))
    vt = embeddings.select("vec_id", vec.alias("vec"))

    def _subs(col):
        # the m subvectors as one array-of-arrays column
        return F.array(*[F.slice(col, j * sub + 1, sub)
                         for j in range(m)])

    def _self_dots(subs_col):
        # per-subspace squared norms from the pre-split subvectors
        return F.transform(subs_col, lambda s: array_dot(s, s))

    carr = (vt.where(F.col("vec_id") < ks)
            .select(F.col("vec_id").cast("int").alias("code"),
                    _subs(F.col("vec")).alias("csubs"))
            .select(F.struct(
                "code", "csubs",
                _self_dots(F.col("csubs")).alias("bb")).alias("c"))
            .agg(F.collect_list("c").alias("_cb")))

    # r9: the per-subspace argmin runs MAP-SIDE against a one-row
    # broadcast of the codebook array — the old crossJoin exploded the
    # corpus x ks and a groupBy re-collapsed it (one full exchange)
    # just to take a 16-way integer min per row.  Same integers, same
    # single-key tiebreak min(du * ks + code).  The d2 expansion
    # aa - 2ab + bb hoists both self-dot terms (aa once per ROW, bb
    # once per CENTROID inside the broadcast — interpreted dots per
    # row drop 3·m·ks -> m·ks + m, 384 -> 136 at the defaults), and
    # the subvector SLICES are pre-split once per row / per centroid
    # instead of re-sliced in every inner-loop distance (m·ks x 2
    # array copies -> m).  Operand values and operation order are
    # identical throughout.  fan_out: interpreted per-row distance
    # math needs scan parallelism on small local inputs (no-op at
    # scale).
    base = (fan_out(vt)
            .select("vec_id", _subs(F.col("vec")).alias("_subs"))
            .select("vec_id", "_subs",
                    _self_dots(F.col("_subs")).alias("_aa")))

    def _enc(j: int):
        def keyed(c):
            val = (F.col("_aa")[j]
                   - 2 * array_dot(F.col("_subs")[j], c["csubs"][j])
                   + c["bb"][j])
            du = F.floor(val * 10000 + F.lit(0.5)).cast("long")
            return du * ks + c["code"]
        return F.array_min(F.transform(F.col("_cb"), keyed))

    return (base.crossJoin(F.broadcast(carr))
            .select("vec_id",
                    *[(_enc(j) % ks).cast("int").alias(f"c{j}")
                      for j in range(m)]))


def pq_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
            m: int = PQ_M, ks: int = PQ_KS,
            dim: int = DIM, rerank: int = 8) -> DataFrame:
    """PQ ANN top-k: brute-force ADC shortlist, then exact rerank.
    (NOT IVFADC: the ADC stage scans the FULL codes table per query
    batch — the coarse ``ivf_cells`` pruning stage is not composed in
    front of it yet, so at 10^12 codes this is the diagnostic
    brute-ADC path, not the serving plan; r8 VERDICT task 2 tracks
    the composition as new-oracle-key work.)  Each query precomputes
    its m x ks distance table to the codebook (micro-unit BIGINTs); a
    candidate's approximate distance is the integer sum of m table
    lookups by its stored codes — no original vectors are touched in
    the scan, which is the whole point at 10^12 vectors (the 8-byte
    codes tier fits in memory, the 256-byte float tier does not).
    The ``k * rerank`` ADC shortlist then reads ORIGINAL vectors for
    just those rows and ranks them by exact squared L2 (micro-unit
    BIGINT), recovering the recall the coarse 4-bit codes lose
    (measured on the 500-vector sf0.01 tier: recall@10 0.34 ADC-only,
    0.56 with a x4 refine shortlist, 0.80 at the shipped x8 — still
    only 80 float reads per query; raise ks toward the standard 256
    for production recall on real clustered embeddings).

    Scale shape: the distance table is n_queries x m x ks tiny rows
    from one broadcast of the codebook; scoring is ONE linear scan of
    the codes table against the broadcast tables (zip_with lookup +
    integer aggregate, pure codegen); the shortlist is the two-phase
    per-partition prune, so the expensive float reads are k * rerank
    rows per query, never the corpus.  Output: q_id, vec_id, d2u
    (exact squared-L2 micro-units), rank — deterministic
    (d2u, vec_id) order."""
    sub = dim // m
    vec = as_double_array(F.col("embedding"))
    vt = embeddings.select("vec_id", vec.alias("vec"))
    cents = (vt.where(F.col("vec_id") < ks)
             .select(F.col("vec_id").cast("int").alias("code"),
                     F.col("vec").alias("cvec")))
    q = (vt.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("vec").alias("qv")))
    qd = (q.crossJoin(F.broadcast(cents))
          .select("q_id", "code",
                  _pq_subdist_micro(F.col("qv"), F.col("cvec"),
                                    m, sub).alias("du")))
    # (q_id, dtab: m x ks bigint matrix): ONE groupBy collects the ks
    # (code, du-array) rows per query, then a pure transform
    # transposes to dtab[j][code] — no explode, no second exchange.
    # (An r9 experiment built dtab map-side against a one-row
    # codebook broadcast instead: execution was a wash — the relation
    # is n_queries x ks tiny rows — and the m x ks expression fan-out
    # cost ~3.5s of per-invocation DataFrame CONSTRUCTION, so the
    # groupBy form stays.)
    cd = F.array_sort(F.collect_list(F.struct("code", "du")))
    dtab = (qd.groupBy("q_id").agg(cd.alias("cd"))
            .select("q_id",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda j: F.transform(
                            F.col("cd"), lambda x: x["du"][j]))
                    .alias("dtab")))
    codes = pq_codes(embeddings, m, ks, dim).select(
        "vec_id", F.array(*[F.col(f"c{j}")
                            for j in range(m)]).alias("codes"))
    scored = (codes.crossJoin(F.broadcast(dtab))
              .where(F.col("q_id") != F.col("vec_id"))
              .select("q_id", "vec_id",
                      F.aggregate(
                          F.zip_with("codes", "dtab",
                                     lambda c, d: F.element_at(d, c + 1)),
                          F.lit(0).cast("long"),
                          lambda acc, x: acc + x).alias("adist")))
    n_short = k * rerank
    order = [F.col("adist").asc(), F.col("vec_id")]
    wp = Window.partitionBy("q_id", "part").orderBy(*order)
    wg = Window.partitionBy("q_id").orderBy(*order)
    short = (scored.withColumn("part", F.spark_partition_id())
             .withColumn("prank", F.row_number().over(wp))
             .where(F.col("prank") <= n_short)
             .withColumn("srank", F.row_number().over(wg))
             .where(F.col("srank") <= n_short)
             .select("q_id", "vec_id"))
    # refine tier: exact squared L2 for the shortlist only, via dots
    # (the engine-parity construction), quantized to integer micro-units
    d2 = (array_dot(F.col("qv"), F.col("qv"))
          - 2 * array_dot(F.col("qv"), F.col("vec"))
          + array_dot(F.col("vec"), F.col("vec")))
    exact = (short.join(vt, "vec_id")
             .join(F.broadcast(q), "q_id")
             .select("q_id", "vec_id",
                     F.floor(d2 * 10000 + F.lit(0.5)).cast("long")
                     .alias("d2u")))
    wr = Window.partitionBy("q_id").orderBy(F.col("d2u").asc(),
                                            F.col("vec_id"))
    return (exact.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= k)
            .select("q_id", "vec_id", "d2u", "rank"))
