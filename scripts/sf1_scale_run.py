"""sf1-tier scale evidence (r4 VERDICT task 3): the flagship OCR
extraction + the dedup family at 10x the per-round driver tier, with
HEAVIER skew than the stock generator — a hot-ref whale: every media
span of 25% of documents is remapped to ONE media_ref, so a quarter of
the corpus fans in on a single image.  This is the closest in-sandbox
proxy for "would the plan survive 100x": the whale proves the
broadcast-semi-join + distinct-ref design (each image OCR'd once, no
per-doc refetch) and the doc_id-hash bucketing proves no lineage
bucket inherits the media skew.

Outputs one JSON line (also written to BENCH/SF1.json), including a
straggler analysis (max/median OCR-partition wall from the _metrics
table the extraction job commits) and a resume-idempotency leg:
4 buckets' lineage commits are forgotten and the job re-run with
resume=True — only those buckets may reprocess and span parity must
still hold.

    python scripts/sf1_scale_run.py            # full run (~15 min)
    SPARK_GRAFT_SF1_DOCS=1200 python ...       # smoke tier
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SF1_DOCS", "12000"))
WHALE_EVERY = 4          # docs with idx % 4 == 0 -> all media on whale
WHALE_REF = "img-hot-0000"
FIXTURE_DIR = os.environ.get("SPARK_GRAFT_SF1_FIXTURE",
                             f"/tmp/ocr_sf1_fixture_{N_DOCS}")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEDUP_SCALE = int(os.environ.get("SPARK_GRAFT_SF1_DEDUP_SCALE", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEDUP_KEYS = ["dedup_exact", "dedup_lines", "dedup_minhash_lsh",
              "dedup_simhash", "dedup_ngram_jaccard",
              "dedup_embedding_cosine", "dedup_components"]


N_PAGES = int(os.environ.get("SPARK_GRAFT_SF1_PAGES", "3000000"))
WEB_KEYS = ["url_canonical_dedup", "domain_doc_cap", "html_outlinks",
            "bm25_topk"]

ING_DOCS = int(os.environ.get("SPARK_GRAFT_SF1_ING_DOCS", "400000"))
ING_CAP = int(os.environ.get("SPARK_GRAFT_SF1_ING_CAP", "64"))


def _task_walls(spark, df):
    """Per-task wall_ms for the stage that PRODUCES df's rows: pull
    every row through an iterator timer per partition.  Because a
    window operator must consume its whole partition before emitting
    the first row, the pull time includes the sort — this measures the
    window stage's task walls for exactly the plan under test (plus a
    shared per-row Python-crossing cost, identical across variants)."""
    from ocr_pytorch_spark.operators.extract import ocr_timing_accumulator

    acc = ocr_timing_accumulator(spark)

    def f(pid, it):
        t0 = time.time()
        n = 0
        for _ in it:
            n += 1
        acc.add([(pid, n, (time.time() - t0) * 1000.0)])
        yield n

    df.rdd.mapPartitionsWithIndex(f).count()
    walls = sorted(w for _, _, w in acc.value)
    rows = sorted(n for _, n, _ in acc.value)
    med = walls[len(walls) // 2] if walls else 0.0
    rmed = rows[len(rows) // 2] if rows else 0
    return {"tasks": len(walls), "median_ms": round(med, 1),
            "max_ms": round(walls[-1], 1) if walls else 0.0,
            "max_over_median": round(walls[-1] / med, 2) if med else 0.0,
            # rows per task: the noise-free load-balance evidence —
            # wall ratios on sub-100ms tasks are host-scheduler noise
            "rows_median": rmed, "rows_max": rows[-1] if rows else 0,
            "rows_max_over_median": round(rows[-1] / rmed, 2)
            if rmed else 0.0}


def _web_tier(spark, qs, ddir) -> dict:
    """r6 VERDICT task 2: sf1 evidence for the r6 web-scale family.

    (a) warm walls for the four web keys at the 10x documents tier;
    (b) a hot-domain whale crawl — ONE domain holding 30% of N_PAGES
        pages (the power-law head the operators exist for) — driving
        the per-domain cap three ways on identical input:
          * naive_stall: single row_number window with Spark's
            WindowGroupLimit map-side prune disabled
            (windowGroupLimitThreshold=-1) — the classic pre-3.5
            formulation whose whale reducer sorts 30% of the corpus;
          * naive_grouplimit: the same window with the optimizer on
            (map-side prune bounds the reducer at maps*k rows/key);
          * salted: the shipped two-phase domain_doc_cap, n_salts
            derived from the skew_profile diagnostic.
        Each with end-to-end wall + per-task wall max/median on the
        window stage, plus a pair-set equality check that all three
        return the same global top-k."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bench import _force
    from ocr_pytorch_spark.operators.indexing import skew_profile
    from ocr_pytorch_spark.operators.web import domain_doc_cap

    # --- (a) web keys at the 10x tier -------------------------------
    key_secs = {}
    for k in WEB_KEYS:
        _force(qs[k](spark, ddir))  # warm
        t0 = time.time()
        _force(qs[k](spark, ddir))
        key_secs[k] = round(time.time() - t0, 3)

    # --- (b) hot-domain whale ---------------------------------------
    n_domains = 2000
    topk = 10
    pages = (spark.range(N_PAGES).select(
        F.when(F.col("id") % 10 < 3, F.lit("whale.example.com"))
        .otherwise(F.concat(F.lit("site-"),
                            F.pmod(F.xxhash64("id"),
                                   F.lit(n_domains)).cast("string")))
        .alias("source"),
        F.concat(F.lit("page-"), F.col("id")).alias("doc_id"),
        (F.lit(200) + F.pmod(F.xxhash64("id", F.lit(1)),
                             F.lit(4000))).cast("int").alias("n_chars")))

    # the pre-salting diagnostic the repo ships: measure the skew,
    # then size the salt.  Two constraints: (a) the hot key's largest
    # salt bucket <= about half a uniform reducer share (2 buckets per
    # share), and (b) n_salts >= 4x the reducer count — with fewer
    # groups than ~4P, balls-into-bins collisions concentrate several
    # whale buckets on one reducer (measured: n_salts=20 over P=32 put
    # 3 whale buckets = 201k rows on one reducer, ratio 2.9; 4P spreads
    # the whale's mass over every reducer)
    prof = skew_profile(pages, key="source", k=3).collect()
    total = N_PAGES
    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    top_cnt = int(prof[0]["cnt"])
    n_salts = max(4 * p_shuffle,
                  -(-2 * top_cnt * p_shuffle // total))  # ceil

    order = [F.desc("n_chars"), F.asc("doc_id")]

    def naive():
        w = Window.partitionBy("source").orderBy(*order)
        return (pages.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= topk))

    def salted_phase1():
        # mirrors operators/web.domain_doc_cap phase 1 (the
        # skew-bearing stage) for task-wall instrumentation; the
        # end-to-end wall below runs the shipped operator itself
        w1 = Window.partitionBy("source", "salt").orderBy(*order)
        return (pages.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)))
            .withColumn("rn1", F.row_number().over(w1))
            .filter(F.col("rn1") <= topk))

    gl_conf = "spark.sql.optimizer.windowGroupLimitThreshold"
    gl_saved = spark.conf.get(gl_conf)

    def reducer_rows(*cols):
        # EXACT per-reducer input volume for a shuffle keyed on cols:
        # replicate HashPartitioning with pmod(hash(keys), P) (same
        # Murmur3 the exchange uses) and sum rows per partition —
        # the noise-free structural straggler number
        per = (pages.groupBy(
            F.pmod(F.hash(*cols), F.lit(p_shuffle)).alias("part"))
            .agg(F.count("*").alias("n"))
            .orderBy("n").collect())
        ns = [int(r["n"]) for r in per]
        med = ns[len(ns) // 2]
        return {"reducers": len(ns), "rows_median": med,
                "rows_max": ns[-1],
                "rows_max_over_median": round(ns[-1] / med, 2)}

    out = {"n_pages": N_PAGES, "n_domains": n_domains + 1, "k": topk,
           "whale_share_pct": round(100.0 * top_cnt / total, 1),
           "n_salts": int(n_salts), "shuffle_partitions": p_shuffle,
           "web_key_secs_10x": key_secs,
           "reducer_input_rows": {
               "naive_by_domain": reducer_rows(F.col("source")),
               "salted_by_domain_salt": reducer_rows(
                   F.col("source"),
                   F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)))},
           "variants": {}}

    def measure(label, thunk, stage_thunk):
        _force(thunk())  # warm
        t0 = time.time()
        _force(thunk())
        wall = time.time() - t0
        out["variants"][label] = {
            "wall_sec": round(wall, 2),
            "window_stage_task_walls": _task_walls(spark,
                                                   stage_thunk())}

    try:
        spark.conf.set(gl_conf, "-1")
        measure("naive_stall", naive, naive)
        # salting ALONE (map-side prune off, as on pre-3.5 engines):
        # the whale spreads over n_salts reducers, so even with every
        # row shuffled the window tasks stay near-uniform — this is
        # the variant whose task-wall max/median the <=1.5 salting
        # claim is about (the grouplimit variants' tasks are too small
        # for wall ratios to beat host-scheduler noise)
        measure("salted_stall", salted_phase1, salted_phase1)
        spark.conf.set(gl_conf, gl_saved)
        measure("naive_grouplimit", naive, naive)
        measure("salted",
                lambda: domain_doc_cap(pages, key="source", k=topk,
                                       n_salts=n_salts),
                salted_phase1)
    finally:
        spark.conf.set(gl_conf, gl_saved)

    # all three formulations must return the same global top-k set
    a = naive().select("source", "doc_id")
    b = (domain_doc_cap(pages, key="source", k=topk, n_salts=n_salts)
         .select("source", "doc_id"))
    out["salted_equals_naive"] = (
        a.exceptAll(b).count() + b.exceptAll(a).count()) == 0
    return out


def _ingest_tier(spark, qs, ddir) -> dict:
    """r7 VERDICT task 5: sf1 evidence for the r7 ingest family.

    (a) warm walls for dsir_topk / corpus_overlap_minhash at the 10x
        documents tier;
    (b) dedup_incremental at a realistic ~100:1 history:batch ratio
        (history_frac_hex dialled to 99% of md5 space) over ING_DOCS
        synthetic docs with ONE viral text duplicated across ~0.5% of
        the corpus — four band buckets each holding every viral doc,
        the hot-bucket failure the cap exists for — plus 2-member
        "quiet" duplicate clusters standing in for genuine daily
        near-dups.  Measured, uncapped vs capped (the r8 broadcast
        anti-join of oversized buckets):
          * EXACT reducer-input rows for the (band_idx, key) history
            index shuffle — the structural straggler number, same
            method as the web leg;
          * end-to-end walls;
          * output pairs (the uncapped viral batch x history
            cross-product vs the capped bounded set), with the
            invariant that capping drops ONLY viral pairs (quiet-pair
            sets identical)."""
    from pyspark.sql import functions as F

    from bench import _force
    from ocr_pytorch_spark.operators.dedup import (_minhash_band_rows,
                                                   incremental_neardup)

    # --- (a) ingest keys at the 10x tier ------------------------------
    key_secs = {}
    for k in ("dsir_topk", "corpus_overlap_minhash"):
        _force(qs[k](spark, ddir))  # warm
        t0 = time.time()
        _force(qs[k](spark, ddir))
        key_secs[k] = round(time.time() - t0, 3)

    # --- (b) incremental near-dup with a hot band bucket --------------
    n_docs = ING_DOCS
    # the whale: 5% of the corpus shares ONE text (cf. the web leg's
    # 30% whale domain) — big enough that its 4 band buckets rival a
    # uniform reducer share, so the uncapped straggler is structural,
    # not noise
    viral_n = max(200, n_docs // 20)
    quiet_n = max(200, n_docs // 200)        # 2-member quiet clusters
    cut = int(0.99 * 16 ** 8)                # history:batch ~ 99:1
    viral_text = " ".join(f"viral{j}" for j in range(12))
    quiet_c = ((F.col("id") - viral_n) / 2).cast("long")
    quiet_text = F.concat_ws(" ", *[
        F.concat(F.lit(f"qt{j}c"), quiet_c.cast("string"))
        for j in range(12)])
    uniq_text = F.concat_ws(" ", *[
        F.concat(F.lit("t"),
                 F.pmod(F.xxhash64("id", F.lit(j)),
                        F.lit(1 << 40)).cast("string"))
        for j in range(12)])
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < viral_n, F.lit(viral_text))
        .when(F.col("id") < viral_n + 2 * quiet_n, quiet_text)
        .otherwise(uniq_text).alias("text"))
    docs = docs.localCheckpoint()            # fixture, not plan-under-test

    is_hist = (F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") < cut)
    n_hist = docs.where(is_hist).count()
    n_batch = n_docs - n_hist

    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    stacked = _minhash_band_rows(docs, 8, 4).withColumn("ih", is_hist)
    hist = stacked.where(F.col("ih"))
    sizes = hist.groupBy("band_idx", "key").agg(
        F.count("*").alias("n"))
    oversized = sizes.where(F.col("n") > ING_CAP) \
        .select("band_idx", "key")
    hist_capped = hist.join(F.broadcast(oversized),
                            ["band_idx", "key"], "left_anti")

    def reducer_rows(idx) -> dict:
        # replicate HashPartitioning with pmod(hash(keys), P) — the
        # exact per-reducer input volume of the candidate join's
        # history side (same method as the web leg)
        per = (idx.groupBy(
            F.pmod(F.hash("band_idx", "key"), F.lit(p_shuffle))
            .alias("part"))
            .agg(F.count("*").alias("n")).orderBy("n").collect())
        ns = [int(r["n"]) for r in per]
        med = ns[len(ns) // 2]
        return {"reducers": len(ns), "rows_median": med,
                "rows_max": ns[-1],
                "rows_max_over_median": round(ns[-1] / med, 2)}

    out = {"n_docs": n_docs, "history_rows": n_hist,
           "batch_rows": n_batch,
           "history_to_batch": round(n_hist / max(n_batch, 1), 1),
           "viral_docs": viral_n, "bucket_cap": ING_CAP,
           "n_oversized_buckets": oversized.count(),
           "ingest_key_secs_10x": key_secs,
           "reducer_input_rows": {
               "uncapped": reducer_rows(hist),
               "capped": reducer_rows(hist_capped)},
           "variants": {}}

    pair_sets = {}
    for label, cap in (("uncapped", None), ("capped", ING_CAP)):
        thunk = lambda: incremental_neardup(  # noqa: E731
            docs, history_frac_hex=cut, bucket_cap=cap)
        _force(thunk())  # warm
        t0 = time.time()
        n_pairs = thunk().count()
        out["variants"][label] = {
            "wall_sec": round(time.time() - t0, 2),
            "output_pairs": n_pairs}
        pair_sets[label] = thunk().select("doc_id", "dup_of")

    # capping must drop ONLY viral pairs: quiet/unique pair sets equal
    nonviral = (F.col("doc_id") >= viral_n) | (F.col("dup_of") >= viral_n)
    a = pair_sets["uncapped"].where(nonviral)
    b = pair_sets["capped"].where(nonviral)
    out["capped_keeps_all_nonviral_pairs"] = (
        a.exceptAll(b).count() + b.exceptAll(a).count()) == 0
    out["capped_viral_pairs"] = (
        pair_sets["capped"].where(~nonviral).count())
    return out


def _whale_docs():
    from ocr_pytorch_spark import datagen

    docs = datagen.gen_documents(N_DOCS)
    n_remapped = 0
    for i, d in enumerate(docs):
        if i % WHALE_EVERY == 0:
            for s in d["spans"]:
                if s["kind"] == "media":
                    s["media_ref"] = WHALE_REF
                    n_remapped += 1
    return docs, n_remapped


def ensure_fixture() -> int:
    from ocr_pytorch_spark import datagen

    marker = os.path.join(FIXTURE_DIR, ".ready")
    if os.path.exists(marker):
        return int(open(marker).read())
    docs, n_remapped = _whale_docs()
    datagen.write_fixture(FIXTURE_DIR, N_DOCS, docs=docs)
    open(marker, "w").write(str(n_remapped))
    return n_remapped


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from bench import _force, _scaled_dir
    from ocr_pytorch_spark import oracle
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.models import weights as W
    from ocr_pytorch_spark.operators.extract import (OCR_OUT_SCHEMA,
                                                     file_weights_spec,
                                                     make_ocr_udf)
    from ocr_pytorch_spark.plans.lineage import run_extract_job
    from ocr_pytorch_spark.sources.session import get_spark

    t_all = time.time()
    n_whale_spans = ensure_fixture()
    W.load_bundled()
    spark = get_spark(app="sf1-scale", cpus=CPUS)
    cfg = PipelineConfig.fixture()
    docs = spark.read.parquet(os.path.join(FIXTURE_DIR,
                                           "documents.parquet"))
    imgs = spark.read.parquet(os.path.join(FIXTURE_DIR,
                                           "images.parquet"))
    n_docs, n_imgs = docs.count(), imgs.count()

    # --- timed extraction through the lineage job (the production
    # shape: bucketed commit + _lineage + _metrics) ------------------
    dst = os.path.join("/tmp", f"ocr_sf1_out_{N_DOCS}")
    import shutil
    shutil.rmtree(dst, ignore_errors=True)
    # warm python workers + weight caches (steady-state timing)
    from ocr_pytorch_spark.operators.extract import extract
    extract(docs.limit(64), imgs, file_weights_spec(), cfg) \
        .write.mode("overwrite").format("noop").save()
    t0 = time.time()
    summary = run_extract_job(spark, docs, imgs, dst, cfg, buckets=64,
                              resume=False)
    wall = time.time() - t0

    # --- parity: executor-side per-ref oracle OCR, driver reassembly -
    ctpn_w, crnn_w = W.load_bundled()
    transcript_rows = (imgs.repartition(64, "media_ref")
                       .mapInPandas(make_ocr_udf(file_weights_spec(),
                                                 cfg), OCR_OUT_SCHEMA)
                       .collect())
    per_ref: dict = {}
    for r in sorted(transcript_rows,
                    key=lambda r: (r["media_ref"], r["box_order"])):
        if r["box_order"] < 0:
            raise RuntimeError(
                f"oracle OCR failed for {r['media_ref']}: {r['text']}")
        per_ref.setdefault(r["media_ref"], []).append(
            (r["box_order"], r["text"]))
    for r in (imgs.select("media_ref").collect()):
        per_ref.setdefault(r["media_ref"], [])

    expected_rows = []
    docs_local, _ = _whale_docs()
    for d in docs_local:
        doc = {"doc_id": d["doc_id"],
               "spans": [{"kind": s["kind"], "text": s["text"],
                          "media_ref": s["media_ref"]}
                         for s in d["spans"]]}
        out = oracle.extract_document(doc, None, ctpn_w, crnn_w, cfg,
                                      ocr_for_ref=lambda ref: per_ref[ref])
        for s in out["spans"]:
            expected_rows.append((out["doc_id"], s["offset"], s["kind"],
                                  s["text"], s["media_ref"]))
    schema = ("doc_id string, offset int, kind string, text string, "
              "media_ref string")
    expected = spark.createDataFrame(expected_rows, schema)
    actual = (spark.read.parquet(os.path.join(dst, "data"))
              .select("doc_id", F.explode("spans").alias("s"))
              .select("doc_id",
                      F.col("s.offset").alias("offset"),
                      F.col("s.kind").alias("kind"),
                      F.col("s.text").alias("text"),
                      F.col("s.media_ref").alias("media_ref")))
    n_viol = (actual.exceptAll(expected).count()
              + expected.exceptAll(actual).count())
    n_spans = actual.count()

    # --- straggler analysis from the job's own _metrics table -------
    mets = (spark.read.parquet(os.path.join(dst, "_metrics"))
            .where(F.col("stage") == "ocr_partition"))
    stats = mets.agg(
        F.expr("percentile(wall_ms, 0.5)").alias("med"),
        F.max("wall_ms").alias("mx"),
        F.min("wall_ms").alias("mn"),
        F.count("*").alias("n")).first()
    lin = spark.read.parquet(os.path.join(dst, "_lineage"))
    doc_spread = lin.agg(F.min("n_docs").alias("mn"),
                         F.max("n_docs").alias("mx")).first()

    # --- resume idempotency at scale (north_star: "any failed
    # partition resumes idempotently"): forget 4 buckets' commits —
    # as if the job died before their lineage append — and re-run
    # with resume=True.  Only those buckets may reprocess, and the
    # full-corpus span set must be unchanged. -----------------------
    lin_dir = os.path.join(dst, "_lineage")
    lin_all = spark.read.parquet(lin_dir).cache()
    lin_all.count()
    forget = [3, 17, 42, 63]
    keep = lin_all.where(~F.col("bucket").isin(forget))
    keep.write.mode("overwrite").parquet(lin_dir + "_tmp")
    # unpersist BEFORE re-reading: Spark's CacheManager matches the
    # new scan of lin_dir to the cached pre-delete plan otherwise
    lin_all.unpersist(blocking=True)
    shutil.rmtree(lin_dir)
    os.rename(lin_dir + "_tmp", lin_dir)
    t0 = time.time()
    resume_summary = run_extract_job(spark, docs, imgs, dst, cfg,
                                     buckets=64, resume=True)
    resume_wall = time.time() - t0
    assert resume_summary["buckets_skipped"] == 64 - len(forget),         resume_summary
    actual2 = (spark.read.parquet(os.path.join(dst, "data"))
               .select("doc_id", F.explode("spans").alias("s"))
               .select("doc_id",
                       F.col("s.offset").alias("offset"),
                       F.col("s.kind").alias("kind"),
                       F.col("s.text").alias("text"),
                       F.col("s.media_ref").alias("media_ref")))
    n_viol_resume = (actual2.exceptAll(expected).count()
                     + expected.exceptAll(actual2).count())

    # --- dedup family at 10x documents ------------------------------
    qs = E.queries()
    ddir = _scaled_dir(spark, sf_dir=SF_DIR, scale=DEDUP_SCALE)
    dedup_secs = {}
    for k in DEDUP_KEYS:
        _force(qs[k](spark, ddir))  # warm
        t0 = time.time()
        _force(qs[k](spark, ddir))
        dedup_secs[k] = round(time.time() - t0, 3)

    # --- ANN/similarity family at 10x embeddings (r5 VERDICT task 6:
    # the one family the whale run skipped).  Recall vs brute force at
    # two settings of each scale dial — n_centroids/n_probe for IVF
    # (the SemDeDup paper's cluster-count dial) and band count for
    # LSH — at BOTH the bench tier (4x) and the sf1 tier (10x), so the
    # dial's recall/cost trade is measured, not asserted. ------------
    from ocr_pytorch_spark.operators import similarity as S

    def _ann_tier(tier_dir: str) -> dict:
        emb = spark.read.parquet(os.path.join(tier_dir,
                                              "embeddings.parquet"))
        n_vec = emb.count()
        n_q, k = 32, 10
        _force(S.cosine_topk(emb, n_q, k))  # warm
        t0 = time.time()
        exact_pairs = {(r["q_id"], r["vec_id"])
                       for r in S.cosine_topk(emb, n_q, k).collect()}
        bf_wall = time.time() - t0
        out = {"n_vectors": n_vec, "n_queries": n_q, "k": k,
               "bruteforce_wall_sec": round(bf_wall, 2),
               "settings": {}}
        variants = [
            ("ivf_c16_p2", lambda: S.ivf_cosine_topk(
                emb, n_q, k, n_centroids=16, n_probe=2)),
            ("ivf_c64_p4", lambda: S.ivf_cosine_topk(
                emb, n_q, k, n_centroids=64, n_probe=4)),
            ("lsh_b4x8", lambda: S.lsh_cosine_topk(emb, n_q, k)),
            ("lsh_b8x4", lambda: S.lsh_cosine_topk(emb, n_q, k,
                                                   bands=8)),
        ]
        for label, thunk in variants:
            _force(thunk())  # warm
            t0 = time.time()
            got = {(r["q_id"], r["vec_id"]) for r in thunk().collect()}
            out["settings"][label] = {
                "wall_sec": round(time.time() - t0, 2),
                "recall": round(len(got & exact_pairs)
                                / max(len(exact_pairs), 1), 4)}

        # SemDeDup at the same tier: the scaled tier plants SCALE-1
        # jittered copies per base vector, so copy-drop recall is a
        # measurable ground truth (a copy whose cosine to its original
        # is >= tau must come out keep=False)
        tier_scale = DEDUP_SCALE if tier_dir == ddir else 4
        base_n = n_vec // tier_scale
        vt = S.vectors_with_norm(emb)
        orig = (vt.where(F.col("vec_id") < base_n)
                .select(F.col("vec_id").alias("o_id"),
                        F.col("vec").alias("ov"),
                        F.col("nrm").alias("on")))
        cop = (vt.where(F.col("vec_id") >= base_n)
               .select("vec_id", "vec", "nrm",
                       F.pmod(F.col("vec_id"), F.lit(base_n))
                       .alias("o_id")))
        true_dups = (cop.join(F.broadcast(orig), "o_id")
                     .where(S._pair_cos(F.col("vec"), F.col("ov"),
                                        F.col("nrm"), F.col("on"))
                            >= 0.9)
                     .select("vec_id"))
        n_true = true_dups.count()
        for n_c in (64, 256):
            _force(S.semantic_dedup(emb, n_centroids=n_c))  # warm
            t0 = time.time()
            dropped = (S.semantic_dedup(emb, n_centroids=n_c)
                       .where(~F.col("keep")).select("vec_id"))
            n_caught = true_dups.join(dropped, "vec_id").count()
            out["settings"][f"semdedup_c{n_c}"] = {
                "wall_sec": round(time.time() - t0, 2),
                "planted_dups": n_true,
                "dup_recall": round(n_caught / max(n_true, 1), 4)}
        return out

    ann = {"sf1_tier": _ann_tier(ddir),
           "bench_tier": _ann_tier(_scaled_dir(spark, sf_dir=SF_DIR,
                                               scale=4))}

    # --- hot-domain web-scale leg (r6 VERDICT task 2) ---------------
    web = _web_tier(spark, qs, ddir)

    # --- incremental-ingest leg (r7 VERDICT task 5) ------------------
    ingest = _ingest_tier(spark, qs, ddir)

    # --- flagship parity under FINE-TUNED weights (r5 VERDICT task
    # 8): reproduce tests/test_checkpoint_e2e.py's 3-epoch distributed
    # fine-tune, write the tuned .npz, and re-run a whale-doc subset
    # through the pipeline vs the oracle under the NEW weights — the
    # training surface and the scale surface agree end to end. -------
    import numpy as np

    from ocr_pytorch_spark.models import distributed_training as DT
    from ocr_pytorch_spark.models.training import SGD
    from ocr_pytorch_spark.models.weights import save_npz

    n_tuned_docs = int(os.environ.get("SPARK_GRAFT_SF1_TUNED_DOCS",
                                      "1200"))
    params0 = {k: np.asarray(v, dtype=np.float64)
               for k, v in ctpn_w.items()}
    rng = np.random.default_rng(47)
    samples = []
    for _ in range(4):
        x = rng.standard_normal((1, 3, 32, 32))
        n_anchors = (32 // 16) * (32 // 16) * 10
        gt_cls = rng.choice([-1, 0, 1], size=n_anchors,
                            p=[0.3, 0.5, 0.2]).astype(np.float64)
        gt_regr = np.zeros((n_anchors, 3))
        gt_regr[:, 0] = gt_cls
        gt_regr[:, 1:] = rng.standard_normal((n_anchors, 2))
        samples.append((x, gt_cls, gt_regr))
    tuned = DT.train_ctpn_distributed(spark, samples, params0,
                                      SGD(momentum=0.9), epochs=3,
                                      lr0=1e-4, total_num=30)
    tuned_npz = os.path.join("/tmp", f"ctpn_tuned_sf1_{N_DOCS}.npz")
    save_npz(tuned_npz, {k: v.astype(np.float32)
                         for k, v in tuned["params"].items()})
    from ocr_pytorch_spark.models.weights import load_npz, weights_dir
    crnn_npz = os.path.join(weights_dir(), "crnn.npz")
    tuned_spec = file_weights_spec(tuned_npz, crnn_npz)
    tuned_ctpn = load_npz(tuned_npz)

    # doc_id is "doc-%08d" (datagen.gen_document)
    sub_docs = docs.where(
        F.substring("doc_id", 5, 8).cast("long") < n_tuned_docs)
    sub_refs = {r["media_ref"] for r in
                (sub_docs.select(F.explode("spans").alias("s"))
                 .where(F.col("s.kind") == "media")
                 .select(F.col("s.media_ref").alias("media_ref"))
                 .distinct().collect())}
    sub_imgs = imgs.where(F.col("media_ref").isin(list(sub_refs)))
    t0 = time.time()
    tuned_actual = (extract(sub_docs, sub_imgs, tuned_spec, cfg)
                    .select("doc_id", F.explode("spans").alias("s"))
                    .select("doc_id",
                            F.col("s.offset").alias("offset"),
                            F.col("s.kind").alias("kind"),
                            F.col("s.text").alias("text"),
                            F.col("s.media_ref").alias("media_ref")))
    tuned_actual = tuned_actual.cache()
    n_tuned_spans = tuned_actual.count()
    tuned_wall = time.time() - t0

    tuned_rows = (sub_imgs.repartition(64, "media_ref")
                  .mapInPandas(make_ocr_udf(tuned_spec, cfg),
                               OCR_OUT_SCHEMA).collect())
    tuned_ref: dict = {}
    for r in sorted(tuned_rows,
                    key=lambda r: (r["media_ref"], r["box_order"])):
        if r["box_order"] < 0:
            raise RuntimeError(
                f"tuned OCR failed for {r['media_ref']}: {r['text']}")
        tuned_ref.setdefault(r["media_ref"], []).append(
            (r["box_order"], r["text"]))
    for ref in sub_refs:
        tuned_ref.setdefault(ref, [])
    tuned_expected_rows = []
    for d in docs_local:
        if int(d["doc_id"][4:]) >= n_tuned_docs:
            continue
        doc = {"doc_id": d["doc_id"],
               "spans": [{"kind": s["kind"], "text": s["text"],
                          "media_ref": s["media_ref"]}
                         for s in d["spans"]]}
        out = oracle.extract_document(
            doc, None, tuned_ctpn, load_npz(crnn_npz), cfg,
            ocr_for_ref=lambda ref: tuned_ref[ref])
        for s in out["spans"]:
            tuned_expected_rows.append(
                (out["doc_id"], s["offset"], s["kind"], s["text"],
                 s["media_ref"]))
    tuned_expected = spark.createDataFrame(tuned_expected_rows, schema)
    n_viol_tuned = (tuned_actual.exceptAll(tuned_expected).count()
                    + tuned_expected.exceptAll(tuned_actual).count())
    w_moved = sum(float(np.abs(tuned["params"][k] - params0[k]).max())
                  for k in params0)
    tuned_actual.unpersist()

    result = {
        "metric": "sf1_extract_docs_per_sec",
        "value": round(n_docs / wall, 2),
        "unit": "docs/sec",
        "docs": n_docs, "images": n_imgs, "spans": n_spans,
        "whale_media_spans": n_whale_spans,
        "extract_wall_sec": round(wall, 2),
        "parity_violations": n_viol,
        "bucket_wall_ms": {"median": float(stats["med"]),
                           "max": int(stats["mx"]),
                           "min": int(stats["mn"]),
                           "buckets": int(stats["n"]),
                           "max_over_median":
                               round(stats["mx"] / stats["med"], 2)},
        "bucket_docs": {"min": int(doc_spread["mn"]),
                        "max": int(doc_spread["mx"])},
        "resume": {"forgotten_buckets": len(forget),
                   "buckets_skipped":
                       resume_summary["buckets_skipped"],
                   "docs_reprocessed":
                       resume_summary["docs_processed"],
                   "wall_sec": round(resume_wall, 2),
                   "parity_violations_after_resume": n_viol_resume},
        "dedup_scale": DEDUP_SCALE,
        "dedup_secs": dedup_secs,
        "ann": ann,
        "web": web,
        "ingest": ingest,
        "tuned_parity": {
            "docs": n_tuned_docs,
            "spans": n_tuned_spans,
            "weight_max_abs_delta": round(w_moved, 6),
            "extract_wall_sec": round(tuned_wall, 2),
            "parity_violations": n_viol_tuned},
        "total_wall_sec": round(time.time() - t_all, 1),
        "cpus": CPUS,
        "job_summary": summary,
    }
    line = json.dumps(result)
    with open(os.path.join(REPO_ROOT, "BENCH", "SF1.json"), "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
