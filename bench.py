"""Headline benchmark for the driver: runs the engine's flagship queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "ocr_docs_per_sec": ...}

Each query is forced end-to-end with a noop-format write (no driver
collect, no column pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OCR_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_OCR_DOCS", "1024"))
OCR_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_OCR_IMAGES", "512"))
# fixture multiplier for documents/embeddings (VERDICT r3 task 5: grow
# the tier until the top queries run long enough that host noise can't
# masquerade as a plan regression).  Copies carry near-duplicate (not
# identical) content so dedup/LSH neighbor structure grows ~linearly.
SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "4"))

# per-key query-shape generation (r6 VERDICT task 6): bump a key's
# entry when the query changes WHAT it computes (png_ocr_extract
# silently doubled its work in r6 when it became a two-sided parity
# surface, making r5->r6 totals non-comparable for that key).  Keys
# absent here are generation 1.  `python bench.py --diff old.json
# new.json` uses these to separate shape changes from regressions.
SHAPES = {
    "png_ocr_extract": 2,  # r6: two-sided parity surface (both-OCR
    #                        anti-join), ~2x the r5 single-sided work
    "dedup_embedding_cosine": 2,  # r8: IVF-preclustered candidates —
    #                        pairs now restricted to shared-cell
    #                        buckets (scale fix), a smaller relation
    #                        than the pure-banding gen 1
}

HEADLINE = [
    "tpch_q1", "tpch_q6", "broadcast_dim_join", "tpch_q3_topk",
    "range_self_join", "window_reading_order", "sessionize",
    "group_linefit_regr", "explode_reassemble",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_topk_cosine", "sim_lsh_topk",
    "text_quality", "text_fingerprint", "multimodal_features",
    "html_main_block", "pdf_text_extract",
    "dedup_lines", "pii_redact", "tfidf_topk",
    "bm25_topk", "stratified_sample", "skew_profile",
    "url_canonical_dedup", "domain_doc_cap", "html_outlinks",
    "doc_chunks", "pack_sequences", "lm_perplexity",
    "dsir_topk", "corpus_overlap_minhash", "classifier_auc",
    "dataset_split", "gate_ablation", "robots_filter",
    "robots_parse", "robots_match", "sim_pq_topk",
    "semdedup", "boilerplate_blocks",
    "multimodal_audio", "multimodal_video",
    # png_ocr_extract retired from the bench in r8 (r7 VERDICT task
    # 8): the bench was timing THREE overlapping full-OCR forwards per
    # round (ocr_extract leg + png_ocr_extract + the pinned rotation
    # parity key).  ocr_extract stays as the ONE bench OCR leg (it
    # feeds ocr_docs_per_sec); png_ocr_extract and ocr_extract_parity
    # remain correctness keys in the rotation, just untimed here.
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _gemm_anchor(seconds: float = 1.5) -> float:
    """Single-thread conv5-shaped GEMM GFLOP/s — the same-day host-
    noise anchor (r5 VERDICT task 2): BENCH/BASELINE.md measured the
    harness background load moving this socket's effective bandwidth
    ~30% between sessions, so every headline docs/sec now ships with
    the kernel reading that explains (or rules out) a host swing.
    Mirrors scripts/gemm_contention_bench.py's single-process mode."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 4608)).astype(np.float32)
    b = rng.standard_normal((4608, 576)).astype(np.float32)
    out = np.empty((512, 576), np.float32)
    np.dot(a, b, out=out)  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.dot(a, b, out=out)
        n += 1
    dt = time.perf_counter() - t0
    return round(2 * 512 * 4608 * 576 * n / dt / 1e9, 2)


def _contention_anchor(seconds: float = 2.0) -> dict:
    """32-way contention anchor (r7 VERDICT task 4): the single-
    thread GEMM anchor provably cannot see 32-way memory-system
    contention (r7's anchors were HIGHER than r6's while docs/s was
    20% lower), so the bench now brackets the run with one short
    multi-process burst at K=8 and K=32 — the same children
    scripts/gemm_contention_bench.py spawns — and reports
    r32_over_r8 = per-core GFLOP/s ratio.  A docs/s dip with a
    steady single-thread anchor but a depressed r32_over_r8 is
    external 32-way load, not a plan regression."""
    import subprocess

    script = os.path.join(REPO_ROOT, "scripts",
                          "gemm_contention_bench.py")
    env = dict(os.environ,
               SPARK_GRAFT_GEMM_SECONDS=str(seconds),
               OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1")
    out = {}
    for k in (8, 32):
        procs = [subprocess.Popen(
            [sys.executable, script, "--child", "gemm"],
            stdout=subprocess.PIPE, text=True, env=env)
            for _ in range(k)]
        vals = []
        for p in procs:
            o, _ = p.communicate()
            vals.append(json.loads(o.strip().splitlines()[-1])["gflops"])
        out[f"per_core_gflops_k{k}"] = round(sum(vals) / len(vals), 2)
    out["r32_over_r8"] = round(out["per_core_gflops_k32"]
                               / out["per_core_gflops_k8"], 3)
    return out


def _scaled_dir(spark, sf_dir: str | None = None,
                scale: int | None = None) -> str:
    """Build (once, cached in /tmp) a fixture tier with documents and
    embeddings scaled SCALE×.  Document copies get a per-copy suffix on
    EVERY word, so their shingles are disjoint from the originals' —
    cross-copy LSH buckets don't fill up and the dedup/Jaccard
    workloads scale linearly in SCALE (a bare doc-level variant token
    left copies near-identical and made candidate-pair volume
    superlinear: measured 12× on dedup_ngram_jaccard at 4×).
    Embedding copies get small deterministic jitter (near-dup clusters
    of size SCALE — bounded).  Other tables are symlinked unscaled."""
    SF = sf_dir or SF_DIR
    SC = scale if scale is not None else SCALE
    if SC <= 1:
        return SF
    from pyspark.sql import functions as F

    tag = os.path.basename(SF.rstrip("/"))
    out = f"/tmp/ocr_bench_{tag}_x{SC}"
    marker = os.path.join(out, "_SCALE_OK")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        docs = spark.read.parquet(
            os.path.join(SF, "documents.parquet"))
        max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        parts = [docs] + [
            docs.withColumn("doc_id", F.col("doc_id") + c * max_doc)
                .withColumn("text", F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"w -> concat(w, 'v{c}')), ' ')"))
            for c in range(1, SC)]
        sd = parts[0]
        for p in parts[1:]:
            sd = sd.unionByName(p)
        sd.write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet"))
        emb = spark.read.parquet(
            os.path.join(SF, "embeddings.parquet"))
        max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        eparts = [emb]
        for c in range(1, SC):
            # deterministic per-(vec,dim,copy) jitter ~U(-0.05, 0.05):
            # keeps copies near the original (near-dup neighbors grow
            # linearly) without any RNG state
            jitter = (
                "transform(embedding, (x, i) -> cast(x + "
                f"(sin(vec_id * 12.9898 + i * 78.233 "
                f"+ {c} * 37.719) * 43758.5453 % 1.0) * 0.05 "
                "as float))")
            eparts.append(
                emb.withColumn("vec_id", F.col("vec_id") + c * max_vec)
                   .withColumn("embedding", F.expr(jitter)))
        se = eparts[0]
        for p in eparts[1:]:
            se = se.unionByName(p)
        se.write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet"))
        for f in os.listdir(SF):
            dst = os.path.join(out, f)
            if f.endswith(".parquet") and not os.path.exists(dst):
                os.symlink(os.path.join(SF, f), dst)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


def main() -> None:
    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark

    gemm_pre = _gemm_anchor()
    contention_pre = _contention_anchor()
    spark = get_spark(app="ocr_pytorch_spark-bench", cpus=CPUS)
    qs = E.queries()
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    run_dir = _scaled_dir(spark)

    # warm the JVM, python workers, and per-worker weight caches once
    # (excluded from timings — steady-state numbers)
    _force(qs["filter_threshold"](spark, run_dir))
    _force(qs["ocr_extract"](spark, "/root/testdata/sf0.001"))

    # min of N reps per query, with the full {min,max,reps} spread
    # reported: this host carries intermittent external load (harness
    # workers at 100-200% CPU) and ±25% thermal noise — a single pass
    # can read 3× slow through no fault of the plan, and the spread is
    # what separates a real regression from one noisy rep
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def _timed(name, thunk, n=reps):
        # one untimed warmup rep first (r4 VERDICT task 1): rep 1 used
        # to absorb python-worker forks + per-worker weight/codec cache
        # fills, making max/min spreads of 4-8× that said nothing about
        # plan stability.  With the warmup excluded, max/min is a real
        # noise bound (gate: ≤1.5 for steady-state queries).
        thunk()
        ts = []
        for _ in range(n):
            t0 = time.time()
            thunk()
            ts.append(time.time() - t0)
        timings[name] = round(min(ts), 3)
        spread[name] = {"min": round(min(ts), 3),
                        "max": round(max(ts), 3), "reps": n}

    # flagship OCR extraction FIRST (r6 VERDICT task 7: the full-tier
    # run degrades the host over its ~9 minutes and the OCR headline
    # used to run last — r6's first attempt saw a 24% anchor drop by
    # the time the OCR leg ran.  Running it first, bracketed by its
    # own post-leg anchor, keeps the docs/sec reading on the
    # freshest-host window): docs/sec over a bench-scale interleaved
    # set
    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.models import weights as W
    from ocr_pytorch_spark.operators.extract import (extract,
                                                     file_weights_spec)
    from pyspark.sql import functions as F

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .where(F.col("doc_id") < OCR_DOCS))
    ref = F.concat(F.lit("img-bench-"),
                   F.lpad((F.col("doc_id") % OCR_IMAGES).cast("string"),
                          5, "0"))
    inter = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"),
                     F.col("text").alias("text"),
                     F.lit(None).cast("string").alias("media_ref"),
                     F.lit(0).cast("int").alias("offset")),
            F.struct(F.lit("media").alias("kind"),
                     F.lit(None).cast("string").alias("text"),
                     ref.alias("media_ref"),
                     F.lit(1).cast("int").alias("offset")),
        ).alias("spans"))
    img_rows = datagen.gen_images(
        [f"img-bench-{i:05d}" for i in range(OCR_IMAGES)])
    imgs = spark.createDataFrame(
        [(r["media_ref"], r["height"], r["width"], r["channels"],
          bytearray(r["data"])) for r in img_rows],
        "media_ref string, height int, width int, channels int, "
        "data binary")
    W.load_bundled()  # ensure weights/*.npz exist
    n_docs = inter.count()
    _timed("ocr_extract",
           lambda: _force(extract(inter, imgs, file_weights_spec(),
                                  PipelineConfig.fixture())))
    ocr_sec = timings["ocr_extract"]
    # anchor immediately after the OCR leg: gemm_pre and this bracket
    # the docs/sec reading within a ~2-minute window
    gemm_ocr = _gemm_anchor()

    for name in HEADLINE:
        _timed(name, lambda: _force(qs[name](spark, run_dir)))

    # dedup_minhash_lsh variance diagnosis (r5 VERDICT task 3): the
    # r5 in-session spread hit 5.7× with no code change, so the band
    # bucket-size histogram now lands next to the timing — if a bench
    # rep is slow because the scaled tier blew a band bucket, max_n
    # says so; if buckets are tiny and the rep is still slow, the
    # cause is host/GC, not a hot bucket.
    from ocr_pytorch_spark.operators import dedup as _D
    from pyspark.sql import functions as _F

    _bs = _D.minhash_bucket_sizes(
        spark.read.parquet(os.path.join(run_dir, "documents.parquet")))
    _brow = (_bs.agg(
        _F.count("*").alias("n_buckets"),
        _F.max("n").alias("max_n"),
        _F.coalesce(_F.sum((_F.col("n") > 64).cast("long")),
                    _F.lit(0)).alias("n_over_64"),
        _F.coalesce(_F.sum((_F.col("n") > 2).cast("long")),
                    _F.lit(0)).alias("n_over_2"))
        .collect()[0])
    minhash_diag = {k: int(_brow[k]) for k in
                    ("n_buckets", "max_n", "n_over_64", "n_over_2")}

    total = round(sum(timings.values()), 3)
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "scale": SCALE,
        "cpus": CPUS,
        "ocr_docs_per_sec": round(n_docs / ocr_sec, 2),
        "gemm_gflops_single": gemm_pre,
        "gemm_gflops_single_ocr": gemm_ocr,
        "contention_pre": contention_pre,
        "shapes": SHAPES,
        "detail": "BENCH_result.json",
    }
    result = dict(compact)
    result.update({
        "spread": spread,
        "ocr_docs": n_docs,
        "ocr_distinct_images": OCR_IMAGES,
        "minhash_bucket_histogram": minhash_diag,
    })
    # the printed line must be SHORT (r5 VERDICT task 2: the driver's
    # tail window clipped the head of the 33-query x spread line two
    # rounds running, so "parsed" came back null) — spread and
    # diagnostics live only in BENCH_result.json; the compact line
    # keeps the driver-contract fields.  Persist the detail file,
    # stop Spark (so shutdown chatter can't land after us), measure
    # the post-run GEMM anchor, then print the compact line LAST.
    spark.stop()
    post = _gemm_anchor()
    contention_post = _contention_anchor()
    compact["gemm_gflops_single_post"] = post
    result["gemm_gflops_single_post"] = post
    compact["contention_post"] = contention_post
    result["contention_post"] = contention_post
    with open(os.path.join(REPO_ROOT, "BENCH_result.json"), "w") as fh:
        fh.write(json.dumps(result) + "\n")
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)


def diff(old_path: str, new_path: str) -> None:
    """Cross-round bench diff that separates query-shape changes from
    regressions (r6 VERDICT task 6): a key whose SHAPES generation
    differs between the two files (or between an old file without
    shape tags and the current table) is flagged SHAPE-CHANGE and its
    timing delta is excluded from the regression list."""
    def _load(path):
        with open(path) as fh:
            d = json.load(fh)
        # driver-recorded BENCH_r{N}.json wraps the bench line under
        # "parsed" (None when the driver's tail window clipped it);
        # BENCH_result.json / a raw line is the dict itself
        if "queries" in d:
            return d
        p = d.get("parsed")
        if p is None:
            print(f"warning: {path} has no parsed bench line")
        return p or {}

    old, new = _load(old_path), _load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    # files that predate shape tags count as generation 1 everywhere —
    # conservative: a key first tagged gen>1 shows as SHAPE-CHANGE (and
    # is excluded from the regression list) rather than as a regression
    osh = old.get("shapes", {})
    nsh = new.get("shapes", SHAPES)
    rows = []
    for k in sorted(set(oq) | set(nq)):
        if k not in oq:
            rows.append((k, None, nq[k], "ADDED"))
        elif k not in nq:
            rows.append((k, oq[k], None, "REMOVED"))
        elif osh.get(k, 1) != nsh.get(k, 1):
            rows.append((k, oq[k], nq[k],
                         f"SHAPE-CHANGE gen{osh.get(k, 1)}"
                         f"->gen{nsh.get(k, 1)}"))
        else:
            r = nq[k] / oq[k] if oq[k] else float("inf")
            tag = ("REGRESSION" if r > 1.5
                   else "IMPROVED" if r < 1 / 1.5 else "steady")
            rows.append((k, oq[k], nq[k], f"{tag} x{r:.2f}"))
    w = max(len(k) for k, *_ in rows)
    for k, a, b, tag in rows:
        fa = "--" if a is None else f"{a:7.2f}"
        fb = "--" if b is None else f"{b:7.2f}"
        print(f"{k:<{w}}  {fa} -> {fb}  {tag}")
    n_reg = sum(1 for *_, t in rows if t.startswith("REGRESSION"))
    n_shape = sum(1 for *_, t in rows if t.startswith("SHAPE"))
    print(f"-- {n_reg} regression(s), {n_shape} shape change(s), "
          f"{len(rows)} keys")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--diff":
        diff(sys.argv[2], sys.argv[3])
    else:
        main()
