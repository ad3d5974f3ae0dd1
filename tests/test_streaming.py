"""Streaming surface test: file-source stream -> foreachBatch extract
must equal the batch extraction of the same documents."""

import os
import time

from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.operators import extract as EX
from ocr_pytorch_spark.streaming import stream_extract


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans]


def test_stream_extract_matches_batch(spark, bundled_weights, fixture_cfg,
                                      tmp_path_factory):
    src = tmp_path_factory.mktemp("stream_src")
    doc_path, img_path = datagen.write_fixture(str(src), 6)
    imgs = spark.read.parquet(img_path)
    docs_batch = spark.read.parquet(doc_path)

    dst = str(tmp_path_factory.mktemp("stream_dst") / "out")
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    # only documents.parquet matches the schema; restrict via pathGlob
    doc_stream = (spark.readStream.schema(docs_batch.schema)
                  .option("pathGlobFilter", "documents.parquet")
                  .parquet(str(src)))

    q = stream_extract(doc_stream, imgs, dst, ckpt, fixture_cfg)
    # availableNow semantics: wait until the single micro-batch lands
    deadline = time.time() + 180
    while time.time() < deadline:
        if not q.isActive or (q.lastProgress
                              and q.lastProgress["numInputRows"] > 0
                              and q.status["isDataAvailable"] is False):
            break
        time.sleep(1)
    q.processAllAvailable()
    q.stop()

    got = {r["doc_id"]: _span_tuples(r["spans"])
           for r in spark.read.parquet(dst).collect()}
    want_df = EX.extract(docs_batch, imgs, EX.file_weights_spec(),
                         fixture_cfg)
    want = {r["doc_id"]: _span_tuples(r["spans"])
            for r in want_df.collect()}
    assert got == want


def test_replayed_micro_batch_does_not_duplicate(spark, bundled_weights,
                                                 fixture_cfg,
                                                 tmp_path_factory):
    """foreachBatch is at-least-once: writing the SAME batch_id twice
    (a crash/replay) must leave exactly one copy of its rows."""
    from ocr_pytorch_spark.streaming import write_batch

    src = tmp_path_factory.mktemp("replay_src")
    doc_path, img_path = datagen.write_fixture(str(src), 4)
    docs = spark.read.parquet(doc_path)
    imgs = spark.read.parquet(img_path)
    out = EX.extract(docs, imgs, EX.file_weights_spec(), fixture_cfg)

    dst = str(tmp_path_factory.mktemp("replay_dst") / "out")
    write_batch(out, 0, dst)
    once = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
    write_batch(out, 0, dst)  # replay
    twice = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
    assert once == twice
    assert len(once) == len(set(once)) == 4


def test_windowed_counts_stream_equals_batch(spark, tmp_path_factory):
    """Watermarked tumbling-window agg over a file-source stream must
    equal the same window() aggregation run in batch."""
    import os

    from pyspark.sql import functions as F

    from ocr_pytorch_spark.streaming.windows import windowed_event_counts
    from tests.conftest import SF_SMALL

    src = os.path.join(SF_SMALL, "events.parquet")
    batch = spark.read.parquet(src)
    want = {(r["w_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in windowed_event_counts(batch).collect()}

    stream = (spark.readStream.schema(batch.schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(SF_SMALL))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))
    q = (windowed_event_counts(stream).writeStream
         .format("memory").queryName("win_counts")
         .outputMode("complete")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    got = {(r["w_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql("select * from win_counts").collect()}
    q.stop()
    assert got == want


def test_running_user_totals_stateful(spark, tmp_path_factory):
    """applyInPandasWithState running totals: after draining the
    stream, per-user totals equal the batch groupBy."""
    import os

    from pyspark.sql import functions as F

    from ocr_pytorch_spark.streaming.windows import running_user_totals
    from tests.conftest import SF_SMALL

    batch = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
    want = {r["user_id"]: (r["n"], round(r["s"], 6))
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()}

    stream = (spark.readStream.schema(batch.schema)
              .option("pathGlobFilter", "events.parquet")
              .option("maxFilesPerTrigger", "1")
              .parquet(SF_SMALL))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    q = (running_user_totals(stream).writeStream
         .format("memory").queryName("user_totals")
         .outputMode("update")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    rows = spark.sql(
        "select * from user_totals").collect()
    q.stop()
    # update mode may emit per batch; the LAST row per user is final
    got = {}
    for r in rows:  # memory sink appends update rows in batch order
        got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 6))
    assert got == want


def test_stream_dedup_across_micro_batches(spark, tmp_path_factory):
    """Watermarked dropDuplicates on the content hash: duplicates
    arriving in LATER micro-batches (other files) are dropped by the
    state store; the surviving set equals batch exact-dedup."""
    import datetime as dt
    import os

    from ocr_pytorch_spark.streaming.windows import stream_dedup

    src = str(tmp_path_factory.mktemp("dedup_src"))
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows_a = [(f"d{i}", f"text body {i % 4}",
               t0 + dt.timedelta(seconds=i)) for i in range(8)]
    rows_b = [(f"e{i}", f"text body {i % 4}",
               t0 + dt.timedelta(seconds=60 + i)) for i in range(8)]
    schema = "doc_id string, text string, ts timestamp"
    spark.createDataFrame(rows_a, schema).coalesce(1) \
        .write.parquet(os.path.join(src, "a"))
    spark.createDataFrame(rows_b, schema).coalesce(1) \
        .write.parquet(os.path.join(src, "b"))

    batch = spark.read.parquet(os.path.join(src, "*"))
    want_hashes = {r["content_hash"]
                   for r in stream_dedup(batch).collect()}
    assert len(want_hashes) == 4  # 4 distinct bodies among 16 rows

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*")))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    q = (stream_dedup(stream).writeStream
         .format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    got = spark.sql("select * from dedup_out").collect()
    q.stop()
    # exactly one surviving row per distinct content hash, even though
    # duplicates spanned micro-batches
    assert len(got) == 4
    assert {r["content_hash"] for r in got} == want_hashes


def test_stream_interval_join_matches_batch(spark, tmp_path_factory):
    """Watermarked stream-stream interval join: clicks attribute to
    the same-(user, item) impression within the delay bound; stream
    result equals the batch join of the same inputs."""
    import datetime as dt
    import os

    from ocr_pytorch_spark.streaming.windows import stream_interval_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "user_id long, item_id string, ts timestamp"
    imps = [(u, f"item{u % 3}", t0 + dt.timedelta(seconds=10 * u))
            for u in range(6)]
    clicks = (
        # in-window clicks (30s after the impression)
        [(u, f"item{u % 3}", t0 + dt.timedelta(seconds=10 * u + 30))
         for u in range(4)]
        # out-of-window click (5 minutes later: must NOT join)
        + [(4, "item1", t0 + dt.timedelta(seconds=340))]
        # click with no impression at all
        + [(9, "item0", t0 + dt.timedelta(seconds=50))])

    imp_src = str(tmp_path_factory.mktemp("ij_imp"))
    clk_src = str(tmp_path_factory.mktemp("ij_clk"))
    spark.createDataFrame(imps, schema).coalesce(1) \
        .write.parquet(os.path.join(imp_src, "p"))
    spark.createDataFrame(clicks, schema).coalesce(1) \
        .write.parquet(os.path.join(clk_src, "p"))

    imp_b = spark.read.parquet(os.path.join(imp_src, "*"))
    clk_b = spark.read.parquet(os.path.join(clk_src, "*"))
    want = sorted((r["user_id"], r["imp_item"], r["clk_ts"])
                  for r in stream_interval_join(imp_b, clk_b).collect())
    assert [w[0] for w in want] == [0, 1, 2, 3]  # exactly the in-window 4

    imp_s = (spark.readStream.schema(imp_b.schema)
             .parquet(os.path.join(imp_src, "*")))
    clk_s = (spark.readStream.schema(clk_b.schema)
             .parquet(os.path.join(clk_src, "*")))
    ckpt = str(tmp_path_factory.mktemp("ij_ckpt"))
    q = (stream_interval_join(imp_s, clk_s).writeStream
         .format("memory").queryName("ij_out")
         .outputMode("append")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    got = sorted((r["user_id"], r["imp_item"], r["clk_ts"])
                 for r in spark.sql("select * from ij_out").collect())
    q.stop()
    assert got == want


def test_minhash_sig_array_matches_aggregate(spark):
    """The map-side (stream-safe) signature must equal the aggregate
    formulation component-for-component — that identity is what makes
    the streaming near-dup's buckets comparable with the batch LSH."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.dedup import (minhash_sig_array,
                                                   minhash_signatures)
    from tests.conftest import SF_SMALL

    docs = (spark.read.parquet(os.path.join(SF_SMALL,
                                            "documents.parquet"))
            .select("doc_id", "text").limit(60))
    agg = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)]
           for r in minhash_signatures(docs, k=8).collect()}
    arr = {r["doc_id"]: list(r["sig"])
           for r in docs.select(
               "doc_id", minhash_sig_array("text", 8).alias("sig"))
           .where(F.col("sig")[0].isNotNull()).collect()}
    assert agg and agg == arr


def test_stream_minhash_neardup_matches_batch(spark, tmp_path_factory):
    """Stateful streaming near-dup == batch LSH: planted noisy copies
    arrive across 3 micro-batches; the distinct stream pair set must
    equal the batch banded-join candidate set filtered at the same
    estimated-similarity threshold (pair discovery is order- and
    batching-independent because every doc is compared against all
    earlier bucket members, in-batch or in-state)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.dedup import (minhash_lsh_pairs,
                                                   minhash_signatures)
    from ocr_pytorch_spark.streaming.windows import stream_minhash_neardup
    from tests.conftest import SF_SMALL

    base = (spark.read.parquet(os.path.join(SF_SMALL,
                                            "documents.parquet"))
            .select("doc_id", "text").limit(60).collect())
    t0 = dt.datetime(2026, 1, 1)
    rows, j = [], 0
    for r in base:
        rows.append((f"d{int(r['doc_id']):04d}", r["text"],
                     t0 + dt.timedelta(seconds=j)))
        j += 1
        if int(r["doc_id"]) % 3 == 0:  # planted noisy copy
            ws = r["text"].split()
            ws[len(ws) // 2] = "zq"
            rows.append((f"d{int(r['doc_id']):04d}-c", " ".join(ws),
                         t0 + dt.timedelta(seconds=j)))
            j += 1
    src = str(tmp_path_factory.mktemp("nd_src"))
    spark.createDataFrame(
        rows, "doc_id string, text string, ts timestamp") \
        .repartition(3).write.parquet(os.path.join(src, "p"))

    batch = spark.read.parquet(os.path.join(src, "*"))
    sigs = minhash_signatures(batch, k=8)
    cand = minhash_lsh_pairs(batch, k=8, bands=4)
    sim = sum(
        (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int")
        for i in range(8)) / F.lit(8.0)
    want = {(r["doc_a"], r["doc_b"]) for r in
            (cand.join(sigs.alias("a"),
                       F.col("doc_a") == F.col("a.doc_id"))
             .join(sigs.alias("b"),
                   F.col("doc_b") == F.col("b.doc_id"))
             .where(sim >= 0.5).select("doc_a", "doc_b").collect())}
    assert want  # the planted copies must produce pairs

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*")))
    ckpt = str(tmp_path_factory.mktemp("nd_ckpt"))
    q = (stream_minhash_neardup(stream, bucket_cap=100000)
         .writeStream.format("memory").queryName("nd_out")
         .outputMode("update")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    got = {tuple(sorted((r["doc_id"], r["dup_of"])))
           for r in spark.sql("select * from nd_out").collect()}
    q.stop()
    assert got == want


def test_stream_domain_cap_matches_batch_prefix(spark,
                                                tmp_path_factory):
    """Streaming per-domain admission == the batch first-k-by-ts rank:
    a hot domain (60% of rows) and several small ones arrive across 3
    event-time-ordered micro-batches; the admitted set must equal
    row_number() over (partition by source order by ts, doc_id) <= k,
    a second replayed delivery of an already-admitted file must admit
    nothing new, and per-domain admits never exceed k."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ocr_pytorch_spark.streaming.windows import stream_domain_cap

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(100):
        src = "whale.com" if i % 5 < 3 else f"site-{i % 4}.com"
        rows.append((f"d{i:04d}", src, t0 + dt.timedelta(seconds=i)))
    schema = "doc_id string, source string, ts timestamp"
    src_dir = str(tmp_path_factory.mktemp("dc_src"))
    # 3 sequential ts-contiguous chunks -> the file source (oldest
    # first) replays exactly the event-time order
    for c, (lo, hi) in enumerate(((0, 33), (33, 66), (66, 100))):
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1) \
            .write.parquet(os.path.join(src_dir, f"chunk={c}"))

    k = 7
    batch = spark.read.parquet(os.path.join(src_dir, "*"))
    w = Window.partitionBy("source").orderBy("ts", "doc_id")
    want = {(r["doc_id"], r["source"], r["rk"]) for r in
            (batch.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= k)
             .select("doc_id", "source", "rk").collect())}

    # at-least-once replay baked into the stream itself: chunk 0 is
    # re-delivered as a 4th file after everything else — no doc may be
    # admitted twice and no previously-rejected doc may sneak in
    spark.createDataFrame(rows[0:33], schema).coalesce(1) \
        .write.parquet(os.path.join(src_dir, "chunk=3"))

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src_dir, "*")))
    ckpt = str(tmp_path_factory.mktemp("dc_ckpt"))
    q = (stream_domain_cap(stream, k=k)
         .writeStream.format("memory").queryName("dc_out")
         .outputMode("update")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    rows_out = spark.sql("select * from dc_out").collect()
    got = {(r["doc_id"], r["source"], r["admit_rank"])
           for r in rows_out}
    q.stop()
    assert len(rows_out) == len(got)  # replay emitted no duplicates
    assert got == want
    per_src = {}
    for _, s, _ in got:
        per_src[s] = per_src.get(s, 0) + 1
    assert max(per_src.values()) <= k
    assert per_src["whale.com"] == k  # the hot domain IS capped


def test_stream_incremental_neardup_matches_batch(spark,
                                                  tmp_path_factory):
    """Stream-static batch-vs-history near-dup: streamed docs joined
    against a persisted band index must flag exactly the pairs the
    batch operator flags (distinct over the per-band emissions), a
    replayed file adds nothing new (stateless join => idempotent
    output per input), and the plan has NO stateful operator."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.dedup import (_minhash_band_rows,
                                                   incremental_neardup)
    from ocr_pytorch_spark.streaming.windows import \
        stream_incremental_neardup
    from tests.conftest import SF_SMALL

    base = (spark.read.parquet(os.path.join(SF_SMALL,
                                            "documents.parquet"))
            .select("doc_id", "text").limit(80))
    # history = md5-lower-half split (the batch operator's default) —
    # build the persisted index exactly as an ingest job would
    cut = int(0.5 * 16 ** 8)
    is_hist = (F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") < cut)
    hist_index = (_minhash_band_rows(base.where(is_hist), 8, 4)
                  .withColumnRenamed("doc_id", "dup_of"))
    idx_dir = str(tmp_path_factory.mktemp("hist_idx"))
    hist_index.write.parquet(os.path.join(idx_dir, "idx"))
    static_idx = spark.read.parquet(os.path.join(idx_dir, "idx"))

    want = {(r["doc_id"], r["dup_of"]) for r in
            incremental_neardup(base, bucket_cap=64).collect()}

    batch_docs = base.where(~is_hist).select(
        "doc_id", "text",
        F.lit(dt.datetime(2026, 1, 1)).alias("ts"))
    src = str(tmp_path_factory.mktemp("inc_src"))
    batch_docs.repartition(3).write.parquet(os.path.join(src, "p"))

    stream = (spark.readStream
              .schema(batch_docs.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*")))
    out = stream_incremental_neardup(stream, static_idx,
                                     bucket_cap=64)
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    q = (out.writeStream.format("memory").queryName("inc_out")
         .outputMode("append")
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    got = {(r["doc_id"], r["dup_of"])
           for r in spark.sql("select * from inc_out").collect()}
    n_rows_1 = spark.sql("select count(*) n from inc_out") \
        .collect()[0]["n"]
    q.stop()
    assert got == want

    # stateless plan: no state store operator anywhere
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "flatMapGroupsWithState" not in plan
    assert "StateStore" not in plan

    # replay: delivering the same files again through a FRESH query
    # (new checkpoint) produces the same distinct pair set
    stream2 = (spark.readStream.schema(batch_docs.schema)
               .option("maxFilesPerTrigger", "2")
               .parquet(os.path.join(src, "*")))
    ckpt2 = str(tmp_path_factory.mktemp("inc_ckpt2"))
    q2 = (stream_incremental_neardup(stream2, static_idx,
                                     bucket_cap=64)
          .writeStream.format("memory").queryName("inc_out2")
          .outputMode("append")
          .option("checkpointLocation", ckpt2).start())
    q2.processAllAvailable()
    got2 = {(r["doc_id"], r["dup_of"])
            for r in spark.sql("select * from inc_out2").collect()}
    n_rows_2 = spark.sql("select count(*) n from inc_out2") \
        .collect()[0]["n"]
    q2.stop()
    assert got2 == got and n_rows_2 == n_rows_1
