"""Structured Streaming operators beyond the foreachBatch extract sink:
event-time windowed aggregation with watermarked late-data handling,
and a custom stateful operator via applyInPandasWithState.

The reference is strictly batch, so these cover the engine's
training-data-pipeline streaming surface (events firehose -> rollups /
running per-key state) rather than a reference module.  Both operators
are watermark-correct at scale: state is keyed and bounded, nothing
collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)

RUNNING_SCHEMA = ("user_id bigint, n_events bigint, sum_value double")
RUNNING_STATE_SCHEMA = "n bigint, s double"


def windowed_event_counts(events: DataFrame,
                          window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Tumbling event-time window counts per event_type with a
    watermark bounding late-data state.  Works on a stream (readStream)
    or, identically, on a batch frame (window() is the same function) —
    which is exactly how the tests cross-check it."""
    # watermarks require TIMESTAMP (the testdata ts is TIMESTAMP_NTZ;
    # session tz is UTC so the cast is value-preserving)
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("w_start"), "event_type",
                    "n", "sum_value"))


def stream_dedup(docs: DataFrame, watermark: str = "10 minutes",
                 key: str = "content_hash") -> DataFrame:
    """Continuous-ingestion exact dedup: watermarked
    ``dropDuplicates`` on the content hash — the streaming face of
    operators/dedup.exact_dedup.  The watermark bounds the dedup
    state store (keys older than the watermark age out), which is
    what makes this viable on an unbounded firehose: state is
    O(keys within the watermark horizon), not O(stream).  Works
    identically on a batch frame, which is how the tests cross-check
    stream==batch."""
    hashed = (docs
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn(key, F.md5(F.col("text"))))
    return (hashed.withWatermark("ts", watermark)
            .dropDuplicates([key]))


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (event count, value
    sum) maintained with applyInPandasWithState — the pattern for
    stateful logic Spark's built-ins can't express.  Emits the updated
    totals for every user seen in each micro-batch (update semantics);
    state is two numbers per user, so 10^9 users is ~GBs spread across
    the state store, never the driver."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=RUNNING_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


NEARDUP_SCHEMA = ("doc_id string, dup_of string, band_idx int, "
                  "est_sim double")
NEARDUP_STATE_SCHEMA = "ids array<string>, sigs array<string>"


def stream_minhash_neardup(docs: DataFrame, k: int = 8, bands: int = 4,
                           shingle_n: int = 3,
                           sim_threshold: float = 0.5,
                           watermark: str = "10 minutes",
                           state_retention_ms: int = 600_000,
                           bucket_cap: int = 64) -> DataFrame:
    """Continuous-ingestion NEAR-dup — the streaming face of
    operators/dedup.minhash_lsh_pairs: map-side MinHash signatures
    (dedup.minhash_sig_array — aggregation-free, so banding is pure
    projection), band keys exploded map-side, then ONE stateful
    operator keyed by (band_idx, key) whose state is the bucket's
    seen (doc_id, signature) list.  Each arriving doc is compared
    against every doc already in its bucket (prior micro-batches AND
    earlier in this batch) and emits a pair row when the estimated
    Jaccard (fraction of equal signature components) clears
    ``sim_threshold``.

    Scale contract: state per bucket is capped at ``bucket_cap``
    (docs beyond the cap are still COMPARED, not remembered — a viral
    bucket degrades recall instead of growing state, mirroring the
    batch bucket_cap contract), and EventTimeTimeout ages idle
    buckets out ``state_retention_ms`` past the watermark, so total
    state is O(active buckets x cap), never O(stream).  Pairs are
    emitted at-least-once (one row per matching band) — consumers
    take ``distinct()`` on (doc_id, dup_of), exactly as the batch
    banded join distincts its candidate set."""
    from ocr_pytorch_spark.operators.dedup import minhash_sig_array

    rows = k // bands
    hashed = (docs
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("sig", minhash_sig_array("text", k, shingle_n))
              .where(F.col("sig")[0].isNotNull()))
    band_structs = [
        F.struct(F.lit(b).alias("band_idx"),
                 F.md5(F.concat_ws("|", *[
                     F.col("sig")[b * rows + r] for r in range(rows)]))
                 .alias("key"))
        for b in range(bands)]
    banded = (hashed
              .select("doc_id", "ts",
                      F.concat_ws("|", *[F.col("sig")[i]
                                         for i in range(k)])
                      .alias("sig_str"),
                      F.explode(F.array(*band_structs)).alias("bk"))
              .select("doc_id", "ts", "sig_str", "bk.band_idx",
                      "bk.key")
              .withWatermark("ts", watermark))

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "dup_of", "band_idx", "est_sim"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        ids, sigs = ([], []) if not state.exists else state.get
        ids, sigs = list(ids), list(sigs)
        band_idx = int(key[0])
        out = []
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf):
                max_ts_ms = max(max_ts_ms,
                                int(pdf["ts"].max().timestamp() * 1000))
            for doc_id, sig_str in zip(pdf["doc_id"], pdf["sig_str"]):
                parts = sig_str.split("|")
                for prev_id, prev_sig in zip(ids, sigs):
                    if prev_id == doc_id:
                        continue
                    prev = prev_sig.split("|")
                    sim = (sum(a == b for a, b in zip(parts, prev))
                           / len(parts))
                    if sim >= sim_threshold:
                        out.append((doc_id, prev_id, band_idx, sim))
                # at-least-once sources can replay a doc_id: guard the
                # append on membership (ids is capped at bucket_cap, so
                # the linear scan is O(64)) or replays evict capacity
                # meant for distinct docs
                if str(doc_id) not in ids and len(ids) < bucket_cap:
                    ids.append(str(doc_id))
                    sigs.append(str(sig_str))
        state.update((ids, sigs))
        # ALWAYS set the timeout (r6 ADVICE: the old `wm > 0` guard
        # left first-micro-batch buckets stateful forever).  While the
        # watermark is still unset (0) the timeout must anchor to the
        # bucket's own max EVENT time, not to epoch 0 — a 0-anchored
        # timeout lands decades before the first real watermark and
        # would evict all first-batch state the moment it advances.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm, max_ts_ms) + state_retention_ms)
        yield pd.DataFrame(out, columns=cols)

    return (banded.groupBy("band_idx", "key")
            .applyInPandasWithState(
                update,
                outputStructType=NEARDUP_SCHEMA,
                stateStructType=NEARDUP_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_interval_join(impressions: DataFrame, clicks: DataFrame,
                         max_delay: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Watermarked stream-stream interval join (the ad-attribution
    shape): a click matches the impression with the same (user, item)
    whose timestamp precedes it by at most ``max_delay``.  Watermarks
    on BOTH sides plus the two-sided time bound are what let Spark
    expire join state — without them a stream-stream join buffers
    forever; with them state is O(events inside the watermark
    horizon) per key.  Inner-join matches emit as soon as both sides
    arrive (no watermark wait), so the same function on batch frames
    returns the identical result — the tests' cross-check."""
    imp = (impressions
           .select("user_id", F.col("item_id").alias("imp_item"),
                   F.col("ts").cast("timestamp").alias("imp_ts"))
           .withWatermark("imp_ts", watermark))
    clk = (clicks
           .select(F.col("user_id").alias("clk_user"),
                   F.col("item_id").alias("clk_item"),
                   F.col("ts").cast("timestamp").alias("clk_ts"))
           .withWatermark("clk_ts", watermark))
    return (imp.join(
        clk,
        F.expr(f"user_id = clk_user AND imp_item = clk_item "
               f"AND clk_ts >= imp_ts "
               f"AND clk_ts <= imp_ts + interval {max_delay}"))
        .select("user_id", "imp_item", "imp_ts", "clk_ts"))


DOMAIN_CAP_SCHEMA = "doc_id string, source string, admit_rank int"
DOMAIN_CAP_STATE_SCHEMA = "cnt long, ids array<string>"


def stream_domain_cap(docs: DataFrame, k: int = 10,
                      watermark: str = "10 minutes",
                      state_retention_ms: int = 30 * 60 * 1000
                      ) -> DataFrame:
    """Streaming per-domain admission cap — the crawl-ingest version
    of operators/web.domain_doc_cap: admit at most ``k`` documents per
    ``source`` in event-time arrival order, emitting
    (doc_id, source, admit_rank) for admitted docs only.  Where the
    batch operator can rank by quality (it sees everything), an
    ingest stream must decide per arrival — first-k-by-event-time is
    the online policy (RefinedWeb-style hot-domain throttling at the
    crawl frontier, before expensive downstream stages run).

    Scale contract: state per domain is ONE counter plus the <= k
    admitted ids (kept only to make at-least-once replays idempotent —
    a replayed admitted doc is recognized and not re-admitted or
    double-counted; a replayed rejected doc stays rejected because the
    counter never moved for it).  EventTimeTimeout ages idle domains
    out ``state_retention_ms`` past the watermark, so total state is
    O(active domains x k), never O(stream).  Within a micro-batch,
    rows are processed in (ts, doc_id) order so admission is
    batching-independent whenever files arrive in event-time order."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "source", "admit_rank"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        cnt, ids = (0, []) if not state.exists else state.get
        cnt, ids = int(cnt), list(ids)
        source = str(key[0])
        out = []
        max_ts_ms = 0
        # Concatenate ALL Arrow chunks before sorting: large (hot-
        # domain) groups arrive as multiple chunks, and per-chunk
        # sorting would make admission depend on chunking (r7 ADVICE).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            max_ts_ms = int(pdf["ts"].max().timestamp() * 1000)
            pdf = pdf.sort_values(["ts", "doc_id"])
            for doc_id in pdf["doc_id"]:
                did = str(doc_id)
                if did in ids:      # at-least-once replay of an admit
                    continue
                if cnt < k:
                    cnt += 1
                    ids.append(did)
                    out.append((did, source, cnt))
        state.update((cnt, ids))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm, max_ts_ms)
                                  + state_retention_ms)
        yield pd.DataFrame(out, columns=cols)

    return (docs
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy("source")
            .applyInPandasWithState(
                update,
                outputStructType=DOMAIN_CAP_SCHEMA,
                stateStructType=DOMAIN_CAP_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_incremental_neardup(docs: DataFrame,
                               history_index: DataFrame,
                               k: int = 8, bands: int = 4,
                               shingle_n: int = 3,
                               bucket_cap: int | None = 64) -> DataFrame:
    """Continuous batch-vs-history near-dup — the streaming face of
    operators/dedup.incremental_neardup and the daily-crawl shape's
    natural end state: documents arrive as a stream, the already-
    ingested corpus sits in a PERSISTED (band_idx, key, dup_of) band
    index (a static table at 10^12 rows), and each arriving doc is
    flagged against history via a STREAM-STATIC equi-join on
    (band_idx, key).

    Scale contract: the plan is fully STATELESS on the streaming side
    — map-side signatures (dedup.minhash_sig_array, aggregation-free)
    + band explode + one join whose static side Spark plans like any
    batch relation (broadcast when small, shuffled-side-static
    otherwise) — so there is no state store to age and replays are
    naturally idempotent (same input file -> same match rows).
    ``bucket_cap`` prunes oversized history buckets STATIC-side via
    the same broadcast anti-join as the batch operator (sizes from
    one groupBy or the persisted bucket-size table), so one viral
    bucket cannot amplify every micro-batch.  Matches are emitted
    at-least-once per matching band (doc_id, dup_of, band_idx);
    consumers ``distinct()`` on (doc_id, dup_of) exactly as the batch
    operator groups them."""
    from ocr_pytorch_spark.operators.dedup import minhash_sig_array

    rows = k // bands
    hashed = (docs
              .withColumn("sig", minhash_sig_array("text", k, shingle_n))
              .where(F.col("sig")[0].isNotNull()))
    band_structs = [
        F.struct(F.lit(b).alias("band_idx"),
                 F.md5(F.concat_ws("|", *[
                     F.col("sig")[b * rows + r] for r in range(rows)]))
                 .alias("key"))
        for b in range(bands)]
    banded = (hashed
              .select("doc_id",
                      F.explode(F.array(*band_structs)).alias("bk"))
              .select("doc_id", "bk.band_idx", "bk.key"))
    hist = history_index
    if bucket_cap is not None:
        sizes = hist.groupBy("band_idx", "key").agg(
            F.count("*").alias("n"))
        oversized = (sizes.where(F.col("n") > bucket_cap)
                     .select("band_idx", "key"))
        hist = hist.join(F.broadcast(oversized),
                         ["band_idx", "key"], "left_anti")
    return (banded.join(hist, ["band_idx", "key"])
            .select("doc_id", "dup_of", "band_idx"))
