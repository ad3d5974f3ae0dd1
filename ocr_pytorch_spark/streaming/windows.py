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
