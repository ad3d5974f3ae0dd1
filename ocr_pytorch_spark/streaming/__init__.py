"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10 — no watermarks,
windows, or state anywhere), so v1 keeps the per-batch pipeline pure and
exposes it to streams via ``foreachBatch``.

Exactly-once sink semantics: foreachBatch delivery is at-least-once (a
micro-batch can be replayed after a crash/restart), so each batch is
written with dynamic partition overwrite into its own ``batch_id=<n>``
partition — a replayed batch atomically REPLACES its partition instead
of appending duplicates.  Spark's checkpoint guarantees a given batch_id
always carries the same input rows, which makes the overwrite idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark.operators.extract import extract, file_weights_spec


def stream_extract(doc_stream: DataFrame, images: DataFrame, dst: str,
                   checkpoint: str,
                   cfg: PipelineConfig | None = None):
    """readStream(documents) -> foreachBatch(extract) -> parquet sink
    partitioned by batch_id (idempotent under micro-batch replay).

    Returns the StreamingQuery.  ``doc_stream`` must carry the standard
    (doc_id, spans) schema; ``images`` is the static media-store table
    joined per micro-batch.  Read the sink with
    ``spark.read.parquet(dst)`` (batch_id becomes a partition column).
    """
    cfg = cfg or PipelineConfig.fixture()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(batch_df, images, file_weights_spec(), cfg)
        write_batch(out, batch_id, dst)

    return (doc_stream.writeStream
            .option("checkpointLocation", checkpoint)
            .foreachBatch(process)
            .start())


def write_batch(out: DataFrame, batch_id: int, dst: str) -> None:
    """Idempotent micro-batch write: dynamic-overwrite the batch's own
    batch_id partition, so at-least-once foreachBatch delivery yields
    exactly-once sink contents."""
    (out.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(dst))
