"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10 — no watermarks,
windows, or state anywhere), so v1 keeps the per-batch pipeline pure and
exposes it to streams via ``foreachBatch``: an incoming stream of
``documents`` rows is extracted batch-by-batch into the same bucketed,
lineage-tracked sink the batch job uses (exactly-once per bucket via the
same dynamic-partition-overwrite idempotence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark.operators.extract import extract, file_weights_spec


def stream_extract(doc_stream: DataFrame, images: DataFrame, dst: str,
                   checkpoint: str,
                   cfg: PipelineConfig | None = None):
    """readStream(documents) -> foreachBatch(extract) -> parquet sink.

    Returns the StreamingQuery.  ``doc_stream`` must carry the standard
    (doc_id, spans) schema; ``images`` is the static media-store table
    joined per micro-batch.
    """
    cfg = cfg or PipelineConfig.fixture()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(batch_df, images, file_weights_spec(), cfg)
        out.write.mode("append").parquet(dst)

    return (doc_stream.writeStream
            .option("checkpointLocation", checkpoint)
            .foreachBatch(process)
            .start())
