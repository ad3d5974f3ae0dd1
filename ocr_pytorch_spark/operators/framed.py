"""Framed-image sink (SURVEY §2 K2): detection visualizations as PNGs.

The reference's demo writes a 'framed' copy of each input with
proposal fills and text-line outlines (demo.py:30 img_framed via
detect/ctpn_predict.py:88-109).  Spark-first shape: one map-side
Arrow-batched UDF per image (detect once, composite, PNG-encode), one
row (media_ref, height, width, png) out — image bytes never shuffle,
and the sink is a plain parquet/binary table any viewer can read.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_pytorch_spark.config import PipelineConfig

FRAMED_SCHEMA = ("media_ref string, height int, width int, png binary")


def framed_images(images: DataFrame, weights_spec,
                  cfg: PipelineConfig | None = None) -> DataFrame:
    """(media_ref, height, width, channels, data) raw-RGB rows ->
    (media_ref, height, width, png) framed visualizations."""
    cfg = cfg or PipelineConfig.fixture()

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ocr_pytorch_spark.kernels.draw import frame_image
        from ocr_pytorch_spark.kernels.png import encode_png
        from ocr_pytorch_spark.models.ctpn import get_det_boxes
        from ocr_pytorch_spark.operators.extract import _get_weights

        ctpn_w, _ = _get_weights(weights_spec)
        for pdf in batches:
            refs, hs, ws, pngs = [], [], [], []
            for ref, h, w, c, data in zip(
                    pdf["media_ref"], pdf["height"], pdf["width"],
                    pdf["channels"], pdf["data"]):
                img = np.frombuffer(data, np.uint8).reshape(
                    int(h), int(w), int(c))
                quads, resized, anchors = get_det_boxes(
                    img, ctpn_w, cfg, return_anchors=True)
                framed = frame_image(resized, quads, anchors)
                refs.append(ref)
                hs.append(framed.shape[0])
                ws.append(framed.shape[1])
                pngs.append(encode_png(framed))
            yield pd.DataFrame(
                {"media_ref": refs,
                 "height": pd.array(hs, dtype="int32"),
                 "width": pd.array(ws, dtype="int32"),
                 "png": pngs})

    return images.mapInPandas(render, schema=FRAMED_SCHEMA)


def write_framed(images: DataFrame, weights_spec, dst: str,
                 cfg: PipelineConfig | None = None) -> None:
    """Render + persist the framed table (parquet; the png column is
    standalone PNG bytes, extractable as files with any tool)."""
    framed_images(images, weights_spec, cfg).write.mode(
        "overwrite").parquet(dst)
