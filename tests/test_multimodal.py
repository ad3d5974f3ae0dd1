"""Multimodal plumbing tests: real raw-RGB decode paths, stubbed codec
decode, batch shapes."""

import numpy as np
import pytest

from ocr_pytorch_spark import datagen
from ocr_pytorch_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def images_df(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("mmfix")
    _, img_path = datagen.write_fixture(str(out), 8)
    return spark.read.parquet(img_path)


def test_image_features_values(spark, images_df):
    rows = {r["media_ref"]: r for r in
            MM.image_features(images_df).collect()}
    src = {r["media_ref"]: r for r in images_df.collect()}
    assert set(rows) == set(src)
    # independently recompute one image's features
    ref = sorted(rows)[0]
    img = np.frombuffer(src[ref]["data"], np.uint8).reshape(
        src[ref]["height"], src[ref]["width"], 3).astype(np.float32)
    assert abs(rows[ref]["mean_r"] - img[..., 0].mean()) < 1e-3
    assert abs(rows[ref]["dark_frac"]
               - (img.mean(axis=2) < 100).mean()) < 1e-6


def test_thumbnails_shapes(spark, images_df):
    for r in MM.thumbnails(images_df, out_h=16).collect():
        assert r["height"] == 16
        assert len(r["data"]) == 16 * r["width"] * 3


def test_frame_sample_stride(spark, images_df):
    # treat each image as a 1-frame 'video'; every_n=1 keeps it
    out = MM.frame_sample(images_df, every_n=1).collect()
    assert len(out) == images_df.count()
    assert all(r["frame_idx"] == 0 for r in out)


def test_codec_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_codec(b"\xff\xd8\xff", "jpeg")
