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


def test_codec_decode_video_is_stubbed():
    # PNG/JPEG/WAV are real codecs now (kernels/{png,jpeg,wav}.py,
    # covered in their own test files); only video needs ffmpeg
    with pytest.raises(NotImplementedError):
        MM.decode_codec(b"\x00\x00\x00 ftypmp42", "mp4")


def test_codec_decode_wav_is_real():
    import numpy as np

    from ocr_pytorch_spark.kernels.wav import encode_wav

    clip = (np.sin(np.arange(100)) * 1000).astype(np.int16)
    samples, rate = MM.decode_codec(encode_wav(clip, 8000), "wav")
    assert rate == 8000 and samples.shape == (100, 1)


def test_dhash_properties(spark):
    """dHash: deterministic, identical images collide, small noise
    stays within a small Hamming distance, different images differ."""
    import numpy as np

    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.operators.multimodal import (dhash_array,
                                                        image_dhash)

    # fixture doc-images are a flat background and SHOULD collide
    # (perceptually identical); use structured images for distinctness
    fa, _ = datagen.gen_image_array("img-dh-0000")
    fb, _ = datagen.gen_image_array("img-dh-0001")
    assert dhash_array(fa) == dhash_array(fb)  # flat == flat

    rng0 = np.random.default_rng(1)
    a = rng0.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    b = rng0.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    assert dhash_array(a) == dhash_array(a.copy())
    assert dhash_array(a) != dhash_array(b)

    # a real photo hashes non-degenerately
    from ocr_pytorch_spark.kernels.png import decode_png
    import os as _os

    with open(_os.path.join(_os.path.dirname(__file__), "assets",
                            "ref_t1.png"), "rb") as f:
        photo = decode_png(f.read())
    hv = dhash_array(photo)
    assert 4 <= bin(hv).count("1") <= 60

    noisy = a.astype(np.int16).copy()
    rng = np.random.default_rng(0)
    noisy += rng.integers(-2, 3, noisy.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    ham = bin(dhash_array(a) ^ dhash_array(noisy)).count("1")
    assert ham <= 8, f"noise flipped {ham}/64 bits"
    diff = bin(dhash_array(a) ^ dhash_array(b)).count("1")
    assert diff >= 16, f"distinct images too close: {diff}"

    # Spark path agrees with the kernel
    rows = [("img-dh-0000", a.shape[0], a.shape[1], 3,
             bytearray(a.tobytes()))]
    df = spark.createDataFrame(
        rows, "media_ref string, height int, width int, channels int, "
              "data binary")
    got = image_dhash(df).collect()[0]["dhash"]
    v = dhash_array(a)
    assert got == (v - (1 << 64) if v >= (1 << 63) else v)


def test_image_neardup_pairs(spark):
    """dHash banding finds noisy copies, rejects distinct images."""
    import numpy as np

    from ocr_pytorch_spark.operators.multimodal import image_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (100, 140, 3), dtype=np.uint8)
    # low-frequency structure so dhash is stable under noise
    yy, xx = np.mgrid[0:100, 0:140]
    base = ((np.sin(xx / 15) + np.cos(yy / 11) + 2) / 4 * 255) \
        .astype(np.uint8)[:, :, None].repeat(3, 2)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-3, 4, base.shape), 0, 255) \
        .astype(np.uint8)
    other = rng.integers(0, 256, base.shape, dtype=np.uint8)
    rows = [("img-a", *base.shape, bytearray(base.tobytes())),
            ("img-b", *noisy.shape, bytearray(noisy.tobytes())),
            ("img-c", *other.shape, bytearray(other.tobytes()))]
    df = spark.createDataFrame(
        rows, "media_ref string, height int, width int, channels int, "
              "data binary")
    pairs = {(r["ref_a"], r["ref_b"]): r["hamming"]
             for r in image_neardup_pairs(df).collect()}
    assert ("img-a", "img-b") in pairs
    assert pairs[("img-a", "img-b")] <= 6
    assert ("img-a", "img-c") not in pairs
    assert ("img-b", "img-c") not in pairs


def test_neardup_recall_adversarial_bit_placement(spark):
    """Pairs at Hamming 4-6 with flipped bits spread so that EVERY
    16-bit band (the old 4-band layout) differs must still be found:
    the pigeonhole default (8 bands of 8 bits for radius 6) guarantees
    an intact band for any placement of <= 6 flips."""
    from ocr_pytorch_spark.operators.multimodal import hash_neardup_pairs

    base = 0x0123456789ABCDEF
    # worst cases for 4x16 banding: one flip inside each 16-bit band
    spread4 = base ^ ((1 << 3) | (1 << 19) | (1 << 35) | (1 << 51))
    # 6 flips hitting all four 16-bit bands, two bands twice
    spread6 = base ^ ((1 << 0) | (1 << 8) | (1 << 16) | (1 << 31)
                      | (1 << 40) | (1 << 63))
    far = base ^ sum(1 << p for p in range(0, 64, 8))  # hamming 8

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [("h-base", signed(base)), ("h-s4", signed(spread4)),
            ("h-s6", signed(spread6)), ("h-far", signed(far))]
    df = spark.createDataFrame(rows, "media_ref string, dhash long")
    got = {(r["ref_a"], r["ref_b"]): r["hamming"]
           for r in hash_neardup_pairs(df, max_hamming=6,
                                       bands=8).collect()}
    assert got[("h-base", "h-s4")] == 4
    assert got[("h-base", "h-s6")] == 6
    assert ("h-base", "h-far") not in got  # beyond the radius


def test_neardup_rejects_recall_breaking_bands():
    import pyspark.sql  # noqa: F401  (no session needed: raises early)

    from ocr_pytorch_spark.operators.multimodal import image_neardup_pairs

    with pytest.raises(ValueError, match="recall"):
        image_neardup_pairs(None, max_hamming=6, bands=4)
