"""Pure-NumPy PNG codec + Spark ingestion path.

Bit-exactness is checked three ways: hand-built byte-level PNGs with
hand-computed expected pixels (spec-level check, independent of the
encoder), encoder round-trips across every filter type, and the
reference repo's real demo inputs (test_images/*.png — RGBA and
palette) decoding to their IHDR dimensions."""

import os
import struct
import zlib

import numpy as np
import pytest

from ocr_pytorch_spark.kernels.png import (PngFormatError, decode_png,
                                           encode_png)

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", crc))


def _manual_png(w, h, color, raw_scanlines: bytes,
                plte: bytes | None = None) -> bytes:
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                       0, 0, 0))
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return out + _chunk(b"IEND", b"")


def test_handbuilt_rgb_filters_sub_up():
    # 2x2 RGB: row0 filter 1 (Sub): raw (10,20,30),(5,5,5)
    #   -> px (10,20,30),(15,25,35)
    # row1 filter 2 (Up): raw (1,2,3),(100,0,200)
    #   -> px (11,22,33),(115,25,235)
    raw = (b"\x01" + bytes([10, 20, 30, 5, 5, 5])
           + b"\x02" + bytes([1, 2, 3, 100, 0, 200]))
    img = decode_png(_manual_png(2, 2, 2, raw))
    want = np.array([[[10, 20, 30], [15, 25, 35]],
                     [[11, 22, 33], [115, 25, 235]]], np.uint8)
    assert np.array_equal(img, want)


def test_handbuilt_average_paeth():
    # 1-channel gray, 3 px wide.
    # row0 Average: raw 10, 20, 30 -> px 10, 20+10//2=25, 30+25//2=42
    # row1 Paeth: left/up/upleft predictors
    #   px0: raw 1 + paeth(0, 10, 0)=10 -> 11
    #   px1: raw 2 + paeth(11, 25, 10): p=26 -> pa=15,pb=1,pc=16 -> 25
    #        -> 27
    #   px2: raw 3 + paeth(27, 42, 25): p=44 -> pa=17,pb=2,pc=19 -> 42
    #        -> 45
    raw = (b"\x03" + bytes([10, 20, 30])
           + b"\x04" + bytes([1, 2, 3]))
    img = decode_png(_manual_png(3, 2, 0, raw))
    want_gray = np.array([[10, 25, 42], [11, 27, 45]], np.uint8)
    assert np.array_equal(img, np.repeat(want_gray[:, :, None], 3, 2))


def test_handbuilt_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = b"\x00" + bytes([0, 2]) + b"\x00" + bytes([1, 1])
    img = decode_png(_manual_png(2, 2, 3, raw, plte))
    want = np.array([[[255, 0, 0], [0, 0, 255]],
                     [[0, 255, 0], [0, 255, 0]]], np.uint8)
    assert np.array_equal(img, want)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ft):
    rng = np.random.default_rng(ft)
    rgb = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb, ft)), rgb)
    gray = rng.integers(0, 256, (9, 31), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray, ft)),
                          np.repeat(gray[:, :, None], 3, 2))


def test_reference_demo_inputs_decode():
    """The reference's own inputs (demo.py:11) must enter the engine:
    t1 is 8-bit RGBA 609x469 per its IHDR."""
    with open(os.path.join(ASSETS, "ref_t1.png"), "rb") as f:
        img = decode_png(f.read())
    assert img.shape == (469, 609, 3)
    assert img.dtype == np.uint8
    assert img.std() > 1  # a real photo, not a constant field


def test_corrupt_png_raises():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")


def test_spark_png_ingest_to_ocr(spark, bundled_weights, fixture_cfg):
    """End-to-end: PNG corpus (all 5 filter types + the reference
    image) -> binary rows -> decode -> raw images table -> OCR."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.operators.extract import (file_weights_spec,
                                                     ocr_transcripts)
    from ocr_pytorch_spark.sources import png as PNG

    refs = [f"img-png-{i:04d}" for i in range(5)]
    corpus = PNG.encode_fixture_pngs(spark, refs)
    real = PNG.read_png_dir(spark, ASSETS)
    poisoned = corpus.unionByName(real).unionByName(
        spark.createDataFrame([("img-bad", b"\x89PNGgarbage")],
                              "media_ref string, content binary"))
    images = PNG.decode_png_images(poisoned)
    rows = {r["media_ref"]: r for r in images.collect()}
    assert rows["ref_t1.png"]["height"] == 469
    assert rows["img-bad"]["height"] == -1  # poison row, not a crash
    errs = PNG.png_errors(images).collect()
    assert [e["media_ref"] for e in errs] == ["img-bad"]

    # decoded fixture bytes == the raw fixture array (codec is exact)
    for ref in refs:
        want, _ = datagen.gen_image_array(ref)
        got = rows[ref]
        assert (got["height"], got["width"], got["channels"]) \
            == want.shape
        assert bytes(got["data"]) == want.tobytes()

    ok = images.where(F.col("height") > 0)
    spans = ocr_transcripts(ok, ok.select("media_ref"),
                            file_weights_spec(), fixture_cfg)
    got = spans.where(F.col("box_order") >= 0).collect()
    assert len(got) > 0
    # fixture images OCR identically whether ingested raw or via PNG
    from ocr_pytorch_spark.oracle import ocr_image

    ctpn_w, crnn_w = bundled_weights
    for ref in refs:
        img, _ = datagen.gen_image_array(ref)
        want = [(o, t) for o, t in ocr_image(img, ctpn_w, crnn_w,
                                             fixture_cfg)]
        have = sorted((r["box_order"], r["text"]) for r in got
                      if r["media_ref"] == ref)
        assert have == sorted(want)


def test_multi_idat_and_gray_alpha():
    """Decoder handles split IDAT streams and color type 4."""
    import zlib

    rng = np.random.default_rng(9)
    # build a gray+alpha (type 4) PNG manually with IDAT split in 3
    g = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    a = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    raw = b""
    for y in range(6):
        row = np.empty(14, np.uint8)
        row[0::2] = g[y]
        row[1::2] = a[y]
        raw += b"\x00" + row.tobytes()
    comp = zlib.compress(raw)
    thirds = [comp[:len(comp) // 3], comp[len(comp) // 3:2 * len(comp) // 3],
              comp[2 * len(comp) // 3:]]
    png = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 4, 0, 0, 0))
    for t in thirds:
        png += _chunk(b"IDAT", t)
    png += _chunk(b"IEND", b"")
    img = decode_png(png)
    assert np.array_equal(img, np.repeat(g[:, :, None], 3, 2))
