"""K2 framed-image sink: composite math + the Spark render path."""

import numpy as np

from ocr_pytorch_spark.kernels.draw import (draw_line, fill_rects_add,
                                            frame_image)


def test_fill_rects_add_translucent_clip():
    img = np.full((10, 10, 3), 240, np.uint8)
    out = fill_rects_add(img, np.array([[2, 3, 5, 6], [4, 4, 6, 6]]),
                         color=(50, 0, 0))
    # untouched pixel
    assert tuple(out[0, 0]) == (240, 240, 240)
    # single fill: 240 + 50 clipped to 255 on R only
    assert tuple(out[3, 2]) == (255, 240, 240)
    # overlap region also clipped (not 240+100 wrapped)
    assert tuple(out[4, 4]) == (255, 240, 240)
    # original untouched (copy semantics)
    assert img[3, 2, 0] == 240


def test_draw_line_thickness_and_clipping():
    img = np.zeros((20, 20, 3), np.uint8)
    draw_line(img, (2, 5), (17, 5), color=(0, 0, 255), thickness=2)
    # on-line pixels set
    assert tuple(img[5, 10]) == (0, 0, 255)
    # thickness spreads one row each side
    assert tuple(img[4, 10]) == (0, 0, 255)
    assert tuple(img[6, 10]) == (0, 0, 255)
    assert tuple(img[8, 10]) == (0, 0, 0)
    # clipping: endpoints beyond the canvas don't crash
    draw_line(img, (-5, -5), (30, 30))
    assert tuple(img[0, 0]) == (0, 0, 255)


def test_frame_image_draws_quad_outline():
    img = np.zeros((40, 60, 3), np.uint8)
    quads = np.array([[5, 5, 50, 5, 5, 30, 50, 30, 0]])
    anchors = np.array([[10, 10, 20, 20]])
    out = frame_image(img, quads, anchors)
    assert tuple(out[5, 25]) == (0, 0, 255)   # top edge
    assert tuple(out[30, 25]) == (0, 0, 255)  # bottom edge
    assert tuple(out[15, 15]) == (50, 0, 0)   # anchor fill interior
    assert tuple(out[35, 55]) == (0, 0, 0)    # outside untouched


def test_frame_image_draws_score_label():
    """K2 parity completion: the putText score label
    (ctpn_predict.py:103 — str(round(score*100, 2)) + '%' at
    (x1+13, y1+13), color (255,0,0)) is rendered."""
    from ocr_pytorch_spark.kernels.draw import _FONT_5X7, draw_text

    img = np.zeros((120, 200, 3), np.uint8)
    quads = np.array([[10.0, 40, 180, 40, 10, 90, 180, 90, 0.875]])
    out = frame_image(img, quads, np.empty((0, 4)))
    # label pixels exist in (255,0,0) somewhere in the label box
    label_region = out[40 + 13 - 21:40 + 13, 10 + 13:10 + 13 + 6 * 3 * 6]
    red = (label_region[..., 0] == 255) & (label_region[..., 1] == 0) \
        & (label_region[..., 2] == 0)
    assert red.any(), "no label pixels rendered"
    # and they match the exact glyph stamp for '87.5%'
    want = np.zeros_like(img)
    draw_text(want, "87.5%", (10 + 13, 40 + 13))
    assert np.array_equal((out == (255, 0, 0)).all(axis=2),
                          (want == (255, 0, 0)).all(axis=2))
    # every label character has a glyph
    assert set("0123456789.%") <= set(_FONT_5X7)


def test_spark_framed_sink(spark, bundled_weights, fixture_cfg,
                           tmp_path_factory):
    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.kernels.png import decode_png
    from ocr_pytorch_spark.operators.extract import file_weights_spec
    from ocr_pytorch_spark.operators.framed import write_framed

    src = tmp_path_factory.mktemp("framed_src")
    _, img_path = datagen.write_fixture(str(src), 4)
    imgs = spark.read.parquet(img_path)
    dst = str(tmp_path_factory.mktemp("framed_dst") / "framed")
    write_framed(imgs, file_weights_spec(), dst, fixture_cfg)

    rows = spark.read.parquet(dst).collect()
    assert len(rows) == imgs.count()
    ctpn_w, _ = bundled_weights
    from ocr_pytorch_spark.models.ctpn import get_det_boxes

    for r in rows[:2]:
        arr = decode_png(bytes(r["png"]))
        assert arr.shape == (r["height"], r["width"], 3)
    # cross-check one image end-to-end against the single-process path
    any_row = rows[0]
    raw = {x["media_ref"]: x for x in imgs.collect()}[any_row["media_ref"]]
    img = np.frombuffer(bytes(raw["data"]), np.uint8).reshape(
        raw["height"], raw["width"], raw["channels"])
    quads, resized, anchors = get_det_boxes(img, ctpn_w, fixture_cfg,
                                            return_anchors=True)
    from ocr_pytorch_spark.kernels.draw import frame_image as fi

    want = fi(resized, quads, anchors)
    got = decode_png(bytes(any_row["png"]))
    assert np.array_equal(got, want)
