"""Oracle-level tests: determinism, non-vacuity, degenerate cases,
document-level span semantics."""

import numpy as np

from ocr_pytorch_spark import datagen, oracle


def test_sort_box_reading_order():
    recs = np.zeros((3, 9))
    recs[0, [1, 3, 5, 7]] = 100  # bottom
    recs[1, [1, 3, 5, 7]] = 10   # top
    recs[2, [1, 3, 5, 7]] = 50   # middle
    got = oracle.sort_box(recs)
    assert list(got[:, 1]) == [10, 50, 100]


def test_image_generation_deterministic():
    a, _ = datagen.gen_image_array("img-x")
    b, _ = datagen.gen_image_array("img-x")
    np.testing.assert_array_equal(a, b)
    c, _ = datagen.gen_image_array("img-y")
    assert a.shape != c.shape or not np.array_equal(a, c)


def test_ocr_image_deterministic_and_nonvacuous(bundled_weights,
                                                fixture_cfg):
    ctpn_w, crnn_w = bundled_weights
    results = []
    for i in range(8):
        img, _ = datagen.gen_image_array(f"img-{i:08d}-0000")
        r1 = oracle.ocr_image(img, ctpn_w, crnn_w, fixture_cfg)
        r2 = oracle.ocr_image(img, ctpn_w, crnn_w, fixture_cfg)
        assert r1 == r2
        results.append(r1)
    # fixtures must exercise the full pipeline: most images yield text
    assert sum(1 for r in results if r) >= 5
    # and produce more than one distinct transcript overall
    assert len({t for r in results for _, t in r}) >= 2


def test_empty_image_no_spans(bundled_weights, fixture_cfg):
    ctpn_w, crnn_w = bundled_weights
    img = np.full((64, 160, 3), 230, np.uint8)  # blank background
    res = oracle.ocr_image(img, ctpn_w, crnn_w, fixture_cfg)
    # blank image should give zero or very few boxes; never crash
    assert isinstance(res, list)


def test_extract_document_span_semantics(bundled_weights, fixture_cfg):
    ctpn_w, crnn_w = bundled_weights
    doc = {
        "doc_id": "doc-test",
        "spans": [
            {"kind": "text", "text": "hello", "media_ref": None,
             "offset": 0},
            {"kind": "media", "text": None,
             "media_ref": "img-00000002-0000", "offset": 1},
            {"kind": "text", "text": "world", "media_ref": None,
             "offset": 2},
        ],
    }
    out = oracle.extract_document(
        doc, lambda ref: datagen.gen_image_array(ref)[0],
        ctpn_w, crnn_w, fixture_cfg)
    spans = out["spans"]
    # text spans pass through untouched, in order
    assert spans[0]["text"] == "hello" and spans[0]["media_ref"] is None
    assert spans[-1]["text"] == "world"
    # offsets renumbered consecutively
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    # every span is text-kind in the output
    assert all(s["kind"] == "text" for s in spans)
    # OCR spans (if any) carry provenance media_ref and sit between
    mids = spans[1:-1]
    assert all(s["media_ref"] == "img-00000002-0000" for s in mids)
