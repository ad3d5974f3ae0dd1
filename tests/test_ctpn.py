"""CTPN post-processing unit tests against independent naive computations
and the reference's documented degenerate cases."""

import numpy as np

from ocr_pytorch_spark import config as C
from ocr_pytorch_spark.models.ctpn import (
    bbox_transfor_inv, clip_box, filter_bbox, gen_anchor, get_text_lines,
    nms, _GraphBuilder, _fit_y, _sub_graphs_connected,
)

rng = np.random.default_rng(7)


def test_gen_anchor_matches_double_loop():
    """Vectorized meshgrid == the reference's per-cell double loop
    (detect/ctpn_utils.py:68-76) reimplemented naively."""
    heights = np.array(C.ANCHOR_HEIGHTS, float).reshape(-1, 1)
    widths = np.full_like(heights, 16.0)
    base = np.hstack([7.5 - widths / 2, 7.5 - heights / 2,
                      7.5 + widths / 2, 7.5 + heights / 2])
    naive = []
    for i in np.arange(0, 3) * 16:
        for j in np.arange(0, 5) * 16:
            naive.append(base + [j, i, j, i])
    naive = np.array(naive).reshape(-1, 4)
    got = gen_anchor((3, 5), 16)
    np.testing.assert_allclose(got, naive)
    assert got.shape == (150, 4)


def test_bbox_transfor_inv_closed_form():
    anchor = gen_anchor((1, 2), 16)
    regr = np.zeros((1, 20, 2))
    regr[0, :, 0] = 0.5   # Vc
    regr[0, :, 1] = np.log(2.0)  # Vh -> h doubles
    got = bbox_transfor_inv(anchor, regr)
    ha = anchor[:, 3] - anchor[:, 1] + 1
    cya = (anchor[:, 1] + anchor[:, 3]) / 2
    cy = 0.5 * ha + cya
    h = 2.0 * ha
    np.testing.assert_allclose(got[:, 1], cy - h / 2)
    np.testing.assert_allclose(got[:, 3], cy + h / 2)
    # x snapped to the 16-wide strip around anchor center
    np.testing.assert_allclose(got[:, 2] - got[:, 0], 16.0)


def test_clip_and_filter():
    bbox = np.array([[-5.0, -5, 200, 50], [0, 0, 10, 10], [0, 0, 30, 30]])
    clipped = clip_box(bbox.copy(), (100, 150))
    np.testing.assert_array_equal(clipped[0], [0, 0, 149, 50])
    keep = filter_bbox(clipped.astype(np.int32), 16)
    # box 1 is 11x11 (<16) -> dropped; boxes 0 and 2 kept
    np.testing.assert_array_equal(keep, [0, 2])


def naive_nms(dets, thresh):
    """Independent O(n^2) suppression-by-max-score."""
    n = len(dets)
    scores = dets[:, 4]
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(n, bool)
    keep = []
    for oi in order:
        if suppressed[oi]:
            continue
        keep.append(int(oi))
        for oj in order:
            if oj == oi or suppressed[oj]:
                continue
            xx1 = max(dets[oi, 0], dets[oj, 0])
            yy1 = max(dets[oi, 1], dets[oj, 1])
            xx2 = min(dets[oi, 2], dets[oj, 2])
            yy2 = min(dets[oi, 3], dets[oj, 3])
            inter = max(0, xx2 - xx1 + 1) * max(0, yy2 - yy1 + 1)
            a1 = (dets[oi, 2] - dets[oi, 0] + 1) * (dets[oi, 3] - dets[oi, 1] + 1)
            a2 = (dets[oj, 2] - dets[oj, 0] + 1) * (dets[oj, 3] - dets[oj, 1] + 1)
            if inter / (a1 + a2 - inter) > thresh:
                suppressed[oj] = True
    return keep


def test_nms_matches_naive():
    for _ in range(5):
        n = 30
        x1 = rng.uniform(0, 100, n)
        y1 = rng.uniform(0, 100, n)
        dets = np.stack([x1, y1, x1 + rng.uniform(5, 40, n),
                         y1 + rng.uniform(5, 40, n),
                         rng.uniform(0, 1, n)], axis=1)
        assert sorted(nms(dets, 0.3)) == sorted(naive_nms(dets, 0.3))


def test_fit_y_constant_x_degenerate():
    """Constant-X returns y=Y[0] (detect/ctpn_utils.py:380-381)."""
    y1, y2 = _fit_y(np.array([5.0, 5.0, 5.0]), np.array([1.0, 2.0, 3.0]),
                    0.0, 10.0)
    assert y1 == 1.0 and y2 == 1.0


def test_fit_y_linear():
    y1, y2 = _fit_y(np.array([0.0, 1.0, 2.0]), np.array([0.0, 2.0, 4.0]),
                    0.0, 10.0)
    np.testing.assert_allclose([y1, y2], [0.0, 20.0], atol=1e-9)


def test_graph_connects_horizontal_neighbors():
    """Three same-height proposals in a row connect into one line; a far
    4th (gap > 60) stays out."""
    p = np.array([[0, 10, 16, 40], [20, 10, 36, 40], [40, 11, 56, 41],
                  [150, 10, 166, 40]], float)
    s = np.array([0.9, 0.8, 0.85, 0.99])
    g = _GraphBuilder(p, s, (100, 300)).build()
    comps = _sub_graphs_connected(g)
    assert comps == [[0, 1, 2]]


def test_graph_first_nonempty_column_wins():
    """The x-bucket probe stops at the FIRST x with a v-iou match — a
    closer column shadows a farther, higher-scoring one."""
    p = np.array([[0, 10, 16, 40], [18, 10, 34, 40], [30, 10, 46, 40]],
                 float)
    s = np.array([0.5, 0.4, 0.99])
    g = _GraphBuilder(p, s, (100, 300)).build()
    # successor of 0 must be 1 (x=18 before x=30), not the higher-scoring 2
    assert g[0, 1] and not g[0, 2]


def test_get_text_lines_quad_shape_and_score():
    p = np.array([[0, 10, 16, 40], [20, 10, 36, 40], [40, 10, 56, 40]],
                 float)
    s = np.array([0.9, 0.8, 0.7])
    recs = get_text_lines(p, s, (100, 300))
    assert recs.shape == (1, 9)
    np.testing.assert_allclose(recs[0, 8], 0.8)  # mean score
    # flat line: top y == 10-ish, bottom y == 40-ish, x span 0..56
    np.testing.assert_allclose(recs[0, [0, 2]], [0.0, 56.0], atol=1e-9)
    assert recs[0, 1] < recs[0, 5]


def test_isolated_proposal_produces_no_line():
    """A proposal with no graph edges vanishes (Graph.sub_graphs_connected
    only starts chains at nodes with outgoing edges)."""
    p = np.array([[0, 10, 16, 40]], float)
    s = np.array([0.9])
    recs = get_text_lines(p, s, (100, 300))
    assert recs.shape[0] == 0
