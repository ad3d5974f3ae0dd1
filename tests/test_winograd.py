"""Winograd F(2x2,3x3) conv path (kernels/nn._conv2d_winograd3x3).

The dispatch window is a pure function of the call shapes, so oracle
and UDFs always take the same path — bit-determinism holds per shape.
These tests pin numerical agreement with the im2col path, the window
boundaries, and the weight-transform cache.
"""

import numpy as np
import pytest

from ocr_pytorch_spark.kernels import nn

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("C,H,W,O,pad", [
    (256, 46, 60, 256, 1),   # inside the window (P = 690)
    (512, 40, 60, 512, 1),   # inside (P = 600)
    (512, 33, 47, 256, 0),   # odd dims, no padding (P = 384... gated?)
])
def test_winograd_matches_im2col(C, H, W, O, pad):
    x = RNG.standard_normal((1, C, H, W)).astype(np.float32)
    w = RNG.standard_normal((O, C, 3, 3)).astype(np.float32) * 0.05
    b = RNG.standard_normal(O).astype(np.float32)
    wino = nn._conv2d_winograd3x3(x, w, b, pad, pad, True)
    old = nn._WINOGRAD_MIN_C
    nn._WINOGRAD_MIN_C = 10 ** 9
    try:
        ref = nn.conv2d(x, w, b, 1, pad, relu=True)
    finally:
        nn._WINOGRAD_MIN_C = old
    assert wino.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(wino - ref).max() / scale < 1e-5


def test_dispatch_window():
    """Only C >= MIN_C with MIN_TILES <= P <= MAX_TILES dispatches."""
    calls = []
    orig = nn._conv2d_winograd3x3

    def spy(x, w, b, ph, pw, relu):
        calls.append(x.shape)
        return orig(x, w, b, ph, pw, relu)

    nn._conv2d_winograd3x3 = spy
    try:
        w512 = RNG.standard_normal((8, 512, 3, 3)).astype(np.float32)
        w64 = RNG.standard_normal((8, 64, 3, 3)).astype(np.float32)
        # inside the window
        nn.conv2d(RNG.standard_normal((1, 512, 60, 60))
                  .astype(np.float32), w512, None, 1, 1)
        assert len(calls) == 1
        # P too small (fixture-profile deep layer)
        nn.conv2d(RNG.standard_normal((1, 512, 6, 24))
                  .astype(np.float32), w512, None, 1, 1)
        assert len(calls) == 1
        # C too small
        nn.conv2d(RNG.standard_normal((1, 64, 60, 60))
                  .astype(np.float32), w64, None, 1, 1)
        assert len(calls) == 1
        # stride 2 never dispatches
        nn.conv2d(RNG.standard_normal((1, 512, 60, 60))
                  .astype(np.float32), w512, None, 2, 1)
        assert len(calls) == 1
    finally:
        nn._conv2d_winograd3x3 = orig


def test_weight_transform_cached_by_identity():
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    u1 = nn._wino_weight_transform(w)
    u2 = nn._wino_weight_transform(w)
    assert u1 is u2
    # a different array (even equal-valued) gets its own transform
    u3 = nn._wino_weight_transform(w.copy())
    assert u3 is not u1
    np.testing.assert_array_equal(u1, u3)
