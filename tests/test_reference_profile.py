"""Smoke the REFERENCE config profile (detect height 720, as
detect/ctpn_predict.py:20) on one small image — validates that the full
VGG16/BiGRU shapes work at the published geometry, not only the CI
fixture height.  Kept to a single narrow image to bound runtime."""

import numpy as np

from ocr_pytorch_spark.config import PipelineConfig
from ocr_pytorch_spark.models.ctpn import get_det_boxes


def test_detect_at_reference_height_720(bundled_weights):
    ctpn_w, _ = bundled_weights
    cfg = PipelineConfig.reference()
    assert cfg.detect_height == 720
    rng = np.random.default_rng(0)
    img = np.full((40, 24, 3), 220, np.uint8)  # resizes to 720x432
    img[18:25, 4:20] = 30  # one dark bar
    quads, resized = get_det_boxes(img, ctpn_w, cfg)
    assert resized.shape[0] == 720
    assert resized.shape[1] == int(24 * 720 / 40)
    # quads well-formed: (M,9), coords within the resized frame
    assert quads.shape[1] == 9
    if len(quads):
        assert quads[:, [0, 2, 4, 6]].max() <= resized.shape[1] - 1
