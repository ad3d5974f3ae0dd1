"""CRNN forward / preprocessing / CTC decode unit tests."""

import numpy as np

from ocr_pytorch_spark.models.alphabet import ALPHABET, NCLASS, ctc_collapse, encode
from ocr_pytorch_spark.models.crnn import crnn_forward, recognize, resize_normalize

rng = np.random.default_rng(3)


def test_alphabet_structure():
    assert len(ALPHABET) == 95 and NCLASS == 96
    assert ALPHABET[0] == " " and ALPHABET[-1] == "~"


def test_encode_oov_zero():
    assert encode("A b") == [ALPHABET.index("A") + 1, 1,
                             ALPHABET.index("b") + 1]
    assert encode("é") == [0]  # OOV -> 0 (crnn_recognizer.py:63-64)


def test_ctc_collapse_rules():
    a = ALPHABET.index("a") + 1
    b = ALPHABET.index("b") + 1
    # blanks dropped, repeats collapsed, blank separates repeats
    assert ctc_collapse(np.array([0, a, a, 0, a, b, b])) == "aab"
    assert ctc_collapse(np.array([a])) == "a"
    assert ctc_collapse(np.array([0, 0])) == ""
    assert ctc_collapse(np.array([], dtype=int)) == ""


def test_resize_normalize_range_and_shape():
    g = rng.integers(0, 255, size=(20, 100)).astype(np.uint8)
    out = resize_normalize(g, int(100 / 20 * 32))
    assert out.shape == (1, 32, 160)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_resize_normalize_pad_branch():
    """target wider than aspect-preserved width -> zero right-pad at
    start=0 (is_test branch, crnn_recognizer.py:34-38)."""
    g = np.full((32, 32), 255, np.uint8)
    out = resize_normalize(g, 64)
    assert out.shape == (1, 32, 64)
    np.testing.assert_allclose(out[0, :, :32], 1.0)
    np.testing.assert_allclose(out[0, :, 32:], 0.0)


def test_crnn_forward_t_equals_w_over_4_plus_1(bundled_weights):
    _, crnn_w = bundled_weights
    for w in (32, 64, 100):
        x = rng.normal(size=(1, 1, 32, w)).astype(np.float32)
        out = crnn_forward(x, crnn_w)
        assert out.shape == (w // 4 + 1, 1, NCLASS)


def test_recognize_deterministic_and_stripped(bundled_weights):
    _, crnn_w = bundled_weights
    crop = rng.integers(0, 255, size=(12, 60, 3)).astype(np.uint8)
    t1 = recognize(crop, crnn_w)
    t2 = recognize(crop, crnn_w)
    assert t1 == t2
    assert t1 == t1.strip()
