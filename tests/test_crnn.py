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


def test_full_alphabet_resource():
    """The checked-in resource mirrors recognize/alphabet.pkl: 5834
    sorted unique chars, printable-ASCII prefix, nclass 5835
    (recognize/keys.py:21-23, crnn_recognizer.py:104)."""
    from ocr_pytorch_spark.models import alphabet as A

    full = A.full_alphabet()
    assert len(full) == 5834 and len(set(full)) == 5834
    assert list(full) == sorted(full)  # keys.py builds it sorted
    assert full[:95] == A.ALPHABET  # fixture is a strict prefix
    assert A.full_nclass() == 5835
    # CJK round-trip through the codec
    text = "深度学习"
    codes = A.encode(text, full)
    assert all(c > 0 for c in codes)
    assert A.ctc_collapse(
        [codes[0], 0, codes[1], 0, codes[2], codes[2], 0, codes[3]],
        full) == text
    assert A.alphabet_for_nclass(96) == A.ALPHABET
    assert A.alphabet_for_nclass(5835) == full


def test_recognize_with_full_nclass_head(fixture_cfg):
    """A full-size (nclass 5835) head — the real-checkpoint shape —
    runs end-to-end and decodes through the full alphabet."""
    import numpy as np

    from ocr_pytorch_spark.models import alphabet as A
    from ocr_pytorch_spark.models import weights as W
    from ocr_pytorch_spark.models.crnn import recognize

    w = W.gen_crnn_weights(nclass=A.full_nclass())
    assert w["rnn.1.embedding.weight"].shape[0] == 5835
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 96, 3), dtype=np.uint8)
    out = recognize(img, w)
    assert isinstance(out, str)
    assert all(ch in A.full_alphabet() for ch in out)
    # random 5835-way heads essentially always emit some non-ASCII
    assert len(out) > 0
