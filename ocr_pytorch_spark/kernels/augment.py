"""Deterministic augmentation bank (SURVEY §2.11).

The reference's CRNN training pipeline perturbs every sample through a
probability-gated 12-op transform chain
(``train_code/train_crnn/trans.py:21-236``, wired in
``mydataset.py:17-43,101-122``).  Training itself is out of scope for
an extraction engine, but the ops are rebuilt here as *deterministic,
seeded* NumPy transforms with two jobs:

1. fixture/bench diversification — synthetic corpora stop being
   uniformly clean, so OCR robustness paths (blur, salt, JPEG loss,
   stretch) are actually exercised;
2. reference-surface completeness — each op reproduces the cited
   trans.py semantics (including two reference quirks, noted inline).

All randomness is an explicit ``np.random.default_rng(seed)`` or an
explicit parameter — no global RNG state, so any augmented fixture is
a pure function of (image, seed), same as the rest of datagen.

Images are (H, W, 3) uint8 RGB (or (H, W) grayscale where noted).
Pixel-level parity with PIL/cv2 is not a goal (neither is installed);
semantic parity and determinism are.
"""

from __future__ import annotations

import numpy as np

from ocr_pytorch_spark.kernels.image import resize_area


def _clip8(a) -> np.ndarray:
    return np.clip(np.rint(a), 0, 255).astype(np.uint8)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """RandomBrightness (trans.py:45-55): PIL ImageEnhance.Brightness —
    scale toward black.  NOTE trans.py:34-43 ``RandomContrast`` also
    constructs ImageEnhance.*Brightness* (a reference quirk), so this
    one kernel serves both chain slots."""
    return _clip8(img.astype(np.float64) * factor)


adjust_contrast = adjust_brightness  # trans.py:41 uses Brightness too


def adjust_color(img: np.ndarray, factor: float) -> np.ndarray:
    """RandomColor (trans.py:57-66): blend between the grayscale
    (ITU-R 601 luma, PIL convert('L')) and the original — factor 0 is
    grayscale, 1 identity, >1 oversaturated."""
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    return _clip8(luma + factor * (img.astype(np.float64) - luma))


def adjust_sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """RandomSharpness (trans.py:68-77): PIL ImageEnhance.Sharpness —
    blend between a 3x3 SMOOTH-filtered copy (kernel [[1,1,1],[1,5,1],
    [1,1,1]]/13) and the original; 0 = smooth, 1 = identity, 2 = sharp."""
    f = img.astype(np.float64)
    pad = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
    acc = np.zeros_like(f)
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            acc += k[dy, dx] * pad[dy:dy + f.shape[0],
                                   dx:dx + f.shape[1]]
    smooth = acc / k.sum()
    return _clip8(smooth + factor * (f - smooth))


def jpeg_compress(img: np.ndarray, quality: int) -> np.ndarray:
    """Compress (trans.py:79-92): a real JPEG encode->decode round trip
    (cv2.imencode/imdecode in the reference; the pure-NumPy baseline
    codec here), so the artifact structure is genuine DCT loss."""
    from ocr_pytorch_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    return decode_jpeg(encode_jpeg(img, quality=quality))


def exposure(img: np.ndarray, rect: tuple[int, int, int, int],
             lift: int = 80) -> np.ndarray:
    """Exposure (trans.py:94-117): brighten a rectangle (x0, y0, x1,
    y1) — a reflection/flash patch.  NOTE: the reference converts its
    mask to ndarray *before* drawing the rectangle into the PIL mask
    (trans.py:108-112), making the published op a no-op; this
    implements the evident intent (mask-lift inside the rect), which
    is also what makes it useful as a fixture synthesizer."""
    x0, y0, x1, y1 = rect
    out = img.astype(np.int64).copy()
    out[y0:y1, x0:x1] += lift
    return _clip8(out)


def rotate_expand(img: np.ndarray, degrees: float) -> np.ndarray:
    """Rotate (trans.py:120-131): rotate about the center with an
    expanded canvas (PIL rotate(expand=True)), nearest sampling,
    black fill."""
    h, w = img.shape[:2]
    rad = np.deg2rad(degrees)
    c, s = np.cos(rad), np.sin(rad)
    # expanded canvas size (PIL: bbox of the rotated corners);
    # round 1e-10 first so cos(90 deg) = 6e-17 doesn't ceil an extra px
    nw = int(np.ceil(round(abs(w * c) + abs(h * s), 10)))
    nh = int(np.ceil(round(abs(w * s) + abs(h * c), 10)))
    yy, xx = np.mgrid[0:nh, 0:nw]
    # inverse map: output center -> input center, rotate by -degrees
    cx_o, cy_o = (nw - 1) / 2.0, (nh - 1) / 2.0
    cx_i, cy_i = (w - 1) / 2.0, (h - 1) / 2.0
    dx, dy = xx - cx_o, yy - cy_o
    sx = np.rint(c * dx - s * dy + cx_i).astype(np.int64)
    sy = np.rint(s * dx + c * dy + cy_i).astype(np.int64)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out = np.zeros((nh, nw) + img.shape[2:], dtype=np.uint8)
    out[valid] = img[sy[valid], sx[valid]]
    return out


def gaussian_blur(img: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Blur (trans.py:133-144): Gaussian blur, sigma = radius (PIL
    GaussianBlur convention), separable, edge-replicated."""
    sigma = max(radius, 1e-6)
    half = max(1, int(np.ceil(3 * sigma)))
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    f = img.astype(np.float64)
    pad = np.pad(f, ((half, half), (0, 0), (0, 0)), mode="edge")
    f = sum(k[i] * pad[i:i + img.shape[0]] for i in range(k.size))
    pad = np.pad(f, ((0, 0), (half, half), (0, 0)), mode="edge")
    f = sum(k[i] * pad[:, i:i + img.shape[1]] for i in range(k.size))
    return _clip8(f)


def salt_noise(img: np.ndarray, rate: float = 0.02,
               seed: int = 0) -> np.ndarray:
    """Salt (trans.py:146-157): rate*H*W random pixels set to random
    gray values — seeded, so a pure function of (image, seed)."""
    rng = np.random.default_rng(seed)
    h, w = img.shape[:2]
    n = int(h * w * rate)
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    vals = rng.integers(0, 255, n)
    out = img.copy()
    out[ys, xs] = vals[:, None] if img.ndim == 3 else vals
    return out


def adjust_resolution(img: np.ndarray, rate: float) -> np.ndarray:
    """AdjustResolution (trans.py:160-174): resize down by ``rate``
    then back up to the original size — resolution loss with exact
    shape preservation (area down, nearest up)."""
    h, w = img.shape[:2]
    h2, w2 = max(1, int(h * rate)), max(1, int(w * rate))
    small = resize_area(img, h2, w2)
    ys = np.minimum((np.arange(h) * h2 // h), h2 - 1)
    xs = np.minimum((np.arange(w) * w2 // w), w2 - 1)
    return small[ys][:, xs]


def _perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points -> 4 dst points
    (cv2.getPerspectiveTransform: 8x8 linear solve)."""
    a, b = [], []
    for (x, y), (u, v) in zip(src, dst):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    h = np.linalg.solve(np.array(a, dtype=np.float64),
                        np.array(b, dtype=np.float64))
    return np.append(h, 1.0).reshape(3, 3)


def perspective_jitter(img: np.ndarray,
                       jitter: tuple[int, int, int, int]) -> np.ndarray:
    """Crop (trans.py:177-189): perturb the 4 corner y-coordinates by
    ``jitter = (top_left, top_right, bottom_left, bottom_right)`` and
    warp back to the full frame — the slight perspective skew of a
    hand-held photo.  Nearest inverse-map warp, black fill."""
    h, w = img.shape[:2]
    j0, j1, j2, j3 = jitter
    src = np.array([[0, j0], [w, j1], [0, h - j2], [w, h - j3]],
                   dtype=np.float64)
    dst = np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=np.float64)
    hm = np.linalg.inv(_perspective_matrix(src, dst))  # dst -> src
    yy, xx = np.mgrid[0:h, 0:w]
    ones = np.ones_like(xx, dtype=np.float64)
    pts = np.stack([xx, yy, ones])
    m = np.tensordot(hm, pts, axes=1)
    sx = np.rint(m[0] / m[2]).astype(np.int64)
    sy = np.rint(m[1] / m[2]).astype(np.int64)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out = np.zeros_like(img)
    out[valid] = img[sy[valid], sx[valid]]
    return out


def crop_box(img: np.ndarray, left: int, top: int, right: int,
             bottom: int) -> np.ndarray:
    """Crop2 (trans.py:191-224): plain clipped box crop (the
    reference's happy path — its perspective fallback is dead code
    behind an unconditional return at trans.py:205)."""
    h, w = img.shape[:2]
    left, right = np.clip([left, right], 0, w - 1)
    top, bottom = np.clip([top, bottom], 0, h - 1)
    return img[top:bottom, left:right].copy()


def stretch(img: np.ndarray, rate: float) -> np.ndarray:
    """Stretch (trans.py:226-236): horizontal rescale to w*rate, height
    kept — the aspect-ratio jitter CRNN must absorb."""
    h, w = img.shape[:2]
    return resize_area(img, h, max(1, int(w * rate)))


def invert(img: np.ndarray) -> np.ndarray:
    """inverse_color (mydataset.py:91-94): ImageOps.invert."""
    return (255 - img.astype(np.int64)).astype(np.uint8)


def augment_chain(img: np.ndarray, seed: int) -> np.ndarray:
    """The reference's probability-gated chain (mydataset.py:101-122,
    gates :17-29: crop 0.1, contrast/brightness/color/sharpness 0.1,
    compress 0.3, adjust_resolution 0.1, blur 0.1, exposure 0.1,
    salt 0.1, invert 0.4, stretch 0.1; compress/resolution/blur only
    when height >= 32) — with every gate and parameter drawn from one
    seeded RNG, so the output is a pure function of (image, seed)."""
    rng = np.random.default_rng(seed)
    h, w = img.shape[:2]
    if rng.random() < 0.1:  # Crop: corner jitter in [0, maxv=2)
        img = perspective_jitter(img, tuple(rng.integers(0, 2, 4)))
    if rng.random() < 0.1:
        img = adjust_contrast(img, rng.uniform(0.5, 1.5))
    if rng.random() < 0.1:
        img = adjust_brightness(img, rng.uniform(0.5, 1.5))
    if rng.random() < 0.1:
        img = adjust_color(img, rng.uniform(0.5, 1.5))
    if rng.random() < 0.1:
        img = adjust_sharpness(img, rng.uniform(0.5, 1.5))
    if img.shape[0] >= 32:
        if rng.random() < 0.3:
            img = jpeg_compress(img, int(rng.integers(5, 86)))
        if rng.random() < 0.1:
            img = adjust_resolution(img, rng.uniform(0.5, 0.95))
        if rng.random() < 0.1:
            img = gaussian_blur(img, 1.0)
    if rng.random() < 0.1:
        h2, w2 = img.shape[:2]
        x0, y0 = int(rng.integers(0, w2)), int(rng.integers(0, h2))
        x1, y1 = int(rng.integers(x0, w2 + 1)), \
            int(rng.integers(y0, h2 + 1))
        img = exposure(img, (x0, y0, x1, y1),
                       lift=int(rng.integers(50, 106)))
    if rng.random() < 0.1:
        img = salt_noise(img, 0.02, seed=int(rng.integers(0, 2 ** 31)))
    if rng.random() < 0.4:
        img = invert(img)
    if rng.random() < 0.1:
        img = stretch(img, rng.uniform(0.8, 1.2))
    return img
