"""NumPy image kernels replacing cv2/PIL (neither is installed).

Each kernel re-derives the published definition of the op the reference
calls; since the oracle and the Spark UDFs share these implementations,
oracle/pipeline parity is bit-exact even where a pixel would differ from
cv2/PIL by a rounding ULP (SURVEY.md §7.4 "Resampling fidelity").
"""

from __future__ import annotations

import math

import numpy as np


def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix: output pixel i averages input
    interval [i*s, (i+1)*s), s = n_in/n_out, with fractional edge coverage.
    This is cv2 INTER_AREA for downscale (detect resize,
    detect/ctpn_utils.py:12-41); for upscale it degrades to a 1-2 tap
    linear kernel, which is adequate and deterministic."""
    s = n_in / n_out
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        a, b = i * s, (i + 1) * s
        j0, j1 = int(math.floor(a)), int(math.ceil(b))
        for j in range(j0, min(j1, n_in)):
            cover = min(b, j + 1) - max(a, j)
            if cover > 0:
                w[i, j] = cover
        w[i] /= w[i].sum()
    return w


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resample of (H,W) or (H,W,C) uint8 -> uint8."""
    wh = _area_weights(img.shape[0], out_h)
    ww = _area_weights(img.shape[1], out_w)
    x = img.astype(np.float32)
    if x.ndim == 2:
        out = wh @ x @ ww.T
    else:
        out = np.einsum("oh,hwc,pw->opc", wh, x, ww, optimize=True)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


_LANCZOS_CACHE: dict[tuple, np.ndarray] = {}


def _lanczos_weights(n_in: int, n_out: int, a: int = 3) -> np.ndarray:
    """(n_out, n_in) separable Lanczos-a weights, PIL-style: output center
    (i+0.5)*scale in input space, support a*max(scale,1), weights
    normalized to sum 1 (PIL Image.LANCZOS used by the crop resizer,
    recognize/crnn_recognizer.py:15).  Memoized: pure function of the
    sizes, and the per-row sinc loop was ~8% of single-image OCR."""
    key = (n_in, n_out, a)
    hit = _LANCZOS_CACHE.get(key)
    if hit is not None:
        return hit
    out = _lanczos_weights_impl(n_in, n_out, a)
    if len(_LANCZOS_CACHE) < 4096:  # bound worker-resident memory
        _LANCZOS_CACHE[key] = out
    return out


def _lanczos_weights_impl(n_in: int, n_out: int, a: int) -> np.ndarray:
    scale = n_in / n_out
    support = a * max(scale, 1.0)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        center = (i + 0.5) * scale
        j0 = max(int(math.floor(center - support)), 0)
        j1 = min(int(math.ceil(center + support)), n_in)
        xs = (np.arange(j0, j1) + 0.5 - center) / max(scale, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            k = np.sinc(xs) * np.sinc(xs / a)
        k[np.abs(xs) >= a] = 0.0
        tot = k.sum()
        if tot != 0:
            w[i, j0:j1] = k / tot
        else:  # degenerate: fall back to nearest
            w[i, min(int(center), n_in - 1)] = 1.0
    return w


def resize_lanczos(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Lanczos-3 resample of (H,W) uint8 grayscale -> uint8."""
    wh = _lanczos_weights(img.shape[0], out_h)
    ww = _lanczos_weights(img.shape[1], out_w)
    out = wh @ img.astype(np.float32) @ ww.T
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def grayscale_bgr(img: np.ndarray) -> np.ndarray:
    """cv2 COLOR_BGR2GRAY: Y = 0.299 R + 0.587 G + 0.114 B with R=ch2.

    The reference feeds its (PIL-decoded, RGB-ordered) array straight into
    this BGR conversion (recognize/crnn_recognizer.py:119-120 on the demo
    path) — that channel swap is part of the reference semantics and is
    reproduced as-is by calling this on the RGB array.
    """
    y = (0.114 * img[..., 0].astype(np.float32)
         + 0.587 * img[..., 1].astype(np.float32)
         + 0.299 * img[..., 2].astype(np.float32))
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def _affine_sample_bilinear(img: np.ndarray, minv: np.ndarray,
                            out_h: int, out_w: int,
                            border: float = 255.0) -> np.ndarray:
    """dst(x,y) = src(minv @ (x,y,1)) with bilinear interp and constant
    border (cv2 warpAffine default INTER_LINEAR + borderValue semantics)."""
    ys, xs = np.meshgrid(np.arange(out_h, dtype=np.float32),
                         np.arange(out_w, dtype=np.float32), indexing="ij")
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    h, w = img.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0

    def gather(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = np.clip(yy, 0, h - 1)
        xc = np.clip(xx, 0, w - 1)
        v = img[yc, xc].astype(np.float32)
        if img.ndim == 3:
            return np.where(inside[..., None], v, border)
        return np.where(inside, v, border)

    if img.ndim == 3:
        fx_ = fx[..., None]
        fy_ = fy[..., None]
    else:
        fx_, fy_ = fx, fy
    top = gather(y0, x0) * (1 - fx_) + gather(y0, x0 + 1) * fx_
    bot = gather(y0 + 1, x0) * (1 - fx_) + gather(y0 + 1, x0 + 1) * fx_
    out = top * (1 - fy_) + bot * fy_
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def rotate_crop(img: np.ndarray, degree: float, pt1, pt3) -> np.ndarray:
    """Faithful dumpRotateImage (ocr.py:19-36): rotate the whole image
    about its center by ``degree`` (cv2 getRotationMatrix2D convention,
    positive = CCW), expand the canvas, white border fill, transform the
    top-left / bottom-right quad corners, slice.

    Fast path: |degree| < 1e-9 skips the warp (dominant axis-aligned case).
    """
    height, width = img.shape[:2]
    rad = math.radians(degree)
    height_new = int(width * abs(math.sin(rad)) + height * abs(math.cos(rad)))
    width_new = int(height * abs(math.sin(rad)) + width * abs(math.cos(rad)))
    cx, cy = width // 2, height // 2
    alpha, beta = math.cos(rad), math.sin(rad)
    # forward map (src->dst), cv2.getRotationMatrix2D
    m = np.array([[alpha, beta, (1 - alpha) * cx - beta * cy],
                  [-beta, alpha, beta * cx + (1 - alpha) * cy]],
                 dtype=np.float64)
    m[0, 2] += (width_new - width) // 2
    m[1, 2] += (height_new - height) // 2

    if abs(degree) < 1e-9:
        # m reduces to pure (integer) translation; slice directly.
        tx, ty = m[0, 2], m[1, 2]
        p1x, p1y = pt1[0] + tx, pt1[1] + ty
        p3x, p3y = pt3[0] + tx, pt3[1] + ty
        # emulate border growth if canvas changed (it cannot when angle==0)
        rotated = img
        ydim, xdim = height_new, width_new
    else:
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        minv = np.array([
            [m[1, 1] / det, -m[0, 1] / det,
             (m[0, 1] * m[1, 2] - m[1, 1] * m[0, 2]) / det],
            [-m[1, 0] / det, m[0, 0] / det,
             (m[1, 0] * m[0, 2] - m[0, 0] * m[1, 2]) / det],
        ], dtype=np.float64)
        rotated = _affine_sample_bilinear(img, minv, height_new, width_new)
        p1 = m @ np.array([pt1[0], pt1[1], 1.0])
        p3 = m @ np.array([pt3[0], pt3[1], 1.0])
        p1x, p1y = p1[0], p1[1]
        p3x, p3y = p3[0], p3[1]
        ydim, xdim = rotated.shape[:2]

    y_lo = max(1, int(p1y))
    y_hi = min(ydim - 1, int(p3y))
    x_lo = max(1, int(p1x))
    x_hi = min(xdim - 1, int(p3x))
    return rotated[y_lo:y_hi, x_lo:x_hi]
