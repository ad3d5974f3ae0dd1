"""Framed-image rendering (SURVEY §2 K2) — pure NumPy.

Reproduces the reference's debug visualization
(detect/ctpn_predict.py:88-109): a translucent (50, 0, 0) fill over
every kept proposal anchor (filled rects on a blank canvas, added and
clipped at 255), then the text-line quads outlined with thickness-2
(0, 0, 255) lines.  The cv2.putText score label is intentionally
omitted (font-glyph rendering adds no analytical value; scores live in
the spans/boxes tables).

Lines are drawn by dense sampling along the segment + a thickness
stamp — deterministic, no cv2; pixel-for-pixel cv2 parity is not a
goal (K2 is visualization-only), coordinate placement is.
"""

from __future__ import annotations

import numpy as np


def fill_rects_add(img: np.ndarray, rects: np.ndarray,
                   color=(50, 0, 0)) -> np.ndarray:
    """Add `color` inside each (x1,y1,x2,y2) rect, clipped at 255
    (ctpn_predict.py:89-95's blank + image composite)."""
    h, w = img.shape[:2]
    acc = np.zeros_like(img, dtype=np.int32)
    col = np.asarray(color, dtype=np.int32)
    for x1, y1, x2, y2 in np.asarray(rects, dtype=np.int64)[:, :4]:
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        acc[y1:y2 + 1, x1:x2 + 1] += col
    return np.clip(img.astype(np.int32) + acc, 0, 255).astype(np.uint8)


def draw_line(img: np.ndarray, p1, p2, color=(0, 0, 255),
              thickness: int = 2) -> None:
    """In-place thick segment: sample >= 2*len points, stamp a
    (2t+1)-square at each (bounded, vectorized per segment)."""
    h, w = img.shape[:2]
    x1, y1 = p1
    x2, y2 = p2
    n = int(2 * max(abs(x2 - x1), abs(y2 - y1), 1)) + 1
    xs = np.rint(np.linspace(x1, x2, n)).astype(np.int64)
    ys = np.rint(np.linspace(y1, y2, n)).astype(np.int64)
    t = max(thickness // 2, 1)
    offs = np.arange(-t, t + 1)
    gx = (xs[:, None, None] + offs[None, :, None]).ravel()
    gy = (ys[:, None, None] + offs[None, None, :]).ravel()
    keep = (gx >= 0) & (gx < w) & (gy >= 0) & (gy < h)
    img[gy[keep], gx[keep]] = np.asarray(color, dtype=img.dtype)


def frame_image(image: np.ndarray, text_quads: np.ndarray,
                anchors: np.ndarray) -> np.ndarray:
    """(H,W,3) resized image + (M,9) quads + (K,>=4) anchors ->
    framed RGB uint8 (ctpn_predict.py:88-103 composite order)."""
    out = fill_rects_add(image, anchors) if len(anchors) \
        else image.copy()
    for q in np.asarray(text_quads, dtype=np.int64):
        draw_line(out, (q[0], q[1]), (q[2], q[3]))
        draw_line(out, (q[0], q[1]), (q[4], q[5]))
        draw_line(out, (q[6], q[7]), (q[2], q[3]))
        draw_line(out, (q[4], q[5]), (q[6], q[7]))
    return out
