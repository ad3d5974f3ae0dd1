"""Framed-image rendering (SURVEY §2 K2) — pure NumPy.

Reproduces the reference's debug visualization
(detect/ctpn_predict.py:88-109): a translucent (50, 0, 0) fill over
every kept proposal anchor (filled rects on a blank canvas, added and
clipped at 255), the text-line quads outlined with thickness-2
(0, 0, 255) lines, and the per-line score label
(``str(round(score*100, 2)) + '%'`` at (x1+13, y1+13), color
(255, 0, 0) — ctpn_predict.py:103's cv2.putText) rendered from a
built-in 5x7 bitmap font scaled 3x.

Lines are drawn by dense sampling along the segment + a thickness
stamp — deterministic, no cv2; pixel-for-pixel cv2 parity is not a
goal (K2 is visualization-only), coordinate/content placement is.
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


# 5x7 bitmap glyphs (rows top->bottom, 5 bits each, MSB = left column)
# covering the score-label alphabet: digits, decimal point, percent.
_FONT_5X7 = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    "%": (0x18, 0x19, 0x02, 0x04, 0x08, 0x13, 0x03),
}


def draw_text(img: np.ndarray, s: str, org, color=(255, 0, 0),
              scale: int = 3) -> None:
    """In-place bitmap text.  ``org`` is the label's bottom-left corner
    (cv2.putText convention); each glyph is a 5x7 bitmap scaled
    ``scale``x with a 1-column advance gap; characters outside the
    font are skipped (the score label never contains any)."""
    h, w = img.shape[:2]
    col = np.asarray(color, dtype=img.dtype)
    x, y_top = int(org[0]), int(org[1]) - 7 * scale
    for ch in s:
        rows = _FONT_5X7.get(ch)
        if rows is not None:
            bits = np.array(
                [[(r >> (4 - c)) & 1 for c in range(5)] for r in rows],
                dtype=bool)
            mask = np.kron(bits, np.ones((scale, scale), dtype=bool))
            ys, xs = np.nonzero(mask)
            gx, gy = xs + x, ys + y_top
            keep = (gx >= 0) & (gx < w) & (gy >= 0) & (gy < h)
            img[gy[keep], gx[keep]] = col
        x += 6 * scale


def frame_image(image: np.ndarray, text_quads: np.ndarray,
                anchors: np.ndarray) -> np.ndarray:
    """(H,W,3) resized image + (M,9) quads (score in slot 8) +
    (K,>=4) anchors -> framed RGB uint8 (ctpn_predict.py:88-103
    composite order, incl. the :103 putText score label)."""
    out = fill_rects_add(image, anchors) if len(anchors) \
        else image.copy()
    quads_f = np.asarray(text_quads, dtype=np.float64)
    for qf in quads_f:
        q = qf.astype(np.int64)
        draw_line(out, (q[0], q[1]), (q[2], q[3]))
        draw_line(out, (q[0], q[1]), (q[4], q[5]))
        draw_line(out, (q[6], q[7]), (q[2], q[3]))
        draw_line(out, (q[4], q[5]), (q[6], q[7]))
        if qf.size >= 9:  # label from the FLOAT score, coords int'd
            label = str(round(float(qf[8]) * 100, 2)) + "%"
            draw_text(out, label, (q[0] + 13, q[1] + 13))
    return out
