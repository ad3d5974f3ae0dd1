"""Pure-NumPy/stdlib PNG codec (no PIL/cv2 in the sandbox).

Decodes the subset the reference corpus actually uses — 8-bit,
non-interlaced, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA); all five scanline filters — into (H, W, 3)
uint8 RGB, matching cv2.imread(..., IMREAD_COLOR)'s alpha-dropping
behavior (reference reads its PNGs at detect/ctpn_predict.py demo path
via cv2.imread).  The encoder exists for tests/fixtures (any filter
type, RGB/gray) so round-trips can be checked bit-exactly.

Filter math follows the PNG spec (RFC 2083 §6): Sub is a per-byte-lane
cumulative sum mod 256 (vectorized); Up is a vector add with the prior
scanline; Average and Paeth have a left-pixel dependency and walk the
row in bpp-strided steps (NumPy ops per step).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    pass


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngFormatError("not a PNG (bad signature)")
    off = 8
    while off + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[off:off + 8])
        yield ctype, data[off + 8:off + 8 + length]
        off += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a, b, c):
    # a=left, b=up, c=up-left; int16 arrays
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _unfilter(raw: np.ndarray, height: int, stride: int,
              bpp: int) -> np.ndarray:
    """raw: (height, 1 + stride) uint8 rows, first byte = filter type.
    Returns (height, stride) reconstructed bytes."""
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int16)
    for y in range(height):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int16)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average
            rec = line.copy()
            rec[:bpp] = (line[:bpp] + prev[:bpp] // 2) % 256
            for x in range(bpp, stride, bpp):
                left = rec[x - bpp:x]
                up = prev[x:x + bpp]
                rec[x:x + bpp] = (line[x:x + bpp]
                                  + (left + up) // 2) % 256
        elif ft == 4:  # Paeth
            rec = line.copy()
            zero = np.zeros(bpp, np.int16)
            rec[:bpp] = (line[:bpp] + _paeth(zero, prev[:bpp],
                                             zero)) % 256
            for x in range(bpp, stride, bpp):
                pr = _paeth(rec[x - bpp:x], prev[x:x + bpp],
                            prev[x - bpp:x])
                rec[x:x + bpp] = (line[x:x + bpp] + pr) % 256
        else:
            raise PngFormatError(f"unknown filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB (alpha dropped, palette
    expanded), cv2.imread-color-mode compatible channel handling."""
    ihdr = None
    plte = None
    idat = []
    for ctype, payload in _chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(payload)
    if ihdr is None or not idat:
        raise PngFormatError("missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth} (8 only)")
    if interlace != 0:
        raise PngFormatError("Adam7 interlacing not supported")
    if color not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color}")
    ch = _CHANNELS[color]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != height * (stride + 1):
        raise PngFormatError("IDAT size mismatch")
    px = _unfilter(raw.reshape(height, stride + 1), height, stride, ch)
    px = px.reshape(height, width, ch)
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2)
    if color == 2:  # RGB
        return px
    if color == 3:  # palette
        if plte is None:
            raise PngFormatError("palette image without PLTE")
        return plte[px[:, :, 0]]
    if color == 4:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> RGB (drop alpha, like IMREAD_COLOR)


# --- encoder (tests/fixtures) ----------------------------------------

def _filter_row(line: np.ndarray, prev: np.ndarray, ft: int,
                bpp: int) -> np.ndarray:
    i16 = line.astype(np.int16)
    left = np.zeros_like(i16)
    left[bpp:] = i16[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ft == 0:
        return line
    if ft == 1:
        return ((i16 - left) % 256).astype(np.uint8)
    if ft == 2:
        return ((i16 - up) % 256).astype(np.uint8)
    if ft == 3:
        return ((i16 - (left + up) // 2) % 256).astype(np.uint8)
    if ft == 4:
        return ((i16 - _paeth(left, up, upleft)) % 256).astype(np.uint8)
    raise PngFormatError(f"unknown filter type {ft}")


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> PNG bytes with a fixed per-row
    filter type (0..4).  Deterministic (fixed zlib level)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise PngFormatError("encoder takes (H,W) gray or (H,W,3) RGB")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch)
    prev = np.zeros(w * ch, np.uint8)
    rows = []
    for y in range(h):
        rows.append(bytes([filter_type])
                    + _filter_row(flat[y], prev, filter_type, ch)
                    .tobytes())
        prev = flat[y]
    idat = zlib.compress(b"".join(rows), 6)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
