"""MJPEG-in-AVI video container — pure struct/NumPy, public RIFF/AVI
spec.  Composes the two codecs this repo already has (RIFF chunk
traversal as in kernels/wav.py; baseline JPEG frames via
kernels/jpeg.py) into a real video decode path, closing the engine's
last multimodal stub: Motion-JPEG AVI is an actual interchange format
(webcams, OpenCV's default fallback writer), and every stage here is
spec-level, not a fake.

* ``encode_avi(frames, fps)``: hdrl (avih + vids strl with an 'MJPG'
  BITMAPINFOHEADER) + movi list of '00dc' JPEG chunks, word-aligned.
* ``avi_frame_blobs(data)``: RIFF walk -> movi list -> the raw JPEG
  bytes per frame (no decode — callers sample BEFORE decoding, which
  is the whole point of frame sampling at scale).
* ``decode_avi_frames(data, every_n)``: sample every n-th blob and
  decode to (H, W, 3) uint8 via the in-repo JPEG decoder.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def encode_avi(frames: list[np.ndarray], fps: int = 8,
               quality: int = 90) -> bytes:
    """frames: list of (H, W, 3) uint8, all the same size."""
    from ocr_pytorch_spark.kernels.jpeg import encode_jpeg

    if not frames:
        raise AviError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    max_bytes = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIII4I", 1_000_000 // fps, max_bytes * fps, 0, 0x10,
        len(blobs), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0,
                          len(blobs), max_bytes, 0, -1, 0, 0,
                          w & 0xFFFF, h & 0xFFFF))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_frame_blobs(data: bytes) -> list[bytes]:
    """-> the per-frame JPEG byte blobs, stream order."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    blobs: list[bytes] = []
    for cid, at, size in _walk_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[at:at + 4] == b"movi":
            for fid, fat, fsize in _walk_chunks(data, at + 4,
                                                at + size):
                if fid[2:4] in (b"dc", b"db"):  # compressed/raw video
                    blobs.append(data[fat:fat + fsize])
    if not blobs:
        raise AviError("no movi frames found")
    return blobs


def decode_avi_frames(data: bytes,
                      every_n: int = 1) -> list[tuple[int, np.ndarray]]:
    """-> [(frame_idx, (H, W, 3) uint8)] for every n-th frame; only
    sampled frames are decoded (blob slicing is container-level)."""
    from ocr_pytorch_spark.kernels.jpeg import decode_jpeg

    blobs = avi_frame_blobs(data)
    return [(i, decode_jpeg(blobs[i]))
            for i in range(0, len(blobs), every_n)]
