"""MJPEG-AVI container (kernels/avi.py) + real video frame sampling."""

import numpy as np
import pytest

from ocr_pytorch_spark.kernels.avi import (AviError, avi_frame_blobs,
                                           decode_avi_frames,
                                           encode_avi)


def _frames(n=6, h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip((np.sin(xx / 7 + k) + np.cos(yy / 5) + 2) / 4
                    * 255, 0, 255).astype(np.uint8)[:, :, None]
            .repeat(3, 2) for k in range(n)]


def test_roundtrip_all_frames():
    frames = _frames()
    blob = encode_avi(frames, fps=4)
    assert len(avi_frame_blobs(blob)) == 6
    dec = decode_avi_frames(blob, every_n=1)
    assert [i for i, _ in dec] == list(range(6))
    for (_, got), want in zip(dec, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 3.0


def test_sampling_slices_before_decode():
    blob = encode_avi(_frames(7), fps=4)
    dec = decode_avi_frames(blob, every_n=3)
    assert [i for i, _ in dec] == [0, 3, 6]


def test_frame_blobs_are_valid_jpegs():
    from ocr_pytorch_spark.kernels.jpeg import decode_jpeg

    blob = encode_avi(_frames(2))
    for b in avi_frame_blobs(blob):
        assert b[:2] == b"\xff\xd8"
        decode_jpeg(b)  # decodes standalone


def test_errors():
    with pytest.raises(AviError):
        avi_frame_blobs(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviError):
        avi_frame_blobs(b"RIFF\x04\x00\x00\x00AVI ")  # no movi
    with pytest.raises(AviError):
        encode_avi([])


def test_spark_video_frame_sample(spark):
    from ocr_pytorch_spark.operators.multimodal import video_frame_sample

    frames = _frames(5)
    rows = [("clip", bytearray(encode_avi(frames, fps=4))),
            ("bad", bytearray(b"RIFF\x04\x00\x00\x00AVI "))]
    df = spark.createDataFrame(rows, "media_ref string, data binary")
    out = video_frame_sample(df, every_n=2).collect()
    good = sorted((r["frame_idx"] for r in out
                   if r["media_ref"] == "clip"))
    assert good == [0, 2, 4]
    clip0 = next(r for r in out if r["media_ref"] == "clip"
                 and r["frame_idx"] == 0)
    assert (clip0["height"], clip0["width"]) == (40, 56)
    img = np.frombuffer(bytes(clip0["data"]), np.uint8).reshape(
        40, 56, 3)
    assert np.abs(img.astype(int) - frames[0].astype(int)).mean() < 3.0
    bad = next(r for r in out if r["media_ref"] == "bad")
    assert bad["frame_idx"] == -1  # poison-row contract


def test_rgb_dib_roundtrip_exact():
    """codec='rgb': BI_RGB DIB frames (bottom-up BGR, 4-byte row
    padding — odd width exercises the pad) roundtrip losslessly and
    strf-driven dispatch picks the DIB decoder."""
    from ocr_pytorch_spark.kernels.avi import stream_format

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
              for _ in range(5)]
    blob = encode_avi(frames, fps=4, codec="rgb")
    comp, w, h = stream_format(blob)
    assert (comp, w, h) == (b"\x00\x00\x00\x00", 33, 24)
    out = decode_avi_frames(blob, every_n=2)
    assert [i for i, _ in out] == [0, 2, 4]
    for i, f in out:
        assert np.array_equal(f, frames[i]), i


def test_rgb_vs_mjpeg_dispatch():
    """Same frames through both codecs: raw is bit-exact, MJPEG is
    lossy-but-close; both decode through the same entry point."""
    rng = np.random.default_rng(9)
    base = rng.integers(60, 200, (16, 20, 3), dtype=np.uint8)
    raw = decode_avi_frames(encode_avi([base], codec="rgb"))[0][1]
    jpg = decode_avi_frames(encode_avi([base], codec="mjpg"))[0][1]
    assert np.array_equal(raw, base)
    assert np.abs(jpg.astype(int) - base.astype(int)).mean() < 8.0


def test_unknown_codec_rejected():
    rng = np.random.default_rng(1)
    f = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)]
    with pytest.raises(AviError):
        encode_avi(f, codec="h264")


def test_topdown_dib_decodes():
    """Negative biHeight = top-down DIB (BITMAPINFOHEADER spec): a
    hand-patched container with un-reversed rows must decode to the
    same frame."""
    import struct

    from ocr_pytorch_spark.kernels.avi import stream_format

    rng = np.random.default_rng(13)
    frame = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    blob = bytearray(encode_avi([frame], codec="rgb"))
    # locate strf's biHeight and negate it; rewrite the movi payload
    # with rows NOT bottom-up (i.e. natural order, still BGR+padded)
    i = blob.find(b"strf")
    h_off = i + 8 + 8  # strf hdr + biSize + biWidth
    (h,) = struct.unpack_from("<i", blob, h_off)
    assert h == 10
    struct.pack_into("<i", blob, h_off, -h)
    stride = (7 * 3 + 3) & ~3
    rows = np.zeros((10, stride), dtype=np.uint8)
    rows[:, :21] = frame[:, :, ::-1].reshape(10, 21)  # BGR, top-down
    j = blob.find(b"00db") + 8
    blob[j:j + stride * 10] = rows.tobytes()
    comp, w, hh = stream_format(bytes(blob))
    assert (comp, w, hh) == (b"\x00\x00\x00\x00", 7, -10)
    out = decode_avi_frames(bytes(blob))
    assert np.array_equal(out[0][1], frame)
