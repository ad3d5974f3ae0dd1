"""WAV/PCM audio codec — pure struct/NumPy, from the public RIFF/WAVE
spec.  Closes the audio leg of the multimodal stub the same way the
PNG/JPEG codecs closed the image legs: a writer synthesizes real files
so the reader round-trips without external data.

Supported: RIFF/WAVE with a PCM ``fmt `` chunk (format 1), 8/16/32-bit
integer samples, any channel count/rate; chunks in any order, unknown
chunks skipped by size (the spec's traversal rule).  Compressed
formats (ADPCM, float, MP3-in-WAV) raise loudly.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        raise WavError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) float32 in [-1, 1], sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise WavError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            raw = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WavError("missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise WavError(f"unsupported WAV format {audio_format} "
                       f"(only PCM); needs ffmpeg/soundfile")
    if bits not in _DTYPES:
        raise WavError(f"unsupported bit depth {bits}")
    arr = np.frombuffer(raw, dtype=_DTYPES[bits])
    arr = arr[:(arr.size // ch) * ch].reshape(-1, ch)
    if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
        out = (arr.astype(np.float32) - 128.0) / 128.0
    else:
        out = arr.astype(np.float32) / float(1 << (bits - 1))
    return out, rate


def spectral_hash(samples: np.ndarray, n_bands: int = 16,
                  n_chunks: int = 4, frame: int = 512) -> int:
    """64-bit perceptual audio fingerprint: frame the mono signal,
    FFT magnitude per frame, pool into ``n_bands`` log-spaced bands x
    ``n_chunks`` time chunks, threshold each cell against the clip
    mean -> 64 sign bits.  The audio analogue of the image dHash —
    stable under mild noise/level changes, so the same banded Hamming
    join (multimodal.hash_neardup_pairs) dedups audio clips."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    mono = mono.astype(np.float64)
    usable = (mono.size // frame) * frame
    if usable == 0:
        return 0
    frames = mono[:usable].reshape(-1, frame)
    mags = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    # log-spaced band edges over the magnitude bins (strictly
    # increasing; tiny frames fall back to linear spacing)
    edges = np.unique(np.geomspace(1, mags.shape[1],
                                   n_bands + 1).astype(int))
    if edges.size < n_bands + 1:
        edges = np.linspace(0, mags.shape[1], n_bands + 1).astype(int)
        edges[1:] = np.maximum(edges[1:], np.arange(1, n_bands + 1))
    band_e = np.stack([mags[:, a:max(b, a + 1)].mean(axis=1)
                       for a, b in zip(edges[:-1], edges[1:])], axis=1)
    # pool frames into n_chunks time chunks
    n_fr = band_e.shape[0]
    cells = np.stack(
        [band_e[(n_fr * c) // n_chunks:
                max((n_fr * (c + 1)) // n_chunks,
                    (n_fr * c) // n_chunks + 1)].mean(axis=0)
         for c in range(n_chunks)], axis=0)
    bits = (cells > cells.mean()).ravel()
    return int(sum(1 << i for i, b in enumerate(bits[:64]) if b))


def audio_features(samples: np.ndarray, rate: int,
                   frame: int = 512) -> dict:
    """Per-clip features a training-data pipeline gates on: duration,
    RMS energy, zero-crossing rate, peak, silence fraction (frames
    with RMS < 1% full scale)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.size
    rms = float(np.sqrt((mono.astype(np.float64) ** 2).mean())) \
        if n else 0.0
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n, 1)
    usable = (n // frame) * frame
    if usable:
        frames = mono[:usable].reshape(-1, frame).astype(np.float64)
        frame_rms = np.sqrt((frames ** 2).mean(axis=1))
        silence = float((frame_rms < 0.01).mean())
    else:
        silence = 1.0
    return {"duration_sec": n / rate if rate else 0.0,
            "rms": rms, "zcr": zc,
            "peak": float(np.abs(mono).max()) if n else 0.0,
            "silence_frac": silence}
