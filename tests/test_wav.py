"""WAV/PCM codec (kernels/wav.py) + audio feature operator."""

import struct

import numpy as np
import pytest

from ocr_pytorch_spark.kernels.wav import (WavError, audio_features,
                                           decode_wav, encode_wav)


def _tone(hz=440, n=8000, rate=16000, amp=12000):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * hz * t) * amp).astype(np.int16)


def test_roundtrip_mono():
    clip = _tone()
    out, rate = decode_wav(encode_wav(clip, 16000))
    assert rate == 16000
    assert out.shape == (8000, 1)
    assert np.allclose(out[:, 0], clip / 32768.0, atol=1e-6)


def test_roundtrip_stereo():
    clip = np.stack([_tone(440), _tone(880)], axis=1)
    out, rate = decode_wav(encode_wav(clip, 8000))
    assert out.shape == (8000, 2)
    assert not np.allclose(out[:, 0], out[:, 1])


def test_unknown_chunks_skipped():
    blob = bytearray(encode_wav(_tone(n=100)))
    # splice a LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    blob2 = blob[:12] + extra + blob[12:]
    blob2[4:8] = struct.pack("<I", len(blob2) - 8)
    out, rate = decode_wav(bytes(blob2))
    assert out.shape == (100, 1)


def test_8bit_unsigned_decode():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 3) + data)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(blob)
    assert np.allclose(out[:, 0], [-1.0, 0.0, 127 / 128])


def test_errors():
    with pytest.raises(WavError):
        decode_wav(b"RIFFnope")
    with pytest.raises(WavError):
        decode_wav(b"OggS....")
    compressed = bytearray(encode_wav(_tone(n=10)))
    i = compressed.index(b"fmt ") + 8
    compressed[i:i + 2] = struct.pack("<H", 2)  # ADPCM format code
    with pytest.raises(WavError, match="PCM"):
        decode_wav(bytes(compressed))


def test_audio_features_semantics():
    rate = 16000
    tone = _tone(n=rate)  # 1 second
    f = audio_features(tone / 32768.0, rate)
    assert abs(f["duration_sec"] - 1.0) < 1e-9
    # sine RMS = amp/sqrt(2)
    assert abs(f["rms"] - (12000 / 32768) / np.sqrt(2)) < 0.01
    # 440 Hz tone crosses zero ~880 times/sec
    assert abs(f["zcr"] * rate - 880) < 10
    assert f["silence_frac"] == 0.0
    silent = np.zeros(rate, dtype=np.float32)
    assert audio_features(silent, rate)["silence_frac"] == 1.0


def test_spectral_hash_properties():
    from ocr_pytorch_spark.kernels.wav import spectral_hash

    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000.0
    base = np.sin(2 * np.pi * 330 * t) + 0.4 * np.sin(2 * np.pi * 700 * t)
    a = base + rng.normal(0, 0.01, t.size)
    b = base + rng.normal(0, 0.01, t.size)      # noisy copy
    other = np.sin(2 * np.pi * 1400 * t) + rng.normal(0, 0.01, t.size)
    ha, hb, ho = (spectral_hash(x.astype(np.float32)) for x in
                  (a, b, other))
    assert ha == spectral_hash(a.astype(np.float32))  # deterministic
    assert bin(ha ^ hb).count("1") <= 6, "noisy copy too far"
    assert bin(ha ^ ho).count("1") > 10, "distinct clips too close"
    # degenerate inputs don't crash
    assert spectral_hash(np.zeros(10, dtype=np.float32)) == 0
    spectral_hash(np.zeros((600, 2), dtype=np.float32))


def test_audio_neardup_fixture_is_exact():
    """The designed near-dup fixture (datagen.audio_neardup_*) must
    reproduce its md5-designed 64-bit patterns EXACTLY through the
    real path (WAV encode -> decode -> spectral_hash): that exactness
    is what lets the driver key carry a literal DuckDB oracle derived
    from the bit patterns alone."""
    from ocr_pytorch_spark import datagen
    from ocr_pytorch_spark.kernels.wav import (decode_wav, encode_wav,
                                               spectral_hash)

    datagen._audio_neardup_check()
    hs = {}
    for g in range(6):
        for v in range(3):
            clip = datagen.audio_neardup_clip(g, v)
            dec, _rate = decode_wav(encode_wav(clip))
            hs[(g, v)] = spectral_hash(np.asarray(dec))
            assert hs[(g, v)] == datagen.audio_neardup_bits(g, v), (g, v)
    within = sorted(bin(hs[(g, a)] ^ hs[(g, b)]).count("1")
                    for g in range(6)
                    for a, b in ((0, 1), (0, 2), (1, 2)))
    assert within == [2] * 6 + [4] * 6 + [6] * 6
    cross = min(bin(hs[x] ^ hs[y]).count("1")
                for x in hs for y in hs if x < y and x[0] != y[0])
    assert cross > 6  # zero cross-group leakage at the radius


def test_spark_audio_neardup_pairs(spark):
    from ocr_pytorch_spark.kernels.wav import encode_wav
    from ocr_pytorch_spark.operators.multimodal import audio_neardup_pairs

    rng = np.random.default_rng(9)
    t = np.arange(8000) / 16000.0
    base = np.sin(2 * np.pi * 260 * t) + 0.3 * np.sin(2 * np.pi * 520 * t)
    mk = lambda sig: bytearray(encode_wav(  # noqa: E731
        (sig * 11000).astype(np.int16)))
    rows = [("a0", mk(base + rng.normal(0, 0.01, t.size))),
            ("a1", mk(base + rng.normal(0, 0.01, t.size))),
            ("b0", mk(np.sin(2 * np.pi * 1800 * t)))]
    df = spark.createDataFrame(rows, "media_ref string, data binary")
    pairs = {(r["ref_a"], r["ref_b"])
             for r in audio_neardup_pairs(df).collect()}
    assert ("a0", "a1") in pairs
    assert not any("b0" in p for p in pairs)


def test_spark_audio_features(spark):
    from ocr_pytorch_spark.operators.multimodal import audio_clip_features

    rows = [("good", bytearray(encode_wav(_tone()))),
            ("bad", bytearray(b"RIFFnope"))]
    df = spark.createDataFrame(rows, "media_ref string, data binary")
    out = {r["media_ref"]: r for r in audio_clip_features(df).collect()}
    assert out["good"]["sample_rate"] == 16000
    assert out["good"]["rms"] > 0.2
    assert out["bad"]["sample_rate"] == -1  # poison-row contract
