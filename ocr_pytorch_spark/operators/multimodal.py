"""Multimodal column plumbing: opaque ``binary`` media + typed metadata,
processed by Arrow-batched ``mapInPandas`` UDFs.

The raw-RGB decode, PNG / baseline-JPEG / WAV-PCM codecs, and
stats/resize/feature paths are REAL (pure NumPy — kernels/png.py,
kernels/jpeg.py, kernels/wav.py; the engine's image table stores raw
uint8 HWC bytes, SURVEY.md §1.1).  Only video-frame extraction is
STUBBED behind a deterministic fake because it genuinely needs ffmpeg,
not installed here — its Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURES_SCHEMA = (
    "media_ref string, height int, width int, mean_r double, "
    "mean_g double, mean_b double, std_gray double, dark_frac double")

THUMBNAIL_SCHEMA = ("media_ref string, height int, width int, "
                    "data binary")

FRAME_SAMPLE_SCHEMA = ("media_ref string, frame_idx int, data binary")


def decode_raw_rgb(data: bytes, h: int, w: int, c: int):
    """Raw uint8 HWC bytes -> ndarray. Real decode for the engine's
    native format."""
    import numpy as np

    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, c)


def decode_codec(data: bytes, codec: str):
    """Codec decode.  PNG is REAL (pure-NumPy/zlib codec,
    kernels/png.py — covers the reference's own demo inputs,
    test_images/*.png).  JPEG is REAL (pure-NumPy baseline decoder,
    kernels/jpeg.py — covers the reference's own rendered output,
    test_result/t1.jpg).  Audio/video remain stubbed: those require
    soundfile/ffmpeg, not available in this environment."""
    codec = codec.lower()
    if codec == "png":
        from ocr_pytorch_spark.kernels.png import decode_png

        return decode_png(data)
    if codec in ("jpg", "jpeg"):
        from ocr_pytorch_spark.kernels.jpeg import decode_jpeg

        return decode_jpeg(data)
    if codec == "wav":
        from ocr_pytorch_spark.kernels.wav import decode_wav

        return decode_wav(data)
    raise NotImplementedError(
        f"codec decode ({codec}) requires ffmpeg, not available here")


DHASH_SCHEMA = "media_ref string, dhash long"


def dhash_array(img) -> int:
    """64-bit difference hash of an (H,W,3) uint8 image: grayscale,
    area-resample to 9x8, threshold horizontal gradients.  Shared by
    the Spark UDF and tests (same single-source-kernel pattern as the
    OCR path)."""
    import numpy as np

    from ocr_pytorch_spark.kernels.image import resize_area

    gray = img.astype(np.float32).mean(axis=2).astype(np.uint8)
    small = resize_area(gray[:, :, None].repeat(3, 2), 8, 9) \
        .astype(np.float32).mean(axis=2)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def image_dhash(images: DataFrame) -> DataFrame:
    """Perceptual dedup key for images: per-row dHash via Arrow-batched
    mapInPandas (map-side; near-identical images agree on most bits, so
    downstream near-dup joins can bucket on hash bands exactly like the
    text SimHash path).  Output: media_ref, dhash (long; top bit kept
    inside int64 via the 63-bit mask convention is NOT applied — the
    full unsigned value is stored two's-complement)."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            refs, hs = [], []
            for ref, h, w, c, data in zip(
                    pdf["media_ref"], pdf["height"], pdf["width"],
                    pdf["channels"], pdf["data"]):
                img = np.frombuffer(data, np.uint8).reshape(
                    int(h), int(w), int(c))
                v = dhash_array(img)
                refs.append(ref)
                hs.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": refs,
                                "dhash": pd.array(hs, dtype="int64")})

    return images.mapInPandas(hashes, schema=DHASH_SCHEMA)


def image_neardup_pairs(images: DataFrame,
                        max_hamming: int = 6,
                        bands: int | None = None) -> DataFrame:
    """Image near-dup detection: dHash -> band the 64-bit hash into
    ``bands`` equal-width keys -> bucket-join candidates -> exact
    Hamming verify via bit_count(xor), pure codegen.  The same banding
    scheme as the text SimHash/MinHash paths, so image dedup scales
    identically: skinny band rows, no all-pairs product.

    Recall guarantee (pigeonhole): ``max_hamming`` differing bits can
    zero out at most ``max_hamming`` bands, so with
    ``bands > max_hamming`` every qualifying pair shares at least one
    intact band — recall is EXACT at the advertised radius, not
    probabilistic.  ``bands`` therefore defaults to the smallest
    power-of-two divisor of 64 exceeding ``max_hamming`` (8 bands of
    8 bits for the default radius 6); passing an explicit ``bands <=
    max_hamming`` raises rather than silently miss pairs whose flipped
    bits spread across all bands.

    Output: ref_a, ref_b, hamming (<= max_hamming)."""
    from pyspark.sql import functions as F

    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32, 64)
                     if b > max_hamming)
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at Hamming radius "
            f"{max_hamming}; need bands > max_hamming")
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    return hash_neardup_pairs(image_dhash(images), max_hamming, bands)


def hash_neardup_pairs(hashes: DataFrame, max_hamming: int,
                       bands: int) -> DataFrame:
    """Banded Hamming join over (media_ref, dhash:long) rows — the
    distributable core of image_neardup_pairs, factored out so recall
    can be tested on adversarially-placed bit patterns directly."""
    from pyspark.sql import functions as F

    r = 64 // bands
    band_structs = [
        F.struct(F.lit(b).alias("band_idx"),
                 F.shiftrightunsigned(F.col("dhash"), b * r)
                 .bitwiseAND(F.lit((1 << r) - 1)).alias("key"))
        for b in range(bands)]
    stacked = (hashes.select(
        "media_ref", "dhash",
        F.explode(F.array(*band_structs)).alias("bk"))
        .select("media_ref", "dhash", "bk.band_idx", "bk.key"))
    a = stacked.select(F.col("media_ref").alias("ref_a"),
                       F.col("dhash").alias("ha"), "band_idx", "key")
    b = stacked.select(F.col("media_ref").alias("ref_b"),
                       F.col("dhash").alias("hb"), "band_idx", "key")
    return (a.join(b, ["band_idx", "key"])
            .where(F.col("ref_a") < F.col("ref_b"))
            .select("ref_a", "ref_b",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                    .alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= max_hamming))


def image_features(images: DataFrame) -> DataFrame:
    """Per-image feature extraction (channel means, grayscale std, dark
    fraction) as an iterator mapInPandas — the standard multimodal
    feature-extract shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for ref, h, w, c, data in zip(
                    pdf["media_ref"], pdf["height"], pdf["width"],
                    pdf["channels"], pdf["data"]):
                img = decode_raw_rgb(data, int(h), int(w), int(c))
                # float64 on purpose: channel sums of uint8 pixels are
                # exact integers in float64 at any image size, so the
                # means here equal a SQL engine's avg() bit-for-bit —
                # the multimodal_features driver key hash-checks this
                # path against DuckDB
                f = img.astype(np.float64)
                gray = f.mean(axis=2)
                # std via E[x^2] - E[x]^2, NOT gray.std() (two-pass
                # deviation form): the oracle-bearing driver keys
                # (multimodal_features / multimodal_video) hash this
                # against DuckDB's sqrt(avg(x*x) - avg(x)*avg(x)); on
                # the integer fixtures both sides are then the exact
                # same float64 op sequence over exact integer sums —
                # bit-identical on any platform/numpy, not merely
                # within quant4 rounding distance (r5 ADVICE)
                n_px = gray.size
                s1 = float(gray.sum())
                s2 = float((gray * gray).sum())
                std = math.sqrt(max(s2 / n_px - (s1 / n_px) * (s1 / n_px),
                                    0.0))
                rows.append((ref, int(h), int(w),
                             float(f[..., 0].mean()),
                             float(f[..., 1].mean()),
                             float(f[..., 2].mean()),
                             std,
                             float((gray < 100).mean())))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "height", "width", "mean_r", "mean_g",
                "mean_b", "std_gray", "dark_frac"])

    return images.mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


def thumbnails(images: DataFrame, out_h: int = 16) -> DataFrame:
    """Aspect-preserving area-resample thumbnails (real resize via the
    shared NumPy kernel)."""

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_pytorch_spark.kernels import resize_area

        for pdf in batches:
            rows = []
            for ref, h, w, c, data in zip(
                    pdf["media_ref"], pdf["height"], pdf["width"],
                    pdf["channels"], pdf["data"]):
                img = decode_raw_rgb(data, int(h), int(w), int(c))
                ow = max(1, int(w * out_h / h))
                small = resize_area(img, out_h, ow)
                rows.append((ref, out_h, ow, small.tobytes()))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "height", "width", "data"])

    return images.mapInPandas(thumb, schema=THUMBNAIL_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, duration_sec double, "
    "rms double, zcr double, peak double, silence_frac double")


def audio_clip_features(audio: DataFrame,
                        ref_col: str = "media_ref",
                        bytes_col: str = "data") -> DataFrame:
    """(media_ref, data: WAV bytes) -> per-clip gating features via
    the real RIFF/PCM decoder (kernels/wav.py) — duration, RMS, ZCR,
    peak, silence fraction; the audio analogue of image_features.
    Map-side Arrow batches; corrupt clips follow the poison-row
    contract (sample_rate = -1, zeros)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_pytorch_spark.kernels.wav import (audio_features,
                                                   decode_wav)

        for pdf in batches:
            rows = []
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                try:
                    samples, rate = decode_wav(bytes(blob))
                    f = audio_features(samples, rate)
                    rows.append((ref, rate, f["duration_sec"],
                                 f["rms"], f["zcr"], f["peak"],
                                 f["silence_frac"]))
                except Exception:
                    rows.append((ref, -1, 0.0, 0.0, 0.0, 0.0, 1.0))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "sample_rate", "duration_sec", "rms",
                "zcr", "peak", "silence_frac"])

    return audio.mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_HASH_SCHEMA = "media_ref string, dhash long"


def audio_spectral_hash(audio: DataFrame,
                        ref_col: str = "media_ref",
                        bytes_col: str = "data") -> DataFrame:
    """(media_ref, WAV bytes) -> 64-bit spectral fingerprints
    (kernels/wav.spectral_hash) in the same (media_ref, dhash) shape
    as image_dhash, so the banded Hamming join dedups audio clips with
    zero new join machinery."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_pytorch_spark.kernels.wav import decode_wav, \
            spectral_hash

        for pdf in batches:
            refs, hs = [], []
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                samples, _ = decode_wav(bytes(blob))
                v = spectral_hash(samples)
                refs.append(ref)
                hs.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": refs,
                                "dhash": pd.array(hs, dtype="int64")})

    return audio.mapInPandas(hashes, schema=AUDIO_HASH_SCHEMA)


def audio_neardup_pairs(audio: DataFrame,
                        max_hamming: int = 6) -> DataFrame:
    """Audio near-dup detection: spectral fingerprint -> the SAME
    pigeonhole-banded Hamming join as images (hash_neardup_pairs), so
    recall at the radius is exact and the scale story is identical.
    Output: ref_a, ref_b, hamming."""
    bands = next(b for b in (1, 2, 4, 8, 16, 32, 64)
                 if b > max_hamming)
    return hash_neardup_pairs(audio_spectral_hash(audio),
                              max_hamming, bands)


VIDEO_FRAME_SCHEMA = ("media_ref string, frame_idx int, height int, "
                      "width int, data binary")


def video_frame_sample(videos: DataFrame,
                       every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: the binary column holds MJPEG-AVI
    containers (kernels/avi.py); every n-th frame blob is sliced at
    the container level and ONLY sampled frames are JPEG-decoded —
    the cost shape that matters at corpus scale.  Output rows are
    raw-RGB images, directly consumable by image_features / OCR.
    Corrupt containers follow the poison-row contract
    (frame_idx = -1, error text as data)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_pytorch_spark.kernels.avi import decode_avi_frames

        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                try:
                    for idx, frame in decode_avi_frames(bytes(data),
                                                        every_n):
                        h, w = frame.shape[:2]
                        rows.append((ref, idx, h, w, frame.tobytes()))
                except Exception as exc:
                    rows.append((ref, -1, -1, -1,
                                 f"{type(exc).__name__}: {exc}"[:200]
                                 .encode()))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "frame_idx", "height", "width", "data"])

    return videos.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


def frame_sample(videos: DataFrame, every_n: int = 8) -> DataFrame:
    """Raw-frame sampling plumbing: treats the binary column as a
    concatenation of raw (height, width, 3) frames and emits every
    n-th — the schema/batch shape for pre-decoded frame stores.  For
    real container files use ``video_frame_sample`` (MJPEG-AVI,
    kernels/avi.py)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, h, w, c, data in zip(
                    pdf["media_ref"], pdf["height"], pdf["width"],
                    pdf["channels"], pdf["data"]):
                frame_bytes = int(h) * int(w) * int(c)
                n_frames = max(1, len(data) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    rows.append((ref, fi,
                                 data[fi * frame_bytes:
                                      (fi + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "frame_idx", "data"])

    return videos.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)
