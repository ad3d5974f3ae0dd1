"""Deterministic synthetic fixtures (FIXTURES.md): interleaved
``documents`` + raw-RGB ``images`` tables.

Everything is a pure function of (identifier, seed) — in particular
``gen_image_array(media_ref, seed)`` lets executors regenerate any image
without shipping bytes, and lets tests, oracle, and Spark agree exactly.

Image content follows the reference's own robustness bank as generators:
horizontal dark glyph-bar text lines on a light background, optional salt
noise (train_code/train_crnn/trans.py:146-157) and small rotation
(trans.py: rotate), plus adversarial quotas — empty images (no proposals,
ctpn_predict.py:56), and short/fat layouts exercising the size filter
(ctpn_utils.py:166-170) and the portrait-crop filter (ocr.py:64-65).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

DEFAULT_SEED = 42

_LEXICON = (
    "the quick brown fox jumps over lazy dog spark shuffle partition "
    "anchor proposal text line recognise decode tensor batch arrow vector "
    "iceberg parquet lineage resume executor broadcast skew salt "
).split()


def _rng_for(name: str, seed: int) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{name}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def gen_image_array(media_ref: str, seed: int = DEFAULT_SEED
                    ) -> tuple[np.ndarray, int]:
    """Deterministic (H,W,3) uint8 RGB image for a media_ref.

    Returns (image, n_text_lines).  ~10% of refs are 'empty' images,
    ~15% carry small rotation, ~25% salt noise.
    """
    rng = _rng_for(media_ref, seed)
    h = int(rng.integers(40, 97))
    w = int(rng.integers(96, 257))
    bg = int(rng.integers(185, 240))
    img = np.full((h, w, 3), bg, dtype=np.uint8)

    kind_roll = rng.random()
    if kind_roll < 0.10:  # empty image — detection should yield nothing
        return img, 0

    n_lines = int(rng.integers(1, 5))
    line_h = max(6, h // (n_lines * 2 + 1))
    for li in range(n_lines):
        y0 = int((2 * li + 1) * h / (2 * n_lines + 1))
        y1 = min(h - 1, y0 + line_h)
        x0 = int(rng.integers(2, max(3, w // 8)))
        x1 = int(w - rng.integers(2, max(3, w // 8)))
        # glyph-ish bar pattern: dark cells on 2-4 px pitch
        pitch = int(rng.integers(2, 5))
        dark = int(rng.integers(10, 80))
        xs = np.arange(x0, x1)
        on = rng.random(size=((x1 - x0) // pitch + 1)) < 0.7
        mask = on[(xs - x0) // pitch]
        img[y0:y1, xs[mask]] = dark
        # horizontal stroke accents (makes rows distinguishable)
        if rng.random() < 0.5:
            img[y0, x0:x1] = dark
        if rng.random() < 0.5:
            img[y1 - 1, x0:x1] = dark

    if rng.random() < 0.25:  # salt noise (trans.py:146-157 as generator)
        n_salt = int(0.002 * h * w)
        ys = rng.integers(0, h, n_salt)
        xs = rng.integers(0, w, n_salt)
        img[ys, xs] = 255

    if rng.random() < 0.15:  # small rotation exercises the warp path
        from ocr_pytorch_spark.kernels.image import _affine_sample_bilinear
        deg = float(rng.uniform(-3, 3))
        rad = np.radians(deg)
        cx, cy = w / 2, h / 2
        ca, sa = np.cos(rad), np.sin(rad)
        minv = np.array([[ca, sa, cx - ca * cx - sa * cy],
                         [-sa, ca, cy + sa * cx - ca * cy]])
        img = _affine_sample_bilinear(img, minv, h, w, border=bg)

    return img, n_lines


def gen_document(doc_idx: int, seed: int = DEFAULT_SEED,
                 hot_pool: int = 8) -> dict:
    """One document row: interleaved text/media spans.

    Media-span count per doc ~ truncated Pareto(1.5) so a small tail of
    media-heavy documents exists (skew exercise, SURVEY.md §4.3).  ~10% of
    media refs come from a small hot pool (join-skew exercise).
    """
    doc_id = f"doc-{doc_idx:08d}"
    rng = _rng_for(doc_id, seed)
    n_text = int(rng.integers(1, 8))
    n_media = min(64, int(rng.pareto(1.5) + 1)) if rng.random() < 0.8 else 0
    n = n_text + n_media
    kinds = np.array(["text"] * n_text + ["media"] * n_media)
    rng.shuffle(kinds)
    spans = []
    for off, kind in enumerate(kinds):
        if kind == "text":
            words = rng.choice(_LEXICON, size=int(rng.integers(2, 9)))
            spans.append({"kind": "text", "text": " ".join(words),
                          "media_ref": None, "offset": off})
        else:
            if rng.random() < 0.10:
                ref = f"img-hot-{int(rng.integers(0, hot_pool)):04d}"
            else:
                ref = f"img-{doc_idx:08d}-{off:04d}"
            spans.append({"kind": "media", "text": None,
                          "media_ref": ref, "offset": off})
    return {"doc_id": doc_id, "spans": spans}


def gen_documents(n_docs: int, seed: int = DEFAULT_SEED) -> list[dict]:
    return [gen_document(i, seed) for i in range(n_docs)]


def media_refs_of(docs: list[dict]) -> list[str]:
    refs = {s["media_ref"] for d in docs for s in d["spans"]
            if s["kind"] == "media"}
    return sorted(refs)


def gen_images(refs: list[str], seed: int = DEFAULT_SEED) -> list[dict]:
    rows = []
    for ref in refs:
        arr, _ = gen_image_array(ref, seed)
        rows.append({"media_ref": ref, "height": arr.shape[0],
                     "width": arr.shape[1], "channels": 3,
                     "data": arr.tobytes()})
    return rows


def gen_augmented_image_array(media_ref: str, seed: int = DEFAULT_SEED
                              ) -> np.ndarray:
    """Fixture tier 2: the base fixture image pushed through the
    reference's probability-gated augmentation chain
    (kernels/augment.py, train_code/train_crnn/trans.py semantics),
    with the chain seed derived from the media_ref — still a pure
    function of (media_ref, seed)."""
    from ocr_pytorch_spark.kernels.augment import augment_chain

    img, _ = gen_image_array(media_ref, seed)
    chain_seed = int(_rng_for(f"aug:{media_ref}", seed)
                     .integers(0, 2 ** 31))
    return augment_chain(img, chain_seed)


def gen_augmented_images(refs: list[str],
                         seed: int = DEFAULT_SEED) -> list[dict]:
    rows = []
    for ref in refs:
        arr = gen_augmented_image_array(ref, seed)
        rows.append({"media_ref": ref, "height": arr.shape[0],
                     "width": arr.shape[1], "channels": 3,
                     "data": arr.tobytes()})
    return rows


# --- parquet writers (pyarrow; usable without a SparkSession) ---

def write_fixture(out_dir: str, n_docs: int,
                  seed: int = DEFAULT_SEED,
                  docs: list[dict] | None = None) -> tuple[str, str]:
    """Write documents.parquet + images.parquet under out_dir.
    ``docs`` overrides the generated list (e.g. skew-amplified
    variants for scale runs); images always cover exactly the media
    refs the docs reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = docs if docs is not None else gen_documents(n_docs, seed)
    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()),
                           ("offset", pa.int32())])
    doc_tbl = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "spans": pa.array(
            [[(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in d["spans"]] for d in docs],
            pa.list_(span_type)),
    })
    doc_path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(doc_tbl, doc_path)

    imgs = gen_images(media_refs_of(docs), seed)
    img_tbl = pa.table({
        "media_ref": pa.array([r["media_ref"] for r in imgs], pa.string()),
        "height": pa.array([r["height"] for r in imgs], pa.int32()),
        "width": pa.array([r["width"] for r in imgs], pa.int32()),
        "channels": pa.array([r["channels"] for r in imgs], pa.int32()),
        "data": pa.array([r["data"] for r in imgs], pa.binary()),
    })
    img_path = os.path.join(out_dir, "images.parquet")
    pq.write_table(img_tbl, img_path)
    return doc_path, img_path


# --- oracle-bearing driver fixtures (round 6) -------------------------
#
# Shared by the Spark-side synthesis UDFs AND the driver's literal
# DuckDB oracles, so both sides derive from the same pure-Python
# design — portable math only (hashlib.md5, integer arithmetic).

def compression_fixture_text(k: int) -> str:
    """Deterministic text spanning the zlib-compressibility spectrum:
    k%4==0 highly templated (ratio << 1), 1 small-vocab repetition,
    2 md5-chain hex (near-incompressible for text), 3 natural-ish
    pangram repeats.  Pure function of k — no RNG state."""
    if k % 4 == 0:
        return (f"copy copy pasta {k} ") * 120
    if k % 4 == 1:
        vocab = [
            "w" + hashlib.md5(f"cfv-{k}-{i}".encode()).hexdigest()[:4]
            for i in range(7)]
        return " ".join(vocab[i % 7] for i in range(80))
    if k % 4 == 2:
        cur, out = f"cfx-{k}".encode(), []
        for _ in range(40):
            cur = hashlib.md5(cur).digest()
            out.append(cur.hex())
        return "".join(out)
    return (f"the quick brown fox {k} jumps over the lazy dog. ") * 12


_NEARDUP_FLIPS = {0: (), 1: (7, 21), 2: (7, 33, 40, 52, 61)}


def neardup_dhash_bits(g: int, v: int) -> int:
    """Designed 64-bit dHash for near-dup fixture group g, variant v:
    an md5-derived base pattern per group, with variant-specific bit
    flips giving exact within-group Hamming distances d(0,1)=2,
    d(0,2)=5, d(1,2)=5 (all <= radius 6); distinct-group base
    patterns differ by ~32 md5 bits, far beyond the radius."""
    base = int.from_bytes(
        hashlib.md5(f"ndgrp-{g}".encode()).digest()[:8], "little")
    for b in _NEARDUP_FLIPS[v]:
        base ^= 1 << b
    return base


def neardup_fixture_image(g: int, v: int) -> np.ndarray:
    """(8, 9, 3) uint8 image whose dHash is EXACTLY
    neardup_dhash_bits(g, v): at the 8x9 dHash working size the
    area-resample is the identity, all three channels are equal so
    grayscale is exact, and each horizontal step is +-10 around 100 —
    bit i (= r*8 + c) is the sign of px[r, c+1] - px[r, c]."""
    bits = neardup_dhash_bits(g, v)
    img = np.zeros((8, 9), dtype=np.int64)
    img[:, 0] = 100
    for r in range(8):
        for c in range(8):
            step = 10 if (bits >> (r * 8 + c)) & 1 else -10
            img[r, c + 1] = img[r, c] + step
    return np.repeat(img.astype(np.uint8)[:, :, None], 3, axis=2)


def audio_neardup_bits(g: int, v: int) -> int:
    """Designed 64-bit spectral fingerprint for audio near-dup fixture
    group ``g``, variant ``v`` — the audio analogue of
    ``neardup_dhash_bits``.  Layout matches ``kernels.wav.
    spectral_hash`` (frame=512, 16 linear bands x 4 time chunks; bit
    i = chunk*16 + band): per chunk an md5-derived choice of EXACTLY
    8 hot bands (half hot keeps the clip-mean threshold centred with
    ~2x sign margins both ways).  Variants swap one hot band for one
    cold band in designated chunks, so within-group Hamming is exact
    by construction: d(0,1)=2, d(0,2)=4, d(1,2)=6 (all <= radius 6);
    cross-group base patterns differ by ~30 md5 bits."""
    hot: list[list[int]] = []
    for c in range(4):
        digest = hashlib.md5(f"aundgrp-{g}-{c}".encode()).digest()
        order = sorted(range(16), key=lambda b: (digest[b], b))
        hot.append(sorted(order[:8]))
    # variant swaps: (chunk, hot_rank, cold_rank) — swap the rank'th
    # hot band with the rank'th cold band of that chunk
    swaps = {0: (), 1: ((0, 0, 0),), 2: ((1, 0, 0), (2, 0, 0))}[v]
    for c, hr, cr in swaps:
        cold = [b for b in range(16) if b not in hot[c]]
        hot[c].remove(hot[c][hr])
        hot[c].append(cold[cr])
        hot[c].sort()
    bits = 0
    for c in range(4):
        for b in hot[c]:
            bits |= 1 << (c * 16 + b)
    return bits


def _audio_neardup_check() -> None:
    """Fixture-design assert: all within-group pair distances <= 6 and
    every cross-group distance far beyond the radius."""
    hs = {(g, v): audio_neardup_bits(g, v)
          for g in range(6) for v in range(3)}
    for (ka, ha) in hs.items():
        for (kb, hb) in hs.items():
            if ka >= kb:
                continue
            d = bin(ha ^ hb).count("1")
            if ka[0] == kb[0]:
                assert d <= 6, "fixture design drifted (within-group)"
            else:
                assert d > 12, "fixture design drifted (cross-group)"


def audio_neardup_clip(g: int, v: int) -> np.ndarray:
    """(8192,) int16 clip whose ``spectral_hash`` is EXACTLY
    ``audio_neardup_bits(g, v)``: 16 frames of 512 samples, 4 frames
    per time chunk (chunk edges land on frame edges), and during
    chunk c a sum of sines at the exact FFT-bin centres (bin 16b+9)
    of that chunk's hot bands — frame-aligned integer-bin tones leak
    nothing into cold bands, so hot cells sit ~2x the clip mean and
    cold cells at the noise floor.  Seeded Gaussian noise (sigma=80,
    ~50x below a hot tone's band energy) makes each variant a genuine
    noisy near-dup without flipping any designed bit."""
    bits = audio_neardup_bits(g, v)
    n, frame, chunk_len = 8192, 512, 4 * 512
    t = np.arange(n, dtype=np.float64)
    sig = np.zeros(n, dtype=np.float64)
    for c in range(4):
        sl = slice(c * chunk_len, (c + 1) * chunk_len)
        for b in range(16):
            if (bits >> (c * 16 + b)) & 1:
                k = 16 * b + 9  # centre FFT bin of band b
                sig[sl] += 2800.0 * np.sin(2 * np.pi * k * t[sl] / frame)
    rng = np.random.default_rng(1000 * g + v)
    sig += rng.normal(0.0, 80.0, n)
    return np.clip(sig, -32768, 32767).astype(np.int16)


_BPE_WORDS = (
    "low lower lowest new newer newest wide wider widest "
    "late later latest").split()


def bpe_fixture_text(k: int) -> str:
    """Deterministic BPE fixture doc k: 20 words drawn from a 12-word
    Sennrich-style inflection lexicon with md5-skewed frequencies, so
    8 merges train with counts >= 2, shared suffixes (-er/-est) force
    multi-level merges, and equal-count ties exercise the pair-asc
    tie-break.  Pure function of k — executors, tests and the
    oracle-build step regenerate the identical corpus."""
    digest = hashlib.md5(f"bpefix-{k}".encode()).digest()
    # skew toward the low indices so frequent stems dominate merges
    return " ".join(_BPE_WORDS[(digest[j % 16] + j * k) % 9
                               if j % 3 else (digest[j % 16] + j) % 12]
                    for j in range(20))
