"""Baseline JPEG codec — pure NumPy + stdlib, no PIL/cv2/libjpeg.

Closes the reference's last codec gap: ``demo.py:17`` globs
``test_images/*.*`` (any image type readable by cv2/PIL, JPEG
included) and the repo's own rendered sample output is a JPEG
(``test_result/t1.jpg``).  This module implements the ITU-T T.81
*baseline sequential DCT* profile from the public spec:

* decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI markers, 8-bit
  samples, 1- or 3-component scans, arbitrary H/V sampling factors
  (4:4:4, 4:2:2, 4:2:0, ...), canonical Huffman tables, byte
  destuffing, restart-marker DC-predictor resets, dequantize ->
  zigzag -> vectorized float IDCT -> box chroma upsampling ->
  JFIF YCbCr->RGB.
* encoder: baseline 4:4:4 with the Annex-K example quantization and
  Huffman tables (libjpeg's quality scaling), enough to synthesize
  valid JPEGs for round-trip tests and framed-sink output.

Pixel-for-pixel parity with libjpeg is NOT a goal (libjpeg's fancy
upsampling and integer IDCT differ by design); decoding correctness
is established by (a) encode->decode round-trips staying within
quantization error and (b) the reference's own t1.jpg decoding to a
plausible image with the expected dimensions.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index i of the scan order -> (row, col) flat index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_M = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])

# --- Annex K example tables (T.81 K.1/K.2 + K.3.3) --------------------

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.float64).reshape(8, 8)

_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


class JpegError(ValueError):
    pass


# --- Huffman -----------------------------------------------------------

def _build_decode_table(bits, vals):
    """Canonical Huffman -> 16-bit peek LUT (sym[65536] int16,
    length[65536] uint8): one table lookup decodes any symbol, vs up
    to 16 per-bit dict probes (the decode hot loop)."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            span = 1 << (16 - length)
            sym[start:start + span] = vals[k]
            ln[start:start + span] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _build_encode_table(bits, vals) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


# --- decoder -----------------------------------------------------------

def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficient blocks -> spatial samples (float)."""
    return np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale JPEGs are
    replicated across channels, matching PIL's convert('RGB')).
    Malformed/truncated input raises JpegError."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error, StopIteration) as exc:
        raise JpegError(f"malformed JPEG: {exc!r}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], ">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], np.uint8)
                    i += 64
                q = np.zeros(64)
                q[_ZIGZAG] = vals.astype(np.float64)
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": height, "w": width, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported JPEG profile (SOF{marker - 0xC0}): only "
                f"baseline sequential DCT is implemented")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            ecs_start = pos + seg_len
            return _decode_scan(data, ecs_start, frame, scan, qtables,
                                htables, restart_interval)
        pos += seg_len
    raise JpegError("no scan data found")


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval):
    h_max = max(c["h"] for c in frame["comps"])
    v_max = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * h_max))
    mcus_y = -(-frame["h"] // (8 * v_max))
    n_mcus = mcus_x * mcus_y

    # destuff the entropy segment up to the next non-RST marker,
    # recording MCU-resync points at RST markers
    chunks, restarts = [], []
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            chunks.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            chunks.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            restarts.append(len(chunks))
            i += 2
        else:
            break  # EOI or next marker
    stream = bytes(chunks)

    for comp in frame["comps"]:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        comp["coefs"] = np.zeros((bh * bw, 8, 8))

    # --- inlined entropy loop: the decode hot path runs on local
    # variables (bit accumulator, list-based LUTs, per-block zigzag
    # scatter done once via numpy) — ~3x over a method-per-bit reader
    units = []  # (pred_key, sym_lut list, len_lut list (dc), ac pair,
    #              coefs ndarray, block-index fn inputs)
    for ci, (comp, td, ta) in enumerate(scan):
        dc_sym, dc_len = htables[(0, td)]
        ac_sym, ac_len = htables[(1, ta)]
        units.append((ci, dc_sym.tolist(), dc_len.tolist(),
                      ac_sym.tolist(), ac_len.tolist(), comp))
    zz_scan = [[] for _ in scan]   # per comp: (block_index, zz list)
    preds = [0] * len(scan)
    restart_idx = 0
    acc = 0
    nbits = 0
    bi = 0
    ns = len(stream)
    consumed = 0
    limit = 8 * ns
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if restart_idx < len(restarts):
                bi = restarts[restart_idx]
                acc = 0
                nbits = 0
                consumed = 8 * bi
                restart_idx += 1
            preds = [0] * len(scan)
        my, mx = divmod(mcu, mcus_x)
        for ci, dc_sym, dc_len, ac_sym, ac_len, comp in units:
            ch, cv = comp["h"], comp["v"]
            bw = mcus_x * ch
            for v in range(cv):
                for h in range(ch):
                    zz = [0] * 64
                    # DC
                    while nbits < 16:
                        acc = ((acc << 8)
                               | (stream[bi] if bi < ns else 0)) \
                            & 0xFFFFFF
                        bi += 1 if bi < ns else 0
                        nbits += 8
                    key = (acc >> (nbits - 16)) & 0xFFFF
                    length = dc_len[key]
                    if length == 0:
                        raise JpegError("invalid Huffman code")
                    nbits -= length
                    consumed += length
                    s = dc_sym[key]
                    if s:
                        while nbits < s:
                            acc = ((acc << 8)
                                   | (stream[bi] if bi < ns else 0)) \
                                & 0xFFFFFF
                            bi += 1 if bi < ns else 0
                            nbits += 8
                        val = (acc >> (nbits - s)) & ((1 << s) - 1)
                        nbits -= s
                        consumed += s
                        if val < (1 << (s - 1)):
                            val -= (1 << s) - 1
                        preds[ci] += val
                    zz[0] = preds[ci]
                    # AC
                    k = 1
                    while k < 64:
                        while nbits < 16:
                            acc = ((acc << 8)
                                   | (stream[bi] if bi < ns else 0)) \
                                & 0xFFFFFF
                            bi += 1 if bi < ns else 0
                            nbits += 8
                        key = (acc >> (nbits - 16)) & 0xFFFF
                        length = ac_len[key]
                        if length == 0:
                            raise JpegError("invalid Huffman code")
                        nbits -= length
                        consumed += length
                        rs = ac_sym[key]
                        size = rs & 15
                        if size == 0:
                            if rs == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise JpegError("AC index out of range")
                        while nbits < size:
                            acc = ((acc << 8)
                                   | (stream[bi] if bi < ns else 0)) \
                                & 0xFFFFFF
                            bi += 1 if bi < ns else 0
                            nbits += 8
                        val = (acc >> (nbits - size)) \
                            & ((1 << size) - 1)
                        nbits -= size
                        consumed += size
                        if val < (1 << (size - 1)):
                            val -= (1 << size) - 1
                        zz[k] = val
                        k += 1
                    if consumed > limit:
                        raise JpegError(
                            "truncated entropy-coded segment")
                    by = my * cv + v
                    bx = mx * ch + h
                    zz_scan[ci].append((by * bw + bx, zz))
    for ci, (comp, _, _) in enumerate(scan):
        if zz_scan[ci]:
            idxs = np.array([t[0] for t in zz_scan[ci]], dtype=np.int64)
            vals = np.array([t[1] for t in zz_scan[ci]],
                            dtype=np.float64)
            flat = np.zeros((vals.shape[0], 64))
            flat[:, _ZIGZAG] = vals  # zigzag scatter, all blocks at once
            comp["coefs"][idxs] = flat.reshape(-1, 8, 8)

    planes = []
    for comp in frame["comps"]:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        spatial = _idct_blocks(comp["coefs"] * qtables[comp["tq"]])
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)) + 128.0
        # box upsample to full resolution, crop to frame dims
        plane = np.repeat(np.repeat(plane, v_max // comp["v"], axis=0),
                          h_max // comp["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])

    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------

def _quality_tables(quality: int):
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHR):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer, blk_q, pred, dc_tab, ac_tab):
    zz = blk_q.ravel()[_ZIGZAG].astype(np.int64)
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_tab[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = last_nz[-1] + 2 if last_nz.size else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if end < 64:
        code, length = ac_tab[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise JpegError("encode_jpeg expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    q_lum, q_chr = _quality_tables(quality)
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] \
        + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] \
        - 0.081312 * f[..., 2] + 128.0

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    writer = _BitWriter()
    dc_l = _build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _build_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _build_encode_table(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _build_encode_table(_AC_CHR_BITS, _AC_CHR_VALS)

    quantized = []
    for plane, qt in ((y, q_lum), (cb, q_chr), (cr, q_chr)):
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8)) - 128.0
        coefs = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M,
                          optimize=True)
        quantized.append(np.rint(coefs / qt).astype(np.int64))

    n_blocks = quantized[0].shape[0]
    preds = [0, 0, 0]
    tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    for b in range(n_blocks):  # 4:4:4 -> 1 block/comp/MCU, Y Cb Cr
        for ci in range(3):
            preds[ci] = _encode_block(writer, quantized[ci][b],
                                      preds[ci], *tabs[ci])
    writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    def dqt(tq, table):
        zz = table.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
        return seg(0xDB, bytes([tq]) + zz)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, q_lum) + dqt(1, q_chr) + sof
            + dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
            + dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
            + dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
            + dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
            + sos + bytes(writer.out) + b"\xff\xd9")
