"""Single-thread conv2d A/B microbench: blocked (r3) vs full-im2col (r2).

VERDICT r3 task 1: the row-blocked conv shipped alongside a 14% OCR
docs/sec drop.  This isolates the kernel cost, single-thread, BLAS
pinned to one thread, on the real fixture-profile CTPN/CRNN forward
shapes — no Spark involved.

Usage: python scripts/conv_microbench.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

import numpy as np  # noqa: E402


def conv2d_full(x, w, b, stride=1, padding=0, relu=False):
    """The r2 (pre-74ee86c) path: full im2col + one GEMM + transpose."""
    from numpy.lib.stride_tricks import as_strided

    from ocr_pytorch_spark.kernels.nn import _pair, _ws
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    if (kh, kw, sh, sw, ph, pw) == (1, 1, 1, 1, 0, 0) and B == 1:
        out = np.empty((1, O, H, W), dtype=np.float32)
        np.dot(w.reshape(O, C), x.reshape(C, H * W),
               out=out.reshape(O, H * W))
        if b is not None:
            out += b.reshape(1, O, 1, 1)
        if relu:
            np.maximum(out, 0.0, out=out)
        return out
    if ph or pw:
        xp = _ws(("pad",), (B, C, H + 2 * ph, W + 2 * pw))
        xp[:] = 0.0
        xp[:, :, ph:ph + H, pw:pw + W] = x
        x = xp
        H, W = H + 2 * ph, W + 2 * pw
    oh = (H - kh) // sh + 1
    ow = (W - kw) // sw + 1
    s = x.strides
    cols_view = as_strided(
        x, shape=(B, C, kh, kw, oh, ow),
        strides=(s[0], s[1], s[2], s[3], s[2] * sh, s[3] * sw),
        writeable=False)
    cols = _ws(("cols",), (C, kh, kw, B, oh, ow))
    np.copyto(cols, cols_view.transpose(1, 2, 3, 0, 4, 5))
    cols2d = cols.reshape(C * kh * kw, B * oh * ow)
    out2d = _ws(("gemm",), (O, B * oh * ow))
    np.dot(w.reshape(O, -1), cols2d, out=out2d)
    out = out2d.reshape(O, B, oh, ow).transpose(1, 0, 2, 3)
    if b is not None:
        out = out + b.reshape(1, O, 1, 1)
    else:
        out = np.ascontiguousarray(out)
    if relu:
        np.maximum(out, 0.0, out=out)
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from ocr_pytorch_spark import datagen, oracle
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.kernels import nn
    from ocr_pytorch_spark.models import weights as W

    ctpn_w, crnn_w = W.load_bundled()
    cfg = PipelineConfig.fixture()
    imgs = [datagen.gen_image_array(f"img_{i:05d}.png")[0]
            for i in range(8)]

    blocked = nn.conv2d

    from ocr_pytorch_spark.models import crnn as _c, ctpn as _t

    def patch(fn):
        # models import conv2d by name — patch every binding
        nn.conv2d = fn
        _t.conv2d = fn
        _c.conv2d = fn

    def run(tag, fn):
        patch(fn)
        # warmup
        oracle.ocr_image(imgs[0], ctpn_w, crnn_w, cfg)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for im in imgs:
                oracle.ocr_image(im, ctpn_w, crnn_w, cfg)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{tag:10s} min {best:.3f}s  "
              f"({len(imgs) / best:.2f} imgs/s)  all "
              + " ".join(f"{t:.3f}" for t in times))
        return best

    # parity first
    patch(blocked)
    a = oracle.ocr_image(imgs[0], ctpn_w, crnn_w, cfg)
    patch(conv2d_full)
    bb = oracle.ocr_image(imgs[0], ctpn_w, crnn_w, cfg)
    assert a == bb, "conv paths disagree!"
    print(f"parity OK ({len(a)} spans)")

    t_full = run("full", conv2d_full)
    t_blk = run("blocked", blocked)
    print(f"blocked/full ratio: {t_blk / t_full:.3f} "
          f"({'blocked SLOWER' if t_blk > t_full else 'blocked faster'})")
    patch(blocked)


if __name__ == "__main__":
    main()
