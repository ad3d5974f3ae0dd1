"""Bytes/image roofline for the conv5 fusion question (r4 VERDICT
task 4): would fusing conv+ReLU PAIRS of VGG block 5 over one
cache-resident tile (halo exchange) reduce the DRAM traffic that
limits the 8->32 scaling leg?

Method: instrument kernels/nn.conv2d (wrap, don't modify) to record
per-call geometry during one real oracle.ocr_image forward at the
fixture profile (and optionally --reference at 720p), then compute
per-layer traffic:

* weight_stream  = tiles x O x K x 4  — the GEMM's B-side weight
  panel re-streamed per row tile (the term the contention bench
  showed saturating the socket);
* im2col_build   = K x oh x ow x 4 x 2 — column tile write + read;
* act_roundtrip  = O x oh x ow x 4 x 2 — the output write + next
  layer's read.  PAIR FUSION can eliminate only this term (for the
  interior boundary of each fused pair), and only when the buffer
  exceeds cache.

If act_roundtrip is a small fraction of weight_stream + im2col_build
for the conv5 block, fusion is bandwidth-neutral: the saved bytes
don't move the socket's saturation point.  Cross-check by measurement:
scripts/gemm_contention_bench.py --mode gemmact adds exactly this
round-trip to the GEMM loop and compares r(32)/r(8) against plain
gemm.

    python scripts/conv5_roofline.py [--reference]
"""

from __future__ import annotations

import json
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401
from ocr_pytorch_spark.kernels import nn as NN  # noqa: E402

CALLS: list[dict] = []
_orig_conv2d = NN.conv2d


def _spy(x, w, b, stride=1, padding=0, relu=False):
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    sh = stride if isinstance(stride, int) else stride[0]
    ph = padding if isinstance(padding, int) else padding[0]
    oh = (H + 2 * ph - kh) // sh + 1
    ow = (W + 2 * ph - kw) // sh + 1
    K = C * kh * kw
    rows_per = max(1, (NN._CONV_TILE_BYTES // 4) // max(1, K * ow))
    while rows_per * ow < 512 and rows_per < oh:
        rows_per += 1
    rows_per = min(rows_per, oh)
    tiles = (oh + rows_per - 1) // rows_per
    CALLS.append({
        "C": C, "H": H, "W": W, "O": O, "k": kh, "oh": oh, "ow": ow,
        "tiles": tiles,
        "weight_stream": tiles * O * K * 4,
        "im2col_build": K * oh * ow * 4 * 2,
        "act_roundtrip": O * oh * ow * 4 * 2,
    })
    return _orig_conv2d(x, w, b, stride=stride, padding=padding,
                        relu=relu)


def main() -> None:
    from ocr_pytorch_spark import datagen, oracle
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.models import weights as W

    cfg = (PipelineConfig.reference() if "--reference" in sys.argv
           else PipelineConfig.fixture())
    ctpn_w, crnn_w = W.load_bundled()
    img, _ = datagen.gen_image_array("img-roofline-0000")
    NN.conv2d = _spy
    try:
        # also patch the name imported into models.ctpn/crnn modules
        import ocr_pytorch_spark.models.crnn as _crnn
        import ocr_pytorch_spark.models.ctpn as _ctpn
        saved = []
        for mod in (_ctpn, _crnn):
            if hasattr(mod, "conv2d"):
                saved.append((mod, mod.conv2d))
                mod.conv2d = _spy
        oracle.ocr_image(img, ctpn_w, crnn_w, cfg)
    finally:
        NN.conv2d = _orig_conv2d
        for mod, fn in saved:
            mod.conv2d = fn

    conv5 = [c for c in CALLS if c["C"] == 512 and c["O"] == 512
             and c["k"] == 3]
    tot = lambda rows, f: sum(r[f] for r in rows)  # noqa: E731
    result = {
        "profile": "reference" if "--reference" in sys.argv
        else "fixture",
        "conv_calls": len(CALLS),
        "conv5_calls": len(conv5),
        "conv5_weight_stream_mb":
            round(tot(conv5, "weight_stream") / 1e6, 2),
        "conv5_im2col_mb": round(tot(conv5, "im2col_build") / 1e6, 2),
        "conv5_act_roundtrip_mb":
            round(tot(conv5, "act_roundtrip") / 1e6, 2),
        "all_weight_stream_mb":
            round(tot(CALLS, "weight_stream") / 1e6, 2),
        "all_im2col_mb": round(tot(CALLS, "im2col_build") / 1e6, 2),
        "all_act_roundtrip_mb":
            round(tot(CALLS, "act_roundtrip") / 1e6, 2),
    }
    denom = (result["conv5_weight_stream_mb"]
             + result["conv5_im2col_mb"])
    result["conv5_fusion_savable_pct"] = round(
        100 * result["conv5_act_roundtrip_mb"]
        / max(denom + result["conv5_act_roundtrip_mb"], 1e-9), 2)
    print(json.dumps(result))
    for c in conv5:
        print(json.dumps(c))


if __name__ == "__main__":
    main()
