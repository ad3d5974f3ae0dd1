"""Reference-720p profile leg (r5 VERDICT task 7): the Winograd and
blocked-conv dispatch window in kernels/nn.py was tuned on measurements
showing wins only at reference-720p deep-layer shapes (C >= 256,
512 <= tiles <= 8192) — but the bench ladder never actually runs that
profile, so the gate's benefit was asserted from microbenchmarks, not
an end-to-end 720p forward.  This script runs a handful of docs at the
reference detect height (720, PipelineConfig.reference()) through the
single-process OCR kernel path twice — gate ENABLED (stock dispatch)
and gate DISABLED (_WINOGRAD_MIN_C forced out of reach, every 3x3 conv
on the blocked im2col path) — and reports:

  * that the gated path actually FIRES at 720p (dispatch counter), and
  * the measured on/off wall delta (min of N reps per setting), with
  * a same-session single-thread GEMM anchor (host-noise context), and
  * span equality between the two numeric paths.

    python scripts/profile720_bench.py                 # 3 imgs, 2 reps
    SPARK_GRAFT_720_IMAGES=2 SPARK_GRAFT_720_REPS=1 ...  # smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

N_IMAGES = int(os.environ.get("SPARK_GRAFT_720_IMAGES", "2"))
REPS = int(os.environ.get("SPARK_GRAFT_720_REPS", "2"))


def main() -> None:
    import numpy as np

    from bench import _gemm_anchor
    from ocr_pytorch_spark import datagen, oracle
    from ocr_pytorch_spark.config import PipelineConfig
    from ocr_pytorch_spark.kernels import nn as NN
    from ocr_pytorch_spark.models import weights as W

    anchor_pre = _gemm_anchor()
    ctpn_w, crnn_w = W.load_bundled()
    cfg = PipelineConfig.reference()  # detect_height = 720

    # 720p-profile inputs: fixture glyph images integer-upscaled with
    # an anisotropic kron so the H->720 aspect-preserving resize lands
    # on reference-scale feature maps (t1.png resizes to ~720x935;
    # target resized W ~= 850 here — one single-thread forward at this
    # profile measures ~50 s, so the leg stays a handful of docs).
    # Content stays the deterministic glyph-bar layout.
    imgs = []
    for i in range(N_IMAGES):
        base, _ = datagen.gen_image_array(f"img-720-{i:04d}")
        h, w = base.shape[:2]
        fy = -(-720 // h)                         # ceil: H*fy >= 720
        fx = max(1, round(1.15 * h * fy / w))     # aspect ~1.15
        imgs.append(np.kron(base, np.ones((fy, fx, 1),
                                          dtype=base.dtype)))

    wino_calls = {"n": 0}
    orig_wino = NN._conv2d_winograd3x3

    def counting(*a, **k):
        wino_calls["n"] += 1
        return orig_wino(*a, **k)

    def run_all():
        return [oracle.ocr_image(im, ctpn_w, crnn_w, cfg)
                for im in imgs]

    results = {}
    spans = {}
    NN._conv2d_winograd3x3 = counting
    try:
        for setting, min_c in (("gate_on", NN._WINOGRAD_MIN_C),
                               ("gate_off", 10 ** 9)):
            saved = NN._WINOGRAD_MIN_C
            NN._WINOGRAD_MIN_C = min_c
            try:
                run_all()  # warm (weight transforms, scratch buffers)
                wino_calls["n"] = 0
                ts = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    spans[setting] = run_all()
                    ts.append(time.perf_counter() - t0)
                results[setting] = {
                    "wall_sec": round(min(ts), 2),
                    "winograd_dispatches": wino_calls["n"] // REPS}
            finally:
                NN._WINOGRAD_MIN_C = saved
    finally:
        NN._conv2d_winograd3x3 = orig_wino

    out = {
        "metric": "720p_profile_wall_sec",
        "images": N_IMAGES,
        "reps": REPS,
        "detect_height": cfg.detect_height,
        "gate_on": results["gate_on"],
        "gate_off": results["gate_off"],
        "speedup_on_over_off": round(
            results["gate_off"]["wall_sec"]
            / max(results["gate_on"]["wall_sec"], 1e-9), 3),
        "spans_equal": spans["gate_on"] == spans["gate_off"],
        "gemm_gflops_single": anchor_pre,
    }
    line = json.dumps(out)
    with open(os.path.join(REPO_ROOT, "BENCH", "PROFILE720.json"),
              "w") as fh:
        fh.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
