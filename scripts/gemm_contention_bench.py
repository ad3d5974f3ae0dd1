"""Memory-system contention ceiling for the scaling ladder.

Spawns K independent single-thread processes (no Spark, no shared
state) each timing (a) a CTPN-shaped sgemm loop and (b) the full
single-image OCR kernel path, at K = 1, 2, 4, 8, 16, 32.  The per-core
throughput ratio r(K) = perf(K)/perf(1) is a Spark-free upper bound on
the ladder's same-host scaling efficiency: local[N] workers run these
exact kernels concurrently, so eff(N -> 4N) <= r(4N)/r(N) before any
dataflow effect.  On a real cluster each executor brings its own
socket, so the low-K conditions are the transferable ones
(BENCH/BASELINE.md).

    python scripts/gemm_contention_bench.py [--mode gemm|ocr|gemmact]

Mode "gemmact" answers the r4 task-4 fusion question by measurement:
the same conv5-shaped GEMM loop plus ONE simulated unfused-activation
round-trip per iteration (sequential fill + sequential sum of an
$SPARK_GRAFT_ACT_MB-sized float32 buffer — the write+read a fused
conv5_x->conv5_{x+1} tile pipeline would eliminate).  If gemmact's
r(32)/r(8) contention ratio matches plain gemm's, the round-trip is
not what saturates the socket, i.e. pair-fusion is bandwidth-neutral
on this host.  $SPARK_GRAFT_CONTENTION_LEVELS (e.g. "1,8,32")
restricts the ladder.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

LEVELS = tuple(int(v) for v in os.environ.get(
    "SPARK_GRAFT_CONTENTION_LEVELS", "1,2,4,8,16,32").split(","))
GEMM_SECONDS = float(os.environ.get("SPARK_GRAFT_GEMM_SECONDS", "4.0"))
OCR_IMAGES = 6
ACT_MB = float(os.environ.get("SPARK_GRAFT_ACT_MB", "7.4"))


def _child(mode: str) -> None:
    import numpy as np
    if mode in ("gemm", "gemmact"):
        # conv5-shaped GEMM: (512 x 4608) @ (4608 x 576)
        rng = np.random.default_rng(0)
        a = rng.standard_normal((512, 4608)).astype(np.float32)
        b = rng.standard_normal((4608, 576)).astype(np.float32)
        out = np.empty((512, 576), np.float32)
        act = np.empty(int(ACT_MB * (1 << 20) / 4), np.float32) \
            if mode == "gemmact" else None
        sink = 0.0
        np.dot(a, b, out=out)  # warm
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < GEMM_SECONDS:
            np.dot(a, b, out=out)
            if act is not None:
                act.fill(0.33)          # the write an unfused conv
                sink += float(act.sum())  # pair spends; fused saves it
            n += 1
        dt = time.perf_counter() - t0
        gflops = 2 * 512 * 4608 * 576 * n / dt / 1e9
        print(json.dumps({"gflops": round(gflops, 2),
                          "iters_per_sec": round(n / dt, 3)}))
    else:
        from ocr_pytorch_spark import datagen, oracle
        from ocr_pytorch_spark.config import PipelineConfig
        from ocr_pytorch_spark.models import weights as W
        ctpn_w, crnn_w = W.load_bundled()
        cfg = PipelineConfig.fixture()
        imgs = [datagen.gen_image_array(f"img-ct-{i:04d}")[0]
                for i in range(OCR_IMAGES)]
        oracle.ocr_image(imgs[0], ctpn_w, crnn_w, cfg)  # warm
        t0 = time.perf_counter()
        for im in imgs:
            oracle.ocr_image(im, ctpn_w, crnn_w, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"imgs_per_sec": round(OCR_IMAGES / dt, 3)}))


def main() -> None:
    if "--child" in sys.argv:
        _child(sys.argv[sys.argv.index("--child") + 1])
        return
    mode = "gemm"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    key = "gflops" if mode in ("gemm", "gemmact") else "imgs_per_sec"
    base = None
    for k in LEVELS:
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            stdout=subprocess.PIPE, text=True) for _ in range(k)]
        vals = []
        for p in procs:
            out, _ = p.communicate()
            vals.append(json.loads(out.strip().splitlines()[-1])[key])
        per_core = sum(vals) / len(vals)
        base = base or per_core
        print(json.dumps({
            "concurrency": k, f"per_core_{key}": round(per_core, 2),
            f"agg_{key}": round(sum(vals), 2),
            "ratio_vs_1way": round(per_core / base, 3)}))


if __name__ == "__main__":
    main()
