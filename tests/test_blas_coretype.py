"""OpenBLAS core-type forcing (ocr_pytorch_spark.__init__._blas_coretype).

On virtualized hosts OpenBLAS's DYNAMIC_ARCH auto-detection can fall
back to a pre-AVX-512 sgemm kernel (~4× slower); the package forces the
kernel family from /proc/cpuinfo flags before numpy first loads.
Different kernel families accumulate GEMMs in different block orders,
so raw conv activations are NOT bitwise-equal across families — the
engine's guarantee is (a) the env var is set identically for the
driver and every executor python worker (session.py forwards it via
spark.executorEnv), and (b) the *decoded span output* is stable across
families on the fixture corpus, so a driver/executor mismatch in a
hostile environment degrades to the pre-r4 kernel rather than to wrong
answers.  (b) is what this file actually proves, in subprocesses so
each numpy initialises fresh.
"""

import os
import subprocess
import sys

import pytest

import ocr_pytorch_spark as PKG

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = (
    "import sys\n"
    f"sys.path.insert(0, {REPO_ROOT!r})\n"
    "from ocr_pytorch_spark import datagen, oracle\n"
    "from ocr_pytorch_spark.config import PipelineConfig\n"
    "from ocr_pytorch_spark.models import weights as W\n"
    "ctpn_w, crnn_w = W.load_bundled()\n"
    "cfg = PipelineConfig.fixture()\n"
    "out = []\n"
    "for i in range(3):\n"
    "    im = datagen.gen_image_array('img_ct_%03d.png' % i)[0]\n"
    "    out.append(oracle.ocr_image(im, ctpn_w, crnn_w, cfg))\n"
    "print(repr(out))\n"
)


def _spans_under(coretype: str | None) -> str:
    env = dict(os.environ)
    env["OPENBLAS_NUM_THREADS"] = "1"
    env.pop("OPENBLAS_CORETYPE", None)
    if coretype is not None:
        env["OPENBLAS_CORETYPE"] = coretype
    r = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


def test_coretype_detected_on_this_host():
    ct = PKG._blas_coretype()
    if ct is None:
        pytest.skip("no cpuinfo flags — nothing to force")
    assert ct in ("COOPERLAKE", "SKYLAKEX", "HASWELL")
    # the import already exported it for child processes
    assert os.environ.get("OPENBLAS_CORETYPE")


def test_span_output_stable_across_gemm_kernels():
    ct = PKG._blas_coretype()
    if ct is None:
        pytest.skip("no forced coretype on this host")
    forced = _spans_under(ct)
    # a child with no env var self-forces via the package import, so
    # the cross-family comparison needs an explicitly WEAKER kernel
    older = _spans_under("NEHALEM")
    assert forced == older
