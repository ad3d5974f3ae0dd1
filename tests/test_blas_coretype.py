"""OpenBLAS core-type forcing (ocr_pytorch_spark.__init__._blas_coretype).

On virtualized hosts OpenBLAS's DYNAMIC_ARCH auto-detection can fall
back to a pre-AVX-512 sgemm kernel (~4× slower); the package forces the
kernel family from /proc/cpuinfo flags before numpy first loads.

Different kernel families accumulate GEMMs in different block orders,
so activations are NOT bitwise-equal across families — and on
borderline logits a CTC argmax can flip (observed: fixture image
img-td-0001 decodes '7@7@' under COOPERLAKE vs '7@7@U' under NEHALEM).
The engine therefore NEVER compares floats across the family boundary:

* the session factory forwards the detected family to every executor
  python worker (spark.executorEnv), so pipeline UDFs and in-session
  code share one family;
* the flagship parity key (__spark_entry__._ocr_extract_parity)
  computes its per-image oracle OCR executor-side, so both parity
  sides share one family even under a harness-owned session whose
  driver numpy initialised before the env var landed.

These tests pin that design: detection works, results are
deterministic WITHIN a family, the family is forwarded to executors,
and the known cross-family divergence stays documented (if it ever
becomes stable this file is the place to relax the design).
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
    "for i in range(24):\n"
    "    im = datagen.gen_image_array('img-td-%04d' % i)[0]\n"
    "    out.append(oracle.ocr_image(im, ctpn_w, crnn_w, cfg))\n"
    "print(repr(out))\n"
)


def _spans_under(coretype: str) -> str:
    env = dict(os.environ)
    env["OPENBLAS_NUM_THREADS"] = "1"
    env["OPENBLAS_CORETYPE"] = coretype
    r = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


def test_coretype_detected_on_this_host():
    ct = PKG._blas_coretype()
    if ct is None:
        pytest.skip("no cpuinfo flags — nothing to force")
    assert ct in ("COOPERLAKE", "SKYLAKEX", "HASWELL")
    # the import already exported it for child processes
    assert os.environ.get("OPENBLAS_CORETYPE")


def test_deterministic_within_family():
    """Same kernel family twice -> bitwise-identical span output (the
    determinism the oracle==UDF story actually relies on)."""
    ct = PKG._blas_coretype()
    if ct is None:
        pytest.skip("no forced coretype on this host")
    assert _spans_under(ct) == _spans_under(ct)


def test_session_forwards_family_to_executors(spark):
    """get_spark must pin the SAME family for python workers."""
    ct = os.environ.get("OPENBLAS_CORETYPE")
    if ct is None:
        pytest.skip("no forced coretype on this host")
    assert spark.conf.get(
        "spark.executorEnv.OPENBLAS_CORETYPE", None) == ct


def test_cross_family_divergence_documented():
    """Cross-family span equality is NOT guaranteed — this asserts the
    engine's assumption inventory stays honest.  It does not require
    divergence (a future OpenBLAS could converge); it requires that
    when divergence exists, it is exactly the borderline-argmax kind:
    per-image outputs may differ only in transcript content, never in
    structure (list of (order, text) pairs with dense orders)."""
    ct = PKG._blas_coretype()
    if ct is None:
        pytest.skip("no forced coretype on this host")
    fast = eval(_spans_under(ct))          # noqa: S307 — own output
    old = eval(_spans_under("NEHALEM"))    # noqa: S307
    assert len(fast) == len(old)
    for a, b in zip(fast, old):
        assert [o for o, _ in a] == list(range(len(a)))
        assert [o for o, _ in b] == list(range(len(b)))


_MIXED_HARNESS = (
    "import sys\n"
    "import numpy  # driver numpy initialises on the AUTODETECTED family\n"
    f"sys.path.insert(0, {REPO_ROOT!r})\n"
    "import __spark_entry__ as E  # sets OPENBLAS_CORETYPE post-numpy\n"
    "from pyspark.sql import SparkSession\n"
    "spark = (SparkSession.builder.master('local[4]')\n"
    "         .config('spark.sql.shuffle.partitions', '8')\n"
    "         .config('spark.ui.enabled', 'false')\n"
    "         .getOrCreate())  # harness-style: NO executorEnv forward\n"
    "df = E.queries()['ocr_extract_parity'](spark, "
    "'/root/testdata/sf0.001')\n"
    "n = df.count()\n"
    "print('VIOLATIONS', n)\n"
    "spark.stop()\n"
    "assert n == 0\n"
)


def test_parity_survives_mixed_kernel_harness_session():
    """Regression test for the real failure mode: driver numpy on the
    autodetected family, workers (forked after the env var landed) on
    the forced family.  ocr_extract_parity must still be empty because
    BOTH its sides now run executor-side."""
    if PKG._blas_coretype() is None:
        pytest.skip("no forced coretype on this host")
    env = dict(os.environ)
    env["OPENBLAS_NUM_THREADS"] = "1"
    env.pop("OPENBLAS_CORETYPE", None)
    r = subprocess.run(
        [sys.executable, "-c", _MIXED_HARNESS],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=REPO_ROOT)
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-2000:])
    assert "VIOLATIONS 0" in r.stdout
