"""Deterministic fixture weights for CTPN + CRNN.

Pretrained checkpoints are an external download the sandbox lacks
(reference README.md:29-30; /root/reference/checkpoints holds only
.DS_Store), so parity is defined against a reference-faithful oracle
running these seed-42 weights (SURVEY.md §6, FIXTURES.md §3).  Layer names
and shapes exactly mirror the torch ``state_dict`` of
detect/ctpn_model.py:89-99 and recognize/crnn.py:22-63, so real
checkpoints (converted .pth -> .npz) would drop in unchanged.

The rpn_class bias is calibrated so a small fraction of anchors clears the
0.5 foreground gate on fixture images — otherwise NMS / graph-connect /
recognition would be vacuously empty (FIXTURES.md §3).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ocr_pytorch_spark.models.alphabet import NCLASS

SEED = 42
# calibrated fg fraction target: ~5% of anchors above the 0.5 gate
CALIB_QUANTILE = 0.95

_VGG_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
              (10, 128, 256), (12, 256, 256), (14, 256, 256),
              (17, 256, 512), (19, 512, 512), (21, 512, 512),
              (24, 512, 512), (26, 512, 512), (28, 512, 512)]


def _conv(rng, out_c, in_c, kh, kw, gain=1.0):
    std = gain * np.sqrt(2.0 / (in_c * kh * kw))
    w = rng.normal(0.0, std, size=(out_c, in_c, kh, kw)).astype(np.float32)
    b = rng.normal(0.0, 0.01, size=(out_c,)).astype(np.float32)
    return w, b


def _rnn(rng, gates, hidden, inp):
    k = 1.0 / np.sqrt(hidden)
    def u(*shape):
        return rng.uniform(-k, k, size=shape).astype(np.float32)
    return {
        "weight_ih_l0": u(gates * hidden, inp),
        "weight_hh_l0": u(gates * hidden, hidden),
        "bias_ih_l0": u(gates * hidden),
        "bias_hh_l0": u(gates * hidden),
        "weight_ih_l0_reverse": u(gates * hidden, inp),
        "weight_hh_l0_reverse": u(gates * hidden, hidden),
        "bias_ih_l0_reverse": u(gates * hidden),
        "bias_hh_l0_reverse": u(gates * hidden),
    }


def gen_ctpn_weights(seed: int = SEED) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {}
    for idx, in_c, out_c in _VGG_CONVS:
        cw, cb = _conv(rng, out_c, in_c, 3, 3)
        w[f"base_layers.{idx}.weight"] = cw
        w[f"base_layers.{idx}.bias"] = cb
    w["rpn.conv.weight"], w["rpn.conv.bias"] = _conv(rng, 512, 512, 3, 3)
    for name, arr in _rnn(rng, 3, 128, 512).items():
        w[f"brnn.{name}"] = arr
    w["lstm_fc.conv.weight"], w["lstm_fc.conv.bias"] = _conv(
        rng, 512, 256, 1, 1)
    # class head: healthy spatial variance so the fg gate separates anchors
    w["rpn_class.conv.weight"], w["rpn_class.conv.bias"] = _conv(
        rng, 20, 512, 1, 1, gain=2.0)
    # regress head: small outputs keep decoded boxes near their anchors
    # (exp(Vh) ~ 1), giving the connector realistic chains
    rw, rb = _conv(rng, 20, 512, 1, 1, gain=0.05)
    w["rpn_regress.conv.weight"] = rw
    w["rpn_regress.conv.bias"] = (rb * 0.0).astype(np.float32)
    return w


def gen_crnn_weights(seed: int = SEED,
                     nclass: int = NCLASS) -> dict[str, np.ndarray]:
    """nclass defaults to the 96-class fixture alphabet; pass
    alphabet.full_nclass() (5835) for real-checkpoint-shaped heads
    (crnn_recognizer.py:104)."""
    rng = np.random.default_rng(seed + 1)
    w: dict[str, np.ndarray] = {}
    convs = [("conv1", 1, 64, 3), ("conv2", 64, 128, 3),
             ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
             ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
             ("conv5", 512, 512, 2)]
    for name, in_c, out_c, k in convs:
        cw, cb = _conv(rng, out_c, in_c, k, k)
        w[f"{name}.weight"] = cw
        w[f"{name}.bias"] = cb
    for bn, ch in [("bn3", 256), ("bn4", 512), ("bn5", 512)]:
        w[f"{bn}.weight"] = np.ones(ch, dtype=np.float32)
        w[f"{bn}.bias"] = np.zeros(ch, dtype=np.float32)
        w[f"{bn}.running_mean"] = np.zeros(ch, dtype=np.float32)
        w[f"{bn}.running_var"] = np.ones(ch, dtype=np.float32)
    for name, arr in _rnn(rng, 4, 256, 512).items():
        w[f"rnn.0.rnn.{name}"] = arr
    k = 1.0 / np.sqrt(512)
    w["rnn.0.embedding.weight"] = rng.uniform(
        -k, k, size=(256, 512)).astype(np.float32)
    w["rnn.0.embedding.bias"] = rng.uniform(
        -k, k, size=(256,)).astype(np.float32)
    for name, arr in _rnn(rng, 4, 256, 256).items():
        w[f"rnn.1.rnn.{name}"] = arr
    # final head: large weight / small bias so per-timestep features (not
    # the bias) pick the argmax class -> diverse fixture transcripts
    w["rnn.1.embedding.weight"] = rng.uniform(
        -8 * k, 8 * k, size=(nclass, 512)).astype(np.float32)
    w["rnn.1.embedding.bias"] = rng.uniform(
        -0.1 * k, 0.1 * k, size=(nclass,)).astype(np.float32)
    return w


def calibrate_ctpn(w: dict[str, np.ndarray], images: list[np.ndarray],
                   detect_height: int) -> dict[str, np.ndarray]:
    """Shift the class-1 bias so ~(1-CALIB_QUANTILE) of anchors pass the
    0.5 gate on the calibration images.  P(text)>0.5 <=> logit1>logit0, so
    a uniform bias shift moves the pass fraction monotonically."""
    from ocr_pytorch_spark import config as C
    from ocr_pytorch_spark.kernels import resize_area
    from ocr_pytorch_spark.models.ctpn import ctpn_forward

    diffs = []
    for img in images:
        h0, w0 = img.shape[:2]
        r = detect_height / float(h0)
        im = resize_area(img, detect_height, int(w0 * r))
        x = (im.astype(np.float32)
             - np.array(C.IMAGE_MEAN, dtype=np.float32)).transpose(2, 0, 1)
        cls, _ = ctpn_forward(x[None], w)
        diffs.append(cls[0, :, 1] - cls[0, :, 0])
    diff = np.concatenate(diffs)
    delta = -float(np.quantile(diff, CALIB_QUANTILE))
    w = dict(w)
    bias = w["rpn_class.conv.bias"].copy()
    bias[1::2] += delta  # class-1 channels (h,w-major, [a0c0,a0c1,...])
    w["rpn_class.conv.bias"] = bias
    return w


def weights_dir(repo_root: str | None = None) -> str:
    """Where generated .npz weights live.  Precedence:
    $SPARK_GRAFT_WEIGHTS_DIR, then <repo>/weights derived from the
    package location — UNLESS the package is imported from a zip
    (``spark-submit --py-files pkg.zip``: the derived path sits inside
    the archive and cannot hold files), in which case a stable tmp
    directory is used (found by tests/test_spark_submit.py)."""
    env = os.environ.get("SPARK_GRAFT_WEIGHTS_DIR")
    if env:
        return env
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if repo_root is None and not os.path.isdir(root):
        # per-user, 0700 (r4 ADVICE, low): a fixed world-shared /tmp
        # name would let another local user pre-create the directory
        # and plant tampered .npz files that executors then load
        import getpass
        import tempfile
        d = os.path.join(tempfile.gettempdir(),
                         f"ocr_pytorch_spark_weights_{getpass.getuser()}")
        os.makedirs(d, mode=0o700, exist_ok=True)
        if os.stat(d).st_uid != os.getuid():
            raise PermissionError(
                f"weights dir {d} is owned by another user; set "
                "$SPARK_GRAFT_WEIGHTS_DIR to a private location")
        return d
    return os.path.join(root, "weights")


def save_npz(path: str, w: dict[str, np.ndarray]) -> None:
    # uncompressed: random float weights don't compress, and workers
    # np.load these on first task — raw read is ~2x faster
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **w)


def load_npz(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@lru_cache(maxsize=1)
def load_bundled() -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Load (ctpn, crnn) weights from the repo's weights/ dir, generating
    and caching them on first use."""
    d = weights_dir()
    ctpn_path = os.path.join(d, "ctpn.npz")
    crnn_path = os.path.join(d, "crnn.npz")
    if not (os.path.exists(ctpn_path) and os.path.exists(crnn_path)):
        build_bundled()
    return load_npz(ctpn_path), load_npz(crnn_path)


def build_bundled(detect_height: int | None = None) -> None:
    """Generate seed-42 weights, calibrate on deterministic fixture
    images, and save under weights/."""
    from ocr_pytorch_spark import config as C
    from ocr_pytorch_spark.datagen import gen_image_array

    dh = detect_height or C.PipelineConfig.fixture().detect_height
    ctpn = gen_ctpn_weights()
    calib_imgs = [gen_image_array(f"calib-{i:04d}", SEED)[0]
                  for i in range(6)]
    ctpn = calibrate_ctpn(ctpn, calib_imgs, dh)
    crnn = gen_crnn_weights()
    d = weights_dir()
    save_npz(os.path.join(d, "ctpn.npz"), ctpn)
    save_npz(os.path.join(d, "crnn.npz"), crnn)


if __name__ == "__main__":
    build_bundled()
    print("weights written to", weights_dir())
