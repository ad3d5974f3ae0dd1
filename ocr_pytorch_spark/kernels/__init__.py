"""Deterministic NumPy compute kernels (inference-only).

These run inside Arrow-vectorized pandas UDFs on executors AND inside the
single-process oracle on the driver — sharing one implementation is what
makes oracle/Spark span equality exact (SURVEY.md §4.3)."""

from ocr_pytorch_spark.kernels.nn import (  # noqa: F401
    batchnorm2d,
    bigru,
    bilstm,
    conv2d,
    linear,
    maxpool2d,
    relu,
    sigmoid,
    softmax,
)
from ocr_pytorch_spark.kernels.image import (  # noqa: F401
    grayscale_bgr,
    resize_area,
    resize_lanczos,
    rotate_crop,
)


def decode_image(data: bytes):
    """Magic-byte-dispatched image file decode -> (H, W, 3) uint8 RGB.
    Covers both formats the reference's demo path reads (demo.py:17
    globs test_images/*.* — PNGs — and test_result/t1.jpg is its own
    rendered JPEG output)."""
    if bytes(data[:8]) == b"\x89PNG\r\n\x1a\n":
        from ocr_pytorch_spark.kernels.png import decode_png

        return decode_png(data)
    if bytes(data[:2]) == b"\xff\xd8":
        from ocr_pytorch_spark.kernels.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unknown image codec (not PNG or baseline JPEG)")
