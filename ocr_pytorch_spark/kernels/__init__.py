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
