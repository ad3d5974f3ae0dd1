"""ocr_pytorch_spark — a PySpark-native OCR/extraction analytics engine.

Re-expresses the capabilities of courao/ocr.pytorch (two-stage CTPN text
detection + CRNN/CTC recognition over images) as an idiomatic Spark pipeline
over Iceberg/Parquet tables of interleaved text+media documents:

* relational skeleton (scan / explode / join / regroup / write) = pure
  DataFrame API, optimized by Catalyst/AQE;
* the compute kernels (VGG16+BiGRU CTPN forward, CRNN BiLSTM forward,
  anchor decode, NMS, text-line connection, CTC collapse) = deterministic
  NumPy inside Arrow-vectorized ``mapInPandas`` UDFs, weights broadcast
  once per executor;
* a single-process oracle (``ocr_pytorch_spark.oracle``) that is the
  correctness ground truth — the Spark pipeline must reproduce its span
  sequence ``(kind, text, media_ref, order)`` exactly.

Alongside the extraction pipeline, :mod:`ocr_pytorch_spark.operators`
ships the large-scale training-data operators (dedup, similarity search,
text quality, multimodal plumbing) needed to run this engine as a
web-scale data pipeline.
"""

import os as _os

# Force deterministic, non-oversubscribed BLAS before numpy first loads in
# Spark python workers (harmless if numpy is already initialised).  Every
# executor core runs its own python worker; 1 BLAS thread per worker keeps
# local[32] from oversubscribing and keeps GEMM reduction order identical
# between the driver-side oracle and executor-side UDFs.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"
