import os
import sys

# deterministic single-thread BLAS before numpy loads anywhere
for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)
import pytest  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ocr_pytorch_spark.sources.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app="ocr_pytorch_spark-tests", cpus=cpus,
                      shuffle_partitions=16, arrow_batch=16)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def bundled_weights():
    from ocr_pytorch_spark.models import weights as W

    return W.load_bundled()


@pytest.fixture(scope="session")
def fixture_cfg():
    from ocr_pytorch_spark.config import PipelineConfig

    return PipelineConfig.fixture()
