"""The north rule's literal launch shape: ``spark-submit --py-files``.

Runs jobs/extract.py through the real spark-submit binary with the
package shipped ONLY as a zip (the job script is copied out of the
repo and launched from a foreign cwd, so imports must come from
--py-files), then asserts the bucketed output + lineage and that an
immediate re-run resumes (skips every committed bucket).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dst: str) -> str:
    zpath = os.path.join(dst, "ocr_pytorch_spark.zip")
    pkg = os.path.join(REPO_ROOT, "ocr_pytorch_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith((".py", ".txt")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO_ROOT))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit binary on this host")
def test_extract_job_via_spark_submit(tmp_path):
    from ocr_pytorch_spark import datagen

    fixture = str(tmp_path / "fx")
    datagen.write_fixture(fixture, 24)
    zpath = _build_zip(str(tmp_path))
    script = str(tmp_path / "run_extract.py")
    shutil.copy(os.path.join(REPO_ROOT, "jobs", "extract.py"), script)
    dst = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["OPENBLAS_NUM_THREADS"] = "1"
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--py-files", zpath,
           script,
           "--documents", os.path.join(fixture, "documents.parquet"),
           "--images", os.path.join(fixture, "images.parquet"),
           "--dst", dst, "--buckets", "4"]

    def run():
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=600, env=env, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-3000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    s1 = run()
    assert s1["docs_processed"] == 24
    assert s1["buckets_skipped"] == 0
    assert os.path.isdir(os.path.join(dst, "data"))
    assert os.path.isdir(os.path.join(dst, "_lineage"))

    # second launch resumes: every committed bucket skipped, no work
    s2 = run()
    assert s2["docs_processed"] == 0
    assert s2["buckets_skipped"] >= 1


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit binary on this host")
def test_web_corpus_job_via_spark_submit(tmp_path):
    """The corpus pipeline launches the same way the OCR job does:
    real spark-submit, package via --py-files zip only, and a second
    launch resumes from the committed lineage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_pytorch_spark import datagen

    rows = [(str(d["doc_id"]),
             " ".join(s["text"] for s in d["spans"]
                      if s["kind"] == "text" and s["text"]))
            for d in datagen.gen_documents(24)]
    docs_path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": [r[0] for r in rows],
                  "text": [r[1] for r in rows]}), docs_path)

    zpath = _build_zip(str(tmp_path))
    script = str(tmp_path / "run_web.py")
    shutil.copy(os.path.join(REPO_ROOT, "jobs", "web_corpus.py"),
                script)
    dst = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["OPENBLAS_NUM_THREADS"] = "1"
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--py-files", zpath,
           script,
           "--documents", docs_path,
           "--dst", dst, "--buckets", "4", "--min-words", "4"]

    def run():
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=600, env=env, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-3000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    s1 = run()
    assert s1["docs_in"] == 24
    assert s1["buckets_skipped"] == 0
    assert os.path.isdir(os.path.join(dst, "web_corpus"))
    assert os.path.isdir(os.path.join(dst, "_lineage"))

    s2 = run()  # resume: fully committed -> short-circuit
    assert s2["docs_processed"] == 0
    assert s2["buckets_skipped"] == 4
