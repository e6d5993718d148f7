"""The ship path: the packaged engine runs under real spark-submit with
--py-files (north rule's deployment contract)."""

import shutil
import subprocess
import sys

import pytest


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_job(tmp_path):
    sys.path.insert(0, "/root/repo")
    import package

    zip_path = package.build(str(tmp_path / "pydriosm_spark.zip"))
    out = str(tmp_path / "join_out")
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            "/root/repo/examples/join_job.py",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("JOIN_JOB_RESULT")]
    assert line and "rows=322" in line[0], (line, r.stdout[-500:])


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_dedup_job(tmp_path):
    """The training-data dedup pipeline ships the same way."""
    sys.path.insert(0, "/root/repo")
    import package

    zip_path = package.build(str(tmp_path / "pydriosm_spark.zip"))
    out = str(tmp_path / "dedup_out")
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            "/root/repo/examples/dedup_job.py",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("DEDUP_JOB_RESULT")]
    assert line and "docs=500" in line[0], (line, r.stdout[-500:])
    # dedup must actually drop something on this corpus
    dropped = int(line[0].split("dropped=")[1])
    assert dropped > 0, line