"""The spark-submit --py-files artifact must import standalone."""

import subprocess
import sys


def test_pyfiles_zip_imports_cleanly(tmp_path):
    sys.path.insert(0, "/root/repo")
    import package

    out = package.build(str(tmp_path / "pydriosm_spark.zip"))
    prog = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import pydriosm_spark, pydriosm_spark.queries, "
        "pydriosm_spark.operators.spatial_join, pydriosm_spark.sources.pbf; "
        "print('ok', pydriosm_spark.__version__)"
    )
    r = subprocess.run(
        [sys.executable, "-c", prog, out],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(tmp_path),  # away from the repo: the zip must self-suffice
    )
    assert r.stdout.startswith("ok ")