"""north_rule launch mode: the pipeline must run via
``spark-submit --py-files identity_matching_spark.zip``. This drives the
real spark-submit binary from a NEUTRAL cwd so the package can only be
imported from the zip."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "identity_matching_spark.zip")
    subprocess.run(
        ["bash", os.path.join(REPO, "tools", "make_pyfiles.sh"), zip_path],
        check=True, capture_output=True,
    )
    out = str(tmp_path / "out")
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "run_linkage.py"),
         "--input", "synthetic:50", "--output", out, "--no-fuzzy"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # neutral cwd: package import must come from the zip
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["pairs_scored"] > 0 and summary["n_clusters"] > 0
    assert os.path.exists(os.path.join(out, "clusters", "_SUCCESS"))
