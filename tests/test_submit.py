"""The north_rule launch path: `spark-submit --py-files <pkg.zip>` from a
cwd where the package is NOT importable — the real cluster deployment
shape. Skipped if no spark-submit binary is on PATH."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    from tika_wrap_spark.portability import package_zip

    zip_path = package_zip(str(tmp_path))
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "120", out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # package not importable from here except via zip
        env=env,
        timeout=300,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert proc.returncode == 0 and lines, proc.stderr[-2000:]
    status = json.loads(lines[-1])
    assert status["status"] == "ok"
    assert status["docs"] == 120
    assert status["parts_done"] == 16
