"""Launch-shape smoke: the north_rule run mode is ``spark-submit
--py-files web_graph_spark.zip`` — executors must import the package
from the zip (catches anything that silently leans on repo PYTHONPATH,
e.g. a pandas UDF closure importing a module not in the artifact)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.spark
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this image")
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_pyfiles

    zip_path = build_pyfiles.build(str(tmp_path / "wgs.zip"))

    from web_graph_spark.fixtures import generate_fixtures

    fix = tmp_path / "fix"
    fix.mkdir()
    generate_fixtures(str(fix), seed=42, n_pages=50, n_hosts=6)

    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "crawl_job.py"),
         "--fixtures", str(fix), "--state", str(tmp_path / "state"),
         "--max-waves", "2", "--robots"],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),  # NOT the repo — zip must be self-sufficient
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith("{")]
    assert json_lines, out.stdout
    stats = json.loads(json_lines[-1])
    assert stats["waves"] == 2
    assert stats["urls_scheduled"] > 0
    assert stats["pages_fetched"] > 0
