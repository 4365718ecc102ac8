"""The north rule's deployment shape, actually executed: package the
engine as a --py-files zip and run a crawl through real spark-submit,
with imports resolving from the zip alone (the repo dir is NOT on the
submitted job's path)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not installed")
def test_submit_crawl_via_py_files(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "webcrawlerfull_spark.zip"))
    driver = tmp_path / "submit_crawl.py"
    shutil.copy(os.path.join(REPO, "submit_crawl.py"), driver)
    cat = tmp_path / "cat"
    env = dict(os.environ)
    # keep the repo out of the job's import path: resolution must come
    # from --py-files, as it would on a cluster
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(driver),
            "--catalog", str(cat),
            "--world-seed", "42",
            "--world-hosts", "4",
            "--world-pages", "40",
            "--max-depth", "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    out = json.loads(lines[-1])
    assert out["rounds_run"] == 2
    assert out["fetched"] > 0
    assert out["products"] > 0
    # the catalog is the durable state: a second submit against the same
    # catalog resumes as finished (no re-fetch of seen URLs)
    proc2 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(driver),
            "--catalog", str(cat),
            "--world-seed", "42",
            "--world-hosts", "4",
            "--world-pages", "40",
            "--max-depth", "2",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    out2 = json.loads(
        [l for l in proc2.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert out2["rounds_run"] == 0
    assert out2["products"] == out["products"]
