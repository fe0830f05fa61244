"""Cluster-deployment smoke: the engine must run when shipped the way a
real Spark cluster receives it — entry script + `--py-files` zip via
spark-submit — not just when imported from a repo checkout. The zip is
built from the package dir, the submit runs from a neutral cwd with a
scrubbed PYTHONPATH, so a pass proves executors-and-driver can resolve
every module from the archive alone (reference parity: the Java engine
ships as a fat jar; application.sh in memiiso's docs drives it the same
three-step way)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)


def _submit(cwd: str, *app_args: str) -> dict:
    """spark-submit run_pipeline.py from a neutral dir; return its last
    JSON status line."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", os.path.join(cwd, "engine_pkg.zip"),
        os.path.join(cwd, "run_pipeline.py"),
        *app_args,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout}\n{proc.stderr}"
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON status line:\n{proc.stdout}"
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_zip_end_to_end(tmp_path):
    stage = str(tmp_path)
    shutil.copy(os.path.join(REPO, "run_pipeline.py"), stage)
    shutil.make_archive(
        os.path.join(stage, "engine_pkg"), "zip", REPO, "debezium_server_batch_spark"
    )

    log = os.path.join(stage, "log")
    gen = _submit(stage, "generate", "--out", log, "--pages", "60",
                  "--hot-pages", "2", "--hot-k", "3", "--files", "4")
    assert gen["events"] > 60  # hot pages guarantee updates beyond inserts

    table = os.path.join(stage, "table")
    rep = _submit(stage, "replay", "--log", log, "--table", table,
                  "--buckets", "4", "--auto-compact")
    assert rep["events"] == gen["events"]
    assert rep["batches"] >= 1

    fsck = _submit(stage, "fsck", "--table", table, "--deep")
    assert fsck["ok"] is True and fsck["errors"] == []
    assert fsck["deep_files_verified"] == fsck["files_checked"] > 0
    assert fsck["rows_metadata"] == 60  # one live row per page after LWW
