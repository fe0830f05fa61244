"""Scaling-efficiency evidence (north_rule: N → 4N executors ≥ 0.8).

No real cluster in the sandbox, so per task instructions we run the SAME
replay job on the SAME input at local[8] and local[32] in separate JVMs
(fresh SparkSession each) and report throughput at both plus
efficiency = (T8 / T32) / 4 ... i.e. speedup/4.

Usage: python tools/scaling.py [n_pages] — writes tools/scaling_result.json
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cores: int, log_path: str, workdir: str, batch_events: int = 300_000) -> dict:
    table = os.path.join(workdir, f"pages-{cores}")
    cmd = [
        sys.executable,
        os.path.join(REPO, "run_pipeline.py"),
        "--master",
        f"local[{cores}]",
        "--shuffle-partitions",
        str(cores),
        "replay",
        "--log",
        log_path,
        "--table",
        table,
        "--batch-events",
        str(batch_events),
        "--buckets",
        str(max(cores, 16)),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    workdir = tempfile.mkdtemp(prefix="dsbs-scaling-")
    # cache the generated log across invocations (deterministic by n_pages)
    log_path = f"/tmp/dsbs-scaling-log-{n_pages}"
    try:
        if not os.path.isdir(log_path):
            gen = subprocess.run(
                [
                    sys.executable, os.path.join(REPO, "run_pipeline.py"),
                    "--master", "local[32]", "generate",
                    "--out", log_path, "--pages", str(n_pages),
                    "--hot-pages", str(max(n_pages // 1000, 2)), "--hot-k", "64",
                ],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            print("generate:", gen.stdout.strip().splitlines()[-1])

        r8 = run_one(8, log_path, workdir)
        print("local[8]:", r8)
        r32 = run_one(32, log_path, workdir)
        print("local[32]:", r32)

        speedup = r32["events_per_sec"] / r8["events_per_sec"]
        eff = speedup / 4.0
        result = {
            "n_pages": n_pages,
            "events": r32["events"],
            "local8_events_per_sec": r8["events_per_sec"],
            "local32_events_per_sec": r32["events_per_sec"],
            "speedup_8_to_32": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(result))
        with open(os.path.join(REPO, "tools", "scaling_result.json"), "w") as fh:
            json.dump(result, fh, indent=2)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
