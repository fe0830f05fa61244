"""Process-crash soak: SIGKILL the real CLI replay at random moments,
resume from the in-snapshot checkpoint, repeat until the log drains —
then compare the final table against an independent DuckDB LWW oracle.

This is the end-to-end analogue of tests' commit-crash fuzz: not an
injected exception but a hard process kill (no cleanup, no finally
blocks) at arbitrary points of a real `run_pipeline.py replay` —
mid-write, mid-commit, mid-compaction. Exactly-once must come entirely
from the atomic snapshot protocol: data files written by a killed
attempt stay unreferenced orphans, the checkpoint only advances with
its window's data, and the order-guarded merge makes every re-delivered
window a no-op.

Usage: python tools/crash_soak.py [n_pages=20000] [kill_after_s=18] [cores=8] [storage=posix|condput|flaky]
(kill windows must exceed JVM boot (~10 s) or no attempt makes progress;
flaky = condput + ~5%-per-op injected transient faults and stale
listings under SDK-style retries — SIGKILLs land on an already-degraded
store, the adversarial double-fault soak)
Prints one JSON line: kills, resumes, elapsed_s, final_rows,
oracle_rows, exact_match, orphan_files_reclaimed.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    kill_after = float(sys.argv[2]) if len(sys.argv) > 2 else 18.0
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    storage_name = sys.argv[4] if len(sys.argv) > 4 else "posix"

    log = f"/tmp/crash-soak-log-{n_pages}"
    table = "/dev/shm/crash-soak-table"
    shutil.rmtree(table, ignore_errors=True)
    if not os.path.isdir(log):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "run_pipeline.py"), "--master", f"local[{cores}]",
             "generate", "--out", log, "--pages", str(n_pages),
             "--hot-pages", str(max(n_pages // 500, 2)), "--hot-k", "32"],
            check=True, capture_output=True, cwd=REPO,
        )

    def replay(timeout: float | None):
        """Run one replay attempt; SIGKILL after `timeout` seconds (None
        = let it finish). Returns (completed, stats|None)."""
        p = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "run_pipeline.py"), "--master", f"local[{cores}]",
             "replay", "--log", log, "--table", table, "--storage", storage_name,
             "--batch-events", "4000", "--buckets", "16", "--compact-every", "5"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=REPO,
        )
        try:
            out, err = p.communicate(timeout=timeout)
            lines = [ln for ln in out.decode().splitlines() if ln.startswith("{")]
            if p.returncode != 0 or not lines:
                # a FAILED resume is exactly the signal this tool exists
                # to surface — don't mask it as an IndexError
                raise RuntimeError(
                    f"replay attempt exited rc={p.returncode} with no stats; "
                    f"stderr tail:\n{err.decode()[-2000:]}"
                )
            return True, json.loads(lines[-1])
        except subprocess.TimeoutExpired:
            p.send_signal(signal.SIGKILL)  # hard kill: no cleanup runs
            p.wait()
            return False, None

    kills = 0
    attempts = 0
    max_kills = 6
    t0 = time.monotonic()
    while True:
        attempts += 1
        # alternate kill windows so deaths land in different phases
        # (parse, write, commit, inline compaction); after max_kills,
        # let the final attempt drain the tail unharmed
        window = None if kills >= max_kills else kill_after + (attempts % 4) * 4.0
        completed, stats = replay(window)
        if not completed:
            kills += 1
            continue
        if stats["batches"] == 0:  # drained: resume was a no-op
            break
    elapsed = time.monotonic() - t0

    import duckdb

    con = duckdb.connect()
    oracle_rows = con.execute(
        f"""
        WITH parsed AS (
          SELECT json_extract_string(value, '$.payload.url') AS url,
                 CAST(json_extract(value, '$.payload.__lsn') AS BIGINT) AS lsn,
                 json_extract_string(value, '$.payload.__deleted') AS deleted
          FROM read_parquet('{log}/*.parquet') WHERE value IS NOT NULL
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY lsn DESC) rn FROM parsed
        ) SELECT count(*) FROM ranked WHERE rn = 1 AND deleted = 'false'
        """
    ).fetchone()[0]

    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    t = LakeTable.load(spark, table)
    final_rows = t.read().count()
    orphans = len(t.vacuum(keep_last=1, orphan_grace_s=0.0))
    spark.stop()

    out = {
        "storage": storage_name,
        "kills": kills,
        "resumes": attempts - 1,
        "elapsed_s": round(elapsed, 1),
        "final_rows": final_rows,
        "oracle_rows": oracle_rows,
        "exact_match": final_rows == oracle_rows,
        "orphan_files_reclaimed": orphans,
    }
    shutil.rmtree(table, ignore_errors=True)
    print(json.dumps(out))
    if not out["exact_match"] or kills == 0:
        sys.exit(1)


if __name__ == "__main__":
    main()
