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

Usage: python tools/crash_soak.py [n_pages=20000] [kill_after_s=18] [cores=8] [storage=posix|condput|flaky] [dlq] [wap]
(kill windows must exceed JVM boot (~10 s) or no attempt makes progress;
flaky = condput + ~5%-per-op injected transient faults and stale
listings under SDK-style retries — SIGKILLs land on an already-degraded
store, the adversarial double-fault soak)

`dlq` mode: a deterministic slice of the log (offset % 97 == 13) is
corrupted — alternating truncated-JSON envelopes (whole-group
quarantine path) and valid-schema events with url=null (observe-guard
path) — the replay runs with --dead-letter, and the first attempts are
killed EXACTLY inside the two-phase merge→spool→checkpoint window via
the runner's SPARK_GRAFT_FAILPOINT hook (os._exit mid-window, same
effect as SIGKILL), the crash window timed kills almost never hit.
Done-criterion (r5 verdict next #1): after every resume the table equals
the DuckDB oracle AND every malformed event's raw row is in the spool —
capture is at-least-once across redone windows, so duplicates are
allowed and quantified, loss is not.

Prints one JSON line: kills, resumes, elapsed_s, final_rows,
oracle_rows, exact_match, orphan_files_reclaimed (+ in dlq mode:
failpoint_kills, dead_expected, dead_distinct, dead_dup_rows, no_loss).
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
    dlq_mode = "dlq" in sys.argv[5:]
    # wap mode: the whole crash-soaked ingest runs STAGED (--wap); every
    # kill and resume happens on the invisible chain, default reads must
    # stay at the empty published floor throughout, and one publish at
    # the end must flip the oracle-exact state visible atomically
    wap_mode = "wap" in sys.argv[5:]

    log = f"/tmp/crash-soak-log-{n_pages}"
    table = "/dev/shm/crash-soak-table"
    dlq = "/dev/shm/crash-soak-dlq"
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(dlq, ignore_errors=True)
    if not os.path.isdir(log):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "run_pipeline.py"), "--master", f"local[{cores}]",
             "generate", "--out", log, "--pages", str(n_pages),
             "--hot-pages", str(max(n_pages // 500, 2)), "--hot-k", "32"],
            check=True, capture_output=True, cwd=REPO,
        )

    if dlq_mode:
        # corrupt offset % 97 == 13 deterministically: alternating
        # truncated JSON (its schema group carries no key column →
        # whole-group quarantine) and valid-schema url=null (the
        # observe-guard null-key path) — both must end up in the spool
        corrupt_log = f"{log}-corrupt"
        if not os.path.isdir(corrupt_log):
            from pyspark.sql import functions as F

            from debezium_server_batch_spark.session import build_session

            spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
            bad = F.when(
                (F.col("offset") / 97).cast("long") % 2 == 0,
                F.lit('{"schema": {"type": "struct", "fi'),
            ).otherwise(
                F.regexp_replace(F.col("value"), r'"url":\s*"[^"]*"', '"url": null')
            )
            (
                spark.read.parquet(log)
                .withColumn(
                    "value",
                    F.when(F.col("offset") % 97 == 13, bad).otherwise(F.col("value")),
                )
                .write.parquet(corrupt_log)
            )
            spark.stop()
        log = corrupt_log

    def replay(timeout: float | None, failpoint: str | None = None):
        """Run one replay attempt; SIGKILL after `timeout` seconds (None
        = let it finish), or let the runner's failpoint hook hard-exit
        mid-two-phase-window. Returns (completed, stats|None)."""
        env = dict(os.environ)
        if failpoint:
            env["SPARK_GRAFT_FAILPOINT"] = failpoint
        cmd = [sys.executable, os.path.join(REPO, "run_pipeline.py"), "--master", f"local[{cores}]",
               "replay", "--log", log, "--table", table, "--storage", storage_name,
               "--batch-events", "4000", "--buckets", "16", "--compact-every", "5"]
        if dlq_mode:
            cmd += ["--dead-letter", dlq]
        if wap_mode:
            cmd += ["--wap"]
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=REPO, env=env)
        try:
            out, err = p.communicate(timeout=timeout)
            if p.returncode == 137:  # failpoint os._exit: a targeted kill
                return False, None
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

    # dlq mode: the first attempts die EXACTLY inside the two-phase
    # window — after the merge committed but before the spool append
    # (batch 0 and 2), and after the spool but before the checkpoint
    # commit (batch 1) — each with malformed events in flight; the
    # resumed attempt must redo the window and re-capture (at-least-once)
    failpoints = (
        ["dlq_pre_spool:0", "dlq_pre_checkpoint:1", "dlq_pre_spool:2"] if dlq_mode else []
    )
    failpoint_kills = 0
    kills = 0
    attempts = 0
    max_kills = 6
    t0 = time.monotonic()
    while True:
        attempts += 1
        fp = failpoints.pop(0) if failpoints else None
        # alternate kill windows so deaths land in different phases
        # (parse, write, commit, inline compaction); after max_kills,
        # let the final attempt drain the tail unharmed
        if fp is not None:
            window = None  # the failpoint is the kill
        else:
            window = None if kills >= max_kills else kill_after + (attempts % 4) * 4.0
        completed, stats = replay(window, failpoint=fp)
        if not completed:
            kills += 1
            if fp is not None:
                failpoint_kills += 1
            continue
        if stats["batches"] == 0:  # drained: resume was a no-op
            break
    elapsed = time.monotonic() - t0

    import duckdb

    con = duckdb.connect()
    # corrupt offsets (dlq mode) never merge: both the truncated-JSON and
    # the url=null variants are excluded from the LWW state by design
    corrupt_filter = 'AND "offset" % 97 != 13' if dlq_mode else ""
    oracle_rows = con.execute(
        f"""
        WITH parsed AS (
          SELECT json_extract_string(value, '$.payload.url') AS url,
                 CAST(json_extract(value, '$.payload.__lsn') AS BIGINT) AS lsn,
                 json_extract_string(value, '$.payload.__deleted') AS deleted
          FROM read_parquet('{log}/*.parquet')
          WHERE value IS NOT NULL {corrupt_filter}
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY lsn DESC) rn FROM parsed
        ) SELECT count(*) FROM ranked WHERE rn = 1 AND deleted = 'false'
        """
    ).fetchone()[0]
    dead_expected = set()
    if dlq_mode:
        dead_expected = {
            r[0]
            for r in con.execute(
                f'SELECT "offset" FROM read_parquet(\'{log}/*.parquet\') WHERE "offset" % 97 = 13'
            ).fetchall()
        }

    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    t = LakeTable.load(spark, table)
    wap_stats = {}
    if wap_mode:
        # the drained, kill-scarred chain is still fully staged: default
        # readers never saw a row of it
        staged_invisible = t.read().count() == 0 and bool(t.snapshot().get("staged"))
        pub = subprocess.run(
            [sys.executable, os.path.join(REPO, "run_pipeline.py"),
             "--master", f"local[{cores}]", "publish", "--table", table,
             "--storage", storage_name],
            capture_output=True, cwd=REPO,
        )
        assert pub.returncode == 0, f"publish failed: {pub.stderr.decode()[-2000:]}"
        wap_stats = {"wap": True, "staged_invisible_before_publish": staged_invisible}
    final_rows = t.read().count()
    # structural integrity after the kills, BEFORE vacuum touches
    # anything: deep fsck opens every referenced parquet footer
    fsck_rep = t.fsck(deep=True)
    orphans = len(t.vacuum(keep_last=1, orphan_grace_s=0.0))

    dlq_stats = {}
    if dlq_mode:
        dead = spark.read.parquet(dlq).select("offset").collect()
        dead_all = [r["offset"] for r in dead]
        dead_distinct = set(dead_all)
        dlq_stats = {
            "failpoint_kills": failpoint_kills,
            "dead_expected": len(dead_expected),
            "dead_distinct": len(dead_distinct),
            # at-least-once re-capture across redone windows: duplicates
            # are allowed and quantified; LOSS is the failure mode
            "dead_dup_rows": len(dead_all) - len(dead_distinct),
            "no_loss": dead_distinct == dead_expected,
        }
    spark.stop()

    out = {
        "storage": storage_name,
        "kills": kills,
        "resumes": attempts - 1,
        "elapsed_s": round(elapsed, 1),
        "final_rows": final_rows,
        "oracle_rows": oracle_rows,
        "exact_match": final_rows == oracle_rows,
        "fsck_ok": fsck_rep["ok"],
        "fsck_errors": fsck_rep["errors"][:5],
        "fsck_deep_files": fsck_rep["deep_files_verified"],
        "orphan_files_reclaimed": orphans,
        **dlq_stats,
        **wap_stats,
    }
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(dlq, ignore_errors=True)
    print(json.dumps(out))
    ok = out["exact_match"] and out["fsck_ok"] and kills > 0
    if dlq_mode:
        ok = ok and dlq_stats["no_loss"] and failpoint_kills > 0
    if wap_mode:
        ok = ok and wap_stats["staged_invisible_before_publish"]
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
