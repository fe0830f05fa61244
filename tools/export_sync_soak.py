"""Crash soak for the incremental export sync (table -> shard tree).

Interleaves real CLI replay legs with `run_pipeline.py export` ticks and
SIGKILLs export attempts at random moments — mid-dynamic-overwrite,
between the data write and the manifest write, between the manifest and
the state file. The exactly-once contract says every redo is a
deterministic function of (table state, surviving manifest), so after
each tick eventually succeeds the tree must be byte-exact:

  * verify_shards: zero integrity failures (manifest == disk per shard)
  * shard tree rows == table rows exactly (id + text)
  * _export_state.json consumed version == the table's version

Usage: python tools/export_sync_soak.py [n_pages=20000] [cores=8]
           [kill_after_s=14] [ticks=4]
Prints one JSON line.
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


def run_cli(args: list[str], timeout: float | None = None) -> tuple[int, str]:
    """Run the CLI; SIGKILL after `timeout` seconds (None = run clean).
    Returns (returncode, stdout)."""
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "run_pipeline.py"), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )
    if timeout is None:
        out, _ = p.communicate()
        return p.returncode, out
    try:
        out, _ = p.communicate(timeout=timeout)
        return p.returncode, out
    except subprocess.TimeoutExpired:
        p.send_signal(signal.SIGKILL)  # hard kill: no cleanup runs
        p.wait()
        return -9, ""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    kill_after = float(sys.argv[3]) if len(sys.argv) > 3 else 14.0
    ticks = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    work = os.path.join("/tmp", f"export_sync_soak_{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    log = os.path.join(work, "log")
    table = os.path.join(work, "pages")
    out = os.path.join(work, "shards")
    master = f"local[{cores}]"

    t0 = time.monotonic()
    rc, o = run_cli(["--master", master, "generate", "--out", log,
                     "--pages", str(n_pages), "--hot-pages", "8", "--hot-k", "10"])
    assert rc == 0, o
    events = json.loads(o.splitlines()[-1])["events"]
    batch_events = max(200, events // (ticks * 2))

    kills = 0
    resumes = 0
    tick_stats = []
    for tick in range(ticks):
        # replay one leg (2 windows per tick; last tick drains)
        leg = ["--master", master, "replay", "--log", log, "--table", table,
               "--batch-events", str(batch_events), "--buckets", "8"]
        if tick < ticks - 1:
            leg += ["--max-batches", "2"]
        rc, o = run_cli(leg)
        assert rc == 0, o

        # export tick: first attempts get killed at a varying offset in
        # the attempt (deterministic schedule, no RNG), then run clean
        n_kill = (tick % 2) + 1  # 1-2 kills per tick
        for k in range(n_kill):
            t = kill_after * (0.55 + 0.3 * ((tick * 3 + k) % 4))
            rc, _ = run_cli(["--master", master, "export", "--table", table,
                             "--out", out, "--shard-tokens", "400"], timeout=t)
            if rc == -9:
                kills += 1
            resumes += 1
        while True:
            rc, o = run_cli(["--master", master, "export", "--table", table,
                             "--out", out, "--shard-tokens", "400", "--verify"])
            if rc == 0:
                break
            resumes += 1
        st = json.loads(o.splitlines()[-1])
        assert st["verify_failed_shards"] == 0, st
        tick_stats.append(st)

    # final in-process audit
    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session

    spark = build_session(master=master, shuffle_partitions=cores,
                          app_name="export-sync-soak-audit")
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, table)
    table_rows = sorted(
        (r["url"], r["text"]) for r in t.read().select("url", "text").collect()
    )
    disk_rows = sorted(
        (r["url"], r["text"])
        for r in spark.read.parquet(os.path.join(out, "data"))
        .select("url", "text").collect()
    )
    with open(os.path.join(out, "_export_state.json")) as f:
        state = json.load(f)
    exact = table_rows == disk_rows
    version_ok = state["src_version"] == (
        t.published_version() if t.published_version() is not None else t.current_version()
    )
    n_shards = spark.read.parquet(os.path.join(out, "_manifest")).count()
    spark.stop()

    result = {
        "n_pages": n_pages,
        "events": events,
        "ticks": ticks,
        "kills": kills,
        "export_attempts": resumes + ticks,
        "final_docs": len(table_rows),
        "shards": n_shards,
        "exact_match": exact,
        "state_version_ok": bool(version_ok),
        "rewritten_per_tick": [s["shards_rewritten"] for s in tick_stats],
        "elapsed_s": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(result))
    if exact and version_ok:
        shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if (exact and version_ok) else 1)


if __name__ == "__main__":
    main()
