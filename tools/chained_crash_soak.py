"""Chained-pipeline (bronze→silver) crash soak (r4 verdict next-round
#4): SIGKILL the follow daemon repeatedly mid-sync — between its
upstream changelog read and its downstream commit — while the bronze
table is being written by a LIVE replay process AND periodically
compacted + vacuumed. After every resume (and at the end), silver must
equal a from-scratch transform of bronze, row-exact.

What each kill exercises: sync_incremental's exactly-once contract (the
consumed upstream version commits atomically WITH its data, so a death
anywhere re-runs the whole step and the LWW merge absorbs the redo);
the vacuum-expiry RE-BOOTSTRAP fallback (kills can strand the follower
behind the upstream vacuum horizon — the resume must full-read instead
of dying on the expired changelog range); and the validated-rebase
commit path (the follower's merges race the bronze writer's compactor
only on its own silver table, but its bootstrap reads race upstream
rewrites).

The transform is an immutable-attribute filter (url-hash routing) plus
a derived column — the shape where incremental consumption is provably
equivalent to a from-scratch transform (filters on MUTABLE columns are
not, by construction, and sync_incremental's docstring says so).

Usage: python tools/chained_crash_soak.py [n_pages=8000] [cores=8]
       python tools/chained_crash_soak.py daemon <bronze> <silver>  (internal)
Prints one JSON line with kills, ticks, rebootstraps, and the equality
verdict.
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

KEY = "url"


def _transform_fn():
    from pyspark.sql import functions as F

    # immutable-attribute filter (hash routing on the key) + derived col
    return lambda df: df.filter(F.pmod(F.xxhash64(KEY), F.lit(2)) == 0).withColumn(
        "text_len", F.length("text")
    )


def daemon(bronze_root: str, silver_root: str) -> None:
    """The follow daemon: create silver if needed, then tail bronze
    forever, printing one JSON line per tick (killed externally)."""
    from debezium_server_batch_spark.plans.chained import sync_incremental
    from debezium_server_batch_spark.plans.laketable import ConcurrentCommitError, LakeTable
    from debezium_server_batch_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=8)
    bronze = LakeTable.load(spark, bronze_root)
    tf = _transform_fn()
    if not LakeTable.exists(silver_root):
        schema = tf(bronze.read(include_deleted=True)).schema
        try:
            LakeTable.create(
                spark, silver_root, schema, key_col=KEY, num_buckets=4,
                order_by=tuple(bronze.snapshot()["order_by"]),
                merge_mode="mor", delta_layout="unbucketed",
            )
        except ConcurrentCommitError:
            pass  # a previous incarnation created it first
    silver = LakeTable.load(spark, silver_root)
    while True:
        r = sync_incremental(bronze, silver, transform=tf)
        print(json.dumps(r), flush=True)
        if r["noop"]:
            time.sleep(0.5)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    log = f"/tmp/chained-soak-log-{n_pages}"
    bronze = "/dev/shm/chained-soak-bronze"
    silver = "/dev/shm/chained-soak-silver"
    for d in (bronze, silver):
        shutil.rmtree(d, ignore_errors=True)

    def cli(args, **kw):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "run_pipeline.py"), *args],
            capture_output=True, cwd=REPO, **kw,
        )

    if not os.path.isdir(log):
        r = cli(["--master", f"local[{cores}]", "generate", "--out", log,
                 "--pages", str(n_pages), "--hot-pages", str(max(n_pages // 500, 2)),
                 "--hot-k", "24"])
        assert r.returncode == 0, r.stderr.decode()[-2000:]

    # live bronze writer: small windows → many commits to follow
    writer = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "run_pipeline.py"),
         "--master", f"local[{cores}]", "replay", "--log", log, "--table", bronze,
         "--batch-events", "2000", "--buckets", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=REPO,
    )

    def spawn_daemon():
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "daemon", bronze, silver],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=REPO,
        )

    kills, ticks, rebootstraps = 0, [], 0
    compactions, cycle = 0, 0
    t0 = time.monotonic()
    d = None
    while writer.poll() is None:
        if not os.path.isdir(os.path.join(bronze, "_meta")):
            time.sleep(0.5)
            continue
        if d is None:
            d = spawn_daemon()
        # let it sync a few ticks, then SIGKILL mid-flight; vary the
        # window so deaths land in different phases (bootstrap read,
        # changes scan, merge, checkpoint commit)
        time.sleep(7.0 + (cycle % 4) * 3.0)
        if d.poll() is None:
            d.send_signal(signal.SIGKILL)
            kills += 1
        out, _ = d.communicate()
        for ln in out.decode().splitlines():
            if ln.startswith("{"):
                t = json.loads(ln)
                ticks.append(t)
                rebootstraps += bool(t.get("bootstrap"))
        d = None
        cycle += 1
        if cycle % 2 == 0:
            # upstream maintenance: fold + vacuum (keep_last=2 can expire
            # the stranded follower's src_version → rebootstrap path)
            c = cli(["--master", "local[4]", "compact", "--table", bronze,
                     "--incremental"])
            if c.returncode == 0:
                compactions += 1
    assert writer.returncode == 0, writer.communicate()[1].decode()[-2000:]
    if d is not None:
        d.send_signal(signal.SIGKILL)
        kills += 1
        out, _ = d.communicate()
        for ln in out.decode().splitlines():
            if ln.startswith("{"):
                t = json.loads(ln)
                ticks.append(t)
                rebootstraps += bool(t.get("bootstrap"))

    # final clean drain + from-scratch verification, in-process
    from debezium_server_batch_spark.plans.chained import sync_incremental
    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    tf = _transform_fn()
    b = LakeTable.load(spark, bronze)
    if not LakeTable.exists(silver):
        # every incarnation died before creating silver (possible at
        # tiny kill windows) — bootstrap now
        schema = tf(b.read(include_deleted=True)).schema
        LakeTable.create(
            spark, silver, schema, key_col=KEY, num_buckets=4,
            order_by=tuple(b.snapshot()["order_by"]),
            merge_mode="mor", delta_layout="unbucketed",
        )
    s = LakeTable.load(spark, silver)
    while True:
        r = sync_incremental(b, s, transform=tf)
        ticks.append(r)
        rebootstraps += bool(r.get("bootstrap"))
        if r["noop"]:
            break

    scratch_root = "/dev/shm/chained-soak-scratch"
    shutil.rmtree(scratch_root, ignore_errors=True)
    scratch = LakeTable.create(
        spark, scratch_root, s.schema(), key_col=KEY, num_buckets=4,
        order_by=tuple(b.snapshot()["order_by"]),
        merge_mode="mor", delta_layout="unbucketed",
    )
    sync_incremental(b, scratch, transform=tf)

    sv, sc_ = s.read(), scratch.read()
    cols = sorted(set(sv.columns) & set(sc_.columns))
    diff = (
        sv.select(cols).exceptAll(sc_.select(cols)).count()
        + sc_.select(cols).exceptAll(sv.select(cols)).count()
    )
    rows_silver, rows_scratch = sv.count(), sc_.count()
    spark.stop()

    out = {
        "n_pages": n_pages,
        "elapsed_s": round(time.monotonic() - t0, 1),
        "kills": kills,
        "ticks_survived": len(ticks),
        "rebootstraps": rebootstraps,
        "upstream_compactions": compactions,
        "rows_silver": rows_silver,
        "rows_scratch": rows_scratch,
        "value_diff_rows": diff,
        "exact_match": diff == 0 and rows_silver == rows_scratch,
    }
    for dpath in (bronze, silver, scratch_root):
        shutil.rmtree(dpath, ignore_errors=True)
    print(json.dumps(out))
    if not out["exact_match"] or kills == 0:
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "daemon":
        daemon(sys.argv[2], sys.argv[3])
    else:
        main()
