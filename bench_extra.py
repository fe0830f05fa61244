"""Extra benchmarks for the optimization round (bench.py is FROZEN —
guide §1.4 noop-sink isolation lives here instead).

Modes:
  python bench_extra.py queries [q1,q2,...] [--repeat N] [--noop]
      Per-query isolated timing in ONE session, same force_evaluate sink
      as bench.py (or the noop sink with --noop). Reports per-repeat
      times so warmup vs steady-state is visible.
  python bench_extra.py replay
      The bench.py replay leg alone, with per-phase timings.
  python bench_extra.py generate
      generate_event_log + write_event_log alone.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from debezium_server_batch_spark.session import build_session  # noqa: E402


def force_evaluate(df) -> int:
    row = (
        df.select(F.xxhash64(*df.columns).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("s"))
        .first()
    )
    return int(row["s"] or 0)


def noop_sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    args = sys.argv[2:]
    repeat = 1
    use_noop = False
    names = None
    for a in args:
        if a == "--noop":
            use_noop = True
        elif a.startswith("--repeat"):
            repeat = int(a.split("=")[1]) if "=" in a else 3
        elif not a.startswith("-"):
            names = a.split(",")

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="dsbs-bench-extra")

    if mode == "queries":
        import __spark_entry__ as entrymod

        sink = noop_sink if use_noop else force_evaluate
        out = {}
        for name, fn in entrymod.queries().items():
            if names and name not in names:
                continue
            times = []
            for _ in range(repeat):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                sink(df)
                times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            out[name] = times
            print(json.dumps({name: times}), flush=True)
        print(json.dumps({"mode": mode, "times": out}))
    elif mode in ("replay", "generate"):
        from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log

        li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        n_pages = max(li_rows // 4, 1000)
        workdir = tempfile.mkdtemp(prefix="dsbs-bx-")
        try:
            log_path = os.path.join(workdir, "log")
            t0 = time.monotonic()
            write_event_log(
                generate_event_log(spark, n_pages=n_pages, n_hot=max(n_pages // 1000, 2), hot_k=64),
                log_path,
                n_files=32,
            )
            gen_s = time.monotonic() - t0
            print(json.dumps({"generate_sec": round(gen_s, 3), "n_pages": n_pages}), flush=True)
            if mode == "replay":
                from debezium_server_batch_spark.plans.laketable import LakeTable
                from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig

                cfg = PipelineConfig(
                    log_path=log_path,
                    table_root=os.path.join(workdir, "pages"),
                    batch_events=300_000,
                    num_buckets=32,
                    merge_mode="mor",
                )
                t0 = time.monotonic()
                stats = CdcPipeline(spark, cfg).run()
                replay_s = time.monotonic() - t0
                t0 = time.monotonic()
                table = LakeTable.load(spark, cfg.table_root)
                table.compact()
                compact_s = time.monotonic() - t0
                t0 = time.monotonic()
                final_rows = table.read().count()
                count_s = time.monotonic() - t0
                print(
                    json.dumps(
                        {
                            "replay_sec": round(replay_s, 3),
                            "compact_sec": round(compact_s, 3),
                            "final_count_sec": round(count_s, 3),
                            "events": stats.events,
                            "batches": stats.batches,
                            "final_rows": final_rows,
                            "events_per_sec": round(stats.events / max(replay_s, 1e-9), 1),
                            "per_batch": [
                                {k: b.get(k) for k in ("batch_id", "n_events", "duration_s")}
                                for b in stats.lineage
                            ],
                        }
                    )
                )
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
