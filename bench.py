"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: end-to-end CDC replay throughput (synthetic Debezium
event log → envelope parse → LWW dedup → LakeTable MERGE upsert),
sized from the sf directory's lineitem row count so sf0.01/sf0.1 scale
the event volume 10×. Also times each `__spark_entry__.queries()` entry
at the same sf.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_QUERIES       comma list to restrict query timing (optional)
  BENCH_SKIP_REPLAY   set to skip the CDC replay (debug)
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
    """Full-evaluation sink: xxhash64 every column of every row, fold to
    one long. Timing with df.count() lets Catalyst prune all unreferenced
    projections, so map-only queries (token_stats, lang_id, ...) would be
    under-measured; hashing every output column defeats the pruning while
    collecting only 8 bytes."""
    row = (
        df.select(F.xxhash64(*df.columns).cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("s"))
        .first()
    )
    return int(row["s"] or 0)


def run_replay(spark, sf_dir: str, workdir: str) -> dict:
    from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
    from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig

    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    n_pages = max(li_rows // 4, 1000)  # sf0.1 → ~150k pages, ~600k events

    log_path = os.path.join(workdir, "log")
    t0 = time.monotonic()
    write_event_log(
        generate_event_log(spark, n_pages=n_pages, n_hot=max(n_pages // 1000, 2), hot_k=64),
        log_path,
        n_files=32,
    )
    gen_s = time.monotonic() - t0

    cfg = PipelineConfig(
        log_path=log_path,
        table_root=os.path.join(workdir, "pages"),
        batch_events=300_000,  # event-count-balanced micro-batches
        num_buckets=32,
        merge_mode="mor",
    )
    t0 = time.monotonic()
    stats = CdcPipeline(spark, cfg).run()
    replay_s = time.monotonic() - t0
    # fold MoR deltas so the table is scan-ready; reported separately
    from debezium_server_batch_spark.plans.laketable import LakeTable

    t0 = time.monotonic()
    table = LakeTable.load(spark, cfg.table_root)
    table.compact()
    compact_s = time.monotonic() - t0
    final_rows = table.read().count()
    return {
        "n_pages": n_pages,
        "n_events": stats.events,
        "n_batches": stats.batches,
        "final_rows": final_rows,
        "generate_sec": round(gen_s, 3),
        "replay_sec": round(replay_s, 3),
        "compact_sec": round(compact_s, 3),
        "events_per_sec": round(stats.events / max(replay_s, 1e-9), 1),
        "events_per_sec_incl_compact": round(stats.events / max(replay_s + compact_s, 1e-9), 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="dsbs-bench")

    import __spark_entry__ as entrymod

    t_total = time.monotonic()
    query_times: dict[str, float] = {}
    only = os.environ.get("BENCH_QUERIES")
    only_set = set(only.split(",")) if only else None
    for name, fn in entrymod.queries().items():
        if only_set and name not in only_set:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        force_evaluate(df)
        query_times[name] = round(time.monotonic() - t0, 3)

    replay = {}
    if not os.environ.get("BENCH_SKIP_REPLAY"):
        workdir = tempfile.mkdtemp(prefix="dsbs-bench-")
        try:
            replay = run_replay(spark, sf_dir, workdir)
            query_times["cdc_replay"] = replay["replay_sec"]
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    total = round(time.monotonic() - t_total, 3)
    out = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": query_times,
        "sf": sf,
        "cpus": cpus,
        "replay": replay,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
