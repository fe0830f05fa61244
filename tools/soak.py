"""10^7-event soak: sustained replay with PERIODIC INCREMENTAL
compaction (compact_every, minor compaction inline) — the steady-state
CDC cadence at scale — plus an independent DuckDB LWW count check of
the final table. Round-2 measured run (local[32], 10,151,227 events
over 2.5M urls, Zipf-hot keys, deletes/re-inserts, schema epoch):

  replay 180.5s = 56,234 events/s sustained INCLUDING 3 inline minor
  compactions; final minor compaction 27s (48,907 events/s including
  it); final_rows 2,353,425 == DuckDB arg_max-LWW oracle count exactly.

Usage: python tools/soak.py [n_pages=2500000] [cores=32] [cadence=3|auto]
(cadence=auto runs the observed-state auto-compaction policy instead
of the fixed every-3 fold — the 10^7 depth check for the r5 trigger)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cadence = sys.argv[3] if len(sys.argv) > 3 else "3"

    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session
    from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
    from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    log = f"/tmp/soak-log-{n_pages}"
    t0 = time.monotonic()
    if not os.path.isdir(log):
        write_event_log(
            generate_event_log(spark, n_pages=n_pages, n_hot=max(n_pages // 1000, 2), hot_k=64),
            log,
            n_files=64,
        )
    gen_s = time.monotonic() - t0

    root = "/dev/shm/soak-table"
    shutil.rmtree(root, ignore_errors=True)
    cfg = PipelineConfig(
        log_path=log, table_root=root, batch_events=1_000_000, num_buckets=64,
        compact_every=None if cadence == "auto" else int(cadence),
        auto_compact=cadence == "auto",
    )
    t0 = time.monotonic()
    stats = CdcPipeline(spark, cfg).run()
    replay_s = time.monotonic() - t0
    t0 = time.monotonic()
    t = LakeTable.load(spark, root)
    t.compact_deltas()
    minor_s = time.monotonic() - t0
    final_rows = t.read().count()
    spark.stop()

    import duckdb

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        WITH parsed AS (
          SELECT json_extract_string(value, '$.payload.url') AS url,
                 CAST(json_extract(value, '$.payload.__lsn') AS BIGINT) AS lsn,
                 json_extract_string(value, '$.payload.__deleted') AS deleted
          FROM read_parquet('{log}/*.parquet') WHERE value IS NOT NULL
        )
        SELECT count(*) FROM (
          SELECT url, arg_max(deleted, lsn) AS last_del FROM parsed GROUP BY url
        ) WHERE last_del = 'false'
        """
    ).fetchall()[0][0]

    print(
        json.dumps(
            {
                "cadence": cadence,
                "events": stats.events,
                "batches": stats.batches,
                "gen_s": round(gen_s, 1),
                "replay_s": round(replay_s, 1),
                "final_minor_compact_s": round(minor_s, 1),
                "events_per_sec": round(stats.events / replay_s, 1),
                "events_per_sec_incl_final_compact": round(stats.events / (replay_s + minor_s), 1),
                "final_rows": final_rows,
                "oracle_live_urls": oracle,
                "exact_match": final_rows == oracle,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
