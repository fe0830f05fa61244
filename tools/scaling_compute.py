"""Compute-stage scaling probe: envelope parse → normalize → LWW dedup
(count only, no table writes).

The full replay includes Parquet/delta writes that saturate the sandbox
host's single shared disk — a ceiling a real N→4N *executor* scale-up
does not have (each executor brings its own disks/network). This probe
isolates the CPU-bound stages to evidence core scaling for the part of
the pipeline local mode CAN scale. Reported alongside the full-pipeline
numbers in BENCH/BASELINE.md.

Usage: python tools/scaling_compute.py <log_path> <cores>
       (invoked per-leg by tools/scaling.py or manually)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    log_path = sys.argv[1]
    cores = int(sys.argv[2])

    from debezium_server_batch_spark.session import build_session
    from debezium_server_batch_spark.operators.dedup import lww_agg
    from debezium_server_batch_spark.operators.envelope import parse_envelope_batch
    from debezium_server_batch_spark.operators.normalize import normalize_batch, to_page_row

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    raw = spark.read.parquet(log_path)
    n = raw.count()  # warm the page cache equally for every leg

    t0 = time.monotonic()
    groups = parse_envelope_batch(raw)
    total = 0
    for g in groups:
        df = to_page_row(normalize_batch(g.df, default_ts_ms=0))
        total += lww_agg(df).count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "cores": cores, "events": n, "out_rows": total,
        "elapsed_sec": round(dt, 2), "events_per_sec": round(n / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
