"""Memory-bandwidth control probe: parquet scan + hash of the event-log
`value` strings — embarrassingly parallel (no shuffle, no Python, no
writes), but every byte of the log moves through memory.

If this probe's N→4N speedup matches the replay's rather than the
register-only codegen probe's (tools/hardware_probe.py), the replay's
scaling cap is host memory bandwidth, not engine serialization.

Usage: python tools/membw_probe.py <log_path> <cores>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

log_path, cores = sys.argv[1], int(sys.argv[2])
spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(log_path)
df.limit(1000).selectExpr("bit_xor(xxhash64(value))").collect()  # warm
t0 = time.monotonic()
n = df.selectExpr("bit_xor(xxhash64(value))", "count(*)").collect()[0][1]
dt = time.monotonic() - t0
print(json.dumps({"cores": cores, "rows": n, "sec": round(dt, 2), "rows_per_sec": round(n / dt, 1)}))
spark.stop()
