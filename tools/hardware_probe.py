"""Hardware-delivery control probe: a pure whole-stage-codegen loop
(zero I/O, zero shuffle, zero Python) at a given thread count.

Run at 8 and 32 threads, this measures how much CPU the host actually
delivers when the thread count quadruples. On the shared sandbox VM the
answer is ~2.1x, not 4x — a ceiling no engine can exceed. scaling.py
runs this automatically and reports engine efficiency both raw and
normalized by this hardware ceiling.

Usage: python tools/hardware_probe.py <cores>
"""

import sys, time, json
from pyspark.sql import SparkSession, functions as F
cores = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.ui.enabled","false")
         .config("spark.driver.extraJavaOptions",
                 f"-XX:ParallelGCThreads={cores} -XX:ConcGCThreads={max(1, cores//4)}")
         .config("spark.driver.memory","8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# warm
spark.range(10_000_000, numPartitions=cores).selectExpr("bit_xor(xxhash64(id))").collect()
t0=time.monotonic()
spark.range(3_000_000_000, numPartitions=cores*4).selectExpr("bit_xor(xxhash64(id, id*7, id+13))").collect()
dt=time.monotonic()-t0
print(json.dumps({"cores":cores,"sec":round(dt,2),"rows_per_sec":round(3e9/dt/1e6,1)}))
spark.stop()
