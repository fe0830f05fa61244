"""Scale evidence for the distributed global cumsum behind
`pack_documents`/`assign_shards` (operators/sampling.global_running_total).

The unstratified contiguous-sharding path needs an id-ordered global
running total. The textbook plan (`Window.orderBy(id)`, no partition)
funnels the ENTIRE corpus through one task — the single-partition
window Spark itself warns about. This tool measures both plans on the
same deterministic input at local[N], asserts the resulting shard
manifests are identical, and records wall times + the parallelism the
distributed plan actually achieved.

Usage: python tools/cumsum_scale.py [n_rows] [cores] [budget] [stratified]
With `stratified`, rows carry a dominant 70% stratum + two tails and the
baseline is the per-stratum window (whole dominant stratum through one
task) instead of the global window.
Writes tools/cumsum_scale_result.json (or _stratified.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def manifest_from(assigned, stratum=None):
    group = ([stratum] if stratum else []) + ["shard_id"]
    return assigned.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    stratified = "stratified" in sys.argv[4:]

    from debezium_server_batch_spark.session import build_session
    from debezium_server_batch_spark.operators.sampling import pack_documents

    spark = build_session(
        master=f"local[{cores}]", shuffle_partitions=cores, app_name="cumsum-scale"
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic variable-length "documents": avg ~95 tokens like the
    # 10^6-doc web corpus, but only the two columns the cumsum touches —
    # this isolates the window plan itself, not md5/tokenize cost
    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(190)) + 1).alias("n_tokens"),
    )
    stratum = None
    if stratified:
        stratum = "lang"
        docs = docs.withColumn(
            "lang",
            F.when(F.pmod(F.col("doc_id"), F.lit(10)) < 7, "en")
            .when(F.pmod(F.col("doc_id"), F.lit(10)) < 9, "de")
            .otherwise("fr"),
        )
    docs = docs.repartition(cores).persist()
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]

    def old_plan():
        w = (Window.partitionBy(stratum) if stratum else Window).orderBy(F.col("doc_id"))
        start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
        return docs.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.floor(start / F.lit(budget)).cast("long").alias("shard_id"),
            *([stratum] if stratum else []),
        )

    def new_plan():
        out = pack_documents(
            docs, budget=budget, num_partitions=cores * 4, stratum_col=stratum
        ).withColumnRenamed("pack_id", "shard_id")
        return out

    results = {}
    for name, fn in (("single_window", old_plan), ("distributed", new_plan)):
        t0 = time.monotonic()
        m = manifest_from(fn(), stratum).collect()
        dt = time.monotonic() - t0
        by_id = {(r[stratum], r["shard_id"]) if stratum else r["shard_id"]:
                 (r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
                 for r in m}
        assert sum(v[1] for v in by_id.values()) == total_tokens
        results[name] = {"sec": round(dt, 2), "shards": len(by_id), "manifest": by_id}

    assert results["single_window"]["manifest"] == results["distributed"]["manifest"], \
        "distributed cumsum diverged from the single-window reference"

    out = {
        "n_rows": n_rows,
        "cores": cores,
        "budget": budget,
        "stratified": stratified,
        "total_tokens": int(total_tokens),
        "shards": results["distributed"]["shards"],
        "single_window_sec": results["single_window"]["sec"],
        "distributed_sec": results["distributed"]["sec"],
        "speedup": round(
            results["single_window"]["sec"] / results["distributed"]["sec"], 2
        ),
        "manifests_identical": True,
    }
    name = "cumsum_scale_result_stratified.json" if stratified else "cumsum_scale_result.json"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
