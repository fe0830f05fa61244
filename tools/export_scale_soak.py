"""Scale evidence for incremental export: at corpus depth, a tick that
touches a localized slice of documents must cost O(changed shards),
not O(corpus).

Builds a deterministic n-doc corpus (same construction as
llm_scale_soak: ~95 tokens/doc), merges it into a real LakeTable,
bootstraps the shard tree, then applies a CDC tick that updates a
LOCALIZED id slice (a few contiguous ranges — the common case: a
re-crawl of specific hosts, a backfill of one date range) plus a tail
of brand-new documents, and measures:

  * the incremental tick (rewrites only touched shards)
  * a force_full re-export of the same final state (the naive
    alternative every tick would otherwise pay)
  * shards touched vs total, and integrity (verify_shards + row equality)

Usage: python tools/export_scale_soak.py [n_docs=1000000] [cores=32]
           [shard_tokens=100000] [updates=2000] [new_docs=1000]
Writes tools/export_scale_result.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from pyspark.sql import types as T


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    shard_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    n_updates = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000
    n_new = int(sys.argv[5]) if len(sys.argv) > 5 else 1_000

    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )
    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session

    work = os.path.join("/tmp", f"export_scale_{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores,
                          app_name="export-scale-soak")
    spark.sparkContext.setLogLevel("ERROR")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("__lsn", T.LongType(), True),
        T.StructField("__deleted", T.BooleanType(), True),
    ])

    def corpus(ids, lsn, tag):
        # deterministic variable-length docs, ~95 tokens average
        k = (F.pmod(F.col("doc_id") * 2654435761, F.lit(190)) + 1).cast("int")
        return ids.select(
            "doc_id",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), k),
                lambda j: F.concat(F.lit(tag), F.col("doc_id").cast("string"),
                                   F.lit("_"), j.cast("string")),
            )).alias("text"),
            k.cast("long").alias("n_tokens"),
            F.lit(lsn).cast("long").alias("__lsn"),
            F.lit(False).alias("__deleted"),
        )

    # mor (the CLI ingest default): changes() is an exact O(delta) file
    # diff. On a cow table the changelog is recovered by per-bucket
    # old-vs-new anti-joins — with updates hashed across every bucket
    # that is a corpus-scale read per tick (measured: the cow leg's
    # incremental tick pays ~the full re-export cost; see
    # export_scale_result_cow.json), which is exactly why a CDC-fed
    # export should sit on a mor table.
    src = LakeTable.create(spark, os.path.join(work, "src"), schema,
                           key_col="doc_id", num_buckets=32, order_by=("__lsn",),
                           merge_mode="mor")
    base_ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    t0 = time.monotonic()
    src.merge(corpus(base_ids, 1, "w"))
    merge_s = time.monotonic() - t0

    out = os.path.join(work, "shards")
    t0 = time.monotonic()
    s_boot = export_incremental(src, out, shard_tokens=shard_tokens)
    bootstrap_s = time.monotonic() - t0
    n_shards = s_boot["shards_new"]

    # CDC tick: updates clustered in 4 contiguous ranges + new tail docs
    span = n_updates // 4
    upd_ids = None
    for i, start in enumerate([n_docs // 10, n_docs // 3, n_docs // 2, (4 * n_docs) // 5]):
        r = spark.range(start, start + span).select(F.col("id").alias("doc_id"))
        upd_ids = r if upd_ids is None else upd_ids.union(r)
    new_ids = spark.range(n_docs, n_docs + n_new).select(F.col("id").alias("doc_id"))
    src.merge(corpus(upd_ids.union(new_ids), 2, "u"))

    t0 = time.monotonic()
    s_inc = export_incremental(src, out, shard_tokens=shard_tokens)
    incremental_s = time.monotonic() - t0

    t0 = time.monotonic()
    bad = verify_shards(spark, out).filter(~F.col("ok")).count()
    verify_s = time.monotonic() - t0
    table_n = src.read().count()
    disk_n = spark.read.parquet(os.path.join(out, "data")).count()

    # the naive alternative: re-shard the whole corpus for the same tick
    out_full = os.path.join(work, "shards_full")
    shutil.copytree(out, out_full, ignore=shutil.ignore_patterns("data"))
    t0 = time.monotonic()
    export_incremental(src, out_full, shard_tokens=shard_tokens, force_full=True)
    full_s = time.monotonic() - t0

    result = {
        "n_docs": n_docs,
        "cores": cores,
        "shard_tokens": shard_tokens,
        "shards_total": int(n_shards),
        "initial_merge_s": round(merge_s, 1),
        "bootstrap_export_s": round(bootstrap_s, 1),
        "tick_updates": n_updates,
        "tick_new_docs": n_new,
        "incremental_tick_s": round(incremental_s, 1),
        "full_reexport_s": round(full_s, 1),
        "tick_speedup": round(full_s / incremental_s, 2),
        "shards_rewritten": s_inc["shards_rewritten"],
        "shards_new": s_inc["shards_new"],
        "touched_fraction": round(
            (s_inc["shards_rewritten"] + s_inc["shards_new"]) / max(1, n_shards), 4
        ),
        "verify_failed_shards": int(bad),
        "verify_s": round(verify_s, 1),
        "rows_exact": bool(table_n == disk_n),
        "table_rows": int(table_n),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "export_scale_result.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    ok = bad == 0 and table_n == disk_n
    if ok:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
