"""Stage-by-stage timing of one replay micro-batch — finds where the
per-event cost goes. Run alone (no concurrent Spark) for honest numbers.

Usage: python tools/profile_replay.py [n_pages=100000] [cores=32]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label:40s} {dt:8.2f}s")
    return out, dt


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from debezium_server_batch_spark.session import build_session
    from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
    from debezium_server_batch_spark.operators.envelope import parse_envelope_batch, unpersist_batch
    from debezium_server_batch_spark.operators.normalize import normalize_batch, to_page_row
    from debezium_server_batch_spark.operators.dedup import lww_agg
    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.sources.synth import SCHEMA_V2

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    work = "/tmp/dsbs-profile"
    shutil.rmtree(work, ignore_errors=True)
    log = os.path.join(work, "log")

    _, t_gen = timed("generate+write log", lambda: write_event_log(
        generate_event_log(spark, n_pages=n_pages, n_hot=max(n_pages // 1000, 2), hot_k=64),
        log, n_files=32))

    raw = spark.read.parquet(log)
    n = raw.count()
    print(f"events: {n}")

    _, t_scan = timed("raw scan count only", lambda: raw.count())
    _, t_schema_hash = timed("schema pointer + hash (no parse)", lambda: raw.select(
        F.xxhash64(F.get_json_object("value", "$.schema"))).agg(F.count("*")).first())

    groups, t_group = timed("parse_envelope_batch (persist+meta)", lambda: parse_envelope_batch(raw, persist=True))
    g = groups[-1]
    _, t_parse = timed("typed from_json full pass (count)", lambda: g.df.count())

    norm = to_page_row(normalize_batch(g.df, default_ts_ms=0))
    _, t_norm = timed("normalize+page projection (count)", lambda: norm.count())

    _, t_dedup = timed("lww_agg dedup (count)", lambda: lww_agg(norm).count())

    table = LakeTable.create(spark, os.path.join(work, "t"), norm.schema, key_col="url",
                             num_buckets=32, order_by=("__lsn", "__source_ts_ms", "offset"),
                             merge_mode="mor")
    _, t_merge = timed("MoR merge (delta write)", lambda: table.merge(norm))
    _, t_collapse = timed("read collapse (count)", lambda: table.read().count())
    _, t_compact = timed("compact", lambda: table.compact())

    unpersist_batch(groups)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
