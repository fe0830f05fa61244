"""debezium_server_batch_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
memiiso/debezium-server-batch (reference at /root/reference): tail a
Debezium-shaped change-event log (flat "unwrap" envelopes with
__op/__lsn/__source_ts_ms/__deleted metadata) and land it in lake tables
with correct schema handling, adaptive batch sizing, exactly-once offset
commits, schema evolution, and key-partitioned MERGE upserts — designed
Spark-first (DataFrame/Catalyst), not as a port of the reference's Java.

Layout
------
functions/   Connect-JSON schema compiler, text analysis, vector math
sources/     event-log source + deterministic synthetic CDC generator
operators/   envelope parse, normalize, dedup (exact + fuzzy), similarity
plans/       LakeTable — snapshot-committed Parquet table (MERGE, evolution)
streaming/   micro-batch runner, pacing strategies, lineage/metrics
"""

__version__ = "0.1.0"
