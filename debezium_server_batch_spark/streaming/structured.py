"""Structured Streaming front-end (idiomatic Spark parity for SURVEY.md
S1's push model).

The batch runner replays offset windows from a durable log — the
faithful re-expression of the reference's pull loop, with deterministic
replay. This module is the *idiomatic* alternative: `readStream` over
the event-log directory, `foreachBatch` feeding the exact same
parse → normalize → LWW dedup → MERGE path (`CdcPipeline.process_batch`),
with Spark's streaming checkpoint for source progress *plus* our
snapshot-embedded offset checkpoint — the merge's idempotence makes the
combination exactly-once even though foreachBatch alone is only
at-least-once.

Use `trigger_available_now=True` for bounded catch-up (drain whatever is
in the log and stop) or False for continuous micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .runner import CdcPipeline, PipelineConfig

EVENT_LOG_SCHEMA = "offset long, destination string, key string, value string"


def start_stream(
    spark: SparkSession,
    config: PipelineConfig,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start a streaming ingest query over the event-log directory.

    Returns the StreamingQuery; call `.awaitTermination()` /
    `.processAllAvailable()` / `.stop()` as usual."""
    pipeline = CdcPipeline(spark, config)
    checkpoint_dir = checkpoint_dir or os.path.join(config.table_root + "_stream_ckpt")

    reader = spark.readStream.schema(EVENT_LOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(config.log_path)

    def process(batch_df, epoch_id: int) -> None:
        # offset bounds for lineage; events already bounded by the trigger
        bounds = batch_df.agg(F.min("offset"), F.max("offset")).first()
        lo = (bounds[0] - 1) if bounds[0] is not None else -1
        hi = bounds[1] if bounds[1] is not None else -1
        pipeline.process_batch(batch_df, batch_id=int(epoch_id), lo=lo, hi=hi)

    writer = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
