"""Structured Streaming front-end: readStream + foreachBatch must land
the same final state as the offset-window replay loop."""

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.plans.laketable import LakeTable
from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig
from debezium_server_batch_spark.streaming.structured import start_stream


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "log")
    write_event_log(generate_event_log(spark, n_pages=80, seed=7), p, n_files=4)
    return p


def _final(spark, root):
    return sorted(
        tuple(r)
        for r in LakeTable.load(spark, root)
        .read()
        .select("url", "__lsn", "text", "lang")
        .collect()
    )


def test_stream_matches_batch_replay(spark, log_path, tmp_path):
    batch_root = str(tmp_path / "batch")
    CdcPipeline(spark, PipelineConfig(log_path=log_path, table_root=batch_root, batch_window=200)).run()

    stream_root = str(tmp_path / "stream")
    q = start_stream(
        spark,
        PipelineConfig(log_path=log_path, table_root=stream_root, batch_window=200),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # force multiple micro-batches
    )
    q.awaitTermination(timeout=300)
    assert _final(spark, stream_root) == _final(spark, batch_root)


def test_stream_restart_is_noop(spark, log_path, tmp_path):
    root = str(tmp_path / "t")
    cfg = PipelineConfig(log_path=log_path, table_root=root)
    ckpt = str(tmp_path / "ckpt")
    q = start_stream(spark, cfg, checkpoint_dir=ckpt)
    q.awaitTermination(timeout=300)
    state = _final(spark, root)
    q2 = start_stream(spark, cfg, checkpoint_dir=ckpt)  # restart, nothing new
    q2.awaitTermination(timeout=300)
    assert _final(spark, root) == state
