"""Generic file sink (reference W1/P6 parity: save-format/save-mode
append ledger, wall-clock dt= partition, at-least-once checkpoint),
jsonlines event-log source (S6), and the lag metric (F5)."""

import datetime
import json
import os

from pyspark.sql import functions as F

from debezium_server_batch_spark.plans.file_sink import FileSink
from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig


def _flat_log(spark, path, n=6):
    def ev(offset, op, key, lsn, val):
        payload = {"url": key, "text": val, "__op": op, "__lsn": lsn,
                   "__source_ts_ms": 1704067200000 + lsn,
                   "__deleted": "true" if op == "d" else "false"}
        schema = {"type": "struct", "fields": [
            {"type": "string", "field": "url", "optional": False},
            {"type": "string", "field": "text", "optional": True},
            {"type": "string", "field": "__op", "optional": True},
            {"type": "int64", "field": "__lsn", "optional": True},
            {"type": "int64", "field": "__source_ts_ms", "optional": True},
            {"type": "string", "field": "__deleted", "optional": True}]}
        return (offset, "testc.db.pages", None, json.dumps({"schema": schema, "payload": payload}))

    rows = [ev(i, "d" if i == 3 else ("u" if i % 2 else "c"), f"k{i % 4}", i, f"v{i}")
            for i in range(n)]
    spark.createDataFrame(rows, "offset long, destination string, key string, value string") \
        .write.parquet(path)
    return rows


def test_file_sink_append_ledger_reference_semantics(spark, tmp_path):
    """W1: every event lands as a row (updates/deletes are extra rows —
    the reference's append-only ledger, BatchSparkChangeConsumerMysqlTest
    4 ins + 4 del + 4 ins ⇒ 12 rows); re-run is a checkpoint no-op."""
    log = str(tmp_path / "log")
    rows = _flat_log(spark, log, n=6)
    root = str(tmp_path / "out")
    cfg = PipelineConfig(
        log_path=log, table_root=root, batch_window=3, sink="files",
        destination_regexp=r"^testc\.db\.", destination_replacement="",
    )
    stats = CdcPipeline(spark, cfg).run()
    assert stats.events == len(rows) and stats.batches == 2
    sink = FileSink(spark, root)
    ledger = sink.read("pages")
    assert ledger.count() == len(rows)  # delete row retained (__op='d')
    assert ledger.filter(F.col("__op") == "d").count() == 1
    # at-least-once checkpoint: resume is a no-op on a clean run
    assert CdcPipeline(spark, cfg).run().batches == 0


def test_file_sink_json_format_and_wallclock_dt(spark, tmp_path):
    """Any save format + the reference's wall-clock dt= objectkey
    partition (BatchSparkChangeConsumer.java:130-147)."""
    sink = FileSink(
        spark, str(tmp_path / "o"), save_format="json", objectkey_partition=True,
        partition_tz="Europe/Istanbul", today_fn=lambda: datetime.date(2024, 5, 5),
    )
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    path = sink.write(df, "t1")
    assert path.endswith(os.path.join("t1", "dt=2024-05-05"))
    assert sorted(r["k"] for r in sink.read("t1").collect()) == ["a", "b"]
    # second upload appends into the same dt dir
    sink.write(df, "t1")
    assert sink.read("t1").count() == 4


def test_file_sink_csv_roundtrip_keeps_first_row(spark, tmp_path):
    """Regression (r2 ADVICE): write() must emit the csv header read()
    expects — without it the first data row of every file was consumed
    as column names."""
    sink = FileSink(spark, str(tmp_path / "c"), save_format="csv")
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink.write(df, "t1")
    back = sink.read("t1")
    assert sorted(back.columns) == ["k", "v"]
    assert sorted((r["k"], int(r["v"])) for r in back.collect()) == [("a", 1), ("b", 2)]


def test_jsonlines_event_log_source(spark, tmp_path):
    """S6: a jsonlines-spooled event log (the reference's
    getJsonLinesFile shape) replays to the same final state as the
    parquet log."""
    from debezium_server_batch_spark.plans.laketable import LakeTable

    events = generate_event_log(spark, n_pages=50, seed=7)
    pq_log, js_log = str(tmp_path / "pq"), str(tmp_path / "js")
    write_event_log(events, pq_log, n_files=2)
    events.coalesce(2).write.json(js_log)

    def run(log, fmt, root):
        cfg = PipelineConfig(log_path=log, table_root=root, batch_window=100, num_buckets=4,
                             log_format=fmt)
        CdcPipeline(spark, cfg).run()
        t = LakeTable.load(spark, root)
        return sorted(
            (r["url"], r["__lsn"], r["text"]) for r in t.read().collect()
        )

    state_pq = run(pq_log, "parquet", str(tmp_path / "t_pq"))
    state_js = run(js_log, "json", str(tmp_path / "t_js"))
    assert state_js == state_pq and len(state_js) > 0


def test_track_lag_emits_ms_behind_source(spark, tmp_path):
    log = str(tmp_path / "log")
    _flat_log(spark, log, n=4)
    cfg = PipelineConfig(log_path=log, table_root=str(tmp_path / "t"), batch_window=100,
                         num_buckets=2, track_lag=True)
    stats = CdcPipeline(spark, cfg).run()
    lag = stats.lineage[0].get("ms_behind_source")
    # events are stamped 2024-01-01 → lag is large and positive
    assert lag is not None and lag > 0
