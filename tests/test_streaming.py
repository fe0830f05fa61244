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


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emit
    exactly once — inline when a same-key event arrives past the gap,
    by event-time timeout when the watermark passes the gap deadline.
    Sessions still open at end-of-stream are (correctly) not emitted."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "events"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), str(src / name), coerce_timestamps="us")
        _time.sleep(0.05)  # deterministic file-source ordering by mtime

    d = "2024-03-01 "
    write_file("f0.parquet", [(1, d + "10:00"), (1, d + "10:05"), (1, d + "10:10"), (2, d + "10:00")])
    write_file("f1.parquet", [(1, d + "13:00"), (2, d + "13:00")])  # >30min gaps close inline
    write_file("f2.parquet", [(2, d + "16:00")])  # advances watermark; closes u2@13:00 inline
    write_file("f3.parquet", [(3, d + "19:00")])  # watermark passes u1@13:00's deadline → timeout

    stream = spark.readStream.schema("user_id long, ts timestamp_ntz").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    sessions = streaming_sessionize(stream, gap_minutes=30.0, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    expect = {
        (1, "2024-03-01 10:00:00", "2024-03-01 10:10:00", 3),  # inline (13:00 arrival)
        (2, "2024-03-01 10:00:00", "2024-03-01 10:00:00", 1),  # inline (13:00 arrival)
        (2, "2024-03-01 13:00:00", "2024-03-01 13:00:00", 1),  # inline (16:00 arrival)
        (1, "2024-03-01 13:00:00", "2024-03-01 13:00:00", 1),  # TIMEOUT (wm 18:30 > 13:30)
        (2, "2024-03-01 16:00:00", "2024-03-01 16:00:00", 1),  # TIMEOUT (wm 18:30 > 16:30)
    }
    assert got == expect
    # u3@19:00 stays open (its 19:30 deadline is past the final 18:30
    # watermark) and is correctly NOT emitted — a longer stream closes it


def test_streaming_sessionize_checkpoint_restart(spark, tmp_path):
    """r3 next-round #3: kill the sessionize query mid-stream, restart
    from the checkpoint — open-session STATE must be recovered (an event
    arriving after the restart merges into a session opened before the
    kill), every closed session is emitted exactly once across both runs
    (exactly-once file sink, no downstream dedup), and the union equals
    the batch sessionize operator on the same data."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.operators.relational import sessionize
    from debezium_server_batch_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "events"
    src.mkdir()
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    def run_until_drained():
        q = (
            streaming_sessionize(
                spark.readStream.schema("user_id long, ts timestamp_ntz")
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src)),
                gap_minutes=30.0,
                watermark="1 hour",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    d = "2024-03-03 "
    # ---- run 1: two files, then the query stops ("crash") with u1's
    # 13:00 and u2's 13:10 sessions still OPEN in the state store
    write_file("f0.parquet", [(1, d + "10:00"), (1, d + "10:05"), (2, d + "10:00")])
    write_file("f1.parquet", [(1, d + "13:00"), (2, d + "13:10")])
    run_until_drained()

    # ---- run 2 (fresh query object, same checkpoint): 13:05 must MERGE
    # into u1's recovered open session — only possible if state survived
    write_file("f2.parquet", [(1, d + "13:05"), (3, d + "16:00")])
    write_file("f3.parquet", [(9, d + "23:00")])  # watermark 22:00 closes all but u9
    run_until_drained()

    rows = spark.read.parquet(out).collect()  # honors the sink's _spark_metadata
    got = [
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
    ]
    assert len(got) == len(set(got))  # exactly once: no duplicate emissions
    assert set(got) == {
        (1, "2024-03-03 10:00:00", "2024-03-03 10:05:00", 2),  # closed inline, run 1
        (2, "2024-03-03 10:00:00", "2024-03-03 10:00:00", 1),  # closed inline, run 1
        (1, "2024-03-03 13:00:00", "2024-03-03 13:05:00", 2),  # state recovered + merged
        (2, "2024-03-03 13:10:00", "2024-03-03 13:10:00", 1),  # timeout after restart
        (3, "2024-03-03 16:00:00", "2024-03-03 16:00:00", 1),  # timeout after restart
    }
    # u9@23:00 stays open (deadline past the final 22:00 watermark)

    # ---- batch parity: the batch operator over ALL events, rolled up
    # per session and restricted to sessions closed by the final
    # watermark, equals the streaming output
    batch = sessionize(
        spark.read.schema("user_id long, ts timestamp_ntz").parquet(str(src)).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ),
        gap_minutes=30.0,
    )
    rolled = (
        batch.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(
            F.unix_millis(F.col("session_end")) + 30 * 60_000
            <= F.unix_millis(F.lit("2024-03-03 22:00:00").cast("timestamp"))
        )
    )
    expect_batch = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rolled.collect()
    }
    assert set(got) == expect_batch


def test_streaming_sessionize_late_event_forms_earlier_session(spark, tmp_path):
    """Regression (r3 review): an in-watermark late event OLDER than the
    open session must form its own earlier session (or extend
    session_start backwards) — not be silently folded into the open
    session's count."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.stateful import streaming_sessionize

    src = tmp_path / "late"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    d = "2024-03-02 "
    write_file("f0.parquet", [(1, d + "12:00")])
    write_file("f1.parquet", [(1, d + "09:00")])  # late but inside the 4h watermark
    write_file("f2.parquet", [(2, d + "20:00")])  # watermark → 16:00 closes u1@12:00

    stream = spark.readStream.schema("user_id long, ts timestamp_ntz").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        streaming_sessionize(stream, gap_minutes=30.0, watermark="4 hours")
        .writeStream.format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM late_sessions").collect()
    }
    assert got == {
        (1, "2024-03-02 09:00:00", "2024-03-02 09:00:00", 1),  # late event: OWN session
        (1, "2024-03-02 12:00:00", "2024-03-02 12:00:00", 1),  # original, closed by timeout
    }


def test_streaming_window_stats_matches_batch(spark, tmp_path):
    """Built-in watermarked windowed aggregation: append mode emits each
    CLOSED (window, group) rollup exactly once; the still-open trailing
    window is withheld. Exact expected set asserted (and cross-checked
    against the batch rollup over the same closed range)."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.windowed import streaming_window_stats

    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    d = "2024-04-01 "
    write_file("f0.parquet", [("A", d + "10:05", 1.5), ("B", d + "10:20", 2.0), ("A", d + "11:10", 0.5)])
    write_file("f1.parquet", [("A", d + "12:40", 1.0)])
    write_file("f2.parquet", [("B", d + "15:00", 3.0)])  # watermark → 15:00

    stream = spark.readStream.schema("event_type string, ts timestamp_ntz, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        streaming_window_stats(stream, window="1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    assert got == {
        ("2024-04-01 10:00:00", "A", 1, 1.5),
        ("2024-04-01 10:00:00", "B", 1, 2.0),
        ("2024-04-01 11:00:00", "A", 1, 0.5),
        ("2024-04-01 12:00:00", "A", 1, 1.0),
    }  # B@15:00's window is still open — correctly withheld

    # batch cross-check over the closed range: identical rollup
    batch = streaming_window_stats(
        spark.read.schema("event_type string, ts timestamp_ntz, value double").parquet(str(src))
    ).filter(F.col("window_end") <= F.lit("2024-04-01 15:00:00").cast("timestamp"))
    got_batch = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == got_batch


def test_streaming_sliding_window_matches_batch(spark, tmp_path):
    """Hopping windows (1 h window / 30 min slide): every event lands in
    TWO overlapping windows; append mode emits each closed (window,
    group) pair exactly once, equal to the batch rollup over the closed
    range — including a LATE row that still beat the watermark."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.windowed import streaming_window_stats

    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    d = "2024-04-01 "
    write_file("f0.parquet", [("A", d + "10:05", 1.0), ("A", d + "10:40", 2.0)])
    # watermark (30 min) trails max event time 11:20 → 10:50: the late
    # 10:45 row is UNDER the horizon and must be aggregated, not dropped
    write_file("f1.parquet", [("A", d + "11:20", 4.0), ("A", d + "10:45", 8.0)])
    write_file("f2.parquet", [("A", d + "14:00", 16.0)])

    stream = spark.readStream.schema("event_type string, ts timestamp_ntz, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        streaming_window_stats(stream, window="1 hour", slide="30 minutes",
                               watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("slide_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM slide_stats").collect()
    }
    closed_end = "2024-04-01 13:30:00"  # watermark after f2 = 13:30
    batch = streaming_window_stats(
        spark.read.schema("event_type string, ts timestamp_ntz, value double").parquet(str(src)),
        window="1 hour", slide="30 minutes",
    ).filter(F.col("window_end") <= F.lit(closed_end).cast("timestamp"))
    got_batch = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == got_batch
    # spot-check the overlap + the late row: 10:30-11:30 holds
    # 10:40 + 10:45 + 11:20
    assert ("2024-04-01 10:30:00", "A", 3, 14.0) in got


def test_streaming_dedup_absorbs_redelivery(spark, tmp_path):
    """Watermarked stream dedup: redelivered (key-identical) events
    within the watermark horizon are dropped; the surviving set equals
    the batch first-wins dedup of the same input."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.windowed import streaming_dedup

    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["url", "offset", "ts", "payload"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    d = "2024-04-01 "
    write_file("f0.parquet", [("u1", 1, d + "10:00", "p1"), ("u2", 2, d + "10:01", "p2")])
    # at-least-once redelivery: the SAME (url, offset) events again,
    # within the watermark horizon — must be absorbed
    write_file("f1.parquet", [("u1", 1, d + "10:00", "p1"), ("u3", 3, d + "10:05", "p3")])
    write_file("f2.parquet", [("u2", 2, d + "10:01", "p2"), ("u4", 4, d + "10:30", "p4")])

    schema = "url string, offset long, ts timestamp_ntz, payload string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
    q = (
        streaming_dedup(stream, keys=["url", "offset"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["url"], r["offset"], r["payload"])
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    batch = streaming_dedup(
        spark.read.schema(schema).parquet(str(src)), keys=["url", "offset"]
    )
    got_batch = {(r["url"], r["offset"], r["payload"]) for r in batch.collect()}
    assert got == got_batch == {
        ("u1", 1, "p1"), ("u2", 2, "p2"), ("u3", 3, "p3"), ("u4", 4, "p4")
    }


def test_streaming_dedup_batch_fallback_first_wins_deterministic(spark, tmp_path):
    """Batch fallback of streaming_dedup must be ORDER-AWARE first-wins
    (earliest event time per key), not an arbitrary dropDuplicates pick
    (r5 verdict wrong #1): out-of-order duplicate deliveries with
    DIFFERING non-key columns must yield the min-ts row, identically
    across input orderings/partitionings, and match the streaming result
    when each key's first delivery is its earliest event time."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_server_batch_spark.streaming.windowed import streaming_dedup

    src = tmp_path / "ev"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["url", "offset", "ts", "payload"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(src / name),
            coerce_timestamps="us",
        )
        _time.sleep(0.05)

    d = "2024-04-01 "
    # globally OUT of event-time order (u2@10:05 arrives before u1@10:00)
    # but per key the first delivery is the earliest event time; the
    # redeliveries differ in offset AND payload (non-key columns)
    write_file("f0.parquet", [("u2", 20, d + "10:05", "first2")])
    write_file("f1.parquet", [("u1", 10, d + "10:00", "first1"),
                              ("u2", 21, d + "10:06", "redelivery2")])
    write_file("f2.parquet", [("u1", 11, d + "10:20", "redelivery1")])

    schema = "url string, offset long, ts timestamp_ntz, payload string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src))
    q = (
        streaming_dedup(stream, keys=["url"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_fw_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["url"], r["offset"], r["payload"])
        for r in spark.sql("SELECT * FROM dedup_fw_out").collect()
    }
    expected = {("u1", 10, "first1"), ("u2", 20, "first2")}
    assert got_stream == expected

    full = spark.read.schema(schema).parquet(str(src))
    # batch result is min-ts first-wins, invariant to row order/partitioning
    for variant in (full, full.orderBy(F.desc("ts")), full.repartition(7, "payload")):
        got = {(r["url"], r["offset"], r["payload"])
               for r in streaming_dedup(variant, keys=["url"]).collect()}
        assert got == expected
    # schema/column order preserved by the fallback
    assert streaming_dedup(full, keys=["url"]).columns == ["url", "offset", "ts", "payload"]

    # exact event-time tie: full-row lexicographic tie-break, still
    # deterministic (plain dropDuplicates would flip run-to-run)
    tie = spark.createDataFrame(
        [("u9", 91, "2024-04-01 11:00", "b"), ("u9", 90, "2024-04-01 11:00", "a")],
        "url string, offset long, ts string, payload string",
    )
    for variant in (tie, tie.orderBy(F.desc("offset")), tie.repartition(5, "payload")):
        rows = streaming_dedup(variant, keys=["url"]).collect()
        assert [(r["url"], r["offset"], r["payload"]) for r in rows] == [("u9", 90, "a")]
