"""Pacing arithmetic — re-expression of the reference's
common/DynamicBatchSizeWaitTest.java (monotone increase on small batches
up to cap, monotone decrease on full batches) with injectable sleepers."""

import pytest

from debezium_server_batch_spark.streaming.pacing import (
    DynamicBatchSizeWait,
    MaxBatchSizeWait,
    NoBatchSizeWait,
    select_batch_size_wait,
)


def test_no_wait():
    assert NoBatchSizeWait().wait_ms(10_000) == 0


def test_dynamic_grows_on_small_batches_up_to_cap():
    w = DynamicBatchSizeWait(max_batch_size=2048, max_wait_ms=5000)
    waits = [w.compute_wait_ms(2) for _ in range(10)]
    assert all(b >= a for a, b in zip(waits, waits[1:]))  # monotone non-decreasing
    assert waits[-1] == 5000  # clamped to max-wait


def test_dynamic_shrinks_on_full_batches():
    w = DynamicBatchSizeWait(max_batch_size=2048, max_wait_ms=5000)
    for _ in range(6):
        w.compute_wait_ms(10)  # drive sleep up
    high = w.sleep_history[-1]
    shrunk = [w.compute_wait_ms(2048) for _ in range(6)]
    assert shrunk[-1] < high
    assert all(b <= a for a, b in zip(shrunk, shrunk[1:]))
    assert shrunk[-1] >= 100  # floor clamp


def test_dynamic_holds_in_sweet_spot():
    w = DynamicBatchSizeWait(max_batch_size=1000, max_wait_ms=5000)
    w.batch_history.clear()
    w.batch_history.extend([870, 870, 870])  # avg fill 87% → hold
    before = list(w.sleep_history)
    assert w.compute_wait_ms(870) == before[-1]
    assert list(w.sleep_history) == before


def test_dynamic_subtracts_processing_time_and_skips_small_sleeps():
    slept = []
    w = DynamicBatchSizeWait(max_batch_size=2048, max_wait_ms=9000, sleep_fn=slept.append)
    for _ in range(8):
        w.compute_wait_ms(2)
    assert w.wait_ms(2, processing_time_ms=8000) in (0, 1000)  # 9000-8000 ≤ 2000 → no sleep
    assert not slept
    assert w.wait_ms(2, processing_time_ms=0) > 2000
    assert len(slept) == 1


def test_max_batch_size_wait_polls_until_queue_full():
    sleeps = []
    pending = iter([100, 500, 3000])
    w = MaxBatchSizeWait(
        pending_fn=lambda: next(pending),
        max_batch_size=2048,
        max_wait_ms=60_000,
        wait_interval_ms=1000,
        sleep_fn=lambda s: sleeps.append(s),
    )
    total = w.wait_ms()
    assert total == 2000 and len(sleeps) == 2  # stopped once pending ≥ max_batch_size


def test_max_batch_size_wait_times_out():
    w = MaxBatchSizeWait(
        pending_fn=lambda: 0,
        max_batch_size=100,
        max_wait_ms=3000,
        wait_interval_ms=1000,
        sleep_fn=lambda s: None,
    )
    assert w.wait_ms() == 3000


def test_max_batch_size_wait_skips_during_snapshot():
    w = MaxBatchSizeWait(
        pending_fn=lambda: 0,
        max_batch_size=100,
        max_wait_ms=3000,
        wait_interval_ms=1000,
        snapshot_running_fn=lambda: True,
        sleep_fn=lambda s: None,
    )
    assert w.wait_ms() == 0


def test_interval_must_be_less_than_max_wait():
    with pytest.raises(ValueError):
        MaxBatchSizeWait(pending_fn=lambda: 0, max_wait_ms=1000, wait_interval_ms=1000)


def test_registry_selection():
    assert select_batch_size_wait("NoBatchSizeWait") is NoBatchSizeWait
    assert select_batch_size_wait("DynamicBatchSizeWait") is DynamicBatchSizeWait
    with pytest.raises(ValueError):
        select_batch_size_wait("BogusWait")


def test_snapshot_phase_derived_from_log(spark, tmp_path):
    """F5/MaxBatchSizeWait gate derived from the log itself: a prefix of
    __op='r' snapshot reads reads as 'snapshot running'; past the
    prefix, streaming ops ('c'/'u') read as not running (r2 verdict
    next-round #6 — the reference gets this gauge from JMX,
    MaxBatchSizeWait.java:56-60)."""
    import json as _json

    from debezium_server_batch_spark.sources.event_log import EventLogSource

    def ev(offset, op):
        return (offset, "t.db.pages", None,
                _json.dumps({"payload": {"url": f"k{offset}", "__op": op, "__lsn": offset}}))

    rows = [ev(i, "r") for i in range(50)] + [ev(50 + i, "c") for i in range(50)]
    log = str(tmp_path / "snaplog")
    spark.createDataFrame(
        rows, "offset long, destination string, key string, value string"
    ).write.parquet(log)

    src = EventLogSource(spark, log)
    assert src.snapshot_running(after_offset=0, probe_events=40) is True
    assert src.snapshot_running(after_offset=49, probe_events=40) is False
    # mid-transition: minority of 'r' in the probe window → not running
    assert src.snapshot_running(after_offset=39, probe_events=40) is False
    # empty tail → not running
    assert src.snapshot_running(after_offset=99) is False

    w = MaxBatchSizeWait(
        pending_fn=lambda: 0,
        max_batch_size=100,
        max_wait_ms=3000,
        wait_interval_ms=1000,
        snapshot_running_fn=lambda: src.snapshot_running(0, probe_events=40),
        sleep_fn=lambda s: None,
    )
    assert w.wait_ms() == 0  # snapshot load: no artificial wait
