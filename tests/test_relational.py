"""Relational operators: sessionization, top-k per group, as-of join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.relational import (
    asof_join,
    session_stats,
    sessionize,
    topk_per_group,
)


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_sessionize_gap_splits(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(70)), (1, _ts(75)), (2, _ts(0))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, gap_minutes=30.0).collect()
    sessions = {(r["user_id"], r["ts"].minute + r["ts"].hour * 60): r["session_id"] for r in out}
    assert sessions[(1, 0)] == 1 and sessions[(1, 10)] == 1
    assert sessions[(1, 70)] == 2 and sessions[(1, 75)] == 2
    assert sessions[(2, 0)] == 1
    stats = {r["user_id"]: r for r in session_stats(df, gap_minutes=30.0).collect()}
    assert stats[1]["n_sessions"] == 2 and stats[1]["n_events"] == 4
    assert stats[2]["n_sessions"] == 1


def test_topk_per_group(spark):
    rows = [(1, 10, 1.0), (1, 11, 3.0), (1, 12, 2.0), (2, 20, 5.0)]
    df = spark.createDataFrame(rows, "g long, id long, v double")
    out = topk_per_group(df, "g", "v", k=2, tie_break="id").collect()
    got = {(r["g"], r["rank_in_group"]): r["id"] for r in out}
    assert got[(1, 1)] == 11 and got[(1, 2)] == 12 and got[(2, 1)] == 20


def test_topk_tie_break_deterministic(spark):
    rows = [(1, 10, 1.0), (1, 11, 1.0), (1, 12, 1.0)]
    df = spark.createDataFrame(rows, "g long, id long, v double")
    out = topk_per_group(df, "g", "v", k=1, tie_break="id").collect()
    assert len(out) == 1 and out[0]["id"] == 10


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(20), "e2"), (1, _ts(2), "e0"), (2, _ts(5), "x")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 100), (1, _ts(10), 200), (3, _ts(0), 999)],
        "k long, rts timestamp, payload int",
    )
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts", right_cols=["payload"])
    got = {r["name"]: r["asof_payload"] for r in out.collect()}
    assert got["e0"] is None  # before any right row
    assert got["e1"] == 100  # latest right at/before t=5 is t=3
    assert got["e2"] == 200  # latest right at/before t=20 is t=10
    assert got["x"] is None  # key 2 has no right rows


def test_asof_join_simultaneous_right_visible(spark):
    left = spark.createDataFrame([(1, _ts(3), "e")], "k long, ts timestamp, name string")
    right = spark.createDataFrame([(1, _ts(3), 7)], "k long, rts timestamp, payload int")
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, by="k", left_ts="ts", right_ts="rts",
            right_cols=["payload"], direction=direction,
        )
        assert out.first()["asof_payload"] == 7


def test_asof_join_forward(spark):
    """Forward as-of: EARLIEST right row at/after each left ts — the
    mirror traversal of backward, same single-shuffle plan."""
    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(20), "e2"), (1, _ts(2), "e0"), (2, _ts(5), "x")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 100), (1, _ts(10), 200), (3, _ts(0), 999)],
        "k long, rts timestamp, payload int",
    )
    out = asof_join(
        left, right, by="k", left_ts="ts", right_ts="rts",
        right_cols=["payload"], direction="forward",
    )
    got = {r["name"]: r["asof_payload"] for r in out.collect()}
    assert got["e0"] == 100  # earliest right at/after t=2 is t=3
    assert got["e1"] == 200  # earliest right at/after t=5 is t=10
    assert got["e2"] is None  # nothing after t=20
    assert got["x"] is None  # key 2 has no right rows
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, by="k", left_ts="ts", right_ts="rts",
                  right_cols=["payload"], direction="nearest")
