"""Relational/analytic operators beyond the reference's surface.

The reference has no query operators at all (SURVEY.md §2 load-bearing
negative) — these are the standard lake-analytics ops a user of the
landed tables runs next, built purely from DataFrame primitives so
Catalyst owns the physical plan:

  * sessionize       — gap-based sessions via lag + cumulative sum
  * topk_per_group   — window row_number ≤ k (TakeOrdered per group)
  * asof_join        — Spark lacks a native as-of join; composed as
    union + last(ignorenulls) over a (by, time) window: one shuffle,
    no range explosion, deterministic ties
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(col: F.Column) -> F.Column:
    """Seconds-since-epoch as double; handles TIMESTAMP_NTZ (not directly
    castable to double) by routing through TIMESTAMP first."""
    return col.cast("timestamp").cast("double")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign 1-based session ids per key: a new session starts when the
    gap to the previous event exceeds `gap_minutes`."""
    w = Window.partitionBy(key).orderBy(F.col(ts))
    prev = F.lag(F.col(ts)).over(w)
    gap_s = _epoch_s(F.col(ts)) - _epoch_s(prev)
    new_session = F.when(prev.isNull() | (gap_s > gap_minutes * 60.0), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(new_session).over(w))


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-key session rollup: session count, events per session, span.

    Spans are integer milliseconds and the rollup sums longs — exact and
    order-independent, so results are bit-identical across engines and
    partitionings (a double-seconds sum is not: float addition isn't
    associative). The average is a single long/long division, also
    deterministic."""
    s = sessionize(df, key, ts, gap_minutes)
    per_session = s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_millis(F.max(F.col(ts)).cast("timestamp"))
            - F.unix_millis(F.min(F.col(ts)).cast("timestamp"))
        ).alias("span_ms"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("span_ms").alias("total_span_ms"),
    ).withColumn("avg_events_per_session", F.col("n_events") / F.col("n_sessions"))


def topk_per_group(
    df: DataFrame,
    group: str,
    order: str,
    k: int,
    tie_break: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group by `order` (deterministic with tie_break)."""
    cols = [F.col(order).desc() if descending else F.col(order).asc()]
    if tie_break:
        cols.append(F.col(tie_break).asc())
    w = Window.partitionBy(group).orderBy(*cols)
    return df.withColumn("rank_in_group", F.row_number().over(w)).filter(
        F.col("rank_in_group") <= k
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (direction='backward'), or the earliest right
    row with right_ts >= left_ts (direction='forward'), within the same
    `by` key.

    Physical shape: tag + unionByName + `last(ignorenulls)` over a
    (by, ts, tag) window — a single shuffle on `by`, linear in
    |left|+|right| (no range cross-product). Forward is the mirror:
    identical plan over a descending ts traversal. An exactly-
    simultaneous right row is visible to the left row in BOTH
    directions (right sorts before left at equal ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
        ).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (tag 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row;
    # forward = the same prefix-scan over descending ts
    order_ts = F.col("_ts").desc() if direction == "forward" else F.col("_ts").asc()
    w = (
        Window.partitionBy("_by")
        .orderBy(order_ts, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_asof", F.last("_rrow", ignorenulls=True).over(w))
    out = matched.filter(F.col("_is_left") == 1).select(
        F.col("_lrow.*"), *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols]
    )
    return out
