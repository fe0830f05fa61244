"""Watermarked windowed streaming aggregation — the BUILT-IN stateful
op (groupBy(window(ts)) + watermark), complementing the custom
applyInPandasWithState sessionizer in streaming/stateful.py. Append
mode emits each window exactly once, when the watermark passes its
end; state per open window is one aggregation buffer, bounded by the
watermark (Spark drops windows older than watermark automatically —
the standard late-data contract).

Note: append-mode streaming aggregation cannot use count_distinct
(distinct state is unbounded per window); the rollup sticks to
count/sum — sums accumulate exact decimal(38,6) state (range ~1e32,
so real-world values never overflow to null mid-aggregation; a NaN
still nulls per SQL semantics). Null/uncastable event times are
FILTERED explicitly so batch-mode runs of the same function match the
streaming watermark operator, which drops null event times itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts: str = "ts",
    group: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Streaming DF of events → append-mode stream of CLOSED
    (window, group) rollups: event count + exact decimal value sum
    (cast back to double for parity with the batch rollup)."""
    return (
        events.withColumn("_ts", F.col(ts).cast("timestamp"))
        .filter(F.col("_ts").isNotNull())
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("w"), F.col(group))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(group),
            "n",
            "sum_value",
        )
    )
