"""Change-event batch source (SURVEY.md S1, F3's queue probe, F5 metrics).

The reference is handed micro-batches by the embedded Debezium engine
(`handleBatch`, AbstractChangeConsumer.java:100-148) — a pull model over
the binlog. Our source re-expresses that as offset-windowed reads over a
durable event-log table (Parquet/any Spark source) with columns:

    offset       long     -- monotone source position (the LSN)
    destination  string   -- topic → target table name
    key          string   -- Debezium key envelope (JSON)
    value        string   -- {"schema":..., "payload":...} envelope (JSON)

Offset-range predicates push down to the Parquet scan (min/max row-group
pruning), so `read_slice` touches only the files covering the window —
this is what makes replay of a 10^10-event log from a checkpoint cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENT_LOG_SCHEMA = "offset long, destination string, key string, value string"


class EventLogSource:
    """format='parquet' (default) or 'json' — the latter reads jsonlines
    files shaped like the reference's spooled batches
    (AbstractChangeConsumer.getJsonLinesFile, SURVEY.md S6), one event
    object per line, with an explicit schema (no inference pass)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        offset_col: str = "offset",
        format: str = "parquet",
    ):
        if format not in ("parquet", "json"):
            raise ValueError(f"unsupported event-log format {format!r}")
        self.spark = spark
        self.path = path
        self.offset_col = offset_col
        self.format = format

    def df(self) -> DataFrame:
        if self.format == "json":
            return self.spark.read.schema(EVENT_LOG_SCHEMA).json(self.path)
        return self.spark.read.parquet(self.path)

    def read_slice(self, lo: int, hi: int) -> DataFrame:
        """Events with lo < offset <= hi (predicate pushed to the scan)."""
        c = F.col(self.offset_col)
        return self.df().filter((c > F.lit(lo)) & (c <= F.lit(hi)))

    def max_offset(self) -> int | None:
        row = self.df().agg(F.max(self.offset_col)).first()
        return row[0]

    def window_bounds(self, after_offset: int, target_events: int) -> list[int]:
        """Offset upper-bounds for event-count-balanced micro-batches.

        Fixed offset-width windows degenerate when the offset space is
        sparse (e.g. a few hot keys stretch the tail of the log): most
        windows carry a handful of events but still pay full per-batch
        overhead. One `approxQuantile` pass (a distributed sketch, not a
        sort) yields boundaries where every window holds ≈ target_events
        events regardless of offset density."""
        c = F.col(self.offset_col)
        df = self.df().filter(c > F.lit(after_offset)).select(self.offset_col)
        agg = df.agg(F.count(F.lit(1)), F.max(self.offset_col)).first()
        n, max_off = agg[0], agg[1]
        if not n:
            return []
        k = max(1, -(-n // target_events))  # ceil
        if k == 1:
            return [max_off]
        probs = [i / k for i in range(1, k)]
        qs = df.approxQuantile(self.offset_col, probs, 0.001)
        bounds: list[int] = []
        for q in qs:
            b = int(q)
            if b > after_offset and (not bounds or b > bounds[-1]):
                bounds.append(b)
        if not bounds or bounds[-1] < max_off:
            bounds.append(int(max_off))
        return bounds

    def pending_count(self, after_offset: int) -> int:
        """Unconsumed-event count — our analogue of the reference's JMX
        queue-size probe driving MaxBatchSizeWait (DebeziumMetrics.java:
        60-109): poll how much log exists past the checkpoint."""
        return self.df().filter(F.col(self.offset_col) > F.lit(after_offset)).count()

    def snapshot_running(
        self, after_offset: int = 0, probe_events: int = 1024, threshold: float = 0.5
    ) -> bool:
        """Derive the reference's 'snapshot running' gauge from the log
        itself: Debezium marks initial-snapshot reads with __op='r'
        (the reference polls it from JMX MBeans, DebeziumMetrics.java:
        60-109 / MaxBatchSizeWait.java:56-60 — the log carries the same
        signal). True when ≥ `threshold` of the next `probe_events`
        events past the checkpoint are snapshot reads. Bounded probe:
        offset predicate pushes down, limit caps the scan."""
        agg = (
            self.df()
            .filter(F.col(self.offset_col) > F.lit(after_offset))
            # earliest pending events (TakeOrderedAndProject — bounded
            # k, not a full sort); a bare limit() is partition-order
            # arbitrary and could probe the wrong end of the window
            .orderBy(F.col(self.offset_col).asc())
            .limit(probe_events)
            .select(F.get_json_object("value", "$.payload.__op").alias("op"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("op") == "r", 1).otherwise(0)).alias("r"),
            )
            .first()
        )
        if agg is None or not agg["n"]:
            return False
        return agg["r"] / agg["n"] >= threshold
