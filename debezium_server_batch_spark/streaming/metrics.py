"""Lineage + progress metrics (SURVEY.md F5/F6, north_rule lineage).

The reference exposes Debezium JMX metrics (DebeziumMetrics.java:60-109)
and logs consumed-event progress every 15 minutes
(AbstractChangeConsumer.java:150-158). Our engine records a structured
lineage record per micro-batch — offset range, per-group and per-bucket
row counts, merge stats, durations — both inside the LakeTable snapshot
(atomic with the data) and optionally to a JSONL side log for operators.
"""

from __future__ import annotations

import json
import logging
import time

logger = logging.getLogger("debezium_server_batch_spark")


class ProgressLogger:
    """Consumed-event progress, logged at most every `interval_s`."""

    def __init__(self, interval_s: float = 900.0, clock=time.monotonic):
        self.interval_s = interval_s
        self.clock = clock
        self._t0 = clock()
        self._events = 0

    def record(self, num_events: int) -> bool:
        self._events += num_events
        elapsed = self.clock() - self._t0
        if elapsed >= self.interval_s:
            rate = self._events / max(elapsed, 1e-9)
            logger.info(
                "consumed %d events in %.0fs (%.1f events/s)", self._events, elapsed, rate
            )
            self._t0 = self.clock()
            self._events = 0
            return True
        return False


class MetricsLog:
    """Append-only JSONL metrics sink; None path → in-memory only."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records: list[dict] = []

    def emit(self, record: dict) -> None:
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(record) + "\n")
