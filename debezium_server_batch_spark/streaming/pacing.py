"""Adaptive batch-size pacing (SURVEY.md F1-F4).

Pure-Python re-expressions of the reference's flow-control strategies —
the arithmetic is behavior-identical (unit-tested the same way as
common/DynamicBatchSizeWaitTest.java) but the code is ours, with
injectable clock/sleep so tests never actually sleep.

  * NoBatchSizeWait      — consume immediately (reference default).
  * DynamicBatchSizeWait — keeps the last 3 batch sizes and sleeps; when
    the rolling average fills ≥97/95/90% of max-batch-size the sleep
    decays ×0.5/×0.65/×0.8, at ≥85% it holds, below that it grows by
    max_batch_size/num_records; clamped to [100ms, max-wait]; the
    elapsed processing time is subtracted and sleeps ≤2s are skipped
    (reference common/DynamicBatchSizeWait.java:53-89).
  * MaxBatchSizeWait     — poll the unconsumed-log size every
    wait-interval until it reaches max-batch-size or max-wait elapses;
    skipped while snapshot-phase load is running
    (reference common/MaxBatchSizeWait.java:48-78).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Callable


class NoBatchSizeWait:
    def wait_ms(self, num_records: int, processing_time_ms: int = 0) -> int:
        return 0


class DynamicBatchSizeWait:
    def __init__(
        self,
        max_batch_size: int = 2048,
        max_wait_ms: int = 300_000,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self._sleep = sleep_fn
        self.batch_history: deque[int] = deque([1, 1, 1], maxlen=3)
        self.sleep_history: deque[int] = deque([100, 100, 100], maxlen=3)

    def compute_wait_ms(self, num_records: int) -> int:
        """The pure pacing function (unit-test surface)."""
        self.batch_history.append(num_records)
        fill = (sum(self.batch_history) / len(self.batch_history)) / self.max_batch_size
        last = self.sleep_history[-1]
        if fill >= 0.97:
            nxt = int(last * 0.50)
        elif fill >= 0.95:
            nxt = int(last * 0.65)
        elif fill >= 0.90:
            nxt = int(last * 0.80)
        elif fill >= 0.85:
            return last  # hold steady; history unchanged
        else:
            nxt = int(last * self.max_batch_size / max(num_records, 1))
        nxt = min(max(nxt, 100), self.max_wait_ms)
        self.sleep_history.append(nxt)
        return nxt

    def wait_ms(self, num_records: int, processing_time_ms: int = 0) -> int:
        sleep = max(self.compute_wait_ms(num_records) - processing_time_ms, 0)
        if sleep > 2000:
            self._sleep(sleep / 1000.0)
            return sleep
        return 0


class MaxBatchSizeWait:
    def __init__(
        self,
        pending_fn: Callable[[], int],
        max_batch_size: int = 2048,
        max_wait_ms: int = 300_000,
        wait_interval_ms: int = 10_000,
        snapshot_running_fn: Callable[[], bool] = lambda: False,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        if wait_interval_ms >= max_wait_ms:
            raise ValueError("wait-interval-ms must be smaller than max-wait-ms")
        self.pending_fn = pending_fn
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.wait_interval_ms = wait_interval_ms
        self.snapshot_running_fn = snapshot_running_fn
        self._sleep = sleep_fn

    def wait_ms(self, num_records: int = 0, processing_time_ms: int = 0) -> int:
        if self.snapshot_running_fn():
            return 0
        total = 0
        while total < self.max_wait_ms and self.pending_fn() < self.max_batch_size:
            total += self.wait_interval_ms
            self._sleep(self.wait_interval_ms / 1000.0)
        return total


_REGISTRY = {
    "NoBatchSizeWait": NoBatchSizeWait,
    "DynamicBatchSizeWait": DynamicBatchSizeWait,
    "MaxBatchSizeWait": MaxBatchSizeWait,
}


def select_batch_size_wait(name: str) -> type:
    """F4: strategy selection by name (reference BatchUtil.selectInstance
    CDI lookup, BatchUtil.java:43-54)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown batch-size-wait strategy {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
