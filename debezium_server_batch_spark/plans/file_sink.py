"""Generic file sink — the reference's PRIMARY write mode (SURVEY.md W1):

    df.write.mode(saveMode).format(saveFormat).save(bucket/destination)

(`BatchSparkChangeConsumer.java:107-110`, config save-format/save-mode at
`AbstractSparkChangeConsumer.java:36-39`, defaults append+parquet per
README.md:39-40) with the optional wall-clock ``dt=YYYY-MM-dd`` objectkey
partition in a configured timezone (`BatchSparkChangeConsumer.java:
130-147`; note it is WALL-CLOCK, not event time — reference parity,
unlike LakeTable's event-time days()).

Semantics are the reference's: append-only ledger (updates/deletes land
as extra rows), at-least-once delivery — the offset checkpoint is a side
file written AFTER all destination writes succeed, so a crash in between
re-delivers the window and duplicates rows (exactly the reference's W9
behavior; the LakeTable sink is the exactly-once upgrade). Row counts
come from the batch grouping aggregate, not a post-write df.count()
re-scan (the reference's W2 double-pass cost bug).
"""

from __future__ import annotations

import datetime
import json
import os
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession


class FileSink:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        save_format: str = "parquet",
        save_mode: str = "append",
        objectkey_partition: bool = False,
        partition_tz: str = "UTC",
        today_fn=None,
        storage=None,
    ):
        from .storage import PosixStorage

        self.spark = spark
        self.root = root
        self.save_format = save_format
        self.save_mode = save_mode
        self.objectkey_partition = objectkey_partition
        self.tz = ZoneInfo(partition_tz)
        self._today_fn = today_fn  # test hook for the wall-clock date
        # checkpoint I/O through the storage layer: PosixStorage does a
        # durable tmp+rename, an object store a plain PUT (single-writer
        # checkpoint, last PUT wins — the reference's S3 deployment shape)
        self.storage = storage if storage is not None else PosixStorage()

    # ------------------------------------------------------------------

    def _dt_suffix(self) -> str:
        today = self._today_fn() if self._today_fn else datetime.datetime.now(self.tz).date()
        return f"dt={today.isoformat()}"

    def destination_path(self, destination_name: str) -> str:
        path = os.path.join(self.root, destination_name)
        if self.objectkey_partition:
            path = os.path.join(path, self._dt_suffix())
        return path

    def write(self, df: DataFrame, destination_name: str) -> str:
        """One upload — any Spark save format/mode, per destination."""
        path = self.destination_path(destination_name)
        w = df.write.mode(self.save_mode).format(self.save_format)
        if self.save_format == "csv":
            # read() expects header=true; without it the first data row
            # of every csv file would be consumed as column names
            w = w.option("header", "true")
        w.save(path)
        return path

    # ------------------------------------------------------------------
    # offset checkpoint (at-least-once: written after the window's writes)

    def _ckpt_path(self) -> str:
        return os.path.join(self.root, "_checkpoint.json")

    def checkpoint(self) -> dict | None:
        p = self._ckpt_path()
        if not self.storage.exists(p):
            return None
        return json.loads(self.storage.read_text(p))

    def commit_checkpoint(self, checkpoint: dict) -> None:
        self.storage.makedirs(self.root)
        self.storage.write_text(self._ckpt_path(), json.dumps(checkpoint))

    def read(self, destination_name: str) -> DataFrame:
        """Read a destination back, merging schema epochs (the reference's
        readers use mergeSchema=true — BaseSparkTest.java:125-129)."""
        base = os.path.join(self.root, destination_name)
        reader = self.spark.read.option("mergeSchema", "true").option("recursiveFileLookup", "true")
        if self.save_format == "json":
            return reader.json(base)
        if self.save_format == "csv":
            return reader.option("header", "true").csv(base)
        return reader.format(self.save_format).load(base)
