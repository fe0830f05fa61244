"""Scalar normalization of parsed change events (SURVEY.md P1-P2).

Reference behavior being re-expressed:
  * P1 — append `__source_ts` (epoch seconds → timestamp) derived from
    `__source_ts_ms`, defaulting both to "now" when absent (heartbeats) —
    AbstractChangeConsumer.java:160-170, DebeziumSparkEvent.java:99-113.
  * P2 — optional `__deleted` string→boolean cast (cast-deleted-field) —
    BatchSparkChangeConsumer.java:98-100.

Plus our engine's page-row projection: the envelope carries Connect-typed
after-image fields (warc_ts as int64 epoch millis, html as bytes); the
target table wants (url string, warc_ts timestamp, html binary,
text string, lang string) per BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("__op", "__table", "__lsn", "__source_ts_ms", "__deleted", "__source_ts")


def add_source_ts(df: DataFrame, default_ts_ms: int | None = None) -> DataFrame:
    """P1. `default_ts_ms=None` → wall clock (reference parity); tests
    pass a fixed value for determinism."""
    default_ms = (
        F.lit(default_ts_ms).cast("long")
        if default_ts_ms is not None
        else (F.unix_timestamp() * 1000)
    )
    if "__source_ts_ms" not in df.columns:
        df = df.withColumn("__source_ts_ms", default_ms)
    else:
        df = df.withColumn("__source_ts_ms", F.coalesce(F.col("__source_ts_ms"), default_ms))
    return df.withColumn("__source_ts", F.timestamp_millis(F.col("__source_ts_ms")))


def cast_deleted(df: DataFrame, enabled: bool = True) -> DataFrame:
    """P2. The reference leaves `__deleted` a string unless configured;
    our MERGE path always needs the boolean."""
    if not enabled or "__deleted" not in df.columns:
        return df
    return df.withColumn("__deleted", F.col("__deleted").cast("boolean"))


def deleted_flag(df: DataFrame) -> F.Column:
    """Boolean delete indicator regardless of upstream representation
    (string 'true'/'false' per rewrite mode, or __op = 'd')."""
    cols = df.columns
    flag = F.lit(False)
    if "__deleted" in cols:
        flag = flag | F.coalesce(F.col("__deleted").cast("boolean"), F.lit(False))
    if "__op" in cols:
        flag = flag | (F.col("__op") == "d")
    return flag


def normalize_batch(df: DataFrame, default_ts_ms: int | None = None, cast_deleted_field: bool = True) -> DataFrame:
    return cast_deleted(add_source_ts(df, default_ts_ms), cast_deleted_field)


def to_page_row(df: DataFrame) -> DataFrame:
    """Project a normalized pages-envelope group to the target-table row:
    Connect int64 `warc_ts_ms` → TimestampType `warc_ts` (event time —
    partition/order key), pass-through url/html/text/lang + metadata.

    Deliberate divergence noted in SURVEY.md P6: the reference partitions
    by *wall-clock* date; we use event time.
    """
    cols = {}
    if "warc_ts_ms" in df.columns and "warc_ts" not in df.columns:
        cols["warc_ts"] = F.timestamp_millis(F.col("warc_ts_ms"))
    out = df.withColumns(cols)
    ordered = [c for c in ("url", "warc_ts", "html", "text", "lang", "title") if c in out.columns]
    passthrough = [c for c in out.columns if c not in ordered and c != "warc_ts_ms"]
    return out.select(*ordered, *passthrough)
