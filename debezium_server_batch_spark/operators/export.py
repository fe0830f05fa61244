"""Dataset export — the LAST hop of the training-data pipeline: after
filtering/dedup/sampling/packing, assign every document to a
fixed-token-budget SHARD, emit a loader manifest (per-shard doc/token
counts, id range, order-independent content checksum), and physically
write one parquet directory per shard.

Reference parity: the reference stops at "rows landed in a table"
(`BatchSparkChangeConsumer.java:98-110` — save-format/save-mode and
nothing else); shard layout, manifests, and integrity checksums are
what a pretraining loader actually consumes and are first-class here.

Everything is engine-portable and deterministic: shard assignment is
the same contiguous token-cumsum as `operators/sampling.pack_documents`
(window scan — no RNG, no partition-layout dependence), and the
checksum is a DECIMAL(38,0) sum of 60-bit md5 prefixes — decimal
addition is associative, md5 is standardized, so a DuckDB/Trino
manifest recomputation matches bit-for-bit (same two tricks the rest
of the driver oracle suite rides on).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.sampling import global_running_total


def _content_ck(id_col: str, text_col: str):
    """Per-document checksum term: first 15 hex chars of
    md5(id || ':' || text) as a 60-bit integer, widened to
    DECIMAL(38,0) so shard sums never overflow. Strict concat (not
    concat_ws): NULL text -> NULL term, skipped by SUM — identical to
    SQL `||`, so oracles agree on corpora with NULL rows."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(text_col))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("decimal(38,0)")
    )


def with_shard_id(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
    stratum_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + a `shard_id` column, ALL other columns preserved — the
    zero-join way to shard a corpus: the running total is computed in
    place (stratified: per-stratum window; unstratified:
    `global_running_total`'s range-partitioned two-level cumsum), so
    text/metadata never have to be joined back on id afterwards. At
    corpus scale that join is a corpus×corpus shuffle; this is one
    scan."""
    if stratum_col:
        w = Window.partitionBy(stratum_col).orderBy(F.col(id_col))
        base = df.withColumn("_cum", F.sum(F.col(token_col).cast("long")).over(w))
    else:
        base = global_running_total(df, id_col, token_col, num_partitions)
    start = (F.col("_cum") - F.col(token_col)).cast("long")
    return base.withColumn(
        "shard_id", F.floor(start / F.lit(shard_tokens)).cast("long")
    ).drop("_cum")


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
    stratum_col: str | None = None,
) -> DataFrame:
    """(id[, stratum], n_tokens, shard_id): contiguous greedy sharding —
    order by id (within stratum), cumulative token count, shard =
    start-offset // budget. A document straddling a boundary stays in
    its start shard, so shards overflow by at most one document —
    `pack_documents` semantics at shard granularity (same cumsum plan;
    see `with_shard_id` for the all-columns variant)."""
    cols = [F.col(id_col)] + ([F.col(stratum_col)] if stratum_col else [])
    return with_shard_id(
        df, id_col=id_col, token_col=token_col, shard_tokens=shard_tokens,
        stratum_col=stratum_col,
    ).select(*cols, F.col(token_col).cast("long").alias("n_tokens"), "shard_id")


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
    stratum_col: str | None = None,
) -> DataFrame:
    """Loader manifest: one row per shard with `n_docs`, `n_tokens`,
    `first_id`/`last_id` (the contiguity contract a resumable loader
    seeks by), and `content_checksum` — the DECIMAL(38,0) sum over the
    shard's documents of the first-15-hex-chars-of-md5(id || ':' ||
    text) as a 60-bit integer. Order-independent (decimal addition is
    associative), engine-portable (DuckDB:
    `sum(('0x' || substr(md5(...),1,15))::BIGINT)::DECIMAL(38,0)`),
    and any dropped/duplicated/bit-flipped document changes it.

    One cumsum scan + one hash aggregate; the checksum needs no sort,
    no collect, and — because `with_shard_id` keeps every column — no
    join back to the corpus. O(docs) work however many shards."""
    ck = _content_ck(id_col, text_col)
    assigned = with_shard_id(
        df.withColumn("_ck", ck), id_col=id_col, token_col=token_col,
        shard_tokens=shard_tokens, stratum_col=stratum_col,
    )
    group = ([stratum_col] if stratum_col else []) + ["shard_id"]
    return assigned.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
        F.sum("_ck").alias("content_checksum"),
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "n_tokens",
    shard_tokens: int = 1_000_000,
) -> DataFrame:
    """Physically write the sharded dataset: parquet partitioned by
    `shard_id` (one directory per shard — the unit a loader maps to a
    worker), documents ordered by id within each shard file, plus the
    manifest at `<out_dir>/_manifest` (parquet) for integrity checks
    and length-aware scheduling. Returns the manifest DataFrame.

    Scale shape: `with_shard_id` keeps every column, so there is NO
    join anywhere — one cumsum scan assigns shards in place, then
    `repartition(shard_id)` co-locates each shard in one task before
    `partitionBy` so a shard is one file, not
    one-file-per-input-partition (the small-files failure mode of a
    naive partitioned write at 10^5 shards); `sortWithinPartitions`
    keeps ids monotonic inside the file, which the manifest's
    first/last-id contract documents. At a fixed token budget, task
    memory is bounded by shard_tokens regardless of corpus size. The
    manifest aggregate reuses the same assigned frame (same persisted
    range scan), not a second assignment pass."""
    ck = _content_ck(id_col, text_col)
    assigned = with_shard_id(
        df.withColumn("_ck", ck), id_col=id_col, token_col=token_col,
        shard_tokens=shard_tokens,
    )
    (
        assigned.drop("_ck")
        .repartition(F.col("shard_id"))
        .sortWithinPartitions(id_col)
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "data"))
    )
    manifest = assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
        F.sum("_ck").alias("content_checksum"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "_manifest"))
    return manifest


def verify_shards(spark, out_dir: str, id_col: str = "doc_id",
                  text_col: str = "text", token_col: str = "n_tokens") -> DataFrame:
    """Loader-side integrity check: re-read `<out_dir>/data`, recompute
    every manifest column per shard, and FULL-OUTER diff against the
    stored `_manifest`. Returns one row per shard with an `ok` flag and
    both sides of every field — `ok` is false for any dropped,
    duplicated, truncated, or bit-flipped document, a missing shard, or
    a shard on disk that the manifest never promised.

    Scale shape: one scan of the dataset + a hash aggregate keyed on
    shard_id (map-side combined), full-outer joined to the manifest —
    both join sides are O(shards) rows, never O(docs). No sort, no
    collect."""
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    got = (
        data.withColumn("_ck", _content_ck(id_col, text_col))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("got_docs"),
            F.sum(F.col(token_col).cast("long")).alias("got_tokens"),
            F.min(id_col).alias("got_first_id"),
            F.max(id_col).alias("got_last_id"),
            F.sum("_ck").alias("got_checksum"),
        )
    )
    manifest = spark.read.parquet(os.path.join(out_dir, "_manifest"))
    joined = manifest.join(got, "shard_id", "full_outer")
    ok = (
        (F.col("n_docs") == F.col("got_docs"))
        & (F.col("n_tokens") == F.col("got_tokens"))
        & (F.col("first_id") == F.col("got_first_id"))
        & (F.col("last_id") == F.col("got_last_id"))
        & (F.col("content_checksum") == F.col("got_checksum"))
    )
    return joined.withColumn("ok", F.coalesce(ok, F.lit(False)))
