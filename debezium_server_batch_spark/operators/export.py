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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.sampling import pack_documents


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
    `pack_documents` semantics at shard granularity (it IS that window
    plan, re-labeled; one scan, sequential within a stratum, parallel
    across strata)."""
    packed = pack_documents(
        df, id_col=id_col, token_col=token_col, budget=shard_tokens,
        stratum_col=stratum_col,
    )
    return packed.withColumnRenamed("pack_id", "shard_id").drop("pack_offset")


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

    One window scan + one hash aggregate; the checksum needs no sort
    and no collect — O(docs) work however many shards there are."""
    # strict concat (not concat_ws): a NULL text yields a NULL checksum
    # term that the sum skips — identical to SQL `||` semantics, so the
    # oracle agrees on corpora with NULL rows too
    ck = (
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
    # pack_documents projects away non-key columns, so the checksum
    # rides back in on an id equi-join (both sides are one scan of df;
    # AQE broadcasts whichever is small)
    assigned = assign_shards(
        df, id_col=id_col, token_col=token_col, shard_tokens=shard_tokens,
        stratum_col=stratum_col,
    ).join(df.select(F.col(id_col), ck.alias("_ck")), id_col)
    group = ([stratum_col] if stratum_col else []) + ["shard_id"]
    return assigned.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
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

    Scale shape: `repartition(shard_id)` co-locates each shard in one
    task before `partitionBy` so a shard is one file, not
    one-file-per-input-partition (the small-files failure mode of a
    naive partitioned write at 10^5 shards); `sortWithinPartitions`
    keeps ids monotonic inside the file, which the manifest's
    first/last-id contract documents. At a fixed token budget, task
    memory is bounded by shard_tokens regardless of corpus size."""
    assigned = assign_shards(
        df, id_col=id_col, token_col=token_col, shard_tokens=shard_tokens
    ).select(id_col, "shard_id")
    (
        df.join(assigned, id_col)
        .repartition(F.col("shard_id"))
        .sortWithinPartitions(id_col)
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "data"))
    )
    manifest = shard_manifest(
        df, id_col=id_col, text_col=text_col, token_col=token_col,
        shard_tokens=shard_tokens,
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "_manifest"))
    return manifest
