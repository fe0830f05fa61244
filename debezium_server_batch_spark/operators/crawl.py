"""Crawl-corpus maintenance operators — the batch faces of the CDC
engine's per-url semantics (BASELINE.json north_star: web pages keyed
by url, LWW by warc_ts).

A continuously-refreshed crawl corpus needs three recurring batch jobs
besides the streaming ingest itself:

  * ``latest_fetch``      — collapse a multi-snapshot fetch log to the
    newest fetch per CANONICAL url (case/port/tracking-param variants
    of one page must collapse to one row — the batch analogue of the
    MERGE upsert the streaming path applies incrementally).
  * ``host_stats``        — per-site rollup over the collapsed corpus
    (pages per host, fetch counts, recency) — the politeness-budget /
    crawl-planning input.
  * ``incremental_dedup`` — drop rows of a NEW crawl batch whose
    content already exists in the standing corpus, so re-fetches of
    unchanged pages don't re-enter the training set.

All three are single-shuffle (or shuffle-free on the big side) and pure
built-in expressions — no Python in the hot path.

Reference parity: the reference consumer appends every change event
(BaseBatchChangeConsumer.java); collapsing to current-state-per-key is
left to the warehouse. Here it is a first-class operator, same LWW
total order as `operators/dedup.lww_agg`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_batch_spark.functions.url import canonicalize_url, url_host


def latest_fetch(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Newest fetch per canonical url, plus per-page fetch statistics.

    Output: one row per canonical url carrying the WINNING fetch's
    full row (all input columns), with `canon_url`, `host`,
    `n_fetches`, and `first_<ts_col>` prepended/appended. The winner is
    max by (``ts_col``, *tiebreak) — pass the source offset/LSN as the
    tiebreak when fetch timestamps can collide, mirroring the streaming
    MERGE's (warc_ts, __lsn) order so batch collapse and incremental
    upsert agree row-for-row.

    100-TB shape: ONE hash aggregate — groupBy(canon_url) computes the
    max-struct winner AND count AND min(ts) in the same partial/final
    aggregate pair, so a 10^10-fetch log shuffles exactly once, already
    reduced map-side (a hot page pre-collapses on every input
    partition before the exchange; see `operators/dedup.lww_agg` and
    the skew-soak evidence in BASELINE.md)."""
    order = [ts_col, *tiebreak]
    for c in order:
        if c not in df.columns:
            raise ValueError(f"order column {c!r} missing from fetch log")
    cols = df.columns
    payload = F.struct(*[F.col(c) for c in cols]).alias("_row")
    keyed = df.select(
        canonicalize_url(url_col).alias("canon_url"),
        url_host(url_col).alias("host"),
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in order], payload).alias("_ord"),
    )
    agg = keyed.groupBy("canon_url").agg(
        F.first("host").alias("host"),  # host is a function of canon_url
        F.max("_ord").alias("_m"),
        F.count(F.lit(1)).alias("n_fetches"),
        F.min("_ts").alias(f"first_{ts_col}"),
    )
    return agg.select(
        "canon_url",
        "host",
        *[F.col(f"_m._row.{c}").alias(c) for c in cols],
        "n_fetches",
        f"first_{ts_col}",
    )


def host_stats(
    collapsed: DataFrame,
    ts_col: str = "warc_ts",
    size_col: str | None = None,
) -> DataFrame:
    """Per-site rollup over a `latest_fetch` result (one row per page):
    page count, total fetch count (refresh pressure), newest/oldest
    page timestamps, and optional total content size. Rows with no
    parseable host (canon pass-through of non-URLs) are excluded — they
    belong to the DLQ, not to a site budget.

    100-TB shape: a second single hash aggregate over the already-
    collapsed corpus (pages, not fetches — typically 100× smaller than
    the raw log); host cardinality is ~10^7, far below the page count,
    so partial aggregation collapses most of the input before the
    shuffle."""
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("n_fetches").alias("n_fetches"),
        F.min(F.col(f"first_{ts_col}")).alias(f"first_{ts_col}"),
        F.max(F.col(ts_col)).alias(f"last_{ts_col}"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias(f"total_{size_col}"))
    return collapsed.filter(F.col("host").isNotNull()).groupBy("host").agg(*aggs)


def incremental_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    cols: list[str] | tuple[str, ...] = ("text",),
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Admit only the rows of `new_batch` whose content is NOT already
    in `corpus` — the continuous-ingest half of exact dedup: a weekly
    crawl re-fetches mostly-unchanged pages, and only genuinely new or
    changed content should enter the training set.

    Matching is on md5 over the concatenated `cols` (engine-portable —
    the same fingerprint a DuckDB/Trino-side corpus registry would
    compute), with a length-1 separator to keep ("ab","c") ≠ ("a","bc").
    NULL in any fingerprint column never matches anything (SQL join
    semantics) — such rows are admitted; upstream quality filters own
    them.

    100-TB shape: the corpus side is reduced to DISTINCT fingerprints
    BEFORE the join — one narrow md5 column instead of full rows — then
    a left_anti equi-join. With `broadcast_corpus` (fingerprint set
    fits in executor memory, ≤ a few 10^8 hashes) the new batch is
    never shuffled at all; otherwise both sides hash-partition on the
    fingerprint, and the anti-join output is exactly the admitted rows
    — no post-join dedup needed."""
    any_null = F.lit(False)
    for c in cols:
        any_null = any_null | F.col(c).isNull()
    fp = F.when(any_null, F.lit(None).cast("string")).otherwise(
        F.md5(F.encode(F.concat_ws("\x1f", *[F.col(c) for c in cols]), "UTF-8"))
    )
    seen = corpus.select(fp.alias("_fp")).distinct()
    if broadcast_corpus:
        seen = F.broadcast(seen)
    return (
        new_batch.withColumn("_fp", fp)
        .join(seen, "_fp", "left_anti")
        .drop("_fp")
    )


def cap_per_host(
    df: DataFrame,
    cap: int,
    host_col: str = "host",
    order_by: tuple[str, ...] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `cap` rows per host — domain capping, the web-corpus
    rebalancing stage that stops any single site (forums, wikis, link
    farms) from dominating the training mix (RefinedWeb/FineWeb-style).
    Which rows survive is deterministic: the top `cap` by `order_by`
    DESC (e.g. a quality score), ties and the no-order case broken by
    `id_col` ASC — the same row set on any engine or partitioning.
    NULL-host rows pass through uncapped (they have no domain to cap;
    upstream stages own them).

    100-TB shape: a rank inside Window.partitionBy(host). Spark >= 3.5
    plans rank<=k as WindowGroupLimit: each map task keeps only its
    local top-(cap) per host BEFORE the exchange (asserted in tests),
    so a 10^8-page host ships ~cap rows per input partition, not its
    whole partition, and the post-shuffle sort is over the survivors.
    This is the same partial-reduce insurance lww_agg gets from
    partial aggregation — but for top-k instead of top-1."""
    from pyspark.sql import Window

    order = [F.col(c).desc() for c in order_by] + [F.col(id_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    capped = (
        df.filter(F.col(host_col).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return capped.unionByName(df.filter(F.col(host_col).isNull()))


def link_rank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link-graph quality rank over a (src, dst) edge table — the
    classic web-corpus curation signal (pages many pages point at are
    likelier to be worth keeping), as a FIXED-ITERATION PageRank
    variant:

        rank_0(v)     = 1.0
        rank_{t+1}(v) = (1-d) + d * sum_{(u,v) in E} rank_t(u) / outdeg(u)

    The unnormalized form of the original formulation: deterministic,
    needs no global node count, and every step is SQL-mirrorable, so
    the driver oracle equality-checks it end-to-end. Dangling nodes
    (no out-edges) simply contribute nothing — the variant's documented
    simplification; nodes with no in-edges settle at (1-d).

    Distributed shape: outdeg is computed ONCE (one shuffle); each
    iteration is one equi-join edges⋈ranks on src (ranks is O(V) —
    broadcastable when V is small, AQE decides) plus one hash-aggregate
    by dst with map-side partial aggregation. Iterations are a FIXED
    small constant (3 captures the quality ordering; this is a corpus
    signal, not a convergence exercise), so the lineage stays shallow —
    no checkpointing needed. Per-node contributions are summed as
    DECIMAL(38,18) after the double division: decimal addition is
    associative, so the sum — and therefore the rank — is bit-identical
    across engines and partitionings (same trick as the bench's
    sum_value columns); every other step is pointwise IEEE arithmetic.

    Returns (id, rank) for every node, rank rounded to 9 decimals.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_odeg"))
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    for _ in range(int(iterations)):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "_s"), "_s")
            .join(outdeg, "_s")
            .select(
                F.col("_d").alias("id"),
                (F.col("rank") / F.col("_odeg")).cast("decimal(38,18)").alias("_c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("_c").alias("_sum"))
        ranks = nodes.join(summed, "id", "left").select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("_sum").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("id", F.round("rank", 9).alias("rank"))
