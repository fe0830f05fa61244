"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with built-in higher-order functions
(correct, one scan + a top-k sort — `ORDER BY ... LIMIT k` compiles to
TakeOrderedAndProject, no full sort). Scale path: sign-LSH bucketed
search with multi-probe (flip ≤1 bit) that touches only candidate
buckets, plus an Arrow/numpy fast path for the distance math.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import cosine, make_cosine_to_query_udf
from .dedup_fuzzy import make_sign_lsh_udf


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Exact top-k by cosine to a fixed query vector.

    use_arrow=True routes the distance through a vectorized numpy UDF
    (the throughput path); False uses pure built-in expressions (the
    oracle-comparable path — bit-identical math to SQL engines)."""
    if use_arrow:
        cos_udf = make_cosine_to_query_udf(query_vec)
        scored = df.select(F.col(id_col), cos_udf(F.col(vec_col)).alias("cosine"))
    else:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def make_assign_udf(centroids):
    """Arrow UDF: embedding → nearest-centroid index (L2). Kept as the
    reference implementation; the build loop uses assign_expr (pure
    JVM codegen — no corpus transfer to Python workers per round)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    @F.pandas_udf(T.IntegerType())
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            m = np.stack(s.to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.Series(d.argmin(axis=1).astype("int32"))

    return assign


def assign_expr(centroids, vec_col: str) -> F.Column:
    """Nearest-centroid index as a BUILT-IN expression: per-centroid
    squared-L2 via a zip_with fold (fixed left-to-right order → bit-
    deterministic regardless of partitioning), argmin via
    array_position(array_min) (first minimum, numpy tie semantics).
    Whole-stage codegen end to end: the k-means build never ships the
    corpus to Python workers — at 10^10 vectors the Arrow-UDF variant
    pays a JVM→Arrow→numpy round-trip of every vector per Lloyd round,
    this pays none. The centroids enter as ONE nested-array literal
    (not per-value scalar literals): complex-type literals are carried
    in the codegen references pool, so the generated code is identical
    across Lloyd rounds and the JIT compiles it once instead of once
    per round's centroid values."""
    carr = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(
        carr,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_build(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
    sample_cap: int = 131_072,
    distributed: bool = False,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: deterministic k-means centroids + a `_cluster` column.
    Build ONCE, query many times with ivf_topk(indexed, centroids, ...):
    at 100 TB `_cluster` is written into the table and used as a
    partition/prune key, and centroids live in the catalog.

    Default (FAISS-style IVF training): centroids are fit on a bounded
    DETERMINISTIC sample (the `sample_cap` smallest ids — k-means needs
    a representative sample, not the corpus) with numpy Lloyd rounds on
    the driver (fixed chunking → deterministic pairwise sums), then the
    FULL corpus is assigned in ONE distributed pass of pure codegen
    expressions (assign_expr — no Python workers, no per-round jobs).
    Driver memory is bounded by sample_cap×dim float64 (~64 MB at the
    default), independent of corpus size.

    distributed=True instead runs every Lloyd round over the full
    corpus in Spark (for corpora whose tail matters to the
    quantizer): the centroid update never gathers vectors onto one
    task — vectors are posexplode'd to (cluster, dim_pos, value) rows
    and reduced with a hash aggregate (map-side partial sums; decimal
    accumulation so centroids are bit-identical across partitionings);
    only the k×dim (cluster, pos, mean) rows reach the driver. Costs
    one 2-stage job per round."""
    vecs = df.select(F.col(id_col), F.col(vec_col)).persist()
    if not distributed:
        import numpy as np

        sample = vecs.orderBy(id_col).limit(sample_cap).select(vec_col).collect()
        train = np.asarray([list(map(float, r[0])) for r in sample], dtype=np.float64)
        cents = train[: min(k, len(train))].copy()
        for _ in range(iters):
            assign = np.empty(len(train), dtype=np.int64)
            for lo in range(0, len(train), 4096):  # fixed chunks → deterministic sums
                ch = train[lo : lo + 4096]
                d = ((ch[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign[lo : lo + len(ch)] = d.argmin(axis=1)
            for j in range(len(cents)):
                members = train[assign == j]
                if len(members):  # empty cluster keeps its centroid
                    cents[j] = members.mean(axis=0)
        centroids = [[float(x) for x in c] for c in cents]
        return vecs.withColumn("_cluster", assign_expr(centroids, vec_col)), centroids

    init_rows = vecs.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in init_rows]
    for _ in range(iters):
        assigned = vecs.select(assign_expr(centroids, vec_col).alias("_cluster"), F.col(vec_col))
        agg = (
            assigned.select("_cluster", F.posexplode(F.col(vec_col)).alias("_pos", "_v"))
            .groupBy("_cluster", "_pos")
            # decimal sum: associative → centroids are bit-identical across
            # partitionings/cluster sizes (double sums are order-dependent)
            .agg(
                F.sum(F.col("_v").cast("decimal(27,15)")).cast("double").alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new_c = [list(c) for c in centroids]
        for r in agg:
            new_c[r["_cluster"]][r["_pos"]] = r["_s"] / r["_n"]
        centroids = new_c

    out = vecs.withColumn("_cluster", assign_expr(centroids, vec_col))
    return out, centroids


def ivf_probe_clusters(centroids, query_vec: list[float], nprobe: int) -> list[int]:
    """The nprobe cluster ids nearest the query (driver-side, k×dim)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((c - q) ** 2).sum(axis=1))[:nprobe]
    return [int(x) for x in order]


def ivf_topk(
    indexed: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 3,
    use_arrow: bool = True,
) -> DataFrame:
    """IVF-style ANN query over a prebuilt index (see ivf_build): search
    only the `nprobe` clusters nearest the query, exact re-rank inside
    them (the classic inverted-file scale path; brute_force_topk is the
    recall oracle). The `_cluster` filter prunes at the scan when the
    column is stored/partitioned-on."""
    probe = ivf_probe_clusters(centroids, query_vec, nprobe)
    cand = indexed.filter(F.col("_cluster").isin(probe))
    return brute_force_topk(cand.drop("_cluster"), query_vec, k, id_col, vec_col, use_arrow=use_arrow)


def lsh_build(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 10,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Add the sign-LSH bucket column `_bkt` — build ONCE, query many
    times with lsh_topk. At 100 TB `_bkt` is written into the table and
    partitioned/bucketed on, so each query's probe set prunes at the
    scan instead of recomputing hyperplane signs over the corpus."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucketer = make_sign_lsh_udf(dim, n_planes, seed, n_tables=1)
    return df.withColumn("_bkt", bucketer(F.col(vec_col))[0])


def lsh_probe_buckets(
    query_vec: list[float], n_planes: int = 10, seed: int = 42, multiprobe_bits: int = 1
) -> list[int]:
    """The query's bucket plus every ≤`multiprobe_bits`-bit-flip
    neighbor (driver-side, O(n_planes))."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((len(query_vec), n_planes))
    qbits = (np.asarray(query_vec) @ planes) > 0
    qbucket = 0
    for j in range(n_planes):
        qbucket |= int(qbits[j]) << j
    probes = {qbucket}
    if multiprobe_bits >= 1:
        probes.update(qbucket ^ (1 << j) for j in range(n_planes))
    return sorted(probes)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the exact search to rows whose sign-LSH
    bucket is within `multiprobe_bits` bit-flips of the query's bucket.
    Accepts a prebuilt index (df already carrying `_bkt` from lsh_build —
    the query-many contract); falls back to bucketing on the fly with
    the same (n_planes, seed) for one-shot use."""
    bucketed = df if "_bkt" in df.columns else lsh_build(df, vec_col, n_planes, seed, dim=len(query_vec))
    probes = lsh_probe_buckets(query_vec, n_planes, seed, multiprobe_bits)
    cand = bucketed.filter(F.col("_bkt").isin(probes))
    return brute_force_topk(cand.drop("_bkt"), query_vec, k, id_col, vec_col, use_arrow=True)
