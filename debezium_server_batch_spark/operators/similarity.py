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
    """Arrow UDF: embedding → nearest-centroid index (L2)."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    @F.pandas_udf(T.IntegerType())
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            m = np.stack(s.to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.Series(d.argmin(axis=1).astype("int32"))

    return assign


def ivf_build(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: k-means (Lloyd) over the embeddings, deterministic —
    init from the k smallest ids, assignment via Arrow UDF, centroid
    update as a distributed per-cluster mean. Returns (df + `_cluster`
    column, centroids). At 100 TB the `_cluster` column is written into
    the table and used as a partition/prune key."""
    import numpy as np

    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assign = make_assign_udf(centroids)
        assigned = df.select(F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("_cluster"))
        # elementwise mean per cluster: sum arrays with zip_with, divide by count
        agg = (
            assigned.groupBy("_cluster")
            .agg(
                F.aggregate(
                    F.collect_list(vec_col),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
                ).alias("_sum"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select("_cluster", F.transform("_sum", lambda x: x / F.col("_n")).alias("_mean"))
            .collect()
        )
        new_c = list(centroids)
        for r in agg:
            new_c[r["_cluster"]] = [float(x) for x in r["_mean"]]
        centroids = new_c

    assign = make_assign_udf(centroids)
    out = df.withColumn("_cluster", assign(F.col(vec_col)))
    return out, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 3,
    iters: int = 3,
) -> DataFrame:
    """IVF-style ANN: search only the `nprobe` clusters nearest the
    query, exact re-rank inside them (the classic inverted-file scale
    path; brute_force_topk is the recall oracle)."""
    import numpy as np

    indexed, centroids = ivf_build(df, id_col, vec_col, k=n_clusters, iters=iters)
    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((c - q) ** 2).sum(axis=1))[:nprobe]
    cand = indexed.filter(F.col("_cluster").isin([int(x) for x in order]))
    return brute_force_topk(cand.drop("_cluster"), query_vec, k, id_col, vec_col, use_arrow=True)


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
    At 100 TB the bucket column is precomputed/partitioned-on so the scan
    prunes; here it's computed on the fly."""
    import numpy as np

    dim = len(query_vec)
    bucketer = make_sign_lsh_udf(dim, n_planes, seed)
    bucketed = df.withColumn("_bkt", bucketer(F.col(vec_col)))

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qbits = (np.asarray(query_vec) @ planes) > 0
    qbucket = 0
    for j in range(n_planes):
        qbucket |= int(qbits[j]) << j
    probes = {qbucket}
    if multiprobe_bits >= 1:
        probes.update(qbucket ^ (1 << j) for j in range(n_planes))

    cand = bucketed.filter(F.col("_bkt").isin(list(probes)))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, use_arrow=True)
