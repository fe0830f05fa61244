"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with built-in higher-order functions
(correct, one scan + a top-k sort — `ORDER BY ... LIMIT k` compiles to
TakeOrderedAndProject, no full sort). Scale path: sign-LSH bucketed
search with multi-probe (flip ≤1 bit) that touches only candidate
buckets, plus an Arrow/numpy fast path for the distance math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
