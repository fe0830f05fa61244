"""Vector math over embedding columns (array<float>) — built-in higher-order
functions for correctness baselines, Arrow pandas UDFs for the fast path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product via zip_with + aggregate (no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def make_cosine_to_query_udf(query_vec: list[float]):
    """Arrow-vectorized cosine against a fixed query vector.

    numpy matmul over whole Arrow batches — the scale path for brute-force
    ANN when the built-in expression above is the bottleneck."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @F.pandas_udf(T.DoubleType())
    def cos_to_query(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batch_iter:
            m = np.stack(s.to_numpy()).astype(np.float64)  # (rows, dim)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            yield pd.Series(sims)

    return cos_to_query
