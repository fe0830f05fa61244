"""Near-duplicate detection over document text — exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine variants.

All hot-path math is JVM-side Column expressions (higher-order functions
over token/shingle arrays; xxhash64 as the hash family) or Arrow pandas
UDFs — never per-row Python. Candidate generation is always a bucketed
equi-join (band hash / simhash chunk / LSH sign-bucket), never a cross
join, so the plans survive 100× scale-up: the shuffle key is the band
bucket, hot buckets are bounded by band width, and verification joins
only candidate pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import shingles


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<long>) — sig[j] = min over shingles of
    xxhash64(seed_j, shingle). One narrow projection, no shuffle.

    Built as ONE lambda emitting all num_hashes hashes per shingle,
    folded with an elementwise-min zip_with. (Building num_hashes
    separate transform() lambdas inside one expression silently collapses
    them — PySpark lambda-variable collision — so don't "simplify" this
    back to a list comprehension of array_min(transform(...)).)"""
    sh = shingles(F.col(text_col), k=shingle_k)
    max_long = (1 << 63) - 1
    per_shingle = F.transform(
        sh, lambda s: F.array(*[F.xxhash64(F.lit(j), s) for j in range(num_hashes)])
    )
    sig = F.aggregate(
        per_shingle,
        F.array(*[F.lit(max_long).cast("long")] * num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) → candidate
    (a, b) pairs with a < b. The join key is the band bucket — the LSH
    'shingle→minhash→band→bucket-join' scale pattern."""
    num_hashes = None  # derived below from the first row's sig length lazily
    # rows_per_band from the array length at plan time: use expr on size
    sig_len = F.size(F.col("sig"))
    rows_per_band = (sig_len / bands).cast("int")
    banded = sig_df.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b, F.concat_ws(",", F.transform(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")))
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bhash")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bhash") == F.col("b.bhash")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def exact_jaccard(df: DataFrame, id_col: str, text_col: str, shingle_k: int = 5) -> DataFrame:
    """(id, shingle) exploded view for exact Jaccard verification."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles(F.col(text_col), k=shingle_k))).alias("sh"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs: explode distinct shingles,
    equi-join on shingle, count intersections, filter by
    |∩| / (|A|+|B|-|∩|) ≥ threshold. No approximation — the oracle the
    MinHash path is verified against; also SQL-expressible in DuckDB."""
    sh = exact_jaccard(df, id_col, text_col, shingle_k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash pipeline: signatures → banded LSH candidates → exact
    Jaccard verification of candidates only."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_k)
    cands = lsh_candidate_pairs(sig, bands)
    sh = exact_jaccard(df, id_col, text_col, shingle_k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cands.join(a, cands.id_a == F.col("a.id"))
        .join(b, (cands.id_b == F.col("b.id")) & (F.col("a.sh") == F.col("b.sh")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs (id_a, id_b) →
    (id, component) where component = min id in the component.

    Iterative min-label propagation: each round every vertex takes the
    minimum label among itself and its neighbors; converges in
    O(diameter) rounds (dup clusters are near-cliques → 2-3 rounds).
    Each round is one join + one aggregate — no driver-side graph."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("component", F.col("id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonicalize near-dup clusters: every doc mapped to its
    component's minimum id (`canonical_id`); docs in no pair map to
    themselves. Filter `is_canonical` to keep one representative per
    cluster — the end-to-end near-dup removal a training pipeline runs."""
    comp = connected_components(pairs)
    return (
        df.join(comp, df[id_col] == comp.id, "left")
        .select(
            df["*"],
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("canonical_id") == F.col(id_col))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text_col) -> F.Column:
    """64-bit SimHash of whitespace tokens: per bit, majority vote of the
    token-hash bits. One aggregate folds all 64 vote counters at once
    (separate per-bit lambdas in one expression collide — see
    minhash_signature note)."""
    width = 63  # bits 0..62: keeps the packed long non-negative (ANSI-safe)
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(width - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), width),
        lambda acc, h: F.zip_with(
            acc, bit_idx, lambda a, b: a + F.when(F.getbit(h, b) == 1, 1).otherwise(-1)
        ),
    )
    # pack MSB-first: acc*2 + bit — stays < 2^63, no ANSI overflow
    return F.aggregate(
        F.reverse(F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def hamming64(a, b) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: by pigeonhole, two hashes within
    `max_hamming ≤ chunks-1` bits share at least one of `chunks` 16-bit
    chunks — candidates join on (chunk_idx, chunk_value), verified by
    exact Hamming distance."""
    width = 64 // chunks
    h = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    # chunk indices are plain Python ints → unrolled, no lambda needed
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("sh"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                .alias("cval"),
            )
            for c in range(chunks)
        ]
    )
    chunked = h.select("id", "sh", F.explode(chunk_structs).alias("cc")).select(
        "id", "sh", "cc.chunk", "cc.cval"
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (sign-LSH buckets + exact verify)
# ---------------------------------------------------------------------------


def make_sign_lsh_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Arrow UDF: embedding → LSH bucket id from the sign pattern against
    `n_planes` seeded random hyperplanes (deterministic)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(T.LongType())
    def sign_bucket(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            m = np.stack(s.to_numpy())
            bits = (m @ planes) > 0
            out = np.zeros(len(s), dtype=np.int64)
            for j in range(n_planes):
                out |= bits[:, j].astype(np.int64) << j
            yield pd.Series(out)

    return sign_bucket


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs: sign-LSH bucket join for candidates, exact
    cosine (numpy over Arrow batches) to verify. Bucket join keeps the
    candidate set ~n²/2^planes instead of n²."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucketer = make_sign_lsh_udf(dim, n_planes, seed)
    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn("bkt", bucketer("v"))
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.id") < F.col("b.id"))).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("a.v").alias("va"), F.col("b.v").alias("vb")
    )

    @F.pandas_udf(T.DoubleType())
    def pair_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.stack(va.to_numpy()).astype(np.float64)
        mb = np.stack(vb.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return (
        cand.withColumn("cosine", pair_cos("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
