"""Fuzzy dedup: MinHash-LSH vs exact Jaccard, SimHash, embedding LSH."""

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.dedup_fuzzy import (
    embedding_near_dupes,
    minhash_near_dupes,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_near_dupes,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly "
    "on the green hills and the river runs through the quiet valley at dawn"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("quiet", "silent")),  # near dup of 0
        (3, "completely different content about stock markets and prices going up"),
        (4, "another unrelated document mentioning sports results and team scores"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_signature_shape_and_determinism(docs):
    sig = minhash_signature(docs, num_hashes=32)
    rows = {r["id"]: r["sig"] for r in sig.collect()}
    assert all(len(s) == 32 for s in rows.values())
    assert rows[0] == rows[1]  # identical text → identical signature
    agree = sum(1 for a, b in zip(rows[0], rows[2]) if a == b) / 32
    assert agree > 0.5  # near dup → high signature agreement


def test_minhash_finds_near_dupes_and_skips_unrelated(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dupes(docs, num_hashes=32, bands=8, threshold=0.5).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert not any({a, b} & {3, 4} and {a, b} & {0, 1, 2} for a, b in pairs)


def test_ngram_jaccard_is_exact_oracle(docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, shingle_k=5, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dupes(docs, num_hashes=64, bands=16, shingle_k=5, threshold=0.5).collect()
    }
    assert set(exact) == approx  # verified MinHash == exact at this scale
    assert exact[(0, 1)] == 1.0


def test_simhash_near_dupes(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dupes(docs, max_hamming=6).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs
    assert not any({a, b} == {3, 4} for a, b in pairs)


def test_connected_components_and_canonical(spark, docs):
    from debezium_server_batch_spark.operators.dedup_fuzzy import (
        connected_components,
        dedup_clusters,
    )

    # pairs: {0,1,2} form one cluster via (0,1) and (1,2); 3,4 are loners
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0}
    out = dedup_clusters(docs, pairs)
    rows = {r["doc_id"]: (r["canonical_id"], r["is_canonical"]) for r in out.collect()}
    assert rows[0] == (0, True) and rows[1] == (0, False) and rows[2] == (0, False)
    assert rows[3] == (3, True) and rows[4] == (4, True)
    kept = out.filter("is_canonical").count()
    assert kept == 3  # one survivor per cluster + the two loners


def test_connected_components_chain(spark):
    from debezium_server_batch_spark.operators.dedup_fuzzy import connected_components

    # long chain exercises multi-round propagation
    pairs = spark.createDataFrame([(i, i + 1) for i in range(6)], "id_a long, id_b long")
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0} and len(comp) == 7


def test_embedding_near_dupes(spark):
    base = [1.0, 0.5, -0.3, 0.8] * 4
    near = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    ortho = [1.0, -1.0] * 8
    df = spark.createDataFrame(
        [(0, base), (1, list(base)), (2, near), (3, ortho)], "vec_id long, embedding array<float>"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dupes(df, threshold=0.99, n_planes=4).collect()
    }
    assert pairs.get((0, 1)) == pytest.approx(1.0)
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)
