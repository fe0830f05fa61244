"""Crawl-corpus maintenance operators (operators/crawl.py): latest
fetch per canonical url, per-host rollups, incremental admission dedup.
"""

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.crawl import (
    host_stats,
    incremental_dedup,
    latest_fetch,
)

FETCHES = [
    # three raw variants of ONE page — case/port/tracking differ, all
    # canonicalize to https://a.com/p?id=1
    (1, "HTTPS://A.com:443/p?id=1", 100, 10),
    (2, "https://a.com/p?id=1&utm_source=x", 300, 11),
    (3, "https://A.COM/p?id=1#frag", 200, 12),
    # a second page on the same host
    (4, "https://a.com/q", 50, 13),
    # a different host
    (5, "http://b.org/", 400, 14),
    # a non-URL row (canon pass-through, host NULL)
    (6, "not a url", 999, 15),
]
SCHEMA = "fetch_id long, url string, warc_ts long, n_chars long"


def test_latest_fetch_collapses_canonical_variants(spark):
    log = spark.createDataFrame(FETCHES, SCHEMA)
    out = latest_fetch(log, ts_col="warc_ts", tiebreak=("fetch_id",))
    rows = {r["canon_url"]: r for r in out.collect()}
    assert set(rows) == {
        "https://a.com/p?id=1",
        "https://a.com/q",
        "http://b.org/",
        "not a url",
    }
    page = rows["https://a.com/p?id=1"]
    assert page["fetch_id"] == 2  # newest warc_ts=300 wins
    assert page["n_fetches"] == 3
    assert page["first_warc_ts"] == 100
    assert page["warc_ts"] == 300
    assert page["host"] == "a.com"
    assert rows["not a url"]["host"] is None
    # winner carries its own full row, not a mix
    assert page["n_chars"] == 11


def test_latest_fetch_ties_break_deterministically(spark):
    log = spark.createDataFrame(
        [(1, "https://a.com/", 100, 0), (2, "https://a.com/", 100, 0)], SCHEMA
    )
    out = latest_fetch(log, ts_col="warc_ts", tiebreak=("fetch_id",))
    assert [r["fetch_id"] for r in out.collect()] == [2]


def test_latest_fetch_single_shuffle(spark):
    """Winner + count + min(ts) come out of ONE hash aggregate: the
    plan has exactly one Exchange with map-side partial aggregation."""
    log = spark.createDataFrame(FETCHES, SCHEMA)
    out = latest_fetch(log, ts_col="warc_ts", tiebreak=("fetch_id",))
    out.collect()
    # AQE's toString repeats the plan under "== Initial Plan ==" —
    # count only the final plan section
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "partial_" in final  # map-side combine before the exchange


def test_host_stats_rollup_excludes_non_urls(spark):
    log = spark.createDataFrame(FETCHES, SCHEMA)
    collapsed = latest_fetch(log, ts_col="warc_ts", tiebreak=("fetch_id",))
    out = host_stats(collapsed, ts_col="warc_ts", size_col="n_chars")
    rows = {r["host"]: r for r in out.collect()}
    assert set(rows) == {"a.com", "b.org"}  # NULL-host row excluded
    a = rows["a.com"]
    assert a["n_pages"] == 2
    assert a["n_fetches"] == 4  # 3 variant fetches + 1 for /q
    assert a["first_warc_ts"] == 50
    assert a["last_warc_ts"] == 300
    assert a["total_n_chars"] == 11 + 13


def test_incremental_dedup_admission(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),  # unchanged re-fetch → dropped
            (11, "gamma"),  # new content → admitted
            (12, None),  # NULL never matches (even corpus NULL) → admitted
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(new, corpus, cols=("text",), broadcast_corpus=True)
    assert {r["doc_id"] for r in out.collect()} == {11, 12}
    assert out.columns == ["doc_id", "text"]  # fingerprint col dropped

    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_incremental_dedup_multi_column_separator(spark):
    """("ab","c") must not fingerprint-collide with ("a","bc")."""
    corpus = spark.createDataFrame([("ab", "c")], "t1 string, t2 string")
    new = spark.createDataFrame(
        [("a", "bc"), ("ab", "c")], "t1 string, t2 string"
    )
    out = incremental_dedup(new, corpus, cols=("t1", "t2"))
    assert [(r["t1"], r["t2"]) for r in out.collect()] == [("a", "bc")]


def test_incremental_dedup_shuffle_path(spark):
    """Without broadcast, the corpus collapses to DISTINCT fingerprints
    before the anti-join (narrow shuffle, not full rows)."""
    corpus = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(30)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, "t0"), (101, "t99")], "doc_id long, text string"
    )
    out = incremental_dedup(new, corpus, cols=("text",))
    assert {r["doc_id"] for r in out.collect()} == {101}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "partial_" in plan or "HashAggregate" in plan  # distinct pre-join


def test_cap_per_host_semantics_and_plan(spark):
    """Domain capping: top-cap per host by order DESC with id tiebreak,
    NULL hosts uncapped; Spark >=3.5 must plan the rank filter as
    WindowGroupLimit (map-side top-k pruning before the exchange)."""
    from debezium_server_batch_spark.operators.crawl import cap_per_host

    rows = [(i, "big.com", 100 - i) for i in range(10)]  # quality desc by id
    rows += [(20, "small.org", 5), (21, "small.org", 9)]
    rows += [(30, None, 1), (31, None, 2)]  # no host → uncapped
    df = spark.createDataFrame(rows, "doc_id long, host string, quality long")
    out = cap_per_host(df, cap=3, order_by=("quality",), id_col="doc_id")
    got = {r["doc_id"] for r in out.collect()}
    # big.com: quality 100,99,98 → docs 0,1,2; small.org under cap; nulls pass
    assert got == {0, 1, 2, 20, 21, 30, 31}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    # tie-break determinism: equal quality → lowest doc_id wins
    ties = spark.createDataFrame(
        [(i, "h.com", 7) for i in range(6)], "doc_id long, host string, quality long"
    )
    kept = {r["doc_id"] for r in cap_per_host(ties, 2, order_by=("quality",)).collect()}
    assert kept == {0, 1}


def test_link_rank_hand_computed_triangle(spark):
    """3-cycle a→b→c→a plus a dangling-in node: every node has outdeg 1,
    so rank_{t+1}(v) = 0.15 + 0.85 * rank_t(pred). On the symmetric
    cycle every iterate stays equal across a,b,c and converges toward
    1.0; node d (in-edge only from nowhere, out-edge to a) keeps rank
    0.15 after iteration 1 and stays there."""
    from debezium_server_batch_spark.operators.crawl import link_rank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    got = {r["id"]: r["rank"] for r in link_rank(edges, iterations=3).collect()}
    # hand-rolled: r0 = 1 everywhere
    r = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    for _ in range(3):
        r = {
            "a": 0.15 + 0.85 * (r["c"] + r["d"]),
            "b": 0.15 + 0.85 * r["a"],
            "c": 0.15 + 0.85 * r["b"],
            "d": 0.15,  # no in-edges
        }
    for k in r:
        assert got[k] == pytest.approx(r[k], abs=1e-9), k
    # the in-link pulse from a's 2 in-edges has traveled a→b→c by
    # iteration 3 (fixed-iteration semantics, not the fixpoint); the
    # no-in-edge node is always the floor
    assert got["c"] == max(got.values()) and got["d"] == min(got.values())


def test_link_rank_deterministic_across_partitionings(spark):
    """Decimal-summed contributions make the ranks bit-identical no
    matter how the edges are partitioned (the cross-engine-parity
    property the oracle relies on)."""
    from debezium_server_batch_spark.operators.crawl import link_rank

    n = 200
    rows = [(i, (i * 7 + k * 13 + 1) % n) for i in range(n) for k in (1, 2, 3)]
    rows = [r for r in rows if r[0] != r[1]]
    e1 = spark.createDataFrame(rows, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(list(reversed(rows)), ["src", "dst"]).repartition(17, "dst")
    r1 = sorted(map(tuple, link_rank(e1).collect()))
    r2 = sorted(map(tuple, link_rank(e2).collect()))
    assert r1 == r2  # bit-identical, not approx
