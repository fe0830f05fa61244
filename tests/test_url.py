"""URL canonicalization (functions/url.py): rule semantics and
byte-for-byte Spark↔DuckDB parity of the generated oracle CTEs."""

import duckdb

from debezium_server_batch_spark.functions.url import (
    canonicalize_url,
    filter_blocklisted_hosts,
    url_host,
    url_oracle_ctes,
)

HOSTILE = [
    "HTTPS://WWW.Site3.Example.COM:443/path/9?utm_source=f&id=9&fbclid=x&b=2#frag",
    "http://Host.com:80?utm_a=1",  # empty path + all-tracking query
    "http://host.com:8080/p//q?a=1&utm=keepme",  # non-default port; 'utm' (no _) kept
    "https://h.io/",
    "https://h.io",
    "http://h.io/x#a?fake=query-in-fragment",  # fragment first: '?' is fragment text
    "ftp://Files.Example.org:21/pub",  # non-http scheme: port kept, host lowered
    "not a url at all",
    "relative/path?utm_source=x",
    "http://a.b/c?gclid=1&keep=2&msclkid=3&utm_medium=m",
    "",
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame([(u,) for u in HOSTILE], "url string")
    got = {
        r["url"]: (r["canon"], r["host"])
        for r in df.select(
            "url",
            canonicalize_url("url").alias("canon"),
            url_host("url").alias("host"),
        ).collect()
    }
    assert got[HOSTILE[0]] == (
        "https://www.site3.example.com/path/9?id=9&b=2",
        "www.site3.example.com",
    )
    assert got[HOSTILE[1]] == ("http://host.com/", "host.com")
    # non-default port survives in the canonical form, not in host
    assert got[HOSTILE[2]] == ("http://host.com:8080/p//q?a=1&utm=keepme", "host.com")
    assert got["https://h.io/"] == ("https://h.io/", "h.io")
    assert got["https://h.io"] == ("https://h.io/", "h.io")  # rule 5 merges these
    # '?' inside a fragment is NOT a query
    assert got[HOSTILE[5]] == ("http://h.io/x", "h.io")
    assert got[HOSTILE[6]] == ("ftp://files.example.org:21/pub", "files.example.org")
    # non-URLs pass through untouched, host is NULL
    assert got["not a url at all"] == ("not a url at all", None)
    assert got["relative/path?utm_source=x"] == ("relative/path?utm_source=x", None)
    assert got[HOSTILE[9]] == ("http://a.b/c?keep=2", "a.b")
    assert got[""] == ("", None)


def test_filter_blocklisted_hosts(spark):
    """Blocklist matches the CANONICAL host (case/port variants of a
    blocked domain are caught); non-URL rows are kept; the corpus side
    is never shuffled (broadcast left-anti, plan-asserted)."""
    df = spark.createDataFrame(
        [
            (0, "http://bad.com/x"),
            (1, "HTTPS://BAD.com:443/y"),  # variant of the blocked host
            (2, "http://good.org/z"),
            (3, "not a url"),  # no host → kept
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("bad.com",)], "host string")
    out = filter_blocklisted_hosts(df, bl)
    assert {r["doc_id"] for r in out.collect()} == {2, 3}
    assert out.columns == ["doc_id", "url"]  # helper column dropped

    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    # precomputed-host path
    df2 = df.select("doc_id", url_host("url").alias("host"))
    out2 = filter_blocklisted_hosts(df2, bl, host_col="host")
    assert {r["doc_id"] for r in out2.collect()} == {2, 3}


def test_duckdb_parity_byte_for_byte(spark):
    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(HOSTILE)], "i long, url string"
    )
    got = {
        r["i"]: (r["canon_url"], r["host"])
        for r in sdf.select(
            "i",
            canonicalize_url("url").alias("canon_url"),
            url_host("url").alias("host"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(HOSTILE)))
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            f"WITH {url_oracle_ctes('url', 't')} "
            "SELECT i, canon_url, host FROM urlc"
        ).fetchall()
    }
    assert got == want
