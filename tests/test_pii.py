"""PII redaction (functions/pii.py): per-kind semantics, redaction
ordering, and byte-for-byte Spark↔DuckDB parity of the shared
pattern table."""

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.functions.pii import (
    PII_PATTERNS,
    pii_count,
    pii_count_oracle_sql,
    pii_oracle_sql,
    redact_pii,
)

TRICKY = [
    "plain text with no pii at all",
    "mail me at jane.doe+spam@sub.example.co.uk today",
    "server at 192.168.0.1 and 10.0.0.255, version 1.2 not an ip",
    "ssn 123-45-6789 vs phone 555-867-5309 vs 555.867.5309",
    "user7@1.2.3.4 mixed: the tld-less host is not an email",
    "edge 999.999.999.999 still matches the ipv4 shape rule",
    "two mails a@b.io c@d.org and two ips 1.1.1.1 2.2.2.2",
    "",
]


def test_redaction_semantics(spark):
    rows = spark.createDataFrame([(t,) for t in TRICKY], "text string").select(
        redact_pii("text").alias("clean"),
        pii_count("text", "email").alias("n_email"),
        pii_count("text", "ipv4").alias("n_ip"),
        pii_count("text", "ssn").alias("n_ssn"),
        pii_count("text", "phone").alias("n_phone"),
    ).collect()
    by_clean = {r["clean"]: r for r in rows}
    assert "jane.doe+spam@sub.example.co.uk" not in "".join(by_clean)
    r = [x for x in rows if "<SSN>" in x["clean"]][0]
    # 3-2-4 is SSN, 3-3-4 (dash or dot) is phone — disjoint rules
    assert r["clean"] == "ssn <SSN> vs phone <PHONE> vs <PHONE>"
    assert (r["n_ssn"], r["n_phone"]) == (1, 2)
    r = [x for x in rows if "tld-less" in x["clean"]][0]
    # no TLD → not an email; the address part redacts as an IP
    assert r["clean"].startswith("user7@<IP>")
    assert (r["n_email"], r["n_ip"]) == (0, 1)
    r = [x for x in rows if "two mails" in x["clean"]][0]
    assert (r["n_email"], r["n_ip"]) == (2, 2)
    assert r["clean"] == "two mails <EMAIL> <EMAIL> and two ips <IP> <IP>"


def test_kind_subset_and_canonical_order(spark):
    df = spark.createDataFrame([("a@b.io 1.2.3.4",)], "text string")
    only_ip = df.select(redact_pii("text", kinds=["ipv4"]).alias("c")).first()["c"]
    assert only_ip == "a@b.io <IP>"
    # caller order must not change the applied order (contract)
    r1 = df.select(redact_pii("text", kinds=["ipv4", "email"]).alias("c")).first()["c"]
    r2 = df.select(redact_pii("text", kinds=["email", "ipv4"]).alias("c")).first()["c"]
    assert r1 == r2 == "<EMAIL> <IP>"
    with pytest.raises(ValueError):
        redact_pii("text", kinds=["dna"])


def test_duckdb_parity_byte_for_byte(spark):
    """The whole point of restricting the pattern syntax: DuckDB's RE2
    must reproduce the Java-regex redaction exactly on hostile input."""
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY)], "i long, text string")
    got = {
        r["i"]: (r["clean"], r["n_email"], r["n_ip"], r["n_ssn"], r["n_phone"])
        for r in sdf.select(
            "i",
            redact_pii("text").alias("clean"),
            pii_count("text", "email").alias("n_email"),
            pii_count("text", "ipv4").alias("n_ip"),
            pii_count("text", "ssn").alias("n_ssn"),
            pii_count("text", "phone").alias("n_phone"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(TRICKY)))
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            f"""SELECT i, {pii_oracle_sql('text')},
                       {pii_count_oracle_sql('text', 'email')},
                       {pii_count_oracle_sql('text', 'ipv4')},
                       {pii_count_oracle_sql('text', 'ssn')},
                       {pii_count_oracle_sql('text', 'phone')}
                FROM t"""
        ).fetchall()
    }
    assert got == want


def test_patterns_table_is_closed():
    # replacement tokens must never re-match any rule (fixed point after
    # one pass) — guards future pattern edits
    import re

    for _, token in PII_PATTERNS.values():
        for pattern, _ in PII_PATTERNS.values():
            assert not re.search(pattern, token)
