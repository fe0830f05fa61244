"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() in DuckDB at a
given sf, compare row count + sorted-column value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda row: tuple((v is None, "" if v is None else v) for v in row),
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _arrow_rows(tbl):
    """Arrow table -> list of row tuples, PRESERVING fetch-level types.

    The driver fetches both sides via arrow, so a DuckDB HUGEINT column
    (uncast integer sum) arrives as decimal128(38,0) and hash-mismatches a
    Spark int64 even when values are numerically equal.  fetchall() would
    mask that (HUGEINT -> Python int), which is why this replica must go
    through arrow (VERDICT r2 "What's wrong" #1).
    """
    cols = [c.to_pylist() for c in tbl.columns]
    return [tuple(c[i] for c in cols) for i in range(tbl.num_rows)]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from debezium_server_batch_spark.session import build_session
    import __spark_entry__ as em

    spark = build_session(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = em.oracle_sql()
    failures = 0
    for name, fn in em.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows")
            continue
        tbl = con.execute(oracles[name]).arrow()
        ocols = list(tbl.column_names)
        orows = _arrow_rows(tbl)
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = ok_n and ok_c and value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK " if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{name:24s} {status} rows {len(srows)}/{len(orows)} cols={ok_c} hash={ok_h}")
        if status == "FAIL":
            failures += 1
            if not ok_c:
                print(f"    spark cols: {sorted(scols)}\n    duckdb cols: {sorted(ocols)}")
            elif ok_n:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted(tuple(_norm(r[i]) for i in order) for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted(tuple(_norm(r[i]) for i in oorder) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark  {a}\n    duckdb {b}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
