"""Dataset export: contiguous token-budget sharding, loader manifest
(counts, id ranges, order-independent checksum), physical partitioned
write + read-back integrity."""

import os

from pyspark.sql import functions as F

from debezium_server_batch_spark.functions.text import token_count
from debezium_server_batch_spark.operators.export import (
    assign_shards,
    export_shards,
    shard_manifest,
)


def _docs(spark, n=60):
    # deterministic variable-length docs: doc i has (i % 13) + 1 tokens
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(13))),
                    lambda j: F.concat(F.lit("w"), (F.col("id") * 100 + j).cast("string")),
                ),
            ).alias("text"),
        )
        .withColumn("n_tokens", token_count(F.col("text")))
    )


BUDGET = 25


def test_assign_shards_contiguous_and_bounded(spark):
    a = assign_shards(_docs(spark), shard_tokens=BUDGET).orderBy("doc_id").collect()
    # contiguous: shard ids are non-decreasing in doc order, starting at 0
    ids = [r["shard_id"] for r in a]
    assert ids[0] == 0 and all(b - a_ in (0, 1) for a_, b in zip(ids, ids[1:]))
    # bounded: a doc's START offset lies in its shard, so every shard's
    # token sum minus its LAST doc is under budget (overflow ≤ one doc)
    per = {}
    for r in a:
        per.setdefault(r["shard_id"], []).append(r["n_tokens"])
    for toks in per.values():
        assert sum(toks) - toks[-1] < BUDGET


def test_shard_manifest_partitioning_invariant(spark):
    d = _docs(spark)
    m1 = shard_manifest(d.repartition(1), shard_tokens=BUDGET)
    m7 = shard_manifest(d.repartition(7), shard_tokens=BUDGET)
    r1 = sorted(map(tuple, m1.collect()))
    r7 = sorted(map(tuple, m7.collect()))
    assert r1 == r7 and len(r1) > 3
    # checksum detects any content change
    mutated = d.withColumn(
        "text", F.when(F.col("doc_id") == 7, F.lit("x")).otherwise(F.col("text"))
    )
    rm = sorted(map(tuple, shard_manifest(mutated, shard_tokens=BUDGET).collect()))
    assert rm != r1


def test_export_shards_roundtrip(spark, tmp_path):
    d = _docs(spark)
    out = str(tmp_path / "export")
    manifest = {r["shard_id"]: r for r in export_shards(d, out, shard_tokens=BUDGET).collect()}

    back = spark.read.parquet(os.path.join(out, "data"))
    # every document exactly once
    assert back.count() == 60
    assert back.select("doc_id").distinct().count() == 60
    # per-shard read-back equals the manifest contract
    got = (
        back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .collect()
    )
    assert len(got) == len(manifest)
    for r in got:
        m = manifest[r["shard_id"]]
        assert (r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"]) == (
            m["n_docs"], m["n_tokens"], m["first_id"], m["last_id"],
        )
    # the persisted manifest matches the returned one
    stored = {
        r["shard_id"]: r
        for r in spark.read.parquet(os.path.join(out, "_manifest")).collect()
    }
    assert {k: v["content_checksum"] for k, v in stored.items()} == {
        k: v["content_checksum"] for k, v in manifest.items()
    }
    # one file per shard (repartition-before-partitionBy, not N files)
    shard0_dir = [
        p for p in os.listdir(os.path.join(out, "data")) if p.startswith("shard_id=")
    ][0]
    files = [
        f
        for f in os.listdir(os.path.join(out, "data", shard0_dir))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1


def test_shard_manifest_plan_has_no_corpus_join(spark):
    """with_shard_id keeps all columns, so the manifest must plan ZERO
    corpus-side joins — the only join allowed is the broadcast of the
    O(P) partition offsets from the distributed cumsum."""
    plan = (
        shard_manifest(_docs(spark), shard_tokens=BUDGET)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "rangepartitioning" in plan.lower()  # distributed cumsum engaged


def test_verify_shards_detects_corruption(spark, tmp_path):
    """Loader-side integrity: clean export verifies all-ok; deleting a
    shard's file and doctoring another shard's parquet (drop a row) are
    both caught, each flagged on exactly the right shard."""
    import shutil

    from debezium_server_batch_spark.operators.export import verify_shards

    out = str(tmp_path / "vexport")
    export_shards(_docs(spark), out, shard_tokens=BUDGET)
    v = {r["shard_id"]: r["ok"] for r in verify_shards(spark, out).collect()}
    assert v and all(v.values())

    shard_dirs = sorted(
        d for d in os.listdir(os.path.join(out, "data")) if d.startswith("shard_id=")
    )
    # corruption 1: drop shard 0's directory entirely (missing shard)
    shutil.rmtree(os.path.join(out, "data", shard_dirs[0]))
    # corruption 2: rewrite shard 1 with one document removed
    s1 = os.path.join(out, "data", shard_dirs[1])
    kept = spark.read.parquet(s1)
    first = kept.agg(F.min("doc_id")).collect()[0][0]
    trimmed = kept.filter(F.col("doc_id") != first).toPandas()
    shutil.rmtree(s1)
    spark.createDataFrame(trimmed).coalesce(1).write.parquet(s1)

    bad_ids = {int(shard_dirs[0].split("=")[1]), int(shard_dirs[1].split("=")[1])}
    v2 = {r["shard_id"]: r["ok"] for r in verify_shards(spark, out).collect()}
    assert {sid for sid, ok in v2.items() if not ok} == bad_ids


# ---------------------------------------------------------------------------
# Incremental export: CDC LakeTable -> shard tree


def _doc_table(spark, tmp_path, name="src"):
    from pyspark.sql import types as T

    from debezium_server_batch_spark.plans.laketable import LakeTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("n_tokens", T.LongType(), True),
            T.StructField("__lsn", T.LongType(), True),
            T.StructField("__deleted", T.BooleanType(), True),
        ]
    )
    return (
        LakeTable.create(
            spark, str(tmp_path / name), schema, key_col="doc_id",
            num_buckets=4, order_by=("__lsn",),
        ),
        schema,
    )


def _doc_rows(i0, i1, lsn, prefix="w"):
    rows = []
    for i in range(i0, i1):
        k = (i % 7) + 2
        rows.append((i, " ".join(f"{prefix}{i}_{j}" for j in range(k)), k, lsn, False))
    return rows


def _disk_state(spark, out):
    return sorted(
        (r["doc_id"], r["text"], r["n_tokens"])
        for r in spark.read.parquet(os.path.join(out, "data")).collect()
    )


def _table_state(src):
    return sorted(
        (r["doc_id"], r["text"], r["n_tokens"])
        for r in src.read().select("doc_id", "text", "n_tokens").collect()
    )


def test_export_incremental_end_to_end(spark, tmp_path):
    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")

    # bootstrap: 40 docs
    src.merge(spark.createDataFrame(_doc_rows(0, 40, lsn=1), schema))
    s1 = export_incremental(src, out, shard_tokens=30)
    assert s1["bootstrap"] and s1["docs_upserted"] == 40
    assert _disk_state(spark, out) == _table_state(src)
    v = verify_shards(spark, out).collect()
    assert v and all(r["ok"] for r in v)
    n_shards0 = len(v)

    # no new commits -> noop
    assert export_incremental(src, out, shard_tokens=30)["noop"]

    # tick 2: update doc 5 (longer text), delete doc 12, insert 100..103
    upd = [(5, "updated text with quite a few more tokens", 8, 10, False)]
    dele = [(12, None, None, 11, True)]
    new = _doc_rows(100, 104, lsn=12, prefix="n")
    src.merge(spark.createDataFrame(upd + dele + new, schema))
    s2 = export_incremental(src, out, shard_tokens=30)
    assert not s2["bootstrap"] and not s2["noop"]
    assert s2["docs_deleted"] == 1 and s2["docs_upserted"] == 1 + 4
    assert s2["shards_new"] >= 1
    # only the shards holding docs 5 and 12 were rewritten
    assert 1 <= s2["shards_rewritten"] <= 2
    assert _disk_state(spark, out) == _table_state(src)
    v2 = verify_shards(spark, out).collect()
    assert all(r["ok"] for r in v2) and len(v2) >= n_shards0 + 1

    # crash-redo: lose the state file after the tick -> redo is byte-stable
    before = _disk_state(spark, out)
    os.remove(os.path.join(out, "_export_state.json"))
    s3 = export_incremental(src, out, shard_tokens=30)
    assert s3["bootstrap"]  # no state -> full re-export, always correct
    assert _disk_state(spark, out) == before == _table_state(src)
    assert all(r["ok"] for r in verify_shards(spark, out).collect())


def test_export_incremental_empties_a_shard(spark, tmp_path):
    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 30, lsn=1), schema))
    export_incremental(src, out, shard_tokens=25)
    man = {
        r["shard_id"]: (r["first_id"], r["last_id"])
        for r in spark.read.parquet(os.path.join(out, "_manifest")).collect()
    }
    # delete every doc of the highest shard
    sid, (lo, hi) = max(man.items())
    dels = [(i, None, None, 5, True) for i in range(lo, hi + 1)]
    src.merge(spark.createDataFrame(dels, schema))
    s = export_incremental(src, out, shard_tokens=25)
    assert s["shards_emptied"] == 1
    assert not os.path.exists(os.path.join(out, "data", f"shard_id={sid}"))
    assert _disk_state(spark, out) == _table_state(src)
    res = verify_shards(spark, out).collect()
    assert all(r["ok"] for r in res)
    assert sid not in {r["shard_id"] for r in res}


def test_export_incremental_schema_consistent_no_bookkeeping(spark, tmp_path):
    """The exported width must be identical on the bootstrap and
    incremental paths — payload columns (here `lang`) survive a
    rewrite, CDC bookkeeping (__lsn/__deleted) never reaches disk, and
    touched shards' parquet schema equals untouched shards'."""
    from pyspark.sql import types as T

    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )
    from debezium_server_batch_spark.plans.laketable import LakeTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("n_tokens", T.LongType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("__lsn", T.LongType(), True),
            T.StructField("__deleted", T.BooleanType(), True),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema, key_col="doc_id",
        num_buckets=4, order_by=("__lsn",),
    )
    out = str(tmp_path / "export")

    rows = [
        (i, f"text {i} " + "w " * (i % 5), (i % 5) + 2, "en" if i % 2 else "de", 1, False)
        for i in range(20)
    ]
    src.merge(spark.createDataFrame(rows, schema))
    export_incremental(src, out, shard_tokens=15)

    # incremental tick: update one doc, add one beyond the range
    src.merge(spark.createDataFrame(
        [(3, "updated three", 2, "fr", 9, False),
         (50, "brand new", 2, "en", 9, False)], schema))
    s = export_incremental(src, out, shard_tokens=15)
    assert not s["bootstrap"] and s["shards_rewritten"] >= 1

    back = spark.read.parquet(os.path.join(out, "data"))
    assert sorted(back.columns) == ["doc_id", "lang", "n_tokens", "shard_id", "text"]
    disk = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in back.collect()
    )
    table = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in src.read().select("doc_id", "text", "lang").collect()
    )
    assert disk == table
    assert all(r["ok"] for r in verify_shards(spark, out).collect())


def test_export_incremental_randomized_ticks(spark, tmp_path):
    """Randomized (seeded) CDC tick sequence: each tick applies a mixed
    batch of updates, deletes, re-inserts of previously deleted ids,
    and brand-new docs; after EVERY tick the shard tree must equal the
    table exactly and pass the integrity diff. Catches interaction bugs
    the hand-written scenarios miss (delete-then-reinsert lands back in
    its frozen shard, repeated boundary drift, multi-tick new-shard
    numbering)."""
    import random

    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    rng = random.Random(20260818)
    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")

    alive = {}
    next_id = 60
    # every event gets a DISTINCT increasing lsn (real CDC semantics):
    # with tied order keys the engine's deterministic struct tie-break
    # decides, which a batch-position mental model cannot predict
    lsn_counter = [0]

    def lsn():
        lsn_counter[0] += 1
        return lsn_counter[0]

    def txt(i, tag):
        k = (i % 7) + 2
        return (" ".join(f"{tag}{i}_{j}" for j in range(k)), k)

    rows = []
    for i in range(60):
        text, k = txt(i, "w")
        rows.append((i, text, k, lsn(), False))
        alive[i] = text
    src.merge(spark.createDataFrame(rows, schema))
    assert export_incremental(src, out, shard_tokens=40)["bootstrap"]

    deleted = set()
    for tick in range(4):
        batch = []
        ids = sorted(alive)
        for i in rng.sample(ids, 6):  # updates
            text, k = txt(i, f"t{tick}u")
            batch.append((i, text, k, lsn(), False))
            alive[i] = text
        for i in rng.sample(sorted(alive), 3):  # deletes (may hit an update above)
            batch.append((i, None, None, lsn(), True))
            alive.pop(i, None)
            deleted.add(i)
        if deleted and tick >= 2:  # re-insert a previously deleted id
            i = sorted(deleted)[0]
            deleted.discard(i)
            text, k = txt(i, f"t{tick}r")
            batch.append((i, text, k, lsn(), False))
            alive[i] = text
        for _ in range(4):  # brand-new ids beyond the exported range
            text, k = txt(next_id, f"t{tick}n")
            batch.append((next_id, text, k, lsn(), False))
            alive[next_id] = text
            next_id += 1
        src.merge(spark.createDataFrame(batch, schema))

        s = export_incremental(src, out, shard_tokens=40)
        assert not s["bootstrap"] and not s["noop"], (tick, s)
        disk = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(os.path.join(out, "data")).collect()
        }
        assert disk == alive, f"tick {tick}: disk diverged from table"
        assert all(r["ok"] for r in verify_shards(spark, out).collect()), tick


def test_read_id_range_prunes_shards(spark, tmp_path):
    """The manifest-driven range read returns exactly the requested ids
    and its plan scans only the shard directories whose manifest range
    intersects the predicate."""
    from debezium_server_batch_spark.operators.export import read_id_range

    out = str(tmp_path / "export")
    export_shards(_docs(spark), out, shard_tokens=BUDGET)
    man = spark.read.parquet(os.path.join(out, "_manifest")).collect()
    # pick a range inside the second shard
    second = sorted(man, key=lambda r: r["shard_id"])[1]
    lo, hi = second["first_id"], second["last_id"]

    df = read_id_range(spark, out, lo=lo, hi=hi)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(lo, hi + 1))
    # partition pruning: the scan must touch exactly one shard dir
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"partitions read[:\s]*(\d+)", plan, re.IGNORECASE)
    if m:
        assert int(m.group(1)) == 1, plan
    # whole-tree read (no bounds) returns everything
    assert read_id_range(spark, out).count() == 60
    # empty intersection
    assert read_id_range(spark, out, lo=10_000).count() == 0


def test_shard_manifest_stratified(spark):
    """Per-stratum sharding: shard ids restart at 0 within each stratum,
    boundaries respect the per-stratum cumsum, and the union of per-
    stratum manifests covers every document exactly once."""
    d = _docs(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    m = shard_manifest(d, shard_tokens=BUDGET, stratum_col="lang").collect()
    by_stratum = {}
    for r in m:
        by_stratum.setdefault(r["lang"], []).append(r)
    assert set(by_stratum) == {"en", "de"}
    total_docs = 0
    for lang, rows in by_stratum.items():
        rows.sort(key=lambda r: r["shard_id"])
        assert rows[0]["shard_id"] == 0
        assert [r["shard_id"] for r in rows] == list(range(len(rows)))
        # id ranges within a stratum are disjoint and ordered
        for a, b in zip(rows, rows[1:]):
            assert a["last_id"] < b["first_id"]
        total_docs += sum(r["n_docs"] for r in rows)
    assert total_docs == 60


def test_export_incremental_schema_evolution_forces_full(spark, tmp_path):
    """An upstream column add between ticks must NOT fork the shard
    tree's parquet schema: the tick detects the changed export width,
    falls back to a full re-export (flagged schema_changed), and the
    whole tree carries the new column afterwards."""
    from pyspark.sql import types as T

    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 30, lsn=1), schema))
    export_incremental(src, out, shard_tokens=25)

    evolved = T.StructType(list(schema.fields) + [T.StructField("lang", T.StringType(), True)])
    src.merge(spark.createDataFrame(
        [(5, "updated five", 2, 9, False, "en")], evolved))
    s = export_incremental(src, out, shard_tokens=25)
    assert s.get("schema_changed") and s["bootstrap"]
    back = spark.read.parquet(os.path.join(out, "data"))
    assert "lang" in back.columns
    langs = {r["doc_id"]: r["lang"] for r in back.collect()}
    assert langs[5] == "en" and langs[6] is None and len(langs) == 30
    assert all(r["ok"] for r in verify_shards(spark, out).collect())


def test_export_incremental_version_pinning(spark, tmp_path):
    """Reproducible dataset builds: pin the sync to a table snapshot
    (tree == table@vN while the table is already ahead), advance
    incrementally to the head afterwards, refuse backward syncs unless
    force_full rebuilds at the older snapshot."""
    import pytest as _pytest

    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 20, lsn=1), schema))      # v1
    v1 = src.current_version()
    src.merge(spark.createDataFrame(_doc_rows(20, 30, lsn=2), schema))     # v2

    s1 = export_incremental(src, out, shard_tokens=25, to_version=v1)
    assert s1["bootstrap"] and s1["src_version"] == v1
    disk = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "data")).collect()}
    assert disk == set(range(20))  # exactly the v1 state, not the head

    s2 = export_incremental(src, out, shard_tokens=25)  # unpinned: advance to head
    assert not s2["bootstrap"] and s2["docs_upserted"] == 10
    assert _disk_state(spark, out) == _table_state(src)
    assert all(r["ok"] for r in verify_shards(spark, out).collect())

    with _pytest.raises(ValueError, match="backward"):
        export_incremental(src, out, shard_tokens=25, to_version=v1)
    s3 = export_incremental(src, out, shard_tokens=25, to_version=v1, force_full=True)
    assert s3["bootstrap"] and s3["src_version"] == v1
    disk = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "data")).collect()}
    assert disk == set(range(20))
    with _pytest.raises(ValueError, match="beyond"):
        export_incremental(src, out, to_version=99)


def test_export_incremental_respects_wap_gate(spark, tmp_path):
    """Staged (write-audit-publish) commits must NOT leak into the shard
    tree: before publish the export sees only the published floor
    (noop after the bootstrap), after publish one tick lands the
    audited rows."""
    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 15, lsn=1), schema))
    export_incremental(src, out, shard_tokens=25)

    stage = src.staging()
    stage.merge(spark.createDataFrame(_doc_rows(15, 25, lsn=2), schema))
    s = export_incremental(src, out, shard_tokens=25)
    assert s["noop"], "staged commits leaked into the export"
    disk = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "data")).collect()}
    assert disk == set(range(15))

    src.publish()
    s2 = export_incremental(src, out, shard_tokens=25)
    assert not s2["noop"] and s2["docs_upserted"] == 10
    assert _disk_state(spark, out) == _table_state(src)
    assert all(r["ok"] for r in verify_shards(spark, out).collect())


def test_export_incremental_recovers_from_upstream_rollback(spark, tmp_path):
    """Bad-batch recovery upstream: the table rolls back BELOW the
    export's consumed version and re-appends clean data. The tick
    cannot replay that incrementally (its consumed rows were undone) —
    it must fall back to a full re-export and land exactly at the
    recovered table state, poison rows absent."""
    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 15, lsn=1), schema))
    good_v = src.current_version()
    # poison batch lands AND gets exported (the bad deploy)
    poison = [(i, "POISON", 1, 2, False) for i in range(15, 20)]
    src.merge(spark.createDataFrame(poison, schema))
    export_incremental(src, out, shard_tokens=25)
    disk = {r["text"] for r in spark.read.parquet(os.path.join(out, "data")).collect()}
    assert "POISON" in disk

    # operator rolls the table back below the consumed version, re-appends clean
    src.rollback(good_v)
    src.merge(spark.createDataFrame(_doc_rows(15, 20, lsn=3, prefix="clean"), schema))
    s = export_incremental(src, out, shard_tokens=25)
    assert s["bootstrap"], "rollback below the consumed version must force a full re-export"
    assert _disk_state(spark, out) == _table_state(src)
    disk = {r["text"] for r in spark.read.parquet(os.path.join(out, "data")).collect()}
    assert not any(t == "POISON" for t in disk)
    assert all(r["ok"] for r in verify_shards(spark, out).collect())


def test_export_incremental_recovers_from_vacuum_horizon(spark, tmp_path):
    """The export was down while the table vacuumed past its consumed
    version (the wall every incremental consumer hits): changes() can
    no longer be planned from the expired snapshot, so the tick must
    re-bootstrap from the current state — correct, just O(table) once."""
    from debezium_server_batch_spark.operators.export import (
        export_incremental,
        verify_shards,
    )

    src, schema = _doc_table(spark, tmp_path)
    out = str(tmp_path / "export")
    src.merge(spark.createDataFrame(_doc_rows(0, 10, lsn=1), schema))
    export_incremental(src, out, shard_tokens=25)

    # many commits + compaction + aggressive vacuum expire the consumed version
    for k in range(4):
        src.merge(spark.createDataFrame(_doc_rows(10 + 5 * k, 15 + 5 * k, lsn=2 + k), schema))
    src.compact()
    src.vacuum(keep_last=1)

    s = export_incremental(src, out, shard_tokens=25)
    assert _disk_state(spark, out) == _table_state(src)
    assert all(r["ok"] for r in verify_shards(spark, out).collect())
    assert s["bootstrap"], "expired horizon must re-bootstrap, not partially sync"
