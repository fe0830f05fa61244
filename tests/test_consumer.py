"""North-star consumer tests (BASELINE.json): upsert, delete-tombstone,
schema-change, restart-resume — pytest assertions on LakeTable snapshots
after replaying a deterministic synthetic event log, verified against an
independent DuckDB oracle that computes LWW final state straight from the
raw envelope JSON (no shared engine code)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.functions.text import extract_text
from debezium_server_batch_spark.plans.laketable import LakeTable
from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig

N_PAGES = 120
N_HOT = 2
HOT_K = 12


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cdc") / "log")
    write_event_log(
        generate_event_log(spark, n_pages=N_PAGES, n_hot=N_HOT, hot_k=HOT_K, seed=42), p, n_files=4
    )
    return p


def _cfg(log_path, root, **kw):
    return PipelineConfig(
        log_path=log_path, table_root=root, batch_window=kw.pop("batch_window", 400),
        num_buckets=8, **kw
    )


@pytest.fixture(scope="module")
def replayed(spark, log_path, tmp_path_factory):
    """One full replay — shared by the assertion tests below."""
    root = str(tmp_path_factory.mktemp("cdc") / "pages")
    # lineage_per_bucket is an opt-in diagnostic (default off on the hot
    # path) — enabled here so its output shape stays covered
    stats = CdcPipeline(spark, _cfg(log_path, root, lineage_per_bucket=True)).run()
    return root, stats


def oracle_final_state(log_path: str):
    """Independent LWW oracle in DuckDB over the raw envelope JSON."""
    con = duckdb.connect()
    return con.execute(
        f"""
        WITH parsed AS (
          SELECT
            json_extract_string(value, '$.payload.url')   AS url,
            CAST(json_extract(value, '$.payload.__lsn') AS BIGINT) AS lsn,
            json_extract_string(value, '$.payload.__deleted') AS deleted,
            json_extract_string(value, '$.payload.text')  AS text,
            json_extract_string(value, '$.payload.lang')  AS lang,
            json_extract_string(value, '$.payload.title') AS title,
            CAST(json_extract(value, '$.payload.warc_ts_ms') AS BIGINT) AS warc_ts_ms
          FROM read_parquet('{log_path}/*.parquet')
          WHERE value IS NOT NULL
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY lsn DESC) AS rn
          FROM parsed
        )
        SELECT url, lsn, text, lang, title, warc_ts_ms
        FROM ranked WHERE rn = 1 AND deleted = 'false'
        ORDER BY url
        """
    ).fetchall()


def spark_final_state(spark, root):
    t = LakeTable.load(spark, root)
    return [
        tuple(r)
        for r in t.read()
        .select("url", "__lsn", "text", "lang", "title", (F.unix_millis(F.col("warc_ts"))).alias("ms"))
        .orderBy("url")
        .collect()
    ]


# ---------------------------------------------------------------------------


def test_upsert(spark, log_path, replayed):
    """Final table state == oracle LWW state, exactly (north_star test 1)."""
    root, stats = replayed
    expected = oracle_final_state(log_path)
    actual = spark_final_state(spark, root)
    assert len(actual) == len(expected) > 0
    assert actual == expected
    assert stats.events > 0 and stats.batches > 1
    # hot url carries its last revision
    hot = [r for r in actual if r[0].endswith("/page/0")]
    assert hot and hot[0][2].endswith(f"rev{HOT_K - 1}")


def test_delete_tombstone(spark, log_path, replayed):
    """Pages whose last event is a delete are absent; delete+re-insert
    pages survive with the re-inserted revision (north_star test 2)."""
    root, _ = replayed
    con = duckdb.connect()
    last_ops = con.execute(
        f"""
        WITH parsed AS (
          SELECT json_extract_string(value, '$.payload.url') AS url,
                 CAST(json_extract(value, '$.payload.__lsn') AS BIGINT) AS lsn,
                 json_extract_string(value, '$.payload.__op') AS op
          FROM read_parquet('{log_path}/*.parquet')
        )
        SELECT url, arg_max(op, lsn) AS last_op, count(*) FILTER (op = 'd') AS n_deletes
        FROM parsed GROUP BY url
        """
    ).fetchall()
    dropped = {u for u, op, _ in last_ops if op == "d"}
    reinserted = {u for u, op, nd in last_ops if op != "d" and nd > 0}
    assert dropped and reinserted, "generator must cover both scenarios"
    live = {r["url"] for r in LakeTable.load(spark, root).read().select("url").collect()}
    assert not dropped & live
    assert reinserted <= live


def test_schema_change(spark, log_path, tmp_path):
    """Replaying only the pre-evolution prefix yields a table without
    `title`; resuming through the evolution adds the column, null for
    rows last updated before it (north_star test 3)."""
    root = str(tmp_path / "pages")
    # revs 0..1 live at offsets < 2*N_PAGES (offset = rev*N_PAGES + page)
    pipe = CdcPipeline(spark, _cfg(log_path, root, batch_window=2 * N_PAGES))
    pipe.run(max_batches=1)
    t = LakeTable.load(spark, root)
    assert "title" not in [f.name for f in t.schema().fields]
    pipe.run()  # consume the rest, crossing the schema epoch
    t = LakeTable.load(spark, root)
    cols = [f.name for f in t.schema().fields]
    assert "title" in cols
    df = t.read()
    assert df.filter(F.col("title").isNotNull()).count() > 0
    # schema catalog kept both versions; files of both epochs still readable
    snap = t.snapshot()
    assert len(snap["schemas"]) >= 2


def test_restart_resume(spark, log_path, replayed, tmp_path):
    """Kill after 2 micro-batches; a fresh pipeline resumes from the
    checkpoint and converges to the one-shot state (north_star test 4)."""
    full_root, _ = replayed
    root = str(tmp_path / "pages")
    first = CdcPipeline(spark, _cfg(log_path, root))
    first.run(max_batches=2)  # "crash" here
    ckpt = LakeTable.load(spark, root).checkpoint()
    assert ckpt is not None and ckpt["batch_id"] == 1
    resumed = CdcPipeline(spark, _cfg(log_path, root))  # fresh instance
    stats = resumed.run()
    assert stats.batches > 0
    assert spark_final_state(spark, root) == spark_final_state(spark, full_root)


def test_two_writers_disjoint_ranges_one_table(spark, log_path, replayed, tmp_path):
    """Two pipelines with distinct writer_ids replay disjoint halves of
    the offset range into ONE table, with interleaved partial runs and a
    restart — per-writer checkpoint slots must not collide, and the
    final state must equal the single-writer replay exactly."""
    from debezium_server_batch_spark.sources.event_log import EventLogSource

    full_root, _ = replayed
    root = str(tmp_path / "pages")
    mid = EventLogSource(spark, log_path).max_offset() // 2

    cfg_a = _cfg(log_path, root, writer_id="wA", replay_until=mid)
    cfg_b = _cfg(log_path, root, writer_id="wB", replay_from=mid + 1)

    # interleave: A partial → B partial → A drain → B drain → restarts
    CdcPipeline(spark, cfg_a).run(max_batches=1)
    CdcPipeline(spark, cfg_b).run(max_batches=1)
    t = LakeTable.load(spark, root)
    ck_a, ck_b = t.checkpoint("wA"), t.checkpoint("wB")
    assert ck_a is not None and ck_b is not None
    assert ck_a["offset_hi"] <= mid < ck_b["offset_hi"]  # independent slots
    CdcPipeline(spark, cfg_a).run()
    CdcPipeline(spark, cfg_b).run()
    # both writers drained their slices: further runs are no-ops
    assert CdcPipeline(spark, cfg_a).run().batches == 0
    assert CdcPipeline(spark, cfg_b).run().batches == 0
    t = LakeTable.load(spark, root)
    assert t.checkpoint("wA")["offset_hi"] == mid
    assert spark_final_state(spark, root) == spark_final_state(spark, full_root)


def test_auto_compact_triggers_from_observed_state(spark, log_path, replayed, tmp_path):
    """auto_compact folds when OUTSTANDING deltas cross the threshold —
    no compact_every hand-tuning. With a tiny threshold folds must
    happen during the replay, the end state must equal the uncompacted
    replay exactly, and the table must end within the threshold's
    delta envelope."""
    full_root, _ = replayed
    root = str(tmp_path / "pages")
    cfg = _cfg(log_path, root, auto_compact=True, auto_compact_min_deltas=2)
    CdcPipeline(spark, cfg).run()
    t = LakeTable.load(spark, root)
    folds = [s for s in t.history() if (s.get("summary") or {}).get("operation") == "compact-deltas"]
    assert folds  # the observed-state trigger actually fired mid-replay
    # ends within the policy envelope: fewer outstanding deltas than the
    # threshold + one window's worth
    assert t.outstanding_delta_files() <= 2 + 4
    assert spark_final_state(spark, root) == spark_final_state(spark, full_root)


def test_exactly_once_suffix_replay(spark, log_path, replayed):
    """Rewind the checkpoint (simulating at-least-once redelivery of the
    last windows) — replay must not change the table state."""
    root, _ = replayed
    t = LakeTable.load(spark, root)
    before = spark_final_state(spark, root)
    ck = dict(t.snapshot()["checkpoint"])
    ck["offset_hi"] = max(ck["offset_hi"] - 800, 0)  # rewind two windows
    t.commit_checkpoint(ck)
    CdcPipeline(spark, _cfg(log_path, root)).run()
    assert spark_final_state(spark, root) == before


def test_text_byte_identical(spark, replayed):
    """input_hint invariant: extract_text(html) == text, byte for byte,
    for every live row."""
    root, _ = replayed
    df = LakeTable.load(spark, root).read()
    mismatches = df.filter(extract_text(F.col("html")) != F.col("text")).count()
    assert mismatches == 0
    assert df.filter(F.col("html").isNull()).count() == 0


def _run_multi_destination(spark, tmp_path, storage=None):
    import json as _json

    def ev(offset, dest, op, key, lsn, val):
        payload = {"url": key, "text": val, "__op": op, "__lsn": lsn,
                   "__source_ts_ms": 1704067200000 + lsn,
                   "__deleted": "true" if op == "d" else "false"}
        schema = {"type": "struct", "fields": [
            {"type": "string", "field": "url", "optional": False},
            {"type": "string", "field": "text", "optional": True},
            {"type": "string", "field": "__op", "optional": True},
            {"type": "int64", "field": "__lsn", "optional": True},
            {"type": "int64", "field": "__source_ts_ms", "optional": True},
            {"type": "string", "field": "__deleted", "optional": True}]}
        return (offset, dest, None, _json.dumps({"schema": schema, "payload": payload}))

    rows = [
        ev(0, "testc.db.users", "c", "u1", 0, "a"),
        ev(1, "testc.db.orders", "c", "o1", 1, "x"),
        ev(2, "testc.db.users", "u", "u1", 2, "b"),
        ev(3, "testc.db.orders", "d", "o1", 3, None),
        ev(4, "testc.db.users", "c", "u2", 4, "c"),
    ]
    log = str(tmp_path / "log")
    spark.createDataFrame(rows, "offset long, destination string, key string, value string") \
        .write.parquet(log)
    cfg = PipelineConfig(
        log_path=log, table_root=str(tmp_path / "tables"), batch_window=3,
        num_buckets=2, table_per_destination=True,
        destination_regexp=r"^testc\.db\.", destination_replacement="",
        storage=storage,
    )
    CdcPipeline(spark, cfg).run()
    users = LakeTable.load(spark, str(tmp_path / "tables" / "users"), storage=storage)
    orders = LakeTable.load(spark, str(tmp_path / "tables" / "orders"), storage=storage)
    u = {r["url"]: r["text"] for r in users.read().collect()}
    assert u == {"u1": "b", "u2": "c"}
    assert orders.read().count() == 0  # o1 deleted
    # both tables checkpointed to the log end; resume is a no-op
    assert users.checkpoint()["offset_hi"] == 4
    assert orders.checkpoint()["offset_hi"] == 4
    assert CdcPipeline(spark, cfg).run().batches == 0


def test_multi_destination_routing(spark, tmp_path):
    """Reference G1/P5: events route to one table per topic, with
    destination-name rewrite; checkpoint resume = min over tables."""
    _run_multi_destination(spark, tmp_path)


def test_multi_destination_discovery_object_store(spark, tmp_path):
    """The same multi-table routing + min-checkpoint resume with ALL
    destination discovery and commit I/O through ConditionalPutStorage —
    the runner no longer touches raw os.listdir (r3 verdict wrong #3)."""
    from debezium_server_batch_spark.plans.storage import ConditionalPutStorage

    _run_multi_destination(spark, tmp_path, storage=ConditionalPutStorage())


def test_drained_writer_skips_foreign_destination_tables(spark, tmp_path):
    """A sliced writer whose slice is drained must restart as a NO-OP
    even after ANOTHER writer created a destination table this writer
    never touched: the resume floor skips tables with no slot for this
    writer instead of flooring them to -1, which would re-replay the
    whole slice on every restart (r5 advice #1)."""
    log = str(tmp_path / "log")
    _mk_flat_log(spark, log, [
        (0, "testc.db.orders", "c", "o1", 0, "x"),
        (1, "testc.db.users", "c", "u1", 1, "a"),
        (2, "testc.db.users", "u", "u1", 2, "b"),
        (3, "testc.db.users", "c", "u2", 3, "c"),
    ])

    def cfg(**kw):
        return PipelineConfig(
            log_path=log, table_root=str(tmp_path / "tables"), batch_window=2,
            num_buckets=2, table_per_destination=True,
            destination_regexp=r"^testc\.db\.", destination_replacement="", **kw)

    # wB (slice [2,3]) runs first and drains; users gains a wB slot
    assert CdcPipeline(spark, cfg(writer_id="wB", replay_from=2)).run().batches > 0
    # wA then replays [0,1], creating the orders table wB never touches
    CdcPipeline(spark, cfg(writer_id="wA", replay_until=1)).run()
    orders = LakeTable.load(spark, str(tmp_path / "tables" / "orders"))
    assert orders.checkpoint("wB") is None  # the scenario precondition
    # drained wB restarts as a no-op instead of re-replaying its slice
    assert CdcPipeline(spark, cfg(writer_id="wB", replay_from=2)).run().batches == 0
    users = LakeTable.load(spark, str(tmp_path / "tables" / "users"))
    assert {r["url"]: r["text"] for r in users.read().collect()} == {"u1": "b", "u2": "c"}
    assert {r["url"]: r["text"] for r in orders.read().collect()} == {"o1": "x"}


def test_full_pipeline_object_store_semantics(spark, log_path, replayed, tmp_path):
    """r3 verdict next-round #1: the WHOLE replay → crash/resume (across
    the schema-change epoch) → minor-compaction → tombstone-purge →
    vacuum → no-op-resume loop runs under ConditionalPutStorage — every
    metadata/commit/discovery operation uses only primitives an object
    store has (conditional PUT, list, GET/PUT/DELETE; no hard links, no
    renames). Final state must equal the PosixStorage one-shot replay.
    Reference anchor: S3 is the reference's primary deployment
    (BatchSparkChangeConsumer.java:104-110, shared/S3Minio.java:36-39)."""
    from debezium_server_batch_spark.plans.storage import ConditionalPutStorage

    full_root, _ = replayed
    root = str(tmp_path / "pages")
    st = ConditionalPutStorage()
    cfg = _cfg(log_path, root, compact_every=2, storage=st)
    CdcPipeline(spark, cfg).run(max_batches=2)  # "crash" mid-log
    t = LakeTable.load(spark, root, storage=st)
    assert t.checkpoint() is not None
    # a FRESH pipeline (fresh storage instance, like a new process)
    # resumes from the in-snapshot checkpoint and drains the log
    resumed = CdcPipeline(spark, _cfg(log_path, root, compact_every=2, storage=ConditionalPutStorage()))
    assert resumed.run().batches > 0
    assert spark_final_state(spark, root) == spark_final_state(spark, full_root)
    # maintenance through the object-store layer
    t = LakeTable.load(spark, root, storage=st)
    t.compact_deltas()
    t.purge_tombstones()
    removed = t.vacuum(keep_last=1, orphan_grace_s=0.0)
    assert removed  # superseded delta/base files reclaimed
    assert spark_final_state(spark, root) == spark_final_state(spark, full_root)
    # schema evolution crossed the crash point intact
    assert "title" in [f.name for f in t.schema().fields]
    # drained log: resume is a no-op
    assert CdcPipeline(spark, cfg).run().batches == 0


def test_dead_letter_quarantines_malformed_events(spark, tmp_path):
    """Events whose merge key parses to null (truncated JSON, missing
    payload) must NOT land as a null-key row in the table (the pre-r5
    silent pollution); with dead_letter set their RAW rows are spooled
    with batch_id + reason, on BOTH the grouped and the fast path."""
    import json as _json

    def env(url, lsn, off):
        val = _json.dumps(
            {
                "schema": {
                    "type": "struct",
                    "fields": [
                        {"field": "url", "type": "string"},
                        {"field": "__lsn", "type": "int64"},
                        {"field": "__deleted", "type": "string"},
                        {"field": "warc_ts_ms", "type": "int64"},
                        {"field": "text", "type": "string"},
                    ],
                },
                "payload": {
                    "url": url, "__lsn": lsn, "__deleted": "false",
                    "warc_ts_ms": 1_700_000_000_000, "text": f"t{lsn}",
                },
            }
        )
        return (off, _json.dumps({"schema": None, "payload": {"url": url}}), val, "topic.pages")

    rows = [env("a", 1, 0), env("b", 2, 1)]
    rows.append((2, None, '{"schema": {"type": "struct", "fi', "topic.pages"))  # truncated
    rows.append((3, None, '{"something": "else"}', "topic.pages"))  # no payload
    rows += [env("a", 5, 4), env("c", 6, 5)]
    log = str(tmp_path / "log")
    spark.createDataFrame(
        rows, "offset long, key string, value string, destination string"
    ).write.parquet(log)

    root = str(tmp_path / "t")
    dlq = str(tmp_path / "dlq")
    cfg = PipelineConfig(
        log_path=log, table_root=root, batch_window=3, num_buckets=2, dead_letter=dlq
    )
    # window 1 (grouped: first contact, schemas unknown) carries both
    # malformed events; window 2 (fast path: schema now cached) is clean
    pipe = CdcPipeline(spark, cfg)
    stats = pipe.run()
    assert stats.batches == 2
    assert sum(g.get("dead_letter_rows", 0) for rec in stats.lineage for g in rec.get("groups", [])) == 2

    t = LakeTable.load(spark, root)
    state = {r["url"]: r["__lsn"] for r in t.read().collect()}
    assert state == {"a": 5, "b": 2, "c": 6}  # no null-key row, LWW intact
    assert None not in state

    dead = spark.read.parquet(dlq)
    assert {r["offset"] for r in dead.select("offset").collect()} == {2, 3}
    got = {r["offset"]: (r["value"], r["reason"], r["batch_id"]) for r in dead.collect()}
    assert got[2][0].startswith('{"schema"')  # raw bytes preserved
    assert got[2][1] == "null-merge-key" and got[2][2] == 0

    # fast path with a malformed tail: the schema is now cached, so a
    # KNOWN-schema event whose payload carries url=null rides the
    # optimistic single-pass path and must be quarantined there too
    more = [env("d", 7, 6), env(None, 8, 7)]
    spark.createDataFrame(
        more, "offset long, key string, value string, destination string"
    ).write.mode("append").parquet(log)
    stats2 = pipe.run()  # same instance: schema cache warm → fast path
    assert stats2.batches == 1
    assert stats2.lineage[0].get("dead_letter_rows", 0) == 1  # fast-path record
    state = {r["url"]: r["__lsn"] for r in LakeTable.load(spark, root).read().collect()}
    assert state == {"a": 5, "b": 2, "c": 6, "d": 7}
    assert {r["offset"] for r in spark.read.parquet(dlq).collect()} == {2, 3, 7}


def test_per_writer_dead_letter_paths(spark, tmp_path):
    """Two writer_id pipelines sharing ONE dead_letter root must spool
    into writer=<id>/ subdirs automatically (multi-process appends to a
    flat path race on the parquet writer's shared _temporary staging
    dir); read_dead_letters unions the spools with writer provenance and
    the union equals the injected malformed set exactly (r5 verdict
    next #3)."""
    import json as _json
    import os as _os

    from debezium_server_batch_spark.streaming.runner import read_dead_letters

    def env(url, lsn, off):
        val = _json.dumps({
            "schema": {"type": "struct", "fields": [
                {"field": "url", "type": "string"},
                {"field": "__lsn", "type": "int64"},
                {"field": "__deleted", "type": "string"},
                {"field": "warc_ts_ms", "type": "int64"},
                {"field": "text", "type": "string"}]},
            "payload": {"url": url, "__lsn": lsn, "__deleted": "false",
                        "warc_ts_ms": 1_700_000_000_000, "text": f"t{lsn}"},
        })
        return (off, _json.dumps({"schema": None, "payload": {"url": url}}), val, "topic.pages")

    rows = [env("a", 1, 0)]
    rows.append((1, None, '{"schema": {"type": "struct", "fi', "topic.pages"))  # slice A corrupt
    rows += [env("b", 3, 2), env("c", 4, 3)]
    rows.append((4, None, '{"no": "payload"}', "topic.pages"))  # slice B corrupt
    rows += [env("d", 6, 5)]
    log = str(tmp_path / "log")
    spark.createDataFrame(
        rows, "offset long, key string, value string, destination string"
    ).write.parquet(log)

    root = str(tmp_path / "t")
    dlq = str(tmp_path / "dlq")

    def cfg(**kw):
        return PipelineConfig(
            log_path=log, table_root=root, batch_window=3, num_buckets=2,
            dead_letter=dlq, **kw)

    CdcPipeline(spark, cfg(writer_id="wA", replay_until=2)).run()
    CdcPipeline(spark, cfg(writer_id="wB", replay_from=3)).run()

    # per-writer partition dirs, no flat files at the shared root
    assert _os.path.isdir(_os.path.join(dlq, "writer=wA"))
    assert _os.path.isdir(_os.path.join(dlq, "writer=wB"))
    assert not any(f.endswith(".parquet") for f in _os.listdir(dlq))

    dead = read_dead_letters(spark, dlq)
    got = {(r["offset"], r["writer"]) for r in dead.select("offset", "writer").collect()}
    assert got == {(1, "wA"), (4, "wB")}  # union == injected malformed set
    # raw rows intact (no spool corruption)
    vals = {r["offset"]: r["value"] for r in dead.collect()}
    assert vals[1].startswith('{"schema"') and vals[4] == '{"no": "payload"}'

    state = {r["url"]: r["__lsn"] for r in LakeTable.load(spark, root).read().collect()}
    assert state == {"a": 1, "b": 3, "c": 4, "d": 6}


def test_lineage_emitted(spark, log_path, replayed):
    """Every batch leaves a lineage record (offset range, group rows,
    per-bucket counts) in stats and in the snapshot chain."""
    root, stats = replayed
    assert len(stats.lineage) == stats.batches
    rec = stats.lineage[0]
    assert {"batch_id", "offset_lo", "offset_hi", "n_events", "groups"} <= set(rec)
    assert rec["groups"][0]["bucket_rows"]
    snap_lineage = [s.get("lineage") for s in LakeTable.load(spark, root).history()]
    assert any(lin for lin in snap_lineage if lin)


def _mk_flat_log(spark, path, rows):
    import json as _json

    def ev(offset, dest, op, key, lsn, val):
        payload = {"url": key, "text": val, "__op": op, "__lsn": lsn,
                   "__source_ts_ms": 1704067200000 + lsn,
                   "__deleted": "true" if op == "d" else "false"}
        schema = {"type": "struct", "fields": [
            {"type": "string", "field": "url", "optional": False},
            {"type": "string", "field": "text", "optional": True},
            {"type": "string", "field": "__op", "optional": True},
            {"type": "int64", "field": "__lsn", "optional": True},
            {"type": "int64", "field": "__source_ts_ms", "optional": True},
            {"type": "string", "field": "__deleted", "optional": True}]}
        return (offset, dest, None, _json.dumps({"schema": schema, "payload": payload}))

    spark.createDataFrame(
        [ev(*r) for r in rows], "offset long, destination string, key string, value string"
    ).write.parquet(path)


def test_single_table_checkpoint_rides_globally_last_group(spark, tmp_path):
    """Single-table mode + multi-destination log: no group's merge may
    carry the window checkpoint before every group has committed. On a
    FIRST-CONTACT window (table created this window → checkpoint-barrier
    mode) the checkpoint lands as a trailing checkpoint-only commit; on
    steady-state windows it embeds in the root's LAST merge with zero
    extra commits. Either way, a crash before the later groups must
    leave the checkpoint behind their (unmerged) events."""
    log = str(tmp_path / "log")
    _mk_flat_log(spark, log, [
        (0, "testc.db.aaa", "c", "a1", 0, "va"),
        (1, "testc.db.zzz", "c", "z1", 1, "vz"),
        (2, "testc.db.aaa", "u", "a1", 2, "va2"),
        (3, "testc.db.zzz", "u", "z1", 3, "vz2"),
    ])
    root = str(tmp_path / "shared")
    cfg = PipelineConfig(log_path=log, table_root=root, batch_window=100, num_buckets=2)
    CdcPipeline(spark, cfg).run()  # one window, two destination groups
    table = LakeTable.load(spark, root)
    hist = table.history()
    merges = [s for s in hist if s["summary"]["operation"].startswith("merge")]
    assert len(merges) == 2  # one commit per destination group
    # barrier window: NO merge embeds the checkpoint; it follows in a
    # dedicated checkpoint-only commit once both merges are down
    assert all(m.get("checkpoint") is None for m in merges)
    assert hist[-1]["summary"]["operation"] == "checkpoint-only"
    assert table.checkpoint()["offset_hi"] == 3
    assert {r["url"]: r["text"] for r in table.read().collect()} == {"a1": "va2", "z1": "vz2"}

    # steady state: a second window re-uses the slot — the checkpoint
    # embeds in the root's last merge, no checkpoint-only commit
    _mk_flat_log(spark, str(tmp_path / "log2"), [
        (4, "testc.db.aaa", "u", "a1", 4, "va3"),
        (5, "testc.db.zzz", "u", "z1", 5, "vz3"),
    ])
    cfg2 = PipelineConfig(
        log_path=str(tmp_path / "log2"), table_root=root, batch_window=100, num_buckets=2
    )
    CdcPipeline(spark, cfg2).run()
    hist2 = table.history()[len(hist):]
    merges2 = [s for s in hist2 if s["summary"]["operation"].startswith("merge")]
    assert len(merges2) == 2
    # first group's merge carries the OLD slot forward (no advance);
    # only the root's last merge embeds the new window checkpoint
    assert merges2[0]["checkpoint"]["offset_hi"] == 3
    assert merges2[-1]["checkpoint"]["offset_hi"] == 5
    assert not any(s["summary"]["operation"] == "checkpoint-only" for s in hist2)
    assert {r["url"]: r["text"] for r in table.read().collect()} == {"a1": "va3", "z1": "vz3"}


def test_resume_respects_table_merge_mode(spark, tmp_path):
    """The pre-merge dedup decision must follow the TABLE's persisted
    merge_mode, not the session config: resuming a CoW table under a MoR
    config would feed multi-row-per-key batches into the CoW full-outer
    merge and land duplicate key rows."""
    log = str(tmp_path / "log")
    _mk_flat_log(spark, log, [
        (0, "testc.db.p", "c", "k1", 0, "v0"),
        # second window: THREE versions of the same key in one batch
        (10, "testc.db.p", "u", "k1", 10, "v1"),
        (11, "testc.db.p", "u", "k1", 11, "v2"),
        (12, "testc.db.p", "u", "k1", 12, "v3"),
    ])
    root = str(tmp_path / "t")
    cow_cfg = PipelineConfig(log_path=log, table_root=root, batch_window=5, num_buckets=2,
                             merge_mode="cow")
    CdcPipeline(spark, cow_cfg).run(max_batches=1)  # creates the table as CoW
    assert LakeTable.load(spark, root).snapshot()["merge_mode"] == "cow"
    # resume with a MISMATCHED config claiming mor
    mor_cfg = PipelineConfig(log_path=log, table_root=root, batch_window=5, num_buckets=2,
                             merge_mode="mor")
    CdcPipeline(spark, mor_cfg).run()
    table = LakeTable.load(spark, root)
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3"  # ≤1 row per key, LWW winner


def test_key_envelope_derives_per_destination_pk(spark, tmp_path):
    """key_col=None: the merge key comes from each destination's Debezium
    KEY envelope schema (reference DebeziumBigqueryEvent.java:61-70) —
    one destination keyed by uid, another by a COMPOSITE (order_id,
    line_no) key. A single static key_col cannot key both correctly."""
    import json as _json

    def ev(offset, dest, keyvals: dict, extra: dict, lsn):
        key_schema = {"type": "struct",
                      "fields": [{"type": "string", "field": k, "optional": False} for k in keyvals]}
        payload = {**keyvals, **extra, "__op": "c", "__lsn": lsn,
                   "__source_ts_ms": 1704067200000 + lsn, "__deleted": "false"}
        val_schema = {"type": "struct", "fields": (
            [{"type": "string", "field": k, "optional": False} for k in keyvals]
            + [{"type": "string", "field": k, "optional": True} for k in extra]
            + [{"type": "string", "field": "__op", "optional": True},
               {"type": "int64", "field": "__lsn", "optional": True},
               {"type": "int64", "field": "__source_ts_ms", "optional": True},
               {"type": "string", "field": "__deleted", "optional": True}])}
        return (offset, dest,
                _json.dumps({"schema": key_schema, "payload": keyvals}),
                _json.dumps({"schema": val_schema, "payload": payload}))

    rows = [
        ev(0, "db.users", {"uid": "u1"}, {"name": "a"}, 0),
        ev(1, "db.users", {"uid": "u1"}, {"name": "b"}, 1),       # LWW update
        ev(2, "db.lineitems", {"order_id": "o1", "line_no": "1"}, {"qty": "5"}, 2),
        ev(3, "db.lineitems", {"order_id": "o1", "line_no": "2"}, {"qty": "7"}, 3),
        ev(4, "db.lineitems", {"order_id": "o1", "line_no": "1"}, {"qty": "9"}, 4),  # update line 1
    ]
    log = str(tmp_path / "log")
    spark.createDataFrame(rows, "offset long, destination string, key string, value string") \
        .write.parquet(log)
    cfg = PipelineConfig(
        log_path=log, table_root=str(tmp_path / "tables"), batch_window=100,
        num_buckets=2, key_col=None, table_per_destination=True,
        destination_regexp=r"^db\.", destination_replacement="",
    )
    CdcPipeline(spark, cfg).run()
    users = LakeTable.load(spark, str(tmp_path / "tables" / "users"))
    items = LakeTable.load(spark, str(tmp_path / "tables" / "lineitems"))
    assert users.snapshot()["key_col"] == ["uid"]
    assert items.snapshot()["key_col"] == ["order_id", "line_no"]
    assert {r["uid"]: r["name"] for r in users.read().collect()} == {"u1": "b"}
    got = {(r["order_id"], r["line_no"]): r["qty"] for r in items.read().collect()}
    # composite key keeps both lines; line 1 took the LWW update
    assert got == {("o1", "1"): "9", ("o1", "2"): "7"}


def test_fast_path_matches_grouped_path(spark, log_path, tmp_path):
    """The optimistic single-pass fast path (union-schema parse +
    observe() drift check) must produce exactly the grouped path's final
    state, including across the schema epoch (where it detects drift,
    aborts pre-commit and redoes the window)."""
    roots = {}
    for fast in (True, False):
        root = str(tmp_path / f"fp{fast}")
        CdcPipeline(spark, _cfg(log_path, root, fast_path=fast)).run()
        roots[fast] = spark_final_state(spark, root)
    assert roots[True] == roots[False] and len(roots[True]) > 0
    # fast-path lineage is marked, proving the fast path actually ran
    hist = LakeTable.load(spark, str(tmp_path / "fpTrue")).history()
    assert any(rec.get("fast_path") for s in hist for rec in s.get("lineage") or [])
