"""CLI launcher surface (run_pipeline.py): flag → behavior mapping,
driven in-process through main(). The soak tools exercise the CLI from
separate processes; these tests pin the mappings a soak failure would
otherwise only reveal indirectly (r5 verdict next #8)."""

import json

import pytest

from run_pipeline import main


def _last_json(capsys) -> dict:
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    assert out, "CLI printed no JSON status line"
    return json.loads(out[-1])


@pytest.fixture()
def tiny_log(spark, tmp_path_factory):
    log = str(tmp_path_factory.mktemp("clilog") / "log")
    rc = main([
        "generate", "--out", log, "--pages", "60", "--hot-pages", "2",
        "--hot-k", "4", "--files", "4",
    ])
    assert rc == 0
    return log


def test_cli_replay_storage_flaky_maps_to_fault_stack(spark, tiny_log, tmp_path, capsys):
    """`replay --storage flaky` must wire the canonical degraded stack
    (RetryingStorage(FlakyStorage(ConditionalPutStorage))) — the exact
    wiring the soaks measure — and still produce the EXACT posix-replay
    table state despite injected faults."""
    from debezium_server_batch_spark.plans.laketable import LakeTable

    capsys.readouterr()  # drop generate output
    flaky_root = str(tmp_path / "flaky_t")
    rc = main([
        "replay", "--log", tiny_log, "--table", flaky_root,
        "--batch-events", "120", "--buckets", "4",
        "--storage", "flaky", "--fault-rate", "0.2", "--fault-seed", "7",
    ])
    assert rc == 0
    line = _last_json(capsys)
    # only the flaky/retrying stack reports these counters — their
    # presence pins the flag→stack mapping; the seeded 20% rate must
    # actually inject (a silent no-op flaky mode would report zeros)
    assert "storage_retries" in line and "storage_faults" in line
    assert sum(line["storage_faults"].values()) > 0
    assert line["storage_retries"] > 0

    posix_root = str(tmp_path / "posix_t")
    rc = main([
        "replay", "--log", tiny_log, "--table", posix_root,
        "--batch-events", "120", "--buckets", "4",
    ])
    assert rc == 0
    posix_line = _last_json(capsys)
    assert "storage_retries" not in posix_line  # posix mode: no fault stack
    assert posix_line["events"] == line["events"] > 0

    cols = ["url", "text", "__lsn", "__deleted"]
    flaky_state = {
        tuple(r) for r in LakeTable.load(spark, flaky_root).read().select(*cols).collect()
    }
    posix_state = {
        tuple(r) for r in LakeTable.load(spark, posix_root).read().select(*cols).collect()
    }
    assert flaky_state == posix_state and len(flaky_state) > 0


def test_cli_replay_flaky_resume_noop(spark, tiny_log, tmp_path, capsys):
    """A drained flaky-storage replay resumes as a no-op: the checkpoint
    survives the injected-fault commit path."""
    capsys.readouterr()
    root = str(tmp_path / "t")
    args = [
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "120", "--buckets", "4",
        "--storage", "flaky", "--fault-rate", "0.15", "--fault-seed", "11",
    ]
    assert main(args) == 0
    first = _last_json(capsys)
    assert first["batches"] > 0
    assert main(args) == 0
    again = _last_json(capsys)
    assert again["batches"] == 0 and again["events"] == 0


def test_cli_rollback_undoes_tail_and_replay_reconverges(spark, tiny_log, tmp_path, capsys):
    """`rollback --to-version` flips the table back (metadata-only),
    rolls the checkpoint back with the data, and a re-replay of the
    undone windows reconverges to the exact pre-rollback final state."""
    from debezium_server_batch_spark.plans.laketable import LakeTable

    root = str(tmp_path / "rb_t")
    rc = main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "80", "--buckets", "4",
    ])
    assert rc == 0
    capsys.readouterr()
    t = LakeTable.load(spark, root)
    final_v = t.current_version()
    final_rows = {tuple(r) for r in t.read().collect()}
    mid_v = t.versions()[len(t.versions()) // 2]

    rc = main(["rollback", "--table", root, "--to-version", str(mid_v)])
    assert rc == 0
    line = _last_json(capsys)
    assert line["rolled_back_to"] == mid_v
    assert line["version"] > final_v  # history moves forward
    t2 = LakeTable.load(spark, root)
    assert {tuple(r) for r in t2.read().collect()} == {
        tuple(r) for r in t2.read(version=mid_v).collect()
    }

    # replay resumes from the rolled-back checkpoint and reconverges
    rc = main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "80", "--buckets", "4",
    ])
    assert rc == 0
    replay_line = _last_json(capsys)
    assert replay_line["events"] > 0  # the undone windows re-applied
    t3 = LakeTable.load(spark, root)
    assert {tuple(r) for r in t3.read().collect()} == final_rows


def test_cli_describe_reports_table_state(spark, tiny_log, tmp_path, capsys):
    root = str(tmp_path / "d_t")
    rc = main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "120", "--buckets", "4",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main(["describe", "--table", root])
    assert rc == 0
    d = _last_json(capsys)
    from debezium_server_batch_spark.plans.laketable import LakeTable

    t = LakeTable.load(spark, root)
    assert d["version"] == t.current_version()
    assert d["file_rows"] == t.total_rows()
    live = t.read().count()
    assert live <= d["file_rows"]  # MoR deltas hold pre-collapse versions
    assert d["key_col"] == t.snapshot().get("key_col")
    assert d["checkpoint"] is not None  # replay committed its offsets
    assert d["retained_versions"] == t.versions()
    assert d["files"] >= 1 and d["buckets"] >= 1
    # after full compaction + tombstone purge, metadata file rows ==
    # live rows exactly (tombstones otherwise count as file rows)
    rc = main(["compact", "--table", root, "--purge-tombstones"])
    assert rc == 0
    rc = main(["describe", "--table", root])
    assert rc == 0
    d2 = _last_json(capsys)
    assert d2["outstanding_delta_files"] == 0
    assert d2["file_rows"] == live
    assert not d2["needs_collapse"]


def test_cli_fsck_exit_codes(spark, tiny_log, tmp_path, capsys):
    import os

    root = str(tmp_path / "f_t")
    assert main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "120", "--buckets", "4",
    ]) == 0
    capsys.readouterr()
    assert main(["fsck", "--table", root, "--deep"]) == 0
    rep = _last_json(capsys)
    assert rep["ok"] and rep["deep_files_verified"] == rep["files_checked"] > 0

    # delete one referenced data file → nonzero exit
    from debezium_server_batch_spark.plans.laketable import LakeTable

    t = LakeTable.load(spark, root)
    f = next(f for fs in t.snapshot()["buckets"].values() for f in fs)
    os.remove(os.path.join(root, f["path"]))
    assert main(["fsck", "--table", root]) == 1
    rep = _last_json(capsys)
    assert not rep["ok"]


def test_cli_export_bootstrap_incremental_noop(spark, tiny_log, tmp_path, capsys):
    """`export` syncs the table into a shard tree: first run = full
    export, second run after more replay rewrites only changed shards,
    third run is a noop; --verify pins zero integrity failures and the
    tree equals the table byte-for-byte after every tick."""
    import os

    from debezium_server_batch_spark.plans.laketable import LakeTable

    root = str(tmp_path / "pages")
    out = str(tmp_path / "shards")

    def _export():
        rc = main([
            "export", "--table", root, "--out", out,
            "--shard-tokens", "2000", "--verify",
        ])
        assert rc == 0
        return _last_json(capsys)

    def _disk_eq_table():
        t = LakeTable.load(spark, root)
        table = sorted((r["url"], r["text"]) for r in t.read().select("url", "text").collect())
        disk = sorted(
            (r["url"], r["text"])
            for r in spark.read.parquet(os.path.join(out, "data")).select("url", "text").collect()
        )
        assert table == disk

    rc = main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "80", "--buckets", "4", "--max-batches", "2",
    ])
    assert rc == 0
    capsys.readouterr()

    s1 = _export()
    assert s1["bootstrap"] and s1["verify_failed_shards"] == 0 and s1["shards_new"] >= 1
    _disk_eq_table()

    rc = main([
        "replay", "--log", tiny_log, "--table", root,
        "--batch-events", "80", "--buckets", "4",
    ])
    assert rc == 0
    capsys.readouterr()

    s2 = _export()
    assert not s2["bootstrap"] and not s2["noop"]
    assert s2["verify_failed_shards"] == 0
    assert s2["docs_upserted"] + s2["docs_deleted"] > 0
    _disk_eq_table()

    s3 = _export()
    assert s3["noop"] and s3["verify_failed_shards"] == 0
