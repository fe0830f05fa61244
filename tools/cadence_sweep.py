"""compact_every cadence sweep: ingest throughput vs read amplification.

Replays the same event log into a fresh MoR table at several minor-
compaction cadences and reports, per cadence: replay events/s, file
count + outstanding un-collapsed state at end of ingest, and the cost
of a full read()+count right after ingest (the read-amplification the
cadence buys down). One JSON line per cadence + a summary line.

Usage: python tools/cadence_sweep.py [log_path] [cores=32] [batch_events=500000]
(generates a 1.2M-page log at the default path if missing)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dsbs-scaling-log-1200000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch_events = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000

    from debezium_server_batch_spark.plans.laketable import LakeTable
    from debezium_server_batch_spark.session import build_session
    from debezium_server_batch_spark.sources.synth import generate_event_log, write_event_log
    from debezium_server_batch_spark.streaming.runner import CdcPipeline, PipelineConfig

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    if not os.path.isdir(log):
        write_event_log(generate_event_log(spark, n_pages=1_200_000, n_hot=1200, hot_k=64), log, n_files=64)

    results = []
    for cadence in (None, 5, 2, "auto"):
        root = f"/dev/shm/cadence-{cadence}"
        shutil.rmtree(root, ignore_errors=True)
        cfg = PipelineConfig(
            log_path=log, table_root=root, batch_events=batch_events,
            num_buckets=32,
            compact_every=cadence if isinstance(cadence, int) else None,
            # observed-state trigger (r4 verdict next-round #6): fold
            # when outstanding deltas reach the threshold, no hand-tuned
            # cadence — must land inside the every-5 envelope
            auto_compact=cadence == "auto",
        )
        t0 = time.monotonic()
        stats = CdcPipeline(spark, cfg).run()
        replay_s = time.monotonic() - t0
        t = LakeTable.load(spark, root)
        snap = t.snapshot()
        n_files = sum(len(fl) for fl in snap["buckets"].values())
        star_files = len(snap["buckets"].get("*", []))
        t0 = time.monotonic()
        rows = t.read().count()
        read_s = time.monotonic() - t0
        # time-sliced read: on an uncompacted MoR table the LWW collapse
        # must see ALL versions, so day file-pruning is disabled (the
        # r3 correctness guard) — this is the read amplification the
        # compaction cadence actually buys down
        t0 = time.monotonic()
        slice_rows = t.read(days=("2024-02-14", "2024-02-18")).count()
        slice_s = time.monotonic() - t0
        rec = {
            "compact_every": cadence if isinstance(cadence, int) else (cadence or "off"),
            "events": stats.events,
            "batches": stats.batches,
            "replay_sec": round(replay_s, 1),
            "events_per_sec": round(stats.events / replay_s, 1),
            "files_at_end": n_files,
            "outstanding_delta_files": star_files,
            "needs_collapse": snap["needs_collapse"],
            "full_read_sec": round(read_s, 2),
            "slice_read_sec": round(slice_s, 2),
            "slice_rows": slice_rows,
            "rows": rows,
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        shutil.rmtree(root, ignore_errors=True)

    assert len({r["rows"] for r in results}) == 1, "cadences must agree on table state"
    assert len({r["slice_rows"] for r in results}) == 1, "day-sliced reads must agree too"
    print(json.dumps({"sweep": results}))
    spark.stop()


if __name__ == "__main__":
    main()
