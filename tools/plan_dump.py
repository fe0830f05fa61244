"""Dump .explain('formatted') for every declared query → plans/r07/.

Usage:
  python tools/plan_dump.py before [query ...]
  python tools/plan_dump.py after  [query ...]

Writes plans/r07/<query>_<tag>.txt. Queries whose construction executes
work eagerly (cdc_time_slice/changelog/rescale/rollback: the returned DF
is a LocalTableScan of collected rows) still dump — the file then notes
the construction-side shape is the interesting part.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_batch_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:]) or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="dsbs-plan-dump")
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building {name}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(f"dumped {name}_{tag}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
