"""10^7-node link-graph rank scale soak: `link_rank`'s capped-join /
hot-key claims MEASURED at depth, matching how the other LLM-pipeline
operators got their 10^6-doc legs (tools/llm_scale_soak.py).

Graph (pure codegen, seed-free deterministic): a ring over n nodes
(i -> (i+1) mod n, so no dangling nodes and every node has ring
in-degree exactly 1) plus hub edges i -> 0 for every i % 10 == 3.
That gives node 0 an in-degree of n/10 + 1 — a single dst key
receiving 10% of all contributions, the exact hot-key adversary the
hash-aggregate's map-side partial aggregation must absorb (a naive
collect-per-dst plan would put 10^6 rows in one task).

Ground truth: the same fixed-iteration recurrence replayed exactly in
numpy (ring contributions are a vector roll; the hub sum is one
reduction). The engine sums contributions as DECIMAL(38,18) — exact
addition of 18-decimal-quantized doubles — while numpy uses pairwise
float64 summation, so per-node agreement is asserted to
|spark - numpy| <= 2e-9 + 1e-8*|numpy| (the 2e-9 floor covers the
round-to-9-decimals boundary; the relative term covers float error on
the ~10^5-magnitude hub sum). Checked on a deterministic ~1k-node
sample plus the hub's 3-hop cone — never a full 10^7-row collect —
and the hub must be the argmax rank.

Usage: python tools/link_scale_soak.py [n_nodes=10000000] [cores=32]
Prints one JSON line; quote the numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from llm_scale_soak import _heaviest_stage_skew, _max_stage  # noqa: E402

ITERATIONS = 3
DAMPING = 0.85


def numpy_reference(n_nodes: int):
    """Exact replay of link_rank's recurrence on the ring+hub graph."""
    import numpy as np

    outdeg = np.ones(n_nodes)
    outdeg[3::10] += 1.0  # hub linkers carry a second out-edge
    rank = np.ones(n_nodes)
    for _ in range(ITERATIONS):
        contrib = rank / outdeg
        new = (1.0 - DAMPING) + DAMPING * np.roll(contrib, 1)  # ring edge
        new[0] += DAMPING * contrib[3::10].sum()  # hub in-edges
        rank = new
    return np.round(rank, 9)


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from debezium_server_batch_spark.operators.crawl import link_rank
    from debezium_server_batch_spark.session import build_session

    spark = build_session(
        master=f"local[{cores}]",
        shuffle_partitions=cores * 4,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId

    ids = spark.range(n_nodes).repartition(256)
    ring = ids.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n_nodes).alias("dst")
    )
    hub = ids.filter(F.col("id") % 10 == 3).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    edges = ring.unionByName(hub)
    n_edges = n_nodes + n_nodes // 10

    s0 = _max_stage(ui, app)
    t0 = time.monotonic()
    ranks = link_rank(edges, iterations=ITERATIONS, damping=DAMPING).persist()
    n_ranked = ranks.count()
    wall = time.monotonic() - t0
    skew = _heaviest_stage_skew(ui, app, s0)

    # deterministic ~1k-node sample + the hub's 3-hop cone + ring seam
    probe_ids = sorted(
        {i % n_nodes for i in range(0, n_nodes, max(n_nodes // 1000, 1))}
        | {0, 1, 2, 3, n_nodes - 1, n_nodes - 2, n_nodes - 3}
    )
    got = {
        r["id"]: r["rank"]
        for r in ranks.filter(F.col("id").isin(probe_ids)).collect()
    }
    top = ranks.orderBy(F.col("rank").desc()).limit(1).collect()[0]
    ranks.unpersist()
    spark.stop()

    expected = numpy_reference(n_nodes)
    worst = 0.0
    for i in probe_ids:
        diff = abs(got[i] - float(expected[i]))
        tol = 2e-9 + 1e-8 * abs(float(expected[i]))
        worst = max(worst, diff / tol)
    hub_expected = float(expected[0])
    ok = (
        n_ranked == n_nodes
        and len(got) == len(probe_ids)
        and worst <= 1.0
        and top["id"] == 0
        and abs(top["rank"] - hub_expected) <= 2e-9 + 1e-8 * abs(hub_expected)
    )

    out = {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "cores": cores,
        "iterations": ITERATIONS,
        "wall_s": round(wall, 1),
        "edges_per_sec": round(ITERATIONS * n_edges / wall),
        "ranked_nodes": n_ranked,
        "probe_nodes": len(probe_ids),
        "worst_probe_err_over_tol": round(worst, 4),
        "hub_rank": top["rank"],
        "hub_rank_expected": hub_expected,
        "hub_in_degree": n_nodes // 10 + 1,
        "skew": skew,
        "pass": ok,
    }
    print(json.dumps(out))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
