"""Regenerate tests/test_plans.py's BENCH_PLAN_FINGERPRINTS expected values
after an INTENTIONAL plan change: prints the dict literal for the same
query set at the tests' sf_dir.

Run: python tools/plan_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drive_health_etl_spark.plans.fingerprint import plan_fingerprint
from drive_health_etl_spark.plans.registry import REGISTRY
from drive_health_etl_spark.session import get_spark


def pin_set() -> list[str]:
    """The queries whose plan shape is pinned: every bench HEADLINE query,
    every join-family query, the iterative-loop queries, plus whatever is
    already pinned — deduped, registry-order."""
    import bench
    from tests.test_plans import BENCH_PLAN_FINGERPRINTS

    extra = [
        # join family beyond the bench set
        "j1_inner_equi", "j2_broadcast_dims", "j3_left_outer", "j3_full_outer",
        "j4_semi", "j4_anti", "j5_range_join", "j6_star_join",
        # iterative loops: the plan shown is the checkpointed readout, and
        # a non-{} fingerprint here means iteration state leaked lineage
        "graph_bfs_distances", "dedup_components", "dedup_near_pipeline",
        "emb_power_iteration",
    ]
    want = set(bench.HEADLINE) | set(BENCH_PLAN_FINGERPRINTS) | set(extra)
    return [n for n in REGISTRY if n in want]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-fingerprints", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or pin_set()
    out = {}
    for name in names:
        # steady-state plan: execute once so shared persisted subtrees are
        # materialized, matching the test's fingerprint discipline
        REGISTRY[name][0](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = plan_fingerprint(REGISTRY[name][0](spark, sf_dir))
    print(json.dumps(out, indent=4))


if __name__ == "__main__":
    main()
