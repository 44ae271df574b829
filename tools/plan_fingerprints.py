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


def main() -> None:
    from tests.test_plans import BENCH_PLAN_FINGERPRINTS

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-fingerprints", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in BENCH_PLAN_FINGERPRINTS:
        # steady-state plan: execute once so shared persisted subtrees are
        # materialized, matching the test's fingerprint discipline
        REGISTRY[name][0](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = plan_fingerprint(REGISTRY[name][0](spark, sf_dir))
    print(json.dumps(out, indent=4))


if __name__ == "__main__":
    main()
