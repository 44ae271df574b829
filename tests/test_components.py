"""Connected-components: the hybrid execution paths must agree."""

from __future__ import annotations

from drive_health_etl_spark.operators.dedup import dedup_components


def test_driver_and_distributed_paths_agree(spark, sf_dir):
    local = sorted(map(tuple, dedup_components(spark, sf_dir).collect()))
    distributed = sorted(
        map(tuple, dedup_components(spark, sf_dir, small_graph_edges=0).collect())
    )
    assert local == distributed
    # every component root is a member of its own component and is minimal
    roots = {r for _d, r in local}
    docs = {d for d, _r in local}
    assert roots <= docs
    assert all(r <= d for d, r in local)
