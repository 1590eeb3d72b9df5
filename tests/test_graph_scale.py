"""Scale guard for the graph family: the round-4 sf0.1 sweep found
p2's triangle join OOMing a vanilla session on the FULL co-purchase
graph (near-regular, 49M-row wedge intermediate — see the measured
numbers in operators/graph.py).  p2 now runs on the min-support graph;
this test pins that it completes at sf0.1, where the old definition
died."""

from __future__ import annotations

import os

import pytest

from ma_anonymization_etl_spark.operators.graph import (
    p2_triangle_count,
    p3_khop_reachability,
)

SF_BIG = "/root/testdata/sf0.1"


@pytest.mark.skipif(not os.path.exists(SF_BIG), reason="sf0.1 corpus absent")
def test_p2_completes_at_sf01(spark):
    row = p2_triangle_count(spark, SF_BIG).collect()[0]
    assert row.n_edges > 0 and row.n_wedges > 0


@pytest.mark.skipif(not os.path.exists(SF_BIG), reason="sf0.1 corpus absent")
def test_p3_completes_at_sf01(spark):
    rows = p3_khop_reachability(spark, SF_BIG).collect()
    assert sum(r.n_nodes for r in rows) > 0
