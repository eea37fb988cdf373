"""Round-6 operator tests: data-edge recursive hierarchy."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)


def _parent(k: int) -> int:
    return k // (2 + (k * 2654435761) % 7)


def test_hierarchy_data_edges_matches_python_model(spark, sf_dir):
    """Independent model check: replay the iterative ancestor walk in
    plain Python (with the same parent<node acyclicity guard) over the
    collected fixture and compare every (node, n_members, n_orders,
    subtree_revenue) row. Also the regression pin for the custkey-0
    self-loop: the fixture REALLY contains c_custkey=0 with
    parent(0)=0, so an unguarded walk would never converge."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.graph import (
        q_hierarchy_data_edges,
    )

    custkeys = [
        r.c_custkey
        for r in table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    assert 0 in custkeys  # the self-loop node the guard exists for
    spend = {
        r.node: (float(r.s), r.n)
        for r in table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    key_set = set(custkeys)
    members = defaultdict(list)
    for k in custkeys:
        anc = k
        members[anc].append(k)
        # climb only strictly-decreasing edges of customer nodes
        while anc in key_set and _parent(anc) < anc:
            anc = _parent(anc)
            members[anc].append(k)
    expected = {}
    for anc, ms in members.items():
        s = sum(spend.get(m, (0.0, 0))[0] for m in ms)
        n = sum(spend.get(m, (0.0, 0))[1] for m in ms)
        expected[anc] = (len(ms), n, round(s, 2))
    rows = q_hierarchy_data_edges(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        exp = expected[r.node]
        assert (r.n_members, r.n_orders) == exp[:2], r.node
        assert r.subtree_revenue == pytest.approx(exp[2], abs=0.02)


def test_hierarchy_data_edges_root_collects_everything(spark, sf_dir):
    """Conservation at the root: node 0's subtree holds every customer
    whose decreasing chain reaches 0, and summed member counts across
    depth-0 self-rows equal |customer|."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.graph import (
        q_hierarchy_data_edges,
    )

    rows = {r.node: r for r in q_hierarchy_data_edges(spark, sf_dir).collect()}
    n_cust = table(spark, sf_dir, "customer").count()
    # every chain k -> k//d -> ... with d>=2 reaches 0 when keys are
    # contiguous from 0 (every intermediate value is a smaller custkey),
    # so at the base fixtures root 0 must contain ALL customers
    custkeys = sorted(
        r.c_custkey
        for r in table(spark, sf_dir, "customer").select("c_custkey").collect()
    )
    if custkeys == list(range(len(custkeys))):
        assert rows[0].n_members == n_cust
