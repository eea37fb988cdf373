"""Real-`partsupp` branch parity: materialize the derived dimension to
parquet, point the engine at a fixture dir that contains it, and every
partsupp-consuming TPC-H query must produce EXACTLY the rows the derived
(fused/inlined) path produces — proving the real-table join plans are a
drop-in for a user with an actual TPC-H dataset (VERDICT r3 item #2)."""

from __future__ import annotations

import os

import pytest

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators import (
    tpch_partsupp as tp,
)


@pytest.fixture(scope="module")
def real_sf_dir(spark, sf_dir, tmp_path_factory):
    """A clone of the fixture dir (symlinked base tables) plus a REAL
    partsupp.parquet materialized from the derived dimension."""
    d = tmp_path_factory.mktemp("real_partsupp_sf")
    for f in os.listdir(sf_dir):
        os.symlink(os.path.join(sf_dir, f), str(d / f))
    tp.derived_partsupp(spark, sf_dir).coalesce(1).write.parquet(
        str(d / "partsupp.parquet")
    )
    return str(d)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=repr,
    )


def test_branch_detection(sf_dir, real_sf_dir):
    assert not tp.has_real_partsupp(sf_dir)
    assert tp.has_real_partsupp(real_sf_dir)


@pytest.mark.parametrize(
    "qname",
    ["q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20"],
)
def test_real_table_path_matches_derived(spark, sf_dir, real_sf_dir, qname):
    fn = getattr(tp, qname)
    derived = _rows(fn(spark, sf_dir))
    real = _rows(fn(spark, real_sf_dir))
    assert len(real) == len(derived) > 0, (
        f"{qname}: {len(real)} real vs {len(derived)} derived rows"
    )
    assert real == derived, f"{qname}: value mismatch between paths"


def test_q9_real_path_runs_the_join(spark, real_sf_dir):
    # the real branch must actually join partsupp (no modular fusion):
    # the physical plan reads the partsupp parquet
    plan = tp.q_tpch_q9(spark, real_sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "partsupp.parquet" in plan
