"""Oracle-differential tests (SURVEY.md §5.1): every registered query with
an oracle runs on Spark AND DuckDB at sf0.001; results must match on column
names + multiset of values. This mirrors the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    all_specs,
)

from .conftest import assert_matches_oracle

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check (driver's weaker path): runs and yields >= 0 rows
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, spec.oracle)
