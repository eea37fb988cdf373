"""Shared pytest fixtures: one SparkSession per test run, DuckDB oracle
helper mirroring the driver's correctness harness (row-count + schema-name +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    TABLES,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (
    build_session,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="engine_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb float64 representation jitter far below our ROUND digits
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date — ignore tzinfo presence
        try:
            return v.replace(tzinfo=None).isoformat()
        except (TypeError, AttributeError):
            return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def assert_matches_oracle(spark_df, duck_con, sql):
    """Mirror of the driver's check: same column names, same multiset of
    row values (column-order- and row-order-insensitive)."""
    sdf = spark_df
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck_con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert sc == dc, f"schema mismatch: spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
