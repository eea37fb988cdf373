"""Partition layout tests: static partition pruning and dynamic partition
pruning (DPP) actually fire on the engine's archival layout — the scan
reads only surviving partitions, which is the difference between touching
2 directories and 100 TB."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    events_partitioned_by_day,
    table,
)


@pytest.fixture(scope="module")
def part_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    return events_partitioned_by_day(spark, sf_dir, path), path


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_static_partition_pruning(spark, sf_dir, part_events):
    pdf, path = part_events
    days = [r["event_date"] for r in pdf.select("event_date").distinct().collect()]
    assert len(days) > 1, "fixture needs multiple partitions"
    one_day = sorted(days)[0]
    q = pdf.filter(F.col("event_date") == F.lit(one_day))
    # the predicate lands in the scan's PartitionFilters -> directory-level
    # skipping (inputFiles() can't show this; it lists the base relation)
    plan = _explain(q)
    assert "PartitionFilters" in plan
    part_filters = [
        line for line in plan.splitlines() if "PartitionFilters" in line
    ][0]
    assert "event_date" in part_filters
    # and the result matches the unpartitioned filter
    expected = (
        table(spark, sf_dir, "events")
        .filter(F.to_date("ts") == F.lit(one_day))
        .count()
    )
    assert q.count() == expected


def test_dynamic_partition_pruning_plan(spark, part_events):
    pdf, _ = part_events
    days = sorted(
        r["event_date"]
        for r in pdf.select("event_date").distinct().collect()
    )
    dim = pdf.sparkSession.createDataFrame(
        [(days[0], "keep")], "event_date date, tag string"
    )
    joined = pdf.join(dim, "event_date").filter(F.col("tag") == "keep")
    plan = _explain(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # result equals the partition's row count
    expected = pdf.filter(F.col("event_date") == F.lit(days[0])).count()
    assert joined.count() == expected
