"""CLI regression: `list` and `oracle` run without a SparkSession and
stay in sync with the registry."""

from __future__ import annotations

import io
import contextlib

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.__main__ import (
    main,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    all_specs,
)


def _run(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_list_covers_registry():
    rc, out = _run(["list"])
    assert rc == 0
    specs = all_specs()
    for name in specs:
        assert name in out
    assert f"{len(specs)} queries" in out


def test_list_tag_filter():
    rc, out = _run(["list", "dedup"])
    assert rc == 0
    assert "q_dedup_minhash" in out
    assert "q_tpch_q1" not in out


def test_oracle_prints_sql():
    rc, out = _run(["oracle", "q_dedup_minhash"])
    assert rc == 0
    assert "SELECT" in out


def test_unknown_query_is_an_error():
    rc, _ = _run(["oracle", "q_nope"])
    assert rc == 2
