"""Round-10 (optimization round 1) focused tests.

Each test pins an optimization's *mechanism* (the thing that makes it
fast) without re-testing query results — the oracle harness owns
result parity.
"""

from __future__ import annotations

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    _READER_MEMO,
    clear_table_memo,
    table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_table_reader_memo_reuses_plan_handle(spark):
    """Repeated table() calls must return the SAME DataFrame object
    (one schema inference per session+fixture+table), and the memo must
    hold plan handles only — never persisted rows."""
    clear_table_memo()
    df1 = table(spark, SF_DIR, "lineitem")
    df2 = table(spark, SF_DIR, "lineitem")
    assert df1 is df2
    # distinct tables / fixtures get distinct entries
    ev = table(spark, SF_DIR, "events")
    assert ev is not df1
    # the memoized events frame still carries the nano-ts rebuild
    assert ev.schema["ts"].dataType.typeName() == "timestamp_ntz"
    # nothing persisted: the memo is plans, not data
    assert all(
        df.storageLevel.useMemory is False
        and df.storageLevel.useDisk is False
        for df in _READER_MEMO.values()
    )
    clear_table_memo()
    assert not _READER_MEMO


def test_table_reader_memo_keyed_per_session(spark):
    """Entries are keyed by applicationId so a memoized plan can never
    be served to (or leak across) a different SparkSession."""
    clear_table_memo()
    table(spark, SF_DIR, "nation")
    app_id = spark.sparkContext.applicationId
    assert all(k[0] == app_id for k in _READER_MEMO)
    clear_table_memo()
