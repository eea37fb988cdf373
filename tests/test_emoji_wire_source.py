"""The emoji_wire custom Python DataSource: partitioned batch reads,
replayable streaming micro-batches, and decode parity with the engine's
wire contract."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.sources.emoji_wire import (
    EMOJI_VOCAB,
    EmojiWireDataSource,
    wire_payload,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.core import (
    decode_wire_events,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(EmojiWireDataSource)


def test_batch_read_partitioned_and_deterministic(spark):
    df = (
        spark.read.format("emoji_wire")
        .option("rows", 250)
        .option("partitions", 4)
        .load()
    )
    assert df.schema.simpleString() == "struct<value:string>"
    rows = [r["value"] for r in df.collect()]
    assert len(rows) == 250
    # deterministic: the multiset of payloads equals the generator's
    assert sorted(rows) == sorted(wire_payload(i) for i in range(250))
    # actually partitioned — not one driver-side iterator
    assert df.rdd.getNumPartitions() == 4


def test_decode_parity_with_wire_contract(spark):
    raw = spark.read.format("emoji_wire").option("rows", 100).load()
    decoded = decode_wire_events(raw)
    got = decoded.agg(
        F.count("*").alias("n"),
        F.sum(F.col("ts").isNull().cast("int")).alias("bad_ts"),
        F.countDistinct("emoji_type").alias("n_emoji"),
    ).first()
    assert got["n"] == 100
    assert got["bad_ts"] == 0, "every generated timestamp must parse"
    assert got["n_emoji"] == len(EMOJI_VOCAB)


def test_stream_micro_batches_replayable(spark, tmp_path):
    name = f"wire_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("emoji_wire")
        .option("rows_per_batch", 40)
        .option("max_rows", 120)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # Python stream sources don't implement Trigger.AvailableNow; drain
    # with processAllAvailable (the reader stops advancing at max_rows)
    q.processAllAvailable()
    q.stop()
    rows = [r["value"] for r in spark.sql(f"SELECT * FROM {name}").collect()]
    assert sorted(rows) == sorted(wire_payload(i) for i in range(120))


def test_read_jsonl_events_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """JSONL export -> read back with the declared boundary schema:
    every row survives with its exact microsecond timestamp, and a
    corrupt line lands in _corrupt_record instead of failing the job."""
    import json as _json

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table as cat_table,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.sources.streams import (
        read_jsonl_events,
    )
    from pyspark.sql import functions as F

    ev = cat_table(spark, sf_dir, "events").limit(200)
    rows = ev.collect()
    path = tmp_path / "events.jsonl"
    with open(path, "w") as f:
        for r in rows:
            d = r.asDict()
            d["ts"] = d["ts"].isoformat()
            if "." not in d["ts"]:
                d["ts"] += ".000000"
            f.write(_json.dumps(d) + "\n")
        f.write("{not valid json\n")

    # cache before touching _corrupt_record alone — Spark refuses
    # corrupt-column-only queries over the raw files (documented
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN workaround)
    back = read_jsonl_events(spark, str(path)).cache()
    good = back.filter(F.col("_corrupt_record").isNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    got = {
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in good.collect()
    }
    expected = {
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in rows
    }
    assert got == expected
