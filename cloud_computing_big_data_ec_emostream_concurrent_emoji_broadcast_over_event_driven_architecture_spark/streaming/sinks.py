"""Streaming sinks (SURVEY.md §2.1 S4-S8 equivalents).

The reference fans every Kafka message out to every WebSocket cluster
(pubsub.py:98-103) and serves aggregation state over HTTP
(analytical_server.py:137-150). The engine's equivalents:

- ``fanout_foreach_batch``: one query, N sink callables per micro-batch —
  the broadcast fan-out (S6) without hand-rolled consumer loops. Exactly-
  once per sink is the sink's job (idempotent writes keyed by batch_id).
- ``start_memory_sink``: named in-memory table — the queryable state the
  HTTP tier reads (S8), also the test harness's observation point.
- ``start_kafka_sink``: the S4 producer path (requires the Kafka connector
  jar on the classpath; import-try gated at call time).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

BatchSink = Callable[[DataFrame, int], None]


def fanout_foreach_batch(
    df: DataFrame,
    sinks: Sequence[BatchSink],
    output_mode: str = "update",
    query_name: str = "fanout",
    trigger: str | None = None,
) -> StreamingQuery:
    """Every micro-batch is delivered to every sink — the engine's form of
    the reference's all-clusters broadcast (pubsub.py:98-103). The batch
    frame is persisted once so N sinks don't recompute the plan N times."""

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    writer = df.writeStream.outputMode(output_mode).queryName(query_name)
    if trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.foreachBatch(deliver).start()


def start_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "update",
    trigger: str | None = None,
) -> StreamingQuery:
    """Aggregation state as a queryable in-memory table
    (``spark.sql(f"SELECT * FROM {query_name}")``)."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
    )
    if trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def start_kafka_sink(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> StreamingQuery:
    """Kafka producer sink (reference api_server.py:19-47's micro-batching
    producer, done by the engine: trigger = the batch clock, checkpoint =
    the delivery ledger). Needs the spark-sql-kafka connector jar."""
    from pyspark.sql import functions as F

    payload = df.select(
        F.to_json(F.struct(*df.columns)).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )
