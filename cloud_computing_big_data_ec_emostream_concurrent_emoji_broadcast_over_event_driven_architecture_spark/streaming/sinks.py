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


def start_topk_sink(
    counts: DataFrame,
    query_name: str,
    k: int = 3,
    key_col: str = "event_type",
    window_col: str = "window",
    order_col: str = "cnt",
    output_mode: str = "complete",
) -> StreamingQuery:
    """Top-k per window on a STREAMING aggregate (the reference
    dashboard's 'top emojis right now' view, analytical_server.py:105-109
    recomputed per HTTP request). Rank functions aren't allowed directly
    on a streaming aggregation, so the rank runs inside ``foreachBatch``
    — per micro-batch, over the (small, window×key-sized) aggregate
    output, never over raw events — and lands in an in-memory view named
    ``query_name`` (the engine twin of the dashboard endpoint)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    def rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = W.partitionBy(window_col).orderBy(
            F.desc(order_col), F.asc(key_col)
        )
        ranked = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            # eager localCheckpoint MATERIALIZES the view's contents
            # inside the micro-batch — a lazy temp view would re-execute
            # the streaming state plan whenever it's next queried, which
            # is both wrong (stale state) and rejected by the state
            # store's commit validation
            .localCheckpoint(eager=True)
        )
        ranked.createOrReplaceGlobalTempView(query_name)
        from ..caches import swap_view_checkpoint

        swap_view_checkpoint(ranked, query_name)

    return (
        counts.writeStream.outputMode(output_mode)
        .queryName(f"{query_name}_src")
        .foreachBatch(rank_batch)
        .start()
    )
