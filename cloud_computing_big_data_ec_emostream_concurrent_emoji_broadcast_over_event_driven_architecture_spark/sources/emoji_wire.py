"""``emoji_wire`` — a custom Python DataSource (Spark 4 DataSource API)
for the reference's wire format.

The reference's ingest edge is a Flask gateway POSTing JSON events into
Kafka (api_server.py:33-47); its wire record is
``{"user_id", "emoji_type", "timestamp"}`` (client.py:47-51). This
source is that edge as an ENGINE-NATIVE connector: a deterministic
generator of wire-format payloads registered as a real DataFrame source

    spark.dataSource.register(EmojiWireDataSource)
    spark.read.format("emoji_wire").option("rows", 1000).load()
    spark.readStream.format("emoji_wire").option("rows_per_batch", 500).load()

Batch reads are PARTITIONED (``partitions`` option, default 4): each
partition generates its own row range, so the source scales out like
any file source instead of funneling through the driver. The streaming
form is a ``SimpleDataSourceStreamReader`` whose offset is the row
index — replayable micro-batches, exactly-once under checkpointing (the
offset log replays identical rows after restart).

Python DataSources are the SLOW path by design (rows cross the
Python↔JVM boundary); the JVM fast path for load generation remains
``synthetic_wire_stream`` (rate source + to_json). The value here is
the CONNECTOR SHAPE: schema declaration, option handling, partition
planning, and offset semantics — the template a real HTTP/queue ingest
adapter fills in with network reads. Determinism (seeded by row index,
like client.py's automated sender loop) makes every read oracle-able.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EMOJI_VOCAB = ["👍", "❤️", "😂", "🎉", "😢", "🔥", "👏", "🏆", "😮", "💔"]
BASE_TS = 1704067200  # 2024-01-01T00:00:00Z


def wire_payload(i: int) -> str:
    """Deterministic wire JSON for global row index ``i`` — the same
    record shape every reference producer emits."""
    sec, micro = divmod(i, 1000)
    ts = BASE_TS + sec
    # ISO-8601 with 6-digit micros — the reference's isoformat() wire form
    import datetime

    iso = datetime.datetime.fromtimestamp(
        ts, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S") + f".{micro * 1000:06d}"
    return json.dumps(
        {
            "user_id": f"user_{i % 100}",
            "emoji_type": EMOJI_VOCAB[i % len(EMOJI_VOCAB)],
            "timestamp": iso,
        },
        ensure_ascii=False,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EmojiWireBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        chunk = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(lo, min(lo + chunk, self.n_rows))
            for lo in range(0, self.n_rows, chunk)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (wire_payload(i),)


class EmojiWireStreamReader(SimpleDataSourceStreamReader):
    """Offset = next global row index; each micro-batch is a replayable
    row range, so checkpoint recovery re-reads identical data."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 10**9))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return (
            iter([(wire_payload(i),) for i in range(lo, hi)]),
            {"index": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [(wire_payload(i),) for i in range(start["index"], end["index"])]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — the generator is stateless


class EmojiWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "emoji_wire"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> EmojiWireBatchReader:
        return EmojiWireBatchReader(self.options)

    def simpleStreamReader(self, schema) -> EmojiWireStreamReader:
        return EmojiWireStreamReader(self.options)
