"""Streaming throughput check against the reference's design target.

The reference's envelope (BASELINE.md): 1000 emojis/s × 100 clients ≈
100k events/s aggregate ingest. This script drives the engine's full
streaming pipeline — wire-JSON encode → from_json decode → timestamp
parse → watermarked tumbling-window count + scaled_count — from the rate
source at a configurable rate and reports the sustained processed
rows/s from the query's own progress metrics.

Run: python scripts/streaming_throughput.py [rows_per_second] [seconds]
Prints one JSON line: {"metric": "streaming_events_per_sec", ...}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.sources.streams import (  # noqa: E402
    synthetic_wire_stream,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.core import (  # noqa: E402
    decode_wire_events,
    windowed_counts_scaled,
)

def main(rate: int = 200_000, run_seconds: int = 30) -> None:
    spark = build_session(app_name="streaming_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    raw = synthetic_wire_stream(spark, rows_per_second=rate)
    events = decode_wire_events(raw).withColumnRenamed("emoji_type", "event_type")
    counts = windowed_counts_scaled(events, window_dur="10 seconds")

    q = (
        counts.writeStream.outputMode("update")
        .format("noop")
        .trigger(processingTime="2 seconds")
        .start()
    )
    time.sleep(run_seconds)
    progress = q.recentProgress
    q.stop()

    # skip the first 25% of batches (warm-up / backlog catch-up)
    rates = [
        p["processedRowsPerSecond"]
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    rates = rates[max(1, len(rates) // 4):]
    sustained = sum(rates) / len(rates) if rates else 0.0
    print(
        json.dumps(
            {
                "metric": "streaming_events_per_sec",
                "value": round(sustained, 1),
                "unit": "rows/sec",
                "offered_rate": rate,
                "n_batches": len(rates),
                "target": 100_000,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    main(rate, secs)
