"""End-to-end demo of the reference topology, engine-style.

The reference wires: senders → Flask gateway → Kafka → {Spark windowed
counts → console, Python rolling analytics → HTTP, WebSocket fan-out}.
This demo runs the same shape on one SparkSession with no broker:

  rate source (synthetic senders, reference client.py:47-51)
    → JSON wire encode/decode round-trip (the Kafka byte contract)
    → windowed counts + scaled_count, UPDATE mode, 2 s trigger
        ├─ fan-out sink A: console (reference spark_consumer.py:49-53)
        ├─ fan-out sink B: in-process "dashboard" dict (the stats API's
        │                  data source, reference analytical_server.py)
        └─ memory sink: 3-minute sliding rolling counts (the analytics
                        service's rolling window, watermark-evicted)

Run:  python examples/streaming_demo.py [seconds]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.sources.streams import (  # noqa: E402
    synthetic_wire_stream,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.core import (  # noqa: E402
    decode_wire_events,
    sliding_rolling_counts,
    windowed_counts_scaled,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.sinks import (  # noqa: E402
    fanout_foreach_batch,
    start_memory_sink,
)

def main(run_seconds: int = 20) -> None:
    spark = build_session(app_name="streaming_demo")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic senders: rate source → the reference's wire JSON
    raw = synthetic_wire_stream(spark, rows_per_second=2000)
    events = decode_wire_events(raw).withColumnRenamed("emoji_type", "event_type")

    counts = windowed_counts_scaled(events, window_dur="10 seconds")

    dashboard: dict[str, int] = {}

    def console_sink(bdf, batch_id):
        rows = bdf.orderBy(F.desc("cnt")).limit(5).collect()
        print(f"--- batch {batch_id}: top windows ---")
        for r in rows:
            print(
                f"  {r['event_type']}  {r['window']['start']:%H:%M:%S} "
                f"cnt={r['cnt']} scaled={r['scaled_count']}"
            )

    def dashboard_sink(bdf, batch_id):
        for r in bdf.collect():
            dashboard[r["event_type"]] = (
                dashboard.get(r["event_type"], 0) + r["cnt"]
            )

    q1 = fanout_foreach_batch(
        counts,
        [console_sink, dashboard_sink],
        output_mode="update",
        query_name="fanout_demo",
        trigger="2 seconds",
    )
    q2 = start_memory_sink(
        sliding_rolling_counts(events, window_dur="60 seconds", slide="10 seconds"),
        "rolling_demo",
        output_mode="update",
        trigger="2 seconds",
    )

    time.sleep(run_seconds)
    q1.stop()
    q2.stop()

    print("\n=== dashboard totals (emoji_breakdown twin) ===")
    for k, v in sorted(dashboard.items(), key=lambda kv: -kv[1]):
        print(f"  {k}  {v}")
    print("\n=== rolling window state (last 5) ===")
    for r in (
        spark.sql(
            "SELECT event_type, window.end AS w_end, cnt FROM rolling_demo"
        )
        .orderBy(F.desc("w_end"), F.desc("cnt"))
        .limit(5)
        .collect()
    ):
        print(f"  {r['event_type']}  {r['w_end']:%H:%M:%S}  cnt={r['cnt']}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
