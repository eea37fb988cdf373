"""Serving-tier demo: the reference's three JSON endpoints read straight
off the engine's memory sink (SURVEY §2.1 S8).

The reference serves `/api/stats`, `/api/emoji-data` and
`/api/total-data` from a hand-rolled in-Python aggregator
(reference analytical_server.py:96-150). Engine-side, the SAME payloads
are one memory-sink table away: a streaming windowed count in update
mode keeps the per-(type, minute) table current, and each endpoint is a
small DataFrame query over it — no second aggregation system, no lock.
This script runs the stream for a few seconds, then prints the three
JSON payloads exactly in the reference's shapes (Flask would just
`jsonify` these dicts; the HTTP wrapper is presentation, not engine).

Run:  python examples/stats_api_demo.py [seconds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

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
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.sinks import (  # noqa: E402
    start_memory_sink,
)

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.serving import (  # noqa: E402
    api_emoji_data,
    api_stats,
    api_total_data,
)


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = build_session(app_name="stats_api_demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wire = synthetic_wire_stream(spark, rows_per_second=200)
    # wire field is emoji_type (the reference's name); the engine's
    # generalized key column is event_type
    events = decode_wire_events(wire).withColumnRenamed(
        "emoji_type", "event_type"
    )
    # 10 s windows so a seconds-long demo produces several buckets
    counts = windowed_counts_scaled(events, window_dur="10 seconds")
    q = start_memory_sink(counts, "stats_api", output_mode="update")
    time.sleep(seconds)
    q.processAllAvailable()

    print("GET /api/stats ->")
    print(json.dumps(api_stats(spark, "stats_api"), indent=2, sort_keys=True))
    total = api_total_data(spark, "stats_api")
    print(f"GET /api/total-data -> {len(total)} minute buckets")
    print(json.dumps(total[-2:], indent=2))
    emoji = api_emoji_data(spark, "stats_api")
    print(f"GET /api/emoji-data -> {len(emoji)} types")
    first = sorted(emoji)[0]
    print(json.dumps({first: emoji[first][-2:]}, indent=2))

    q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
