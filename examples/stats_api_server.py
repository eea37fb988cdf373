"""Serving-tier, LIVE: bind a real HTTP listener over the engine's
streaming state (SURVEY §2.1 S7/S8).

The reference runs a Flask process for the three analytics endpoints
(analytical_server.py:137-150) and an SSE relay of the live feed
(client.py:157-181). This example runs the engine twin end-to-end in one
process, stdlib transport only:

    synthetic wire stream -> decode -> windowed counts
        -> memory sink      (the /api/* state)
        -> SSE hub fan-out  (the /events feed)
        -> ThreadingHTTPServer on an ephemeral (or given) port

Run:  python examples/stats_api_server.py [seconds] [port]

then e.g.  curl http://127.0.0.1:<port>/api/stats
           curl -N http://127.0.0.1:<port>/events   (or ws://.../ws)
"""

from __future__ import annotations

import sys
import time
import urllib.request

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
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.serving import (  # noqa: E402
    SseHub,
    StatsHttpServer,
    sse_batch_sink,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.sinks import (  # noqa: E402
    fanout_foreach_batch,
    start_memory_sink,
)


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    spark = build_session(app_name="stats_api_server", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wire = synthetic_wire_stream(spark, rows_per_second=200)
    events = decode_wire_events(wire).withColumnRenamed(
        "emoji_type", "event_type"
    )
    counts = windowed_counts_scaled(events, window_dur="10 seconds")

    mem_q = start_memory_sink(counts, "stats_api_live", output_mode="update")
    hub = SseHub()
    sse_q = fanout_foreach_batch(
        counts, [sse_batch_sink(hub)], query_name="sse_fanout"
    )

    server = StatsHttpServer(
        spark, "stats_api_live", hub=hub, port=port
    ).serve_background()
    print(f"listening on {server.url}  (endpoints: /api/stats "
          f"/api/emoji-data /api/total-data /events /ws)")

    try:
        time.sleep(seconds)
        mem_q.processAllAvailable()
        # prove the listener is really bound: fetch through the socket
        with urllib.request.urlopen(f"{server.url}/api/stats", timeout=10) as r:
            print("GET /api/stats ->", r.read().decode())
    finally:
        server.close()
        sse_q.stop()
        mem_q.stop()
        spark.stop()


if __name__ == "__main__":
    main()
