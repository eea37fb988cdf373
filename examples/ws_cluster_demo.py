"""Three-listener WebSocket fan-out — the reference's pub-sub topology.

The reference's ``pubsub.py`` runs THREE cluster nodes, each a
WebSocket listener on ports 8765-8767 (pubsub.py:33-41, README.md:84),
all fed from one Kafka consumer of ``emoji_topic``: every consumed
message is broadcast to every subscriber of every cluster. The engine
reproduces the topology with three ``StatsHttpServer`` instances
sharing ONE ``SseHub`` — a single ``hub.publish`` (wired to the
streaming fan-out sink in production: ``sse_fanout_sink``) reaches
every ``/ws`` and ``/events`` subscriber on every listener.

    python examples/ws_cluster_demo.py [base_port]

Starts the three listeners (base_port, +1, +2 — the reference's
8765-8767 by default), publishes a demo message, and leaves the
servers up until Ctrl-C. tests/test_serving.py pins the cross-listener
broadcast on ephemeral ports.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.serving import (  # noqa: E402
    SseHub,
    StatsHttpServer,
)


def main() -> None:
    base_port = int(sys.argv[1]) if len(sys.argv) > 1 else 8765
    hub = SseHub()
    servers = [
        StatsHttpServer(
            spark=None,  # endpoints that read sink state are unused here
            sink_table="unused",
            hub=hub,
            port=base_port + i,
        ).serve_background()
        for i in range(3)
    ]
    for i, s in enumerate(servers):
        print(f"cluster_{i}: ws://127.0.0.1:{s.port}/ws  ({s.url}/events)")
    hub.publish({"event_type": "demo", "scaled_count": 1})
    print("published a demo message to all listeners; Ctrl-C to stop")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        for s in servers:
            s.close()


if __name__ == "__main__":
    main()
