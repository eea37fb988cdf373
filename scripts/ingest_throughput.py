"""End-to-end ingest front-door measurement (round-8 verdict item 5).

Drives the reference's ingest topology at load: N client PROCESSES
(the reference's sender shape — client.py:55-81 posts JSON
{user_id, emoji_type, timestamp} in a loop; separate processes so the
load generator never GIL-throttles the servers it measures) → M
sharded gateway processes (one Python gateway is GIL-bound to a few
thousand POSTs/s; the reference's ~100k events/s envelope is an
AGGREGATE across horizontally scaled front doors, so the aggregate is
what this measures) → each gateway's bounded queue → ≤1000-or-0.5 s
spool flusher (per-instance file prefixes, shared spool namespace) →
ONE Structured Streaming file source → schema-checked wire decode —
the reference's whole pipeline minus only the Kafka hop (no broker in
this sandbox).

Reported per run (ONE JSON line on stdout):
- accepted / rejected_503 / errors and accepted_per_sec over the POST
  phase (client-observed 200s — the gateway-side aggregate),
- streamed_rows (rows OUT of the streaming decode — must equal
  accepted: nothing lost between ACK and query result),
- spool-to-result latency per micro-batch: wall-clock at batch
  completion minus the send-time embedded in each message's payload
  timestamp; p50/p95 over batches of the batch-max (oldest row's)
  latency.

Run: python scripts/ingest_throughput.py [n_gateways] [n_clients] [seconds]
Exits non-zero when fewer than MIN_BATCHES micro-batches completed or
accepted != streamed_rows (a silent-loss measurement is worse than a
crash — the streaming_throughput.py precedent).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import sys
import tempfile
import time
from datetime import timezone

sys.path.insert(0, ".")

MIN_BATCHES = 3


def _gateway_proc(spool: str, port_q, stop_evt, result_q) -> None:
    """One sharded front-door instance: serve until told to stop, then
    close (final drain included) and report its accepted/flushed."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.ingest import (  # noqa: E501
        IngestGateway,
    )

    gw = IngestGateway(spool).serve_background()
    port_q.put(gw.port)
    stop_evt.wait()
    gw.close()
    result_q.put(("gateway", gw.accepted_count, gw.flushed_count))


def _client_proc(port: int, client_id: int, secs: float, result_q) -> None:
    """One sender on a persistent keep-alive connection; the payload
    timestamp IS the send time (the streaming side reads it back for
    spool-to-result latency)."""
    import http.client
    from datetime import datetime

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    ok = full = err = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        body = json.dumps(
            {
                "user_id": f"u{client_id}",
                "emoji_type": "\U0001f525",
                "timestamp": datetime.now(timezone.utc).strftime(
                    "%Y-%m-%dT%H:%M:%S.%f"
                ),
            }
        )
        try:
            conn.request(
                "POST",
                "/send_emoji",
                body=body,
                headers={"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            resp.read()
            if resp.status == 200:
                ok += 1
            elif resp.status == 503:
                full += 1
            else:
                err += 1
        except (http.client.HTTPException, OSError):
            err += 1
            conn.close()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.close()
    result_q.put(("client", ok, full, err))


def _rss_kb(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        return None
    return None


def main(
    n_gateways: int = 4,
    n_clients: int = 16,
    run_seconds: int = 15,
    clean: str | None = None,
) -> int:
    """``clean`` + the per-minute/RSS/file-count reporting below are the
    round-9 sustained-soak instrumentation: a ≥10-minute run must show
    flat per-minute latency (no file-listing degradation), flat gateway
    RSS (no leak in the long-lived front doors), and — with
    clean='delete' — a bounded spool directory."""
    from pyspark.sql import functions as F

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E501
        build_session,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.ingest import (  # noqa: E501
        ingest_stream,
    )

    spool = tempfile.mkdtemp(prefix="ingest_spool_")
    ctx = mp.get_context("spawn")
    port_q, result_q = ctx.Queue(), ctx.Queue()
    stop_evt = ctx.Event()
    gateways = [
        ctx.Process(target=_gateway_proc, args=(spool, port_q, stop_evt, result_q))
        for _ in range(n_gateways)
    ]
    for g in gateways:
        g.start()
    ports = [port_q.get(timeout=60) for _ in range(n_gateways)]

    spark = build_session(app_name="ingest_throughput")
    spark.sparkContext.setLogLevel("ERROR")
    batch_stats: list[tuple[float, int, float]] = []  # (wall, rows, lat_max)

    def observe(batch_df, _bid) -> None:
        row = batch_df.agg(
            F.count("*").alias("n"), F.min("ts").alias("oldest")
        ).first()
        wall = time.time()
        if row["n"]:
            oldest = row["oldest"].replace(tzinfo=timezone.utc).timestamp()
            batch_stats.append((wall, int(row["n"]), wall - oldest))

    q = (
        ingest_stream(spark, spool, clean=clean)
        .writeStream.foreachBatch(observe)
        .option("checkpointLocation", spool + "_ckpt")
        .trigger(processingTime="1 second")
        .start()
    )

    # soak monitors: gateway RSS every 15 s (leak check on the
    # long-lived front doors) and the source's trigger/listing duration
    # every 5 s (file-listing degradation check) — both threads, zero
    # load on the measured path.
    import threading

    rss_samples: list[tuple[float, int]] = []  # (wall, max RSS kB)
    trig_samples: list[tuple[float, float]] = []  # (wall, triggerExec ms)
    mon_stop = threading.Event()

    def _monitor() -> None:
        last_tick = 0.0
        while not mon_stop.is_set():
            now = time.time()
            p = q.lastProgress
            if p and p.get("durationMs"):
                te = p["durationMs"].get("triggerExecution")
                if te is not None:
                    trig_samples.append((now, float(te)))
            if now - last_tick >= 15:
                last_tick = now
                rss = [_rss_kb(g.pid) for g in gateways]
                rss = [r for r in rss if r]
                if rss:
                    rss_samples.append((now, max(rss)))
            mon_stop.wait(5)

    mon = threading.Thread(target=_monitor, daemon=True)
    mon.start()

    clients = [
        ctx.Process(
            target=_client_proc,
            args=(ports[i % n_gateways], i, float(run_seconds), result_q),
        )
        for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for c in clients:
        c.start()
    for c in clients:
        c.join()
    post_wall = time.perf_counter() - t0

    accepted = rejected = errors = 0
    for _ in range(n_clients):
        kind, *vals = result_q.get(timeout=60)
        assert kind == "client"
        accepted += vals[0]
        rejected += vals[1]
        errors += vals[2]

    # stop the gateways (their close() final-drains), then let the
    # stream catch up to every accepted row
    stop_evt.set()
    gw_accepted = gw_flushed = 0
    for _ in range(n_gateways):
        kind, a, f = result_q.get(timeout=120)
        assert kind == "gateway"
        gw_accepted += a
        gw_flushed += f
    for g in gateways:
        g.join(timeout=30)
    deadline = time.monotonic() + 90
    while time.monotonic() < deadline:
        if sum(n for _, n, _ in batch_stats) >= accepted:
            break
        time.sleep(0.5)
    mon_stop.set()
    mon.join(timeout=10)
    import os

    spool_files_end = sum(
        1 for f in os.listdir(spool) if not f.startswith(".")
    )
    q.stop()
    spark.stop()

    streamed = sum(n for _, n, _ in batch_stats)
    lats = sorted(lat for _, _, lat in batch_stats)

    # per-minute rollup of the batch stats (soak trend: latency must be
    # flat minute over minute, or the source is degrading)
    minutes: list[dict] = []
    if batch_stats:
        tmin = min(w for w, _, _ in batch_stats)
        by_min: dict[int, list[tuple[int, float]]] = {}
        for w, nrows, lat in batch_stats:
            by_min.setdefault(int((w - tmin) // 60), []).append((nrows, lat))
        for m in sorted(by_min):
            ls = sorted(lat for _, lat in by_min[m])
            minutes.append(
                {
                    "minute": m,
                    "rows": sum(nr for nr, _ in by_min[m]),
                    "lat_p50_s": round(statistics.median(ls), 3),
                    "lat_p95_s": round(ls[int(0.95 * (len(ls) - 1))], 3),
                }
            )
    t0s = trig_samples[0][0] if trig_samples else 0.0
    trig_first = [t for w, t in trig_samples if w - t0s < 60]
    trig_last = [t for _, t in trig_samples[-12:]]
    result = {
        "metric": "ingest_accepted_per_sec",
        "value": round(accepted / post_wall, 1),
        "unit": "events/sec",
        "n_gateways": n_gateways,
        "n_clients": n_clients,
        "post_seconds": round(post_wall, 2),
        "accepted": accepted,
        "rejected_503": rejected,
        "errors": errors,
        "rejected_rate": round(
            rejected / max(1, accepted + rejected), 4
        ),
        "gateway_accepted": gw_accepted,
        "gateway_flushed": gw_flushed,
        "streamed_rows": streamed,
        "n_batches": len(batch_stats),
        "latency_batch_max_p50_s": round(statistics.median(lats), 3)
        if lats
        else None,
        "latency_batch_max_p95_s": round(lats[int(0.95 * (len(lats) - 1))], 3)
        if lats
        else None,
        "target": 100_000,
        "clean_source": clean or "off",
        "spool_files_end": spool_files_end,
        "per_minute": minutes,
        "gw_rss_kb_first": rss_samples[0][1] if rss_samples else None,
        "gw_rss_kb_last": rss_samples[-1][1] if rss_samples else None,
        "trigger_ms_first_min": round(
            statistics.mean(trig_first), 1
        )
        if trig_first
        else None,
        "trigger_ms_last": round(
            statistics.mean(trig_last), 1
        )
        if trig_last
        else None,
    }
    ok = (
        len(batch_stats) >= MIN_BATCHES
        and streamed == accepted
        and gw_flushed == accepted
    )
    print(json.dumps(result))
    if not ok:
        print(
            json.dumps(
                {
                    "error": "incomplete_measurement",
                    "why": "too few batches or accepted != flushed/streamed",
                }
            ),
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    ngw = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ncl = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    cln = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(ngw, ncl, secs, clean=None if cln in (None, "off") else cln))
