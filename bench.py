"""Headline benchmark: runs the registry's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is fully materialized (count + a cheap checksum collect) so the
measured time includes the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    headline_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (
    build_session,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # load-gated start (round-9 verdict item 8: BENCH_r09 was flagged
    # not-comparable by its own load warning — a noisy co-tenant made
    # same-code runs swing 21.8-39.9 s). If the host is already loaded,
    # WAIT for it to quiet down (poll every 15 s, up to
    # $SPARK_GRAFT_BENCH_LOAD_WAIT seconds, default 600) before
    # measuring anything; only after the budget expires do we proceed
    # and let `readable: false` flag the run. The committed per-round
    # number is then the min over 2 passes STARTED on a quiet host.
    wait_budget = float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "600")
    )
    load_waited = 0.0
    while os.getloadavg()[0] > 2.0 and load_waited < wait_budget:
        print(
            f"# load1 {os.getloadavg()[0]:.2f} > 2 — waiting for a "
            f"quiet host ({load_waited:.0f}/{wait_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        load_waited += 15
    # stamp host load BEFORE the run: a loaded host inflates every number
    # uniformly (round-5's apparent 35% "regression" was load-average 4+),
    # so the JSON carries the context needed to read absolutes correctly
    load1_pre = round(os.getloadavg()[0], 2)
    spark = build_session(app_name="engine_bench")
    specs = headline_specs()

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not first-touch class loading
    next(iter(specs.values())).fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    total = 0.0

    # Build the session-level caches (hashed shingle sets for the dedup
    # tiers) up front and report the cost as its OWN line item — otherwise
    # the first dedup query's timing absorbs it and per-query numbers
    # aren't comparable across rounds.
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
        _hashed_shingle_sets,
    )

    # cold/warm pair: `cache_build` is the one-time materialization (the
    # only number a cold cluster pays; compare it round-over-round against
    # the documented cold reference in NOTES, not against a warm rerun),
    # `cache_warm` is a second count over the persisted blocks — if THAT
    # is slow the host is throttled and the whole run's absolutes are
    # suspect (round 3's 2.58 s vs 0.27 s confusion).
    t0 = time.perf_counter()
    _hashed_shingle_sets(spark, sf_dir).count()
    cache_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    _hashed_shingle_sets(spark, sf_dir).count()
    cache_warm = time.perf_counter() - t0
    per_query["cache_build"] = round(cache_build, 4)
    per_query["cache_warm"] = round(cache_warm, 4)
    total += cache_build
    print(
        f"# cache_build: {cache_build:.3f}s (warm recount {cache_warm:.3f}s)",
        file=sys.stderr,
    )
    # Two FULL PASSES over the headline set (round-8 verdict item: three
    # rounds of BENCH deltas needed forensics to read). Each query's
    # reported time is the min of its two samples — min measures the
    # query, not the scheduler, on a machine sharing cores with other
    # tenants — and the JSON carries BOTH pass totals so a reader can
    # see run-to-run spread (the cold-start trap: pass 1 of a fresh JVM
    # measured ~1.5× pass 2 on 2026-08-15) without re-running anything.
    pass_times: list[dict[str, float]] = [{}, {}]
    rows_seen: dict[str, int] = {}
    for p in range(2):
        for name, spec in sorted(specs.items()):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            rows_seen[name] = df.count()
            pass_times[p][name] = time.perf_counter() - t0
    for name in sorted(specs):
        best = min(pass_times[0][name], pass_times[1][name])
        per_query[name] = round(best, 4)
        total += best
        print(
            f"# {name}: {rows_seen[name]} rows in {best:.3f}s "
            f"(passes {pass_times[0][name]:.3f}/{pass_times[1][name]:.3f})",
            file=sys.stderr,
        )
    pass_totals = [
        round(sum(pt.values()), 4) for pt in pass_times
    ]
    # queries whose two samples disagree >2x ran under scheduler noise —
    # their min is still the best estimate, but flag them
    noisy = sorted(
        name
        for name in specs
        if max(pass_times[0][name], pass_times[1][name])
        > 2 * max(min(pass_times[0][name], pass_times[1][name]), 1e-9)
    )
    # `readable`: the one-bit verdict a cross-round reader can trust
    # without forensics — False means the host was already loaded when
    # the run started (same-code A/B spread measured 59% at load1 2.5),
    # so round-over-round comparison of THIS file is unsafe.
    readable = load1_pre <= 2.0
    if not readable:
        print(
            f"# WARNING: load1 {load1_pre} > 2 at start — timings are "
            "not comparable across rounds; rerun on a quiet host",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "pass_totals": pass_totals,
                "noisy_queries": noisy,
                "readable": readable,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_waited_sec": load_waited,
                "load1": load1_pre,
                "load1_post": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
