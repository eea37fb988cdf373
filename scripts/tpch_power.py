"""TPC-H-style power run: all 22 query shapes sequentially at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1), one JSON line with per-query
seconds and the geometric mean — the single-stream metric the benchmark
defines (the classic power@SF shape, not an official TPC-H result: the
fixture schema is adapted and partsupp is derived).

Usage: python scripts/tpch_power.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)

# Q4 is q_order_priority_counts; the rest follow the q_tpch_q{N} pattern.
TPCH_QUERIES = [
    ("q1", "q_tpch_q1"),
    ("q2", "q_tpch_q2"),
    ("q3", "q_tpch_q3"),
    ("q4", "q_order_priority_counts"),
    ("q5", "q_tpch_q5"),
    ("q6", "q_tpch_q6"),
    ("q7", "q_tpch_q7"),
    ("q8", "q_tpch_q8"),
    ("q9", "q_tpch_q9"),
    ("q10", "q_tpch_q10"),
    ("q11", "q_tpch_q11"),
    ("q12", "q_tpch_q12"),
    ("q13", "q_tpch_q13"),
    ("q14", "q_tpch_q14"),
    ("q15", "q_tpch_q15"),
    ("q16", "q_tpch_q16"),
    ("q17", "q_tpch_q17"),
    ("q18", "q_tpch_q18"),
    ("q19", "q_tpch_q19"),
    ("q20", "q_tpch_q20"),
    ("q21", "q_tpch_q21"),
    ("q22", "q_tpch_q22"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="tpch_power")
    specs = all_specs()

    # warm JVM + parquet footers so q1 doesn't absorb first-touch costs
    specs["q_tpch_q6"].fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    for label, name in TPCH_QUERIES:
        t0 = time.perf_counter()
        n = specs[name].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        per_query[label] = round(dt, 4)
        print(f"# {label} ({name}): {n} rows in {dt:.3f}s", file=sys.stderr)

    total = sum(per_query.values())
    geomean = math.exp(
        sum(math.log(max(t, 1e-4)) for t in per_query.values())
        / len(per_query)
    )
    print(
        json.dumps(
            {
                "metric": "tpch_power_total",
                "value": round(total, 4),
                "unit": "sec",
                "geomean_sec": round(geomean, 4),
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
