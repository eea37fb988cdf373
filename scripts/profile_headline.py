"""Profiling harness for the optimization rounds (guide §1).

For each headline query (or a named subset): capture
``.explain("formatted")`` to ``plans/<tag>/<name>.txt`` and time the
computation through the **noop sink** (guide §1.4 — every column of
every row materialized, no sink cost, no driver collect), labelled via
``setJobDescription``. Prints one line per query and a JSON summary.

Usage::

    python scripts/profile_headline.py <suffix> [q_name ...]

Writes plans to plans/r10/<name>_<suffix>.txt (the round-10 deliverable
layout).  Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
Two passes, min taken, same methodology as bench.py so numbers are
comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
    headline_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "profile"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join("plans", "r10")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(app_name=f"profile_{tag}")
    specs = headline_specs() if not names else {
        n: s for n, s in all_specs().items() if n in names
    }
    missing = set(names) - set(specs)
    if missing:
        print(f"unknown queries: {sorted(missing)}", file=sys.stderr)
        sys.exit(2)

    # Warm JVM/readers once (same as bench.py).
    next(iter(specs.values())).fn(spark, sf_dir).count()

    per: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        samples = []
        for _ in range(2):
            df = spec.fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        per[name] = round(min(samples), 4)
        print(
            f"# {name}: noop {per[name]:.3f}s "
            f"(passes {samples[0]:.3f}/{samples[1]:.3f}) "
            f"exchanges={plan.count('Exchange')} "
            f"python={plan.count('EvalPython') + plan.count('MapInArrow')}",
            file=sys.stderr,
        )
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "noop_sec": per}))
    spark.stop()


if __name__ == "__main__":
    main()
