"""Round-10 plan audit: render every registered query's physical plan
and flag optimization smells (guide §7.2), without executing the
queries (explain only; session-memo builders may still run their
one-time training jobs).

Smells flagged per query:
- ``rescan``: the same parquet file scanned more than once (duplicated
  subtree — a candidate for one-pass restructuring);
- ``md5_filter``: md5()/sha2() evaluated inside a Filter node (usually
  an inferred isnotnull pushed below the projection that was supposed
  to compute the hash once);
- ``windows``: number of Window nodes (re-derived windows show up as
  2+ with identical partitioning);
- ``exchanges``: Exchange count in the rendered tree (includes cached
  lineage — read relatively, not absolutely).

Usage: python scripts/plan_audit.py [sf_dir] > audit.tsv
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan_audit")
    specs = all_specs()
    print("query\tconstruct_s\texplain_s\texchanges\twindows\tscans\tmax_rescan\tmd5_in_filter\tunions")
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERR construct: {ex}")
            continue
        t1 = time.perf_counter()
        try:
            plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"  # noqa: SLF001
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERR explain: {ex}")
            continue
        t2 = time.perf_counter()
        scans = re.findall(r"file:[^\s\]]+\.parquet", plan)
        from collections import Counter

        sc = Counter(scans)
        max_rescan = max(sc.values()) if sc else 0
        # md5/sha2 inside Filter node detail blocks
        md5_filter = 0
        for m in re.finditer(r"\(\d+\) Filter[^\n]*\nInput[^\n]*\nCondition : ([^\n]*)", plan):
            md5_filter += m.group(1).count("md5(") + m.group(1).count("sha2(")
        print(
            f"{name}\t{t1 - t0:.3f}\t{t2 - t1:.3f}"
            f"\t{plan.count('Exchange (') + plan.count('BroadcastExchange (')}"
            f"\t{plan.count('Window (')}"
            f"\t{len(scans)}\t{max_rescan}\t{md5_filter}"
            f"\t{plan.count('Union (')}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
