"""Round-11 PQ-family profiler: per-query construct / explain / noop-exec
times (guide §1.4) for the product-quantization query family, whose cost
is dominated by driver-side expression-tree construction (round-10
verdict item 1). Usage: python scripts/pq_profile.py [sf_dir] [q ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)

PQ_FAMILY = [
    "q_ann_pq_adc",
    "q_pq_train_audit",
    "q_ann_ivf_pq",
    "q_ann_ivf_pq_twolevel",
    "q_ann_ivfpq_residual",
    "q_pq_residual_audit",
    "q_ann_ivfpq_residual_multiprobe",
    "q_pq_multiprobe_audit",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or PQ_FAMILY
    spark = build_session(app_name="pq_profile")
    specs = all_specs()
    total = 0.0
    print("query\tconstruct_s\texplain_s\texec_s\ttotal_s")
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"pq_profile: {name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        total += t3 - t0
        print(
            f"{name}\t{t1 - t0:.2f}\t{t2 - t1:.2f}\t{t3 - t2:.2f}"
            f"\t{t3 - t0:.2f}",
            flush=True,
        )
    print(f"TOTAL\t\t\t\t{total:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
