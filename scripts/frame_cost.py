"""Measure the incremental RHP bit-frame maintenance cost (round-9
verdict item 5 acceptance): a delta append must cost ∝ batch, not ∝
corpus, and the store-served frame must be bit-identical to the
from-scratch fold.

Protocol (mirrors the index-append measurement): build the store from
scratch at ``base_dir`` (pays the full N-vector fold once), then point
the SAME store at ``delta_dir`` — a strict superset fixture (e.g. 110
clone copies over 100) — so the update folds ONLY the new vectors. The
parity leg re-slices the store at the delta fixture's dials and
compares against the in-session scratch fold (exact integer bits, so
``exceptAll`` both ways must be empty).

Usage: python scripts/frame_cost.py [base_dir] [delta_dir]
       (default /tmp/sfE100 /tmp/sfE110)
Prints one JSON line with full/delta wall seconds, appended/total rows,
and the parity verdict; exits non-zero on parity failure.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfE100"
    delta_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfE110"
    cores = os.environ.get("SPARK_GRAFT_SIM_CORES", "32")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("frame-cost")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.similarity import (  # noqa: E501
        _rhp_bits_frame,
        rhp_frame_load,
        rhp_frame_update,
    )

    store = tempfile.mkdtemp(prefix="rhp_frame_cost_") + "/frame"
    try:
        t0 = time.monotonic()
        full = rhp_frame_update(spark, base_dir, store)
        t_full = time.monotonic() - t0

        t0 = time.monotonic()
        delta = rhp_frame_update(spark, delta_dir, store)
        t_delta = time.monotonic() - t0

        # parity at the delta fixture's dials: store slice == scratch fold
        served = rhp_frame_load(spark, delta_dir, store)
        scratch = _rhp_bits_frame(spark, delta_dir)
        mismatch = (
            served.exceptAll(scratch).count()
            + scratch.exceptAll(served).count()
        )
        out = {
            "base": base_dir,
            "delta": delta_dir,
            "full_build_sec": round(t_full, 1),
            "full_rows": full["total"],
            "delta_append_sec": round(t_delta, 1),
            "delta_rows": delta["appended"],
            "total_rows": delta["total"],
            "parity_mismatch_rows": mismatch,
            "sec_per_krow_full": round(t_full / full["total"] * 1000, 3),
            "sec_per_krow_delta": round(
                t_delta / max(delta["appended"], 1) * 1000, 3
            ),
        }
        print(json.dumps(out))
        return 0 if mismatch == 0 else 1
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
