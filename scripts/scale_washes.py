"""Round-11 re-measure of the two round-10 'local wash' rewrites at a
large events fixture (round-10 verdict item 3): q_stickiness_dau_wau and
q_funnel_multistep, NEW (shipped) form vs the committed pre-round-10
``_before`` form, noop-sink timed (guide §1.4), two passes, min.

The _before forms are reconstructed verbatim from git history
(e11e4e3~1 growth.py, b31621a~1 timeseries.py) against the live shared
helpers, so the comparison isolates exactly the rewritten dataflow.

Usage: python scripts/scale_washes.py [sf_dir]   (default /tmp/sfev100)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (  # noqa: E402
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.growth import (  # noqa: E402
    STICKINESS_WINDOW_DAYS,
    _cached_cells,
    q_stickiness_dau_wau,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.timeseries import (  # noqa: E402
    FUNNEL_WINDOW_SEC,
    q_funnel_multistep,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)


def old_stickiness(spark, sf_dir):
    """Pre-round-10 form (e11e4e3~1): 7x calendar-grid fan-out +
    count_distinct per endpoint."""
    cells = _cached_cells(spark, sf_dir)
    days = cells.select(F.col("day").alias("w_day")).distinct()
    grid = days.select(
        "w_day",
        F.explode(
            F.sequence(F.lit(0), F.lit(STICKINESS_WINDOW_DAYS - 1))
        ).alias("off"),
    ).select(
        "w_day", F.date_sub(F.col("w_day"), F.col("off")).alias("src_day")
    )
    wau = (
        grid.join(cells, F.col("src_day") == F.col("day"))
        .groupBy("w_day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .withColumnRenamed("w_day", "day")
    )
    dau = cells.groupBy("day").agg(F.count("*").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


def old_funnel(spark, sf_dir):
    """Pre-round-10 form (b31621a~1): steps 2/3 as two independent
    aggregation branches, each replaying the view-click join."""
    ev = table(spark, sf_dir, "events")
    W = FUNNEL_WINDOW_SEC
    bucket_of = lambda col: (F.unix_timestamp(col) / F.lit(W)).cast("long")  # noqa: E731

    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.explode(
            F.array(bucket_of(F.col("ts")), bucket_of(F.col("ts")) + 1)
        ).alias("bucket"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        bucket_of(F.col("ts")).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        bucket_of(F.col("ts")).alias("bucket"),
    )
    vc = (
        views.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("cts") > F.col("vts"))
            & (F.unix_timestamp("cts") - F.unix_timestamp("vts") <= W)
        )
        .select("user_id", "cts")
        .distinct()
    )
    vc_b = vc.select(
        "user_id",
        "cts",
        F.explode(
            F.array(bucket_of(F.col("cts")), bucket_of(F.col("cts")) + 1)
        ).alias("bucket"),
    )
    vcp = (
        vc_b.join(purchases, ["user_id", "bucket"])
        .filter(
            (F.col("pts") > F.col("cts"))
            & (F.unix_timestamp("pts") - F.unix_timestamp("cts") <= W)
        )
        .select("user_id")
    )
    s1 = ev.filter(F.col("event_type") == "view").agg(
        F.lit(1).alias("step"), F.countDistinct("user_id").alias("n_users")
    )
    s2 = vc.agg(
        F.lit(2).alias("step"), F.countDistinct("user_id").alias("n_users")
    )
    s3 = vcp.agg(
        F.lit(3).alias("step"), F.countDistinct("user_id").alias("n_users")
    )
    return s1.unionByName(s2).unionByName(s3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfev100"
    spark = build_session(app_name="scale_washes")
    pairs = [
        ("stickiness_old", old_stickiness),
        ("stickiness_new", q_stickiness_dau_wau),
        ("funnel_old", old_funnel),
        ("funnel_new", q_funnel_multistep),
    ]
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(2):
        for name, fn in pairs:
            spark.sparkContext.setJobDescription(f"scale_washes: {name}")
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
            rows[name] = df.count()
            print(f"{name}: {dt:.3f}s ({rows[name]} rows)", flush=True)
    print("MIN:", {k: round(v, 3) for k, v in best.items()})
    # result parity old vs new at this fixture (multiset of rows)
    fns = dict(pairs)
    for q in ("stickiness", "funnel"):
        a = sorted(map(tuple, fns[q + "_old"](spark, sf_dir).collect()))
        b = sorted(map(tuple, fns[q + "_new"](spark, sf_dir).collect()))
        print(f"{q}: old==new rows -> {a == b} ({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
