"""1x -> 10x scaling ratios (SCALING.md methodology).

Synthesizes a 10x copy of the sf0.1 `events`, `documents`, `embeddings`
tables under /tmp/sfx10 (facts replicated with shifted keys; document
text re-tokenized per copy so copies share no shingles — near-dup pair
counts then scale exactly 10x instead of quadratically), then times the
queries given on argv (default: the round-2 additions) at 1x and 10x,
best of 2, and prints one ratio row per query.

Usage: python scripts/scale_ratio.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (  # noqa: E402
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)

SF1 = "/root/testdata/sf0.1"
SF10 = "/tmp/sfx10"
COPIES = 10

DEFAULT_QUERIES = [
    "q_dedup_containment",
    "q_minhash_est_vs_exact",
    "q_embedding_quantize",
    "q_ann_ivf_multiprobe",
    "q_token_budget_packing",
    "q_text_pii_redact",
    "q_vocab_build",
    "q_decayed_counts",
    "q_events_anomaly",
    "q_forward_fill",
    "q_winsorize",
    "q_weighted_sample",
    "q_heavy_hitters",
    "q_contamination_check",
    "q_split_no_leakage",
]


def synthesize(spark) -> None:
    if os.path.isdir(os.path.join(SF10, "embeddings.parquet")):
        return
    copies = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(COPIES)])
    ).alias("copy")

    ev = table(spark, SF1, "events").select("*", copies)
    (
        ev.select(
            (F.col("event_id") + F.col("copy") * F.lit(10**9)).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("copy") * F.lit(10**6)).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{SF10}/events.parquet")
    )

    docs = table(spark, SF1, "documents").select("*", copies)
    tagged = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda w: F.concat(w, F.lit("x"), F.col("copy").cast("string")),
        ),
        " ",
    )
    (
        docs.select(
            (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
            tagged.alias("text"),
            "lang",
            "source",
            F.length(tagged).alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{SF10}/documents.parquet")
    )

    emb = table(spark, SF1, "embeddings").select("*", copies)
    (
        emb.select(
            (F.col("vec_id") + F.col("copy") * F.lit(10**9)).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{SF10}/embeddings.parquet")
    )


def best_of_2(fn, spark, sf_dir) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = build_session(app_name="scale_ratio")
    synthesize(spark)
    specs = all_specs()
    print("| query | 1x (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    for n in names:
        fn = specs[n].fn
        t1 = best_of_2(fn, spark, SF1)
        t10 = best_of_2(fn, spark, SF10)
        print(f"| {n} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
