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
    synthesize_tpch(spark)
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


def synthesize_tpch(spark) -> None:
    """10x orders/lineitem copies (key-shifted) for the TPC-H-shaped
    operators — added in round 4 for the RFM / RLE-planner ratios."""
    if os.path.isdir(os.path.join(SF10, "lineitem.parquet")):
        return
    copies = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(COPIES)])
    ).alias("copy")
    od = table(spark, SF1, "orders").select("*", copies)
    (
        od.select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(10**9)).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("copy") * F.lit(10**6)).alias(
                "o_custkey"
            ),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{SF10}/orders.parquet")
    )
    li = table(spark, SF1, "lineitem").select("*", copies)
    (
        li.select(
            (F.col("l_orderkey") + F.col("copy") * F.lit(10**9)).alias(
                "l_orderkey"
            ),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{SF10}/lineitem.parquet")
    )


SKEW1 = "/tmp/sfskew1"
SKEW10 = "/tmp/sfskew10"


def synthesize_skewed(spark) -> None:
    """Skewed-corpus mode (round-4): documents where a shared 12-token
    boilerplate prefix plants shingles with df = |corpus| — the hot-key
    regime the n-gram tier's JACCARD_DF_CAP exists for. 1x = 5k docs,
    10x = 50k docs; near-dup pairs (one per 100 docs, sharing rare
    shingles) scale exactly 10x, while hot-shingle df scales from 5k to
    50k. Without the cap the pair join is quadratic in df (2.5e7 ->
    2.5e9 index pairs); with it the ratio must track the 10x output."""
    import pyspark.sql.functions as SF

    for path, n_docs in ((SKEW1, 5_000), (SKEW10, 50_000)):
        if os.path.isdir(os.path.join(path, "documents.parquet")):
            continue
        boiler = " ".join(f"hot{j}" for j in range(12))
        base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
        uniq = SF.array_join(
            SF.transform(
                SF.sequence(SF.lit(0), SF.lit(39)),
                lambda j: SF.concat_ws(
                    "", SF.lit("d"), SF.col("doc_id").cast("string"),
                    SF.lit("w"), j.cast("string"),
                ),
            ),
            " ",
        )
        # every 100th doc gets a near-identical twin (doc_id + n_docs):
        # same unique tail except the final token — rare-shingle pairs
        twin_uniq = SF.array_join(
            SF.transform(
                SF.sequence(SF.lit(0), SF.lit(39)),
                lambda j: SF.concat_ws(
                    "", SF.lit("d"), (SF.col("doc_id") - n_docs).cast("string"),
                    SF.lit("w"),
                    SF.when(j == 39, SF.lit("zz")).otherwise(j.cast("string")),
                ),
            ),
            " ",
        )
        originals = base.select(
            "doc_id",
            SF.concat(SF.lit(boiler + " "), uniq).alias("text"),
        )
        twins = (
            base.filter(SF.col("doc_id") % 100 == 0)
            .select((SF.col("doc_id") + n_docs).alias("doc_id"))
            .select(
                "doc_id",
                SF.concat(SF.lit(boiler + " "), twin_uniq).alias("text"),
            )
        )
        (
            originals.unionByName(twins)
            .select(
                "doc_id",
                "text",
                SF.lit("en").alias("lang"),
                SF.lit("web").alias("source"),
                SF.length("text").alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/documents.parquet")
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
    args = sys.argv[1:]
    skewed = "--skewed" in args
    names = [a for a in args if not a.startswith("--")] or (
        ["q_dedup_ngram_jaccard", "q_dedup_minhash"]
        if skewed
        else DEFAULT_QUERIES
    )
    spark = build_session(app_name="scale_ratio")
    specs = all_specs()
    if skewed:
        synthesize_skewed(spark)
        lo, hi = SKEW1, SKEW10
        print("(skewed corpus: planted hot shingles, df = |corpus|)")
    else:
        synthesize(spark)
        lo, hi = SF1, SF10
    print("| query | 1x (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    for n in names:
        fn = specs[n].fn
        t1 = best_of_2(fn, spark, lo)
        t10 = best_of_2(fn, spark, hi)
        print(f"| {n} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
