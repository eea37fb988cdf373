"""Salt-invariance: the salted join returns exactly the plain join's rows
(same multiset), for inner and left joins, at any salt count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.joins import (
    salted_join,
)


@pytest.mark.parametrize("num_salts", [1, 4, 16])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, sf_dir, num_salts, how):
    orders = table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    plain = orders.join(customer, "c_custkey", how)
    salted = salted_join(orders, customer, "c_custkey", num_salts, how)
    assert salted.count() == plain.count()
    # multiset equality via per-row hash aggregation
    def digest(df):
        cols = sorted(df.columns)
        return (
            df.select(F.xxhash64(*cols).alias("h"))
            .agg(
                F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
                F.count("*").alias("n"),
                F.min("h").alias("lo"),
                F.max("h").alias("hi"),
            )
            .collect()[0]
        )
    assert digest(salted) == digest(plain)


@pytest.fixture(scope="module")
def hot_shingle_sf_dir(spark, tmp_path_factory):
    """A corpus with PLANTED hot shingles: 80 docs share an identical
    10-token boilerplate sentence (shingle df ≈ 82 > JACCARD_DF_CAP=64)
    plus unique tails; one true near-dup pair shares only RARE shingles;
    one boilerplate-only identical pair shares only HOT shingles."""
    boiler = " ".join(f"b{j}" for j in range(10))
    rows = []
    for i in range(80):
        uniq = " ".join(f"d{i}w{j}" for j in range(40))
        rows.append((i, boiler + " " + uniq, "en", "web", 0))
    rare = " ".join(f"r{j}" for j in range(50))
    rows.append((900, rare + " tailx", "en", "web", 0))
    rows.append((901, rare + " taily", "en", "web", 0))
    rows.append((910, boiler, "en", "web", 0))
    rows.append((911, boiler, "en", "web", 0))
    d = tmp_path_factory.mktemp("hot_shingles")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(2).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_df_cap_keeps_rare_shingle_pairs_exact(spark, hot_shingle_sf_dir):
    """The df-capped index still finds pairs that share any sub-cap
    shingle, and their Jaccard stays EXACT (full-set verification)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )

    pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in q_dedup_ngram_jaccard(spark, hot_shingle_sf_dir).collect()
    }
    assert (900, 901) in pairs, "rare-shingle near-dup pair lost"
    # 49 shingles each, 48 shared (last shingle differs with the tail
    # token): jaccard = 48/50
    assert abs(pairs[(900, 901)] - 48 / 50) < 1e-6


def test_df_cap_engages_on_hot_only_pairs(spark, hot_shingle_sf_dir):
    """The documented recall trade: a pair whose EVERY shared shingle is
    corpus-hot (identical boilerplate-only docs) is not emitted — this is
    what bounds per-shingle fan-out to cap² at 100 TB."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )

    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in q_dedup_ngram_jaccard(spark, hot_shingle_sf_dir).collect()
    }
    assert (910, 911) not in pairs
    # and no boilerplate-driven candidate explosion among the 80 docs
    assert not any(a < 900 and b < 900 for a, b in pairs)
