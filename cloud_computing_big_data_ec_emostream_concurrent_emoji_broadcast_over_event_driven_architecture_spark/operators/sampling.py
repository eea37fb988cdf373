"""Deterministic sampling + distribution statistics (training-data
pipeline north star; no reference counterpart).

A 100 TB corpus is never trained on whole: pipelines need reproducible
sampling (same subset on every run, on any cluster layout) and cheap
distribution summaries. Random ``sample()`` is not reproducible across
partitionings, so everything here keys on the same cross-engine md5 hash
the dedup tier uses (functions/hashing.py) — a pure projection, no
shuffle, and the DuckDB oracle reproduces the exact subset.

- ``q_sample_hash``        Bernoulli-by-hash 10% sample.
- ``q_train_test_split``   hash-mod 90/10 split with per-split stats.
- ``q_stratified_sample``  fixed-size per-stratum sample (hash-ranked
                           top-N per event type) — per-key skew-free.
- ``q_percentiles``        exact interpolated quantiles per group.
- ``q_histogram``          fixed-width binning via width_bucket.
- ``q_corr_stats``         corr/covariance/stddev per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import md5_long, md5_long_sql
from ..functions.stable import stable_round, stable_round_sql
from ..plans.registry import register

_EV_HASH = md5_long_sql("CAST(event_id AS VARCHAR)")


@register(
    "q_sample_hash",
    tags=("sampling", "hash", "scale"),
    oracle=f"""
        SELECT event_id, event_type
        FROM events
        WHERE {_EV_HASH} % 10 = 0
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% Bernoulli sample keyed on md5(event_id): a pure
    per-row filter — no shuffle, no RNG state, identical subset at any
    parallelism, and the predicate pushes into the scan's row filtering."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        md5_long(F.col("event_id").cast("string")) % 10 == 0
    ).select("event_id", "event_type")


@register(
    "q_train_test_split",
    tags=("sampling", "hash"),
    oracle=f"""
        SELECT CASE WHEN {_EV_HASH} % 10 < 9 THEN 'train' ELSE 'test' END
                   AS split,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by hash-mod, summarized per
    split. The split label is a projection — the full-table pass happens
    exactly once, and rows never move to be labeled."""
    ev = table(spark, sf_dir, "events")
    h = md5_long(F.col("event_id").cast("string"))
    return (
        ev.withColumn(
            "split", F.when(h % 10 < 9, F.lit("train")).otherwise(F.lit("test"))
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_stratified_sample",
    tags=("sampling", "hash", "window"),
    oracle=f"""
        WITH ranked AS (
            SELECT event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY {_EV_HASH}, event_id
                   ) AS rn
            FROM events
        )
        SELECT event_type, event_id FROM ranked WHERE rn <= 100
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: exactly 100 events per type, chosen
    by hash rank (reproducible, uniform-ish). One shuffle on the stratum
    key; rank truncation means each stratum contributes a bounded output
    regardless of its size — the skew-free form of per-stratum sampling."""
    ev = table(spark, sf_dir, "events")
    h = md5_long(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(h, F.col("event_id"))
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 100)
        .select("event_type", "event_id")
    )


@register(
    "q_percentiles",
    tags=("stats", "agg"),
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines implement
    the same linear-interpolation definition; rounding absorbs ulp-level
    arithmetic differences). At 100 TB the approximate twin is
    ``approx_percentile`` — same call shape, sketch-mergeable."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "q_histogram",
    tags=("stats", "agg"),
    oracle="""
        SELECT CASE WHEN l_extendedprice < 0 THEN 0
                    WHEN l_extendedprice >= 120000 THEN 25
                    ELSE CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) + 1
               END AS bucket,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    """,
    # DuckDB has no width_bucket scalar — the CASE/FLOOR form is the SQL-
    # standard definition for min=0, max=120000, 24 buckets (width 5000).
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of line-item price: width_bucket is a pure
    projection, so the histogram is one partial-aggregated groupBy over
    ≤ 26 keys — constant-size shuffle no matter the input size."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(
                F.col("l_extendedprice"), F.lit(0), F.lit(120000), F.lit(24)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_corr_stats",
    tags=("stats", "agg"),
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
               ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / stddev per group — single-pass co-moment
    aggregates (partial + final, shuffle carries one accumulator per
    group). Rounded in both engines to absorb summation-order float
    noise."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
    )


def _doc_split_sql(id_expr: str) -> str:
    return (
        f"CASE WHEN {md5_long_sql(f'CAST({id_expr} AS VARCHAR)')} % 10 < 9 "
        "THEN 'train' ELSE 'test' END"
    )


def _doc_split(col: F.Column) -> F.Column:
    return F.when(
        md5_long(col.cast("string")) % 10 < 9, F.lit("train")
    ).otherwise(F.lit("test"))


def _contamination_oracle() -> str:
    from .dedup import _minhash_oracle

    return f"""
        WITH pairs AS ({_minhash_oracle()})
        SELECT p.doc_id_a, p.doc_id_b, p.jaccard,
               {_doc_split_sql('p.doc_id_a')} AS split_a,
               {_doc_split_sql('p.doc_id_b')} AS split_b
        FROM pairs p
        WHERE {_doc_split_sql('p.doc_id_a')} <> {_doc_split_sql('p.doc_id_b')}
    """


@register(
    "q_contamination_check",
    tags=("sampling", "dedup", "llm-pipeline"),
    oracle=_contamination_oracle(),
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test CONTAMINATION audit: near-duplicate pairs (MinHash tier,
    Jaccard ≥ 0.8 — exact dups have Jaccard 1 so they're included) that
    straddle the hash-mod split boundary. Any row here is an eval example
    whose near-copy sits in training data — the leakage a benchmark audit
    must catch. Cost: the dedup pair list already exists (shared cached
    tier); labeling is a projection, so the audit is one filter over the
    pair output — effectively free at any scale."""
    from .dedup import q_dedup_minhash

    pairs = q_dedup_minhash(spark, sf_dir)
    out = pairs.select(
        "doc_id_a",
        "doc_id_b",
        "jaccard",
        _doc_split(F.col("doc_id_a")).alias("split_a"),
        _doc_split(F.col("doc_id_b")).alias("split_b"),
    )
    return out.filter(F.col("split_a") != F.col("split_b"))


def _leakage_split_oracle() -> str:
    from .dedup import _cc_oracle

    return f"""
        WITH clusters AS ({_cc_oracle()}),
        assigned AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d
            LEFT JOIN clusters c ON c.doc_id = d.doc_id
        )
        SELECT {_doc_split_sql('cluster_id')} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
        FROM assigned
        GROUP BY 1
    """


@register(
    "q_split_no_leakage",
    tags=("sampling", "dedup", "graph", "llm-pipeline"),
    oracle=_leakage_split_oracle(),
)
def q_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE train/test split: the unit of assignment is the
    near-dup CLUSTER, not the document — every member of a connected
    component lands in the split of its cluster id (singletons are their
    own cluster), so no near-duplicate pair can straddle the boundary by
    construction (the q_contamination_check of THIS split is empty).
    Composes the convergent connected components with the hash-mod rule;
    the only added work over a naive split is one left join against the
    (tiny) cluster table — broadcast at any corpus scale."""
    from .dedup import q_dedup_clusters

    docs = table(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    assigned = docs.join(F.broadcast(clusters), "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return (
        assigned.groupBy(_doc_split(F.col("cluster_id")).alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
    )


def _winsor_bound_sql(tag: str) -> str:
    """One interpolated percentile bound, spelled as explicit
    rank-arithmetic so both engines execute the IDENTICAL float ops:
    v[k+1] + (v[k+2] − v[k+1]) · frac with k = floor(p·(n−1))."""
    v0 = f"MAX(CASE WHEN r.rn = p.{tag}_k + 1 THEN r.value END)"
    v1 = (
        f"MAX(CASE WHEN r.rn = LEAST(p.{tag}_k + 2, p.n) "
        f"THEN r.value END)"
    )
    return f"({v0} + ({v1} - {v0}) * (MAX(p.{tag}_idx) - MAX(p.{tag}_k)))"


@register(
    "q_winsorize",
    tags=("stats", "cleaning"),
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY value) AS rn
            FROM events
        ),
        params AS (
            SELECT event_type, COUNT(*) AS n,
                   0.01 * CAST(COUNT(*) - 1 AS DOUBLE) AS lo_idx,
                   FLOOR(0.01 * CAST(COUNT(*) - 1 AS DOUBLE)) AS lo_k,
                   0.99 * CAST(COUNT(*) - 1 AS DOUBLE) AS hi_idx,
                   FLOOR(0.99 * CAST(COUNT(*) - 1 AS DOUBLE)) AS hi_k
            FROM events GROUP BY 1
        ),
        clip AS (
            SELECT r.event_type,
                   {_winsor_bound_sql('lo')} AS lo,
                   {_winsor_bound_sql('hi')} AS hi
            FROM ranked r JOIN params p USING (event_type)
            GROUP BY 1
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN e.value < c.lo OR e.value > c.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               {stable_round_sql(
                   "CAST(SUM(CAST(LEAST(GREATEST(e.value, c.lo), c.hi)"
                   " AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)")}
                   AS winsorized_mean,
               {stable_round_sql(
                   "CAST(SUM(CAST(e.value AS DECIMAL(28,10)))"
                   " AS DOUBLE) / COUNT(*)")} AS raw_mean
        FROM events e JOIN clip c USING (event_type)
        GROUP BY e.event_type
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION: clip each value to its group's [p1, p99] before
    aggregating — the outlier-robust mean every metrics/feature pipeline
    reaches for (a fat-finger event no longer drags the average). The
    per-group clip bounds interpolate between explicit ranks (one
    per-group sort window; at 100 TB the approx_percentile sketch is the
    drop-in) and broadcast back onto the fact table, so the whole
    operator costs one extra tiny join over the plain mean.

    Determinism (round-6 10× soak find): engine-native percentile
    (Spark) vs quantile_cont (DuckDB) interpolate with different float
    expression ORDER — the bounds disagreed by ~3e-14 at 10× volume,
    which crossed a (cloned ×10) data value sitting exactly on p99 and
    flipped n_clipped by 10. Both engines now interpolate
    v[k+1] + (v[k+2] − v[k+1])·frac with the same op order, means fold
    exact decimal lanes, and the 6-dp round is the explicit
    half-up-by-construction :func:`stable_round` — every output bit is
    forced equal, not merely usually equal."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("value")
        ),
    )
    n = F.count("*")
    params = ev.groupBy("event_type").agg(
        n.alias("n"),
        (F.lit(0.01) * (n - 1).cast("double")).alias("lo_idx"),
        F.floor(F.lit(0.01) * (n - 1).cast("double")).alias("lo_k"),
        (F.lit(0.99) * (n - 1).cast("double")).alias("hi_idx"),
        F.floor(F.lit(0.99) * (n - 1).cast("double")).alias("hi_k"),
    )

    def bound(tag: str) -> Column:
        v0 = F.max(
            F.when(F.col("rn") == F.col(f"{tag}_k") + 1, F.col("value"))
        )
        v1 = F.max(
            F.when(
                F.col("rn") == F.least(F.col(f"{tag}_k") + 2, F.col("n")),
                F.col("value"),
            )
        )
        frac = F.max(F.col(f"{tag}_idx")) - F.max(F.col(f"{tag}_k"))
        return v0 + (v1 - v0) * frac

    clip = (
        ranked.join(F.broadcast(params), "event_type")
        .filter(
            (F.col("rn") == F.col("lo_k") + 1)
            | (F.col("rn") == F.least(F.col("lo_k") + 2, F.col("n")))
            | (F.col("rn") == F.col("hi_k") + 1)
            | (F.col("rn") == F.least(F.col("hi_k") + 2, F.col("n")))
        )
        .groupBy("event_type")
        .agg(bound("lo").alias("lo"), bound("hi").alias("hi"))
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    dec_mean = lambda c: (  # noqa: E731
        F.sum(c.cast("decimal(28,10)")).cast("double") / F.count("*")
    )
    return (
        ev.join(F.broadcast(clip), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
            stable_round(dec_mean(clipped)).alias("winsorized_mean"),
            stable_round(dec_mean(F.col("value"))).alias("raw_mean"),
        )
    )


WEIGHTED_PER_STRATUM = 20


@register(
    "q_weighted_sample",
    tags=("sampling", "hash", "window"),
    oracle=f"""
        WITH pri AS (
            SELECT event_id, event_type, value,
                   -ln(({_EV_HASH} + 1.0) / 17592186044416.0)
                       / GREATEST(ABS(value), 0.001) AS priority
            FROM events
        ),
        ranked AS (
            SELECT event_id, event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY priority, event_id
                   ) AS rn
            FROM pri
        )
        SELECT event_type, event_id, ROUND(value, 6) AS value
        FROM ranked WHERE rn <= {WEIGHTED_PER_STRATUM}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling (exponential/A-ES scheme): each
    row draws priority = -ln(u)/w with u a hash-uniform in (0,1] and
    w = |value| as the weight; the {WEIGHTED_PER_STRATUM} lowest
    priorities per stratum form a without-replacement sample where
    inclusion probability scales with weight. Reproducible on any
    cluster layout (u comes from md5, not an RNG), one window per
    stratum, bounded output per key — and the same construction streams:
    priorities are per-row, so a streaming top-k keeps the reservoir.
    2^44 = 17592186044416 normalizes the 44-bit hash; +1 keeps u > 0."""
    ev = table(spark, sf_dir, "events")
    u = (md5_long(F.col("event_id").cast("string")) + F.lit(1.0)) / F.lit(
        float(1 << 44)
    )
    priority = -F.log(u) / F.greatest(F.abs(F.col("value")), F.lit(0.001))
    w = Window.partitionBy("event_type").orderBy(
        priority.asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= WEIGHTED_PER_STRATUM)
        .select("event_type", "event_id", F.round("value", 6).alias("value"))
    )


HEAVY_HITTER_K = 20


@register(
    "q_heavy_hitters",
    tags=("stats", "skew", "scale"),
    oracle=f"""
        WITH counts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        tot AS (SELECT SUM(cnt) AS n FROM counts)
        SELECT user_id, cnt,
               ROUND(cnt * 1.0 / tot.n, 6) AS share
        FROM counts, tot
        ORDER BY cnt DESC, user_id
        LIMIT {HEAVY_HITTER_K}
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAVY-HITTER detection: the top-{HEAVY_HITTER_K} keys by frequency
    with their traffic share — the skew diagnostic you run BEFORE picking
    a join strategy (these are the keys that overflow a shuffle partition
    and want salting or a skew-join hint; the engine's salted join and
    AQE skew handling are the mitigations). One partial-aggregated
    groupBy and a top-k (TakeOrderedAndProject — no global sort); the
    total for the share ratio rides a broadcast 1-row aggregate. The
    approximate twin at extreme cardinality is a count-min sketch; exact
    counts stay cheap here because the aggregation output is
    key-cardinality-sized."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(HEAVY_HITTER_K)
    )


def _training_corpus_oracle() -> str:
    from ..functions.text import shingles_sql
    from .dedup import _keep_best_oracle
    from .text import PACK_BUDGET, REPETITION_MAX

    return f"""
        WITH kb AS ({_keep_best_oracle()}),
        rep AS (
            SELECT doc_id,
                   CASE WHEN len(sh) > 0
                             AND 1.0 - len(list_distinct(sh)) * 1.0 / len(sh)
                                 > {REPETITION_MAX}
                        THEN 1 ELSE 0 END AS is_repetitive
            FROM (SELECT doc_id,
                         {shingles_sql("string_split(text, ' ')")} AS sh
                  FROM documents)
        ),
        enriched AS (
            SELECT d.doc_id, d.lang,
                   len(string_split(d.text, ' ')) AS n_tokens,
                   r.is_repetitive,
                   COALESCE(k.cluster_id, d.doc_id) AS cluster_id,
                   COALESCE(k.is_best, 1) AS is_best
            FROM documents d
            JOIN rep r USING (doc_id)
            LEFT JOIN kb k ON k.doc_id = d.doc_id
        )
        SELECT {_doc_split_sql('cluster_id')} AS split, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(CEIL(SUM(n_tokens) / {PACK_BUDGET}.0) AS BIGINT)
                   AS n_packs
        FROM enriched
        WHERE is_repetitive = 0 AND is_best = 1
        GROUP BY 1, 2
    """


@register(
    "q_pipeline_training_corpus",
    tags=("pipeline", "dedup", "sampling", "llm-pipeline"),
    oracle=_training_corpus_oracle(),
)
def q_pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 CORPUS-PREP flagship, composing the engine's
    training-pipeline operators into the DAG a pre-training data job
    actually runs: (1) intra-document repetition gate (C4-style), (2)
    near-dup clustering with quality-aware keeper selection (only the
    best copy of each cluster survives), (3) leakage-free
    cluster-granular train/test split, (4) per-(split, lang) corpus
    accounting including how many PACK_BUDGET-token context windows the
    surviving corpus fills. Every stage is a previously-oracle-checked
    operator; the composition adds only doc_id joins (the cluster/keeper
    table is pair-participant-sized — broadcast) and one final
    aggregation, so the whole prep costs one pass over the corpus plus
    the dedup tier it already shares with every other dedup query."""
    from .dedup import q_dedup_keep_best
    from .text import PACK_BUDGET, q_text_repetition

    docs = table(spark, sf_dir, "documents")
    rep = q_text_repetition(spark, sf_dir).select("doc_id", "is_repetitive")
    kb = q_dedup_keep_best(spark, sf_dir).select(
        "doc_id", "cluster_id", "is_best"
    )
    enriched = (
        docs.join(rep, "doc_id")
        .join(F.broadcast(kb), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
            "is_repetitive",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("is_best"), F.lit(1)).alias("is_best"),
        )
    )
    kept = enriched.filter(
        (F.col("is_repetitive") == 0) & (F.col("is_best") == 1)
    )
    return (
        kept.groupBy(
            _doc_split(F.col("cluster_id")).alias("split"), F.col("lang")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / F.lit(float(PACK_BUDGET)))
            .cast("long")
            .alias("n_packs"),
        )
    )


QUALITY_DECILES = 10
PER_DECILE = 25


def _quality_stratified_oracle() -> str:
    from ..functions.text import stopword_ratio_sql

    quality = f"""
        SELECT doc_id,
               ROUND(0.4 * LEAST(len(string_split(text, ' ')) / 50.0, 1.0)
                     + 0.3 * (1.0 - LEAST(len(regexp_extract_all(text,
                               '[^a-zA-Z0-9 ]')) * 1.0 / n_chars, 1.0))
                     + 0.3 * LEAST({stopword_ratio_sql("string_split(text, ' ')")}
                                   * 10.0, 1.0), 6) AS quality
        FROM documents
    """
    doc_hash = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH q AS ({quality}),
        binned AS (
            SELECT doc_id, quality,
                   CAST(LEAST(FLOOR(quality * {QUALITY_DECILES}),
                              {QUALITY_DECILES - 1}) AS BIGINT) AS decile
            FROM q
        ),
        ranked AS (
            SELECT doc_id, quality, decile,
                   ROW_NUMBER() OVER (
                       PARTITION BY decile ORDER BY {doc_hash}, doc_id
                   ) AS rn
            FROM binned
        )
        SELECT decile, doc_id, quality
        FROM ranked WHERE rn <= {PER_DECILE}
    """


@register(
    "q_quality_stratified_sample",
    tags=("sampling", "llm-pipeline", "window"),
    oracle=_quality_stratified_oracle(),
)
def q_quality_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-STRATIFIED sampling: up to {PER_DECILE} documents from
    each quality decile, hash-ranked for reproducibility — the eval-set
    construction that keeps low- and high-quality strata represented
    instead of letting a uniform sample follow the corpus skew (also the
    shape of curriculum/mixture sampling: swap deciles for any scoring
    column). Composes the quality heuristic with the same hash-rank
    window as q_stratified_sample; strata are deciles so per-stratum
    output is bounded and skew-free by construction."""
    from .text import q_text_quality

    quality = q_text_quality(spark, sf_dir)
    decile = F.least(
        F.floor(F.col("quality") * QUALITY_DECILES),
        F.lit(QUALITY_DECILES - 1),
    ).cast("long")
    h = md5_long(F.col("doc_id").cast("string"))
    w = Window.partitionBy("decile").orderBy(h, F.col("doc_id"))
    return (
        quality.withColumn("decile", decile)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PER_DECILE)
        .select("decile", "doc_id", "quality")
    )


_PROFILE_COLS = (
    ("event_id", "numeric"),
    ("ts", "timestamp"),
    ("user_id", "numeric"),
    ("event_type", "string"),
    ("value", "numeric"),
    ("props", "string"),
)


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "numeric":
            mn = f"ROUND(MIN({c}) * 1.0, 6)"
            mx = f"ROUND(MAX({c}) * 1.0, 6)"
            mean = f"ROUND(AVG({c}), 6)"
        elif kind == "timestamp":
            mn = f"ROUND(epoch(MIN({c})), 6)"
            mx = f"ROUND(epoch(MAX({c})), 6)"
            mean = "CAST(NULL AS DOUBLE)"
        else:
            mn = mx = mean = "CAST(NULL AS DOUBLE)"
        parts.append(f"""
            SELECT '{c}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST({mn} AS DOUBLE) AS min_value,
                   CAST({mx} AS DOUBLE) AS max_value,
                   CAST({mean} AS DOUBLE) AS mean_value
            FROM events""")
    return "\n            UNION ALL\n".join(parts)


@register(
    "q_profile_events",
    tags=("stats", "profiling", "scale"),
    oracle=_profile_oracle(),
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE PROFILING: per-column null counts, distinct cardinality and
    numeric/timestamp ranges for the events table — the data-quality
    report a pipeline publishes with every snapshot. The Spark plan
    computes EVERY column's statistics in ONE aggregation pass (a single
    scan; the N exact count-distincts share one Expand node — an N+1×
    row multiplication before the partial aggregate, the price of
    exactness) and melts the 1-row result into the canonical
    row-per-column shape JVM-side — unlike the naive per-column UNION
    the oracle spells out, which scans the table once per column. At
    100 TB the drop-in is ``approx_count_distinct`` per column: no
    Expand at all, one sketch per column in a plain single-pass
    aggregate."""
    ev = table(spark, sf_dir, "events")
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if kind == "numeric":
            aggs.append(
                F.round(F.min(c).cast("double"), 6).alias(f"{c}__min")
            )
            aggs.append(
                F.round(F.max(c).cast("double"), 6).alias(f"{c}__max")
            )
            aggs.append(F.round(F.avg(c), 6).alias(f"{c}__mean"))
        elif kind == "timestamp":
            aggs.append(
                F.round(
                    F.unix_micros(F.min(c).cast("timestamp")) / 1e6, 6
                ).alias(f"{c}__min")
            )
            aggs.append(
                F.round(
                    F.unix_micros(F.max(c).cast("timestamp")) / 1e6, 6
                ).alias(f"{c}__max")
            )
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))
        else:
            for stat in ("min", "max", "mean"):
                aggs.append(
                    F.lit(None).cast("double").alias(f"{c}__{stat}")
                )
    one = ev.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                F.col(f"{c}__mean").alias("mean_value"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "q_quantile_bins",
    tags=("sampling", "stats", "scale"),
    oracle="""
        WITH cuts AS (
            SELECT [quantile_cont(value, 0.1), quantile_cont(value, 0.2),
                    quantile_cont(value, 0.3), quantile_cont(value, 0.4),
                    quantile_cont(value, 0.5), quantile_cont(value, 0.6),
                    quantile_cont(value, 0.7), quantile_cont(value, 0.8),
                    quantile_cont(value, 0.9)] AS cs
            FROM events
        )
        SELECT CAST(len(list_filter(c.cs, x -> e.value > x)) AS BIGINT)
                   AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(e.value), 6) AS min_v,
               ROUND(MAX(e.value), 6) AS max_v
        FROM events e CROSS JOIN cuts c
        GROUP BY 1
    """,
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH discretization (decile binning) — the feature-
    engineering staple that fixed-width ``q_histogram`` can't provide on
    skewed values: bin edges are the exact interpolated deciles, so every
    bin holds ~10% of rows regardless of the distribution.

    Plan: one exact-percentile aggregation produces the 9 cutoffs as a
    single broadcast row (at 100 TB swap in the mergeable
    ``approx_percentile`` sketch — same call shape, documented in
    q_winsorize); assignment is a pure per-row expression (count of
    cutoffs below the value — a 9-element array scan, no join per bin);
    then one partial-combined rollup on the 10 bin keys.  Two passes
    over the data, zero data-sized shuffles — binning never sorts."""
    ev = table(spark, sf_dir, "events")
    cuts = ev.agg(
        F.array(
            *[F.expr(f"percentile(value, {q / 10})") for q in range(1, 10)]
        ).alias("cs")
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .select(
            F.expr("size(filter(cs, x -> value > x))")
            .cast("long")
            .alias("bin"),
            "value",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
        )
    )


@register(
    "q_robust_mad",
    tags=("stats", "cleaning"),
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS m
            FROM events GROUP BY 1
        )
        SELECT e.event_type,
               ROUND(MAX(med.m), 6) AS median_v,
               ROUND(quantile_cont(ABS(e.value - med.m), 0.5), 6) AS mad
        FROM events e JOIN med ON e.event_type = med.event_type
        GROUP BY 1
    """,
)
def q_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN ABSOLUTE DEVIATION per group — the robust spread measure
    outlier-heavy telemetry needs where stddev is dragged by the tail
    (pairs with q_winsorize: MAD picks the clip scale, winsorize applies
    it).  Two exact-percentile passes: group medians (a groups-sized
    aggregate, broadcast back), then the median of absolute deviations.
    At 100 TB both passes swap to the mergeable ``approx_percentile``
    sketch unchanged; the join stays broadcast while the group count is
    dimension-sized, and falls back to a key-partitioned shuffle join —
    never row-to-row — beyond that."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("m"), 6).alias("median_v"),
            F.round(
                F.expr("percentile(abs(value - m), 0.5)"), 6
            ).alias("mad"),
        )
    )


KFOLD_K = 5


@register(
    "q_kfold_stratified",
    tags=("sampling", "hash", "llm-pipeline"),
    oracle=f"""
        SELECT lang,
               CAST({md5_long_sql("'fold:' || CAST(doc_id AS VARCHAR)")}
                    % {KFOLD_K} AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2
    """,
)
def q_kfold_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-FOLD cross-validation assignment ({KFOLD_K} folds): fold =
    hash(doc_id) mod K — deterministic, storage-free (recomputable from
    the key anywhere, any engine, any partitioning), and uniform WITHIN
    each stratum, reported as per-(lang, fold) counts so the balance is
    auditable.  The eval loop trains on K-1 folds with a pure filter
    predicate — no data movement to "create" a split, which is the
    whole point at 100 TB (materializing K copies is K× storage;
    a hash predicate is free and pushes to the scan)."""
    docs = table(spark, sf_dir, "documents")
    fold = (
        md5_long(F.concat(F.lit("fold:"), F.col("doc_id").cast("string")))
        % KFOLD_K
    )
    return docs.groupBy("lang", fold.alias("fold")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


TEMP_ALPHA = 0.7  # mC4 / XLM-R temperature exponent
_DOC_HASH = md5_long_sql("CAST(doc_id AS VARCHAR)")


@register(
    "q_sample_temperature",
    tags=("sampling", "hash", "llm-pipeline", "scale"),
    oracle=f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ),
        tot AS (SELECT SUM(n_docs) AS total FROM counts),
        w AS (
            SELECT c.source, c.n_docs,
                   pow(c.n_docs * 1.0 / t.total, {TEMP_ALPHA} - 1.0) AS boost
            FROM counts c, tot t
        ),
        mx AS (SELECT MAX(boost) AS max_boost FROM w),
        rates AS (
            SELECT w.source, w.n_docs,
                   ROUND(w.boost / m.max_boost, 6) AS rate
            FROM w, mx m
        )
        SELECT r.source, r.n_docs, r.rate,
               CAST(SUM(CASE WHEN {_DOC_HASH} % 1000000
                                  < CAST(r.rate * 1000000 AS BIGINT)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents d JOIN rates r ON d.source = r.source
        GROUP BY r.source, r.n_docs, r.rate
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED source sampling (mC4 / XLM-R α={TEMP_ALPHA}):
    each source's keep-rate is proportional to share^(α-1), normalized
    so the rarest source keeps 100% — the standard rebalancing that
    up-samples tail domains/languages without exploding head ones. The
    realized sample is the usual deterministic Bernoulli-by-hash
    predicate (md5(doc_id) mod 1e6 under the integerized rate), so the
    SAME documents survive on every run and any cluster layout.

    Determinism: the only transcendental is pow(share, α-1), rounded to
    6 dp before integerizing the threshold — a cross-engine last-ulp
    difference cannot move the integer cut.

    Plan: one aggregation builds the per-source count relation (source-
    count-sized); two scalar folds over it (total, max boost) broadcast
    back as single rows; the rate table then BROADCAST-joins onto the
    corpus scan — the big table is read once, never shuffled, and the
    per-row verdict is a projection."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("total"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.pow(F.col("n_docs") / F.col("total"), F.lit(TEMP_ALPHA - 1.0)).alias(
            "boost"
        ),
    )
    mx = w.agg(F.max("boost").alias("max_boost"))
    rates = w.crossJoin(F.broadcast(mx)).select(
        "source",
        "n_docs",
        F.round(F.col("boost") / F.col("max_boost"), 6).alias("rate"),
    )
    keep = md5_long(F.col("doc_id").cast("string")) % 1000000 < (
        F.col("rate") * 1000000
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "rate")
        .agg(F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"))
    )


_CHURN_FEATURE_CUTOFF = "2024-01-30 00:00:00"  # features end (exclusive)


@register(
    "q_churn_training_set",
    tags=("sampling", "llm-pipeline", "features", "scale"),
    oracle=f"""
        WITH feat AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                       AS n_active_days,
                   CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                        DATE '2024-01-30') AS BIGINT) AS days_since_last,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT)
                       AS n_types,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                       AS BIGINT) AS n_purchases
            FROM events
            WHERE ts < TIMESTAMP '{_CHURN_FEATURE_CUTOFF}'
            GROUP BY 1
        ),
        lbl AS (
            SELECT DISTINCT user_id FROM events
            WHERE ts >= TIMESTAMP '{_CHURN_FEATURE_CUTOFF}'
        )
        SELECT f.user_id, f.n_events, f.n_active_days,
               f.days_since_last, f.n_types, f.n_purchases,
               CAST(CASE WHEN l.user_id IS NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS churned
        FROM feat f LEFT JOIN lbl l USING (user_id)
    """,
)
def q_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-GUARDED TRAINING-SET ASSEMBLY: per-user churn features
    (counts, active days, recency, type breadth, purchases) computed
    STRICTLY from events before {_CHURN_FEATURE_CUTOFF}, labeled by
    whether the user went silent afterwards — the feature/label
    time-split every supervised pipeline needs, where the classic bug
    is a feature that peeks past the cutoff (the temporal cousin of
    ``q_split_no_leakage``'s cluster-granular split).

    The guard is STRUCTURAL, not procedural: the feature aggregation's
    time predicate sits directly on the scan (pushed to parquet, and on
    a date-partitioned layout it prunes partitions), so no feature CAN
    see label-window data. Label = one distinct-user pass over the
    label window. Both sides key on user_id — the join reuses the
    aggregation's partitioning. Users with no pre-cutoff history are
    excluded (nothing to featurize; stated contract)."""
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit(_CHURN_FEATURE_CUTOFF).cast("timestamp_ntz")
    feat = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct(F.to_date("ts")).alias("n_active_days"),
            F.datediff(
                F.to_date(cutoff), F.max(F.to_date("ts"))
            ).cast("bigint").alias("days_since_last"),
            F.count_distinct("event_type").alias("n_types"),
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).alias("n_purchases"),
        )
    )
    lbl = (
        ev.filter(F.col("ts") >= cutoff).select("user_id").distinct()
        .withColumn("active_after", F.lit(1))
    )
    return feat.join(lbl, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_active_days",
        "days_since_last",
        "n_types",
        "n_purchases",
        F.when(F.col("active_after").isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("churned"),
    )
