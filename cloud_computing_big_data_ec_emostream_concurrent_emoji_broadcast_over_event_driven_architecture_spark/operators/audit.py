"""Data-quality audit operators (dbt-test / Deequ-style constraint
checks) — the validation pass a training-data pipeline runs before it
trusts an ingest batch.

The reference validates events one at a time at the HTTP edge
(api_server.py's presence checks, re-expressed as
``q_validate_presence``); these are the BATCH constraint audits a
lakehouse runs over whole tables: uniqueness, null rates, referential
integrity, value-domain conformance, and freshness — each emitted as a
named check with measured violation counts, so a gate can fail the
batch on any non-zero row.

Plan shape: every check is one aggregation (or one anti-join for the FK
check) over a single scan of the audited table; results union into a
fixed-size report relation (one row per check — never data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import as_double
from ..plans.registry import register

DQ_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
DQ_FRESH_CUTOFF = "2024-01-30 00:00:00"  # batch must contain rows past this


@register(
    "q_dq_audit",
    tags=("audit", "quality", "scale"),
    oracle=f"""
        WITH uniq AS (
            SELECT 'unique_event_id' AS check_name,
                   CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
                       AS violations,
                   CAST(COUNT(*) AS BIGINT) AS n_checked
            FROM events
        ),
        nulls AS (
            SELECT 'not_null_user_id' AS check_name,
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS violations,
                   CAST(COUNT(*) AS BIGINT) AS n_checked
            FROM events
        ),
        domain AS (
            SELECT 'accepted_event_types' AS check_name,
                   CAST(SUM(CASE WHEN event_type NOT IN
                       ({", ".join(f"'{t}'" for t in DQ_EVENT_TYPES)})
                       THEN 1 ELSE 0 END) AS BIGINT) AS violations,
                   CAST(COUNT(*) AS BIGINT) AS n_checked
            FROM events
        ),
        fk AS (
            SELECT 'orders_customer_fk' AS check_name,
                   CAST(COUNT(*) AS BIGINT) AS violations,
                   (SELECT COUNT(*) FROM orders) AS n_checked
            FROM orders o
            WHERE NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
            )
        ),
        fresh AS (
            SELECT 'freshness_past_cutoff' AS check_name,
                   CAST(CASE WHEN MAX(ts) >=
                       TIMESTAMP '{DQ_FRESH_CUTOFF}' THEN 0 ELSE 1 END
                       AS BIGINT) AS violations,
                   CAST(COUNT(*) AS BIGINT) AS n_checked
            FROM events
        )
        SELECT check_name, violations, n_checked,
               (violations = 0) AS passed
        FROM (
            SELECT * FROM uniq UNION ALL SELECT * FROM nulls
            UNION ALL SELECT * FROM domain UNION ALL SELECT * FROM fk
            UNION ALL SELECT * FROM fresh
        )
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRAINT AUDIT (dbt-test / Deequ pattern): five named checks —
    event_id uniqueness, user_id non-null, event_type domain
    conformance, orders→customer referential integrity (anti-join), and
    batch freshness — each reporting measured violations over the rows
    checked plus a pass verdict. A pipeline gates the batch on
    ``passed`` = false rows; keeping counts (not booleans alone) makes
    the report actionable and monotonic under partial re-runs.

    Plan: the four event checks fold in ONE aggregation pass over one
    scan (conditional sums, no shuffles beyond the single-row agg) and
    unpivot via a single explode — round 11; the per-check union form
    replayed that aggregation once per branch; the FK check is a
    broadcast LEFT ANTI against the customer key set."""
    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    ev_checks = ev.agg(
        (F.count("*") - F.countDistinct("event_id")).alias("u_viol"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias(
            "n_viol"
        ),
        F.sum(
            F.when(~F.col("event_type").isin(*DQ_EVENT_TYPES), 1).otherwise(0)
        ).alias("d_viol"),
        F.max(F.col("ts").cast("timestamp")).alias("max_ts"),
        F.count("*").alias("n_rows"),
    )
    # ROUND-11 (guide §1.2/§2.4): the four event checks used to union
    # four PROJECTIONS of ev_checks, and each union branch replayed the
    # whole one-row events aggregation — 4 fact scans for 4 report
    # rows. One explode over an array of (check_name, violations)
    # structs emits the same rows from ONE derivation.
    fresh_viol = (
        F.when(
            F.col("max_ts") >= F.to_timestamp(F.lit(DQ_FRESH_CUTOFF)), 0
        )
        .otherwise(1)
        .cast("long")
    )
    ev_rows = ev_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("unique_event_id").alias("check_name"),
                    F.col("u_viol").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("not_null_user_id").alias("check_name"),
                    F.col("n_viol").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("accepted_event_types").alias("check_name"),
                    F.col("d_viol").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("freshness_past_cutoff").alias("check_name"),
                    fresh_viol.alias("violations"),
                ),
            )
        ).alias("c"),
        F.col("n_rows").alias("n_checked"),
    ).select("c.check_name", "c.violations", "n_checked")
    orphans = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count("*").alias("violations"))
    n_orders = orders.agg(F.count("*").alias("n_checked"))
    fk = (
        orphans.crossJoin(F.broadcast(n_orders))
        .select(
            F.lit("orders_customer_fk").alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
            "n_checked",
        )
    )
    rep = ev_rows.unionAll(fk)
    return rep.select(
        "check_name",
        "violations",
        "n_checked",
        (F.col("violations") == 0).alias("passed"),
    )


@register(
    "q_embedding_dq",
    tags=("audit", "vector", "dq"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(MIN(len(embedding)) AS BIGINT) AS dims_min,
               CAST(MAX(len(embedding)) AS BIGINT) AS dims_max,
               CAST(COUNT(*) FILTER (
                   WHERE list_dot_product(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(embedding, x -> CAST(x AS DOUBLE))
                   ) = 0.0
               ) AS BIGINT) AS n_zero_norm,
               CAST(COUNT(*) FILTER (
                   WHERE len(list_filter(embedding, x -> isnan(x))) > 0
               ) AS BIGINT) AS n_with_nan,
               CAST(COUNT(DISTINCT embedding) AS BIGINT) AS n_distinct,
               CAST(COUNT(*) FILTER (WHERE label IS NULL) AS BIGINT)
                   AS n_null_label
        FROM embeddings
    """,
)
def q_embedding_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-TABLE data-quality gate — the vector-hygiene checks an
    ANN/dedup pipeline runs before building any index (a zero-norm or
    NaN vector poisons every cosine it touches; ragged dimensionality
    breaks PQ segmentation; silent exact-duplicate vectors inflate
    clusters): row count, dim min/max, zero-norm count, NaN count,
    exact-distinct vector count, null labels. One aggregation pass;
    the distinct is the only shuffle and keys on the vector bytes.
    Zero-norm detection compares an exact 0.0 double fold (sums of
    squares are exactly zero iff every element is ±0), so the check is
    drift-free on both engines."""
    emb = table(spark, sf_dir, "embeddings")
    vd = as_double(F.col("embedding"))
    sumsq = F.aggregate(
        F.zip_with(vd, vd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    has_nan = F.exists(vd, F.isnan)
    return emb.agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.min(F.size("embedding")).cast("bigint").alias("dims_min"),
        F.max(F.size("embedding")).cast("bigint").alias("dims_max"),
        F.count_if(sumsq == 0.0).cast("bigint").alias("n_zero_norm"),
        F.count_if(has_nan).cast("bigint").alias("n_with_nan"),
        F.count_distinct("embedding").cast("bigint").alias("n_distinct"),
        F.count_if(F.col("label").isNull())
        .cast("bigint")
        .alias("n_null_label"),
    )
