"""TPC-H-style analytical queries adapted to the driver's star schema
(FIXTURES.md §2) — the engine's bench headliners.

The reference publishes no benchmark queries (BASELINE.md: none), so the
engine anchors its throughput story on these classic shapes: wide
aggregation (Q1), selective filter-join-agg-topk (Q3-ish), multi-way join
through two dimension paths (Q5-ish), and a pure scan-filter-agg (Q6).

Scale notes per query are in the docstrings; all money sums are rounded
identically in both forms (cross-engine float summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register


@register(
    "q_tpch_q1",
    headline=True,
    tags=("tpch", "agg"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)      AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          AS DECIMAL(28,10))), 2) AS DOUBLE)
                                              AS sum_charge,
               ROUND(AVG(l_quantity), 6)      AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_price,
               ROUND(AVG(l_discount), 6)      AS avg_disc,
               COUNT(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): scan-filter + 8-agg groupBy on two
    low-cardinality keys. The whole plan is one scan + partial/final hash
    aggregate — map-side combine shrinks the shuffle to #groups rows per
    task, so it scales linearly to 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            # decimal sums: order-independent, immune to the cent-boundary
            # flip a raw double sum can hit (see q_tpch_q10)
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,10)")), 2
            ).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price.cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(28,10)")),
                2,
            ).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            # averages of money-like doubles via exact decimal sums, then
            # one double division — identical in both engines (see the
            # sum hardening note above)
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(28,10)")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_tpch_q3",
    headline=True,
    tags=("tpch", "join", "topk"),
    oracle="""
        SELECT l.l_orderkey,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority (TPC-H Q3 shape): selective dim filter → broadcast
    the filtered customer keys into orders, shuffle-join lineitem, top-10 by
    revenue (TakeOrderedAndProject — no global sort). Filters are pushed to
    the parquet scans (segment, both date bounds)."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(28,10)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q5",
    headline=True,
    tags=("tpch", "join"),
    oracle="""
        SELECT n.n_name AS nation,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): the classic 6-way join where
    customer and supplier must share a nation. Join order: big tables
    (lineitem ⋈ orders) shuffle on orderkey once; every dim side is a
    broadcast. The c_nationkey = s_nationkey condition rides the existing
    joins — no extra shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(28,10)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@register(
    "q_tpch_q6",
    headline=True,
    tags=("tpch", "scan"),
    oracle="""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue (TPC-H Q6): pure scan-filter-agg. All four
    predicates and the 3-column projection push into the parquet reader —
    the scan reads row groups whose min/max stats can't match, which is the
    entire game at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(28,10)"
                    )
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@register(
    "q_order_priority_counts",
    tags=("tpch", "semi", "agg"),
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY 1
    """,
)
def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): correlated EXISTS as a
    left-semi join with a cross-table predicate."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_tpch_q10",
    tags=("tpch", "join", "topk"),
    oracle="""
        SELECT c_custkey, c_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. Date + returnflag predicates push into both fact scans;
    nation broadcasts; the customer join keys the one real shuffle; the
    top-20 plans as TakeOrderedAndProject (k rows per partition reach the
    driver, never the full rollup)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # per-row cast to decimal(28,10) BEFORE the sum: decimal
            # addition is exact and order-independent, so partial-agg
            # ordering can never flip a cent at the rounding boundary
            # (a raw double sum did, once, at sf0.01).
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,10)"
                    )
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q14",
    tags=("tpch", "join", "agg"),
    oracle="""
        SELECT ROUND(
                 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4
               ) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1996-02-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts in a month.
    The month filter pushes into the lineitem scan; part joins broadcast;
    the conditional revenue split is one codegen'd pass."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-02-01")
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
                )
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_tpch_q18",
    tags=("tpch", "subquery", "having"),
    oracle="""
        SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, o_orderkey, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): IN-subquery over a HAVING
    aggregate, decorrelated by Catalyst into a left-semi join against the
    pre-aggregated order quantities — the fact table is aggregated once,
    filtered, and only surviving orderkeys rejoin the dimensions."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            big.withColumnRenamed("l_orderkey", "bk"),
            F.col("o_orderkey") == F.col("bk"),
            "left_semi",
        )
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_q7",
    tags=("tpch", "join", "agg"),
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS ship_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,10))), 2) AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the fact
    joins two different broadcast copies of the nation dim with a
    disjunctive cross-nation predicate; at scale the nation filters
    shrink supplier/customer BEFORE the fact joins (Catalyst pushes the
    residual OR above the joins, AQE prunes). Decimal volume sum —
    order-independent."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(vol), 2).cast("double").alias("volume"))
    )


@register(
    "q_tpch_q19",
    tags=("tpch", "join", "pushdown"),
    oracle="""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): an OR-of-ANDs
    spanning both join sides. Catalyst extracts the single-side
    conjuncts it can (quantity bounds to the lineitem scan, brand/size
    union to the part scan) and leaves the cross-side residual on the
    join — the classic predicate-decomposition showcase."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    case = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    return j.filter(case).agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Temp view for the SQL-form TPC-H shapes (Q21/Q22 are subquery-heavy
    enough that SQL is the idiomatic Spark surface — Catalyst decorrelates
    EXISTS/NOT EXISTS into the same semi/anti joins either way)."""
    vname = f"__eng_tpch_{name}"
    table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@register(
    "q_tpch_q8",
    tags=("tpch", "join", "agg"),
    oracle="""
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               ROUND(
                 CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                          THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                    AS DECIMAL(28,10))
                          ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,10))) AS DOUBLE), 6
               ) AS mkt_share
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        GROUP BY 1
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): the widest join in the suite
    — fact ⋈ part ⋈ orders ⋈ customer ⋈ nation ⋈ region (customer path) ⋈
    supplier ⋈ nation again (supplier path), share-of-total via conditional
    aggregation per year. Every dimension side broadcasts; lineitem ⋈
    orders is the only shuffle, so the 8-way join costs one exchange at
    100 TB. Share = ratio of two exact decimal sums, divided once in
    double — deterministic across engines."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    zero = F.lit(0).cast("decimal(28,10)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q_tpch_q13",
    tags=("tpch", "outer", "agg"),
    oracle="""
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY n_orders
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution (TPC-H Q13 shape): left-outer join with a
    predicate ON THE JOIN CONDITION (not a post-filter — zero-order
    customers must survive), then an aggregation of an aggregation. The
    first groupBy reuses the join's hash partitioning on custkey (no
    second exchange); the distribution rollup shuffles only #distinct
    counts rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q_tpch_q15",
    tags=("tpch", "subquery", "scalar"),
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(28,10))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): aggregate a quarter of revenue per
    supplier, then keep the supplier(s) hitting the global MAX — the
    view + scalar-subquery pattern. The revenue rollup is computed once
    (cached), the MAX is a one-row broadcast joined back as an equality
    filter. Decimal revenue makes the MAX-equality exact — no float
    ties-by-drift."""
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    # the revenue rollup feeds both the MAX scalar and the equality
    # filter; expressing the max as an empty-partition window over the
    # ALREADY-AGGREGATED rollup evaluates the expensive scan+agg exactly
    # once (a scalar-subquery formulation plans the aggregate twice —
    # the two subtrees don't canonicalize equal, so ReuseExchange can't
    # kick in; and a .cache() would be released before the caller ever
    # executes the returned plan). The window sees one row per supplier,
    # not per line item — cheap at any scale.
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            ).alias("total_rev")
        )
    )
    mx = F.max("total_rev").over(Window.partitionBy())
    return (
        rev.withColumn("mx", mx)
        .filter(F.col("total_rev") == F.col("mx"))
        .join(
            F.broadcast(supplier),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q_tpch_q17",
    tags=("tpch", "subquery", "agg"),
    oracle="""
        SELECT ROUND(
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,10)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): per-part correlated
    average — each line item compares against 0.2× the mean quantity of
    its own part. Decorrelated form: pre-aggregate avg quantity per
    partkey (one shuffle on the fact), join it back, filter, sum. The
    brand filter broadcasts into both the fact scan and the per-part
    aggregate, so the rollup only covers surviving parts. Quantities are
    small integers stored as doubles — their sums are exact, making the
    0.2×avg threshold bit-identical across engines."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    branded = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    # per-part average as a window over the branded fact: ONE evaluation
    # of the scan+join and one shuffle on partkey — the groupBy+join-back
    # formulation evaluates the branded join twice (the subtrees don't
    # canonicalize equal, so no exchange reuse)
    avg_qty = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        branded.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q_tpch_q21",
    tags=("tpch", "subquery", "semi", "anti"),
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted:
    "late" = shipped >60 days after the order date since the fixture has
    no commit/receipt dates): the only double-correlated-existence query
    in the suite — an EXISTS (another supplier touched the order) AND a
    NOT EXISTS (no OTHER supplier was late on it). Catalyst decorrelates
    the pair into a left-semi and a left-anti join on orderkey with the
    suppkey inequality as residual — three passes over lineitem keyed the
    same way, one shuffle key at scale. Counts only — no float risk."""
    s = _view(spark, sf_dir, "supplier")
    li = _view(spark, sf_dir, "lineitem")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM {s} s
        JOIN {li} l1 ON s.s_suppkey = l1.l_suppkey
        JOIN {o} o   ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM {li} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM {li} l3
              JOIN {o} o2 ON o2.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


@register(
    "q_tpch_q22",
    tags=("tpch", "subquery", "anti", "scalar"),
    oracle="""
        WITH threshold AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT CAST(c.c_nationkey % 10 AS INTEGER) AS cntrycode,
               COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS totacctbal
        FROM customer c, threshold t
        WHERE c.c_acctbal > t.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY 1
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape, adapted: country code =
    nationkey mod 10 since the fixture has no phone column): customers
    with above-average positive balances and no RECENT order (every
    fixture customer has some order, so the anti join keys on activity
    since 1999) — an uncorrelated
    scalar-average threshold (one-row broadcast) combined with an anti
    join against the fact. The average is an exact decimal sum divided
    once in double, so the > threshold comparison can't flip a
    borderline customer between engines."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH threshold AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM {c} WHERE c_acctbal > 0.0
        )
        SELECT CAST(c.c_nationkey % 10 AS INT) AS cntrycode,
               COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS totacctbal
        FROM {c} c, threshold t
        WHERE c.c_acctbal > t.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM {o} o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY 1
    """)


@register(
    "q_tpch_q12",
    tags=("tpch", "join", "agg"),
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > o.o_orderdate
        GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-modes-and-priority (TPC-H Q12 shape, adapted: the fixture
    has no shipmode/commit/receipt columns, so the "late shipment" test is
    l_shipdate > o_orderdate and the pivot key is l_linestatus): join with
    a cross-table inequality residual, then a two-way conditional count —
    the CASE-pivot inside one aggregation pass. The year filter pushes to
    the lineitem scan; both sides shuffle once on orderkey. With Q12 the
    engine covers every TPC-H query expressible without a partsupp table
    (17 of 22: Q1,3,4,5,6,7,8,10,12,13,14,15,17,18,19,21,22)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
