"""Graph analytics over the near-dup pair graph: PageRank.

Joins the iterative-algorithm family (k-means in ``similarity.py``,
fixpoint connected components in ``dedup.py``): each PageRank iteration
is one edges⨝ranks join + one aggregation, i.e. exactly the
shuffle-bounded join-agg shape Spark executes well, and the oracle
replays the same fixed iteration count unrolled as chained CTEs so the
result is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .dedup import _minhash_oracle, q_dedup_minhash

PR_ITERS = 3
PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
            SELECT e.dst AS doc_id,
                   {1 - PR_DAMPING} + {PR_DAMPING} * CAST(
                       SUM(CAST(r.pr / d.d AS DECIMAL(28,10)))
                       AS DOUBLE) AS pr
            FROM edges e
            JOIN {prev} r ON e.src = r.doc_id
            JOIN deg d ON e.src = d.src
            GROUP BY 1
        )"""
        )
        prev = f"r{i}"
    chain = ",\n        ".join(iters)
    return f"""
        WITH pairs AS ({_minhash_oracle()}),
        edges AS (
            SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
            UNION ALL
            SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
        r0 AS (SELECT src AS doc_id, 1.0 AS pr FROM deg),
        {chain}
        SELECT doc_id, ROUND(pr, 6) AS pagerank FROM {prev}
    """


@register(
    "q_pagerank_neardup",
    tags=("graph", "iterative", "dedup", "scale"),
    oracle=_pagerank_oracle(),
)
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGERANK over the MinHash near-dup graph ({PR_ITERS} fixed
    iterations, damping {PR_DAMPING}) — ranks the "canonical-ness" of
    documents inside duplicate neighborhoods (a hub copied by many
    near-identical pages outranks its copies; a centrality-aware keeper
    policy for ``q_dedup_keep_best``).

    Plan: each iteration is edges ⨝ ranks (shuffle keyed on the node id)
    followed by a partial-combined sum — the rank vector, never the
    documents, is what moves.  The undirected near-dup graph means every
    node has in-edges, so no dangling-mass term is needed.  At 100 TB the
    iteration count is fixed (no convergence scan), each round's lineage
    is cut with ``localCheckpoint`` exactly like ``connected_components``,
    and the edge list (near-dup pairs ≪ documents) is the only state.
    The ORACLE unrolls the same {PR_ITERS} iterations as chained CTEs —
    the hash match pins every contribution sum across engines."""
    pairs = q_dedup_minhash(spark, sf_dir).select("doc_id_a", "doc_id_b")
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_id_b").alias("doc_id_a"),
                F.col("doc_id_a").alias("doc_id_b"),
            )
        )
        .withColumnsRenamed({"doc_id_a": "src", "doc_id_b": "dst"})
        .persist()
    )
    from ..caches import track_checkpoint, track_transient

    edges = track_transient(edges)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = deg.select(F.col("src").alias("doc_id"), F.lit(1.0).alias("pr"))
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(deg, "src")
            .join(ranks, F.col("src") == F.col("doc_id"))
            .select(F.col("dst"), (F.col("pr") / F.col("d")).alias("c"))
        )
        # Contributions accumulate as decimal(28,10): the sum becomes
        # order-independent (exact), so the cross-engine hash gate can't
        # flip on a double near a 6-dp rounding boundary.
        ranks = contribs.groupBy(F.col("dst").alias("doc_id")).agg(
            (
                F.lit(1 - PR_DAMPING)
                + F.lit(PR_DAMPING)
                * F.sum(F.col("c").cast("decimal(28,10)")).cast("double")
            ).alias("pr")
        )
        ranks = track_checkpoint(ranks.localCheckpoint(eager=False))
    return ranks.select("doc_id", F.round("pr", 6).alias("pagerank"))


def _triangles_oracle() -> str:
    return f"""
        WITH pairs AS ({_minhash_oracle()}),
        e AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs),
        tri AS (
            SELECT e1.a AS a, e1.b AS b, e2.b AS c
            FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        nodes AS (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY 1
    """


@register(
    "q_graph_triangles",
    tags=("graph", "dedup", "diagnostics", "scale"),
    oracle=_triangles_oracle(),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE participation counts over the near-dup graph — the
    clustering-coefficient signal: near-dup neighborhoods that are true
    cliques (every copy similar to every other) triangle densely, while
    boilerplate 'hub' pairs form stars with few triangles — a cheap
    structural check on whether a cluster is safe to collapse to one
    keeper.

    Plan: the canonical two-join triangle enumeration over the ORIENTED
    edge list (a < b everywhere, so each triangle a<b<c is produced
    exactly once and no orientation dedup is needed): wedges from
    e1.b = e2.a, closed by an equi-join back to the edge list on
    (a, c). Every join is an equi-join keyed on node ids; at 100 TB the
    wedge count — Σ deg²(v), the known hot spot — is bounded because the
    input is the LSH-banded pair list (band width caps per-key degree),
    and AQE skew-splits any residual hub. The per-node rollup is one
    partial-combined aggregation of triangle-count-sized data."""
    # persist: the pair list is referenced by all three join branches —
    # without it the whole MinHash pipeline would run three times (same
    # pattern as q_pagerank_neardup's edge list)
    from ..caches import track_transient

    pairs = track_transient(
        q_dedup_minhash(spark, sf_dir)
        .select(F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b"))
        .persist()
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    # ROUND-11 (guide §2.4, the round-10 growth-accounting pattern): the
    # per-corner union replayed the two-join `tri` subtree THREE times
    # (plan: 3 identical join trees under the Union); an array explode
    # emits the same (a, b, c) multiset from ONE derivation.
    nodes = tri.select(
        F.explode(F.array("a", "b", "c")).alias("doc_id")
    )
    return nodes.groupBy("doc_id").agg(F.count("*").alias("n_triangles"))


def _degree_oracle() -> str:
    return f"""
        WITH pairs AS ({_minhash_oracle()}),
        edges AS (
            SELECT doc_id_a AS src FROM pairs
            UNION ALL
            SELECT doc_id_b AS src FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1)
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM deg
        GROUP BY 1
    """


@register(
    "q_graph_degree_stats",
    tags=("graph", "dedup", "diagnostics"),
    oracle=_degree_oracle(),
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE DISTRIBUTION of the near-dup graph — the skew diagnostic
    you run BEFORE the triangle/PageRank passes: a heavy-tailed degree
    histogram (a few template/boilerplate hubs touching thousands of
    docs) predicts wedge-count blowup (Σ deg²) and tells you to cap or
    salt hub nodes; a flat histogram means the banded pair list is safe
    to feed straight into clustering.

    Plan: two partial-combined aggregations over the LSH pair list
    (node degrees, then the degree-sized histogram rollup) — work is
    |pairs| + |nodes|, output is |distinct degrees| rows. No joins at
    all, so this diagnostic is orders cheaper than the passes it
    protects."""
    pairs = q_dedup_minhash(spark, sf_dir)
    # ROUND-11 (guide §2.4): the two-sided union replayed the ENTIRE
    # minhash pipeline once per side (2 scans in the plan); the explode
    # emits both endpoints from one derivation.
    nodes = pairs.select(
        F.explode(F.array("doc_id_a", "doc_id_b")).alias("src")
    )
    deg = nodes.groupBy("src").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


HIER_FANOUT = 10  # arithmetic org chart: parent(k) = k div 10
# Divisor ladder 10^0..10^18 covers the FULL bigint range (max bigint
# < 10^19, so k div 10^18 <= 9 and the explicit root 0 completes every
# walk) — the ancestor array can never omit the root no matter the
# scale factor, and array_distinct collapses the unused tail to one 0
# entry so the explode fan-out stays digits(k)+1, not 20.
_HIER_DIVISORS = [HIER_FANOUT**i for i in range(19)]


@register(
    "q_hierarchy_subtree_revenue",
    tags=("graph", "hierarchy", "recursive", "scale"),
    oracle=f"""
        WITH RECURSIVE spend AS (
            SELECT o_custkey AS node,
                   SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        walk AS (
            SELECT node AS anc, node, s, n_orders FROM spend
            UNION ALL
            SELECT w.anc // {HIER_FANOUT} AS anc, w.node, w.s, w.n_orders
            FROM walk w WHERE w.anc > 0
        )
        SELECT anc AS node,
               CAST(COUNT(DISTINCT node) AS BIGINT) AS n_members,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(s), 2) AS DOUBLE) AS subtree_revenue
        FROM walk
        GROUP BY 1
    """,
)
def q_hierarchy_subtree_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL SUBTREE ROLLUP (the recursive-CTE workload): every
    customer hangs in a {HIER_FANOUT}-ary org chart defined
    arithmetically — parent(k) = k div {HIER_FANOUT}, the same
    derived-dimension trick as the TPC-H partsupp — and each node
    reports member count, order count, and total revenue of its ENTIRE
    subtree. The DuckDB oracle walks the chart with a genuine
    ``WITH RECURSIVE`` ancestor traversal; Spark has no recursive CTE,
    and this operator shows the scale-correct replacement: because
    every ancestor of k is a PREFIX of its digit string, the full
    ancestor set is a CLOSED-FORM per-row array
    (k, k div 10, k div 100, …, 0) — one explode, one aggregation,
    ZERO joins and zero iterations. The hash match proves
    unrolled-expansion ≡ recursive traversal.

    At 100 TB: the fact table aggregates once per customer
    (custkey-keyed, map-combined); the explode multiplies the
    CUSTOMER aggregate by depth ≤ digits(custkey)+1 — bounded fan-out
    on a dimension-sized table, with the rollup partial-combined on
    the ancestor key. The divisor ladder spans the full bigint range
    and the root 0 is appended explicitly, so the array matches the
    oracle's walk-to-root at ANY scale factor (no fixture-tuned depth
    constant). An iterative-join formulation (the PageRank /
    connected-components shape — ``q_hierarchy_data_edges``) is only
    needed when the parent edge is DATA, not arithmetic — stated
    boundary."""
    from ..catalog import table

    spend = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("s"),
            F.count("*").alias("n_orders"),
        )
    )
    # integer `div` per literal power — exact for ANY bigint custkey
    # (no double pow in the path); trailing 0s collapse via distinct
    ancestors = F.array_distinct(
        F.concat(
            F.array(
                *[
                    F.expr(f"node div {d}").cast("bigint")
                    for d in _HIER_DIVISORS
                ]
            ),
            F.array(F.lit(0).cast("bigint")),
        )
    )
    walked = spend.select(
        F.explode(ancestors).alias("anc"), "node", "s", "n_orders"
    )
    # members are distinct per ancestor by construction (array_distinct
    # leaves one row per (member, ancestor)), so the plain count equals
    # the oracle's COUNT(DISTINCT) without an Expand in the plan
    return walked.groupBy(F.col("anc").alias("node")).agg(
        F.count("*").alias("n_members"),
        F.sum("n_orders").alias("n_orders"),
        F.round(F.sum("s"), 2).cast("double").alias("subtree_revenue"),
    )


# Data-edge hierarchy: the parent pointer is a COLUMN of an edge table,
# not an arithmetic rule the plan may exploit — the declared boundary of
# q_hierarchy_subtree_revenue. The fixture derives the edge from the
# customer key (mixed multiplier -> variable branching factor 2..8, so
# parent(k) < k strictly: the forest is acyclic with data-looking,
# non-uniform shape), but the Spark plan treats it as an OPAQUE edge
# list and climbs it by ITERATED JOIN to a fixpoint — the recursive-CTE
# execution strategy that works when no closed form exists.
_HIER_EDGE_EXPR = "c_custkey div (2 + (c_custkey * 2654435761) % 7)"
_HIER_DATA_MAX_ITERS = 64


@register(
    "q_hierarchy_data_edges",
    tags=("graph", "hierarchy", "recursive", "iterative", "scale"),
    oracle=f"""
        WITH RECURSIVE edges AS (
            SELECT c_custkey AS node,
                   {_HIER_EDGE_EXPR.replace("div", "//")} AS parent
            FROM customer
        ),
        spend AS (
            SELECT o_custkey AS node,
                   SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        walk AS (
            SELECT node AS anc, node FROM edges
            UNION ALL
            SELECT e.parent AS anc, w.node
            FROM walk w
            JOIN edges e ON e.node = w.anc AND e.parent < e.node
        )
        SELECT w.anc AS node,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(COALESCE(SUM(sp.n_orders), 0) AS BIGINT) AS n_orders,
               CAST(ROUND(COALESCE(SUM(sp.s), 0), 2) AS DOUBLE)
                   AS subtree_revenue
        FROM walk w LEFT JOIN spend sp ON sp.node = w.node
        GROUP BY 1
    """,
)
def q_hierarchy_data_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBTREE ROLLUP OVER DATA EDGES (iterative-join recursion): the
    twin of ``q_hierarchy_subtree_revenue`` for the case its docstring
    declares out of closed-form reach — the parent pointer is a DATA
    column, so the ancestor closure must be COMPUTED, not expanded.
    The oracle walks a genuine ``WITH RECURSIVE`` over the same edge
    table; Spark climbs it one level per iteration — frontier ⨝ edges
    on the ancestor key — accumulating (ancestor, member) pairs until
    the frontier empties (a true fixpoint, like
    ``connected_components``), then rolls member spend up per ancestor
    in one aggregation. Parents outside the customer key space simply
    stop climbing (forest of orphan roots) — both engines agree by the
    same join semantics.

    At 100 TB: per-iteration cost is one equi-join of the frontier
    (≤ |customer| rows) against the edge list on the climbed key — a
    dimension-sized shuffle, never fact-sized; the fact table
    aggregates ONCE (spend) before joining the closure. Each frontier
    is ``localCheckpoint``-ed so the iterative plan never accretes
    lineage, and the loop bound is log₂(max key) because every edge at
    least halves the key (branching factor ≥ 2). Iterations: ~24 at
    bigint scale, ~8 at fixture scale."""
    from functools import reduce

    from ..catalog import table

    cust = table(spark, sf_dir, "customer")
    edges = (
        cust.select(
            F.col("c_custkey").alias("node"),
            F.expr(_HIER_EDGE_EXPR).cast("bigint").alias("parent"),
        )
        .persist()
    )
    # climb: frontier_i holds (anc, node) at depth i; next depth exists
    # only where the current ancestor itself has a DECREASING edge row.
    # The parent < node guard is the acyclicity contract made explicit:
    # it drops self-loops (the fixture's custkey-0 root points at
    # itself) and would drop any data cycle, so the fixpoint always
    # exists — the same guard the oracle's recursive join carries.
    from ..caches import track_checkpoint

    climb = edges.filter(F.col("parent") < F.col("node"))
    frontier = track_checkpoint(
        edges.select(F.col("node").alias("anc"), "node").localCheckpoint()
    )
    parts = [frontier]
    for _ in range(_HIER_DATA_MAX_ITERS):
        nxt = (
            frontier.join(
                climb.withColumnsRenamed(
                    {"node": "anc", "parent": "up"}
                ),
                "anc",
            )
            .select(F.col("up").alias("anc"), "node")
            .localCheckpoint()
        )
        nxt = track_checkpoint(nxt)
        if nxt.isEmpty():
            break
        parts.append(nxt)
        frontier = nxt
    closure = reduce(DataFrame.unionByName, parts)
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("s"),
            F.count("*").alias("n_orders"),
        )
    )
    out = (
        closure.join(spend, "node", "left")
        .groupBy(F.col("anc").alias("node"))
        .agg(
            F.count("*").alias("n_members"),
            F.coalesce(F.sum("n_orders"), F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.round(
                F.coalesce(F.sum("s"), F.lit(0).cast("decimal(28,10)")), 2
            )
            .cast("double")
            .alias("subtree_revenue"),
        )
    )
    edges.unpersist()
    return out
