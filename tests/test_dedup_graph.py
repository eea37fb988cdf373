"""Connected-components convergence: the fixpoint loop must label deep
chain-shaped components correctly where a fixed 3-round unroll provably
does not (VERDICT r1 item 4 / ADVICE dedup.py:606)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
    connected_components,
)


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _chain(n):
    """a0-a1-...-a(n-1): a path of diameter n-1."""
    return [(f"a{i}", f"a{i + 1}") for i in range(n - 1)]


def test_chain_diameter_5_converges_to_one_component(spark):
    # Path a0..a5 (diameter 5). The min label a0 needs 5 propagation
    # rounds to reach a5 — a 3-round unroll leaves a5 (and a4, whose
    # nearest view of the min is 3 hops old) mislabeled.
    edges = _sym_edges(spark, _chain(6)).persist()
    labels = {r["doc_id"]: r["lbl"] for r in connected_components(edges).collect()}
    assert labels == {f"a{i}": "a0" for i in range(6)}
    edges.unpersist()


def test_three_round_unroll_is_insufficient_on_the_same_chain(spark):
    # Regression guard for WHY the fixpoint loop exists: capping the same
    # loop at 3 rounds splits the diameter-5 chain into >1 cluster ids.
    edges = _sym_edges(spark, _chain(6)).persist()
    truncated = {
        r["doc_id"]: r["lbl"]
        for r in connected_components(edges, max_iters=3).collect()
    }
    assert len(set(truncated.values())) > 1
    edges.unpersist()


def test_disjoint_components_and_clique(spark):
    # Two components: a triangle {t0,t1,t2} and a pair {p0,p1}; labels
    # must not bleed across components.
    pairs = [("t0", "t1"), ("t1", "t2"), ("t0", "t2"), ("p0", "p1")]
    edges = _sym_edges(spark, pairs).persist()
    labels = {r["doc_id"]: r["lbl"] for r in connected_components(edges).collect()}
    assert labels == {"t0": "t0", "t1": "t0", "t2": "t0", "p0": "p0", "p1": "p0"}
    edges.unpersist()


def test_fixpoint_matches_recursive_oracle_on_chain(spark, duck):
    # The DuckDB recursive-reachability oracle and the Spark fixpoint loop
    # must agree on a shape the old unrolled oracle got wrong.
    rows = [(f"a{i}", f"a{i + 1}") for i in range(7)]  # diameter-7 chain
    duck.execute("CREATE OR REPLACE TABLE _cc_edges(src VARCHAR, dst VARCHAR)")
    duck.executemany("INSERT INTO _cc_edges VALUES (?, ?)", rows)
    oracle = dict(
        duck.execute(
            """
            WITH RECURSIVE edges AS (
                SELECT src, dst FROM _cc_edges
                UNION ALL
                SELECT dst, src FROM _cc_edges
            ),
            reach AS (
                SELECT src AS doc_id, dst AS r FROM edges
                UNION
                SELECT reach.doc_id, e.dst AS r
                FROM reach JOIN edges e ON e.src = reach.r
            )
            SELECT doc_id, LEAST(doc_id, MIN(r)) FROM reach GROUP BY doc_id
            """
        ).fetchall()
    )
    edges = _sym_edges(spark, rows).persist()
    labels = {r["doc_id"]: r["lbl"] for r in connected_components(edges).collect()}
    assert labels == oracle
    edges.unpersist()
