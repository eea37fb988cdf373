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


def test_three_round_unroll_is_insufficient_on_a_deep_chain(spark):
    # Regression guard for WHY the fixpoint loop exists: a truncated
    # iteration count splits a deep chain into >1 cluster ids. Since the
    # round-10 pointer-jumping optimization a round covers multiple hops
    # (the diameter-5 chain now converges within 3 rounds — that speedup
    # is the point), so the guard uses a diameter-63 chain, far past the
    # ~3x-per-round reach of 3 combined propagate+jump rounds.
    edges = _sym_edges(spark, _chain(64)).persist()
    truncated = {
        r["doc_id"]: r["lbl"]
        for r in connected_components(edges, max_iters=3).collect()
    }
    assert len(set(truncated.values())) > 1
    edges.unpersist()


def test_pointer_jumping_converges_deep_chain_in_few_rounds(spark):
    # The shortcutting step must collapse a diameter-31 chain in
    # O(log n) combined rounds: 8 rounds would take >=31 plain
    # propagation rounds without the jump, so convergence inside 8
    # proves the label-of-label join is live.
    edges = _sym_edges(spark, _chain(32)).persist()
    labels = {
        r["doc_id"]: r["lbl"]
        for r in connected_components(edges, max_iters=8).collect()
    }
    assert labels == {f"a{i}": "a0" for i in range(32)}
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


def test_leakage_free_split_has_no_cross_split_near_dups(spark, sf_dir):
    # The whole point of q_split_no_leakage: cluster-granular assignment
    # means the contamination audit over the cluster-based split is empty.
    from pyspark.sql import functions as F

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
        q_dedup_clusters,
        q_dedup_minhash,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.sampling import (
        _doc_split,
    )

    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    pairs = q_dedup_minhash(spark, sf_dir)
    # label each pair side with the split of its CLUSTER id (doc itself
    # for singletons — irrelevant here since paired docs are clustered)
    a = clusters.withColumnsRenamed(
        {"doc_id": "doc_id_a", "cluster_id": "cl_a"}
    )
    b = clusters.withColumnsRenamed(
        {"doc_id": "doc_id_b", "cluster_id": "cl_b"}
    )
    labeled = (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            _doc_split(F.col("cl_a")).alias("sa"),
            _doc_split(F.col("cl_b")).alias("sb"),
        )
    )
    assert labeled.filter(F.col("sa") != F.col("sb")).count() == 0
