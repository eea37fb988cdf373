"""The Arrow-batched pandas_udf cosine path returns the same top-k as the
pure-builtin codegen path (both float64)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_topk_pandas,
)


def test_pandas_udf_topk_equals_builtin(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    others = emb.filter(F.col("vec_id") != 0)

    got = cosine_topk_pandas(others, qv, k=10).collect()

    qdf = spark.createDataFrame([(qv,)], "qv array<double>")
    expected = (
        others.crossJoin(F.broadcast(qdf))
        .select(
            "vec_id",
            cosine(as_double(F.col("embedding")), F.col("qv")).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in expected]
    for g, e in zip(got, expected):
        assert g["sim"] == pytest.approx(e["sim"], abs=1e-12)


def test_pca_power_unit_norm_and_rayleigh_monotone(spark, sf_dir, duck):
    """The power-method result is unit-norm, deterministic, and its
    Rayleigh quotient v'(A'A)v is >= the normalized all-ones start's —
    the per-iteration monotonicity the method guarantees regardless of
    eigengap."""
    import numpy as np

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.similarity import (
        q_embedding_pca_power,
    )

    rows = q_embedding_pca_power(spark, sf_dir).collect()
    comp = np.array(
        [r["component"] for r in sorted(rows, key=lambda r: r["dim"])]
    )
    assert abs(float(comp @ comp) - 1.0) < 1e-4

    emb = duck.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    E = np.array(emb.tolist(), dtype=float)
    C = E - E.mean(0)
    S = C.T @ C
    ones = np.ones(C.shape[1]) / np.sqrt(C.shape[1])
    rq = lambda v: float(v @ S @ v)
    assert rq(comp) >= rq(ones) - 1e-6

    again = q_embedding_pca_power(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
