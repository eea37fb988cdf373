"""Vector math over ``array<float>`` embedding columns — pure built-ins
(``transform`` / ``zip_with`` / ``aggregate``), no UDFs, so the whole
similarity pipeline stays inside whole-stage codegen.

Everything is computed in float64 after an explicit element cast; the
DuckDB oracles do the same (``list_transform(v, x -> CAST(x AS DOUBLE))``)
so the sequential fold produces bit-comparable sums (outputs are still
rounded in both engines before hashing).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf can resolve the stringified type hints
from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via zip_with + aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB twins ---------------------------------------------------------

def as_double_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


# --- Arrow-vectorized twin -------------------------------------------------

def cosine_topk_pandas(df, query_vec, vec_col="embedding", id_col="vec_id", k=10):
    """Arrow-batched top-k cosine scoring via a scalar ``pandas_udf`` —
    the alternative data path for wide vectors, where one numpy matmul
    per Arrow batch beats the per-element codegen fold (the built-in
    ``cosine()`` wins on short vectors; this wins as dimensionality
    grows). Returns (id, sim) for the k most similar rows.

    ``query_vec`` is a plain Python list; it ships to executors inside
    the serialized UDF (a few KB), not as a join."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def score(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.apply(lambda v: np.asarray(v, dtype=np.float64)))
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    return (
        df.select(id_col, score(F.col(vec_col)).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
