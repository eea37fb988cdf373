"""Deduplication operators over the ``documents`` table (SURVEY.md §7
Phase 5; training-data pipeline north star).

Four tiers, each a different cost/recall point at 100 TB:

- exact        : sha256 content key, groupBy — one shuffle on the key.
- n-gram Jaccard: exact pairwise similarity via a shingle inverted-index
  join — exact but quadratic in cluster size; the oracle for the
  approximate tiers.
- MinHash+LSH  : k=16 signatures banded 4×4; only band-collision pairs are
  verified — the linear-ish scale path. Deterministic md5-based hashing so
  the DuckDB oracle reproduces the SAME candidates (functions.hashing).
- SimHash      : 44-bit fingerprints, hamming ≤ 3 via banded chunks.

Everything is built-ins (split/transform/array_min/explode/joins); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import (
    BAND_SIZE,
    MERSENNE_P,
    MINHASH_AB,
    NUM_BANDS,
    md5_long,
    md5_long_sql,
)
from ..functions.text import shingles, shingles_sql, tokens
from ..plans.registry import register

JACCARD_THRESHOLD = 0.8


@register(
    "q_dedup_exact",
    tags=("dedup", "hash"),
    oracle="""
        SELECT doc_id, sha256(text) AS content_key,
               CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
                    THEN 1 ELSE 0 END AS is_kept
        FROM documents
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256 content key; keeper = lowest doc_id per key.
    At 100 TB this is one hash-shuffle on a 32-byte key — the key (not the
    document) is what moves. sha256 (not xxhash64) so the oracle computes
    identical keys."""
    docs = table(spark, sf_dir, "documents")
    w_key = F.sha2(F.col("text"), 256)
    from pyspark.sql import Window

    return docs.select(
        "doc_id",
        w_key.alias("content_key"),
        F.when(
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy(w_key)),
            1,
        )
        .otherwise(0)
        .alias("is_kept"),
    )


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, shingle (distinct 3-word shingles, exploded)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")))).alias("shingle"),
    )


_SHINGLE_CTE = f"""
        w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        sh AS (
            SELECT doc_id, unnest({shingles_sql('words')}) AS shingle FROM w
        ),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
"""


@register(
    "q_dedup_ngram_jaccard",
    headline=True,
    tags=("dedup", "jaccard"),
    oracle=f"""
        WITH {_SHINGLE_CTE},
        inter AS (
            SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
                   COUNT(*) AS c
            FROM sh x JOIN sh y
              ON x.shingle = y.shingle AND x.doc_id < y.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_id_a, doc_id_b,
               ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
        FROM inter
        JOIN sz sa ON inter.doc_id_a = sa.doc_id
        JOIN sz sb ON inter.doc_id_b = sb.doc_id
        WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: 3-word-shingle Jaccard ≥ 0.8 via an inverted-
    index self-join (pairs must share ≥1 shingle — never all-pairs). The
    shuffle key is the shingle; hot shingles are the skew risk at scale,
    which the MinHash tier exists to avoid."""
    sh = _shingle_df(spark, sf_dir)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    sza = sz.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(F.broadcast(sza), "doc_id_a")
        .join(F.broadcast(szb), "doc_id_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard")
        )
    )


def _minhash_oracle() -> str:
    sig_aggs = ",\n                   ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE_P}) AS s{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n            UNION ALL\n            ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || '_' || ".join(
                f"CAST(s{b * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
            ),
        )
        for b in range(NUM_BANDS)
    )
    return f"""
        WITH {_SHINGLE_CTE},
        h AS (SELECT doc_id, shingle, {md5_long_sql('shingle')} AS h FROM sh),
        sig AS (
            SELECT doc_id,
                   {sig_aggs}
            FROM h GROUP BY doc_id
        ),
        bands AS (
            {band_selects}
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id
        ),
        inter AS (
            SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS c
            FROM cand c
            JOIN sh x ON x.doc_id = c.doc_id_a
            JOIN sh y ON y.doc_id = c.doc_id_b AND y.shingle = x.shingle
            GROUP BY 1, 2
        )
        SELECT c.doc_id_a, c.doc_id_b,
               ROUND(c.c * 1.0 / (sa.n + sb.n - c.c), 6) AS jaccard
        FROM inter c
        JOIN sz sa ON c.doc_id_a = sa.doc_id
        JOIN sz sb ON c.doc_id_b = sb.doc_id
        WHERE c.c * 1.0 / (sa.n + sb.n - c.c) >= {JACCARD_THRESHOLD}
    """


@register(
    "q_dedup_minhash",
    headline=True,
    tags=("dedup", "minhash", "lsh", "scale"),
    oracle=_minhash_oracle(),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: 16 minhashes banded 4×4; only band-collision
    candidates get exact Jaccard verification (≥ 0.8 emitted). This is the
    100 TB path: cost is O(docs × bands) for the candidate join instead of
    an inverted-index join whose hot-shingle skew explodes quadratically.
    The oracle replays the IDENTICAL pipeline in SQL (same md5-derived
    hashes, same band keys), so candidates — not just survivors — must
    agree across engines."""
    # Signature via explode + one grouped aggregation with 16 MIN aggs —
    # NOT via 16 array_min(transform(...)) expressions: Catalyst collapses
    # projections, so the per-row array form would re-inline the
    # shingling+md5 work into every one of the 16 signature expressions
    # (measured 16× slower at sf0.1). The grouped form hashes each shingle
    # once and partial-aggregates map-side.
    sh = _shingle_df(spark, sf_dir)
    hashed = sh.select("doc_id", md5_long(F.col("shingle")).alias("h"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(
                f"s{i}"
            )
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    ).select(
        "doc_id",
        F.array(*[F.col(f"s{i}") for i in range(len(MINHASH_AB))]).alias("sig"),
    )
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("sig", b * BAND_SIZE + j + 1).cast(
                                    "string"
                                )
                                for j in range(BAND_SIZE)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    x = band_rows.alias("x")
    y = band_rows.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("y.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    # exact verification of candidates only (sh reused from above)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("db2"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cand.join(sh_a, "doc_id_a")
        .join(
            sh_b,
            (F.col("doc_id_b") == F.col("db2"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("c"))
    )
    sza = sz.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(F.broadcast(sza), "doc_id_a")
        .join(F.broadcast(szb), "doc_id_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


SIMHASH_BITS = 44
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = 11
HAMMING_MAX = 3


def _simhash_votes(words: F.Column) -> F.Column:
    """Per-bit ±1 vote sums (array<long> of length SIMHASH_BITS) over the
    md5-hashes of an array<string> of words. Bit masks are Python-literal
    (1 << j) constants — Spark's shiftright() only takes literal shift
    amounts, so the 44 bit tests are generated by a Python loop instead of
    a nested transform."""
    hs = F.transform(words, lambda w: md5_long(w))
    zeros = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)

    def add_word(acc: F.Column, h: F.Column) -> F.Column:
        bits = F.array(
            *[
                F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(SIMHASH_BITS)
            ]
        )
        return F.zip_with(acc, bits, lambda a, v: a + v)

    return F.aggregate(hs, zeros, add_word)


def _votes_to_simhash(votes: F.Column) -> F.Column:
    """Reassemble sign bits into the 44-bit fingerprint."""
    terms = [
        F.when(F.element_at(votes, j + 1) > 0, F.lit(1 << j))
        .otherwise(F.lit(0))
        .cast("long")
        for j in range(SIMHASH_BITS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


_SIMHASH_SQL = f"""
        w AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
            FROM documents
        ),
        hv AS (
            SELECT doc_id,
                   list_transform(words, s -> {md5_long_sql('s')}) AS hs
            FROM w
        ),
        votes AS (
            SELECT doc_id,
                   list_transform(
                       range(0, {SIMHASH_BITS}),
                       j -> list_sum(list_transform(hs,
                            h -> CASE WHEN (h >> j) & 1 = 1
                                      THEN 1 ELSE -1 END))
                   ) AS v
            FROM hv
        ),
        fp AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(
                       range(0, {SIMHASH_BITS}),
                       j -> CASE WHEN v[j + 1] > 0
                                 THEN (CAST(1 AS BIGINT) << j)
                                 ELSE 0 END)) AS BIGINT) AS simhash
            FROM votes
        )
"""


@register(
    "q_dedup_simhash",
    tags=("dedup", "simhash"),
    oracle=f"WITH {_SIMHASH_SQL} SELECT doc_id, simhash FROM fp",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 44-bit SimHash fingerprint (distinct-word votes) —
    built-ins only (transform/zip_with/aggregate fold), reproduced exactly
    by the oracle's list_transform/list_sum pipeline. Votes materialize in
    an intermediate projection so the fold isn't re-expanded 44× by the
    bit-reassembly expressions."""
    docs = table(spark, sf_dir, "documents")
    words = F.array_distinct(tokens(F.col("text")))
    votes = docs.select("doc_id", _simhash_votes(words).alias("v"))
    return votes.select(
        "doc_id", _votes_to_simhash(F.col("v")).alias("simhash")
    )


@register(
    "q_dedup_simhash_pairs",
    tags=("dedup", "simhash", "lsh"),
    oracle=f"""
        WITH {_SIMHASH_SQL},
        chunks AS (
            SELECT doc_id, simhash, c,
                   (simhash >> (c * {SIMHASH_CHUNK_BITS})) & {(1 << SIMHASH_CHUNK_BITS) - 1} AS chunk_val
            FROM fp, range(0, {SIMHASH_CHUNKS}) t(c)
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_id_a, x.simhash AS ha,
                            y.doc_id AS doc_id_b, y.simhash AS hb
            FROM chunks x JOIN chunks y
              ON x.c = y.c AND x.chunk_val = y.chunk_val
             AND x.doc_id < y.doc_id
        )
        SELECT doc_id_a, doc_id_b,
               bit_count(xor(ha, hb)) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= {HAMMING_MAX}
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming ≤ 3 over 44 bits. Pigeonhole
    banding — 4 chunks of 11 bits; any pair within hamming 3 shares ≥1
    exact chunk — makes the candidate join an equi-join (the scale path),
    then the exact popcount filter runs on candidates only."""
    fp = q_dedup_simhash(spark, sf_dir)
    chunk_rows = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("simhash"), c * SIMHASH_CHUNK_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_CHUNK_BITS) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.c", "ch.chunk_val")
    x = chunk_rows.alias("x")
    y = chunk_rows.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.c") == F.col("y.c"))
            & (F.col("x.chunk_val") == F.col("y.chunk_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("x.simhash").alias("ha"),
            F.col("y.doc_id").alias("doc_id_b"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(hamming <= HAMMING_MAX).select(
        "doc_id_a", "doc_id_b", hamming.alias("hamming")
    )
