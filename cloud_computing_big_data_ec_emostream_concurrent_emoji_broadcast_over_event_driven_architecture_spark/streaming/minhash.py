"""Streaming MinHash signature tier — the batch/stream split a production
near-dup pipeline runs at 100 TB.

Signature computation (shingle → md5 → k minhash folds) is PURE per-row
expression work: no state, no shuffle, no watermark. That makes it the
ideal streaming stage — documents get fingerprinted as they arrive, and
the compact (doc_id, n, sig) rows land in a signature table (parquet /
Kafka) a fraction the size of the corpus. The LSH band self-join and
candidate verification — the parts that need to see *all* documents —
then run as a periodic BATCH job over that table (`lsh_band_rows` →
`lsh_candidates`, identical banding to operators/dedup.py:q_dedup_minhash).

The expressions here are the same shared primitives the batch tier uses
(functions.hashing.minhash_signature, functions.text.shingles), so a
document fingerprinted on the stream is bit-identical to one
fingerprinted in batch — tests/test_streaming_minhash.py pins that parity
end-to-end through a file-replay stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    BAND_SIZE,
    NUM_BANDS,
    md5_long,
    minhash_signature,
)
from ..functions.text import shingles, tokens


def hashed_shingle_set(text_col: str = "text") -> F.Column:
    """Sorted array<long> of distinct 44-bit md5 shingle hashes — the
    per-row core shared by every dedup tier (sorted to match the batch
    cache's canonical form)."""
    return F.array_sort(
        F.array_distinct(
            F.transform(shingles(tokens(F.col(text_col))), md5_long)
        )
    )


def minhash_signatures_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n, sig) minhash fingerprints, computable on a STREAMING or
    batch frame unchanged — stateless per-row, so append mode with no
    watermark. Documents with an empty shingle set (< k words) are
    dropped, mirroring the batch tier (they can join no pair)."""
    return (
        docs.select(id_col, hashed_shingle_set(text_col).alias("hs"))
        .filter(F.size("hs") > 0)
        .select(
            id_col,
            F.size("hs").alias("n"),
            minhash_signature(F.col("hs")).alias("sig"),
        )
    )


def lsh_band_rows(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band, band_key) — one row per LSH band, band_key the
    '_'-joined band slice of the signature. Identical banding to the batch
    q_dedup_minhash plan, so signatures from the streaming stage feed the
    same candidate join."""
    return sig_df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at(
                                    "sig", b * BAND_SIZE + j + 1
                                ).cast("string")
                                for j in range(BAND_SIZE)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_key")


def lsh_candidates_raw(
    sig_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Band-collision pairs WITHOUT the distinct — one row per shared
    band (a pair colliding in k bands appears k times, k ≤ NUM_BANDS).
    ROUND-10 OPTIMIZATION (guide §2.3/§2.4): verifiers whose per-pair
    output is deterministic defer the dedup to the (tiny) survivor
    stream instead of paying a full exchange + two hash aggregates over
    every collision here — measured 1.06 s → 0.49 s for q_dedup_minhash
    at sf0.1 (duplication factor 2.1, candidate count 14.7k; the
    deferred exchange cost more than double-verification).

    Duplication-vs-scale (round-11, the round-10 ADVICE item): the
    factor is 2.12 at sf0.1 (14.7k raw / 6.9k distinct) and 2.20 at the
    10× documents fixture (157k / 71k) — stable, because near-dup pair
    DENSITY is what drives it and the corpus's pair count scales
    linearly. Break-even: the deferred form re-verifies each pair once
    per colliding band, hard-capped at NUM_BANDS (4); even at the cap
    the extra work is ≤ NUM_BANDS× verification of TRUE near-dups only
    (high-k collisions are almost always real matches), while the
    removed exchange was paid over EVERY collision. The raw path loses
    only on corpora where survivors ≈ candidates (dup-heavy, e.g.
    verbatim-clone fixtures: the round-9 synth_scale first cut measured
    exactly that failure — every vector a 10-deep exact-dup clique) AND
    most pairs collide in most bands; there, reinstate
    :func:`lsh_candidates` (distinct-early) for the affected verifier.
    """
    bands = lsh_band_rows(sig_df, id_col)
    # rename-then-join-on-key-list: sidesteps self-join attribute
    # ambiguity (both sides share one lineage); the id_a < id_b filter is
    # pushed into the sort-merge join condition by Catalyst
    x = bands.withColumnRenamed(id_col, "id_a")
    y = bands.withColumnRenamed(id_col, "id_b")
    return (
        x.join(y, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def lsh_candidates(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The periodic batch half: banded equi-join over a signature table →
    distinct candidate pairs (id_a < id_b). Cost is O(docs × bands) keyed
    on (band, band_key) — never an all-pairs join. Verification (exact
    Jaccard over the shingle sets) happens downstream against the corpus,
    exactly as in q_dedup_minhash (which, like the other batch verifiers,
    rides :func:`lsh_candidates_raw` and dedups survivors instead)."""
    return lsh_candidates_raw(sig_df, id_col).distinct()
