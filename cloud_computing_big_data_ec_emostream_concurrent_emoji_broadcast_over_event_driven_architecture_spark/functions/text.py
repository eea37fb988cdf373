"""Text-analysis column expressions (SURVEY.md §2.8 extensions) — all
built-in ``pyspark.sql.functions`` (JVM-side, codegen'd); no UDFs.

Tokenization is whitespace-based because the synthetic ``documents.text``
is space-separated words (FIXTURES.md §3); the BPE-ish path is a regex
token count. Every helper has an exact DuckDB twin used by the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared constants — templated into both engines' expressions
EN_STOPWORDS = ("the", "of", "and", "a", "in", "to", "is", "on", "for", "with")
SHINGLE_K = 3
# BPE-ish lexer: letter runs | digit runs | any single non-space symbol
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, " ")


def shingles(words: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles of an array<string> of words.

    Built as zip_with over shifted slices — O(n) in doc length. The naive
    ``transform(sequence(...), i -> element_at(words, i) || ...)`` form is
    O(n²): Catalyst inlines the ``words`` expression (usually a split())
    into every element_at call, re-evaluating it per index (measured ~16×
    slower end-to-end on the dedup pipeline).

    zip_with pads the shorter side with nulls and concat() propagates
    them, so the k-1 tail entries come out null and are filtered — which
    also makes docs with fewer than k words yield an empty array."""
    acc = words
    for j in range(1, k):
        shifted = F.slice(words, j + 1, F.size(words))
        acc = F.zip_with(
            acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.array_distinct(F.filter(acc, lambda s: s.isNotNull()))


def shingles_sql(words_expr: str, k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`shingles` (1-indexed lists, range upper bound
    exclusive)."""
    joined = " || ' ' || ".join(f"{words_expr}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len({words_expr}) >= {k} THEN "
        f"list_transform(range(1, len({words_expr}) - {k - 2}), i -> {joined}) "
        f"ELSE [] END)"
    )


def stopword_ratio(words: Column) -> Column:
    """Fraction of tokens that are English stopwords."""
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    return hits / F.size(words)


def stopword_ratio_sql(words_expr: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        f"len(list_filter({words_expr}, w -> w IN ({inlist}))) * 1.0 "
        f"/ len({words_expr})"
    )


def bpe_token_count(text: Column) -> Column:
    """Regex token count (BPE-ish lexer)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def shingles_ordered(words: Column, k: int = SHINGLE_K) -> Column:
    """POSITIONAL k-word shingles — same zip_with construction as
    :func:`shingles` but keeping order and duplicates (winnowing needs
    the shingle *sequence*, not the set)."""
    acc = words
    for j in range(1, k):
        shifted = F.slice(words, j + 1, F.size(words))
        acc = F.zip_with(
            acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return F.filter(acc, lambda s: s.isNotNull())


def shingles_ordered_sql(words_expr: str, k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`shingles_ordered`."""
    joined = " || ' ' || ".join(f"{words_expr}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({words_expr}) >= {k} THEN "
        f"list_transform(range(1, len({words_expr}) - {k - 2}), i -> {joined}) "
        f"ELSE [] END"
    )
