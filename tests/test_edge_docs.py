"""Edge-case corpus regressions: empty / whitespace-only / very-short
documents must not crash or emit phantom rows (Spark's ``sequence(a, b)``
DESCENDS when b < a, unlike DuckDB's ``range`` which yields empty — the
winnowing and passage-dedup operators guard this explicitly)."""

from __future__ import annotations

import pytest

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.corpus import (
    q_corpus_passage_dedup,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
    q_dedup_winnowing,
)


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    """A documents table holding only degenerate docs: empty text,
    whitespace-only, and token counts straddling every guard boundary
    (1..6 tokens vs WINNOW_W=4-over-3-shingles and 10-token passages)."""
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [
        (0, "", "en", "web", 0),
        (1, "   ", "en", "web", 3),
        (2, "one", "en", "web", 3),
        (3, "one two", "en", "web", 7),
        (4, "one two three", "en", "web", 13),
        (5, "one two three four five", "en", "web", 23),
        (6, "one two three four five six", "en", "web", 27),
        (7, "a b c d e f g h i j k l m n o p", "en", "wiki", 31),
        (8, "a b c d e f g h i j k l m n o p", "en", "wiki", 31),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_winnowing_short_docs_no_crash_no_phantoms(spark, edge_sf_dir):
    # Docs with < WINNOW_W shingles produce no fingerprints; the only
    # surviving pair is the identical 16-token twins (docs 7/8).
    out = q_dedup_winnowing(spark, edge_sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert pairs == {(7, 8)}


def test_passage_dedup_empty_docs_emit_no_passages(spark, edge_sf_dir):
    out = {r.doc_id: r for r in q_corpus_passage_dedup(spark, edge_sf_dir).collect()}
    # empty / whitespace-only docs are absent (no passages at all),
    # not present with phantom md5('') passages
    assert 0 not in out and 1 not in out
    # one-token doc yields exactly one passage
    assert out[2].n_passages == 1
    # the identical twins' passages count each other as duplicates
    assert out[7].n_dup_passages == out[7].n_passages
    assert out[8].n_dup_passages == out[8].n_passages
