"""Streaming MinHash tier: fingerprints computed on a stream must be
bit-identical to the batch tier's, and the banded batch join over the
streamed signature table must cover every verified batch near-dup pair
(VERDICT r1 item 7 — the batch/stream split of a production dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.dedup import (
    _hashed_shingle_sets,
    q_dedup_minhash,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.sources.streams import (
    file_replay_stream,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.streaming.minhash import (
    lsh_candidates,
    minhash_signatures_stream,
)


@pytest.fixture(scope="module")
def streamed_sigs(spark, sf_dir, tmp_path_factory):
    """Replay the documents table as a 3-micro-batch stream through the
    stateless signature stage into a memory sink; return the sink table."""
    src_dir = tmp_path_factory.mktemp("docs_stream")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(3).write.mode("overwrite").parquet(str(src_dir))
    stream = file_replay_stream(
        spark, str(src_dir), docs.schema, max_files_per_trigger=1
    )
    q = (
        minhash_signatures_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("streamed_sigs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("streamed_sigs")


def test_stream_signatures_match_batch(spark, sf_dir, streamed_sigs):
    batch = _hashed_shingle_sets(spark, sf_dir).select("doc_id", "n", "sig")
    streamed = {
        (r["doc_id"], r["n"], tuple(r["sig"]))
        for r in streamed_sigs.collect()
    }
    expected = {
        (r["doc_id"], r["n"], tuple(r["sig"])) for r in batch.collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_streamed_candidates_cover_batch_pairs(spark, sf_dir, streamed_sigs):
    # The batch LSH half run over the STREAMED signature table must
    # generate every candidate that the end-to-end batch tier verifies
    # into a near-dup pair (candidates ⊇ verified pairs by construction).
    cands = {
        (r["id_a"], r["id_b"]) for r in lsh_candidates(streamed_sigs).collect()
    }
    verified = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in q_dedup_minhash(spark, sf_dir).collect()
    }
    assert len(verified) > 0
    assert verified <= cands
