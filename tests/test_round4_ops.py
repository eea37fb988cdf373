"""Semantic property tests for the round-4 widening-pass operators —
invariants the oracle hash match alone doesn't state explicitly
(SURVEY.md §5 model: differential + property pairs per operator).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.joins import (
    ATTR_TOUCHES,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.layout import (
    COMPACT_TARGET_BYTES,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    all_specs,
)

SPECS = all_specs()


def test_compaction_bins_respect_target_plus_one_file(spark, sf_dir):
    """First-fit-in-order invariant: a bin exceeds the target only by
    its LAST file (the file that crossed the boundary) — i.e. every
    bin's bytes minus any one of its files is under target + max-file
    slack; equivalently bins (except possibly a source's last) reach
    at least the target when they close."""
    rows = SPECS["q_layout_compaction_bins"].fn(spark, sf_dir).collect()
    # file_ids are doc_id ranges, so a source's file ids are SPARSE
    # (docs interleave across sources) — contiguity means bins
    # partition the source's ORDERED file sequence without overlap:
    # consecutive bins' [first_file, last_file] ranges never interleave
    by_source = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["bin_id"])):
        assert r["first_file"] <= r["last_file"]
        assert r["total_bytes"] > 0 and r["n_files"] > 0
        prev = by_source.get(r["source"])
        if prev is not None:
            prev_bin, prev_last = prev
            assert r["bin_id"] > prev_bin
            assert r["first_file"] > prev_last, (
                "in-order packing: bins must not interleave file ranges"
            )
        by_source[r["source"]] = (r["bin_id"], r["last_file"])
    # the prefix-sum bound: bytes before a bin's last file stayed under
    # the boundary, so every bin is < target + its last file; with the
    # fixture's <= 5-doc files (< ~2.8k chars) that caps bins hard
    for r in rows:
        assert r["total_bytes"] < COMPACT_TARGET_BYTES + 2800


def test_hist_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """The histogram estimate's absolute error is bounded by one bin
    width (linear interpolation inside the covering bin)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.corpus import (
        HQ_BINS,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )

    stats = (
        table(spark, sf_dir, "events")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()[0]
    )
    width = (stats["mx"] - stats["mn"]) / HQ_BINS
    for r in SPECS["q_sketch_hist_quantile"].fn(spark, sf_dir).collect():
        assert r["abs_err"] <= width + 1e-9, (
            f"q={r['q']}: err {r['abs_err']} > bin width {width}"
        )


def test_temperature_rates_monotone_and_rarest_full(spark, sf_dir):
    """share^(α-1) with α<1 is decreasing in share: the rarest source
    keeps 100% and keep-rates never increase with source size."""
    rows = SPECS["q_sample_temperature"].fn(spark, sf_dir).collect()
    by_size = sorted(rows, key=lambda r: (r["n_docs"], r["source"]))
    assert abs(by_size[0]["rate"] - 1.0) < 1e-9 or any(
        abs(r["rate"] - 1.0) < 1e-9 for r in rows if r["n_docs"] == by_size[0]["n_docs"]
    )
    prev_size, prev_rate = None, None
    for r in by_size:
        if prev_size is not None and r["n_docs"] > prev_size:
            assert r["rate"] <= prev_rate + 1e-9
        prev_size, prev_rate = r["n_docs"], r["rate"]
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]


def test_resample_grid_complete_and_filled_consistent(spark, sf_dir):
    """The resampled grid has exactly types × hours rows, every
    v_interp is non-null, and `filled` marks exactly the hours with no
    events for that type."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )

    out = SPECS["q_resample_interpolate"].fn(spark, sf_dir)
    rows = out.collect()
    ev = table(spark, sf_dir, "events")
    observed = {
        (r["event_type"], r["hour"])
        for r in ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
        )
        .distinct()
        .collect()
    }
    n_types = ev.select("event_type").distinct().count()
    hours = {r["hour"] for r in rows}
    assert len(rows) == n_types * len(hours)
    for r in rows:
        assert r["v_interp"] is not None
        assert r["filled"] == ((r["event_type"], r["hour"]) not in observed)


def test_semdedup_keeps_smaller_ids(spark, sf_dir):
    """Removal-list convention: the keeper id is always smaller than
    the dropped id, and never itself in the dropped set (so the list
    composes with the anti-join cleanly)."""
    for name in ("q_dedup_semdedup", "q_dedup_semdedup_scaled"):
        rows = SPECS[name].fn(spark, sf_dir).collect()
        dropped = {r["doc_id"] for r in rows}
        for r in rows:
            assert r["kept_doc_id"] < r["doc_id"]
        # min-id keepers can themselves be dropped only via an even
        # smaller keeper; the TRANSITIVE keeper set is disjoint by
        # construction of MIN — assert no self-loop at least
        assert all(r["kept_doc_id"] != r["doc_id"] for r in rows)
        assert dropped  # non-degenerate at the fixtures


def test_phash_detects_suffix_edits_rejects_random(spark, sf_dir):
    """pHash invariants on the fixture: every reported pair's payloads
    share a long common prefix (the fixture's near-dups are suffix
    edits), and no pair of completely unrelated docs (different prefix)
    appears."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.multimodal import (
        PH_BAND_BYTES,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    # WIDE form: strictly no random pairs — 16-bit block digests make
    # every differing block cost ~8 Hamming bits
    for r in SPECS["q_multimodal_phash_wide"].fn(spark, sf_dir).collect():
        ta, tb = docs[r["doc_a"]], docs[r["doc_b"]]
        assert ta[:32] == tb[:32], (
            f"wide: pair ({r['doc_a']},{r['doc_b']}) shares no "
            "32-byte prefix — random collision passed the verify"
        )
    # BASE form: 4-bit block digests are low-precision for SHORT
    # payloads (shared empty tail blocks + ~2 noise bits per differing
    # block) — assert the false-positive regime is confined to pairs
    # where both docs are short, i.e. any pair with a long doc is real
    for r in SPECS["q_multimodal_phash"].fn(spark, sf_dir).collect():
        ta, tb = docs[r["doc_a"]], docs[r["doc_b"]]
        if ta[:32] != tb[:32]:
            assert (
                len(ta) < 2 * PH_BAND_BYTES and len(tb) < 2 * PH_BAND_BYTES
            ), (
                f"base: non-near-dup pair ({r['doc_a']},{r['doc_b']}) "
                "with a long doc — outside the documented short-doc "
                "imprecision regime"
            )


def test_attribution_channels_and_totals(spark, sf_dir):
    """Attribution output: channels come only from the touch set plus
    'direct', and attributed purchase counts sum to the total purchase
    count (every purchase is attributed exactly once)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )

    rows = SPECS["q_attribution_last_touch"].fn(spark, sf_dir).collect()
    allowed = set(ATTR_TOUCHES) | {"direct"}
    assert {r["channel"] for r in rows} <= allowed
    n_purchases = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purchases


def test_bloom_pruned_join_no_false_negatives(spark, sf_dir):
    """The audit row's joined count equals the plain join's count —
    bloom pruning loses nothing (no-false-negatives end-to-end)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.joins import (
        BJ_PRIORITY,
    )

    row = SPECS["q_join_bloom_pruned"].fn(spark, sf_dir).collect()[0]
    li = table(spark, sf_dir, "lineitem")
    sel = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == BJ_PRIORITY)
        .select("o_orderkey")
    )
    plain = li.join(
        sel, li["l_orderkey"] == sel["o_orderkey"], "inner"
    ).count()
    assert row["n_joined"] == plain
    assert row["n_pass"] == row["n_joined"] + row["n_false_pos"]


def test_dq_audit_clean_fixture_passes(spark, sf_dir):
    """The synthetic fixtures are clean: every check passes with zero
    violations (the operator's gate semantics are the point — a dirty
    batch flips `passed`)."""
    rows = SPECS["q_dq_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["passed"] and r["violations"] == 0, r


def test_sequence_pattern_matches_are_real(spark, sf_dir):
    """Every reported user's event sequence really contains the
    pattern (re-checked in Python against the raw events)."""
    import re

    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.timeseries import (
        SEQ_LETTER,
        SEQ_PATTERN,
    )

    rows = SPECS["q_event_sequence_pattern"].fn(spark, sf_dir).collect()
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(
            SEQ_LETTER.get(r["event_type"], "x")
        )
    for r in rows:
        seq = "".join(seqs[r["user_id"]])
        assert len(re.findall(SEQ_PATTERN, seq)) == r["n_matches"]
        assert r["n_matches"] > 0
