"""Semantic property tests for the round-4 second widening block
(analytics / cdc-tolerance / graph-degree / rle-layout operators) —
invariants beyond the oracle hash match (SURVEY.md §5 model).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    all_specs,
)

SPECS = all_specs()


def test_rfm_quartiles_valid_and_segments_consistent(spark, sf_dir):
    rows = SPECS["q_customer_rfm"].fn(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for r in rows:
        assert 1 <= r.r_quartile <= 4
        assert 1 <= r.f_quartile <= 4
        assert 1 <= r.m_quartile <= 4
        if r.segment == "champion":
            assert (r.r_quartile, r.f_quartile, r.m_quartile) == (1, 1, 1)
        assert r.recency_days >= 0
        assert r.frequency >= 1
    # NTILE balance: each quartile holds floor/ceil(n/4) customers
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        counts = sorted(
            sum(1 for r in rows if getattr(r, col) == q) for q in (1, 2, 3, 4)
        )
        assert counts[-1] - counts[0] <= 1, (col, counts)
        assert sum(counts) == n


def test_welch_arms_partition_events(spark, sf_dir):
    rows = SPECS["q_ab_test_welch"].fn(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    totals = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    for r in rows:
        assert r.n_control + r.n_treat == totals[r.event_type]
        assert abs(r.lift - round(r.mean_treat - r.mean_control, 6)) < 2e-6


def test_bitmap_distinct_equals_exact_count_distinct(spark, sf_dir):
    rows = SPECS["q_bitmap_distinct"].fn(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert {r.event_type: r.distinct_users for r in rows} == exact
    for r in rows:
        # words can't outnumber the distinct users they index
        assert r.bitmap_words <= r.distinct_users


def test_dedup_tolerance_counts_partition_and_floor(spark, sf_dir):
    rows = SPECS["q_event_dedup_tolerance"].fn(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    keys = {
        r.event_type: r.k
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("k"))
        .collect()
    }
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_total
        # the first event of every (user, type) chain is always kept
        assert r.n_kept >= keys[r.event_type]


def test_degree_histogram_mass_is_twice_pair_count(spark, sf_dir):
    hist = SPECS["q_graph_degree_stats"].fn(spark, sf_dir).collect()
    n_pairs = SPECS["q_dedup_minhash"].fn(spark, sf_dir).count()
    assert sum(r.degree * r.n_docs for r in hist) == 2 * n_pairs


def test_rle_estimator_monotone_and_flag_first_wins(spark, sf_dir):
    rows = SPECS["q_layout_rle_estimate"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    n_rows = table(spark, sf_dir, "lineitem").count()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r)
        assert 1 <= r.est_runs <= n_rows
        assert r.avg_run_len >= 1.0
    for layout, rs in by_layout.items():
        rs.sort(key=lambda r: r.position)
        # prefix NDV can only grow as columns are appended
        assert rs[0].est_runs <= rs[1].est_runs <= rs[2].est_runs, layout
    # sorting the low-cardinality flags first strictly beats date-first
    # on total estimated RLE bytes for this schema
    tot = {
        layout: sum(r.est_rle_bytes for r in rs)
        for layout, rs in by_layout.items()
    }
    assert tot["flag_first"] < tot["shipdate_first"], tot


def _reference_bpe(word_freqs, iters):
    """Classic Sennrich-style BPE on a word-frequency dict: count every
    adjacent pair occurrence (overlaps included), merge the
    (count DESC, pair ASC) argmax greedily left-to-right."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(iters):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        (pa, pb), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((pa, pb, pa + pb, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_independent_reference(spark, sf_dir):
    rows = sorted(
        SPECS["q_bpe_train_merges"].fn(spark, sf_dir).collect(),
        key=lambda r: r.iteration,
    )
    docs = table(spark, sf_dir, "documents")
    freqs = {}
    for r in (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .collect()
    ):
        freqs[r.w] = r.f
    expected = _reference_bpe(freqs, len(rows))
    got = [(r.pair_a, r.pair_b, r.merged, r.cnt) for r in rows]
    assert got == expected
    # BPE invariant: best-pair counts are non-increasing across merges
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_bpe_tokenize_cost_bounds(spark, sf_dir):
    rows = SPECS["q_bpe_tokenize_cost"].fn(spark, sf_dir).collect()
    assert rows
    docs = table(spark, sf_dir, "documents")
    bounds = (
        docs.select(
            "source",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
        )
        .collect()
    )
    by_src = {r.source: r for r in bounds}
    for r in rows:
        b = by_src[r.source]
        # each word is >=1 token and merges can only shrink char count
        assert b.n_words <= r.total_tokens <= b.n_chars
        assert abs(
            r.avg_tokens_per_doc - round(r.total_tokens / r.n_docs, 4)
        ) < 1e-9


def test_scd2_pit_join_versions_monotone_per_user(spark, sf_dir):
    rows = SPECS["q_scd2_pit_join"].fn(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        versions = [r.dim_version for r in rs]
        # versions never decrease along a user's click timeline
        assert versions == sorted(versions), user
        for r in rs:
            # pre-dimension facts carry the null-free sentinel pair
            assert (r.dim_version == 0) == (r.dim_value == -1.0)


def test_share_of_total_sums_to_one(spark, sf_dir):
    rows = SPECS["q_share_of_total"].fn(spark, sf_dir).collect()
    assert rows
    by_month = {}
    total = 0.0
    for r in rows:
        by_month.setdefault(r.month, 0.0)
        by_month[r.month] += r.month_share
        total += r.total_share
        assert 0.0 < r.month_share <= 1.0
    for month, s in by_month.items():
        assert abs(s - 1.0) < 1e-4, (month, s)
    assert abs(total - 1.0) < 1e-3


def test_ann_recall_audit_bounds_and_batch_consistency(spark, sf_dir):
    rows = SPECS["q_ann_recall_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0 <= r.n_hit <= r.k
        assert abs(r.recall - r.n_hit / r.k) < 1e-9
    # the single-probe answer set is what q_ann_batch_queries serves;
    # every served neighbor that is also in the exact top-k is a hit,
    # so total hits can never exceed the batch op's result size
    served = SPECS["q_ann_batch_queries"].fn(spark, sf_dir).count()
    assert sum(r.n_hit for r in rows) <= served


def test_embedding_dq_fixture_is_clean(spark, sf_dir):
    r = SPECS["q_embedding_dq"].fn(spark, sf_dir).collect()[0]
    n = table(spark, sf_dir, "embeddings").count()
    assert r.n_vecs == n
    assert r.dims_min == r.dims_max == 64
    assert r.n_zero_norm == 0
    assert r.n_with_nan == 0
    assert 0 < r.n_distinct <= n
    assert r.n_null_label == 0


def test_ts_similarity_corr_bounds_and_self_exclusion(spark, sf_dir):
    rows = SPECS["q_ts_similarity_search"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.user_id != 0 for r in rows)
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
    # returned in descending-corr order with user tiebreak
    corrs = [r.corr for r in rows]
    assert corrs == sorted(corrs, reverse=True)


def test_dataset_card_totals_reconcile(spark, sf_dir):
    rows = SPECS["q_dataset_card"].fn(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert 0 <= r.dup_rate <= 1
        assert 0 <= r.quality_pass_rate <= 1
        assert r.n_exact_dups < r.n_docs
        assert r.top_lang in langs


def test_period_over_period_lag_identity(spark, sf_dir):
    rows = SPECS["q_period_over_period"].fn(spark, sf_dir).collect()
    assert rows
    by_pri = {}
    for r in rows:
        by_pri.setdefault(r.priority, []).append(r)
    firsts = 0
    for pri, rs in by_pri.items():
        rs.sort(key=lambda r: r.month)
        assert rs[0].rev_mom_pct is None  # no prior period
        assert rs[0].orders_mom_delta is None
        firsts += 1
        for prev, cur in zip(rs, rs[1:]):
            assert cur.orders_mom_delta == cur.n_orders - prev.n_orders
            if cur.rev_mom_pct is not None and prev.revenue:
                approx = (cur.revenue - prev.revenue) / prev.revenue
                assert abs(cur.rev_mom_pct - approx) < 1e-3
    assert firsts == len(by_pri)


def test_silhouette_bounds_and_coverage(spark, sf_dir):
    rows = SPECS["q_kmeans_silhouette"].fn(spark, sf_dir).collect()
    assert rows
    n = table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        # simplified silhouette under b>=a is within [0, 1]
        assert -1e-9 <= r.avg_silhouette <= 1.0 + 1e-9


def test_asof_forward_latency_positive(spark, sf_dir):
    rows = SPECS["q_join_asof_forward"].fn(spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r.next_purchase_ts is not None]
    assert matched  # non-degenerate
    for r in matched:
        assert r.latency_sec >= 0


def test_chi_square_nonneg_and_dims(spark, sf_dir):
    r = SPECS["q_chi_square_independence"].fn(spark, sf_dir).collect()[0]
    assert r.chi2 >= 0
    assert r.dof == (5 - 1) * (7 - 1)
    assert 0 <= r.cramers_v <= 1 + 1e-9
    assert r.n == table(spark, sf_dir, "events").count()


def test_gini_bounds_and_uniform_floor(spark, sf_dir):
    r = SPECS["q_key_skew_gini"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.gini < 1
    assert r.max_cnt * r.n_keys >= r.total  # max >= mean
    assert abs(r.top_share - r.max_cnt / r.total) < 1e-9


def test_bloom_planner_textbook_identities(spark, sf_dir):
    import math

    rows = SPECS["q_bloom_size_planner"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        m_expected = math.ceil(
            -r.ndv * math.log(0.01) / (math.log(2) ** 2)
        )
        assert r.m_bits == m_expected
        # ~9.59 bits/key at 1% FPP -> k rounds to 7
        assert r.k_hashes == max(1, round(r.m_bits * math.log(2) / r.ndv))
        assert r.bytes == math.ceil(r.m_bits / 8)
        assert r.broadcastable == (r.m_bits / 8 < 4 * 1024 * 1024)


def test_sliding_distinct_bounds_vs_hourly_and_total(spark, sf_dir):
    rows = {
        r.hour: r.dau_24h
        for r in SPECS["q_sliding_distinct_24h"].fn(spark, sf_dir).collect()
    }
    assert rows
    ev = table(spark, sf_dir, "events")
    hourly = {
        r.hour: r.d
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    total = ev.select("user_id").distinct().count()
    for hour, dau in rows.items():
        # trailing-24h distinct >= the hour's own distinct, <= corpus total
        assert hourly.get(hour, 0) <= dau <= total
