"""Property pins for the round-5 operators: growth-accounting flow
identities, stickiness bounds, OLS-vs-numpy agreement, lag-scan argmax
dominance, and hierarchy-vs-direct rollup equality. (Cross-engine value
parity for each is already covered by test_oracle_parity.py — these pin
the SEMANTICS the oracle comparison alone can't express.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
    table,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.analytics import (
    q_trend_slope,
    q_xcorr_best_lag,
    XCORR_MAX_LAG_HOURS,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.growth import (
    q_growth_accounting,
    q_power_user_curve,
    q_stickiness_dau_wau,
)


def test_growth_flows_decompose_dau_exactly(spark, sf_dir):
    """DAU(d) == new + retained + resurrected, and
    churned(d) == DAU(d-1) - retained(d) — the additive identities that
    make growth accounting an ACCOUNTING, not an estimate."""
    ev = table(spark, sf_dir, "events")
    dau = {
        r.day: r.dau
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("dau"))
        .collect()
    }
    rows = {r.day: r for r in q_growth_accounting(spark, sf_dir).collect()}
    days = sorted(dau)
    for d in days:
        r = rows[d]
        assert r.n_new + r.n_retained + r.n_resurrected == dau[d], d
    for prev, cur in zip(days, days[1:]):
        # every day in [min, max] has a row whenever any flow is nonzero;
        # a fully-quiet day would appear only via churn
        got = rows.get(cur)
        churned = got.n_churned if got else 0
        retained = got.n_retained if got else 0
        assert churned == dau[prev] - retained, cur


def test_stickiness_bounds_and_first_day(spark, sf_dir):
    rows = q_stickiness_dau_wau(spark, sf_dir).collect()
    assert rows
    first_day = min(r.day for r in rows)
    for r in rows:
        assert r.wau >= r.dau
        assert 0 < r.stickiness <= 1.0
        if r.day == first_day:
            # no trailing history on day one: WAU == DAU exactly
            assert r.wau == r.dau and r.stickiness == 1.0


def test_power_user_curve_is_monotone_and_totals(spark, sf_dir):
    rows = sorted(
        q_power_user_curve(spark, sf_dir).collect(),
        key=lambda r: -r.active_days,
    )
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    cum = 0
    for r in rows:
        cum += r.n_users
        assert r.users_at_least == cum  # descending cumulative is exact
    assert cum == n_users
    assert abs(rows[-1].share_at_least - 1.0) < 1e-9


def test_trend_slope_matches_numpy_polyfit(spark, sf_dir):
    np = pytest.importorskip("numpy")
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    d0 = min(r.day for r in daily)
    series: dict[str, list[tuple[int, int]]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(
            ((r.day - d0).days, r.y)
        )
    got = {r.event_type: r for r in q_trend_slope(spark, sf_dir).collect()}
    for t, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[t].slope == pytest.approx(slope, abs=1e-4)
        assert got[t].intercept == pytest.approx(intercept, abs=1e-4)
        assert got[t].n_days == len(pts)


def test_xcorr_best_lag_dominates_all_lags(spark, sf_dir):
    """The reported lag really is the argmax: recompute the full
    (pair, lag) correlation surface independently in Python over dense
    hourly series and compare winner + value."""
    np = pytest.importorskip("numpy")
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("y")).collect()
    import datetime as dt

    lo, hi = min(r.hour for r in counts), max(r.hour for r in counts)
    hours = []
    h = lo
    while h <= hi:
        hours.append(h)
        h = h + dt.timedelta(hours=1)
    idx = {h: i for i, h in enumerate(hours)}
    types = sorted({r.event_type for r in counts})
    dense = {t: np.zeros(len(hours)) for t in types}
    for r in counts:
        dense[r.event_type][idx[r.hour]] = r.y
    got = {
        (r.type_a, r.type_b): (r.best_lag, r.corr)
        for r in q_xcorr_best_lag(spark, sf_dir).collect()
    }
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            cands = {}
            for lag in range(XCORR_MAX_LAG_HOURS + 1):
                x = dense[ta][: len(hours) - lag]
                y = dense[tb][lag:]
                if x.std() == 0 or y.std() == 0:
                    continue
                cands[lag] = round(float(np.corrcoef(x, y)[0, 1]), 6)
            if not cands:
                assert (ta, tb) not in got
                continue
            blag, bcorr = got[(ta, tb)]
            best_c = max(cands.values())
            assert bcorr == pytest.approx(best_c, abs=1e-6)
            # the operator's tie-break is MIN lag among rounded-max
            # correlations (desc corr, asc lag_h) — pin the lag itself
            winners = [lag for lag, c in cands.items() if c == best_c]
            assert blag == min(winners)


def test_rollup_reaggregate_equals_direct(spark, sf_dir):
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.rollups import (
        q_rollup_reaggregate,
    )

    ev = table(spark, sf_dir, "events")
    direct = {
        r.day: (r.n, r.d)
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("d"),
        )
        .collect()
    }
    for r in q_rollup_reaggregate(spark, sf_dir).collect():
        n, d = direct[r.day]
        assert (r.n_events, r.distinct_users) == (n, d)


def test_revenue_pareto_curve_properties(spark, sf_dir):
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.analytics import (
        q_revenue_pareto,
    )

    rows = sorted(
        q_revenue_pareto(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # top-down deciles: revenue share non-increasing, cumulative hits 1
    shares = [r.revenue_share for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(shares, shares[1:]))
    assert rows[-1].cum_share == pytest.approx(1.0, abs=1e-6)
    assert rows[0].revenue_share >= 0.1  # top decile at least its share


def test_matryoshka_full_dim_is_perfect_recall(spark, sf_dir):
    """Sanity anchor: recall of the prefix ranking is in [0,1], and the
    operator's own full-dim ranking is the reference (so if the prefix
    were the whole vector, recall would be 1) — verified by recomputing
    overlap with numpy on the collected embeddings."""
    np = pytest.importorskip("numpy")
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (
        table as _table,
    )
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.similarity import (
        ANN_BATCH_K,
        ANN_BATCH_Q,
        MATRYOSHKA_DIMS,
        q_embedding_matryoshka,
    )

    got = {
        r.q_id: r.n_overlap
        for r in q_embedding_matryoshka(spark, sf_dir).collect()
    }
    assert len(got) == ANN_BATCH_Q
    assert all(0 <= v <= ANN_BATCH_K for v in got.values())

    rows = _table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])

    def topk(mat, qi):
        sims = (mat @ mat[qi]) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[qi])
        )
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-sims[i], ids[i]),
        )
        return {ids[i] for i in order[:ANN_BATCH_K]}

    for qi in range(len(ids)):
        if ids[qi] >= ANN_BATCH_Q:
            continue
        full = topk(m, qi)
        pre = topk(m[:, :MATRYOSHKA_DIMS], qi)
        assert got[ids[qi]] == len(full & pre)


def test_bitmap_word_arithmetic_sign_safe(spark):
    """The pmod + exact-division keying counts NEGATIVE ids correctly
    (a raw % would shift by a negative amount): bitmap distinct equals
    count_distinct for ids straddling zero, including collisions of
    -k and +k into different words."""
    ids = [-127, -126, -64, -63, -62, -1, 0, 1, 62, 63, 64, 126, -127, 0]
    df = spark.createDataFrame(
        [("t", i) for i in ids], "event_type string, user_id long"
    )
    words = (
        df.select(
            "event_type",
            F.expr("(user_id - pmod(user_id, 63)) div 63").alias("word_id"),
            F.expr(
                "shiftleft(1L, CAST(pmod(user_id, 63) AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word_id")
        .agg(F.bit_or("bit").alias("word"))
    )
    got = words.agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("d")
    ).collect()[0].d
    assert got == len(set(ids))
    # every word id must differ between -k and +k (floor semantics)
    wids = {r.word_id for r in words.collect()}
    assert min(wids) < 0 < max(wids)


def test_hierarchy_subtree_is_consistent(spark, sf_dir):
    """Parent invariant: a node's subtree revenue equals its own spend
    plus its children's subtree revenues (spot-checked on the root and
    one internal level)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.graph import (
        HIER_FANOUT,
        q_hierarchy_subtree_revenue,
    )

    rows = {
        r.node: r for r in q_hierarchy_subtree_revenue(spark, sf_dir).collect()
    }
    own = {
        r.node: (float(r.s), r.n)
        for r in table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    for node in [0, 1, 7]:
        if node not in rows:
            continue
        kids = [
            k
            for k in rows
            if k != node and k // HIER_FANOUT == node
        ]
        expect_orders = own.get(node, (0, 0))[1] + sum(
            rows[k].n_orders for k in kids
        )
        assert rows[node].n_orders == expect_orders, node


def test_seasonal_decompose_is_additive(spark, sf_dir):
    """y == trend + seasonal + residual exactly (to the rounding
    grain) on every row, and residuals within one hour-of-day average
    to ~0 (the seasonal term IS the per-hod mean of the detrended
    series, so per-hod residual means vanish by construction)."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.timeseries import (
        q_seasonal_decompose,
    )

    rows = q_seasonal_decompose(spark, sf_dir).collect()
    assert rows
    by_hod: dict[int, list[float]] = {}
    for r in rows:
        assert r.y == pytest.approx(
            r.trend + r.seasonal + r.residual, abs=5e-6
        )
        by_hod.setdefault(r.hour.hour, []).append(r.residual)
    for hod, res in by_hod.items():
        assert abs(sum(res) / len(res)) < 1e-5, hod


def test_snapshot_diff_classes_are_exhaustive(spark, sf_dir):
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.cdc import (
        _DIFF_CUTOFF_B,
        q_snapshot_diff,
    )

    rows = q_snapshot_diff(spark, sf_dir).collect()
    statuses = {r.status for r in rows}
    assert statuses == {"added", "changed", "unchanged"}
    total_keys = sum(r.n_keys for r in rows)
    expected = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit(_DIFF_CUTOFF_B).cast("timestamp_ntz"))
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert total_keys == expected
    # unchanged keys carry zero delta
    for r in rows:
        if r.status == "unchanged":
            assert r.delta_events == 0


def test_linear_attribution_conserves_purchases(spark, sf_dir):
    """Each purchase distributes EXACTLY one unit of credit (the first
    touch absorbs the remainder 1 - (n-1)*round(1/n,10) in exact
    decimal lanes), so the summed attributed_purchases equals the
    purchase count to the 4-dp per-channel display rounding, and
    attributed value sums to total purchase value to the 2-dp grain."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.joins import (
        q_attribution_linear,
    )

    rows = q_attribution_linear(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    n_purch = ev.count()
    total_value = ev.agg(F.sum("value")).collect()[0][0]
    # exact conservation: only the per-channel display rounding
    # (4 dp / 2 dp) separates the sums from the true totals
    assert sum(r.attributed_purchases for r in rows) == pytest.approx(
        n_purch, abs=len(rows) * 5e-5
    )
    assert sum(r.attributed_value for r in rows) == pytest.approx(
        total_value, abs=len(rows) * 5e-3 + 1e-6 * n_purch
    )
    assert {r.channel for r in rows} >= {"direct"}


def test_churn_training_set_has_no_leakage_and_both_labels(spark, sf_dir):
    """Structural leakage check: recomputing every feature from ONLY
    the pre-cutoff slice reproduces the training set exactly, and (at
    the fixture cutoffs) both label classes occur."""
    from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.sampling import (
        _CHURN_FEATURE_CUTOFF,
        q_churn_training_set,
    )

    rows = q_churn_training_set(spark, sf_dir).collect()
    labels = {r.churned for r in rows}
    assert labels == {0, 1}
    pre = table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(_CHURN_FEATURE_CUTOFF).cast("timestamp_ntz")
    )
    manual = {
        r.user_id: (r.n, r.d)
        for r in pre.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(F.to_date("ts")).alias("d"),
        )
        .collect()
    }
    for r in rows:
        n, d = manual[r.user_id]
        assert (r.n_events, r.n_active_days) == (n, d)
    assert len(rows) == len(manual)  # exactly the featurizable users
