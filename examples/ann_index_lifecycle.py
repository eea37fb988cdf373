"""The production ANN index lifecycle, end to end on one fixture.

Walks the full operational loop a 100 TB vector deployment runs —
every step is a registered, DuckDB-oracle-checked query sharing ONE
session-persisted two-level index:

    1. BUILD   the constant-occupancy index (sample-trained, √K-routed)
    2. AUDIT   occupancy/imbalance        (q_ivf_index_stats)
    3. SERVE   single-probe top-k         (q_ann_ivf_scaled)
               nprobe recall dial         (q_ann_ivf_multiprobe_twolevel)
               filtered search            (q_ann_filtered)
               PQ-coded scan              (q_ann_ivf_pq_twolevel)
    4. MEASURE recall@k                   (q_ann_recall_twolevel)
    5. INGEST  delta via the frozen router (q_ivf_index_append)
    6. DECIDE  rebuild or keep            (q_ivf_drift_audit)

Run:  python examples/ann_index_lifecycle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators import (  # noqa: E402
    similarity as S,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="ann_index_lifecycle")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    n_indexed = S._twolevel_assignment(spark, sf_dir).count()
    print(f"[1 build ] {n_indexed} vectors indexed "
          f"in {time.perf_counter() - t0:.1f}s (session-shared)")

    (stats,) = S.q_ivf_index_stats(spark, sf_dir).collect()
    print(f"[2 audit ] {stats['n_clusters']} clusters, occupancy "
          f"{stats['min_occ']}..{stats['max_occ']} "
          f"(avg {stats['avg_occ']}), imbalance {stats['imbalance']}")

    top = S.q_ann_ivf_scaled(spark, sf_dir).collect()
    print(f"[3 serve ] single-probe top-{len(top)}: "
          + ", ".join(f"{r['vec_id']}@{r['sim']}" for r in top[:3]) + " …")
    multi = S.q_ann_ivf_multiprobe_twolevel(spark, sf_dir).collect()
    print(f"[3 serve ] nprobe={S.IVF2_PROBES} best sim "
          f"{multi[0]['sim']} (single-probe best {top[0]['sim']})")
    filt = S.q_ann_filtered(spark, sf_dir).collect()
    print(f"[3 serve ] filtered (label={filt[0]['label'] if filt else '—'}): "
          f"{len(filt)} hits")
    pq = S.q_ann_ivf_pq_twolevel(spark, sf_dir).collect()
    print(f"[3 serve ] PQ-ADC top-{len(pq)}: best adc {pq[0]['adc_dist']} "
          f"(exact {pq[0]['exact_dist']})")

    rec = S.q_ann_recall_twolevel(spark, sf_dir).collect()
    avg_recall = sum(r["recall"] for r in rec) / len(rec)
    print(f"[4 recall] single-probe recall@{rec[0]['k']} over "
          f"{len(rec)} queries: {avg_recall:.3f}")

    appended = S.q_ivf_index_append(spark, sf_dir).count()
    print(f"[5 ingest] {appended} delta vectors routed through the "
          f"frozen base index")

    (drift,) = S.q_ivf_drift_audit(spark, sf_dir).collect()
    print(f"[6 drift ] fit gap {drift['avg_fit_gap']} "
          f"(frozen {drift['avg_sim_frozen']} vs retrain "
          f"{drift['avg_sim_full']}); {drift['n_drifted']}/"
          f"{drift['n_delta']} vectors would re-home > {S.DRIFT_EPS}")
    verdict = (
        "REBUILD" if drift["n_drifted"] > drift["n_delta"] * 0.2 else "KEEP"
    )
    print(f"[6 drift ] decision: {verdict}")

    spark.stop()


if __name__ == "__main__":
    main()
