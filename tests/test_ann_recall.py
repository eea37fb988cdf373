"""IVF recall curve: multi-probe recall@10 against the exact brute-force
top-10 is monotone in nprobe and reaches 1.0 at nprobe=K (scanning every
bucket IS brute force)."""

from __future__ import annotations

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.similarity import (
    IVF_K,
    ann_ivf_topk,
    q_ann_ivf,
    q_similarity_topk,
)


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    exact = [r["vec_id"] for r in q_similarity_topk(spark, sf_dir).collect()]
    recalls = []
    for nprobe in (1, 3, IVF_K):
        got = {r["vec_id"] for r in ann_ivf_topk(spark, sf_dir, nprobe).collect()}
        recalls.append(len(got & set(exact)) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0, "nprobe=K must equal brute force"
    # nprobe=1 must agree with the registered q_ann_ivf
    reg = [r["vec_id"] for r in q_ann_ivf(spark, sf_dir).collect()]
    one = [r["vec_id"] for r in ann_ivf_topk(spark, sf_dir, 1).collect()]
    assert reg == one
