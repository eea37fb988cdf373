"""Corpus-prep demo: run the round-2 flagship pipeline end-to-end and
print the accounting a data-engineering run would publish.

    python examples/corpus_prep_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="corpus_prep_demo")
    specs = all_specs()

    print("== intra-document repetition gate (worst 5)")
    specs["q_text_repetition"].fn(spark, sf_dir).orderBy(
        "repeated_shingle_ratio", ascending=False
    ).show(5, truncate=False)

    print("== near-dup clusters with quality keepers (5 rows)")
    specs["q_dedup_keep_best"].fn(spark, sf_dir).show(5, truncate=False)

    print("== cross-split contamination of a naive hash split")
    specs["q_contamination_check"].fn(spark, sf_dir).show(5, truncate=False)

    print("== final corpus accounting (leakage-free split)")
    specs["q_pipeline_training_corpus"].fn(spark, sf_dir).orderBy(
        "split", "lang"
    ).show(50, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
