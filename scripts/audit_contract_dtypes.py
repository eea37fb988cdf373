"""One-off audit: run every registered query + oracle at sf0.001 and flag
output types the driver's canonicalizer renders differently across engines
(DECIMAL scale, HUGEINT) or cannot hash at all (list/dict cells).

Usage: python scripts/audit_contract_dtypes.py
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.catalog import (  # noqa: E402
    TABLES,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.session import (  # noqa: E402
    build_session,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

BAD_SPARK_TYPES = ("decimal", "array", "map", "struct")


def main() -> int:
    spark = build_session(app_name="dtype_audit", shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    problems = []
    for name, spec in sorted(all_specs().items()):
        try:
            df = spec.fn(spark, SF_DIR)
            for f in df.schema.fields:
                tn = f.dataType.simpleString()
                if any(tn.startswith(b) for b in BAD_SPARK_TYPES):
                    problems.append(f"{name}: SPARK col {f.name} is {tn}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: SPARK ERROR {e}")
        if spec.oracle is None:
            continue
        try:
            # native DuckDB types — HUGEINT/DECIMAL render differently from
            # Spark's BIGINT/DOUBLE in the driver's canonicalizer even when
            # values are numerically equal
            desc = duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
            for col, typ, *_ in desc:
                u = typ.upper()
                if "HUGEINT" in u or "DECIMAL" in u or u.endswith("[]"):
                    problems.append(f"{name}: ORACLE col {col} is {typ}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: ORACLE ERROR {e}")
    for p in problems:
        print(p)
    print(f"-- {len(problems)} problems across {len(all_specs())} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
