"""Contract-surface type audit (VERDICT r1 item 5): the driver's
correctness harness canonicalizes results through pandas and hashes their
rendered values, so cross-engine type drift — Spark DECIMAL(31,2) vs DuckDB
DECIMAL(38,2) scale rendering, DuckDB HUGEINT vs Spark BIGINT — flips the
hash even when every value is numerically equal, and unhashable cells
(array/map columns) crash the canonicalizer outright.

These tests pin the convention: every registered query's OUTPUT schema uses
only double/bigint/int/bool/string/timestamp on both engines. (Inputs and
intermediates may use decimal freely — exact decimal sums stay the
float-determinism hardening — only the final projection must normalize.)
Both checks are plan/DESCRIBE-level: nothing executes, so the sweep covers
all ~108 queries in seconds.
"""

from __future__ import annotations

import pytest

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.plans.registry import (
    all_specs,
)

SPECS = all_specs()

# types pandas can sort/hash and both engines render identically
_BAD_SPARK_PREFIXES = ("decimal", "array", "map", "struct")


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spark_output_schema_is_canonical(name, spark, sf_dir):
    df = SPECS[name].fn(spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(_BAD_SPARK_PREFIXES)
    ]
    assert not bad, (
        f"{name} emits non-canonical contract column(s) {bad} — cast the "
        "final projection to double/bigint/string (see module docstring)"
    )


@pytest.mark.parametrize("name", sorted(n for n in SPECS if SPECS[n].oracle))
def test_oracle_output_types_are_canonical(name, duck):
    desc = duck.execute(f"DESCRIBE {SPECS[name].oracle}").fetchall()
    bad = [
        f"{col}: {typ}"
        for col, typ, *_ in desc
        if "HUGEINT" in typ.upper()
        or "DECIMAL" in typ.upper()
        or typ.upper().endswith("[]")
    ]
    assert not bad, (
        f"{name} oracle emits non-canonical column(s) {bad} — add "
        "CAST(... AS DOUBLE/BIGINT) in the oracle SQL"
    )
