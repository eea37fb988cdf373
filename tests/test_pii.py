"""PII redaction behavior on planted fixtures (the registry entry proves
cross-engine parity on the corpus; this proves the regexes actually
catch and replace PII spans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_computing_big_data_ec_emostream_concurrent_emoji_broadcast_over_event_driven_architecture_spark.operators.text import (
    PII_EMAIL,
    PII_PHONE,
)


def _redact(col):
    return F.regexp_replace(
        F.regexp_replace(col, F.lit(PII_EMAIL), F.lit("[EMAIL]")),
        F.lit(PII_PHONE),
        F.lit("[PHONE]"),
    )


def test_planted_pii_is_redacted(spark):
    rows = [
        (1, "contact jane.doe+spam@example.co.uk for details"),
        (2, "call +1 (555) 867-5309 or 020 7946 0958 today"),
        (3, "no pii here at all"),
        (4, "mail a@b.io and dial 5558675309 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["red"], r["n_emails"], r["n_phones"])
        for r in df.select(
            "doc_id",
            _redact(F.col("text")).alias("red"),
            F.size(
                F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))
            ).alias("n_emails"),
            F.size(
                F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0))
            ).alias("n_phones"),
        ).collect()
    }
    assert out[1] == ("contact [EMAIL] for details", 1, 0)
    assert out[2] == ("call [PHONE] or [PHONE] today", 0, 2)
    assert out[3] == ("no pii here at all", 0, 0)
    assert out[4] == ("mail [EMAIL] and dial [PHONE] now", 1, 1)


def test_redaction_matches_duckdb_on_planted_rows(duck, spark):
    texts = [
        "reach me at foo.bar@baz.org or +44 7700 900123",
        "twice: a@b.cc then c@d.ee",
        "edge 123-4567-890 number",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    spark_red = [
        r["red"]
        for r in df.orderBy("i").select(_redact(F.col("text")).alias("red")).collect()
    ]
    duck_red = [
        duck.execute(
            "SELECT regexp_replace(regexp_replace(?, ?, '[EMAIL]', 'g'),"
            " ?, '[PHONE]', 'g')",
            [t, PII_EMAIL, PII_PHONE],
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_red == duck_red
