"""PII scrub: fixture-verified redaction semantics (the corpus has no
real PII, so known strings pin the behavior; the cross-engine oracle
query pii_scrub exercises the same patterns on derived row data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.functions.pii import PII_PATTERNS, pii_counts, pii_redact


def _scrub(spark, text: str):
    df = spark.createDataFrame([(text,)], "t string")
    counts = pii_counts(F.col("t"))
    return df.select(
        pii_redact(F.col("t")).alias("red"),
        *[v.alias(k) for k, v in counts.items()],
    ).collect()[0]


def test_email_redaction(spark):
    row = _scrub(spark, "contact alice.smith+tag@sub.example.co.uk today")
    assert row.red == "contact [EMAIL] today"
    assert row.email == 1 and row.phone == 0 and row.ipv4 == 0


def test_phone_redaction_variants(spark):
    for s in (
        "call +1 (555) 123-4567 now",
        "call 555-123-4567 now",
        "call 5551234567 now",
    ):
        row = _scrub(spark, s)
        assert row.red == "call [PHONE] now", (s, row.red)
        assert row.phone == 1


def test_ipv4_and_id_redaction(spark):
    row = _scrub(spark, "from 192.168.0.1 acct 123456789 ok")
    assert row.red == "from [IPV4] acct [ID_NUMBER] ok"
    assert row.ipv4 == 1 and row.id_number == 1
    # Short digit runs and IP octets are NOT ids.
    row = _scrub(spark, "v2 build 42 at 10.0.0.1")
    assert row.id_number == 0 and row.ipv4 == 1


def test_redaction_order_prevents_double_classification(spark):
    # The email's digit run must become part of [EMAIL], never a
    # second [ID_NUMBER]; counts are on the ORIGINAL text, so the
    # id counter still sees it.
    row = _scrub(spark, "mail 123456789@example.com end")
    assert row.red == "mail [EMAIL] end"
    assert row.email == 1 and row.id_number == 1


def test_clean_text_untouched(spark):
    s = "the quick brown fox 12 34 56"
    row = _scrub(spark, s)
    assert row.red == s
    assert row.email == row.phone == row.ipv4 == row.id_number == 0


def test_patterns_are_re2_safe():
    # No lookaround / backreferences — the syntax subset both Java
    # regex and RE2 implement identically.
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert "\\1" not in pat


def test_scrub_stays_jvm_side(spark):
    df = spark.createDataFrame([("x@y.io",)], "t string")
    plan = (
        df.select(pii_redact(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
