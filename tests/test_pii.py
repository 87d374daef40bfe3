"""PII redaction operator: masking, counting, category ordering."""

import pytest
from pyspark.sql import Row

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.pii import (
    PII_PATTERNS,
    redact_pii,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        Row(doc_id=1, text="mail me at jane.doe+x@sub.example.org today"),
        Row(doc_id=2, text="ssn 123-45-6789 phone 555-123-4567"),
        Row(doc_id=3, text="server 192.168.0.1 card 4111-1111-1111-1234"),
        Row(doc_id=4, text="nothing sensitive here 12345"),
        Row(doc_id=5, text="two mails a@b.co c@d.io and ip 10.0.0.7"),
    ]
    return spark.createDataFrame(rows)


def test_masks_and_counts(pii_df):
    out = {r["doc_id"]: r for r in redact_pii(pii_df).collect()}

    assert out[1]["redacted"] == "mail me at [EMAIL] today"
    assert out[1]["n_email"] == 1 and out[1]["n_pii"] == 1

    assert out[2]["redacted"] == "ssn [SSN] phone [PHONE]"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1

    assert out[3]["redacted"] == "server [IP] card [CARD]"
    assert out[3]["n_ipv4"] == 1 and out[3]["n_credit_card"] == 1

    assert out[4]["redacted"] == "nothing sensitive here 12345"
    assert out[4]["n_pii"] == 0

    assert out[5]["redacted"] == "two mails [EMAIL] [EMAIL] and ip [IP]"
    assert out[5]["n_email"] == 2 and out[5]["n_pii"] == 3


def test_no_cross_category_bleed(pii_df):
    """An SSN is not also counted as a phone number and vice versa."""
    out = {r["doc_id"]: r for r in redact_pii(pii_df).collect()}
    assert out[2]["n_phone"] == 1 and out[2]["n_ssn"] == 1
    # credit card digits must not register as ssn/phone/ip
    assert out[3]["n_ssn"] == 0 and out[3]["n_phone"] == 0


def test_plan_is_scan_side(pii_df):
    """Redaction is a single projection: no exchange, no python worker."""
    plan = redact_pii(pii_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_patterns_are_ordered_email_first():
    assert PII_PATTERNS[0][0] == "email"


# ---------------------------------------------------------------------------
# repetition_stats (same curation-filter family)
# ---------------------------------------------------------------------------
def test_repetition_stats_flags_boilerplate(spark):
    from pyspark.sql import Row

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam spam spam"),
            Row(doc_id=2, text="all words here are fully distinct tokens friend"),
            Row(doc_id=3, text="one"),  # single token: no 2-grams
        ]
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].top_word_frac == 1.0 and out[1].top_2gram_frac == 1.0
    assert out[2].dup_word_frac == 0.0 and out[2].top_word_frac == 0.125
    assert out[3].n_tok == 1 and out[3].top_2gram_frac == 0.0
