"""Broadcast dimension tables (FIXTURES.md sections 2-3).

The reference's JSON config surface (file_configs/**/*.json, dict.json,
banks.json) becomes small broadcast DataFrames: the J-row lookups of
SURVEY.md section 2.3 run as broadcast joins against these instead of
in-process dict scans. The kernel keeps its own constants (it must stay
Spark-free); these tables are built FROM those constants so the two
surfaces can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..kernel import (
    ADDRESS_KEYWORDS,
    BANK_DATE_FORMATS,
    BANK_PATTERNS,
    CREDIT_KEYWORDS,
    DEBIT_KEYWORDS,
    PERSON_KEYWORDS,
    PHONE_KEYWORDS,
)

KEYWORDS_SCHEMA = "kind string, pattern string, target_id string, priority int"


def keywords_df(spark: SparkSession) -> DataFrame:
    """FIXTURES section 3: (kind, pattern, target_id, priority).

    priority preserves the reference's first-hit-wins scan order
    (process_fields.py:19-22 iterates banks.json in insertion order)."""
    rows: list[tuple] = []
    for kind, words in (
        ("address", ADDRESS_KEYWORDS),
        ("phone", PHONE_KEYWORDS),
        ("person_id", PERSON_KEYWORDS),
        ("credit", CREDIT_KEYWORDS),
        ("debit", DEBIT_KEYWORDS),
    ):
        rows += [(kind, w, None, i) for i, w in enumerate(words)]
    prio = 0
    for bank_id, patterns in BANK_PATTERNS:
        for pat in patterns:
            rows.append(("bank", pat, bank_id, prio))
            prio += 1
    return spark.createDataFrame(rows, KEYWORDS_SCHEMA)


RULES_SCHEMA = (
    "doc_kind string, zone_name string, x0 double, x1 double, "
    "y0 double, y1 double"
)

# FIXTURES section 2: fractional zone windows per doc kind (the lcl.json
# shape). The web-text kernel selects content by DOM scoring rather than
# pixel windows, so these rows parameterize the *relational* zone form:
# fraction-of-document line windows. Per-bank date formats live in
# bank_rules_df below (the bank_configs/*.json date_format field), which
# the native date extraction actually consumes.
_RULES = [
    ("statement", "client_info", 0.0, 1.0, 0.0, 0.35),
    ("statement", "bank_info", 0.0, 1.0, 0.0, 0.5),
    ("statement", "date_info", 0.0, 1.0, 0.0, 0.6),
    ("statement", "table_info", 0.0, 1.0, 0.3, 1.0),
    ("id_card", "mrz", 0.0, 1.0, 0.6, 1.0),
]


def rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_RULES, RULES_SCHEMA)


BANK_RULES_SCHEMA = "bank_id string, date_format string"


def bank_rules_df(spark: SparkSession) -> DataFrame:
    """Per-bank config rows (the reference's bank_configs/*.json
    date_format field): consumed by the native date extraction so the
    bank's format is tried before the generic order — same precedence as
    the kernel (process_fields.py:110-121)."""
    rows = [
        (bank_id, BANK_DATE_FORMATS.get(bank_id, "fr"))
        for bank_id, _patterns in BANK_PATTERNS
    ]
    return spark.createDataFrame(rows, BANK_RULES_SCHEMA)
