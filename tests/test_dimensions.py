"""Broadcast dimension tables must stay in lockstep with kernel constants."""

from __future__ import annotations

from ocr_cezam_spark import kernel
from ocr_cezam_spark.sources.dimensions import keywords_df, rules_df


def test_keywords_cover_kernel_constants(spark):
    rows = keywords_df(spark).collect()
    by_kind: dict[str, list] = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)

    assert {r["pattern"] for r in by_kind["address"]} == set(kernel.ADDRESS_KEYWORDS)
    assert {r["pattern"] for r in by_kind["phone"]} == set(kernel.PHONE_KEYWORDS)
    assert {r["pattern"] for r in by_kind["person_id"]} == set(kernel.PERSON_KEYWORDS)

    banks = sorted(by_kind["bank"], key=lambda r: r["priority"])
    # priority must reproduce the kernel's bank-major first-hit scan order
    flat = [
        (bank_id, pat)
        for bank_id, patterns in kernel.BANK_PATTERNS
        for pat in patterns
    ]
    assert [(r["target_id"], r["pattern"]) for r in banks] == flat


def test_rules_schema(spark):
    rows = rules_df(spark).collect()
    assert {r["zone_name"] for r in rows} >= {
        "client_info", "bank_info", "date_info", "table_info"
    }
    for r in rows:
        assert 0.0 <= r["x0"] <= r["x1"] <= 1.0
        assert 0.0 <= r["y0"] <= r["y1"] <= 1.0
