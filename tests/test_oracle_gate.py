"""Enforced oracle gate for the rotated-out registry tail.

The driver's CORRECTNESS artifact records only the FIRST 50 registry
entries; the `_WINDOW_TAIL` queries rotated out of that window relied on
manual `tools/check_oracles.py` invocations. This test makes their gate
AUTOMATIC: every tail query runs against its DuckDB oracle twin at
sf0.001 on every pytest run. The hash comparison is scale-agnostic (both
engines read the same parquet), so the tiny tier keeps this fast while
still catching any Spark/oracle divergence.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO))

_ENV_DIR = os.environ.get("OCR_CEZAM_GATE_SF_DIR")
SF_DIR = _ENV_DIR or "/root/testdata/sf0.001"

# Skip (don't error) ONLY when the DEFAULT fixture dir is absent and no
# explicit override was given — a dev machine without the driver-generated
# parquet. An explicitly-set OCR_CEZAM_GATE_SF_DIR that doesn't exist is a
# configuration BUG and must fail loudly (a typo'd env var silently
# skipping all 42 tail oracle checks would green the suite with the whole
# cross-engine gate disabled).
pytestmark = pytest.mark.skipif(
    _ENV_DIR is None and not os.path.isdir(SF_DIR),
    reason=f"oracle-gate default fixture dir {SF_DIR} absent",
)


def test_gate_fixture_dir_exists():
    """Fails (never skips) when an explicit gate dir is set but missing."""
    assert os.path.isdir(SF_DIR), (
        f"OCR_CEZAM_GATE_SF_DIR={SF_DIR} does not exist — the tail oracle "
        "gate would be silently disabled"
    )


def _tail_names():
    from ocr_cezam_spark import queries as Q

    return [n for n in Q._WINDOW_TAIL if n in Q.QUERIES and n in Q.ORACLES]


@pytest.fixture(scope="module")
def duck():
    from tools.check_oracles import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.mark.parametrize("name", _tail_names())
def test_tail_query_matches_oracle(spark, duck, name):
    from ocr_cezam_spark import queries as Q
    from tools.check_oracles import table_hash

    df = Q.QUERIES[name](spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    spark_hash, spark_n = table_hash(cols, rows)

    rel = duck.sql(Q.ORACLES[name])
    oracle_hash, oracle_n = table_hash(list(rel.columns), rel.fetchall())

    assert spark_n == oracle_n, (name, spark_n, oracle_n)
    assert spark_hash == oracle_hash, (name, spark_n)
