"""Native-Spark reconciliation (operators/solde.py) must agree with the
pure-Python kernel bit-for-bit, including message text, plus edge cases."""

from __future__ import annotations

from ocr_cezam_spark.corpus import corpus_df, make_page
from ocr_cezam_spark.kernel import check_solde, extract
from ocr_cezam_spark.operators import extract as X
from ocr_cezam_spark.operators.solde import reconcile_cells


def _cells_df(spark, rows):
    data = [
        (u, t, r, c, v)
        for (u, t, table) in rows
        for r, row in enumerate(table)
        for c, v in enumerate(row)
    ]
    return spark.createDataFrame(
        data, "url string, table_id int, row_id int, col_id int, value string"
    )


def test_native_matches_kernel_over_corpus(spark):
    from pyspark.sql import functions as F  # noqa: N812

    out = X.run_extract(corpus_df(spark, 120), 8)
    # J2 dispatch in relational form: reconcile statement documents only,
    # exactly the set the kernel runs check_solde on
    stmt = (
        X.extracted_fields(out)
        .filter((F.col("field") == "doc_kind") & (F.col("value") == "statement"))
        .select("url")
    )
    cells = X.extracted_cells(out).join(stmt, "url", "left_semi")
    native = {
        (r["url"], r["table_id"]): (r["status"], r["detail"])
        for r in reconcile_cells(cells).collect()
    }
    n = 0
    for i in range(120):
        p = make_page(i)
        g = extract(p["url"], p["html"], p["lang"])
        for (t, s, d) in g["statuses"]:
            assert native[(g["url"], t)] == (s, d), (i, t)
            n += 1
    assert n > 50 and len(native) == n


def test_native_edge_cases(spark):
    tables = {
        "u_header_only": [["Date", "Débit", "Crédit"]],
        "u_no_roles": [["a", "b"], ["1", "2"]],
        "u_one_solde": [
            ["Date", "Libellé", "Débit", "Crédit"],
            ["", "Solde précédent", "10,00", ""],
            ["01/01/2024", "x", "5,00", ""],
        ],
        # ragged: extra cell BEYOND header width contains 'solde' — kernel
        # truncates body rows to header width before the marker scan, so
        # that cell must not mark the row (only one real marker -> Unknown)
        "u_ragged_solde_tail": [
            ["Date", "Libellé", "Débit", "Crédit"],
            ["", "Solde précédent", "10,00", ""],
            ["01/01/2024", "x", "5,00", "", "voir solde"],
            ["02/01/2024", "y", "3,00", ""],
        ],
        # first marker value is not float-parsable -> Unknown
        "u_bad_marker": [
            ["Date", "Libellé", "Débit", "Crédit"],
            ["", "Solde précédent", "12 EUR", ""],
            ["01/01/2024", "x", "5,00", ""],
            ["", "Solde final", "15,00", ""],
        ],
        # exotic numeric shapes float() would accept but the shared strict
        # gate rejects ('.5', '1e3', '1_000', padded) — both engines skip
        "u_exotic_numeric": [
            ["Date", "Libellé", "Débit", "Crédit"],
            ["", "Solde initial", "100,00", ""],
            ["01/01/2024", "a", ".5", ""],
            ["02/01/2024", "b", "1e3", ""],
            ["03/01/2024", "c", " 7,00 ", ""],
            ["04/01/2024", "d", "25,00", ""],
            ["", "Solde final", "125,00", ""],
        ],
        # body row shorter than the header (missing trailing cells)
        "u_short_row": [
            ["Date", "Libellé", "Débit", "Crédit"],
            ["", "Solde initial", "50,00", ""],
            ["01/01/2024", "x", "10,00"],
            ["", "Solde final", "60,00", ""],
        ],
    }
    df = _cells_df(spark, [(u, 0, t) for u, t in tables.items()])
    got = {r["url"]: (r["status"], r["detail"]) for r in reconcile_cells(df).collect()}
    for u, t in tables.items():
        assert got[u] == check_solde(t), u


def test_native_error_message_float_format(spark):
    t = [
        ["Date", "Libellé", "Débit", "Crédit"],
        ["", "Solde initial", "100,00", ""],
        ["01/01/2024", "achat", "25,00", ""],
        ["", "Solde final", "999,00", ""],
    ]
    df = _cells_df(spark, [("u", 0, t)])
    got = reconcile_cells(df).collect()[0]
    assert (got["status"], got["detail"]) == check_solde(t)
    assert "125.0 don't match final solde value 999.0." in got["detail"]
