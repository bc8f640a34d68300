"""Grouped-map table re-assembly (applyInPandas).

The reference materializes each detected table as a wide pandas DataFrame
whose header row becomes disambiguated column names "{i} - {name}"
(process_table.py:465-474, F12). Long-format cells are the engine's native
representation; this operator reconstructs the wide view per
(url, table_id) with ``applyInPandas`` — the grouped-map UDF surface of
SURVEY.md section 2.10 — and emits per-table shape + header signature.

At scale the group key (url, table_id) is fine-grained (thousands of rows
max per table), so the grouped shuffle is balanced by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "url string, table_id int, n_rows int, n_cols int, header_sig string"


def _assemble_one(pdf: pd.DataFrame) -> pd.DataFrame:
    url = pdf["url"].iloc[0]
    table_id = int(pdf["table_id"].iloc[0])
    wide = pdf.pivot_table(
        index="row_id", columns="col_id", values="value", aggfunc="first"
    ).sort_index()
    n_rows, n_cols = int(wide.shape[0]), int(wide.shape[1])
    if n_rows > 0:
        header = wide.iloc[0].fillna("")
        # "{i} - {name}" disambiguation (process_table.py:469-471)
        names = [f"{i} - {header.get(i, '')}" for i in sorted(wide.columns)]
        sig = "|".join(names)
    else:
        sig = ""
    return pd.DataFrame(
        [
            {
                "url": url,
                "table_id": table_id,
                "n_rows": n_rows,
                "n_cols": n_cols,
                "header_sig": sig,
            }
        ]
    )


def assemble_tables(cells: DataFrame) -> DataFrame:
    """cells(url, table_id, row_id, col_id, value) -> per-table shape +
    disambiguated-header signature via grouped-map pandas."""
    return cells.groupBy("url", "table_id").applyInPandas(
        _assemble_one, schema=OUT_SCHEMA
    )
