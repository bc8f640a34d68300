"""Freeze golden outputs from the PURE-PYTHON kernel (no Spark import).

The goldens are the independent oracle for the Spark extraction queries:
the driver's DuckDB side reads these parquet files while Spark recomputes
the same rows through the full distributed pipeline — any batching/
partitioning nondeterminism shows up as a hash mismatch.

Run: python tools/freeze_golden.py  (writes golden/*.parquet)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_cezam_spark.corpus import make_page, make_pdf_page  # noqa: E402
from ocr_cezam_spark.kernel import extract  # noqa: E402

N = 400
N_PDF = 200
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    texts = {"url": [], "text": []}
    statuses = {"url": [], "table_id": [], "status": [], "detail": []}
    fields = {"url": [], "field": [], "value": []}
    cells = {"url": [], "table_id": [], "row_id": [], "col_id": [], "value": []}
    codes = {"url": [], "table_id": [], "code": [], "pos": [], "value": []}
    links = {"url": [], "pos": [], "href": [], "anchor": []}
    headings = {"url": [], "pos": [], "level": [], "heading": []}
    for i in range(N):
        p = make_page(i)
        r = extract(p["url"], p["html"], p["lang"])
        assert r["error"] is None, (i, r["error"])
        texts["url"].append(r["url"])
        texts["text"].append(r["text"])
        for pos, (href, anchor) in enumerate(r["links"]):
            links["url"].append(r["url"])
            links["pos"].append(pos)
            links["href"].append(href)
            links["anchor"].append(anchor)
        for pos, (level, t) in enumerate(r["headings"]):
            headings["url"].append(r["url"])
            headings["pos"].append(pos)
            headings["level"].append(level)
            headings["heading"].append(t)
        for (t, s, d) in r["statuses"]:
            statuses["url"].append(r["url"])
            statuses["table_id"].append(t)
            statuses["status"].append(s)
            statuses["detail"].append(d)
        for k in sorted(r["fields"]):
            fields["url"].append(r["url"])
            fields["field"].append(k)
            fields["value"].append(r["fields"][k])
        for (t, rr, c, v) in r["cells"]:
            cells["url"].append(r["url"])
            cells["table_id"].append(t)
            cells["row_id"].append(rr)
            cells["col_id"].append(c)
            cells["value"].append(v)
        for (t, code, pos, v) in r["codes"]:
            codes["url"].append(r["url"])
            codes["table_id"].append(t)
            codes["code"].append(code)
            codes["pos"].append(pos)
            codes["value"].append(v)

    def write(data: dict, name: str, int_cols: tuple = ()) -> None:
        schema = pa.schema(
            [
                (col, pa.int32() if col in int_cols else pa.string())
                for col in data
            ]
        )
        pq.write_table(pa.table(data, schema=schema),
                       os.path.join(OUT, f"{name}_n{N}.parquet"))

    write(texts, "extract_text")
    write(statuses, "solde_status", ("table_id",))
    write(fields, "extract_fields")
    write(cells, "extract_cells", ("table_id", "row_id", "col_id"))
    write(codes, "fiscal_codes", ("table_id", "pos"))
    write(links, "extract_links", ("pos",))
    write(headings, "extract_headings", ("pos", "level"))

    # PDF corpus goldens (the layout-parse path through the same kernel)
    p_texts = {"url": [], "text": []}
    p_fields = {"url": [], "field": [], "value": []}
    for i in range(N_PDF):
        p = make_pdf_page(i)
        r = extract(p["url"], p["html"], p["lang"])
        assert r["error"] is None, (i, r["error"])
        p_texts["url"].append(r["url"])
        p_texts["text"].append(r["text"])
        for k in sorted(r["fields"]):
            p_fields["url"].append(r["url"])
            p_fields["field"].append(k)
            p_fields["value"].append(r["fields"][k])

    def write_pdf(data: dict, name: str) -> None:
        schema = pa.schema([(col, pa.string()) for col in data])
        pq.write_table(pa.table(data, schema=schema),
                       os.path.join(OUT, f"{name}_n{N_PDF}.parquet"))

    write_pdf(p_texts, "pdf_text")
    write_pdf(p_fields, "pdf_fields")
    print(f"wrote goldens for n={N} (+{N_PDF} pdf) to {OUT}")


if __name__ == "__main__":
    main()
