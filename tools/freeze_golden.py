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

from ocr_cezam_spark.corpus import make_page  # noqa: E402
from ocr_cezam_spark.kernel import extract  # noqa: E402

N = 400
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    texts = {"url": [], "text": []}
    statuses = {"url": [], "table_id": [], "status": [], "detail": []}
    for i in range(N):
        p = make_page(i)
        r = extract(p["url"], p["html"], p["lang"])
        assert r["error"] is None, (i, r["error"])
        texts["url"].append(r["url"])
        texts["text"].append(r["text"])
        for (t, s, d) in r["statuses"]:
            statuses["url"].append(r["url"])
            statuses["table_id"].append(t)
            statuses["status"].append(s)
            statuses["detail"].append(d)

    pq.write_table(
        pa.table(texts), os.path.join(OUT, f"extract_text_n{N}.parquet")
    )
    pq.write_table(
        pa.table(
            statuses,
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("table_id", pa.int32()),
                    ("status", pa.string()),
                    ("detail", pa.string()),
                ]
            ),
        ),
        os.path.join(OUT, f"solde_status_n{N}.parquet"),
    )
    print(f"wrote goldens for n={N} to {OUT}")


if __name__ == "__main__":
    main()
