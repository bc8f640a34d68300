"""Build ocr_cezam_spark.zip for spark-submit --py-files.

Usage: python tools/package.py [out.zip]
Then:  spark-submit --py-files ocr_cezam_spark.zip \
           --conf spark.sql.adaptive.enabled=true \
           your_job.py  (or python -m ocr_cezam_spark.job locally)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "ocr_cezam_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "ocr_cezam_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                # .py modules plus packaged data (the Public Suffix List
                # .dat — functions/url.py loads it through
                # importlib.resources, which reads through the zip)
                if fn.endswith((".py", ".dat")):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
