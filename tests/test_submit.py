"""spark-submit --py-files packaging smoke test (the north rule's launch
mode): the package zip from tools/package.py must be importable by a
driver that has NO repo on its python path — the only route to the code
is the --py-files distribution."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import json
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from ocr_cezam_spark.corpus import corpus_df, pdf_corpus_df
from ocr_cezam_spark.operators import extract as X

docs = corpus_df(spark, 40).unionByName(pdf_corpus_df(spark, 20))
out = X.run_extract(docs, num_partitions=4)
n = X.extracted_text(out).count()
errs = out.filter("error IS NOT NULL").count()
# the PSL loads its packaged .dat through importlib.resources — this
# import+use is what catches a zip that ships only .py files (r7 bug:
# the data file was missing and open() could not read through the zip)
from pyspark.sql import functions as F
from ocr_cezam_spark.functions.url import registered_domain
rd = (spark.createDataFrame([("https://a.b.site.co.uk/x",)], "u string")
      .select(registered_domain(F.col("u")).alias("rd")).collect()[0]["rd"])
print("SUBMIT_RESULT " + json.dumps({"n": n, "errs": errs, "rd": rd}))
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = tmp_path / "ocr_cezam_spark.zip"
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "package.py"),
                    str(zip_path)], check=True, capture_output=True)
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path), str(driver)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT")]
    assert line, (out.stdout[-1000:], out.stderr[-1000:])
    r = json.loads(line[-1].split(" ", 1)[1])
    assert r == {"n": 60, "errs": 0, "rd": "site.co.uk"}
