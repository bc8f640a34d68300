"""Property tests for the sketch primitives' engine-exact integer math:
the Spark expressions for the 64-bit HLL hash split and the HDR bucket
map must equal independent pure-Python references on arbitrary inputs —
these are the functions whose cross-engine determinism the oracle twins
rely on, so a boundary bug (a value straddling a bucket) would show up
as a driver hash mismatch only on unlucky data. One Spark job evaluates
the whole generated batch (hypothesis drives the VALUES, not per-example
Spark jobs)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: N812


def _py_h64_parts(key: str, p: int) -> tuple[int, int]:
    rest_bits = 64 - p
    h = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:16], 16)
    rest = h & ((1 << rest_bits) - 1)
    if rest == 0:
        return h >> rest_bits, rest_bits + 1
    return h >> rest_bits, rest_bits - rest.bit_length() + 1


def _py_hdr_bucket(v: int, sub_bits: int) -> int:
    if v < (1 << sub_bits):
        return v
    e = v.bit_length() - 1
    return e * (1 << sub_bits) + ((v >> (e - sub_bits)) & ((1 << sub_bits) - 1))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=60),
       st.integers(min_value=7, max_value=12))
def test_h64_parts_matches_python(spark, keys, p):
    from ocr_cezam_spark.operators.sketch import _h64_parts

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    bucket, rho = _h64_parts(F.col("k"), p)
    got = df.select("k", bucket.alias("b"), rho.alias("r")).collect()
    for row in got:
        wb, wr = _py_h64_parts(row["k"], p)
        assert (row["b"], row["r"]) == (wb, wr), (row["k"], p)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(
    st.integers(min_value=1, max_value=2 ** 63 - 1),
    # boundary-heavy values: around powers of two and bucket edges
    st.builds(lambda e, d: max(1, min(2 ** 63 - 1, (1 << e) + d)),
              st.integers(min_value=1, max_value=62),
              st.integers(min_value=-2, max_value=2)),
), min_size=1, max_size=80), st.integers(min_value=1, max_value=6))
def test_hdr_bucket_matches_python(spark, vals, sub_bits):
    from ocr_cezam_spark.operators.sketch import _hdr_bucket

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select(
        "v", _hdr_bucket(F.col("v"), sub_bits).alias("b")
    ).collect()
    for row in got:
        assert row["b"] == _py_hdr_bucket(row["v"], sub_bits), (
            row["v"], sub_bits)
