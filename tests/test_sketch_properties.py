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


def _py_bloom_positions(key: str, m_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"bf{i}:{key}".encode("utf-8")).hexdigest()[:8], 16)
        % m_bits
        for i in range(k)
    ]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=40),
    st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=40),
)
def test_bloom_no_false_negatives_and_bits_match_python(spark, build, probe):
    """THE Bloom guarantee on arbitrary key sets: every member probe is a
    hit (no false negatives, whatever the collisions), hits >= members,
    and the Spark bit positions equal an independent pure-Python md5
    reference (the math the DuckDB twin replays)."""
    from ocr_cezam_spark.operators.sketch import (
        _bloom_positions, bloom_membership,
    )

    m_bits, k = 128, 3  # small m so collisions actually occur
    bdf = spark.createDataFrame([(x,) for x in build], "key string")
    pdf = spark.createDataFrame([(x,) for x in probe], "key string")
    row = bloom_membership(bdf, "key", pdf, "key", m_bits, k).collect()[0]
    assert row["no_false_negatives"]
    assert row["n_hits"] >= row["n_members"]
    assert row["n_false_pos"] == row["n_hits"] - row["n_members"]
    assert row["n_probes"] == len(set(probe))
    assert row["n_build"] == len(set(build))
    assert 0 < row["n_bits_set"] <= m_bits

    got = bdf.select(
        "key", _bloom_positions(F.col("key"), m_bits, k).alias("pos")
    ).collect()
    for r in got:
        assert list(r["pos"]) == _py_bloom_positions(r["key"], m_bits, k)


def test_bloom_merge_lossless_and_null_keys_ignored(spark):
    from ocr_cezam_spark.operators.sketch import bloom_bits, bloom_merge

    rows = [(f"url{i}", i % 4) for i in range(200)] + [(None, 0)]
    df = spark.createDataFrame(rows, "key string, shard int")
    m = bloom_merge(df, "key", "shard", m_bits=512, k=4).collect()[0]
    assert m["merge_lossless"]
    assert m["n_bits_both"] == m["n_bits_union"] <= 512

    # a NULL key must set no bits: same sketch with and without it
    with_null = bloom_bits(df, "key", 512, 4)
    without = bloom_bits(df.filter(F.col("key").isNotNull()), "key", 512, 4)
    assert sorted(r["bit"] for r in with_null.collect()) == sorted(
        r["bit"] for r in without.collect()
    )
