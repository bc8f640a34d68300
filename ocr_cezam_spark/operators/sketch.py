"""Probabilistic sketches as pure relational plans: HyperLogLog
cardinality and Count-Min heavy hitters.

Reference parity: the reference engine has no sketches (its analytics
are exact, single-document — `ocr_cezam.py:63-64` loops files one at a
time); these are the 100 TB-side additions a Common-Crawl-scale corpus
needs, where exact distinct counts / per-key counts of trillions of
events stop fitting anywhere. Both sketches here are DETERMINISTIC —
hashes derive from md5 of the key text, never from RNG or partition
layout — so a DuckDB twin reproduces every register and every counter
bit-for-bit and the driver's hash gate applies end to end.

Scale shape, by construction:

- The HLL register table is `groups x m` rows MAX (m = 1024 here), built
  by ONE map-side-partial max aggregation over the stream — the classic
  mergeable-sketch contract: shards aggregate locally, registers merge
  by max. No row carries more than (group, bucket, rho) ints.
- The Count-Min table is `d x w` counters (256 rows here) built by ONE
  count aggregation after a 4-way posexplode (row multiplier is d, the
  sketch depth — constant, not data-dependent). Point queries are an
  equi-join against those 256 rows.
- Float determinism: every register contributes 2^-rho with
  rho <= 23 and at most 2^10 registers sum per group, so partial sums
  span < 34 bits of exponent — double addition is EXACT here and
  therefore immune to Spark's nondeterministic reduce order. The one
  inexact op (the final alpha*m^2/S divide, or the small-range ln) runs
  once on the driver-visible aggregate, identically in both engines.

Design notes: HLL++'s 64-bit hash / bias tables are overkill at the
tested design point and would drag a bias-constant table into the
oracle; the plain Flajolet HLL with the standard small-range linear
count is the textbook estimator and keeps the twin honest. 32-bit
hashes bound rho at 23 (22 rest bits + 1), which is what makes the
exact-float-sum argument above airtight.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.numeric import round_he

_HLL_P = 10
_HLL_M = 1 << _HLL_P           # 1024 registers
_HLL_REST_BITS = 32 - _HLL_P   # 22 bits feed the rank
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _h32(col: F.Column, salt: str = "") -> F.Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5(salt||key).
    Matches the DuckDB twin `CAST(concat('0x', substring(md5(..),1,8))
    AS BIGINT)` exactly — both engines md5 the same UTF-8 text."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def hll_cardinality(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """Distinct-count estimate per group via HyperLogLog (p=10, m=1024),
    with the exact count alongside so the estimate's error is visible.

    Plan: one projection computes (group, bucket, rho) per row; one
    partial-aggregating groupBy keeps max(rho) per (group, bucket) —
    at most groups*1024 rows cross the shuffle regardless of input
    size; one tiny final groupBy folds registers into the estimate.
    The exact count-distinct rides the same cheap keyspace here for
    the error column; at 100 TB you would drop it — the sketch is the
    point. rho is computed by integer/string ops only (lpad(bin(rest))
    + instr), never float log2, so register values can't straddle an
    engine's rounding boundary.
    """
    h = _h32(F.col(key_col))
    rest = h.bitwiseAND(F.lit((1 << _HLL_REST_BITS) - 1))
    rho = F.when(rest == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.instr(F.lpad(F.bin(rest), _HLL_REST_BITS, "0"), "1")
    )
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            F.shiftright(h, _HLL_REST_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    folded = regs.groupBy("grp").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_pows"),
    )
    zeros = F.lit(float(_HLL_M)) - F.col("n_regs").cast("double")
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (F.col("sum_pows") + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(raw)
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return (
        folded.join(exact, "grp")
        .select(
            "grp",
            "n_exact",
            round_he(est, 4).alias("hll_est"),
            F.col("n_regs").cast("long").alias("n_regs"),
        )
        .orderBy("grp")
    )


_CM_W = 64  # counters per row
_CM_D = 4   # hash rows


def cm_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """The Count-Min counter table itself: d x w = 256 (row, bucket,
    cnt) rows from ONE aggregation. Mergeable by + across shards/days;
    this table IS the bounded-memory artifact a 100 TB stream keeps."""
    buckets = F.array(*[
        (_h32(F.col(key_col), f"cm{i}:") % _CM_W) for i in range(_CM_D)
    ])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_heavy_hitters(df: DataFrame, key_col: str,
                     threshold_frac: float = 0.02) -> DataFrame:
    """Keys whose Count-Min estimate is >= threshold_frac of the stream,
    with true counts alongside (CM guarantees est >= true; overestimates
    come from bucket collisions).

    Plan: the 256-counter sketch from `cm_sketch`, then point queries —
    candidate keys re-hash to their d buckets and take min(cnt) over an
    equi-join against the sketch. The candidate set here is the distinct
    keys (a hash agg — fine at any scale); in a true streaming setting
    candidates come from per-shard top-k and the sketch arbitrates,
    which is exactly this join. All integer counts: the DuckDB twin
    matches bit-for-bit with no rounding gate at all.
    """
    sketch = cm_sketch(df, key_col)
    true_cnt = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("true_cnt")
    )
    # threshold stays IN the plan: a 1-row total broadcast-crossed in,
    # so the whole query is one job with no driver-side count action.
    # floor(total*frac) as the row threshold, integer-exact both engines.
    total = df.groupBy().agg(F.count("*").alias("total"))
    buckets = F.array(*[
        (_h32(F.col("key"), f"cm{i}:") % _CM_W) for i in range(_CM_D)
    ])
    probes = true_cnt.select(
        "key", "true_cnt", F.posexplode(buckets).alias("row", "bucket")
    )
    est = (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("key", "true_cnt")
        .agg(F.min("cnt").alias("cm_est"))
    )
    thresh = F.floor(F.col("total") * F.lit(threshold_frac))
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("cm_est") >= thresh)
        .select("key", "true_cnt", "cm_est")
        .orderBy(F.desc("cm_est"), "key")
    )


def hll_merge(df: DataFrame, key_col: str, shard_col: str) -> DataFrame:
    """Sketch MERGEABILITY, demonstrated end to end: build one HLL
    register table per shard (day / partition / shard file), max-merge
    the registers, and fold — the merged estimate must equal the
    whole-stream estimate computed in one pass, because register
    max-merge is exactly how HLL composes (the property that lets a
    100 TB pipeline keep per-day sketches and answer cross-day distinct
    counts without replay; same fold constants as hll_cardinality).

    Output: ONE row (hll_est_merged, hll_est_whole, n_regs,
    merge_lossless) — merge_lossless is computed in-plan so the
    invariant is driver-visible, not just a pytest.

    Scale shape: two register aggregations (shards x 1024 and 1024 rows
    max across the shuffle) + two single-row folds broadcast-crossed —
    input size never crosses a shuffle twice.
    """
    h = _h32(F.col(key_col))
    rest = h.bitwiseAND(F.lit((1 << _HLL_REST_BITS) - 1))
    rho = F.when(rest == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.instr(F.lpad(F.bin(rest), _HLL_REST_BITS, "0"), "1")
    )
    rows = df.select(
        F.col(shard_col).alias("shard"),
        F.shiftright(h, _HLL_REST_BITS).alias("bucket"),
        rho.alias("rho"),
    )

    def fold(regs: DataFrame, est_name: str) -> DataFrame:
        folded = regs.groupBy().agg(
            F.count("*").alias("n_regs"),
            F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_pows"),
        )
        zeros = F.lit(float(_HLL_M)) - F.col("n_regs").cast("double")
        raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (
            F.col("sum_pows") + zeros
        )
        est = F.when(
            (raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
        ).otherwise(raw)
        return folded.select(
            round_he(est, 4).alias(est_name),
            F.col("n_regs").cast("long").alias(f"n_regs_{est_name}"),
        )

    shard_regs = rows.groupBy("shard", "bucket").agg(
        F.max("rho").alias("m_j")
    )
    merged = shard_regs.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    whole = rows.groupBy("bucket").agg(F.max("rho").alias("m_j"))
    m = fold(merged, "hll_est_merged")
    w = fold(whole, "hll_est_whole")
    return m.crossJoin(F.broadcast(w)).select(
        "hll_est_merged",
        "hll_est_whole",
        F.col("n_regs_hll_est_merged").alias("n_regs"),
        (F.col("hll_est_merged") == F.col("hll_est_whole"))
        .alias("merge_lossless"),
    )


def cm_merge(df: DataFrame, key_col: str, shard_col: str) -> DataFrame:
    """Count-Min mergeability: per-shard counter tables SUM-merged must
    equal the whole-stream counter table (CM composes by +, the reason
    per-day sketches union without replay — the additive counterpart of
    hll_merge's max-merge). Output: ONE row with the number of counters
    compared, the max absolute counter diff (0 by construction), and the
    in-plan merge_lossless flag.

    Scale shape: two counter aggregations (shards x 256 and 256 rows)
    plus a 256-row join — input crosses a shuffle once per aggregation,
    all integer-exact.
    """
    buckets = F.array(*[
        (_h32(F.col(key_col), f"cm{i}:") % _CM_W) for i in range(_CM_D)
    ])
    rows = df.select(
        F.col(shard_col).alias("shard"),
        F.posexplode(buckets).alias("row", "bucket"),
    )
    shard_cnt = rows.groupBy("shard", "row", "bucket").agg(
        F.count("*").alias("cnt")
    )
    merged = shard_cnt.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("m_cnt")
    )
    whole = rows.groupBy("row", "bucket").agg(F.count("*").alias("w_cnt"))
    diff = merged.join(whole, ["row", "bucket"], "full").select(
        (F.abs(F.coalesce("m_cnt", F.lit(0))
               - F.coalesce("w_cnt", F.lit(0)))).alias("d")
    )
    return diff.groupBy().agg(
        F.count("*").cast("long").alias("n_counters"),
        F.max("d").cast("long").alias("max_abs_diff"),
        (F.max("d") == 0).alias("merge_lossless"),
    )
