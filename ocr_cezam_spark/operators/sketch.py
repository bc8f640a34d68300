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

Null keys are IGNORED by every sketch in this module — the same
convention as count(DISTINCT) — enforced by an explicit filter on both
the Spark side and the emitted DuckDB twins (without it, a NULL key
md5-hashes to NULL and materializes a phantom register/counter row that
inflates estimates, and the streaming twins would stringify None into a
real key — the r7 review caught exactly that divergence).

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

Design notes: the 32-bit family keeps the textbook Flajolet HLL with
the standard small-range linear count (no HLL++ bias tables, which
would drag a constant table into the oracle). 32-bit hashes bound rho
at 23 (22 rest bits + 1), which is what makes the exact-float-sum
argument above airtight — but they also cap the estimator near
m * 2^22 ≈ 4x10^9 distinct: registers saturate and the estimate stops
growing, two orders below the 10^12-document design point. The 64-bit
family below (``hll_cardinality64`` / ``hll_merge64`` / ``hll_fold64``)
is the production mode: 64 hash bits from the md5 prefix (top 12 bits
from hex chars 1-3, low 52 bits from chars 4-16 — each half fits a
signed long, so neither engine ever parses a 64-bit integer), rho over
the 64-p rest bits, and an INTEGER-SCALED register fold — each register
contributes the exact integer 2^(R - rho) (R = max rho = 65-p) summed
in decimal/HUGEINT, because the old exact-double-sum argument dies at
rho > 30 (2^-1 + 2^-55 is not representable in a double). The scaled
sum is exact in both engines; the single cast-to-double of the exact
integer denominator and the one divide are correctly-rounded IEEE ops,
so cross-engine determinism survives. Geometry (p, and the Count-Min
w/d) is parameterized, and the DuckDB twins are EMITTED from the same
parameters (``hll64_branch_sql`` etc.), so a non-default geometry is
one argument, not a second implementation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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
    df = df.filter(F.col(key_col).isNotNull())
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


# ---------------------------------------------------------------------------
# 64-bit-hash HLL: the production mode for the 10^12-row design point.
# ---------------------------------------------------------------------------

_LO52 = 1 << 52  # weight of the top-12/low-52 hash split


def _hll64_geometry(p: int) -> tuple[int, int, float]:
    """(m, rest_bits, alpha) for precision p. p is bounded to [7, 12]:
    below 7 the 0.7213/(1+1.079/m) alpha formula no longer applies
    (HLL uses tabulated constants for m < 128), above 12 the bucket
    would need more than the 12 bits carved from hex chars 1-3."""
    if not 7 <= p <= 12:
        raise ValueError(f"p must be in [7, 12], got {p}")
    m = 1 << p
    return m, 64 - p, 0.7213 / (1.0 + 1.079 / m)


def _h64_parts(col: F.Column, p: int, salt: str = "") -> tuple[F.Column,
                                                               F.Column]:
    """(bucket, rho) from a 64-bit md5-prefix hash, no 64-bit integer
    arithmetic: hex chars 1-3 give the top 12 bits (bucket = top p,
    rest-head = the other 12-p), chars 4-16 give the low 52 — both
    halves fit signed longs in Spark and BIGINT in the DuckDB twin.
    rho = 1 + leading zeros of the (64-p)-bit rest, by integer/string
    ops only (lpad(bin())+instr), never float log2."""
    m, rest_bits, _ = _hll64_geometry(p)
    md = F.md5(F.concat(F.lit(salt), col.cast("string")))
    hi12 = F.conv(F.substring(md, 1, 3), 16, 10).cast("long")
    lo52 = F.conv(F.substring(md, 4, 13), 16, 10).cast("long")
    bucket = F.shiftright(hi12, 12 - p)
    rest = (hi12.bitwiseAND(F.lit((1 << (12 - p)) - 1)) * F.lit(_LO52)
            + lo52)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(rest), rest_bits, "0"), "1")
    )
    return bucket, rho


def hll_fold64(regs: DataFrame, p: int,
               est_name: str = "hll_est") -> DataFrame:
    """Fold a (grp, bucket, m_j) register table to (grp, est, n_regs)
    with the integer-scaled EXACT sum: each register contributes the
    integer 2^(R - m_j) (R = rest_bits + 1 = max rho), summed as
    decimal(38,0) — exact regardless of Spark's reduce order, unlike a
    double sum of 2^-rho whose exponents span more than 53 bits at
    rho > 30. The estimate is alpha*m^2*2^R / (scaled + zeros*2^R):
    one exact integer denominator, one correctly-rounded cast, one
    divide — deterministic across engines. Small range keeps the
    standard m*ln(m/zeros) linear count. Exposed standalone so tests
    can fold CONSTRUCTED registers (the only way to exercise the
    >2^32-distinct regime without 4x10^9 real rows)."""
    m, rest_bits, alpha = _hll64_geometry(p)
    r_max = rest_bits + 1
    term = F.pow(
        F.lit(2.0), (F.lit(r_max) - F.col("m_j")).cast("double")
    ).cast("decimal(38,0)")
    folded = regs.groupBy("grp").agg(
        F.count("*").alias("n_regs"),
        F.sum(term).alias("s_scaled"),
    )
    zeros_i = (F.lit(m) - F.col("n_regs")).cast("decimal(38,0)")
    denom = (F.col("s_scaled")
             + zeros_i * F.lit(1 << r_max).cast("decimal(38,0)"))
    raw = F.lit(alpha * m * m * float(2 ** r_max)) / denom.cast("double")
    zeros_f = (F.lit(m) - F.col("n_regs")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros_f > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros_f),
    ).otherwise(raw)
    return folded.select(
        "grp",
        round_he(est, 4).alias(est_name),
        F.col("n_regs").cast("long").alias("n_regs"),
    )


def hll_cardinality64(df: DataFrame, key_col: str, group_col: str,
                      p: int = 10) -> DataFrame:
    """Distinct-count estimate per group, 64-bit-hash HLL — same plan
    shape as `hll_cardinality` (one projection, one max-agg bounded at
    groups*m rows across the shuffle, one tiny fold) but with estimator
    range ~2^64: registers cannot saturate at the 10^12 design point.
    The exact count rides alongside for error visibility at test scale;
    at 100 TB you would drop it — the sketch is the point."""
    df = df.filter(F.col(key_col).isNotNull())
    bucket, rho = _h64_parts(F.col(key_col), p)
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return (
        hll_fold64(regs, p)
        .join(exact, "grp")
        .select("grp", "n_exact", "hll_est", "n_regs")
        .orderBy("grp")
    )


def hll_merge64(df: DataFrame, key_col: str, shard_col: str,
                p: int = 10) -> DataFrame:
    """`hll_merge`'s max-merge mergeability demonstration on the 64-bit
    family: per-shard registers max-merged must fold to the whole-stream
    estimate, asserted in-plan (merge_lossless). Same two bounded
    register aggregations + two single-row folds."""
    df = df.filter(F.col(key_col).isNotNull())
    bucket, rho = _h64_parts(F.col(key_col), p)
    rows = df.select(
        F.col(shard_col).alias("shard"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    shard_regs = rows.groupBy("shard", "bucket").agg(
        F.max("rho").alias("m_j")
    )
    merged = shard_regs.groupBy("bucket").agg(
        F.max("m_j").alias("m_j")
    ).withColumn("grp", F.lit("m"))
    whole = rows.groupBy("bucket").agg(
        F.max("rho").alias("m_j")
    ).withColumn("grp", F.lit("w"))
    fm = hll_fold64(merged, p, "hll_est_merged")
    fw = hll_fold64(whole, p, "hll_est_whole").select("hll_est_whole")
    return fm.crossJoin(F.broadcast(fw)).select(
        "hll_est_merged",
        "hll_est_whole",
        F.col("n_regs"),
        (F.col("hll_est_merged") == F.col("hll_est_whole"))
        .alias("merge_lossless"),
    )


# --- DuckDB twin emitters: the oracle SQL is GENERATED from the same
# geometry arguments the Spark side takes, so changing p (or CM w/d)
# changes both engines from one call site. -------------------------------

def hll64_parts_sql(p: int) -> tuple[str, str]:
    """(bucket_expr, rho_expr) over an `h12`/`l52` pair the caller
    selects via `hll64_hash_sql` — the key is named ONCE, there (a key
    parameter here was unused and could silently disagree with it)."""
    _, rest_bits, _ = _hll64_geometry(p)
    rest = f"((h12 % {1 << (12 - p)}) * {_LO52} + l52)"
    bucket = f"(h12 // {1 << (12 - p)})"
    rho = (f"CASE WHEN {rest} = 0 THEN {rest_bits + 1} "
           f"ELSE instr(lpad(bin({rest}), {rest_bits}, '0'), '1') END")
    return bucket, rho


def hll64_hash_sql(key_sql: str) -> str:
    """SELECT-list fragment computing the split 64-bit hash halves."""
    return (
        f"CAST(concat('0x', substring(md5({key_sql}), 1, 3)) AS BIGINT)"
        f" AS h12, "
        f"CAST(concat('0x', substring(md5({key_sql}), 4, 13)) AS BIGINT)"
        f" AS l52"
    )


def hll64_fold_sql(src: str, p: int, est_name: str) -> str:
    """Fold a (bucket, m_j) table `src` — integer-scaled HUGEINT sum,
    mirroring hll_fold64's decimal(38,0) sum term for term."""
    m, rest_bits, alpha = _hll64_geometry(p)
    r_max = rest_bits + 1
    return f"""
      SELECT CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                  THEN {float(m)!r} * ln({float(m)!r} / zeros)
                  ELSE raw END AS {est_name}, n_regs
      FROM (
        SELECT n_regs, CAST({m} - n_regs AS DOUBLE) AS zeros,
               {alpha * m * m * float(2 ** r_max)!r}
                 / CAST(s_scaled + ({m} - n_regs)
                        * CAST({1 << r_max} AS HUGEINT) AS DOUBLE) AS raw
        FROM (SELECT count(*) AS n_regs,
                     sum(CAST(power(2.0, {r_max} - m_j) AS HUGEINT))
                       AS s_scaled
              FROM {src})
      )
    """


def hll64_branch_sql(key_sql: str, grp_sql: str, p: int,
                     table: str = "events") -> str:
    """One grouped hll_cardinality64 twin (grp, n_exact, hll_est,
    n_regs) — emitted from the same geometry as the Spark plan."""
    m, rest_bits, alpha = _hll64_geometry(p)
    r_max = rest_bits + 1
    bucket, rho = hll64_parts_sql(p)
    return f"""
    SELECT grp, n_exact, floor(e * 1e4 + 0.5) / 1e4 AS hll_est, n_regs
    FROM (
      SELECT grp, n_regs,
             CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                  THEN {float(m)!r} * ln({float(m)!r} / zeros)
                  ELSE raw END AS e
      FROM (
        SELECT grp, n_regs, CAST({m} - n_regs AS DOUBLE) AS zeros,
               {alpha * m * m * float(2 ** r_max)!r}
                 / CAST(s_scaled + ({m} - n_regs)
                        * CAST({1 << r_max} AS HUGEINT) AS DOUBLE) AS raw
        FROM (
          SELECT grp, count(*) AS n_regs,
                 sum(CAST(power(2.0, {r_max} - m_j) AS HUGEINT))
                   AS s_scaled
          FROM (
            SELECT grp, {bucket} AS bucket, max({rho}) AS m_j
            FROM (SELECT {grp_sql} AS grp, {hll64_hash_sql(key_sql)}
                  FROM {table} WHERE {key_sql} IS NOT NULL)
            GROUP BY grp, {bucket}
          ) GROUP BY grp
        )
      )
    ) JOIN (
      SELECT {grp_sql} AS grp, count(DISTINCT {key_sql}) AS n_exact
      FROM {table} WHERE {key_sql} IS NOT NULL GROUP BY 1
    ) USING (grp)
    """


_CM_W = 64  # default counters per row
_CM_D = 4   # default hash rows


def cm_sketch(df: DataFrame, key_col: str, w: int = _CM_W,
              d: int = _CM_D) -> DataFrame:
    """The Count-Min counter table itself: d x w (row, bucket, cnt)
    rows from ONE aggregation. Mergeable by + across shards/days; this
    table IS the bounded-memory artifact a 100 TB stream keeps. w and d
    are real parameters (eps ~ e/w of stream total, delta ~ e^-d) —
    size them to the tolerance, e.g. w=2718 for eps=0.1%."""
    df = df.filter(F.col(key_col).isNotNull())
    buckets = F.array(*[
        (_h32(F.col(key_col), f"cm{i}:") % w) for i in range(d)
    ])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_heavy_hitters(df: DataFrame, key_col: str,
                     threshold_frac: float = 0.02,
                     w: int = _CM_W, d: int = _CM_D) -> DataFrame:
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
    df = df.filter(F.col(key_col).isNotNull())
    sketch = cm_sketch(df, key_col, w, d)
    true_cnt = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("true_cnt")
    )
    # threshold stays IN the plan: a 1-row total broadcast-crossed in,
    # so the whole query is one job with no driver-side count action.
    # floor(total*frac) as the row threshold, integer-exact both engines.
    total = df.groupBy().agg(F.count("*").alias("total"))
    buckets = F.array(*[
        (_h32(F.col("key"), f"cm{i}:") % w) for i in range(d)
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


def cm_hh_sql(key_sql: str, threshold_frac: float,
              w: int = _CM_W, d: int = _CM_D,
              table: str = "events") -> str:
    """DuckDB twin of cm_heavy_hitters — emitted from the SAME (w, d,
    threshold) arguments the Spark side takes, so non-default sketch
    geometry changes both engines at one call site."""
    h = ("CAST(concat('0x', substring(md5("
         f"'cm' || CAST(i AS VARCHAR) || ':' || key), 1, 8)) AS BIGINT)")
    return f"""
    WITH keyed AS (SELECT {key_sql} AS key FROM {table}
                   WHERE {key_sql} IS NOT NULL),
    dims AS (SELECT unnest(range({d})) AS i),
    sk AS (
      SELECT i, {h} % {w} AS bucket, count(*) AS cnt
      FROM keyed, dims GROUP BY 1, 2
    ),
    truec AS (SELECT key, count(*) AS true_cnt FROM keyed GROUP BY 1),
    probes AS (
      SELECT key, true_cnt, i, {h} % {w} AS bucket
      FROM truec, dims
    ),
    est AS (
      SELECT key, true_cnt, min(cnt) AS cm_est
      FROM probes JOIN sk USING (i, bucket) GROUP BY 1, 2
    ),
    total AS (SELECT count(*) AS total FROM keyed)
    SELECT key, true_cnt, cm_est FROM est, total
    WHERE cm_est >= floor(total * {threshold_frac!r})
    ORDER BY cm_est DESC, key
    """


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
    df = df.filter(F.col(key_col).isNotNull())
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


def cm_merge(df: DataFrame, key_col: str, shard_col: str,
             w: int = _CM_W, d: int = _CM_D) -> DataFrame:
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
    df = df.filter(F.col(key_col).isNotNull())
    buckets = F.array(*[
        (_h32(F.col(key_col), f"cm{i}:") % w) for i in range(d)
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


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch: the distribution member of the sketch
# family (HLL = distinct, CM = frequency, HDR = quantiles). DDSketch
# (Masson et al. 2019) gives relative-error quantiles from log-gamma
# buckets, but float log makes bucket indices engine-fragile at
# boundaries; the HDR-histogram formulation (Tene's HdrHistogram) gets
# the same guarantee for INTEGER inputs with pure integer ops — exponent
# e = floor(log2 v) via bit length, plus the top `sub_bits` mantissa
# bits — so both engines compute identical buckets with no rounding gate
# at all. Relative error <= 2^-sub_bits within a bucket; bucket count is
# O(64 * 2^sub_bits) regardless of input size; merge is counter addition
# (same contract as Count-Min).
# ---------------------------------------------------------------------------

_HDR_SUB_BITS = 3  # default: 8 sub-buckets per octave, <= 12.5% rel. err


def _hdr_bucket(v: F.Column, sub_bits: int) -> F.Column:
    """Integer HDR bucket index of a POSITIVE integer value: values below
    2^sub_bits are exact (their own bucket); above, index = (e <<
    sub_bits) | top sub_bits mantissa bits, e = bit_length - 1. Pure
    integer/string ops (length(bin()) for the exponent), no float."""
    b = F.bin(v)
    e = (F.length(b) - 1).cast("long")
    small = v < (1 << sub_bits)
    # Spark's shift builtins take only literal shift amounts; the top
    # mantissa bits come off the binary STRING instead (chars 2..1+sub —
    # char 1 is the leading 1) — the same exact integer/string idiom the
    # HLL rho uses, so no float division can straddle a bucket boundary.
    mant = F.conv(F.substring(b, 2, sub_bits), 2, 10).cast("long")
    return F.when(small, v.cast("long")).otherwise(
        e * (1 << sub_bits) + mant
    )


def hdr_sketch(df: DataFrame, value_col: str, group_col: str | None = None,
               sub_bits: int = _HDR_SUB_BITS) -> DataFrame:
    """The bounded histogram itself: (grp?, bucket, cnt) from ONE
    aggregation — at most 64 * 2^sub_bits buckets per group cross the
    shuffle no matter how many trillions of rows stream through.
    Values < 1 (and NULLs) are counted in bucket -1 (underflow), so the
    sketch is total over arbitrary long inputs. Non-integer value
    columns TRUNCATE toward zero (Spark's cast semantics; the emitted
    DuckDB twin applies trunc() explicitly because DuckDB's CAST rounds
    half-away — without it a latency of 2.5 would land in different
    buckets per engine)."""
    v = F.col(value_col).cast("long")
    bucket = F.when(
        v.isNull() | (v < 1), F.lit(-1).cast("long")
    ).otherwise(_hdr_bucket(v, sub_bits))
    keys = ([F.col(group_col).alias("grp")] if group_col else []) + [
        bucket.alias("bucket")
    ]
    return df.select(*keys).groupBy(
        *(["grp"] if group_col else []), "bucket"
    ).agg(F.count("*").alias("cnt"))


def hdr_quantiles(df: DataFrame, value_col: str,
                  qs: tuple = (0.5, 0.9, 0.99),
                  group_col: str | None = None,
                  sub_bits: int = _HDR_SUB_BITS) -> DataFrame:
    """Quantile estimates from the HDR sketch. The q-th estimate is the
    LOWER BOUND of the first bucket whose cumulative count reaches
    ceil(q * n) — an integer, never exceeding the true rank-quantile
    (the bucket function is monotone, so the rank-th smallest value
    lands in exactly that bucket), within 2^-sub_bits relative error
    below it (pytest asserts both sides against the exact quantile).

    Plan: the bounded sketch (one agg), a window over the <= 64 *
    2^sub_bits bucket rows (tiny by construction — this window's input
    is the SKETCH, not the data), one filter per quantile. The exact
    twin (percentile_disc) exists only for the error column; drop it at
    production scale.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    m = 1 << sub_bits
    sk = hdr_sketch(df, value_col, group_col, sub_bits)
    gcols = ["grp"] if group_col else []
    w = (
        Window.partitionBy(*gcols).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*gcols)
    cum = sk.select(
        *gcols, "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot_w).alias("total"),
    )
    e = F.floor(F.col("bucket") / m).cast("int")
    mant = F.col("bucket") % m
    lower = F.when(F.col("bucket") < m, F.col("bucket")).otherwise(
        (mant + m) * F.pow(F.lit(2.0), (e - sub_bits).cast("double"))
        .cast("long")
    ).cast("long")
    outs = []
    for q in qs:
        rank = F.ceil(F.col("total") * F.lit(q)).cast("long")
        hit = (
            cum.filter(
                (F.col("cum") >= rank)
                & ((F.col("cum") - F.col("cnt")) < rank)
            )
            .select(
                *gcols,
                F.lit(float(q)).alias("q"),
                lower.alias("est"),
                F.col("total").cast("long").alias("n_rows"),
            )
        )
        outs.append(hit)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(*gcols, "q")


def hdr_merge(df: DataFrame, value_col: str, shard_col: str,
              sub_bits: int = _HDR_SUB_BITS) -> DataFrame:
    """HDR mergeability (counter addition, like cm_merge): per-shard
    histograms sum-merged must equal the whole-stream histogram —
    asserted in-plan. ONE output row (n_buckets, max_abs_diff,
    merge_lossless)."""
    v = F.col(value_col).cast("long")
    bucket = F.when(
        v.isNull() | (v < 1), F.lit(-1).cast("long")
    ).otherwise(_hdr_bucket(v, sub_bits))
    rows = df.select(F.col(shard_col).alias("shard"), bucket.alias("bucket"))
    shard_cnt = rows.groupBy("shard", "bucket").agg(
        F.count("*").alias("cnt")
    )
    merged = shard_cnt.groupBy("bucket").agg(F.sum("cnt").alias("m_cnt"))
    whole = rows.groupBy("bucket").agg(F.count("*").alias("w_cnt"))
    diff = merged.join(whole, ["bucket"], "full").select(
        (F.abs(F.coalesce("m_cnt", F.lit(0))
               - F.coalesce("w_cnt", F.lit(0)))).alias("d")
    )
    return diff.groupBy().agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("d").cast("long").alias("max_abs_diff"),
        (F.max("d") == 0).alias("merge_lossless"),
    )


def hdr_quantiles_sql(value_sql: str, qs: tuple = (0.5, 0.9, 0.99),
                      group_sql: str | None = None,
                      sub_bits: int = _HDR_SUB_BITS,
                      table: str = "documents") -> str:
    """DuckDB twin of hdr_quantiles — emitted from the same (qs,
    sub_bits) arguments; bucket math is the identical integer/bin()
    expression, so there is no rounding gate anywhere."""
    m = 1 << sub_bits
    g = f"{group_sql} AS grp, " if group_sql else ""
    gcol = "grp, " if group_sql else ""
    part = "PARTITION BY grp " if group_sql else ""
    sel_q = []
    for q in qs:
        sel_q.append(f"""
      SELECT {gcol}CAST({float(q)!r} AS DOUBLE) AS q,
             CASE WHEN bucket < {m} THEN bucket
                  ELSE ((bucket % {m}) + {m})
                       * CAST(power(2, (bucket // {m}) - {sub_bits})
                              AS BIGINT) END AS est,
             CAST(total AS BIGINT) AS n_rows
      FROM cum
      WHERE cum >= ceil(total * {float(q)!r})
        AND cum - cnt < ceil(total * {float(q)!r})""")
    u = "\n      UNION ALL\n".join(sel_q)
    return f"""
    WITH vals AS (SELECT {g}CAST(trunc({value_sql}) AS BIGINT) AS v
                  FROM {table}),
    b AS (
      SELECT {gcol}CASE WHEN v IS NULL OR v < 1 THEN -1
                  WHEN v < {m} THEN v
                  ELSE (length(bin(v)) - 1) * {m}
                       + ((v >> (length(bin(v)) - 1 - {sub_bits})) & {m - 1})
             END AS bucket
      FROM vals
    ),
    sk AS (SELECT {gcol}bucket, count(*) AS cnt FROM b GROUP BY {gcol}bucket),
    cum AS (
      SELECT {gcol}bucket, cnt,
             sum(cnt) OVER ({part}ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER ({part.rstrip() or ""}) AS total
      FROM sk
    )
    SELECT * FROM ({u})
    ORDER BY {gcol}q
    """


# ===========================================================================
# KMV (K-minimum-values) distinct sketch — Bar-Yossef et al. 2002 /
# Beyer et al. 2007 ("On synopses for distinct-value estimation under
# multiset operations", SIGMOD'07). The set-OPERATION member of the
# sketch family: HLL answers |A| and |A u B| (register max-merge) but
# cannot answer |A n B| or Jaccard without the inclusion-exclusion
# blowup; a KMV synopsis supports union, intersection and Jaccard
# directly, which is what a crawl operator actually asks ("how much of
# snapshot N+1 did we already have in snapshot N?") without joining two
# 10^12-row url sets.
#
# Determinism contract (same as the HLL/CM families): the sketch is the
# k smallest DISTINCT 60-bit integer hashes per group, hash = first 15
# md5 hex chars of the key text — 60 bits fits a signed long in both
# engines with no 64-bit parse, and every comparison up to the final
# estimator divide is INTEGER-exact, so the DuckDB twin reproduces the
# sketch bit-for-bit regardless of partitioning. 60 bits puts the
# birthday bound near 2^30 sketch collisions only past ~10^9 *sampled*
# values (k, not n, values are retained) — the estimator degrades only
# if two of the k minima collide, vanishingly rare for k <= 4096.
#
# Estimator: with U_(k) the k-th smallest hash normalized to (0,1],
# D_hat = (k-1)/U_(k) (unbiased; relative error ~ 1/sqrt(k-2), so
# k=256 gives ~6%). When a group holds FEWER than k distinct hashes the
# sketch is the whole set and the count is exact — the small-range
# regime needs no bias correction at all.
#
# Scale shape: one distinct on (group, hash) — the only |data|-sized
# shuffle, map-side partial — then a rank<=k filter that Spark plans as
# WindowGroupLimit (partial per-partition top-k BEFORE the shuffle, the
# same physical shape frontier_next's per-host top-k rides). The sketch
# itself is k rows per group; every set operation after that (merge =
# k-smallest-of-union, intersect membership) runs on k-sized inputs.
_KMV_SCALE = 1 << 60  # hash domain size: 15 md5 hex chars


def _h60(col: F.Column) -> F.Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5(key). DuckDB
    twin: ('0x' || substr(md5(key), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(df: DataFrame, key_col: str, group_col: str,
               k: int = 256) -> DataFrame:
    """(group, h, rnk) rows: the k smallest distinct 60-bit key hashes
    per group, rnk in [1, k]. Null keys ignored (module convention)."""
    dist = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(group_col).alias("group"),
            _h60(F.col(key_col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("group").orderBy("h")
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _kmv_estimate(kth: F.Column, n_hashes: F.Column, k: int) -> F.Column:
    """KMV estimate from the sketch's max hash and row count: exact when
    the group holds < k distinct keys (the sketch IS the set), else
    (k-1) * 2^60 / kth. (k-1)*2^60 is a <=68-bit integer with <=12
    significant bits — exactly representable as a double — so the single
    divide is the only rounded op, correctly-rounded identically in both
    engines."""
    return F.when(
        n_hashes < k, n_hashes.cast("double")
    ).otherwise(
        F.lit(float(k - 1) * float(_KMV_SCALE)) / kth.cast("double")
    )


def kmv_distinct(df: DataFrame, key_col: str, group_col: str,
                 k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate from a k=``k`` KMV sketch:
    (group, n_hashes, est_distinct) ordered by group. est rounded 4 dp."""
    sk = kmv_sketch(df, key_col, group_col, k)
    agg = sk.groupBy("group").agg(
        F.count("*").alias("n_hashes"), F.max("h").alias("kth")
    )
    return agg.select(
        "group",
        "n_hashes",
        round_he(
            _kmv_estimate(F.col("kth"), F.col("n_hashes"), k), 4
        ).alias("est_distinct"),
    ).orderBy("group")


def kmv_merge(df: DataFrame, key_col: str, shard_col: str,
              k: int = 256) -> DataFrame:
    """Mergeability as a driver-visible invariant (the hll_merge /
    cm_merge pattern): per-shard KMV sketches merged by
    k-smallest-of-union must equal the whole-stream sketch — KMV's merge
    is closed because the k global minima are always among the per-shard
    minima. Returns one row: (est_merged, est_whole, n_shards,
    sketches_equal) where sketches_equal (1/0 — INT, the gate convention
    for flags) tests hash-set symmetric difference == 0: bit-identical
    sketches, not just close estimates."""
    per_shard = kmv_sketch(df, key_col, shard_col, k).select("h").distinct()
    w = Window.orderBy("h")
    merged = (
        per_shard.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    whole = kmv_sketch(
        df.select(F.col(key_col), F.lit("all").alias("_g")),
        key_col, "_g", k,
    ).select("h", "rnk")
    m_agg = merged.agg(
        F.count("*").alias("n_m"), F.max("h").alias("kth_m")
    )
    w_agg = whole.agg(
        F.count("*").alias("n_w"), F.max("h").alias("kth_w")
    )
    diff = (
        merged.select("h").unionByName(whole.select("h"))
        .groupBy("h").agg(F.count("*").alias("c"))
        .filter(F.col("c") != 2)
        .agg(F.count("*").alias("n_diff"))
    )
    # countDistinct (not .distinct().count()): ignores a NULL shard the
    # way the twin's count(DISTINCT ..) does.
    n_shards = df.agg(F.countDistinct(shard_col).alias("n_shards"))
    return (
        m_agg.crossJoin(w_agg).crossJoin(diff).crossJoin(n_shards)
        .select(
            round_he(_kmv_estimate(F.col("kth_m"), F.col("n_m"), k), 4)
            .alias("est_merged"),
            round_he(_kmv_estimate(F.col("kth_w"), F.col("n_w"), k), 4)
            .alias("est_whole"),
            F.col("n_shards"),
            (F.col("n_diff") == 0).cast("int").alias("sketches_equal"),
        )
    )


def kmv_overlap(a: DataFrame, b: DataFrame, key_col: str,
                k: int = 256) -> DataFrame:
    """Set-operation estimates between two keyed relations from their
    KMV sketches (Beyer et al. 2007 section 4): one row with
    est_a, est_b, est_union, est_intersection, jaccard_est.

    Method: sketch each side (k rows each); L = the k smallest hashes of
    the sketch UNION (a valid KMV sketch of A u B by closure under
    union); rho = |L n K_A n K_B| / |L| estimates Jaccard;
    |A n B|_hat = rho * |A u B|_hat. When the union sketch holds fewer
    than k hashes every quantity is EXACT (both sets fit the synopsis).
    All set logic is integer equality on 60-bit hashes — cross-engine
    deterministic; the only rounded ops are the final estimator divides.

    Scale shape: each side pays one distinct + WindowGroupLimit top-k;
    everything after runs on <= 2k rows (a full outer join on h and one
    global top-k over 2k rows — driver-trivial but kept in-plan)."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return kmv_sketch(
            df.select(F.col(key_col), F.lit(tag).alias("_g")),
            key_col, "_g", k,
        ).select("h", F.lit(True).alias(f"in_{tag}"))

    sa, sb = side(a, "a"), side(b, "b")
    both = sa.join(sb, "h", "full_outer").select(
        "h",
        F.coalesce("in_a", F.lit(False)).alias("in_a"),
        F.coalesce("in_b", F.lit(False)).alias("in_b"),
    )
    w = Window.orderBy("h")
    sketch_l = (
        both.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    stats = sketch_l.agg(
        F.count("*").alias("n_l"),
        F.max("h").alias("kth_l"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("n_common"),
    )
    side_stats = sa.agg(
        F.count("*").alias("n_a"), F.max("h").alias("kth_a")
    ).crossJoin(
        sb.agg(F.count("*").alias("n_b"), F.max("h").alias("kth_b"))
    )
    est_union = _kmv_estimate(F.col("kth_l"), F.col("n_l"), k)
    jac = F.col("n_common").cast("double") / F.col("n_l").cast("double")
    return stats.crossJoin(side_stats).select(
        round_he(_kmv_estimate(F.col("kth_a"), F.col("n_a"), k), 4)
        .alias("est_a"),
        round_he(_kmv_estimate(F.col("kth_b"), F.col("n_b"), k), 4)
        .alias("est_b"),
        round_he(est_union, 4).alias("est_union"),
        round_he(jac * est_union, 4).alias("est_intersection"),
        round_he(jac, 4).alias("jaccard_est"),
    )


# --- KMV DuckDB twin emitters: the oracle SQL is generated from the SAME
# k / hash-width / estimator constants as the Spark plan (the cm_hh_sql /
# hll64_branch_sql discipline), so geometry and estimator form cannot
# drift between engines.

def kmv_hash_sql(key_sql: str) -> str:
    return f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT"


def kmv_est_sql(n_sql: str, kth_sql: str, k: int) -> str:
    scale = repr(float((k - 1) * _KMV_SCALE))
    return (f"CASE WHEN {n_sql} < {k} THEN CAST({n_sql} AS DOUBLE) "
            f"ELSE {scale} / CAST({kth_sql} AS DOUBLE) END")


def kmv_distinct_sql(src: str, key_sql: str, grp_sql: str,
                     k: int = 256) -> str:
    """DuckDB twin of kmv_distinct over source body ``src``."""
    est = kmv_est_sql("n_hashes", "kth", k)
    return f"""
    WITH dist AS (
      SELECT DISTINCT {grp_sql} AS grp, {kmv_hash_sql(key_sql)} AS h
      FROM ({src}) WHERE {key_sql} IS NOT NULL
    ),
    sk AS (SELECT grp, h,
                  row_number() OVER (PARTITION BY grp ORDER BY h) AS rnk
           FROM dist),
    agg AS (SELECT grp, count(*) AS n_hashes, max(h) AS kth
            FROM sk WHERE rnk <= {k} GROUP BY grp)
    SELECT grp AS "group", n_hashes,
           floor(({est}) * 1e4 + 0.5) / 1e4 AS est_distinct
    FROM agg ORDER BY "group"
    """


def kmv_merge_sql(src: str, key_sql: str, shard_sql: str,
                  k: int = 256) -> str:
    """DuckDB twin of kmv_merge over source body ``src``."""
    est_m = kmv_est_sql("n_m", "kth_m", k)
    est_w = kmv_est_sql("n_w", "kth_w", k)
    return f"""
    WITH dist AS (
      SELECT DISTINCT {shard_sql} AS grp, {kmv_hash_sql(key_sql)} AS h
      FROM ({src}) WHERE {key_sql} IS NOT NULL
    ),
    shard_sk AS (SELECT grp, h,
                        row_number() OVER (PARTITION BY grp ORDER BY h)
                          AS rnk
                 FROM dist),
    pooled AS (SELECT DISTINCT h FROM shard_sk WHERE rnk <= {k}),
    merged AS (SELECT h FROM (
                 SELECT h, row_number() OVER (ORDER BY h) AS rnk
                 FROM pooled) WHERE rnk <= {k}),
    whole0 AS (SELECT DISTINCT h FROM dist),
    whole AS (SELECT h FROM (
                SELECT h, row_number() OVER (ORDER BY h) AS rnk
                FROM whole0) WHERE rnk <= {k}),
    m_agg AS (SELECT count(*) AS n_m, max(h) AS kth_m FROM merged),
    w_agg AS (SELECT count(*) AS n_w, max(h) AS kth_w FROM whole),
    diff AS (SELECT count(*) AS n_diff FROM (
               SELECT h, count(*) AS c FROM (
                 SELECT h FROM merged UNION ALL SELECT h FROM whole)
               GROUP BY h) WHERE c <> 2),
    ns AS (SELECT count(DISTINCT {shard_sql}) AS n_shards FROM ({src}))
    SELECT floor(({est_m}) * 1e4 + 0.5) / 1e4 AS est_merged,
           floor(({est_w}) * 1e4 + 0.5) / 1e4 AS est_whole,
           n_shards,
           CAST(n_diff = 0 AS INT) AS sketches_equal
    FROM m_agg CROSS JOIN w_agg CROSS JOIN diff CROSS JOIN ns
    """


def kmv_overlap_sql(a_src: str, b_src: str, key_sql: str,
                    k: int = 256) -> str:
    """DuckDB twin of kmv_overlap over side bodies ``a_src`` / ``b_src``."""
    est_a = kmv_est_sql("n_a", "kth_a", k)
    est_b = kmv_est_sql("n_b", "kth_b", k)
    est_u = kmv_est_sql("n_l", "kth_l", k)
    jac = "CAST(n_common AS DOUBLE) / CAST(n_l AS DOUBLE)"
    return f"""
    WITH da AS (SELECT DISTINCT {kmv_hash_sql(key_sql)} AS h
                FROM ({a_src}) WHERE {key_sql} IS NOT NULL),
    sa AS (SELECT h FROM (
             SELECT h, row_number() OVER (ORDER BY h) AS rnk FROM da)
           WHERE rnk <= {k}),
    db AS (SELECT DISTINCT {kmv_hash_sql(key_sql)} AS h
           FROM ({b_src}) WHERE {key_sql} IS NOT NULL),
    sb AS (SELECT h FROM (
             SELECT h, row_number() OVER (ORDER BY h) AS rnk FROM db)
           WHERE rnk <= {k}),
    ab AS (
      SELECT coalesce(sa.h, sb.h) AS h,
             sa.h IS NOT NULL AS in_a, sb.h IS NOT NULL AS in_b
      FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
    ),
    l AS (SELECT h, in_a, in_b FROM (
            SELECT *, row_number() OVER (ORDER BY h) AS rnk FROM ab)
          WHERE rnk <= {k}),
    stats AS (SELECT count(*) AS n_l, max(h) AS kth_l,
                     sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                       AS n_common
              FROM l),
    sides AS (SELECT (SELECT count(*) FROM sa) AS n_a,
                     (SELECT max(h) FROM sa) AS kth_a,
                     (SELECT count(*) FROM sb) AS n_b,
                     (SELECT max(h) FROM sb) AS kth_b)
    SELECT floor(({est_a}) * 1e4 + 0.5) / 1e4 AS est_a,
           floor(({est_b}) * 1e4 + 0.5) / 1e4 AS est_b,
           floor(({est_u}) * 1e4 + 0.5) / 1e4 AS est_union,
           floor((({jac}) * ({est_u})) * 1e4 + 0.5) / 1e4
             AS est_intersection,
           floor(({jac}) * 1e4 + 0.5) / 1e4 AS jaccard_est
    FROM stats CROSS JOIN sides
    """


# ---------------------------------------------------------------------------
# Bloom filter: the MEMBERSHIP member of the sketch family (HLL =
# cardinality, Count-Min = frequency, KMV = set operations, HDR =
# distribution). The crawl-side use case is the standing-corpus
# admission check: "have we fetched this url before?" over 10^12 urls
# is a 10^12-row anti-join per crawl batch if done exactly, or a
# fixed-m-bit sketch probe if done with Bloom (dedup.incremental_dedup
# already uses the same construction inline as its pre-filter; this is
# the standalone, mergeable, oracle-checked form with the FP/FN
# accounting made driver-visible).
#
# Reference parity: the reference engine keeps no corpus state at all
# (one file in, one result out — `ocr_cezam.py:63-64`); membership
# sketches are a pure 100 TB-side addition.
#
# Determinism: bit positions are md5-derived (salted per hash row,
# same `bf{i}:` convention as Count-Min's `cm{i}:`), so both engines
# set the exact same bits and the driver's hash gate applies to the
# false-positive COUNT itself, not just rates. Null keys are IGNORED
# (module convention, see module docstring).
#
# Scale shape, by construction:
# - The sketch is the DISTINCT set-bit table: <= m_bits rows (bounded
#   by geometry, not data), built by ONE posexplode + distinct — the
#   mergeable artifact a per-day crawl keeps (merge = set union,
#   i.e. bitwise OR).
# - Probing is an equi-join of probe-key bit positions against those
#   <= m_bits rows, then a per-key count — no all-pairs, no driver
#   collect.
# - Geometry (m_bits, k) is parameterized and flows into the emitted
#   DuckDB twins; size it as m ~ -n ln(p_fp) / (ln 2)^2, k ~ (m/n) ln 2.
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # default bits
_BLOOM_K = 5     # default hash rows


def _bloom_positions(col: F.Column, m_bits: int, k: int) -> F.Column:
    """Array of the k salted md5 bit positions for a key — identical
    math to the DuckDB twin's `bf{i}:` hashes."""
    return F.array(*[
        (_h32(col, f"bf{i}:") % m_bits) for i in range(k)
    ])


def bloom_bits(df: DataFrame, key_col: str,
               m_bits: int = _BLOOM_M, k: int = _BLOOM_K) -> DataFrame:
    """The Bloom sketch itself: the distinct set-bit table (bit,) —
    <= m_bits rows regardless of input size. One projection + one
    distinct aggregation (map-side partial)."""
    df = df.filter(F.col(key_col).isNotNull())
    return (
        df.select(
            F.explode(_bloom_positions(F.col(key_col), m_bits, k))
            .alias("bit")
        )
        .distinct()
    )


def bloom_membership(build_df: DataFrame, build_col: str,
                     probe_df: DataFrame, probe_col: str,
                     m_bits: int = _BLOOM_M,
                     k: int = _BLOOM_K) -> DataFrame:
    """Probe a key set against a Bloom filter built over another,
    with exact membership alongside so the sketch's error behavior is
    itself the checked output.

    Output: ONE row —
      n_build (distinct build keys), n_bits_set,
      n_probes (distinct probe keys), n_members (exact),
      n_hits (bloom positive), n_false_pos (hit but not member),
      no_false_negatives (THE Bloom guarantee, in-plan driver-visible),
      fp_rate (false positives / non-members, 4 dp),
      theory_fp ((1 - (1-1/m)^(k*n_build))^k, 4 dp — the exact
      expected-FP formula, not the e^-kn/m approximation, so small
      fixtures don't straddle the approximation gap).

    Plan: the <= m_bits-row bit table left-joins the probe keys'
    exploded positions (bit match flag), one per-key count-of-matches
    == k gives the bloom verdict; exact membership is a left-semi-ish
    join on the key itself; both reduce to one summary row. The
    probe-side exact check is test-scale instrumentation — at 100 TB
    you keep only the probe verdicts.
    """
    build_keys = (
        build_df.filter(F.col(build_col).isNotNull())
        .select(F.col(build_col).cast("string").alias("bkey"))
        .distinct()
    )
    probe_keys = (
        probe_df.filter(F.col(probe_col).isNotNull())
        .select(F.col(probe_col).cast("string").alias("pkey"))
        .distinct()
    )
    bits = bloom_bits(build_keys, "bkey", m_bits, k)
    probes = probe_keys.select(
        "pkey",
        F.explode(_bloom_positions(F.col("pkey"), m_bits, k))
        .alias("bit"),
    )
    hits = (
        probes.join(bits.withColumn("set_", F.lit(1)), "bit", "left")
        .groupBy("pkey")
        .agg((F.count("set_") == k).alias("bloom_hit"))
    )
    member = build_keys.select(
        F.col("bkey").alias("pkey"), F.lit(True).alias("is_member")
    )
    verdicts = hits.join(member, "pkey", "left").select(
        "pkey", "bloom_hit",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    n_build = build_keys.groupBy().agg(F.count("*").alias("n_build"))
    n_bits = bits.groupBy().agg(F.count("*").alias("n_bits_set"))
    summary = verdicts.groupBy().agg(
        F.count("*").alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("n_members"),
        F.sum(F.col("bloom_hit").cast("long")).alias("n_hits"),
        F.sum((F.col("bloom_hit") & ~F.col("is_member")).cast("long"))
        .alias("n_false_pos"),
        (F.sum((F.col("is_member") & ~F.col("bloom_hit")).cast("long"))
         == 0).alias("no_false_negatives"),
    )
    theory = F.pow(
        F.lit(1.0) - F.pow(F.lit(1.0 - 1.0 / m_bits),
                           F.col("n_build").cast("double") * k),
        F.lit(float(k)),
    )
    return (
        summary.crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_build", "n_bits_set", "n_probes", "n_members", "n_hits",
            "n_false_pos", "no_false_negatives",
            round_he(
                F.col("n_false_pos").cast("double")
                / F.greatest(F.col("n_probes") - F.col("n_members"),
                             F.lit(1)).cast("double"),
                4,
            ).alias("fp_rate"),
            round_he(theory, 4).alias("theory_fp"),
        )
    )


def bloom_merge(df: DataFrame, key_col: str, shard_col: str,
                m_bits: int = _BLOOM_M, k: int = _BLOOM_K) -> DataFrame:
    """Bloom mergeability: per-shard bit sets UNION-merged (bitwise OR)
    must equal the whole-stream bit set — the property that lets a
    crawl keep one filter per day and admit against their union
    without replay. Output: ONE row (n_bits_merged, n_bits_whole,
    merge_lossless) with the invariant computed in-plan via a full
    join of the two <= m_bits-row bit tables."""
    df = df.filter(F.col(key_col).isNotNull())
    rows = df.select(
        F.col(shard_col).alias("shard"),
        F.explode(_bloom_positions(F.col(key_col), m_bits, k))
        .alias("bit"),
    )
    shard_bits = rows.select("shard", "bit").distinct()
    merged = shard_bits.select("bit").distinct()
    whole = rows.select("bit").distinct()
    diff = merged.withColumn("m_", F.lit(1)).join(
        whole.withColumn("w_", F.lit(1)), "bit", "full"
    ).select(
        (F.col("m_").isNull() | F.col("w_").isNull())
        .cast("long").alias("miss")
    )
    return diff.groupBy().agg(
        F.sum(F.lit(1) - F.col("miss")).cast("long").alias("n_bits_both"),
        F.count("*").cast("long").alias("n_bits_union"),
        (F.sum("miss") == 0).alias("merge_lossless"),
    )


def _bloom_pos_sql(key_sql: str, m_bits: int, k: int) -> str:
    """Inline per-(key, i) bit position — the twin of
    `_bloom_positions`, over a `dims(i)` range join."""
    return ("CAST(concat('0x', substring(md5("
            f"'bf' || CAST(i AS VARCHAR) || ':' || {key_sql}"
            f"), 1, 8)) AS BIGINT) % {m_bits}")


def bloom_membership_sql(build_sql: str, probe_sql: str,
                         m_bits: int = _BLOOM_M,
                         k: int = _BLOOM_K) -> str:
    """DuckDB twin of bloom_membership — emitted from the same
    (m_bits, k) geometry. `build_sql` / `probe_sql` are full queries
    yielding one `key` column each."""
    pos = _bloom_pos_sql("key", m_bits, k)
    return f"""
    WITH build AS (SELECT DISTINCT key FROM ({build_sql})
                   WHERE key IS NOT NULL),
    probe AS (SELECT DISTINCT key FROM ({probe_sql})
              WHERE key IS NOT NULL),
    dims AS (SELECT unnest(range({k})) AS i),
    bits AS (SELECT DISTINCT {pos} AS bit FROM build, dims),
    probes AS (SELECT key, {pos} AS bit FROM probe, dims),
    hits AS (
      SELECT p.key, count(b.bit) = {k} AS bloom_hit
      FROM probes p LEFT JOIN bits b USING (bit) GROUP BY p.key
    ),
    verdicts AS (
      SELECT h.key, h.bloom_hit, b.key IS NOT NULL AS is_member
      FROM hits h LEFT JOIN build b USING (key)
    ),
    nb AS (SELECT count(*) AS n_build FROM build),
    nbits AS (SELECT count(*) AS n_bits_set FROM bits),
    summary AS (
      SELECT count(*) AS n_probes,
             sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS n_members,
             sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS n_hits,
             sum(CASE WHEN bloom_hit AND NOT is_member
                      THEN 1 ELSE 0 END) AS n_false_pos,
             sum(CASE WHEN is_member AND NOT bloom_hit
                      THEN 1 ELSE 0 END) = 0 AS no_false_negatives
      FROM verdicts
    )
    SELECT CAST(n_build AS BIGINT) AS n_build,
           CAST(n_bits_set AS BIGINT) AS n_bits_set,
           CAST(n_probes AS BIGINT) AS n_probes,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_false_pos AS BIGINT) AS n_false_pos,
           no_false_negatives,
           floor((CAST(n_false_pos AS DOUBLE)
                  / greatest(n_probes - n_members, 1)) * 1e4 + 0.5) / 1e4
             AS fp_rate,
           floor(power(1.0 - power({1.0 - 1.0 / m_bits!r},
                                   CAST(n_build AS DOUBLE) * {k}),
                       {float(k)!r}) * 1e4 + 0.5) / 1e4 AS theory_fp
    FROM summary, nb, nbits
    """


def bloom_merge_sql(src_sql: str, m_bits: int = _BLOOM_M,
                    k: int = _BLOOM_K) -> str:
    """DuckDB twin of bloom_merge. `src_sql` yields (key, shard)."""
    pos = _bloom_pos_sql("key", m_bits, k)
    return f"""
    WITH rows AS (SELECT key, shard FROM ({src_sql})
                  WHERE key IS NOT NULL),
    dims AS (SELECT unnest(range({k})) AS i),
    sb AS (SELECT DISTINCT shard, {pos} AS bit FROM rows, dims),
    merged AS (SELECT DISTINCT bit FROM sb),
    whole AS (SELECT DISTINCT {pos} AS bit FROM rows, dims),
    diff AS (
      SELECT CASE WHEN m.bit IS NULL OR w.bit IS NULL
                  THEN 1 ELSE 0 END AS miss
      FROM merged m FULL JOIN whole w USING (bit)
    )
    SELECT CAST(sum(1 - miss) AS BIGINT) AS n_bits_both,
           CAST(count(*) AS BIGINT) AS n_bits_union,
           sum(miss) = 0 AS merge_lossless
    FROM diff
    """
