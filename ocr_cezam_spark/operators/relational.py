"""Native-Spark relational operators (SURVEY.md section 2.4-2.8 mappings).

Each function is the idiomatic Catalyst-friendly form of a reference
operator: hash aggregation with partial/final phases, window functions,
broadcast joins — no UDFs anywhere in this module, so every expression
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ocr_cezam_spark.functions.numeric import round_he


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """A1 analog (credit/debit sums, releve_bancaire.py:215-222) in its
    classic columnar form: filtered multi-measure hash aggregation."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_he(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_he(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_he(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_customers(orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """O5 top-k (tables ranked by size, releve_bancaire.py:147) + broadcast
    dim join: aggregate the fact, rank, then join the small side broadcast."""
    rev = orders.groupBy("o_custkey").agg(
        round_he(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k
    # + driver merge of k rows) — a global row_number window would funnel
    # every customer through one partition at scale.
    topk = rev.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))  # k rows only
    top = topk.withColumn("rank", F.row_number().over(w).cast("long"))
    return (
        top.join(F.broadcast(customer), top.o_custkey == customer.c_custkey)
        .select("rank", "o_custkey", "c_name", "revenue", "n_orders")
        .orderBy("rank")
    )


def region_rollup(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """J-row broadcast dimension joins (bank-id lookup shape,
    process_fields.py:11-23): two tiny dims broadcast onto the fact."""
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            # floor(x*100+0.5)/100, NOT F.round: Spark rounds the SHORTEST
            # DECIMAL repr of the double (HALF_UP) while DuckDB rounds the
            # binary value, so an exact-midpoint average (x.315 stored as
            # x.31499..) rounds differently per engine; the floor form
            # applies identical IEEE ops on both sides
            (F.floor(F.avg("c_acctbal") * 100 + F.lit(0.5)) / 100)
            .alias("avg_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


def running_balance(orders: DataFrame) -> DataFrame:
    """W2 rows-between analog (releve_bancaire.py:212-213): running sum per
    customer in date order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        round_he(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """A5/W3 distinct-with-tolerance clustering (process_table.py:120-127,
    136-159): lag + threshold flag + running sum -> cluster id. The
    reference clusters boxes on the y-axis; here the axis is time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives as TIMESTAMP_NTZ from parquet; cast via TIMESTAMP (session
    # tz is pinned to UTC) to get epoch seconds, matching DuckDB's epoch().
    epoch = F.col("ts").cast("timestamp").cast("long")
    flagged = events.withColumn(
        "new_session",
        F.when(epoch - F.lag(epoch).over(w) > gap_seconds, 1).otherwise(0),
    )
    with_id = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            round_he(F.sum("value"), 2).alias("session_value"),
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """W4 lookahead analog (address continuation, process_fields.py:26-33):
    lead() over an ordered window, then count transitions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


def union_by_arity(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """U1 union-by-column-count (releve_bancaire.py:137-145): same-arity
    relations coerced to the first member's column names, then unioned."""
    a = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        F.lit("orders").alias("src"),
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").alias("v"),
        F.lit("lineitem").alias("src"),
    )
    return (
        a.unionByName(b)
        .groupBy("src")
        .agg(
            F.count("*").alias("n_rows"),
            round_he(F.sum("v"), 2).alias("total_v"),
        )
        .orderBy("src")
    )


def code_semijoin_lead(lineitem: DataFrame, spark) -> DataFrame:
    """J4 fiscal-code semi-join analog (bilan.py:166-187): rows whose value
    hits a small static code list emit the code plus the *following* cell,
    fetched positionally with lead() within the row group."""
    codes = spark.createDataFrame([(10,), (20,), (30,)], "code int")
    # (l_orderkey, l_linenumber) alone is not unique in the synthetic data —
    # extend the ordering until total so lead() is deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_extendedprice"
    )
    with_next = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty"),
        round_he(F.lead("l_extendedprice").over(w), 2).alias("next_price"),
    )
    return (
        with_next.join(F.broadcast(codes), with_next.qty == codes.code)
        .filter(F.col("next_price").isNotNull())
        .select("l_orderkey", "l_linenumber", "code", "next_price")
    )


def value_bucket_join(events: DataFrame, spark) -> DataFrame:
    """J6 containment/theta join (store_boxes_to_tables,
    process_table.py:73-95): assign each row to the interval containing it.
    Small interval dim -> broadcast nested-loop join."""
    buckets = spark.createDataFrame(
        [(i, float(i * 10), float((i + 1) * 10)) for i in range(10)],
        "bucket_id int, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(buckets),
            (events.value >= buckets.lo) & (events.value < buckets.hi),
        )
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_events"),
            round_he(F.avg("value"), 2).alias("avg_value"),
        )
        .orderBy("bucket_id")
    )


def statement_reconciliation(orders: DataFrame) -> DataFrame:
    """A2 check_solde flagship (releve_bancaire.py:172-231) over a derived
    statement: per customer, debit rows = 'F' orders, credit rows =
    non-'F'; a reported closing balance is corrupted for custkey%10==0 and
    the reconciler must recompute and emit the verdict."""
    opening = F.lit(1000.0)
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)).alias("deb"),
        F.sum(F.when(F.col("o_orderstatus") != "F", F.col("o_totalprice")).otherwise(0.0)).alias("cred"),
        F.count("*").alias("n_rows"),
    )
    computed = round_he(opening + F.col("deb") - F.col("cred"), 2)
    reported = round_he(
        opening
        + F.col("deb")
        - F.col("cred")
        + F.when(F.col("o_custkey") % 10 == 0, 7.77).otherwise(0.0),
        2,
    )
    return per_cust.select(
        "o_custkey",
        "n_rows",
        computed.alias("computed_closing"),
        reported.alias("reported_closing"),
        F.when(computed == reported, "Success").otherwise("Error").alias("verdict"),
    )


def line_grouping(documents: DataFrame, separator: str = "the") -> DataFrame:
    """W1 OCR line grouping (process_text, utils/utils.py:47-72): a flat
    token stream splits into lines at separator tokens via a running
    window sum — the relational form of the reference's fold."""
    toks = documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lines = toks.withColumn(
        "line_id",
        F.sum(F.when(F.col("word") == separator, 1).otherwise(0)).over(w),
    )
    return (
        lines.groupBy("doc_id", "line_id")
        .agg(F.count("*").alias("n_words"))
    )


def event_funnel(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered funnel completion — how many users performed step 1,
    then step 2 STRICTLY AFTER it, then step 3 after that, and so on
    (the earliest-completion semantics: each step binds to the
    earliest qualifying event after the previous step's binding; a
    user converts iff such a chain exists, which the greedy earliest
    chain decides correctly — if any chain exists the earliest one
    does).

    Plan: ONE window pass per user ordered by (ts, type): a running
    "furthest step completed so far" via a conditional cumulative max
    — step i's earliest completion is the first event of type step_i
    seen while the running level equals i-1. Expressed as an ordered
    per-user aggregation with min-binding timestamps computed in ONE
    groupBy via sequential F.aggregate over the sorted event array —
    per-user event lists are bounded (session-scale), the corpus never
    self-joins. Output: one row per funnel step — (step, event_type,
    n_users, conversion_frac 4 dp of step-1 users), ordered by step.

    Determinism: ties at equal ts order by event type string — stated,
    and identical in both engines via the array_sort struct order.
    """
    from ocr_cezam_spark.functions.numeric import round_he

    n = len(steps)
    if n < 2:
        raise ValueError("funnel needs >= 2 steps")
    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("u"),
        F.struct(F.col(ts_col).cast("timestamp").alias("ts"),
                 F.col(type_col).alias("t")).alias("e"),
    )
    per_user = ev.groupBy("u").agg(
        F.array_sort(F.collect_list("e")).alias("es")
    )
    # fold the sorted event list to the furthest step reached: level
    # advances when the next event's type equals the next step name
    step_arr = F.array(*[F.lit(s) for s in steps])
    level = F.aggregate(
        F.col("es"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < n) & (e["t"] == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    levels = per_user.select(level.alias("level"))
    counts = levels.groupBy().agg(*[
        F.sum((F.col("level") >= i).cast("long")).alias(f"n{i}")
        for i in range(1, n + 1)
    ])
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append(counts.select(
            F.lit(i).alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n{i}").alias("n_users"),
            round_he(F.col(f"n{i}").cast("double")
                     / F.greatest(F.col("n1"), F.lit(1)).cast("double"),
                     4).alias("conversion_frac"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")



def asof_join(left: DataFrame, right: DataFrame, key: str,
              ts: str = "ts", how: str = "left") -> DataFrame:
    """Point-in-time (as-of) join: for each left row, attach the LATEST
    right row with ``right.ts <= left.ts`` in the same ``key`` group —
    pandas ``merge_asof`` 'backward' / DuckDB ``ASOF JOIN`` semantics.
    ``how='left'`` keeps unmatched left rows (right payload NULL),
    ``how='inner'`` drops them.

    Scale shape: Spark has no native as-of; a theta-join on
    ``l.ts >= r.ts`` degenerates to a per-key cross product (hot keys go
    quadratic, and the optimizer plans BroadcastNestedLoop for it). The
    linear form used here tags both inputs, unions them, and runs ONE
    running ``last(right_payload, ignoreNulls)`` window ordered by
    (ts, side, payload) — one shuffle on the key, one ordered scan,
    O(1) carried state per key, frames never look ahead so Spark's
    window operator streams it with spill. Right rows sharing (key, ts)
    resolve deterministically to the max payload struct (callers that
    need a different winner dedupe the right side first).

    Right payload columns come back with their own names plus
    ``matched_<ts>`` for the matched right timestamp — callers rename
    collisions before the join.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    rpay = [c for c in right.columns if c not in (key, ts)]
    rstruct = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c) for c in rpay]
    ).alias("__r")
    r_side = right.select(
        F.col(key), F.col(ts).alias("__t"), F.lit(0).alias("__side"),
        rstruct,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l_side = left.select(
        F.col(key), F.col(ts).alias("__t"), F.lit(1).alias("__side"),
        F.lit(None).cast(
            r_side.schema["__r"].dataType
        ).alias("__r"),
        *[F.col(c) for c in left.columns if c != key],
    )
    w = (
        Window.partitionBy(key)
        # right rows (side 0) sort BEFORE the left rows of the same ts —
        # 'right.ts <= left.ts' includes equality; equal-ts right rows
        # resolve by struct order (max payload wins, deterministic)
        .orderBy("__t", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        r_side.unionByName(l_side)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    return matched.select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        F.col("__m.__rts").alias(f"matched_{ts}"),
        *[F.col(f"__m.{c}").alias(c) for c in rpay],
    )
