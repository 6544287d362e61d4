"""A1-A11: the relational operator contract (SURVEY §2.7).

Each query is a thin, declarative DataFrame plan — Catalyst supplies partial
aggregation, predicate pushdown, broadcast selection, and AQE. Scale notes per
query document why the plan survives 100 TB / 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bioio_spark.queries.base import load, register


def _dec(col, prec=12, scale=2):
    """Money columns are exact 2-decimal quantities stored as doubles.
    Summing them as doubles is order-dependent (different partial-sum orders
    across engines land on different 9-sig-digit roundings); casting to
    DECIMAL makes every aggregate exact and bit-identical to the oracle."""
    return col.cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# A1: hash aggregate with partial+final (TPC-H Q1 shape).
# Scale: map-side partial agg reduces the shuffle to |groups| rows per
# partition (4 groups here); the l_shipdate filter pushes to the parquet scan.
# --------------------------------------------------------------------------
@register(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="A1 grouped aggregate, TPC-H Q1 style over lineitem",
)
def a1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    e = _dec(F.col("l_extendedprice"))
    d = _dec(F.col("l_discount"), 4, 2)
    t = _dec(F.col("l_tax"), 4, 2)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued doubles: sums are exact as-is
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(e).cast("double").alias("sum_base_price"),
            F.sum(e * (1 - d)).cast("double").alias("sum_disc_price"),
            F.sum(e * (1 - d) * (1 + t)).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (F.sum(e).cast("double") / n).alias("avg_price"),
            (F.sum(d).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# A2: distinct aggregation. Scale: Spark plans count(DISTINCT) as a two-phase
# expand+agg; for sketch-speed at 100 TB approx_count_distinct is the
# documented alternative (not oracle-checked — HLL is engine-specific).
# --------------------------------------------------------------------------
@register(
    "a2_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="A2 count-distinct per group over orders",
)
def a2_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A3: rollup (grouping sets). Scale: Spark's Expand operator multiplies rows
# by grouping-set count before the shuffle — acceptable because the aggregate
# is partial-ized; nation dim is broadcast.
# --------------------------------------------------------------------------
@register(
    "a3_rollup_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(nation, order_year)
    ORDER BY nation NULLS FIRST, order_year NULLS FIRST
    """,
    doc="A3 rollup over nation x order-year",
)
def a3_rollup_revenue(spark, sf_dir):
    o, c, n = load(spark, sf_dir, "orders", "customer", "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("order_year"),
                "o_totalprice")
    )
    return (
        joined.rollup("nation", "order_year")
        .agg(F.sum(_dec(F.col("o_totalprice"), 14, 2)).cast("double")
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("nation").asc_nulls_first(),
                 F.col("order_year").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# A4: top-k. Scale: Spark plans orderBy+limit as TakeOrderedAndProject —
# per-partition heaps then a driver merge of k rows; no global sort.
# --------------------------------------------------------------------------
@register(
    "a4_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="A4 top-k via TakeOrderedAndProject",
)
def a4_topk_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# A5: ranking window. Scale: partitioned by customer (high cardinality) —
# shuffles once on the partition key; deterministic tiebreak on orderkey.
# --------------------------------------------------------------------------
@register(
    "a5_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="A5 per-customer top-3 orders via ranking window",
)
def a5_window_rank(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# A6: analytic window with frames (running totals, lag/lead). Scale:
# partitioned by user_id; running frame is computed in a single pass per
# partition after one shuffle.
# --------------------------------------------------------------------------
@register(
    "a6_window_running",
    oracle="""
    SELECT event_id, user_id, value,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS running_total,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_value,
           first_value(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS first_value
    FROM events ORDER BY user_id, event_id
    """,
    doc="A6 running totals + lag/lead/first over events",
)
def a6_window_running(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select(
            "event_id", "user_id", "value",
            F.sum("value").over(running).alias("running_total"),
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.first("value").over(running).alias("first_value"))
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# A7: set operations with SQL DISTINCT semantics.
# --------------------------------------------------------------------------
@register(
    "a7_set_ops",
    oracle="""
    WITH big_building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ),
    rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
    SELECT c_custkey, 'both' AS membership FROM big_building
    INTERSECT
    SELECT c_custkey, 'both' AS membership FROM rich
    UNION ALL
    (SELECT c_custkey, 'only_segment' AS membership FROM big_building
     EXCEPT
     SELECT c_custkey, 'only_segment' AS membership FROM rich)
    ORDER BY membership, c_custkey
    """,
    doc="A7 union/intersect/except over customer splits",
)
def a7_set_ops(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    seg = (
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        .union(c.filter(F.col("c_mktsegment") == "MACHINERY")
               .select("c_custkey"))
        .distinct()
    )
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    both = (seg.withColumn("membership", F.lit("both"))
            .intersect(rich.withColumn("membership", F.lit("both"))))
    only_seg = (seg.withColumn("membership", F.lit("only_segment"))
                .exceptAll(rich.withColumn("membership",
                                           F.lit("only_segment")))
                .distinct())
    return both.unionAll(only_seg).orderBy("membership", "c_custkey")


# --------------------------------------------------------------------------
# A8: multi-way equi-join (TPC-H Q3 shape). Scale: customer filter reduces
# the build side before the orders join; lineitem joins shuffle on orderkey.
# AQE picks broadcast for the filtered customer side automatically.
# --------------------------------------------------------------------------
@register(
    "a8_join_revenue",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, order_date
    ORDER BY revenue DESC, o.o_orderkey LIMIT 20
    """,
    doc="A8 shipping-priority join, TPC-H Q3 style",
)
def a8_join_revenue(spark, sf_dir):
    c, o, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(
            F.col("o_orderdate") < F.lit("2000-03-15 00:00:00").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(
            F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(_dec(F.col("l_extendedprice"))
                   * (1 - _dec(F.col("l_discount"), 4, 2)))
             .cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# A8b: broadcast dimension join chain (TPC-H Q5 shape) + semi/anti joins.
# Scale: the fact side shuffles ONCE (the orderkey join); before the custkey
# hop it re-aggregates to per-customer partials, so the second shuffle moves
# |customers| rows instead of |lineitem| joined rows. customer/nation/region
# are broadcast — dimension enrichment never repartitions the fact side.
# --------------------------------------------------------------------------
@register(
    "a8b_regional_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY region, nation
    ORDER BY region, nation
    """,
    doc="A8 broadcast dim chain, TPC-H Q5 style",
)
def a8b_regional_revenue(spark, sf_dir):
    r, n, c, o, li = load(spark, sf_dir, "region", "nation", "customer",
                          "orders", "lineitem")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"))
                   * (1 - _dec(F.col("l_discount"), 4, 2))).alias("rev"),
             F.count(F.lit(1)).alias("n_li")))
    return (
        per_cust
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"),
                 F.col("n_name").alias("nation"))
        .agg(F.sum("rev").cast("double").alias("revenue"),
             F.sum("n_li").alias("n_lineitems"))
        .orderBy("region", "nation")
    )


@register(
    "a8c_customers_without_orders",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_inactive
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY nation ORDER BY nation
    """,
    doc="A8 anti join: customers with no orders, per nation",
)
def a8c_customers_without_orders(spark, sf_dir):
    c, o, n = load(spark, sf_dir, "customer", "orders", "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# A9: range/theta join against a tiny band table. Scale: the band side is 6
# rows — Spark plans BroadcastNestedLoopJoin; the fact side never shuffles.
# --------------------------------------------------------------------------
@register(
    "a9_price_band_join",
    oracle="""
    WITH bands(band_id, lo, hi) AS (
      SELECT i AS band_id, i * 20000.0 AS lo, (i + 1) * 20000.0 AS hi
      FROM range(6) t(i)
    )
    SELECT b.band_id, count(*) AS n_items,
           sum(l.l_quantity) AS total_qty
    FROM lineitem l
    JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band_id ORDER BY b.band_id
    """,
    doc="A9 non-equi range join lineitem x price bands",
)
def a9_price_band_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    bands = (spark.range(6).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20000.0).alias("lo"),
        ((F.col("id") + 1) * 20000.0).alias("hi")))
    cond = (F.col("l_extendedprice") >= F.col("lo")) & \
           (F.col("l_extendedprice") < F.col("hi"))
    return (
        li.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum("l_quantity").alias("total_qty"))
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# A10: as-of join — nearest prior event per (customer, order date).
# Implementation: union-tag + last(ignoreNulls) running window, partitioned
# by key — the scalable pattern (one shuffle on the key, no range explosion).
# The oracle runs the *same* algorithm in SQL (DuckDB's native ASOF JOIN has
# nondeterministic tie handling; the window formulation pins semantics).
# --------------------------------------------------------------------------
@register(
    "a10_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id AS k, ts, event_id, value, NULL::BIGINT AS o_orderkey,
             0 AS tag
      FROM events
      UNION ALL
      SELECT o_custkey AS k, o_orderdate AS ts, NULL, NULL, o_orderkey, 1
      FROM orders
    ),
    filled AS (
      SELECT k, o_orderkey, tag,
             last_value(value IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY ts, tag, event_id
                ROWS UNBOUNDED PRECEDING) AS last_event_value
      FROM tagged
    )
    SELECT k AS custkey, o_orderkey, last_event_value
    FROM filled WHERE tag = 1
    ORDER BY custkey, o_orderkey
    """,
    doc="A10 as-of join: last event value at or before each order date",
)
def a10_asof_join(spark, sf_dir):
    e, o = load(spark, sf_dir, "events", "orders")
    tagged = (
        e.select(F.col("user_id").alias("k"), "ts", "event_id", "value",
                 F.lit(None).cast("long").alias("o_orderkey"),
                 F.lit(0).alias("tag"))
        .unionByName(
            o.select(F.col("o_custkey").alias("k"),
                     F.col("o_orderdate").alias("ts"),
                     F.lit(None).cast("long").alias("event_id"),
                     F.lit(None).cast("double").alias("value"),
                     "o_orderkey", F.lit(1).alias("tag")))
    )
    w = (Window.partitionBy("k").orderBy("ts", "tag", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        tagged.withColumn(
            "last_event_value", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(F.col("k").alias("custkey"), "o_orderkey",
                "last_event_value")
        .orderBy("custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# A11: scalar function surface — string / date / math / JSON built-ins.
# Scale: pure projection, whole-stage codegen, no shuffle.
# --------------------------------------------------------------------------
@register(
    "a11_scalar_functions",
    oracle="""
    SELECT event_id,
           upper(event_type) AS event_type_u,
           substr(event_type, 1, 3) AS event_type_3,
           concat(event_type, ':', CAST(user_id AS VARCHAR)) AS event_key,
           replace(event_type, 'e', '3') AS leeted,
           CAST(year(ts) AS INTEGER) AS yr,
           CAST(month(ts) AS INTEGER) AS mo,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
             AS days_in,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CAST(floor(value) AS BIGINT) AS value_floor,
           abs(value - 100.0) AS dist_from_100,
           length(event_type) AS type_len
    FROM events
    ORDER BY event_id
    """,
    doc="A11 scalar string/date/math/JSON functions over events",
)
def a11_scalar_functions(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.upper("event_type").alias("event_type_u"),
            F.substring("event_type", 1, 3).alias("event_type_3"),
            F.concat(F.col("event_type"), F.lit(":"),
                     F.col("user_id").cast("string")).alias("event_key"),
            F.regexp_replace("event_type", "e", "3").alias("leeted"),
            F.year("ts").cast("int").alias("yr"),
            F.month("ts").cast("int").alias("mo"),
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2024-01-01").cast("date")).alias("days_in"),
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
            F.floor("value").alias("value_floor"),
            F.abs(F.col("value") - 100.0).alias("dist_from_100"),
            F.length("event_type").alias("type_len"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# A1b: salted two-stage aggregation — the skew-mitigation pattern for hot
# group keys. Stage 1 aggregates on (key, salt) so a skewed key's rows spread
# over 16 reducers; stage 2 combines the 16 partials per key. At 100 TB a
# single hot key (think one dominant language or returnflag) would otherwise
# pin one reducer; salting caps per-task input at ~1/16th of the hot key.
# Counts/sums compose exactly, so the result is identical to the unsalted
# plan — which is exactly what the oracle checks.
# --------------------------------------------------------------------------
@register(
    "a1b_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_price,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="A1b salted two-stage aggregation (skew-safe, result-identical)",
)
def a1b_salted_skew_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.hash("l_orderkey"), F.lit(16)))
    partial = (
        salted.groupBy("l_returnflag", "salt")
        .agg(F.sum("l_quantity").alias("p_qty"),
             F.sum(_dec(F.col("l_extendedprice"))).alias("p_price"),
             F.count(F.lit(1)).alias("p_cnt")))
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("p_qty").alias("sum_qty"),
             F.sum("p_price").cast("double").alias("sum_price"),
             F.sum("p_cnt").alias("count_order"))
        .orderBy("l_returnflag"))


# --------------------------------------------------------------------------
# A3b: cube — all 2^k grouping-set combinations in one pass (Catalyst
# expands to a single Expand + hash aggregate; no per-set rescan).
# --------------------------------------------------------------------------
@register(
    "a3b_cube_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="A3b cube over order status x priority",
)
def a3b_cube_status(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(_dec(F.col("o_totalprice"), 14, 2)).cast("double")
             .alias("revenue"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# A2b: HLL approximate count-distinct — the 100 TB path for cardinality
# (constant memory per group vs a full distinct shuffle). Approximation has
# no exact oracle; instead BOTH engines' approximate counts are checked to
# be within rsd bounds of the exact count, and the exact count itself is
# the hash-checked column.
# --------------------------------------------------------------------------
@register(
    "a2b_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_custs
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="A2b HLL approx_count_distinct sanity-bounded against exact",
)
def a2b_approx_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    both = (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("exact_custs"),
             F.approx_count_distinct("o_custkey", rsd=0.05)
             .alias("approx_custs"))
    )
    # the approximate column is asserted in-plan (within 2 x rsd of exact;
    # HLL is deterministic for fixed data) and then dropped so the hashed
    # result is exact-deterministic
    checked = both.filter(
        (F.col("approx_custs") >= F.col("exact_custs") * 0.9)
        & (F.col("approx_custs") <= F.col("exact_custs") * 1.1))
    return checked.select("o_orderstatus", "exact_custs").orderBy(
        "o_orderstatus")


# --------------------------------------------------------------------------
# A3c: explicit GROUPING SETS — arbitrary set list, not the rollup/cube
# shorthand. Same physical shape as A3/A3b (one Expand + single hash
# aggregate pass; no per-set rescan of orders).
# --------------------------------------------------------------------------
@register(
    "a3c_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="A3c explicit grouping sets: by-status, by-priority, grand total",
)
def a3c_grouping_sets(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(_dec(F.col("o_totalprice"), 14, 2)).cast("double")
             .alias("revenue"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# A5b: ntile — equal-height bucketing per partition. Deterministic because
# the window order (totalprice DESC, orderkey) is a total order.
# --------------------------------------------------------------------------
@register(
    "a5b_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="A5b ntile(4) spend quartile per customer",
)
def a5b_ntile(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey",
                 F.ntile(4).over(w).alias("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# A6b: RANGE frame — trailing 1-hour rolling sum per user, frame bounded by
# the ORDER BY *value* (epoch millis), not row position: peers at the same
# timestamp are all included, and gaps in time shrink the frame. One shuffle
# on user_id, then a single ordered pass per partition (Spark keeps a
# sliding aggregate buffer; no per-row rescan). Decimal accumulator so both
# engines sum exactly regardless of accumulation order.
# --------------------------------------------------------------------------
@register(
    "a6b_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(14,4))) OVER (
             PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="A6b trailing 1h rolling sum per user via RANGE frame",
)
def a6b_range_frame(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.expr("unix_micros(ts) div 1000"))
         .rangeBetween(-3600000, Window.currentRow))
    return (
        e.select(
            "event_id", "user_id",
            F.sum(_dec(F.col("value"), 14, 4)).over(w).cast("double")
            .alias("rolling_1h"))
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# A12: statistical aggregates — stddev/variance/correlation/covariance and
# an exact interpolated median. All single-pass partial+final aggregates in
# Spark (Welford-style merge buffers) except percentile, which needs the
# full value set per group; at 100 TB swap percentile for percentile_approx
# (t-digest sketch, mergeable, bounded memory). Both sides round to 6
# decimals *inside* the query: cross-engine float accumulation order
# differs, and the harness's 9-sig-digit canon is tighter than the
# associativity noise on corr/stddev.
# --------------------------------------------------------------------------
@register(
    "a12_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS std_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A12 stats aggregates: stddev/var/corr/covar + exact percentiles",
)
def a12_stats_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6)
            .alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6)
            .alias("covar_qty_disc"),
            # one percentile buffer for both quantiles (array form), not
            # two independent sort buffers over the same 600k values
            F.percentile("l_extendedprice",
                         F.array(F.lit(0.5), F.lit(0.95))).alias("pcts"))
        .select("l_returnflag", "std_qty", "var_disc", "corr_qty_price",
                "covar_qty_disc",
                F.round(F.col("pcts")[0], 6).alias("median_price"),
                F.round(F.col("pcts")[1], 6).alias("p95_price"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# A12b: the 100 TB percentile — percentile_approx is Spark's mergeable
# KLL-style quantile sketch: bounded memory per group, partial+final
# combine, no full-value buffering (the scale twin of a12's exact
# F.percentile, per SCALING.md). The sketch value itself is not bit-stable
# across engines, so the oracle-checkable output is an INTEGER GATE (the
# l3d recall-gauge pattern): re-rank the approx result against the actual
# data and assert its rank fraction sits within ±0.01 of the target
# quantile — far looser than the sketch's 1/accuracy = 1e-4 rank-error
# bound, so the gate is deterministic, yet tight enough that a broken
# sketch or a wrong quantile mapping fails it. DuckDB's side reduces to
# literal 1s per group.
# --------------------------------------------------------------------------
@register(
    "a12b_approx_percentile",
    oracle="""
    SELECT l_returnflag, CAST(1 AS BIGINT) AS p50_ok,
           CAST(1 AS BIGINT) AS p95_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A12b mergeable approx-percentile sketch + exact rank gate",
)
def a12b_approx_percentile(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    approx = (
        li.groupBy("l_returnflag")
        .agg(F.percentile_approx(
            "l_extendedprice",
            F.array(F.lit(0.5), F.lit(0.95)), 10000).alias("ap")))
    # rank the sketch outputs against the data: tiny per-group frame
    # broadcast back, one partial-combining re-aggregation
    joined = li.join(F.broadcast(approx), "l_returnflag")
    gates = (
        joined.groupBy("l_returnflag")
        .agg(
            (F.sum((F.col("l_extendedprice") <= F.col("ap")[0])
                   .cast("long")) / F.count(F.lit(1))).alias("fr50"),
            (F.sum((F.col("l_extendedprice") <= F.col("ap")[1])
                   .cast("long")) / F.count(F.lit(1))).alias("fr95")))
    return (
        gates.select(
            "l_returnflag",
            (F.abs(F.col("fr50") - 0.5) <= 0.01)
            .cast("bigint").alias("p50_ok"),
            (F.abs(F.col("fr95") - 0.95) <= 0.01)
            .cast("bigint").alias("p95_ok"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# A13: pivot — wide conditional aggregation. With an explicit value list
# Spark skips the extra distinct-values job and plans ONE hash aggregate
# with 3 conditional sums (identical shuffle profile to a plain groupBy);
# never pivot on an unbounded-cardinality column at scale.
# --------------------------------------------------------------------------
@register(
    "a13_pivot",
    oracle="""
    SELECT year(l_shipdate) AS ship_year,
           round(sum(l_extendedprice) FILTER (l_returnflag = 'A'), 2)
             AS rev_a,
           round(sum(l_extendedprice) FILTER (l_returnflag = 'N'), 2)
             AS rev_n,
           round(sum(l_extendedprice) FILTER (l_returnflag = 'R'), 2)
             AS rev_r
    FROM lineitem GROUP BY ship_year ORDER BY ship_year
    """,
    doc="A13 pivot: revenue by ship year x return flag (explicit values)",
)
def a13_pivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    piv = (li.withColumn("ship_year", F.year("l_shipdate"))
           .groupBy("ship_year")
           .pivot("l_returnflag", ["A", "N", "R"])
           .agg(F.round(F.sum("l_extendedprice"), 2)))
    return (piv.select("ship_year",
                       F.col("A").alias("rev_a"),
                       F.col("N").alias("rev_n"),
                       F.col("R").alias("rev_r"))
            .orderBy("ship_year"))


# --------------------------------------------------------------------------
# A35 native recursive CTE (Spark 4.x WITH RECURSIVE): the hierarchical
# rollup pattern (org charts, BOM explosions, folder trees) over the
# supplier table arranged as a binary-heap hierarchy (parent(k) =
# (k-1) DIV 2, root 0). Each supplier walks its ancestor chain to the
# root, accumulating chain length and balance. Linear recursion: every
# iteration is ONE equi-join on the parent key, and the iteration count
# is the tree DEPTH (log2 N), not N — the same bound that makes the
# repo's unrolled iterative operators (g2 PageRank, l13 BPE, l6 CC)
# scale; a35 pins the NATIVE operator form now that Spark ships it.
# The chain-balance fold order is the path order in both engines, so the
# double sum is bit-identical.
# --------------------------------------------------------------------------
@register(
    "a35_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT s_suppkey AS start_key, s_suppkey AS cur,
             0 AS depth, s_acctbal AS bal
      FROM supplier
      UNION ALL
      SELECT c.start_key, p.s_suppkey, c.depth + 1, c.bal + p.s_acctbal
      FROM chain c
      JOIN supplier p ON p.s_suppkey = (c.cur - 1) // 2
      WHERE c.cur > 0
    )
    SELECT start_key AS s_suppkey,
           CAST(depth AS BIGINT) AS depth_to_root,
           round(bal, 2) AS chain_balance
    FROM chain WHERE cur = 0
    ORDER BY s_suppkey
    """,
    doc="A35 native WITH RECURSIVE hierarchical rollup: ancestor-chain "
        "depth + balance to the heap root, one parent-key join per "
        "level, log2(N) iterations",
)
def a35_recursive_hierarchy(spark, sf_dir):
    sup = load(spark, sf_dir, "supplier")
    sup.createOrReplaceTempView("a35_supplier")
    return spark.sql("""
      WITH RECURSIVE chain AS (
        SELECT s_suppkey AS start_key, s_suppkey AS cur,
               0 AS depth, s_acctbal AS bal
        FROM a35_supplier
        UNION ALL
        SELECT c.start_key, p.s_suppkey, c.depth + 1, c.bal + p.s_acctbal
        FROM chain c
        JOIN a35_supplier p ON p.s_suppkey = (c.cur - 1) DIV 2
        WHERE c.cur > 0
      )
      SELECT start_key AS s_suppkey,
             CAST(depth AS BIGINT) AS depth_to_root,
             round(bal, 2) AS chain_balance
      FROM chain WHERE cur = 0
      ORDER BY s_suppkey
    """)


# --------------------------------------------------------------------------
# A36 pivot + unpivot roundtrip: the reshaping pair (Spark
# groupBy().pivot() -> DataFrame.unpivot). The pivot's value list is
# DECLARED (the three TPC-H order statuses), so the plan is a plain
# hash aggregate with conditional counts — no extra pass to discover
# pivot values, no per-value shuffle; unpivot is a pure projection
# (Expand). Output is the long form so the oracle is a plain GROUP BY:
# the reshape must be a lossless roundtrip to hash-match it.
# --------------------------------------------------------------------------
@register(
    "a36_pivot_unpivot",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, status
    """,
    doc="A36 pivot/unpivot reshape roundtrip: declared-values pivot "
        "(one hash agg, no discovery pass) -> unpivot back to long "
        "form; lossless by oracle",
)
def a36_pivot_unpivot(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    wide = (orders.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1))))
    long = wide.unpivot(
        ids=["o_orderpriority"], values=["F", "O", "P"],
        variableColumnName="status", valueColumnName="n_orders")
    return (long.filter(F.col("n_orders").isNotNull())
            .select("o_orderpriority", "status",
                    F.col("n_orders").cast("bigint").alias("n_orders"))
            .orderBy("o_orderpriority", "status"))


# --------------------------------------------------------------------------
# A37: SALTED SKEW JOIN — a1b salts a skewed aggregate; this is the JOIN
# half of the skew story. The fixture's realistic hot key: ~75% of
# events fold to account 0 (the anonymous/logged-out default-key shape —
# THE classic join skew at scale). A plain shuffle join would put the
# whole hot key in ONE task; the salted twin splits it S ways: the fact
# side adds salt = event_id % S, the dim side replicates each customer
# row S times (one per salt), and the join key becomes (acct, salt) —
# provably identical output (each fact row meets exactly the one dim
# copy carrying its salt), hot-key work spread across S tasks. The
# merge hint pins the shuffle-join strategy the pattern exists for (a
# broadcast would hide the skew at fixture scale — and when the dim fits
# in memory, broadcasting IS the right fix; salting is for when it
# doesn't). AQE's OptimizeSkewedJoin does this adaptively at real scale
# (256 MB partitions); the explicit salt is the deterministic,
# engine-independent form the oracle can mirror.
# --------------------------------------------------------------------------
_A37_SALT = 8


@register(
    "a37_salted_skew_join",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN user_id % 4 <> 0 THEN 0 ELSE user_id END AS acct,
             value
      FROM events)
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(f.value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM f LEFT JOIN customer c ON c.c_custkey = f.acct
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
    doc="A37 salted skew join: 75%-hot default key (anonymous account) "
        "split S ways via fact-side salt + S-fold dim replication — "
        "output provably identical to the plain join (the oracle), "
        "hot-key work spread across S tasks",
)
def a37_salted_skew_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    fact = ev.select(
        F.when(F.col("user_id") % 4 != 0, F.lit(0))
        .otherwise(F.col("user_id")).alias("acct"),
        (F.col("event_id") % _A37_SALT).alias("_salt"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"))
    dim = (cust.select("c_custkey", "c_mktsegment",
                       F.explode(F.array(*[F.lit(s) for s in
                                           range(_A37_SALT)]))
                       .alias("_salt")))
    joined = fact.join(
        dim.hint("merge"),
        (fact["acct"] == dim["c_custkey"])
        & (fact["_salt"] == dim["_salt"]),
        "left")
    return (joined.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("cents").cast("bigint").alias("value_cents"))
            .select(F.col("c_mktsegment").alias("segment"),
                    "n_events", "value_cents")
            .orderBy("segment"))


# --------------------------------------------------------------------------
# A38 SCD Type-2 interval compaction (round 13): the slowly-changing-
# dimension reconstruction every warehouse runs — collapse a per-key
# event stream into validity intervals, one row per RUN of equal
# status (change-point islands: new island exactly where the lagged
# value differs, island id = running count of change points). Distinct
# from e3's sessionization (gap-based islands) — here the boundary is
# a VALUE change, not a time gap. valid_to is the next island's start
# (NULL = current row still open), the half-open convention
# downstream point-in-time joins expect.
#
# Scale shape: everything rides ONE user_id shuffle — the lag flag,
# the running island id, and the island aggregation share the same
# partitioning, so Catalyst plans a single Exchange; output is
# bounded by the number of status CHANGES, not events.
# --------------------------------------------------------------------------
A38_SCD2_ORACLE = """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM
                       event_type THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    spans AS (
      SELECT user_id, event_type, island,
             min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM islands GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY island) AS valid_to,
           n_events
    FROM spans ORDER BY user_id, valid_from
    """


@register(
    "a38_scd2_intervals",
    oracle=A38_SCD2_ORACLE,
    doc="A38 SCD Type-2 interval compaction: per-user change-point "
        "islands (boundary = value change, not time gap) collapsed "
        "to half-open validity intervals with lead() closing each "
        "span — one user_id shuffle end-to-end, output bounded by "
        "status changes",
)
def a38_scd2_intervals(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(F.lag("event_type").over(w).eqNullSafe(
            F.col("event_type")), F.lit(0)).otherwise(F.lit(1))
        .alias("chg"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = flagged.select(
        "user_id", "event_type", "ts",
        F.sum("chg").over(wrun).alias("island"))
    spans = (islands.groupBy("user_id", "event_type", "island")
             .agg(F.min("ts").alias("valid_from"),
                  F.count(F.lit(1)).cast("bigint").alias("n_events")))
    wl = Window.partitionBy("user_id").orderBy("island")
    return (spans.select(
        "user_id", "event_type", "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events")
        .orderBy("user_id", "valid_from"))
