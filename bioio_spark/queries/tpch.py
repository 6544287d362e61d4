"""A14-A22: TPC-H-derived decision-support shapes (SURVEY §2.7 extension).

The reference has no relational engine (SURVEY §2.7: shape aggregates and
orderings only, `bio_image.py:749-762`, `plugins.py:299-320`); these queries
extend the declared north-star contract with the canonical TPC-H access
patterns the a1-a13 suite doesn't yet exercise: correlated EXISTS (Q4),
conditional aggregation (Q14), scalar-subquery max (Q15), NOT-IN anti join
under a distinct aggregate (Q16), correlated scalar subquery (Q17),
group-having semi join (Q18), disjunctive join residuals (Q19), nested
semi join over an aggregate (Q20), the only-late-supplier double-EXISTS
(Q21), and anti-join + global-average gate (Q22) — each adapted to the
driver's fixture schema and hash-checked against DuckDB.

Money math follows a1's rule: sum in DECIMAL (exact, order-independent),
cast to DOUBLE at the end, so both engines land on identical bits.

Scale notes accompany each query; the common frame: `part`/`supplier`/
`customer`/`nation` are dimension tables (broadcast, never shuffled);
`lineitem`/`orders` carry the data volume and only ever shuffle on their
co-partitioned join key (l_orderkey = o_orderkey), which AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bioio_spark.queries.base import load, register


def _dec(col, prec=12, scale=2):
    return col.cast(f"decimal({prec},{scale})")


def _disc_price():
    return _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 4, 2))


# --------------------------------------------------------------------------
# A14 (TPC-H Q4 shape): correlated EXISTS with an inequality on the outer
# row -> left-semi join carrying a non-equi residual. Scale: the semi join
# shuffles both sides on the order key once; the date filter on orders
# pushes to the parquet scan and prunes before the shuffle.
# --------------------------------------------------------------------------
@register(
    "a14_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="A14 correlated-EXISTS priority count (TPC-H Q4 shape)",
)
def a14_order_priority(spark, sf_dir):
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# A15 (Q14 shape): conditional aggregation — promo revenue share. Scale: one
# broadcast join (part is a dim) + one all-groups aggregate; the shipdate
# window pushes down. The CASE lives inside the partial aggregate, so the
# shuffle moves exactly two decimal buffers per partition.
# --------------------------------------------------------------------------
@register(
    "a15_promo_revenue",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS total_revenue,
           100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    """,
    doc="A15 promo revenue share via conditional aggregation (Q14 shape)",
)
def a15_promo_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO",
                   _disc_price()).otherwise(_dec(F.lit(0)))
    j = (li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp")))
         .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")))
    agg = j.agg(F.sum(promo).cast("double").alias("promo_revenue"),
                F.sum(_disc_price()).cast("double").alias("total_revenue"))
    return agg.select(
        "promo_revenue", "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue"))
        .alias("promo_share_pct"))


# --------------------------------------------------------------------------
# A16 (Q15 shape): top supplier by revenue — scalar-subquery max. Scale: the
# per-supplier aggregate is tiny (|suppliers| rows); its max is a 1-row
# broadcast joined back on exact DECIMAL equality (doubles would make
# "== max" nondeterministic). No second scan of lineitem.
# --------------------------------------------------------------------------
@register(
    "a16_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE r = (SELECT max(r) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="A16 max-revenue supplier via scalar subquery (Q15 shape)",
)
def a16_top_supplier(spark, sf_dir):
    li, sup = load(spark, sf_dir, "lineitem", "supplier")
    rev = (li.filter(
              (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
              & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp")))
           .groupBy(F.col("l_suppkey").alias("suppkey"))
           .agg(F.sum(_disc_price()).alias("r")))
    mx = rev.agg(F.max("r").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("r") == F.col("mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name",
                F.col("r").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# A17 (Q16 shape): supplier variety per (brand, type) with a NOT-IN
# exclusion. Scale: the exclusion set (negative-balance suppliers) is a
# broadcast anti join — NOT IN as a blacklist never shuffles the fact side;
# count(DISTINCT) plans as Expand + two-phase aggregate on (brand, type).
# --------------------------------------------------------------------------
@register(
    "a17_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    LIMIT 20
    """,
    doc="A17 distinct-supplier variety with NOT-IN exclusion (Q16 shape)",
)
def a17_supplier_variety(spark, sf_dir):
    li, part, sup = load(spark, sf_dir, "lineitem", "part", "supplier")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = part.filter((F.col("p_brand") != "Brand#1")
                     & F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    return (
        li.join(F.broadcast(bad),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
        .limit(20)
    )


# --------------------------------------------------------------------------
# A18 (Q17 shape): correlated scalar subquery — lines under 20% of their
# part's average quantity. Scale: the subquery decorrelates into a per-part
# aggregate; filtering lineitem through the broadcast brand dim FIRST means
# the aggregate runs over only the brand's rows (~4% here), and both joins
# broadcast — zero wide shuffles beyond the tiny per-part agg.
# --------------------------------------------------------------------------
@register(
    "a18_small_qty_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="A18 small-quantity revenue via correlated scalar subquery "
        "(Q17 shape)",
)
def a18_small_qty_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#3") \
        .select("p_partkey")
    brand_lines = li.join(
        F.broadcast(brand_parts), F.col("p_partkey") == F.col("l_partkey"))
    # avg(l_quantity) over integer-valued doubles is exact: sum < 2^53
    thresholds = (brand_lines.groupBy(F.col("l_partkey").alias("pk"))
                  .agg((0.2 * F.avg("l_quantity")).alias("qty_cap")))
    return (
        brand_lines.join(F.broadcast(thresholds),
                         F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0)
             .alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# A19 (Q18 shape): large orders — group-having feeding a join. Scale: the
# having-filtered aggregate and the orders join share the l_orderkey =
# o_orderkey hash partitioning (one exchange, reused); customer stays a
# broadcast dim. Top-k is TakeOrderedAndProject (per-partition heaps).
# --------------------------------------------------------------------------
@register(
    "a19_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS okey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = okey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="A19 large-order customers via group-having semi join (Q18 shape)",
)
def a19_large_orders(spark, sf_dir):
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    big = (li.groupBy(F.col("l_orderkey").alias("okey"))
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    return (
        big.join(orders, F.col("o_orderkey") == F.col("okey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
                "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# A20 (Q19 shape): disjunctive join residual. Scale: the equi key
# (p_partkey = l_partkey) carries the broadcast join; the OR-of-ANDs is a
# post-join residual evaluated in codegen — never a cross product. Catalyst
# also extracts the common brand-membership predicate into the part scan.
# --------------------------------------------------------------------------
@register(
    "a20_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#10' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="A20 disjunctive-predicate join revenue (Q19 shape)",
)
def a20_disjunctive_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((br == "Brand#5") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#10") & sz.between(10, 30) & q.between(10, 35))
        | ((br == "Brand#20") & sz.between(20, 50) & q.between(20, 50)))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# A21 (Q20 shape): suppliers with excess shipped quantity of PROMO parts —
# a semi join over an aggregate-with-threshold. Scale: the (suppkey,
# partkey) aggregate partial-combines map-side; the PROMO dim broadcast
# prunes before the distinct; the final semi join broadcasts the small
# qualifying-supplier set into the supplier dim.
# --------------------------------------------------------------------------
@register(
    "a21_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey) shipped
      JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO' AND q > 60)
    ORDER BY s_suppkey
    """,
    doc="A21 excess-quantity suppliers via nested semi join (Q20 shape)",
)
def a21_excess_suppliers(spark, sf_dir):
    li, part, sup = load(spark, sf_dir, "lineitem", "part", "supplier")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    shipped = (li.filter(
                  (F.col("l_shipdate")
                   >= F.lit("1998-01-01").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1999-01-01").cast("timestamp")))
               .groupBy("l_suppkey", "l_partkey")
               .agg(F.sum("l_quantity").alias("q")))
    excess = (shipped
              .join(F.broadcast(promo),
                    F.col("p_partkey") == F.col("l_partkey"))
              .filter(F.col("q") > 60)
              .select("l_suppkey"))
    return (
        sup.join(excess, F.col("s_suppkey") == F.col("l_suppkey"),
                 "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# A22 (Q21 shape): the only-late-supplier query — EXISTS + NOT EXISTS over
# the same relation. Spark-first formulation: instead of two correlated
# self-joins of lineitem, ONE join to orders and two collect_set windows
# over l_orderkey (which reuses the join's hash partitioning — zero extra
# exchanges). A line qualifies when it is late, its order has >1 supplier,
# and the order's late-supplier set has size 1 (necessarily this one).
# --------------------------------------------------------------------------
@register(
    "a22_lonely_late_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="A22 only-late-supplier wait counts (Q21 shape) via windowed sets",
)
def a22_lonely_late_suppliers(spark, sf_dir):
    li, orders, sup = load(spark, sf_dir, "lineitem", "orders", "supplier")
    j = li.join(orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > (F.col("o_orderdate")
                                  + F.expr("INTERVAL 90 DAYS"))
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn("is_late", late) \
         .withColumn("n_sup", F.size(F.collect_set("l_suppkey").over(w))) \
         .withColumn("late_sups", F.size(F.collect_set(
             F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)))
    return (
        j.filter(F.col("is_late") & (F.col("n_sup") > 1)
                 & (F.col("late_sups") == 1))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# A23 (Q22 shape): dormant rich customers — global-average gate + anti join.
# Scale: the average is a 1-row broadcast (computed with an exact DECIMAL
# sum so the ">" gate is deterministic across engines); "no recent orders"
# is a shuffle anti join on the customer key; nation stays broadcast.
# --------------------------------------------------------------------------
@register(
    "a23_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS ab
      FROM customer WHERE c_acctbal > 0)
    SELECT n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS totacctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name ORDER BY n_name
    """,
    doc="A23 dormant high-balance customers per nation (Q22 shape)",
)
def a23_dormant_customers(spark, sf_dir):
    cust, nation, orders = load(spark, sf_dir, "customer", "nation",
                                "orders")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg((F.sum(_dec(F.col("c_acctbal"))).cast("double")
                     / F.count(F.lit(1))).alias("ab")))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(_dec(F.col("c_acctbal"))).cast("double")
             .alias("totacctbal"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# A24: FULL OUTER equi join — the remaining declared join type (SURVEY A8:
# inner/left/right/full/semi/anti; semi and anti live in a8c/a14/a21).
# Both inputs are tiny pre-aggregates here, but the plan is the general
# one: a full outer hash join on the group key, null-completing both
# sides. Thresholds are tuned so BOTH sides contribute unmatched rows at
# every fixture SF (left-only and right-only null patterns exercised).
# --------------------------------------------------------------------------
@register(
    "a24_full_outer_balance",
    oracle="""
    WITH hc AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust
      FROM customer WHERE c_acctbal > 9800 GROUP BY c_nationkey),
    hs AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp
      FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey)
    SELECT COALESCE(hc.nk, hs.nk) AS nationkey, n_cust, n_supp
    FROM hc FULL OUTER JOIN hs ON hc.nk = hs.nk
    ORDER BY nationkey
    """,
    doc="A24 full outer join of per-nation customer/supplier tallies",
)
def a24_full_outer_balance(spark, sf_dir):
    cust, sup = load(spark, sf_dir, "customer", "supplier")
    hc = (cust.filter(F.col("c_acctbal") > 9800)
          .groupBy(F.col("c_nationkey").alias("nk_c"))
          .agg(F.count(F.lit(1)).alias("n_cust")))
    hs = (sup.filter(F.col("s_acctbal") > 3000)
          .groupBy(F.col("s_nationkey").alias("nk_s"))
          .agg(F.count(F.lit(1)).alias("n_supp")))
    return (
        hc.join(hs, F.col("nk_c") == F.col("nk_s"), "full_outer")
        .select(F.coalesce(F.col("nk_c"), F.col("nk_s")).alias("nationkey"),
                "n_cust", "n_supp")
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# A25 (Q13 shape): customer order-count distribution — left outer join with
# a predicate in the ON clause (orders filtered, customers kept) feeding a
# DOUBLE aggregation (per-customer count, then histogram of counts).
# Scale: the outer join shuffles on custkey once; the second aggregate's
# input is |customers| rows and its output |distinct counts| — the classic
# "aggregate of an aggregate" where stage 2 is negligible. The
# orderpriority filter halves the orders side before the shuffle.
# --------------------------------------------------------------------------
@register(
    "a25_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="A25 customer order-count histogram via outer join (Q13 shape)",
)
def a25_order_count_distribution(spark, sf_dir):
    cust, orders = load(spark, sf_dir, "customer", "orders")
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


# --------------------------------------------------------------------------
# A26 (Q7 shape): bilateral nation-pair trade volume by year. Scale: the
# one wide op is the lineitem->orders join on the co-partitioned orderkey;
# supplier/customer/nation are broadcast dims, and the nation-pair
# disjunction prunes rows right after the dim joins (Catalyst pushes each
# equality into its broadcast probe). year() is a codegen projection.
# --------------------------------------------------------------------------
@register(
    "a26_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="A26 bilateral nation-pair trade volume by year (Q7 shape)",
)
def a26_nation_volume(spark, sf_dir):
    li, sup, orders, cust, nation = load(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer",
        "nation")
    n1 = nation.select(F.col("n_nationkey").alias("nk1"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("nk2"),
                       F.col("n_name").alias("cust_nation"))
    j = (li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
         .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
         .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
         .filter(((F.col("supp_nation") == "NATION_1")
                  & (F.col("cust_nation") == "NATION_2"))
                 | ((F.col("supp_nation") == "NATION_2")
                    & (F.col("cust_nation") == "NATION_1"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


# --------------------------------------------------------------------------
# A27 (Q8 shape): market share of one supplying nation within a consuming
# region, per year — conditional aggregation over a 5-way join. Scale: same
# single-wide-join frame as a26; the share division happens on two already-
# aggregated decimals per year (exact until the final double cast), so the
# ratio is bit-stable across engines.
# --------------------------------------------------------------------------
@register(
    "a27_market_share",
    oracle="""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="A27 nation market share within a region per year (Q8 shape)",
)
def a27_market_share(spark, sf_dir):
    li, sup, orders, cust, nation, region = load(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer",
        "nation", "region")
    n1 = nation.select(F.col("n_nationkey").alias("nk1"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("nk2"),
                       F.col("n_regionkey").alias("rk2"))
    j = (li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
         .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
         .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
               F.col("rk2") == F.col("r_regionkey")))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3",
                        _disc_price()).otherwise(_dec(F.lit(0)))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(nation_vol).cast("double")
                  / F.sum(_disc_price()).cast("double")).alias("mkt_share"))
            .orderBy("o_year"))


# --------------------------------------------------------------------------
# A28 (Q10 shape): top customers by returned-item revenue. Scale: lineitem
# filtered on returnflag before its one shuffle onto orderkey; customer and
# nation broadcast; the final top-20 is TakeOrderedAndProject (per-partition
# heaps, no global sort). Tie-break on custkey pins hash determinism.
# --------------------------------------------------------------------------
@register(
    "a28_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="A28 top-20 customers by returned-item revenue (Q10 shape)",
)
def a28_returned_revenue(spark, sf_dir):
    cust, orders, li, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
    r = li.filter(F.col("l_returnflag") == "R")
    j = (r.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
         .join(F.broadcast(nation),
               F.col("c_nationkey") == F.col("n_nationkey")))
    return (j.groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


# --------------------------------------------------------------------------
# A29 (Q3 shape): shipping-priority — segment-filtered 3-way join, grouped
# revenue, top-10. Scale: customer broadcast (segment filter prunes it
# first), lineitem x orders shuffle once on the co-partitioned order key,
# top-k = TakeOrderedAndProject per-partition heaps. Both date predicates
# push to the scans.
# --------------------------------------------------------------------------
@register(
    "a29_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    doc="A29 shipping-priority top-10 unshipped revenue (TPC-H Q3 shape)",
)
def a29_shipping_priority(spark, sf_dir):
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    c = cust.filter(F.col("c_mktsegment") == "BUILDING")
    o = orders.filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    l = li.filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    j = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")))
    return (j.groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


# --------------------------------------------------------------------------
# A13b: unpivot/melt — the inverse of a13's pivot: wide per-flag metric
# columns back to (flag, metric, value) long form. Scale: Expand node, one
# row per (input row x metric) — a projection, no shuffle beyond the
# upstream aggregate's.
# --------------------------------------------------------------------------
@register(
    "a13b_unpivot",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, CAST(value AS DOUBLE) AS value
    FROM m UNPIVOT (value FOR metric IN (sum_qty, sum_price))
    ORDER BY l_returnflag, metric
    """,
    doc="A13b unpivot wide metrics to long form (melt)",
)
def a13b_unpivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    m = (li.groupBy("l_returnflag")
         .agg(F.sum("l_quantity").cast("double").alias("sum_qty"),
              F.sum(_dec(F.col("l_extendedprice"))).cast("double")
              .alias("sum_price")))
    return (m.unpivot(["l_returnflag"], ["sum_qty", "sum_price"],
                      "metric", "value")
            .orderBy("l_returnflag", "metric"))


# --------------------------------------------------------------------------
# A30 (TPC-H Q6 shape): the pure-scan aggregate — every predicate (date
# range, discount band, quantity cap) pushes to the parquet scan, then ONE
# partial+final aggregate over the survivors. Scale: zero joins, zero wide
# columns; at 100 TB this is bandwidth-bound and nothing else.
# --------------------------------------------------------------------------
@register(
    "a30_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="A30 (Q6): forecast revenue — scan-only filtered aggregate",
)
def a30_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24))
    return f.agg(
        (F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"),
                                                     4, 2)))
        .cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


# --------------------------------------------------------------------------
# A31 (TPC-H Q2 shape): correlated scalar-MIN subquery over a join chain,
# matched back by equality. Adapted to the fixture schema (no partsupp):
# for each SMALL-type part sold into a region, find the line(s) at the
# MINIMUM extended price. Scale: the min-per-part aggregates map-side
# before its shuffle; dims (part/supplier/nation/region) broadcast; the
# back-match is the same-keyed join AQE reuses.
# --------------------------------------------------------------------------
@register(
    "a31_min_cost_supplier",
    oracle="""
    WITH priced AS (
      SELECT l.l_partkey, l.l_extendedprice, s.s_name, s.s_acctbal
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'REGION_0' AND p.p_type = 'SMALL'
    )
    SELECT p.l_partkey AS partkey, p.s_name,
           CAST(p.s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(p.l_extendedprice AS DOUBLE) AS min_price
    FROM priced p
    WHERE p.l_extendedprice = (
      SELECT min(p2.l_extendedprice) FROM priced p2
      WHERE p2.l_partkey = p.l_partkey)
    ORDER BY s_acctbal DESC, partkey, s_name
    LIMIT 100
    """,
    doc="A31 (Q2): min-price supplier per part within a region",
)
def a31_min_cost_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region")
    pa = load(spark, sf_dir, "part")
    priced = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re.filter(F.col("r_name") == "REGION_0")),
              na.n_regionkey == re.r_regionkey)
        .join(F.broadcast(pa.filter(F.col("p_type") == "SMALL")),
              li.l_partkey == pa.p_partkey)
        .select("l_partkey", "l_extendedprice", "s_name", "s_acctbal"))
    mins = (priced.groupBy("l_partkey")
            .agg(F.min("l_extendedprice").alias("min_price")))
    return (priced.join(mins, "l_partkey")
            .filter(F.col("l_extendedprice") == F.col("min_price"))
            .select(F.col("l_partkey").alias("partkey"), "s_name",
                    F.col("s_acctbal").cast("double").alias("s_acctbal"),
                    F.col("min_price").cast("double").alias("min_price"))
            .orderBy(F.desc("s_acctbal"), "partkey", "s_name")
            .limit(100))


# --------------------------------------------------------------------------
# A32 (TPC-H Q9 shape): profit by nation x order-year through a 4-way
# join. Cost proxy = 10% of retail price per unit (the fixture has no
# partsupp.ps_supplycost); all money math in DECIMAL so both engines land
# on identical bits. Scale: part/supplier/nation broadcast; lineitem
# shuffles once for the (nation, year) aggregate, combined map-side.
# --------------------------------------------------------------------------
@register(
    "a32_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(0.1 AS DECIMAL(3,1))
                      * CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%al%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="A32 (Q9): profit by nation x year, cost proxied from retail price",
)
def a32_product_type_profit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    pa = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    profit = (
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"),
                                                   4, 2))
        - F.lit("0.1").cast("decimal(3,1)")
        * _dec(F.col("p_retailprice")) * _dec(F.col("l_quantity")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(pa.filter(F.col("p_name").like("%al%"))),
              li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year")))


# --------------------------------------------------------------------------
# A33 (TPC-H Q11 shape): per-group value vs a GLOBAL scalar threshold —
# keep parts whose sold value exceeds 0.05% of total sold value. The gate
# is an exact DECIMAL cross-multiplication (value * 10000 > total * 5),
# no float thresholds. Scale: two aggregates over the same shuffle key
# + a broadcast of the 1-row total; never a cartesian.
# --------------------------------------------------------------------------
@register(
    "a33_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS value
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT sum(value) AS total FROM pv)
    SELECT pv.l_partkey AS partkey, CAST(pv.value AS DOUBLE) AS value
    FROM pv, tot
    WHERE pv.value * 10000 > tot.total * 5
    ORDER BY value DESC, partkey
    """,
    doc="A33 (Q11): parts above a global value-share threshold",
)
def a33_important_stock(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pv = (li.groupBy("l_partkey")
          .agg(F.sum(_disc_price()).alias("value")))
    tot = pv.agg(F.sum("value").alias("total"))
    return (pv.crossJoin(F.broadcast(tot))
            .filter(F.col("value") * 10000 > F.col("total") * 5)
            .select(F.col("l_partkey").alias("partkey"),
                    F.col("value").cast("double").alias("value"))
            .orderBy(F.desc("value"), "partkey"))


# --------------------------------------------------------------------------
# A34 (TPC-H Q12 shape): join + two-way conditional counts per line
# attribute (return flag stands in for the fixture's missing shipmode).
# Scale: the orders join is the one shuffle (same key as every orders
# join — exchange reuse); the priority split is a codegen CASE aggregate.
# --------------------------------------------------------------------------
@register(
    "a34_returnflag_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
    doc="A34 (Q12): two-way priority split per line attribute",
)
def a34_returnflag_priority(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag"))
