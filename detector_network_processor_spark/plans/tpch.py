"""Extended TPC-H-style relational suite (SURVEY §2.10 breadth).

q1/q3/q5 live in plans/relational.py; this module carries the rest of the
classic decision-support shapes, ADAPTED to the driver's reduced fixture
schema (no partsupp table; lineitem lacks commit/receipt dates and
shipmode; part lacks mfgr/container). Each query keeps the original
query's PLAN SHAPE — the thing the engine is being graded on — while
predicates use columns the fixtures actually carry.

Scale posture is uniform across the module: fact tables (lineitem,
orders) stream through hash aggregations with map-side partials;
dimension tables (part 2k rows, supplier 100, customer 1.5k, nation 25,
region 5) are explicitly broadcast so no fact-side shuffle exists for
enrichment joins; correlated-subquery shapes (q17 avg-per-part, q15
max-revenue, q22 avg-balance) become broadcast scalar/dimension joins
instead of per-row subqueries. Money sums run in exact scaled integers
(see q1's rationale in relational.py — distributed double summation is
order-dependent and breaks cross-engine hashing at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from . import register

# exact scaled-integer revenue term: extendedprice has 2 dp, discount 2 dp.
# Built lazily — pyspark 4 Column construction needs an active session, and
# this module must stay importable (registry enumeration) without one.
def _rev4():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")


_REV4_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


def _sum_rev(alias: str):
    return F.round(F.sum(_rev4()) / 10_000.0, 4).alias(alias)


def _sum_rev_sql(alias: str) -> str:
    return f"round(CAST(sum({_REV4_SQL}) AS BIGINT) / 10000.0, 4) AS {alias}"


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {_sum_rev_sql('revenue')}, count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: pure scan + conjunctive filter + scalar agg — the canonical predicate-pushdown probe. All three predicates reach the parquet scan (PushedFilters); no shuffle beyond the final 1-row partial-agg exchange.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_sum_rev("revenue"), F.count(F.lit(1)).alias("n_items"))


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {_sum_rev_sql('revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 shape (adapted nations): bidirectional nation-pair volume by year. supplier/customer/nation broadcast; the only shuffle is lineitem⋈orders on orderkey, then the final 4-group agg.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_sum_rev("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH all_sales AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         {_REV4_SQL} AS rev4,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev4 ELSE 0 END) AS BIGINT)
             * 1.0 / CAST(sum(rev4) AS BIGINT), 6) AS mkt_share
FROM all_sales
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8 shape (adapted): national market share inside a region for one part type. The share is a ratio of two exact integer sums inside one agg — no second pass, no join back. part/supplier/customer/nation/region all broadcast.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev4 = _rev4()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev4).otherwise(F.lit(0)))
                * 1.0
                / F.sum(rev4),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_sum_rev_sql('sum_profit')}
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
""",
    doc="TPC-H Q9 shape (adapted: no ps_supplycost, profit = discounted revenue): part-name LIKE filter drives the fact scan; supplier/nation/part broadcast; single orderkey shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(load_table(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_sum_rev("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {_sum_rev_sql('revenue')}, round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20. returnflag+daterange filters push to the scans; customer/nation broadcast; TakeOrderedAndProject caps the sort at k=20 (no global sort materialization).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(_sum_rev("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13 shape: left outer join preserving order-less customers, then a distribution-of-counts double aggregation. Orders side aggregates per custkey BEFORE the join at scale; here the dimension is broadcast so the fact never shuffles.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    # aggregate the fact FIRST (count per custkey — map-side combinable),
    # then left-join the pre-aggregated counts to the customer dimension:
    # the per-order rows never cross a join boundary.
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return (
        cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV4_SQL} ELSE 0 END) AS BIGINT)
             / CAST(sum({_REV4_SQL}) AS BIGINT), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
    doc="TPC-H Q14 shape: promo revenue share for one month — conditional aggregation over a broadcast-enriched fact scan, ratio of two exact integer sums in a single agg.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev4()).otherwise(F.lit(0)))
                / F.sum(_rev4()),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_sum_rev_sql('total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15 shape: quarterly per-supplier revenue, keep the max. The scalar-subquery max becomes a 100-row window over the supplier-dimension aggregate (rank on a dimension-sized frame, NOT a global sort of the fact); supplier broadcast for the name join.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _sum_rev("total_revenue")
    )
    # window over the supplier-dimension aggregate (≤ #suppliers rows);
    # rank() keeps ties exactly like the oracle's `= (SELECT max(...))`
    w = Window.orderBy(F.desc("total_revenue"))
    top = rev.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") == 1).drop("_rk")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#7' AND p_type <> 'ECONOMY' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape (adapted: supplier-per-part relationships derived from lineitem instead of the absent partsupp): distinct-count per part-attribute group after a broadcast enrichment; Catalyst expands the distinct into a two-phase aggregate.",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#7")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) pa ON p_partkey = a_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty
""",
    doc="TPC-H Q17 shape: small-quantity orders below half the per-part average. The correlated AVG subquery becomes a part-dimension aggregate (2k rows) broadcast back onto the fact — one pass builds the averages, one pass filters; no per-row subquery execution.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # per-part average quantity: part-dimension-sized (≤ #parts rows),
    # map-side combinable, broadcast back
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    p2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("p_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum(p2) / 100.0 / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 150 * 100
)
GROUP BY c_name, c_custkey, o_orderkey, orderdate, totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18 shape: large-volume orders (sum of quantities over a threshold). The IN-subquery becomes a semi-join against the per-order quantity aggregate — both sides partition on orderkey so AQE can plan a single co-partitioned exchange; threshold compares exact integer centiquantities.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    q2 = F.round(F.col("l_quantity") * 100).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(q2).alias("q2sum"))
        .filter(F.col("q2sum") > 150 * 100)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum(q2) / 100.0, 4).alias("sum_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
SELECT {_sum_rev_sql('revenue')}, count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 shape: disjunctive multi-attribute predicate spanning both join sides. The part-side conjuncts (brand+size) are NOT pushable per-branch through the OR, so the filter evaluates post-join on the broadcast-enriched rows — the join itself stays a plain broadcast equi-join, no fact shuffle.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(_sum_rev("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q22_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
),
no_orders AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT ab FROM avg_bal)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
)
SELECT n_name, count(*) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS totacctbal
FROM no_orders JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    doc="TPC-H Q22 shape (adapted: no phone prefixes in the fixture): above-average-balance customers with no orders. The scalar AVG collapses to one collected scalar; NOT EXISTS is a left-anti join on the order-side DISTINCT custkeys; balances sum in exact centi-units.",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    nation = load_table(spark, sf_dir, "nation")
    # one O(1) scalar: the average positive balance (dimension-sized input)
    ab = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
        .collect()[0][0]
    )
    b2 = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.filter(F.col("c_acctbal") > F.lit(ab))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(b2) / 100.0, 4).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Round-6 completion: the six remaining classic shapes (q2, q4, q11, q12,
# q20, q21), closing out TPC-H 1-22. The fixture has no partsupp table and
# lineitem carries no commit/receipt dates or shipmode, so, as above, each
# adaptation keeps the original query's PLAN SHAPE (the graded thing) while
# sourcing the missing relations from lineitem and the missing lateness
# columns from shipdate-vs-orderdate arithmetic.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 10000 / l_quantity) AS BIGINT)) AS unit_cost_j
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
  GROUP BY l_partkey, l_suppkey
),
minc AS (
  SELECT l_partkey AS m_partkey, min(unit_cost_j) AS min_cost_j
  FROM offers GROUP BY l_partkey
)
SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name, p_partkey, p_name,
       round(unit_cost_j / 10000.0, 4) AS unit_cost
FROM offers
JOIN minc ON l_partkey = m_partkey AND unit_cost_j = min_cost_j
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE'
ORDER BY acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 shape (adapted: the part-supplier cost relation is derived from lineitem unit prices instead of the absent partsupp): per-part minimum-cost supplier within a region. The correlated MIN subquery becomes a part-dimension aggregate joined back onto the offers (both sides part-dimension-sized, broadcast); supplier/nation/region/part are all broadcast dimensions — the only fact-side work is one groupBy(part, supp) aggregation. The =min tie is EXACT: unit cost is scaled to integer ten-thousandths (q11 cents-style) before the min/equality, so the join never relies on cross-engine bit-identical IEEE division results. Ref parity: include/query shapes per SURVEY §2.10.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    offers = (
        li.join(
            F.broadcast(supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        # scaled-integer unit cost (ten-thousandths): the per-part =min
        # equality below compares exact BIGINTs, not doubles
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") * 10000 / F.col("l_quantity")).cast(
                    "bigint"
                )
            ).alias("unit_cost_j")
        )
    )
    minc = offers.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_cost_j").alias("min_cost_j")
    )
    return (
        offers.join(
            F.broadcast(minc),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("unit_cost_j") == F.col("min_cost_j")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("unit_cost_j") / 10000.0, 4).alias("unit_cost"),
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 shape (adapted: 'late' = shipped >30 days after order, replacing the absent commit/receipt dates): priority distribution of orders with at least one late line. The correlated EXISTS is a LEFT SEMI join on orderkey carrying the non-equi lateness predicate inside the join condition — per-order short-circuit, no per-row subquery, no duplicate inflation.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, late_exists, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q11_important_stock",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, round(CAST(cents AS BIGINT) / 100.0, 2) AS part_value
FROM pv
WHERE cents * (SELECT count(*) FROM pv) > 2 * (SELECT CAST(sum(cents) AS BIGINT) FROM pv)
ORDER BY part_value DESC, p_partkey
""",
    doc="TPC-H Q11 shape (adapted: per-part 'stock value' = shipped extended price from lineitem, replacing the absent partsupp supplycost*availqty): parts whose value exceeds 2x the average part value — mean-relative rather than TPC-H's fixed fraction-of-total because the original spec scales that fraction by 1/SF; a mean-relative threshold is selective at EVERY fixture SF. The group-vs-global-scalar HAVING becomes one O(1) collected scalar over the part-dimension aggregate (same resolved pattern as q22's avg balance) — no global window, no second fact pass; value sums AND the threshold comparison (integer cross-multiplication, no float boundary) run exactly.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("cents"))
        .localCheckpoint(eager=True)  # two consumers: scalar + filter
    )
    # O(1) driver scalars; threshold compares in exact integers.
    # sum() over zero rows collects as None — an empty region filter must
    # yield the oracle's empty result, not a TypeError.
    total, n_parts = pv.agg(F.sum("cents"), F.count(F.lit(1))).collect()[0]
    return (
        pv.filter(F.col("cents") * F.lit(int(n_parts)) > F.lit(2 * int(total or 0)))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag AS return_class,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 45 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="TPC-H Q12 shape (adapted: grouped by returnflag instead of the absent shipmode; 'late' = shipped >45 days after order): high- vs low-priority line counts among late shipments. One fact-to-fact join on orderkey (the year filter pushes to the lineitem scan first), then a conditional aggregation — counts, so exact by construction.",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy(F.col("l_returnflag").alias("return_class"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("return_class")
    )


@register(
    "q20_potential_promotion",
    oracle="""
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40)
ORDER BY s_name
""",
    doc="TPC-H Q20 shape (adapted: 'excess availability' = per-(supplier, part) shipped quantity over a threshold, replacing the absent partsupp availqty comparison): suppliers in a region who moved large volumes of a name-filtered part family. The nested IN chain becomes part-filter broadcast -> per-(supp, part) aggregate -> HAVING -> LEFT SEMI into the supplier dimension — every stage dimension-bounded after the single fact aggregation; quantities are integer-valued doubles, so the HAVING sum is exact.",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    movers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    doc="TPC-H Q21 shape (adapted: 'kept waiting' = shipped >60 days after order, replacing receipt-vs-commit lateness): suppliers who were the SOLE late shipper in a multi-supplier finished order. The EXISTS is a LEFT SEMI self-join on orderkey (different supplier), the NOT EXISTS a LEFT ANTI against the late-line set — both hash equi-joins on orderkey with the supplier inequality inside the join condition, preserving per-line EXISTS multiplicity; supplier/nation/region broadcast at the end.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint(eager=True)  # consumed as probe side AND anti side
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
