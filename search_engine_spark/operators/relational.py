"""Classical relational operators over the star schema — the SURVEY §2.F
checklist made explicit (the reference exercises these shapes through JPA
finders; here they are first-class DataFrame plans with oracle pairs).

Join-strategy notes (the 100 TB story):

* dimension joins (region/nation/customer) BROADCAST — the build side is
  KBs; `F.broadcast` pins the hint so Catalyst never sort-merges a
  dimension. At scale the fact side streams with zero shuffle.
* semi/anti joins are the reference's load-bearing shapes (candidate
  shrinking `findByLemmaAndPageIn`, new-page dedup anti-join); expressed
  as `left_semi` / `left_anti` they stay null-safe and never duplicate
  fact rows (a plain inner join + distinct would).
* the window examples partition by customer — bounded partitions (a
  customer's orders), no global sort.
* rollup produces the per-group + subtotal + grand-total lattice in ONE
  pass (map-side partial aggs per grouping set), replacing N separate
  aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan → filter → hash agg. Exact arithmetic via
    DECIMAL so the oracle hashes identically."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("decimal(18,2)").cast("double").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → dim chain: lineitem ⋈ orders ⋈ customer ⋈ nation, grouped by
    nation name. Only TRUE dimensions broadcast: nation is 25 rows forever,
    but customer is a SCALING table (150k×SF rows) — pinning
    F.broadcast(customer) would OOM the driver at 100×, so that join is
    left to Catalyst/AQE (broadcast while it fits, shuffle join beyond)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    rev = (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having ≥1 order (the reference's
    shrinking-candidate shape, model/IndexRepository.java:12)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders (the reference's new-page dedup
    shape, dto/indexing/PageAnalyzer.java:419-422)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )


def order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer order sequence + running spend.
    (row_number, running sum over an ordered bounded frame)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.sum(dec).over(w).cast("decimal(18,2)").cast("double").alias("running_spend"),
    )


def status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (o_orderstatus, o_orderpriority): group rows + per-status
    subtotals + grand total in one pass; null marker normalized to 'ALL'."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


def top_parts_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: 3 largest retail prices per brand, row_number
    with the p_partkey tiebreak (NOT dense_rank — that would emit more
    than 3 rows on price ties and break parity with top_parts_sql)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.select(
            "p_brand", "p_partkey",
            F.col("p_retailprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str,
                           brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q17 shape — the CORRELATED SCALAR SUBQUERY decorrelated:
    "average yearly revenue lost if small-quantity orders of a brand's
    parts were not filled". The correlated `l_quantity < 0.2 * (SELECT
    avg(l_quantity) ... same part)` becomes a per-part aggregate joined
    back — the standard decorrelation every optimizer performs, written
    explicitly so the plan is one agg + one join, never a per-row
    subquery.

    Scale shape: the per-part avg is a map-side-combinable groupBy on
    l_partkey (maximal-cardinality key); the brand filter prunes the
    part side to a small dimension slice that AQE broadcasts into both
    joins. DECIMAL arithmetic end-to-end; one-row result
    (avg_yearly 2-dp)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    dqty = F.col("l_quantity").cast("decimal(18,2)")
    stats = li.groupBy("l_partkey").agg(
        F.sum(dqty).cast("decimal(18,2)").alias("sum_qty"),
        F.count("*").alias("n_li"),
    )
    # qty < 0.2·avg  ⟺  5·n·qty < sum  — exact decimal/integer arithmetic,
    # no division, so both engines evaluate the SAME predicate bit-for-bit
    pred = (
        dqty * F.lit(5).cast("decimal(10,0)") * F.col("n_li").cast("decimal(10,0)")
        < F.col("sum_qty")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(stats, "l_partkey")
        .filter(pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )
