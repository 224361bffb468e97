package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import QueryHelpers._

/** The relational query surface (SURVEY.md §2.2 Layer B).
  *
  * The reference delegates its entire query surface to embedded DuckDB SQL
  * (reference: KwackEngine.java:226-257 passes the user's SQL verbatim).
  * Here the same surface is expressed Spark-first: DataFrame/Dataset API
  * compiled by Catalyst, one named query per operator class so the driver's
  * DuckDB oracle can hash-match each one at sf0.01.
  *
  * Scale: dimension joins broadcast explicitly; fact-fact joins shuffle on
  * their equi keys (sort-merge under AQE); all aggregates are partial
  * (map-side combine) by construction of groupBy().agg().
  */
object Relational {

  /** TPC-H Q1 shape: scan + filter + hash aggregate (partial/final),
    * exact decimal arithmetic surfaced as double. */
  private val q01: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumr(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
          .as("sum_disc_price"),
        dsumr(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount")))
          * (lit(1) + dec4(col("l_tax")))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .psort(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: tight scan-filter-aggregate; predicates push to parquet. */
  private val q02: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(
        dsumr(dec2(col("l_extendedprice")) * dec4(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q02Sql =
    """SELECT
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q5 shape: multi-way join. Dims (nation/region/customer at this
    * ratio) broadcast; lineitem-orders shuffles on the order key. */
  private val q03: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumr(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
        .as("revenue"))
      .psort(col("revenue").desc, col("n_name"))
  }

  private val q03Sql =
    """SELECT n_name,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Left outer join preserving customers with zero orders. */
  private val q04: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        asDouble(coalesce(sum(dec2(col("o_totalprice"))), lit(0).cast("decimal(12,2)")))
          .as("total_spend"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(50)
  }

  private val q04Sql =
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
      | CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY n_orders DESC, c_custkey LIMIT 50""".stripMargin

  /** Left-semi join (EXISTS): orders having any heavy lineitem. */
  private val q05: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    o.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .psort(col("o_orderstatus"))
  }

  private val q05Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_orders
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders since 2001. */
  private val q06: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .psort(col("c_mktsegment"))
  }

  private val q06Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Full outer join of two aggregates (customer vs supplier count per nation). */
  private val q07: Q = (s, dir) => {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .psort(col("nationkey"))
  }

  private val q07Sql =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      | COALESCE(n_customers, 0) AS n_customers,
      | COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  /** Cross join (tiny × tiny — Catalyst picks BNL/broadcast). */
  private val q08: Q = (s, dir) => {
    val r = t(s, dir, "region").select(col("r_name"))
    val st = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
    r.crossJoin(st)
      .psort(col("r_name"), col("o_orderstatus"))
  }

  private val q08Sql =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
      |ORDER BY r_name, o_orderstatus""".stripMargin

  /** Window row_number / rank: top-3 orders per customer (QUALIFY shape). */
  private val q09: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        asDouble(dec2(col("o_totalprice"))).as("price"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .psort(col("o_custkey"), col("rn"))
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey,
      | CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
      | ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders QUALIFY rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running aggregate + lag over a rows frame. */
  private val q10: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_custkey") <= 20)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        asDouble(sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_spend"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .psort(col("o_custkey"), col("o_orderkey"))
  }

  private val q10Sql =
    """SELECT o_custkey, o_orderkey,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_spend,
      | LAG(o_orderkey, 1) OVER w AS prev_orderkey,
      | LEAD(o_orderkey, 1) OVER w AS next_orderkey
      |FROM orders WHERE o_custkey <= 20
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** RANGE frame over event time (trailing 7 days), keyed by epoch seconds. */
  private val q11: Q = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_custkey") <= 20)
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_s"))
      .rangeBetween(-7L * 86400, 0)
    o.select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("orders_7d"))
      .psort(col("o_custkey"), col("o_orderkey"))
  }

  private val q11Sql =
    """SELECT o_custkey, o_orderkey,
      | COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS orders_7d
      |FROM orders WHERE o_custkey <= 20
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ORDER BY ... LIMIT/OFFSET (TopK with pagination). */
  private val q12: Q = (s, dir) => {
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), asDouble(dec2(col("o_totalprice"))).as("price"))
      .offset(5).limit(20)
  }

  private val q12Sql =
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_agg_pricing" -> q01,
    "q02_scan_filter_agg" -> q02,
    "q03_join_multiway" -> q03,
    "q04_join_left" -> q04,
    "q05_join_semi" -> q05,
    "q06_join_anti" -> q06,
    "q07_join_full" -> q07,
    "q08_join_cross" -> q08,
    "q09_window_topk" -> q09,
    "q10_window_running" -> q10,
    "q11_window_range" -> q11,
    "q12_sort_limit_offset" -> q12)

  val oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" -> q01Sql,
    "q02_scan_filter_agg" -> q02Sql,
    "q03_join_multiway" -> q03Sql,
    "q04_join_left" -> q04Sql,
    "q05_join_semi" -> q05Sql,
    "q06_join_anti" -> q06Sql,
    "q07_join_full" -> q07Sql,
    "q08_join_cross" -> q08Sql,
    "q09_window_topk" -> q09Sql,
    "q10_window_running" -> q10Sql,
    "q11_window_range" -> q11Sql,
    "q12_sort_limit_offset" -> q12Sql)
}
