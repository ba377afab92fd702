package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.queries.Export._

/** Relational core: the reference's query surface (SURVEY §2.3–§2.7 —
  * filter/project, group-agg A1–A3, sorts/top-k W1–W3, plus the joins
  * and set-ops the DataFrame surface gives for free) exercised on the
  * fixture star schema.
  *
  * Determinism rules shared by every oracle-checked query (the driver
  * hash-compares against DuckDB on identical SQL):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - every double output is `round`ed (sums → 2 dp, avgs → 4 dp) so
  *    summation-order noise cannot flip the hash;
  *  - timestamps are emitted as formatted strings (parquet INT96 vs
  *    DuckDB micros would otherwise differ in dtype);
  *  - every query ends in a total ORDER BY (all key columns, no nulls
  *    in sort keys — Spark sorts nulls first ASC, DuckDB last).
  *
  * Scale notes: aggregations are plain groupBy → HashAggregateExec
  * with partial (map-side) aggregation before the shuffle; dimension
  * joins broadcast (region/nation/supplier stay tiny at any SF — they
  * scale with warehouses, not with fact rows); fact-fact joins
  * (orders⋈lineitem) shuffle on the join key and AQE handles skew.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (SURVEY A1: hash aggregate with
    * multiple aggs + W3 sort). Filter is pushed to the parquet scan.
    * Cite: reference group-agg at sentiment_analysis.py:456-482. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-12-31").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .domainOrdered($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** W1 top-k by recency: ORDER BY date DESC LIMIT k →
    * TakeOrderedAndProjectExec (per-partition top-k, merged at the
    * driver; no full sort). Cite: sentiment_analysis.py:530-559. */
  def recentOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      .limit(50)
      .select($"o_orderkey", $"o_custkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        round($"o_totalprice", 2).as("total_price"),
        $"o_orderstatus")
  }

  val recentOrdersSql: String =
    """SELECT o_orderkey, o_custkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  round(o_totalprice, 2) AS total_price, o_orderstatus
      |FROM orders
      |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 50""".stripMargin

  /** F2-style conditional filter + projection; filter and the 4-column
    * projection both reach the parquet scan (PushedFilters/ReadSchema). */
  def filterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderstatus" === "O" && $"o_totalprice" > 100000.0)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 2).as("total_price"), $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  val filterProjectSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price, o_orderpriority
      |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
      |ORDER BY o_orderkey""".stripMargin

  /** The latent tweet⋈author join (SURVEY §2.4) as a broadcast dim
    * join chain: fact(customer) ⋈ broadcast(nation) ⋈ broadcast(region).
    * At 100 TB the dims are still KB-sized → broadcast is the right
    * physical plan; asserting it here via explicit broadcast() hints. */
  def customerByRegion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        round(avg($"c_acctbal"), 4).as("avg_bal"),
        round(sum($"c_acctbal"), 2).as("sum_bal"))
      .domainOrdered($"r_name", $"n_name")
  }

  val customerByRegionSql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  round(avg(c_acctbal), 4) AS avg_bal, round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q5-style multi-join: two fact tables shuffle-join on
    * l_orderkey; all dims broadcast. Revenue per nation in one region
    * and date window. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter($"r_name" === "EUROPE")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .domainOrdered($"n_name")
  }

  val revenueByNationSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND r_name = 'EUROPE'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window function: top-3 orders per customer (the idiomatic
    * generalization of W1 "top-k per sentiment", SURVEY §2.6). */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice", 2).as("total_price"), $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  val topOrdersPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** A2 grand-total rollup realized with ROLLUP (one pass instead of
    * the reference's Python-side re-sum, sentiment_analysis.py:628).
    * Rolled-up keys coalesced to 'ALL' so sort keys are null-free. */
  def rollupPriorities(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("sum_price"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n_orders", $"sum_price")
      .domainOrdered($"priority", $"status")
  }

  val rollupPrioritiesSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Set operations (SURVEY §2.7): UNION distinct then EXCEPT. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val rich = c.filter($"c_acctbal" > 7000.0).select($"c_custkey")
    val excluded = c.filter($"c_nationkey" === 3).select($"c_custkey")
    building.union(rich).distinct().except(excluded).orderBy($"c_custkey")
  }

  val setOpsSql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey FROM customer WHERE c_acctbal > 7000.0)
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_nationkey = 3
      |ORDER BY c_custkey""".stripMargin

  /** Distinct aggregation (beyond-reference, SURVEY §2.5 note):
    * count(distinct) expands via Catalyst's two-phase Expand plan. */
  def distinctParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_suppliers"),
        countDistinct($"l_partkey").as("n_parts"),
        count(lit(1)).as("n_lines"))
      .domainOrdered($"l_returnflag")
  }

  val distinctPartsSql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
      |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Left-semi join (EXISTS): customers that have orders, per nation. */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .domainOrdered($"c_nationkey")
  }

  val customersWithOrdersSql: String =
    """SELECT c_nationkey, count(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .orderBy($"c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Correlated scalar subquery (Catalyst decorrelates to an
    * aggregate + join — SURVEY §4 "free if/when used"): customers
    * richer than their nation's average balance. */
  def aboveNationAverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val natAvg = c.groupBy($"c_nationkey".as("nk"))
      .agg(avg($"c_acctbal").as("nation_avg"))
    c.join(natAvg, $"c_nationkey" === $"nk")
      .filter($"c_acctbal" > $"nation_avg")
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal", 2).as("acctbal"),
        round($"nation_avg", 4).as("nation_avg"))
      .orderBy($"c_custkey")
  }

  val aboveNationAverageSql: String =
    """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal,
      |  round(nation_avg, 4) AS nation_avg
      |FROM customer
      |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
      |      FROM customer GROUP BY c_nationkey) ON c_nationkey = nk
      |WHERE c_acctbal > nation_avg
      |ORDER BY c_custkey""".stripMargin

  /** CUBE grouping (all 4 grouping-set combinations in one pass). */
  def cubeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(avg($"o_totalprice"), 4).as("avg_price"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n_orders", $"avg_price")
      .domainOrdered($"priority", $"status")
  }

  val cubeOrdersSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Full outer join: per-nation customer vs supplier counts, keeping
    * nations present on either side only. */
  def customerSupplierBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).groupBy($"c_nationkey".as("nk_c"))
      .agg(count(lit(1)).as("n_customers"))
    val su = Tables.supplier(s, dir).groupBy($"s_nationkey".as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(su, $"nk_c" === $"nk_s", "full_outer")
      .select(coalesce($"nk_c", $"nk_s").as("nationkey"),
        coalesce($"n_customers", lit(0L)).as("n_customers"),
        coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
      .domainOrdered($"nationkey")
  }

  val customerSupplierBalanceSql: String =
    """SELECT coalesce(nk_c, nk_s) AS nationkey,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |  ON nk_c = nk_s
      |ORDER BY nationkey""".stripMargin

  /** Pivot: order counts per priority pivoted on status (fixed value
    * list → stable output columns). */
  def pivotOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"o_orderpriority", $"F".as("n_f"), $"O".as("n_o"), $"P".as("n_p"))
      .domainOrdered($"o_orderpriority")
  }

  val pivotOrdersSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q68: UNPIVOT/melt (the wide→long reshape every feature pipeline
    * needs; Dataset.unpivot is the Spark 3.4+ native op — ids stay,
    * value columns become (metric, value) rows) followed by a
    * per-metric profile. Map-side reshape (no shuffle until the
    * 3-group aggregate); the unpivot multiplies rows 3× but narrows
    * them to one double each, so the exchange carries less than the
    * source scan. */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .unpivot(
        ids = Array($"l_orderkey"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        variableColumnName = "metric",
        valueColumnName = "v")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"),
        round(avg($"v"), 4).as("avg_v"),
        round(min($"v"), 2).as("min_v"),
        round(max($"v"), 2).as("max_v"))
      .domainOrdered($"metric")
  }

  val unpivotMetricsSql: String =
    """SELECT metric, count(*) AS n, round(avg(v), 4) AS avg_v,
      |  round(min(v), 2) AS min_v, round(max(v), 2) AS max_v
      |FROM (
      |  UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount FROM lineitem)
      |  ON l_quantity, l_extendedprice, l_discount
      |  INTO NAME metric VALUE v)
      |GROUP BY metric ORDER BY metric""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_unpivot_metrics" -> (unpivotMetrics _),
    "q25_above_nation_avg" -> (aboveNationAverage _),
    "q26_cube_orders" -> (cubeOrders _),
    "q60_full_outer_balance" -> (customerSupplierBalance _),
    "q61_pivot_orders" -> (pivotOrders _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_recent_orders" -> (recentOrders _),
    "q03_filter_project" -> (filterProject _),
    "q04_customer_by_region" -> (customerByRegion _),
    "q05_revenue_by_nation" -> (revenueByNation _),
    "q06_top_orders_per_customer" -> (topOrdersPerCustomer _),
    "q07_rollup_priorities" -> (rollupPriorities _),
    "q08_set_ops" -> (setOps _),
    "q09_distinct_parts" -> (distinctParts _),
    "q10_customers_with_orders" -> (customersWithOrders _),
    "q11_customers_without_orders" -> (customersWithoutOrders _),
  )

  val oracles: Map[String, String] = Map(
    "q25_above_nation_avg" -> aboveNationAverageSql,
    "q26_cube_orders" -> cubeOrdersSql,
    "q60_full_outer_balance" -> customerSupplierBalanceSql,
    "q61_pivot_orders" -> pivotOrdersSql,
    "q68_unpivot_metrics" -> unpivotMetricsSql,
    "q01_pricing_summary" -> pricingSummarySql,
    "q02_recent_orders" -> recentOrdersSql,
    "q03_filter_project" -> filterProjectSql,
    "q04_customer_by_region" -> customerByRegionSql,
    "q05_revenue_by_nation" -> revenueByNationSql,
    "q06_top_orders_per_customer" -> topOrdersPerCustomerSql,
    "q07_rollup_priorities" -> rollupPrioritiesSql,
    "q08_set_ops" -> setOpsSql,
    "q09_distinct_parts" -> distinctPartsSql,
    "q10_customers_with_orders" -> customersWithOrdersSql,
    "q11_customers_without_orders" -> customersWithoutOrdersSql,
  )
}
