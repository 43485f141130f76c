package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator surface over the TPC-H-ish testdata.
  *
  * The reference engine (govau/warcraider) feeds a BigQuery table whose
  * analytic role these queries reproduce Spark-side (SURVEY.md §2.5,
  * `load.bat:1-10`): joins, aggregations, windows, set ops arrive via
  * Catalyst rather than hand-written Rust.
  *
  * Determinism contract with the DuckDB oracle: every aggregate over a
  * double column is computed in decimal(18,2) (exact, order-insensitive)
  * and only the final value is cast back to double, so the hash compare
  * cannot be broken by float summation order across partitions. Every
  * query ends in a total ORDER BY.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins (region/nation/supplier/customer) use explicit
  *    `broadcast()` — no shuffle of the fact table for dim joins;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once,
  *    and aggregations are partial (map-side combine) by construction;
  *  - all filters/projections are plain column expressions → pushed into
  *    the parquet scan (PushedFilters / ReadSchema verified via explain).
  */
object Relational {

  /** Exact money arithmetic: double → decimal(18,2). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def asDbl(c: Column): Column = c.cast("double")

  // q01: full-scan aggregation (TPC-H Q1 flavor). SURVEY §2.5 A2/A6 shape.
  def q01_agg_pricing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        asDbl(sum(dec($"l_quantity"))).as("sum_qty"),
        asDbl(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        asDbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // q02: filter + projection — predicate pushdown showcase (SURVEY §2.2 F1/F2).
  def q02_filter_project(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-03-01").cast("timestamp") &&
        $"l_quantity" < 5)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // q03: star-schema dim join — both dims broadcast, zero fact shuffle
  // until the final (tiny) aggregation.
  def q03_join_broadcast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        asDbl(sum(dec($"c_acctbal"))).as("total_acctbal"))
      .orderBy($"r_name", $"n_name")
  }

  // q04: fact-fact shuffle join (orders ⋈ lineitem on orderkey).
  def q04_join_shuffle(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_orderkey").as("n_orders"),
        asDbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))))
          .as("revenue"))
      .orderBy($"o_orderpriority")
  }

  // q05: 6-table join (TPC-H Q5 flavor): dims broadcast, facts shuffled once.
  def q05_multi_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.supplier(s, d)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(asDbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))))
        .as("revenue"))
      .orderBy($"n_name")
  }

  // q06: semi join (EXISTS) — customers that have at least one order.
  def q06_semi_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  // q07: anti join (NOT EXISTS with correlated predicate) — customers that
  // never placed a high-value order, per nation.
  def q07_anti_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 300000)
    Tables.customer(s, d)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }

  // q08: window rank — top-3 orders per customer (deterministic tiebreak).
  def q08_window_rank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  // q09: running window aggregate over the events stream table.
  def q09_window_running(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", asDbl(sum(dec($"value")).over(w)))
      .select($"user_id", $"event_id", $"event_type", $"running_value")
      .orderBy($"user_id", $"event_id")
  }

  // q10: distinct aggregation (expand-based in Spark; exact, oracle-checkable).
  def q10_distinct_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  // q11: set operators — INTERSECT / EXCEPT over nation-key sets.
  def q11_set_ops(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d).select($"c_nationkey".as("nk")).distinct()
    val supp = Tables.supplier(s, d).select($"s_nationkey".as("nk")).distinct()
    val both    = cust.intersect(supp).withColumn("tag", lit("cust_and_supp"))
    val custNot = cust.except(supp).withColumn("tag", lit("cust_not_supp"))
    val suppNot = supp.except(cust).withColumn("tag", lit("supp_not_cust"))
    both.unionByName(custNot).unionByName(suppNot)
      .select($"tag", $"nk")
      .orderBy($"tag", $"nk")
  }

  // q12: rollup (hierarchical subtotal) over region → nation.
  def q12_rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        asDbl(sum(dec($"c_acctbal"))).as("total_acctbal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  // q13: conditional projection (SURVEY §2.2 F3 when/otherwise shape).
  def q13_case_bucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("bucket",
        when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high"))
      .groupBy($"bucket", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"bucket", $"o_orderstatus")
  }

  // q14: time-series bucketing over events (day grain × event type).
  def q14_timeseries(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        asDbl(sum(dec($"value"))).as("total_value"))
      .orderBy($"day", $"event_type")
  }

  // q15: global top-k (order + limit; TakeOrderedAndProject physically).
  def q15_topk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  // q16: group-filter (HAVING).
  def q16_having(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        asDbl(sum(dec($"o_totalprice"))).as("total_spend"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  val oracle: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q04_join_shuffle" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_multi_join" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q09_window_running" ->
      """SELECT user_id, event_id, event_type,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |   PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_set_ops" ->
      """WITH ci AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        | si AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'cust_and_supp' AS tag, nk FROM (SELECT nk FROM ci INTERSECT SELECT nk FROM si) a
        |UNION ALL
        |SELECT 'cust_not_supp' AS tag, nk FROM (SELECT nk FROM ci EXCEPT SELECT nk FROM si) b
        |UNION ALL
        |SELECT 'supp_not_cust' AS tag, nk FROM (SELECT nk FROM si EXCEPT SELECT nk FROM ci) c
        |ORDER BY tag, nk""".stripMargin,
    "q12_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q13_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |  WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
        | o_orderstatus, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_timeseries" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q16_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY 1 HAVING COUNT(*) >= 15 ORDER BY 1""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing"    -> (q01_agg_pricing _),
    "q02_filter_project" -> (q02_filter_project _),
    "q03_join_broadcast" -> (q03_join_broadcast _),
    "q04_join_shuffle"   -> (q04_join_shuffle _),
    "q05_multi_join"     -> (q05_multi_join _),
    "q06_semi_join"      -> (q06_semi_join _),
    "q07_anti_join"      -> (q07_anti_join _),
    "q08_window_rank"    -> (q08_window_rank _),
    "q09_window_running" -> (q09_window_running _),
    "q10_distinct_agg"   -> (q10_distinct_agg _),
    "q11_set_ops"        -> (q11_set_ops _),
    "q12_rollup"         -> (q12_rollup _),
    "q13_case_bucket"    -> (q13_case_bucket _),
    "q14_timeseries"     -> (q14_timeseries _),
    "q15_topk"           -> (q15_topk _),
    "q16_having"         -> (q16_having _),
  )
}
