package graft.queries

import graft.io.Tables
import graft.util.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: the aggregate / join / set-op / window capability
  * surface of the reference engine (SURVEY.md §2.3–2.6), instantiated over
  * the driver's shared test tables so each query has a DuckDB oracle twin.
  *
  * Each entry is a pure (SparkSession, sfDir) => DataFrame; the matching
  * ANSI SQL lives in the `oracle` map below. Column names/aliases are kept
  * identical on both sides (the driver's compare is name-sorted).
  */
object Relational {

  /** A5 aggregate stats (testCase4.py:304-314 analog) scaled up to the
    * classic pricing-summary shape: exact decimal sums, map-side partial
    * aggregation, single shuffle on the (tiny-cardinality) group keys.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Fine), Fine)
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** J1/J3 — broadcast dimension enrichment chained through a multi-way
    * join (region←nation←customer←orders←lineitem), the scaled-up analog of
    * the reference's dict lookups (`DIPA_Controller.py:441-444`,
    * `Controller1.py:158-163`). nation/region are broadcast; the
    * orders⋈lineitem join shuffles on the key both sides already share.
    */
  def j3DimJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Fine), Fine)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** J7 — anti join: customers with no finalized ('F') order, per nation
    * (pushback detection `Controller1.py:395-413` — victims with no local
    * attackers originate from another domain). The filter is pushed below
    * the anti join; nation is broadcast.
    */
  def j7AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val n = Tables.nation(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers_no_f_orders"))
  }

  /** J6 — semi join gating an aggregate (bias ratio only for flagged
    * sources, `DIPA_Controller.py:470-471 + 489`): order stats restricted
    * to customers over an account-balance threshold.
    */
  def j6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"))
  }

  /** J4 — equi join with theta residual (attacker attribution
    * `Controller1.py:476-487`: join on key, keep rows over a rate
    * threshold): lineitems priced above their supplier's account balance.
    */
  def j4ThetaResidual(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir)
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .filter(col("l_extendedprice") > col("s_acctbal"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_hot_lines"),
           dsum(col("l_quantity")).as("sum_qty"))
  }

  /** J2 — lookup with default (MAC-learning table lookup, FLOOD when
    * absent, `DIPA_Controller.py:257-265`): orders routed to the name of a
    * high-balance customer, 'FLOOD' otherwise.
    */
  def j2LookupDefault(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val learned = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"))
    o.join(broadcast(learned), o("o_custkey") === learned("c_custkey"), "left")
      .select(col("o_orderkey"),
              coalesce(col("c_name"), lit("FLOOD")).as("route"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "j3_dim_join_agg" -> (j3DimJoinAgg _),
    "j7_anti_join" -> (j7AntiJoin _),
    "j6_semi_join" -> (j6SemiJoin _),
    "j4_theta_residual" -> (j4ThetaResidual _),
    "j2_lookup_default" -> (j2LookupDefault _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "j3_dim_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "j7_anti_join" ->
      """SELECT n_name, COUNT(*) AS n_customers_no_f_orders
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY n_name""".stripMargin,
    "j6_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
        |GROUP BY o_orderpriority""".stripMargin,
    "j4_theta_residual" ->
      """SELECT s_name, COUNT(*) AS n_hot_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_extendedprice > s_acctbal
        |GROUP BY s_name""".stripMargin,
    "j2_lookup_default" ->
      """SELECT o_orderkey, COALESCE(c_name, 'FLOOD') AS route
        |FROM orders LEFT JOIN (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
        |) ON o_custkey = c_custkey""".stripMargin
  )
}
