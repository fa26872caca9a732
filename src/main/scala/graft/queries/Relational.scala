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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
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
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
