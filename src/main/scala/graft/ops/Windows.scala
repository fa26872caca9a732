package graft.ops

import graft.util.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive operators (SURVEY.md §2.5).
  *
  * All are single-shuffle window transforms: one hash partition on the key
  * columns, sort within partitions — the same layout a 1000-executor run
  * would use, with no driver-side state. Callers pick keys with enough
  * cardinality to spread (the flow key / user id, never a constant).
  */
object Windows {

  /** W3/J9 — per-key counter delta vs the previous row.
    *
    * The reference diffs successive poll snapshots positionally
    * (`ryu/src/deployed_controller/DIPA_Controller.py:461-463`); we key
    * properly by flow identity like `TestCase_2/Controller1.py:292` (see
    * SURVEY.md §7.1). Null delta on the first row per key.
    */
  def delta(df: DataFrame, keys: Seq[String], order: Seq[String],
            value: String, out: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn(out, col(value) - lag(col(value), 1).over(w))
  }

  /** W4/W5 — trailing count-window mean over the last `k` rows per key
    * (`TestCase_7/timeStamp2.py:342-348` deque(8);
    * `threaded_consumer.py:82-93` deque(5)). Exact decimal mean.
    */
  def slidingMean(df: DataFrame, keys: Seq[String], order: Seq[String],
                  value: String, k: Int, out: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-(k - 1), 0)
    df.withColumn(out, Exact.davgOver(col(value), w))
  }

  /** A1 prelude — latest row per key (the "last-seen counter" snapshot
    * semantics of `traf_dict[src] = {dst: count}`,
    * `DIPA_Controller.py:479`). `order` columns are taken descending and
    * must be a total order within each key for determinism.
    */
  def lastPerKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** C1-analog in batch — longest run of consecutive rows satisfying
    * `cond` per key (gaps-and-islands). The streaming twin is the
    * sustained-attack counter (`Controller1.py:417-429`), see
    * graft.streaming.StateMachines. Keys with no qualifying row are absent
    * from the output.
    */
  def longestStreak(df: DataFrame, keys: Seq[String], order: Seq[String],
                    cond: Column, out: String): DataFrame = {
    val wAll = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val marked = df.withColumn("__rn", row_number().over(wAll)).filter(cond)
    val island = marked
      .withColumn("__rn2", row_number().over(wAll))
      .withColumn("__isl", col("__rn") - col("__rn2"))
    island
      .groupBy((keys :+ "__isl").map(col): _*)
      .agg(count(lit(1)).as("__len"))
      .groupBy(keys.map(col): _*)
      .agg(max(col("__len")).as(out))
  }
}
