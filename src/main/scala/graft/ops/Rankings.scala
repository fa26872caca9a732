package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Argmax / top-k (SURVEY.md §2.4 A2, §2.5 W1/W2/W6). */
object Rankings {

  /** A2/W6 — deterministic argmax per group: the row with the maximum
    * `measure`, ties broken by ascending `tiebreak` (the reference's
    * Python `max` keeps first-seen dict order, `DIPA_Controller.py:485`;
    * we pin the lowest key instead, SURVEY.md §7.1).
    *
    * Implemented as row_number over (measure desc, tiebreak asc) — one
    * shuffle on the partition keys; at scale this is the standard
    * "top-1 per key" pattern with map-side partial sort.
    */
  def argmax(df: DataFrame, partition: Seq[String], measure: Column,
             tiebreak: Seq[Column]): DataFrame = {
    val w = (partition match {
      case Nil => Window.partitionBy()
      case ks  => Window.partitionBy(ks.map(col): _*)
    }).orderBy(measure.desc +: tiebreak.map(_.asc): _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  /** W1/W2 — deterministic ordered top-k. `order` must be a total order
    * (callers append a unique id as the final tiebreak).
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
