package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log — the standard prelude to
  * per-session training-data aggregation (conversation threads, browse
  * sessions, attack campaigns).
  *
  * Two forms with IDENTICAL session semantics (events merge while the gap
  * to the previous event is < `gap`, the merge rule of Spark's
  * `session_window`):
  *
  *  - [[sessionize]] — batch, assigns each EVENT its per-key session
  *    ordinal. One hash shuffle on the key + one in-partition sort; both
  *    window passes (lag, running sum) share that single sort, so the
  *    plan is one exchange regardless of data size.
  *  - [[sessionStats]] — per-SESSION rollup via the native `session_window`
  *    group, the streaming-capable form: with `withWatermark` it runs
  *    incrementally under Structured Streaming, state per OPEN session
  *    only (closed sessions emit and evict at the watermark — bounded
  *    state at any ingest scale; SessionsSpec proves batch/stream parity).
  *
  * [[sessionize]] takes any integer timestamp column (unit-agnostic —
  * caller pairs it with a gap in the same unit); [[sessionStats]] takes a
  * proper timestamp column (Spark timestamps are micros). The SQL oracles
  * replay each on the identical integer representation.
  */
object Sessions {

  /** Per-event session ordinal (1-based, in event-time order per key).
    * `tsCol` is an integer timestamp in any unit, `maxGap` in the same
    * unit; ties are a zero gap, always merged.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 maxGap: Long, out: String = "session_seq"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("__brk",
        when(prev.isNull || col(tsCol) - prev >= maxGap, 1L).otherwise(0L))
      .withColumn(out, sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Session-level rollup: (keys, session start, session end = last event
    * + gap, event count, exact value sum). Batch form of the streaming
    * query — swap `df` for a stream with `withWatermark(tsCol, …)` and the
    * same expression runs incrementally.
    */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   gap: String, valueCol: Option[Column] = None): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +:
      valueCol.map(v => graft.util.Exact.dsum(v, graft.util.Exact.Fine)
        .as("value_sum")).toSeq
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(col) ++ Seq(
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events")) ++ valueCol.map(_ => col("value_sum")).toSeq: _*)
  }
}
