package graft.queries

import graft.io.Tables
import graft.ops.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sessionization over the `events` table: per-event session ordinals
  * (gaps-and-islands) and per-session rollups via the native
  * `session_window` (the streaming form — SessionsSpec runs the identical
  * expression under a watermark). Both engines sessionize on exact
  * MICROSECOND longs — the finest representation both share: Spark's
  * timestamp type is micros, and DuckDB's parquet reader truncates the
  * table's TIMESTAMP(NANOS) to micros on read — so every gap decision is
  * integer-exact and engine-identical.
  */
object SessionQueries {

  /** Session gap. Events merge while the inter-event gap is < 12 h
    * (median per-user gap in the fixture is ~7 h, so sessions are
    * non-trivially sized without being one-per-user).
    */
  val GapHours = 12
  private val GapUs = GapHours * 3600L * 1000000L

  def p1Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessions.sessionize(
        Tables.events(s, dir).withColumn("ts_us", expr("ts_ns div 1000")),
        Seq("user_id"), "ts_us", GapUs)
      .select("event_id", "user_id", "ts_us", "session_seq")

  def p2SessionStats(s: SparkSession, dir: String): DataFrame =
    Sessions.sessionStats(Tables.events(s, dir), Seq("user_id"), "ts",
      s"$GapHours hours", valueCol = Some(col("value")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_sessionize" -> (p1Sessionize _),
    "p2_session_stats" -> (p2SessionStats _)
  )

  val oracle: Map[String, String] = Map(
    // same break rule (gap >= GapUs) over the same exact microsecond longs
    "p1_sessionize" ->
      s"""WITH o AS (
         |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
         |    CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
         |         OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w >= ${GapUs}
         |    THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |)
         |SELECT event_id, user_id, ts_us,
         |  (sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us))::BIGINT AS session_seq
         |FROM o""".stripMargin,
    // micros representation (the Spark timestamp precision), session end =
    // last event + gap, exact decimal value sum
    "p2_session_stats" ->
      s"""WITH o AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
         |    CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
         |         OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w >= ${GapUs}
         |    THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sid AS (
         |  SELECT user_id, tu, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY tu) AS sq
         |  FROM o
         |)
         |SELECT user_id, min(tu) AS session_start_us,
         |  max(tu) + ${GapUs} AS session_end_us,
         |  count(*) AS n_events,
         |  (sum(value::DECIMAL(28,6)))::DOUBLE AS value_sum
         |FROM sid GROUP BY user_id, sq""".stripMargin
  )
}
