package graft.queries

import graft.io.Tables
import graft.ops.Temporal
import graft.util.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join queries over the `events` table, oracle-checked against
  * DuckDB's native forms (`ASOF JOIN` for z1; plain inequality joins —
  * which DuckDB plans as its IEJoin — for z2/z3). Spark instead runs the
  * scale rewrites in [[graft.ops.Temporal]]: the as-of as one keyed
  * window pass, the range joins as bin-bucketed equi-joins. Timestamps
  * are exact microsecond longs on both engines (the shared precision —
  * see SessionQueries).
  */
object TemporalQueries {

  /** Incident window length for the global range join (z2). */
  val WinUs: Long = 30L * 60 * 1000000
  /** Per-user attribution window for the keyed range join (z3). */
  val UserWinUs: Long = 24L * 3600 * 1000000
  /** Severity cut defining z2's incident windows (~10% of errors). */
  val SevCut = 100.0

  private def typed(s: SparkSession, dir: String, typ: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === typ)
      .withColumn("ts_us", expr("ts_ns div 1000"))

  /** z1: each click annotated with the latest at-or-before error of the
    * same user (value + its timestamp), nulls before a user's first
    * error. The ref side is pre-aggregated per (user, ts) so the as-of
    * winner is well-defined on both engines.
    */
  def z1AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ref = typed(s, dir, "error")
      .groupBy("user_id", "ts_us").agg(max("value").as("err_value"))
      .withColumn("err_ts_us", col("ts_us"))
    val probe = typed(s, dir, "click").select("event_id", "user_id", "ts_us")
    Temporal.asofJoin(probe, ref, Seq("user_id"), "ts_us")
      .select("event_id", "user_id", "ts_us", "err_value", "err_ts_us")
  }

  /** z2: GLOBAL range join (no key — the naive plan is a cartesian BNLJ):
    * severe errors open 30-minute incident windows over the whole system;
    * clicks landing in each window are counted and summed. Bin width =
    * window length, so each window replicates to ≤ 2 bins.
    */
  def z2RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val wins = typed(s, dir, "error").filter(col("value") >= SevCut)
      .select(col("event_id").as("win_id"), col("ts_us").as("start_us"),
        (col("ts_us") + WinUs).as("end_us"))
    val pts = typed(s, dir, "click").select(col("ts_us"), col("value"))
    Temporal.rangeJoin(pts, "ts_us", wins, "start_us", "end_us", WinUs)
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_pts"),
        Exact.dsum(col("value"), Exact.Fine).as("value_sum"))
  }

  /** z3: KEYED range join — every error opens a per-user 24 h window;
    * per user, how many (window, click) attributions and how many
    * distinct clicks land in at least one window.
    */
  def z3RangeJoinKeyed(s: SparkSession, dir: String): DataFrame = {
    val wins = typed(s, dir, "error")
      .select(col("user_id"), col("ts_us").as("start_us"),
        (col("ts_us") + UserWinUs).as("end_us"))
    val pts = typed(s, dir, "click")
      .select(col("event_id").as("pt_id"), col("user_id"), col("ts_us"))
    Temporal.rangeJoin(pts, "ts_us", wins, "start_us", "end_us", UserWinUs,
        keys = Seq("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("pt_id")).as("n_pts"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z1_asof_join" -> (z1AsofJoin _),
    "z2_range_join" -> (z2RangeJoin _),
    "z3_range_join_keyed" -> (z3RangeJoinKeyed _)
  )

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN is the same >= rule
    "z1_asof_join" ->
      """WITH ref AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
        |         max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |), p AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, p.user_id, p.ts_us, ref.err_value,
        |       ref.ts_us AS err_ts_us
        |FROM p ASOF LEFT JOIN ref
        |  ON p.user_id = ref.user_id AND p.ts_us >= ref.ts_us""".stripMargin,
    "z2_range_join" ->
      s"""WITH w AS (
         |  SELECT event_id AS win_id, epoch_ns(ts) // 1000 AS s
         |  FROM events WHERE event_type = 'error' AND value >= ${SevCut}
         |), p AS (
         |  SELECT epoch_ns(ts) // 1000 AS t, value
         |  FROM events WHERE event_type = 'click'
         |)
         |SELECT w.win_id, count(*) AS n_pts,
         |       (sum(p.value::DECIMAL(28,6)))::DOUBLE AS value_sum
         |FROM w JOIN p ON p.t >= w.s AND p.t < w.s + ${WinUs}
         |GROUP BY 1""".stripMargin,
    "z3_range_join_keyed" ->
      s"""WITH w AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS s
         |  FROM events WHERE event_type = 'error'
         |), p AS (
         |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t
         |  FROM events WHERE event_type = 'click'
         |)
         |SELECT w.user_id, count(*) AS n_pairs,
         |       count(DISTINCT p.event_id) AS n_pts
         |FROM w JOIN p
         |  ON p.user_id = w.user_id AND p.t >= w.s AND p.t < w.s + ${UserWinUs}
         |GROUP BY 1""".stripMargin
  )
}
