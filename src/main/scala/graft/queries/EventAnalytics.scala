package graft.queries

import graft.io.Tables
import graft.ops.{Rankings, Windows}
import graft.util.Exact
import graft.util.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's streaming-analytics operator surface (SURVEY.md §2.4–2.6)
  * instantiated over the `events` stream table: per-key deltas, trailing
  * count-window means, argmax election, last-snapshot aggregation,
  * cross-domain anomaly statistics, set-difference alert gating.
  *
  * `Tables.events` exposes `ts_ns` (epoch-nanosecond long) on every physical
  * encoding of the table, so all ordering uses `ts_ns, event_id` — identical
  * to DuckDB's `ts, event_id` ordering.
  */
object EventAnalytics {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** W3/J9 — per-key counter delta (`DIPA_Controller.py:461-463`, keyed by
    * identity per SURVEY §7.1).
    */
  def w3Delta(s: SparkSession, dir: String): DataFrame =
    Windows.delta(ev(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"), "value", "delta")
      .select(col("event_id"), col("user_id"), col("delta"))

  /** W4 — trailing 8-row mean per key (`timeStamp2.py:342-348` deque(8)). */
  def w4SlidingMean(s: SparkSession, dir: String): DataFrame =
    Windows.slidingMean(ev(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"), "value", 8, "win_avg")
      .select(col("event_id"), col("user_id"), col("win_avg"))

  /** C1 batch twin — longest sustained run over threshold per key
    * (`Controller1.py:417-429` sustained-attack counter).
    */
  def c1LongestStreak(s: SparkSession, dir: String): DataFrame =
    Windows.longestStreak(ev(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
      col("value") > 100.0, "max_streak")

  /** A1 — sum over the last-seen snapshot per (key, subkey)
    * (`traf_dict[src][dst]` last-write semantics then per-src sum,
    * `DIPA_Controller.py:479-481`).
    */
  def a1LastSnapshotSum(s: SparkSession, dir: String): DataFrame =
    Windows.lastPerKey(ev(s, dir), Seq("user_id", "event_type"), Seq("ts_ns", "event_id"))
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("snapshot_total"),
           count(lit(1)).as("n_types"))

  /** A2/W6 — deterministic argmax: the top spender per event type
    * (CNC election `DIPA_Controller.py:485`, min-key tie-break).
    */
  def a2Argmax(s: SparkSession, dir: String): DataFrame = {
    val totals = ev(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(dsum(col("value")).as("total"))
    Rankings.argmax(totals, Seq("event_type"), col("total"), Seq(col("user_id")))
      .select(col("event_type"), col("user_id"), col("total"))
  }

  /** A7/W5 — cross-domain anomaly statistics: per key the mean of the last
    * 5 observations, then mean/stddev across keys, emitted only when >= 2
    * keys reported ("collaborative mode", `threaded_consumer.py:82-100`).
    *
    * Engine-exactness: the per-key mean is kept as an EXACT decimal by
    * scaling — the window holds n_k <= 5 rows and lcm(1..5) = 60, so
    * `M = s * (60 / n_k)` is an integer multiple of the decimal sum `s`,
    * never a rounded quotient. All aggregation happens over M and M*M in
    * decimal (exact), and only the final few double ops (two divisions, a
    * multiply, sqrt, /60) run in floating point — identical IEEE results
    * on any engine. Casting a double `m*m` to decimal instead (the
    * previous formulation) hits round-half TIES that Spark and DuckDB
    * break differently (~1-ulp std divergence, seen at sf0.1).
    */
  def a7AnomalyStats(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val mult = when(col("nk") === 1, 60).when(col("nk") === 2, 30)
      .when(col("nk") === 3, 20).when(col("nk") === 4, 15).otherwise(12)
    val scaled = e.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("value").cast(Exact.Money)).as("s"), count(lit(1)).as("nk"))
      .withColumn("M", col("s") * mult) // exact decimal: 60x the last-5 mean
    scaled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
           sum(col("M")).cast("double").as("S"),
           sum(col("M") * col("M")).cast("double").as("S2"))
      .filter(col("n_users") >= 2)
      .select(col("event_type"), col("n_users"),
        (col("S") / col("n_users") / 60).as("mean_rate"),
        (sqrt(greatest(
          col("S2") / col("n_users") -
            (col("S") / col("n_users")) * (col("S") / col("n_users")),
          lit(0.0))) / 60).as("std_rate"))
  }

  /** A6 — gated min/max/mean merge (`threaded_consumer.py:63-75`): per
    * event type, extrema and exact mean, only for types seen by enough
    * distinct keys (the "all domains reported" barrier).
    */
  def a6GatedMinMax(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).groupBy(col("event_type"))
      .agg(min(col("value")).as("min_value"),
           max(col("value")).as("max_value"),
           davg(col("value")).as("mean_value"),
           countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_users") >= 5)

  /** E1 — set difference (alert-once gating, `DIPA_Controller.py:327-328`):
    * (key, day) pairs with a click but no purchase that day.
    */
  def e1Except(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).withColumn("day", to_date(col("ts")))
    e.filter(col("event_type") === "click").select(col("user_id"), col("day")).distinct()
      .except(e.filter(col("event_type") === "purchase").select(col("user_id"), col("day")).distinct())
  }

  /** E2 — union-distinct (blacklist merge, `DIPA_Controller.py:331,346`). */
  def e2Union(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    e.filter(col("event_type") === "error").select(col("user_id"))
      .union(e.filter(col("event_type") === "signup").select(col("user_id")))
      .distinct()
  }

  /** E3 — intersection (scope guard, `Controller1.py:345`). */
  def e3Intersect(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    e.filter(col("event_type") === "click").select(col("user_id")).distinct()
      .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")).distinct())
  }

  /** O12/A4 — compromise percentage: scalar aggregate divided by dimension
    * count via a 1-row cross join (`DIPA_Controller.py:348`).
    */
  def o12CompromisePct(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val flagged = e.filter(col("event_type") === "error")
      .agg(countDistinct(col("user_id")).as("n_flagged"))
    val total = e.agg(countDistinct(col("user_id")).as("n_total"))
    flagged.crossJoin(total)
      .select(col("n_flagged"), col("n_total"),
              (lit(100.0) * col("n_flagged") / col("n_total")).as("pct"))
  }

  /** W1 — deterministic ordered top-k (stat-table ordering,
    * `TestCase_5/timeStamp.py:289-291`).
    */
  def w1TopK(s: SparkSession, dir: String): DataFrame =
    Rankings.topK(ev(s, dir).select(col("event_id"), col("user_id"), col("value")),
      Seq(col("value").desc, col("event_id").asc), 15)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w3_delta" -> (w3Delta _),
    "w4_sliding_mean" -> (w4SlidingMean _),
    "c1_longest_streak" -> (c1LongestStreak _),
    "a1_last_snapshot_sum" -> (a1LastSnapshotSum _),
    "a2_argmax" -> (a2Argmax _),
    "a7_anomaly_stats" -> (a7AnomalyStats _),
    "a6_gated_minmax" -> (a6GatedMinMax _),
    "e1_except" -> (e1Except _),
    "e2_union" -> (e2Union _),
    "e3_intersect" -> (e3Intersect _),
    "o12_compromise_pct" -> (o12CompromisePct _),
    "w1_topk" -> (w1TopK _)
  )

  val oracle: Map[String, String] = Map(
    "w3_delta" ->
      """SELECT event_id, user_id,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events""".stripMargin,
    "w4_sliding_mean" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(value) OVER w AS win_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)""".stripMargin,
    "c1_longest_streak" ->
      """WITH marked AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), islands AS (
        |  SELECT user_id,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
        |  FROM marked WHERE value > 100.0
        |), runs AS (
        |  SELECT user_id, isl, COUNT(*) AS len FROM islands GROUP BY user_id, isl
        |)
        |SELECT user_id, MAX(len) AS max_streak FROM runs GROUP BY user_id""".stripMargin,
    "a1_last_snapshot_sum" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS snapshot_total,
        |  COUNT(*) AS n_types
        |FROM ranked WHERE rn = 1 GROUP BY user_id""".stripMargin,
    "a2_argmax" ->
      """WITH totals AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY event_type, user_id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id ASC) AS rk
        |  FROM totals
        |)
        |SELECT event_type, user_id, total FROM ranked WHERE rk = 1""".stripMargin,
    "a7_anomaly_stats" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |), scaled AS (
        |  SELECT user_id, event_type,
        |    SUM(CAST(value AS DECIMAL(18,2)))
        |      * (CASE COUNT(*) WHEN 1 THEN 60 WHEN 2 THEN 30 WHEN 3 THEN 20
        |                       WHEN 4 THEN 15 ELSE 12 END) AS M
        |  FROM ranked WHERE rn <= 5 GROUP BY user_id, event_type
        |), agg AS (
        |  SELECT event_type, COUNT(*) AS n_users,
        |    CAST(SUM(M) AS DOUBLE) AS S,
        |    CAST(SUM(M * M) AS DOUBLE) AS S2
        |  FROM scaled GROUP BY event_type
        |)
        |SELECT event_type, n_users,
        |  S / n_users / 60 AS mean_rate,
        |  SQRT(GREATEST(S2 / n_users - (S / n_users) * (S / n_users), 0.0)) / 60 AS std_rate
        |FROM agg WHERE n_users >= 2""".stripMargin,
    "a6_gated_minmax" ->
      """SELECT event_type, MIN(value) AS min_value, MAX(value) AS max_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS mean_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |HAVING COUNT(DISTINCT user_id) >= 5""".stripMargin,
    "e1_except" ->
      """SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'""".stripMargin,
    "e2_union" ->
      """SELECT user_id FROM events WHERE event_type = 'error'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'signup'""".stripMargin,
    "e3_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,
    "o12_compromise_pct" ->
      """SELECT
        |  (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'error') AS n_flagged,
        |  COUNT(DISTINCT user_id) AS n_total,
        |  100.0 * (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'error')
        |        / COUNT(DISTINCT user_id) AS pct
        |FROM events""".stripMargin,
    "w1_topk" ->
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 15""".stripMargin
  )
}
