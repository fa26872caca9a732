package graft.queries

import graft.dipa.Detect
import graft.io.Tables
import graft.util.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle rows for the detection-pipeline operators that are pure
  * relational transforms (flagged spec-only in round 2): O13 bias-ratio,
  * A3 suspected-bot thresholding, C6 mitigation dispatch
  * (`DIPA_Controller.py:485-497` scoring, `:377-413` dispatch). The
  * queries call the REAL graft.dipa.Detect operators over flows-shaped
  * frames synthesized deterministically from the events table — domain =
  * event_type, source = user_id — so the oracle checks the exact code the
  * streaming pipeline runs, not a re-derivation.
  */
object DetectQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Flows-shaped telnet totals: per (domain, src) decimal-exact volume. */
  private def totals(e: DataFrame): DataFrame =
    e.groupBy(col("event_type").as("domain"), col("user_id").as("ipv4_src"))
      .agg(dsum(col("value")).as("telnet_total"))

  /** O3 analog: sources flagged by high-volume surveillance traffic. */
  private def flagged(e: DataFrame): DataFrame =
    e.filter(col("value") > 100.0d)
      .select(col("event_type").as("domain"), col("user_id").as("ipv4_src"))
      .distinct()

  /** O13 — bias-ratio scoring through the real biasScores (CNC excluded,
    * J6 gate on): score = 1 - total/(total + cnc_total).
    */
  def o13BiasRatio(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val t = totals(e)
    Detect.biasScores(t, Detect.electCnc(t), flagged(e))
      .select(col("domain"), col("ipv4_src"), col("telnet_total"),
        col("cnc_ip"), col("cnc_total"), col("score"))
  }

  /** A3 — suspected-bot thresholding (0.6 shipped threshold) on O13. */
  def a3Suspected(s: SparkSession, dir: String): DataFrame =
    Detect.suspectedBots(o13BiasRatio(s, dir))

  /** C6 — the mitigation dispatch table over synthesized decoded alerts
    * (every label arm exercised: BOT, CNC, BLOCK, numeric pct, unknown)
    * joined against a synthesized host-topology dimension (J1).
    */
  def c6Dispatch(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val alerts = e.select(
      when(col("event_id") % 5 === 0, "BOT")
        .when(col("event_id") % 5 === 1, "CNC")
        .when(col("event_id") % 5 === 2, "BLOCK")
        .when(col("event_id") % 5 === 3, "37.5")
        .otherwise("noise").as("label"),
      concat(lit("10.0.0."), (col("user_id") % 50).cast("string")).as("ip"))
    val topology = e.select((col("user_id") % 50).as("hostnum")).distinct()
      .select(
        concat(lit("10.0.0."), col("hostnum").cast("string")).as("attached"),
        concat(lit("s"), (col("hostnum") % 5).cast("string")).as("switch_name"),
        (col("hostnum") % 48 + 1).as("port"),
        (col("hostnum") < 40).as("is_host"))
    Detect.mitigations(alerts, topology)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o13_bias_ratio" -> (o13BiasRatio _),
    "a3_suspected" -> (a3Suspected _),
    "c6_dispatch" -> (c6Dispatch _)
  )

  private val scoresSql: String =
    """WITH totals AS (
      |  SELECT event_type AS domain, user_id AS ipv4_src,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS telnet_total
      |  FROM events GROUP BY 1, 2
      |), cnc AS (
      |  SELECT domain, ipv4_src AS cnc_ip, telnet_total AS cnc_total FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY domain ORDER BY telnet_total DESC, ipv4_src ASC) AS rk
      |    FROM totals)
      |  WHERE rk = 1
      |), flagged AS (
      |  SELECT DISTINCT event_type AS domain, user_id AS ipv4_src
      |  FROM events WHERE value > 100.0
      |)
      |SELECT t.domain, t.ipv4_src, t.telnet_total, c.cnc_ip, c.cnc_total,
      |  1.0 - t.telnet_total / (t.telnet_total + c.cnc_total) AS score
      |FROM totals t
      |JOIN cnc c USING (domain)
      |JOIN flagged f ON f.domain = t.domain AND f.ipv4_src = t.ipv4_src
      |WHERE t.ipv4_src <> c.cnc_ip""".stripMargin

  val oracle: Map[String, String] = Map(
    "o13_bias_ratio" -> scoresSql,
    "a3_suspected" ->
      s"""SELECT * FROM ($scoresSql)
         |WHERE score >= 0.6""".stripMargin,
    "c6_dispatch" ->
      """WITH alerts AS (
        |  SELECT
        |    CASE WHEN event_id % 5 = 0 THEN 'BOT'
        |         WHEN event_id % 5 = 1 THEN 'CNC'
        |         WHEN event_id % 5 = 2 THEN 'BLOCK'
        |         WHEN event_id % 5 = 3 THEN '37.5'
        |         ELSE 'noise' END AS label,
        |    '10.0.0.' || (user_id % 50) AS ip
        |  FROM events
        |), topo AS (
        |  SELECT '10.0.0.' || hostnum AS attached,
        |    's' || (hostnum % 5) AS switch_name,
        |    hostnum % 48 + 1 AS port
        |  FROM (SELECT DISTINCT user_id % 50 AS hostnum FROM events)
        |  WHERE hostnum < 40
        |)
        |SELECT
        |  CASE WHEN label = 'BOT' THEN 'RATE_LIMIT'
        |       WHEN label = 'CNC' THEN 'DROP_TELNET'
        |       WHEN label = 'BLOCK' THEN 'BLOCK_PORT'
        |       WHEN regexp_matches(label, '^[0-9.]+$') THEN 'LOCKDOWN'
        |       ELSE 'UNKNOWN' END AS action,
        |  CASE WHEN label = 'BLOCK' THEN NULL ELSE ip END AS target_ip,
        |  switch_name, port,
        |  CASE WHEN label = 'CNC' THEN 100 ELSE 10 END AS priority,
        |  60 AS idle_timeout_s, 100 AS hard_timeout_s
        |FROM alerts LEFT JOIN topo ON ip = attached""".stripMargin
  )
}
