package graft.queries

import graft.io.Tables
import graft.ops.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-rewrite queries over the `events` table, whose 5 event types over
  * 100 k rows (sf0.1) are exactly the hot-key shape the rewrites exist for.
  * Each oracle is the NAIVE formulation — the rewrite must be row-identical
  * to the plain join / window / distinct it replaces.
  */
object SkewQueries {

  /** Salt fan-out. At 100 TB, size to (hot-key rows / healthy-task rows);
    * pinned here so the oracle is deterministic at any SF.
    */
  private val S = 8
  private val K = 3
  private val TopN = 5

  /** k1 — top-K events per type by (value desc, event_id): the hot-key
    * window rewrite. The naive window sorts ~20 k rows of one type in one
    * task; this sorts 8 slices and re-ranks 24 survivors.
    */
  def k1SaltedTopK(s: SparkSession, dir: String): DataFrame =
    Skew.topKPerKey(
      Tables.events(s, dir).select("event_type", "event_id", "value"),
      Seq("event_type"), Seq(col("value").desc, col("event_id").asc),
      K, S, col("event_id"))

  /** k2 — fact ⋈ per-type dim without broadcast: the salted replicate
    * join. The dim here is tiny (5 rows) — the oracle checks the rewrite's
    * semantics; the size regime it exists for is a dim above the broadcast
    * threshold.
    */
  def k2SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val dim = events.groupBy("event_type")
      .agg(count(lit(1)).as("type_count"))
    Skew.saltedJoin(
      events.select("event_id", "event_type"), dim,
      Seq("event_type"), S, col("event_id"))
      .select("event_id", "event_type", "type_count")
  }

  /** k3 — exact distinct users per type via value-hash bucketing (the
    * non-algebraic-agg rewrite; every phase map-side combinable).
    */
  def k3DistinctUsers(s: SparkSession, dir: String): DataFrame =
    Skew.distinctCount(Tables.events(s, dir), Seq("event_type"),
      col("user_id"), S, "n_users")

  /** k4 — the distinct user-id SET per type (bucketed collect_set),
    * digested to md5(comma-joined sorted ids) so the oracle compares full
    * set CONTENT in O(1) output.
    */
  def k4UserSetDigest(s: SparkSession, dir: String): DataFrame =
    Skew.distinctSet(
      Tables.events(s, dir).withColumn("uid", col("user_id").cast("string")),
      Seq("event_type"), col("uid"), S, "uids")
      .select(col("event_type"),
        md5(concat_ws(",", col("uids"))).as("users_md5"))

  /** k5 — heavy-hitter profile: the measurement that sizes `S`. */
  def k5Profile(s: SparkSession, dir: String): DataFrame =
    Skew.profile(Tables.events(s, dir), Seq("event_type"), TopN)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k1_salted_topk" -> (k1SaltedTopK _),
    "k2_salted_join" -> (k2SaltedJoin _),
    "k3_distinct_users" -> (k3DistinctUsers _),
    "k4_user_set_digest" -> (k4UserSetDigest _),
    "k5_heavy_hitters" -> (k5Profile _)
  )

  val oracle: Map[String, String] = Map(
    "k1_salted_topk" ->
      s"""SELECT event_type, event_id, value FROM (
         |  SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY value DESC, event_id) AS rk
         |  FROM events) WHERE rk <= $K""".stripMargin,
    "k2_salted_join" ->
      """SELECT e.event_id, e.event_type, d.type_count
        |FROM events e
        |JOIN (SELECT event_type, count(*) AS type_count
        |      FROM events GROUP BY 1) d USING (event_type)""".stripMargin,
    "k3_distinct_users" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1",
    "k4_user_set_digest" ->
      """SELECT event_type,
        |  md5(array_to_string(list_sort(list(DISTINCT user_id::VARCHAR)), ',')) AS users_md5
        |FROM events GROUP BY 1""".stripMargin,
    "k5_heavy_hitters" ->
      s"""SELECT event_type, count(*) AS n,
         |  count(*)::DOUBLE / (SELECT count(*) FROM events) AS share
         |FROM events GROUP BY 1 ORDER BY n DESC, event_type LIMIT $TopN""".stripMargin
  )
}
