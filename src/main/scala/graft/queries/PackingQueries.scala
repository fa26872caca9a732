package graft.queries

import graft.io.Tables
import graft.ops.Ordered
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-packing queries over `documents`: the distributed prefix sum
  * lays the corpus out into fixed-capacity training windows by
  * cumulative size, in stable doc_id order. Oracle: DuckDB's global
  * running-sum window — the single-task formulation the two-phase scan
  * replaces — over the same integers.
  */
object PackingQueries {

  /** Pack capacity in chars (stand-in for the token budget). */
  val Capacity = 16384L
  /** Order-key bucket width: each bucket is one task's window work. */
  val BucketWidth = 100L

  private def packed(s: SparkSession, dir: String): DataFrame =
    Ordered.packBySize(
      Tables.documents(s, dir).select("doc_id", "n_chars"),
      "doc_id", col("n_chars"), Capacity, BucketWidth)

  /** g1: per-document global cumulative size and starting pack id. */
  def g1PrefixPack(s: SparkSession, dir: String): DataFrame =
    packed(s, dir).select("doc_id", "n_chars", "cum_size", "pack")

  /** g2: per-pack fill census — docs per pack and chars starting there. */
  def g2PackStats(s: SparkSession, dir: String): DataFrame =
    packed(s, dir).groupBy("pack")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"))

  /** Char budget for g3 (~half the sf0.01 corpus by mass). */
  val Budget = 120000L

  /** g3: the doc_id-ordered prefix that fits the char budget. */
  def g3TakeBudget(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ordered.takeBudget(
      Tables.documents(s, dir).select("doc_id", "n_chars"),
      "doc_id", col("n_chars"), Budget, BucketWidth)

  /** Salt for the g4 epoch permutation. */
  val ShuffleSalt = "epoch0:"

  /** g4: deterministic training-order shuffle — dense hash-ordered
    * positions for every document (Ordered.shuffleOrder). The oracle is
    * the single-task row_number-over-global-order formulation the
    * two-phase scan replaces.
    */
  def g4ShuffleOrder(s: SparkSession, dir: String): DataFrame =
    Ordered.shuffleOrder(
        Tables.documents(s, dir).select("doc_id"), "doc_id", ShuffleSalt)
      .select("doc_id", "pos")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_prefix_pack" -> (g1PrefixPack _),
    "g2_pack_stats" -> (g2PackStats _),
    "g3_take_budget" -> (g3TakeBudget _),
    "g4_shuffle_order" -> (g4ShuffleOrder _)
  )

  private val cumSql =
    """SELECT doc_id, n_chars,
      |  (sum(n_chars) OVER (ORDER BY doc_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
      |    AS cum_size
      |FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "g1_prefix_pack" ->
      s"""WITH c AS ($cumSql)
         |SELECT doc_id, n_chars, cum_size,
         |       (cum_size - n_chars) // ${Capacity} AS pack
         |FROM c""".stripMargin,
    "g2_pack_stats" ->
      s"""WITH c AS ($cumSql)
         |SELECT (cum_size - n_chars) // ${Capacity} AS pack,
         |       count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
         |FROM c GROUP BY 1""".stripMargin,
    "g3_take_budget" ->
      s"""WITH c AS ($cumSql)
         |SELECT doc_id, n_chars FROM c
         |WHERE cum_size <= ${Budget}""".stripMargin,
    "g4_shuffle_order" ->
      s"""SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY
         |    ('0x' || substring(md5('$ShuffleSalt' || doc_id::VARCHAR), 1, 15))::BIGINT,
         |    doc_id) - 1 AS BIGINT) AS pos
         |FROM documents""".stripMargin
  )
}
