package graft.queries

import graft.dedup.Dedup
import graft.io.Tables
import graft.ops.{Ordered, Sampling}
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END corpus-curation pipeline as ONE declarative query —
  * the composition a training-data team actually runs, wired from the
  * already-oracle-checked operators:
  *
  *   quality filter (t2's score) → exact dedup (d1's keeper rule) →
  *   transitive near-dup dedup (d4 pairs + d7 closure) → language
  *   mixture sampling (v4's content-hash rates) → sequence packing
  *   (g1's distributed prefix sum).
  *
  * Every stage is a shuffle-bounded operator with its own green oracle
  * row; u1 proves they COMPOSE — same engine, one plan, deterministic
  * end to end (content-addressed sampling, id-stable keepers, fixed
  * pack layout). The DuckDB twin chains the same five stages, so the
  * hash match covers every inter-stage hand-off, not just each stage in
  * isolation.
  */
object PipelineQueries {

  val QualityTh = 0.5
  val MaxHamming = 3
  val Salt = "curate1:"
  val Rates: Seq[(String, Double)] = Seq(
    "en" -> 1.0, "zh" -> 0.8, "es" -> 0.6, "de" -> 0.6, "fr" -> 0.4)
  val Capacity = 4096L // chars per training pack
  val BucketWidth = 1000L

  def u1Curation(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val qs = Text.qualityMetrics(col("text")).toMap.apply("quality_score")
    val quality = docs.filter(qs >= QualityTh)
    val minIds = quality.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exact = quality.join(minIds, Seq("doc_id"), "left_semi")
    val kept = Dedup.dedupByClusters(exact,
      Dedup.simhashPairs(exact, MaxHamming))
    val mixed = Sampling.mixtureSample(kept, col("lang"), col("doc_id"),
      Salt, Rates.toMap)
    Ordered.packBySize(mixed.select("doc_id", "lang", "n_chars"),
        "doc_id", col("n_chars"), Capacity, BucketWidth)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("cum_size"), col("pack"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_curation" -> (u1Curation _))

  // ---- generated DuckDB twin -----------------------------------------

  private val hashSql =
    s"('0x' || substring(md5('$Salt' || doc_id::VARCHAR), 1, 15))::BIGINT"

  private val rateCase = Rates
    .map { case (k, r) => s"WHEN '$k' THEN ${(r * Sampling.Space).toLong}" }
    .mkString(" ")

  val oracle: Map[String, String] = Map(
    "u1_curation" ->
      s"""WITH RECURSIVE qdocs AS MATERIALIZED (
         |  SELECT doc_id, lang, n_chars, text FROM (
         |    SELECT doc_id, lang, n_chars, text,
         |      greatest(least(0.5 * least(len(tk) / 100.0, 1.0)
         |        + 0.3 * least((len(list_filter(tk, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(tk)) * 5, 1.0)
         |        + 0.2 * least((list_sum(list_transform(tk, t -> length(t)))::DOUBLE / len(tk)) / 8, 1.0), 1.0), 0.0) AS qs
         |    FROM (SELECT doc_id, lang, n_chars, text,
         |          regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents))
         |  WHERE qs >= $QualityTh
         |), exact AS MATERIALIZED (
         |  SELECT * FROM qdocs
         |  WHERE doc_id IN (SELECT min(doc_id) FROM qdocs GROUP BY text)
         |), pairs AS MATERIALIZED (
         |  SELECT i, j FROM (
         |${DedupQueries.simhashSqlFrom("exact").linesIterator.map("    " + _).mkString("\n")}
         |  ) d4
         |), edges AS (
         |  SELECT i AS a, j AS b FROM pairs
         |  UNION ALL
         |  SELECT j AS a, i AS b FROM pairs
         |), reach AS (
         |  SELECT DISTINCT a AS id, a AS label FROM edges
         |  UNION
         |  SELECT e.a AS id, r.label FROM edges e JOIN reach r ON r.id = e.b
         |), dropped AS MATERIALIZED (
         |  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> MIN(label)
         |), mixed AS MATERIALIZED (
         |  SELECT doc_id, lang, n_chars FROM exact
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |    AND $hashSql < CASE lang $rateCase ELSE -1 END
         |)
         |SELECT doc_id, lang, n_chars, cum_size,
         |       (cum_size - n_chars) // $Capacity AS pack
         |FROM (SELECT doc_id, lang, n_chars,
         |        (sum(n_chars) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         |          AS cum_size
         |      FROM mixed)""".stripMargin)
}
