package graft.queries

import graft.io.Tables
import graft.ops.Sampling
import graft.util.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic split/sample queries over `documents`, oracle-checked by
  * replaying the identical md5-hash arithmetic in DuckDB SQL — every
  * comparison is on 60-bit integers, so both engines agree bit-for-bit.
  */
object SampleQueries {

  val Salt = "graft-v1:"
  /** 80/10/10 — the usual train/val/test shape. */
  val Splits: Seq[(String, Double)] = Seq(
    "train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val KPerLang = 20

  private val cuts = Sampling.thresholds(Splits.map(_._2))

  /** The DuckDB twin of [[Sampling.hashUnit]] over doc_id. */
  private val hashSql =
    s"('0x' || substring(md5('${Salt}' || doc_id::VARCHAR), 1, 15))::BIGINT"

  /** v1: split documents 80/10/10 by content hash; per (split, lang)
    * row count and exact char mass — the census you run to check a split
    * is balanced before training on it.
    */
  def v1HashSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.splitByHash(Tables.documents(s, dir), col("doc_id"), Salt, Splits)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"))

  /** v2: deterministic 20-per-language sample (lowest doc_id hash). */
  def v2StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedK(Tables.documents(s, dir), Seq("lang"),
        col("doc_id"), Salt, KPerLang)
      .select("lang", "doc_id", "source", "n_chars")

  /** v3: map-only 10% sample — survivor count and exact mean length by
    * source (the quick-look census over a huge corpus).
    */
  def v3SampleFraction(s: SparkSession, dir: String): DataFrame =
    Sampling.sampleFraction(Tables.documents(s, dir), col("doc_id"), Salt, 0.1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        Exact.davg(col("n_chars").cast("double"), Exact.Fine).as("mean_chars"))

  /** The mixture recipe for v4: up-sample src0, keep src1, thin src2,
    * drop everything else (absent from the map).
    */
  val Mixture: Seq[(String, Double)] = Seq(
    "src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1)

  /** v4: data-mixture curation — per-source keep rates, map-only. */
  def v4MixtureSample(s: SparkSession, dir: String): DataFrame =
    Sampling.mixtureSample(Tables.documents(s, dir), col("source"),
        col("doc_id"), Salt, Mixture.toMap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_hash_split" -> (v1HashSplit _),
    "v2_stratified_sample" -> (v2StratifiedSample _),
    "v3_sample_fraction" -> (v3SampleFraction _),
    "v4_mixture_sample" -> (v4MixtureSample _)
  )

  val oracle: Map[String, String] = Map(
    "v1_hash_split" ->
      s"""WITH h AS (
         |  SELECT lang, n_chars, $hashSql AS h FROM documents
         |)
         |SELECT CASE WHEN h < ${cuts(0)} THEN 'train'
         |            WHEN h < ${cuts(1)} THEN 'val'
         |            ELSE 'test' END AS split,
         |       lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
         |FROM h GROUP BY 1, 2""".stripMargin,
    "v2_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id, source, n_chars, $hashSql AS h,
         |    row_number() OVER (PARTITION BY lang ORDER BY $hashSql, doc_id)
         |      AS rk
         |  FROM documents
         |)
         |SELECT lang, doc_id, source, n_chars FROM h
         |WHERE rk <= ${KPerLang}""".stripMargin,
    "v3_sample_fraction" ->
      s"""SELECT source, count(*) AS n_docs,
         |  (sum(n_chars::DECIMAL(28,6)))::DOUBLE / count(n_chars)
         |    AS mean_chars
         |FROM documents
         |WHERE $hashSql < ${(0.1 * Sampling.Space).toLong}
         |GROUP BY 1""".stripMargin,
    "v4_mixture_sample" ->
      s"""SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars
         |FROM documents
         |WHERE $hashSql < CASE source ${
             Mixture.map { case (k, r) =>
               s"WHEN '$k' THEN ${(r * Sampling.Space).toLong}"
             }.mkString(" ")} ELSE -1 END
         |GROUP BY 1""".stripMargin
  )
}
