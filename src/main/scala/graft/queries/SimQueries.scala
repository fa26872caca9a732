package graft.queries

import graft.io.Tables
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Embedding-similarity queries over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k, label-blocked near-dup pairs (the IVF
  * shape), and hyperplane-LSH-bucketed top-k (the 100 TB ANN scale path).
  *
  * The oracle SQL folds dot products through the same DECIMAL(38,12)
  * summation as the Scala side (see Similarity's class doc), so cosine
  * scores — and therefore rank orders — are bit-identical across engines.
  */
object SimQueries {

  private val Dim = 64
  private val K = 5
  private val Planes = 4
  private val CosTh = 0.3
  private val QueryPred = "vec_id < 8"

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  def s1AnnTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteForceTopK(e.filter(QueryPred), e, K)
      .withColumn("rank", col("rank").cast("long"))
  }

  def s2CosinePairsBlocked(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsBlocked(emb(s, dir), "label", CosTh)

  def s3LshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.lshTopK(e.filter(QueryPred), e, K, Dim, Planes)
      .withColumn("rank", col("rank").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_ann_topk" -> (s1AnnTopK _),
    "s2_cosine_pairs_blocked" -> (s2CosinePairsBlocked _),
    "s3_lsh_topk" -> (s3LshTopK _)
  )

  // ---- generated DuckDB twins ----------------------------------------

  /** Deterministic dot product of two list columns: per-element double
    * products (IEEE-identical everywhere) summed left-to-right in index
    * order — the lambda twin of Similarity.dotExact. list_reduce seeds with
    * the first element; Spark seeds with 0.0 + first, which is exact.
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${Dim + 1}),
       |    k -> $a[k]::DOUBLE * $b[k]::DOUBLE),
       |    (acc, x) -> acc + x)""".stripMargin

  /** Hyperplane LSH bucket id — twin of Similarity.lshBucket, constants
    * generated from the same planeComp LCG.
    */
  private def bucketSql(v: String): String = {
    val cases = (0 until Planes).map { p =>
      val dot = (0 until Dim)
        .map(d => s"$v[${d + 1}]::DOUBLE * CAST(${Similarity.planeComp(p, d, Dim)} AS DOUBLE)")
        .mkString(" + ")
      s"CASE WHEN ($dot) > 0 THEN ${1L << p} ELSE 0 END"
    }
    s"CAST(${cases.mkString(" + ")} AS BIGINT)"
  }

  private def topKSql(withBucket: Boolean): String = {
    val bucketCol = if (withBucket) s",\n    ${bucketSql("embedding")} AS b" else ""
    val qBucket = if (withBucket) ", b AS qb" else ""
    val joinCond =
      if (withBucket) "q.qb = v.b AND q.q_id <> v.vec_id" else "q.q_id <> v.vec_id"
    s"""WITH v AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS n$bucketCol
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS qv, n AS qn$qBucket FROM v WHERE $QueryPred
       |), scored AS (
       |  SELECT q.q_id, v.vec_id AS c_id,
       |    ${dotSql("q.qv", "v.embedding")} / (q.qn * v.n) AS cos
       |  FROM v JOIN q ON $joinCond
       |), ranked AS (
       |  SELECT q_id, c_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS BIGINT) AS "rank"
       |  FROM scored
       |)
       |SELECT q_id, c_id, cos, "rank" FROM ranked WHERE "rank" <= $K""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "s1_ann_topk" -> topKSql(withBucket = false),
    "s3_lsh_topk" -> topKSql(withBucket = true),
    "s2_cosine_pairs_blocked" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(${dotSql("embedding", "embedding")}) AS n
         |  FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.n * b.n) AS cos
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |)
         |SELECT i, j, cos FROM scored WHERE cos >= $CosTh""".stripMargin
  )
}
