package graft.queries

import graft.io.Tables
import graft.sim.Similarity
import graft.text.Lexical
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval queries over the `documents` + `embeddings` tables: BM25
  * lexical top-k, hybrid BM25⊕cosine reciprocal-rank fusion, and the
  * persisted term-bucketed postings index — the retrieval layer a
  * training-data pipeline runs for contamination lookup and
  * more-like-this curation (see [[graft.text.Lexical]] for the
  * cross-engine-exact scoring contract and the 100 TB plan shape).
  */
object RetrievalQueries {

  /** Literal query strings: q0 leads with the corpus's one rare term
    * (idf separation), q1/q2 are common-term queries (tf/dl saturation
    * decides), q2 carries a term absent from the corpus ("by" — dropped
    * by the postings join, not an error), and q3 matches NOTHING (zero
    * output rows for that q_id in both engines — the absent-query edge).
    */
  val Queries: Seq[(String, String)] = Seq(
    "q0" -> "dup merge scan",
    "q1" -> "hash join fast",
    "q2" -> "stream window group by",
    "q3" -> "quantizer recall")

  val K = 10
  /** Per-leg ranking depth feeding the fusion. */
  val FuseDepth = 20
  /** Hybrid query set: documents/embeddings share ids in the testdata. */
  val HybridPred = "doc_id < 4"

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** h1 — BM25 top-k for literal multi-term queries. */
  def h1Bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Lexical.bm25TopK(docs(s, dir), Queries.toDF("q_id", "qtext"), K)
  }

  /** h2 — hybrid more-like-this: BM25 over each query document's own text
    * fused (RRF, c = 60) with brute-force cosine over its embedding, self
    * excluded from both legs — the standard two-channel retrieval a
    * curation pipeline uses when lexical overlap and embedding proximity
    * each miss different near-duplicates.
    */
  def h2HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val qd = d.filter(HybridPred)
      .select(col("doc_id").as("q_id"), col("text").as("qtext"))
    val lexical = Lexical.bm25TopK(d, qd, FuseDepth, excludeSelf = true)
    val e = Tables.embeddings(s, dir)
    val semantic = Similarity
      .bruteForceTopK(e.filter("vec_id < 4"), e, FuseDepth)
      .select(col("q_id"), col("c_id").as("doc_id"), col("rank"))
    Lexical.rrfFuse(lexical, semantic, K)
  }

  /** h3 — h1 through the persisted postings index: build the
    * term-bucketed layout, then answer from ONLY the query terms' bucket
    * directories. Same oracle as h1 — the index is layout, not
    * semantics, so an index path that dropped or double-counted a
    * posting breaks the exact hash.
    */
  def h3Bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(
      s"target/postidx${dir.replaceAll("[^a-zA-Z0-9]", "_")}").getAbsolutePath
    Lexical.buildPostingsIndex(docs(s, dir), base)
    Lexical.bm25TopKIndexed(s, base, Queries, K)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_bm25_topk" -> (h1Bm25TopK _),
    "h2_hybrid_rrf" -> (h2HybridRrf _),
    "h3_bm25_indexed" -> (h3Bm25Indexed _)
  )

  // ---- generated DuckDB twins ----------------------------------------

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')"
  private val qtoksSql =
    "list_filter(string_split_regex(lower(qtext), '[^a-z]+'), t -> t <> '')"

  /** The shared posting/df/totals CTE block (twin of Lexical.postings,
    * termDf, totals) plus the per-term fixed-point scorer (twin of
    * Lexical.bm25TermE9 — identical integer products, one double
    * division, floor into 1e-9 units).
    */
  private def bm25CtesSql(queriesSql: String): String =
    s"""tk AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |), toks AS (
       |  SELECT doc_id, unnest(tk) AS term FROM tk
       |), posting AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
       |), dlen AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM posting GROUP BY 1
       |), tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS s_len FROM dlen
       |), tdf AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM posting GROUP BY 1
       |), q AS ($queriesSql
       |), qt AS (
       |  SELECT DISTINCT q_id, term FROM (
       |    SELECT q_id, unnest($qtoksSql) AS term FROM q)
       |), term_scores AS (
       |  SELECT qt.q_id, p.doc_id,
       |    CAST(floor(
       |      CAST(22 * t.s_len * p.tf * (2 * t.n_docs - 2 * tdf.df + 1) AS DOUBLE)
       |      / CAST((10 * t.s_len * p.tf + 3 * t.s_len + 9 * d.dl * t.n_docs)
       |             * (2 * tdf.df + 1) AS DOUBLE)
       |      * 1e9) AS BIGINT) AS e9
       |  FROM qt
       |  JOIN posting p USING (term)
       |  JOIN tdf USING (term)
       |  JOIN dlen d ON p.doc_id = d.doc_id
       |  CROSS JOIN tot t
       |)""".stripMargin

  private val literalQueriesSql: String =
    "SELECT * FROM (VALUES " +
      Queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ") +
      ") AS v(q_id, qtext)"

  private def bm25Sql: String =
    s"""WITH ${bm25CtesSql(literalQueriesSql)}, scored AS (
       |  SELECT q_id, doc_id, CAST(SUM(e9) AS BIGINT) AS score_e9
       |  FROM term_scores GROUP BY 1, 2
       |), ranked AS (
       |  SELECT q_id, doc_id, score_e9,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |         ORDER BY score_e9 DESC, doc_id ASC) AS BIGINT) AS "rank"
       |  FROM scored
       |)
       |SELECT q_id, doc_id, score_e9, "rank" FROM ranked WHERE "rank" <= $K""".stripMargin

  /** Twin of h2: BM25 more-like-this leg (self excluded) at FuseDepth,
    * cosine leg through the shared DECIMAL-fold dot (bit-identical cos,
    * self excluded), integer RRF, re-rank.
    */
  private def hybridSql: String = {
    val docQueriesSql =
      s"SELECT doc_id AS q_id, text AS qtext FROM documents WHERE $HybridPred"
    s"""WITH ${bm25CtesSql(docQueriesSql)}, scored AS (
       |  SELECT q_id, doc_id, CAST(SUM(e9) AS BIGINT) AS score_e9
       |  FROM term_scores WHERE doc_id <> q_id GROUP BY 1, 2
       |), branked AS (
       |  SELECT q_id, doc_id, score_e9,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |         ORDER BY score_e9 DESC, doc_id ASC) AS BIGINT) AS "rank"
       |  FROM scored
       |  QUALIFY "rank" <= $FuseDepth
       |), v AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${SimQueries.dotSql("embedding", "embedding")}) AS n
       |  FROM embeddings
       |), qv AS (
       |  SELECT vec_id AS q_id, embedding AS qe, n AS qn FROM v WHERE vec_id < 4
       |), cscored AS (
       |  SELECT q.q_id, v.vec_id AS doc_id,
       |    ${SimQueries.dotSql("q.qe", "v.embedding")} / (q.qn * v.n) AS cos
       |  FROM v JOIN qv q ON q.q_id <> v.vec_id
       |), cranked AS (
       |  SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |         ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS "rank"
       |  FROM cscored
       |  QUALIFY "rank" <= $FuseDepth
       |), fused AS (
       |  SELECT COALESCE(a.q_id, b.q_id) AS q_id,
       |    COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |    CAST(CASE WHEN a."rank" IS NULL THEN 0
       |              ELSE floor(1e9 / (60 + a."rank")) END
       |       + CASE WHEN b."rank" IS NULL THEN 0
       |              ELSE floor(1e9 / (60 + b."rank")) END AS BIGINT) AS rrf_e9
       |  FROM branked a FULL OUTER JOIN cranked b
       |    ON a.q_id = b.q_id AND a.doc_id = b.doc_id
       |)
       |SELECT q_id, doc_id, rrf_e9,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |       ORDER BY rrf_e9 DESC, doc_id ASC) AS BIGINT) AS "rank"
       |FROM fused
       |QUALIFY "rank" <= $K""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "h1_bm25_topk" -> bm25Sql,
    "h2_hybrid_rrf" -> hybridSql,
    "h3_bm25_indexed" -> bm25Sql
  )
}
