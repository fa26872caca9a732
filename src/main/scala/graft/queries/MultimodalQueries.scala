package graft.queries

import graft.io.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Multimodal-column queries over the `documents` table (payloads are
  * synthesized binary — container magic + UTF-8 body — because the test
  * corpus ships no real media; the sniffing/statistics path is the real
  * one). Oracle twin builds identical blobs in DuckDB.
  *
  * m2 proves the full multimodal → embedding → ANN pipeline end-to-end:
  * blobs → decode (the per-partition-init `mapPartitions` stage; the
  * feature math is the deterministic stub) → `graft.sim` brute-force
  * top-k over the decoded feature vectors. The DuckDB twin replays the
  * byte-level chunk-sum feature extraction (hex-parsing the identical
  * payload blob) and the same index-ordered double folds, so the cosine
  * scores — not just the neighbor sets — hash-match.
  */
object MultimodalQueries {

  def m1MediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Tables.documents(s, dir))

  def m2DecodeAnn(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.decodeStub(
        Multimodal.toBlobs(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("feature"))
    Similarity.bruteForceTopK(
        feats.filter(col("doc_id") < 8), feats, k = 5,
        idCol = "doc_id", vecCol = "feature")
      .withColumn("rank", col("rank").cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_stats" -> (m1MediaStats _),
    "m2_decode_ann" -> (m2DecodeAnn _)
  )

  val oracle: Map[String, String] = Map(
    "m1_media_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE (substring(source, 4)::INT % 4)
        |      WHEN 0 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB
        |      WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
        |      WHEN 2 THEN '\x52\x49\x46\x46'::BLOB
        |      ELSE '\x00\x00\x00\x18\x66\x74\x79\x70'::BLOB
        |    END || encode(text) AS payload
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, payload,
        |    CASE
        |      WHEN left(hex(payload), 8) = '89504E47' THEN 'image/png'
        |      WHEN left(hex(payload), 6) = 'FFD8FF' THEN 'image/jpeg'
        |      WHEN left(hex(payload), 8) = '52494646' THEN 'audio/wav'
        |      WHEN substring(hex(payload), 9, 8) = '66747970' THEN 'video/mp4'
        |      ELSE 'application/octet-stream'
        |    END AS mime
        |  FROM p
        |)
        |SELECT mime, COUNT(*) AS n_docs,
        |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
        |  CAST(MIN(octet_length(payload)) AS BIGINT) AS min_bytes,
        |  CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes
        |FROM s GROUP BY mime""".stripMargin,
    // decodeStub twin: payload bytes after the 8-byte header, hex-parsed;
    // 8 chunk byte-sums; L2-normalized to FLOAT with the same double ops
    // and index order as the Scala stub; then the s1 brute-force ANN shape
    // over the decoded features.
    "m2_decode_ann" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE (substring(source, 4)::INT % 4)
        |      WHEN 0 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB
        |      WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
        |      WHEN 2 THEN '\x52\x49\x46\x46'::BLOB
        |      ELSE '\x00\x00\x00\x18\x66\x74\x79\x70'::BLOB
        |    END || encode(text) AS payload
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, substring(hex(payload), 17) AS hx FROM p
        |), idx AS (
        |  SELECT doc_id, hx, unnest(range(0, length(hx) // 2)) AS i FROM b
        |), sums AS (
        |  SELECT doc_id, i % 8 AS chunk,
        |    SUM(('0x' || substring(hx, 2 * i + 1, 2))::BIGINT) AS c
        |  FROM idx GROUP BY 1, 2
        |), grid AS (
        |  SELECT doc_id, unnest(range(0, 8)) AS chunk FROM p
        |), chunks AS (
        |  SELECT g.doc_id, g.chunk, COALESCE(s.c, 0) AS c
        |  FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.chunk = g.chunk
        |), packed AS (
        |  SELECT doc_id, list(c ORDER BY chunk) AS cl FROM chunks GROUP BY doc_id
        |), vecs AS (
        |  SELECT doc_id AS vec_id,
        |    list_transform(cl, x -> (x::DOUBLE / greatest(sqrt(list_reduce(
        |      list_transform(cl, y -> y::DOUBLE * y::DOUBLE),
        |      (a, z) -> a + z)), 1e-9))::FLOAT) AS feature
        |  FROM packed
        |), v AS (
        |  SELECT vec_id, feature,
        |    sqrt(list_reduce(list_transform(range(1, 9),
        |      k -> feature[k]::DOUBLE * feature[k]::DOUBLE), (a, x) -> a + x)) AS n
        |  FROM vecs
        |), q AS (
        |  SELECT vec_id AS q_id, feature AS qv, n AS qn FROM v WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.q_id, v.vec_id AS c_id,
        |    list_reduce(list_transform(range(1, 9),
        |      k -> q.qv[k]::DOUBLE * v.feature[k]::DOUBLE), (a, x) -> a + x)
        |      / (q.qn * v.n) AS cos
        |  FROM v JOIN q ON q.q_id <> v.vec_id
        |), ranked AS (
        |  SELECT q_id, c_id, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS BIGINT) AS "rank"
        |  FROM scored
        |)
        |SELECT q_id, c_id, cos, "rank" FROM ranked WHERE "rank" <= 5""".stripMargin
  )
}
