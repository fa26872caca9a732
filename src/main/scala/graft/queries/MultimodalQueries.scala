package graft.queries

import graft.io.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column queries over the `documents` table (payloads are
  * synthesized binary — container magic + UTF-8 body — because the test
  * corpus ships no real media; the sniffing/statistics path is the real
  * one). Oracle twin builds identical blobs in DuckDB.
  */
object MultimodalQueries {

  def m1MediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Tables.documents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_stats" -> (m1MediaStats _)
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
        |FROM s GROUP BY mime""".stripMargin
  )
}
