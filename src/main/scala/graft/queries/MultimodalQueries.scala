package graft.queries

import graft.io.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Multimodal-column queries over the `documents` table (payloads are
  * synthesized binary — container headers + UTF-8 body — because the test
  * corpus ships no real media; the sniffing/parsing/statistics paths are
  * the real ones). Oracle twins rebuild identical blobs in DuckDB from
  * ONE shared payload-SQL generator, so every m-row replays the exact
  * byte layout the Spark side synthesizes.
  *
  * m2 proves the full multimodal → embedding → ANN pipeline end-to-end:
  * blobs → decode (the per-partition-init `mapPartitions` stage; PNG
  * dimensions are the real IHDR parse, the feature math is the
  * deterministic stub) → `graft.sim` brute-force top-k over the decoded
  * feature vectors. m3 checks the real decode: IHDR width/height/depth/
  * color parsed by fixed-offset byte reads on both engines.
  */
object MultimodalQueries {

  def m1MediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Tables.documents(s, dir))

  def m2DecodeAnn(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.decode(
        Multimodal.toBlobs(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("feature"))
    Similarity.bruteForceTopK(
        feats.filter(col("doc_id") < 8), feats, k = 5,
        idCol = "doc_id", vecCol = "feature")
      .withColumn("rank", col("rank").cast("long"))
  }

  def m3PngIhdr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"),
        Multimodal.payload(col("doc_id"), col("source"), col("text")).as("payload"))
      .filter(Multimodal.isPngIhdr(col("payload")))
      .select(col("doc_id"),
        Multimodal.pngWidth(col("payload")).as("width"),
        Multimodal.pngHeight(col("payload")).as("height"),
        Multimodal.pngBitDepth(col("payload")).as("bit_depth"),
        Multimodal.pngColorType(col("payload")).as("color_type"))
  }

  def m4WavFmt(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"),
        Multimodal.payload(col("doc_id"), col("source"), col("text")).as("payload"))
      .filter(Multimodal.isWavFmt(col("payload")))
      .select(col("doc_id"),
        Multimodal.wavChannels(col("payload")).as("channels"),
        Multimodal.wavSampleRate(col("payload")).as("sample_rate"),
        Multimodal.wavByteRate(col("payload")).as("byte_rate"),
        Multimodal.wavBlockAlign(col("payload")).as("block_align"),
        Multimodal.wavBitsPerSample(col("payload")).as("bits"),
        Multimodal.wavDataBytes(col("payload")).as("data_bytes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_stats" -> (m1MediaStats _),
    "m2_decode_ann" -> (m2DecodeAnn _),
    "m3_png_ihdr" -> (m3PngIhdr _),
    "m4_wav_fmt" -> (m4WavFmt _)
  )

  // ---- generated DuckDB twins ----------------------------------------

  private def blobLit(bytes: Array[Byte]): String =
    bytes.map(b => f"\\x$b%02X").mkString("'", "", "'::BLOB")

  /** The payload CTE both engines agree on: PNG docs get signature +
    * length/type + dimensions (big-endian from doc_id) + depth/color +
    * the doc's precomputed IHDR CRC; other modalities magic only; then
    * the UTF-8 text body.
    */
  /** Little-endian 4-byte blob of a DuckDB integer expression — byte
    * reversal of the zero-padded big-endian hex form (twin of the Scala
    * `leInt4`).
    */
  private def le4Sql(expr: String): String = {
    val h = s"lpad(hex($expr), 8, '0')"
    s"unhex(substring($h, 7, 2) || substring($h, 5, 2) || " +
      s"substring($h, 3, 2) || substring($h, 1, 2))"
  }

  private def payloadSql: String = {
    val crcList = Multimodal.IhdrCrcs.map(blobLit).mkString("[", ", ", "]")
    val wavList = Multimodal.WavStaticBlocks.map(blobLit).mkString("[", ", ", "]")
    // NOTE: no line may start with "||" — this snippet is interpolated into
    // templates that apply stripMargin again, which would eat the first '|'
    s"""SELECT doc_id,
       |    CASE (substring(source, 4)::INT % 4)
       |      WHEN 0 THEN ${blobLit(Multimodal.PngMagic)} ||
       |        ${blobLit(Multimodal.IhdrLenType)} ||
       |        unhex(lpad(hex(16 * (doc_id % 16 + 1)), 8, '0')) ||
       |        unhex(lpad(hex(16 * (doc_id % 16 + 1)), 8, '0')) ||
       |        ${blobLit(Multimodal.IhdrTail)} ||
       |        ($crcList)[(doc_id % 16)::INT + 1]
       |      WHEN 1 THEN ${blobLit(Multimodal.JpegMagic)}
       |      WHEN 2 THEN ${blobLit(Multimodal.WavMagic)} ||
       |        ${le4Sql("octet_length(encode(text)) + 36")} ||
       |        ($wavList)[(doc_id % 20)::INT + 1] ||
       |        ${le4Sql("octet_length(encode(text))")}
       |      ELSE ${blobLit(Multimodal.Mp4Magic)}
       |    END || encode(text) AS payload
       |  FROM documents""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "m1_media_stats" ->
      s"""WITH p AS (
        |  $payloadSql
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
    // decode twin: payload bytes after the 8-byte signature, hex-parsed;
    // 8 chunk byte-sums; L2-normalized to FLOAT with the same double ops
    // and index order as the Scala stage; then the s1 brute-force ANN
    // shape over the decoded features.
    "m2_decode_ann" ->
      s"""WITH p AS (
        |  $payloadSql
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
        |SELECT q_id, c_id, cos, "rank" FROM ranked WHERE "rank" <= 5""".stripMargin,
    // IHDR parse twin: the same fixed-offset big-endian byte reads over
    // the same blob (width/height at bytes 17/21, depth/color at 25/26).
    "m3_png_ihdr" ->
      s"""WITH p AS (
        |  $payloadSql
        |), h AS (
        |  SELECT doc_id, hex(payload) AS hx FROM p
        |)
        |SELECT doc_id,
        |  ('0x' || substring(hx, 33, 8))::BIGINT AS width,
        |  ('0x' || substring(hx, 41, 8))::BIGINT AS height,
        |  ('0x' || substring(hx, 49, 2))::BIGINT AS bit_depth,
        |  ('0x' || substring(hx, 51, 2))::BIGINT AS color_type
        |FROM h
        |WHERE left(hx, 16) = '89504E470D0A1A0A'
        |  AND substring(hx, 25, 8) = '49484452'""".stripMargin,
    // WAV fmt twin: the same fixed-offset LITTLE-endian byte reads over
    // the same blob (hex-pair reversal; channels at byte 23, rate at 25,
    // byte rate at 29, block align at 33, bits at 35, data size at 41).
    "m4_wav_fmt" ->
      s"""WITH p AS (
        |  $payloadSql
        |), h AS (
        |  SELECT doc_id, hex(payload) AS hx FROM p
        |)
        |SELECT doc_id,
        |  ('0x' || substring(hx, 47, 2) || substring(hx, 45, 2))::BIGINT AS channels,
        |  ('0x' || substring(hx, 55, 2) || substring(hx, 53, 2)
        |        || substring(hx, 51, 2) || substring(hx, 49, 2))::BIGINT AS sample_rate,
        |  ('0x' || substring(hx, 63, 2) || substring(hx, 61, 2)
        |        || substring(hx, 59, 2) || substring(hx, 57, 2))::BIGINT AS byte_rate,
        |  ('0x' || substring(hx, 67, 2) || substring(hx, 65, 2))::BIGINT AS block_align,
        |  ('0x' || substring(hx, 71, 2) || substring(hx, 69, 2))::BIGINT AS bits,
        |  ('0x' || substring(hx, 87, 2) || substring(hx, 85, 2)
        |        || substring(hx, 83, 2) || substring(hx, 81, 2))::BIGINT AS data_bytes
        |FROM h
        |WHERE left(hx, 8) = '52494646'
        |  AND substring(hx, 17, 16) = '57415645666D7420'""".stripMargin
  )
}
