package graft.queries

import graft.io.Tables
import graft.multimodal.Multimodal
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Multimodal-column queries over the `documents` table (payloads are
  * synthesized binary — PNG docs carry COMPLETE valid files with real
  * zlib IDAT pixel data, WAV docs COMPLETE valid files with real PCM
  * data chunks, JPEG docs COMPLETE checked-in JFIF files, MP4 docs
  * COMPLETE minimal-box files with real ISO framing and deterministic
  * mdat content — because the test corpus ships no real media; the
  * sniffing/parsing/decoding/statistics paths are the real ones).
  *
  * Oracle strategy, per derived value:
  *  - header fields (m3/m4): ONE shared payload-SQL generator rebuilds
  *    the byte PREFIX in DuckDB and re-parses it with the same
  *    fixed-offset reads;
  *  - byte totals (m1): the file-geometry arithmetic — PNG length is
  *    `63 + 5*ceil(N/65535) + N + body` with `N = d(1+3d)` because the
  *    IDAT uses stored-mode zlib (length a pure function of content
  *    size), WAV is `44 + frames·blockAlign + body`, JPEG is the
  *    checked-in fixture length by variant + body, MP4 is
  *    `248 + mdatN + body` (ftyp 24 + moov 216 + mdat header 8);
  *  - content (m5 pixels, m6 PCM samples, m8 box fields + mdat sums)
  *    and content-derived features (m2's PNG, WAV and MP4 branches):
  *    DuckDB recomputes `Multimodal.pixelValue` / the box-field
  *    formulas from doc_id directly — agreement with the Spark side
  *    pins the whole synthesize → encode → real-decoder → statistics
  *    loop, since the Spark numbers come off the DECODED image /
  *    STREAMED data chunk / WALKED box tree, never the formula;
  *  - JPEG content (m7, m2's JPEG branch): AUTHOR-TIME decode constants
  *    keyed by doc_id % 16 (JPEG is lossy — decoded pixels are pinned,
  *    not recomputed; see `tools/AuthorJpegFixtures.java`), while the
  *    Spark side reports the LIVE ImageIO decode of the same bytes.
  *
  * m2 proves the full multimodal → embedding → ANN pipeline end-to-end:
  * blobs → decode (the per-partition-init `mapPartitions` stage; every
  * modality's features are REAL content chunk sums — PNG/JPEG pixels,
  * WAV PCM bytes, MP4 mdat bytes) → `graft.sim` brute-force top-k over
  * the decoded feature vectors.
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
    val p = Multimodal.payloads(Tables.documents(s, dir))
    p.filter(Multimodal.isPngIhdr(col("payload")))
      .select(col("doc_id"),
        Multimodal.pngWidth(col("payload")).as("width"),
        Multimodal.pngHeight(col("payload")).as("height"),
        Multimodal.pngBitDepth(col("payload")).as("bit_depth"),
        Multimodal.pngColorType(col("payload")).as("color_type"))
  }

  def m4WavFmt(s: SparkSession, dir: String): DataFrame = {
    val p = Multimodal.payloads(Tables.documents(s, dir))
    p.filter(Multimodal.isWavFmt(col("payload")))
      .select(col("doc_id"),
        Multimodal.wavChannels(col("payload")).as("channels"),
        Multimodal.wavSampleRate(col("payload")).as("sample_rate"),
        Multimodal.wavByteRate(col("payload")).as("byte_rate"),
        Multimodal.wavBlockAlign(col("payload")).as("block_align"),
        Multimodal.wavBitsPerSample(col("payload")).as("bits"),
        Multimodal.wavDataBytes(col("payload")).as("data_bytes"))
  }

  def m5PixelStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.pngPixelStats(
      Multimodal.toBlobs(Tables.documents(s, dir)))

  def m6WavSampleStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.wavSampleStats(
      Multimodal.toBlobs(Tables.documents(s, dir)))

  def m7JpegPixelStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.jpegPixelStats(
      Multimodal.toBlobs(Tables.documents(s, dir)))

  def m8Mp4BoxStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mp4BoxStats(
      Multimodal.toBlobs(Tables.documents(s, dir)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_stats" -> (m1MediaStats _),
    "m2_decode_ann" -> (m2DecodeAnn _),
    "m3_png_ihdr" -> (m3PngIhdr _),
    "m4_wav_fmt" -> (m4WavFmt _),
    "m5_pixel_stats" -> (m5PixelStats _),
    "m6_wav_sample_stats" -> (m6WavSampleStats _),
    "m7_jpeg_pixel_stats" -> (m7JpegPixelStats _),
    "m8_mp4_box_stats" -> (m8Mp4BoxStats _)
  )

  // ---- generated DuckDB twins ----------------------------------------

  private def blobLit(bytes: Array[Byte]): String =
    bytes.map(b => f"\\x$b%02X").mkString("'", "", "'::BLOB")

  /** Little-endian 4-byte blob of a DuckDB integer expression — byte
    * reversal of the zero-padded big-endian hex form (twin of the Scala
    * `leInt4`).
    */
  private def le4Sql(expr: String): String = {
    val h = s"lpad(hex($expr), 8, '0')"
    s"unhex(substring($h, 7, 2) || substring($h, 5, 2) || " +
      s"substring($h, 3, 2) || substring($h, 1, 2))"
  }

  /** The deterministic pixel byte at RGB-stream index `p` of doc `d` —
    * the SQL twin of `Multimodal.pixelValue` (plain 64-bit arithmetic).
    * WAV data chunks reuse the same byte formula, so this is also the
    * PCM-byte twin.
    */
  private def pixSql(doc: String, p: String): String =
    s"(xor(xor($doc * ${Multimodal.PixelMulDoc}, $p * ${Multimodal.PixelMulPos}), " +
      s"($doc + $p) * ${Multimodal.PixelMulCross}) & 255)"

  /** WAV data-chunk byte count N = frames · blockAlign as doc_id
    * arithmetic — the twin of `wavFrames(id) * (channels * bits / 8)`
    * with the geometry's mod-cycles inlined.
    */
  private def wavBytesSql: String =
    s"(64 + doc_id % 64) * ((1 + doc_id % 2) * " +
      s"(([8, 16, 24, 32])[(doc_id % 4)::INT + 1] // 8))"

  /** DuckDB list literal indexed by the JPEG variant (doc_id % 16). */
  private def jpegVariantLookup(vals: Seq[Long]): String =
    vals.mkString("([", ", ", s"])[(doc_id % 16)::INT + 1]")

  /** The 16 × 8 author-time JPEG chunk byte-sums as a nested DuckDB list
    * literal — `jpegChunkSumsSql[variant + 1][chunk + 1]`.
    */
  private def jpegChunkSumsSql: String =
    graft.multimodal.JpegFixtures.ChunkSums
      .map(_.mkString("[", ", ", "]")).mkString("([", ", ", "])")

  /** The header CTE both engines agree on: PNG docs get the byte PREFIX
    * every reader parses (signature + length/type + dimensions + depth/
    * color + the doc's precomputed IHDR CRC); WAV docs the complete
    * 44-byte RIFF/fmt/data header (sizes counting the PCM data chunk);
    * other modalities magic only; then the UTF-8 text body. For PNG and
    * WAV this is the prefix of the full file, not the whole file — the
    * IDAT/data-chunk tails are covered by the m1 length arithmetic and
    * the m5/m6 content replays (every consumer of this CTE reads only
    * header offsets for those modalities), and the PNG checksums by the
    * ImageIO round-trip in MultimodalSpec (CRC-32 is not expressible as
    * SQL arithmetic). The JPEG and MP4 arms likewise emit magic-only —
    * no consumer reads their payload bytes from this CTE (JPEG content
    * is covered by the m1 length lookup and the m7 author-time
    * constants; MP4 box fields and mdat sums by the m8/m2 doc_id
    * formulas). Also carries `m`, the modality index.
    */
  private def payloadSql: String = {
    val crcList = Multimodal.IhdrCrcs.map(blobLit).mkString("[", ", ", "]")
    val wavList = Multimodal.WavStaticBlocks.map(blobLit).mkString("[", ", ", "]")
    // NOTE: no line may start with "||" — this snippet is interpolated into
    // templates that apply stripMargin again, which would eat the first '|'
    s"""SELECT doc_id, substring(source, 4)::INT % 4 AS m,
       |    CASE (substring(source, 4)::INT % 4)
       |      WHEN 0 THEN ${blobLit(Multimodal.PngMagic)} ||
       |        ${blobLit(Multimodal.IhdrLenType)} ||
       |        unhex(lpad(hex(16 * (doc_id % 16 + 1)), 8, '0')) ||
       |        unhex(lpad(hex(16 * (doc_id % 16 + 1)), 8, '0')) ||
       |        ${blobLit(Multimodal.IhdrTail)} ||
       |        ($crcList)[(doc_id % 16)::INT + 1]
       |      WHEN 1 THEN ${blobLit(Multimodal.JpegMagic)}
       |      WHEN 2 THEN ${blobLit(Multimodal.WavMagic)} ||
       |        ${le4Sql(s"36 + $wavBytesSql")} ||
       |        ($wavList)[(doc_id % 20)::INT + 1] ||
       |        ${le4Sql(wavBytesSql)}
       |      ELSE ${blobLit(Multimodal.Mp4Magic)}
       |    END || encode(text) AS payload
       |  FROM documents""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // byte totals as file-geometry arithmetic: the PNG arm replays the
    // stored-zlib framing (63 fixed + 5 per block + N raw + body), the
    // others their header sizes. Modality→mime is the sniffer's mapping
    // by construction (each arm starts with that container's magic).
    "m1_media_stats" ->
      s"""WITH d0 AS (
        |  SELECT doc_id, substring(source, 4)::INT % 4 AS m,
        |    octet_length(encode(text)) AS tl,
        |    16 * (doc_id % 16 + 1) AS d
        |  FROM documents
        |), s AS (
        |  SELECT CASE m WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |                WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |    CASE m
        |      WHEN 0 THEN 63 + 5 * ((d * (1 + 3 * d) + 65534) // 65535)
        |                  + d * (1 + 3 * d) + tl
        |      WHEN 1 THEN ${jpegVariantLookup(
                 graft.multimodal.JpegFixtures.Lens.map(_.toLong))} + tl
        |      WHEN 2 THEN 44 + $wavBytesSql + tl
        |      ELSE 248 + (64 + (doc_id % 16) * 8) + tl
        |    END AS len
        |  FROM d0
        |)
        |SELECT mime, COUNT(*) AS n_docs,
        |  CAST(SUM(len) AS BIGINT) AS total_bytes,
        |  CAST(MIN(len) AS BIGINT) AS min_bytes,
        |  CAST(MAX(len) AS BIGINT) AS max_bytes
        |FROM s GROUP BY mime""".stripMargin,
    // decode twin. PNG branch: chunk sums over the FORMULA pixels (the
    // Spark side sums the ImageIO-decoded grid — agreement pins the
    // deflate/inflate loop). WAV branch: chunk sums over the FORMULA
    // data-chunk bytes (the Spark side sums the AudioSystem-streamed
    // PCM — agreement pins header parse + data-chunk extraction).
    // JPEG branch: the AUTHOR-TIME decoded chunk sums keyed by
    // doc_id % 16 (the Spark side sums the LIVE ImageIO JFIF decode of
    // the same checked-in bytes — agreement pins decoder stability and
    // the trailing-body handling). MP4 branch: chunk sums over the
    // header+body bytes, hex-parsed. Then L2-normalize to FLOAT with
    // the same double ops and index order as the Scala stage, and the
    // s1 brute-force ANN shape over the decoded features.
    "m2_decode_ann" ->
      s"""WITH p AS (
        |  $payloadSql
        |), mp4px AS (
        |  SELECT doc_id, unnest(range(0, n)) AS px
        |  FROM (SELECT doc_id, 64 + (doc_id % 16) * 8 AS n FROM documents
        |        WHERE substring(source, 4)::INT % 4 = 3) md
        |), mp4sums AS (
        |  SELECT doc_id, px % 8 AS chunk, SUM(${pixSql("doc_id", "px")}) AS c
        |  FROM mp4px GROUP BY 1, 2
        |), pngpx AS (
        |  SELECT doc_id, unnest(range(0, 3 * d * d)) AS px
        |  FROM (SELECT doc_id, 16 * (doc_id % 16 + 1) AS d FROM documents
        |        WHERE substring(source, 4)::INT % 4 = 0) pd
        |), pngsums AS (
        |  SELECT doc_id, px % 8 AS chunk, SUM(${pixSql("doc_id", "px")}) AS c
        |  FROM pngpx GROUP BY 1, 2
        |), wavpx AS (
        |  SELECT doc_id, unnest(range(0, n)) AS px
        |  FROM (SELECT doc_id, $wavBytesSql AS n FROM documents
        |        WHERE substring(source, 4)::INT % 4 = 2) wd
        |), wavsums AS (
        |  SELECT doc_id, px % 8 AS chunk, SUM(${pixSql("doc_id", "px")}) AS c
        |  FROM wavpx GROUP BY 1, 2
        |), jpegsums AS (
        |  SELECT doc_id, chunk,
        |    $jpegChunkSumsSql[(doc_id % 16)::INT + 1][chunk::INT + 1] AS c
        |  FROM (SELECT doc_id, unnest(range(0, 8)) AS chunk FROM documents
        |        WHERE substring(source, 4)::INT % 4 = 1) jd
        |), sums AS (
        |  SELECT * FROM mp4sums UNION ALL SELECT * FROM pngsums
        |  UNION ALL SELECT * FROM wavsums UNION ALL SELECT * FROM jpegsums
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
    // the same blob prefix (width/height at bytes 17/21, depth/color at
    // 25/26).
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
        |  AND substring(hx, 17, 16) = '57415645666D7420'""".stripMargin,
    // pixel replay: DuckDB recomputes dimensions and per-channel sums
    // from pixelValue over the full d×d grid; the Spark side reports
    // what ImageIO actually DECODED — a hash match proves the emitted
    // IDAT inflates back to exactly the formula grid.
    // PCM sample replay: DuckDB recomputes frame/channel geometry and
    // per-channel SAMPLE sums from pixelValue over the data chunk —
    // little-endian assembly, 8-bit unsigned / wider signed two's
    // complement — while the Spark side reports what AudioSystem
    // actually STREAMED; a hash match proves the emitted data chunk
    // survives the real audio parser byte-for-byte and the sample
    // semantics agree.
    "m6_wav_sample_stats" ->
      s"""WITH wav AS (
        |  SELECT doc_id, 1 + doc_id % 2 AS ch,
        |    ([8, 16, 24, 32])[(doc_id % 4)::INT + 1] // 8 AS bps,
        |    64 + doc_id % 64 AS frames
        |  FROM documents WHERE substring(source, 4)::INT % 4 = 2
        |), fx AS (
        |  SELECT doc_id, ch, bps, frames, unnest(range(0, frames)) AS f FROM wav
        |), cc AS (SELECT unnest([0, 1]) AS c),
        |sm AS (
        |  SELECT doc_id, bps, c,
        |    list_sum(list_transform(range(0, bps), k ->
        |      ${pixSql("doc_id", "((f * ch + c) * bps + k)")}
        |        * (1::BIGINT << (8 * k)))) AS raw
        |  FROM fx CROSS JOIN cc WHERE cc.c < fx.ch
        |), sv AS (
        |  SELECT doc_id, c,
        |    CASE WHEN bps = 1 THEN raw
        |         WHEN raw >= (1::BIGINT << (8 * bps - 1))
        |           THEN raw - (1::BIGINT << (8 * bps))
        |         ELSE raw END AS v
        |  FROM sm
        |)
        |SELECT w.doc_id,
        |  CAST(w.frames AS BIGINT) AS n_frames,
        |  CAST(w.ch AS BIGINT) AS channels,
        |  CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_ch0,
        |  CAST(COALESCE(SUM(CASE WHEN c = 1 THEN v END), 0) AS BIGINT) AS sum_ch1
        |FROM sv JOIN wav w USING (doc_id)
        |GROUP BY w.doc_id, w.frames, w.ch""".stripMargin,
    "m5_pixel_stats" ->
      s"""WITH png AS (
        |  SELECT doc_id, 16 * (doc_id % 16 + 1) AS d FROM documents
        |  WHERE substring(source, 4)::INT % 4 = 0
        |), px AS (
        |  SELECT doc_id, d, unnest(range(0, 3 * d * d)) AS p FROM png
        |)
        |SELECT doc_id,
        |  CAST(MIN(d) AS BIGINT) AS width,
        |  CAST(MIN(d) AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN p % 3 = 0 THEN ${pixSql("doc_id", "p")} END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE WHEN p % 3 = 1 THEN ${pixSql("doc_id", "p")} END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE WHEN p % 3 = 2 THEN ${pixSql("doc_id", "p")} END) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id""".stripMargin,
    // JPEG pixel replay: the AUTHOR-TIME ImageIO decode statistics of
    // the 16 checked-in JFIF fixtures, keyed by doc_id % 16 (JPEG is
    // lossy, so the decoded grid is pinned as constants instead of
    // arithmetic — see tools/AuthorJpegFixtures.java). The Spark side
    // reports the LIVE decode of the same bytes with the doc body
    // trailing the EOI marker; a hash match proves the payload
    // synthesis, the runtime JFIF decode, and the trailer handling all
    // reproduce the authored statistics.
    "m7_jpeg_pixel_stats" ->
      s"""SELECT doc_id,
        |  CAST(${jpegVariantLookup(
             graft.multimodal.JpegFixtures.Dims.map(_._1.toLong))} AS BIGINT) AS width,
        |  CAST(${jpegVariantLookup(
             graft.multimodal.JpegFixtures.Dims.map(_._2.toLong))} AS BIGINT) AS height,
        |  CAST(${jpegVariantLookup(
             graft.multimodal.JpegFixtures.ChanSums.map(_._1))} AS BIGINT) AS sum_r,
        |  CAST(${jpegVariantLookup(
             graft.multimodal.JpegFixtures.ChanSums.map(_._2))} AS BIGINT) AS sum_g,
        |  CAST(${jpegVariantLookup(
             graft.multimodal.JpegFixtures.ChanSums.map(_._3))} AS BIGINT) AS sum_b
        |FROM documents WHERE substring(source, 4)::INT % 4 = 1""".stripMargin,
    // MP4 box replay: every field the Spark walker READS off the box
    // tree (top-level box count, ftyp brand, mvhd timescale/duration,
    // tkhd 16.16 dims, mdat byte count + byte sum) recomputed as doc_id
    // arithmetic — MP4 structure is lossless framing, so unlike JPEG no
    // author-time constants are needed; a hash match pins the
    // synthesized framing, the walker's offset math, and the
    // trailing-body stop in one go.
    "m8_mp4_box_stats" ->
      s"""WITH v AS (
        |  SELECT doc_id, 64 + (doc_id % 16) * 8 AS n FROM documents
        |  WHERE substring(source, 4)::INT % 4 = 3
        |), px AS (
        |  SELECT doc_id, unnest(range(0, n)) AS p FROM v
        |), ms AS (
        |  SELECT doc_id, SUM(${pixSql("doc_id", "p")}) AS msum
        |  FROM px GROUP BY doc_id
        |)
        |SELECT v.doc_id,
        |  CAST(3 AS BIGINT) AS n_boxes,
        |  'isom' AS brand,
        |  CAST(600 * (1 + v.doc_id % 4) AS BIGINT) AS timescale,
        |  CAST(300 + v.doc_id % 1000 AS BIGINT) AS duration,
        |  CAST(160 + (v.doc_id % 8) * 16 AS BIGINT) AS width,
        |  CAST(96 + (v.doc_id % 8) * 16 AS BIGINT) AS height,
        |  CAST(v.n AS BIGINT) AS mdat_bytes,
        |  CAST(ms.msum AS BIGINT) AS mdat_sum
        |FROM v JOIN ms USING (doc_id)""".stripMargin
  )
}
