package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal plumbing: payload/MIME column expressions, REAL PNG IHDR
  * synthesis + parsing (including a javax.imageio round-trip over actual
  * encoded PNG files), and the decode stage's schema, partitioning,
  * determinism, and downstream similarity integration.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "png doc body", "en", "src0", 12L),
    (1L, "jpeg doc body x", "en", "src1", 15L),
    (2L, "wav doc body yy", "en", "src2", 15L),
    (3L, "mp4 doc body zzz", "en", "src3", 16L),
    (4L, "png again", "en", "src4", 9L),
    // same text, same modality, same doc_id mod 16 as doc 0 -> the payload
    // (and therefore the decode) must be byte-identical to doc 0's
    (16L, "png doc body", "en", "src16", 12L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private def pay = payload(col("doc_id"), col("source"), col("text"))

  test("payload carries real container headers and the body verbatim") {
    val p = docs.select(col("doc_id"), pay.as("p")).orderBy("doc_id").collect()
    assert(p.head.getAs[Array[Byte]]("p").take(8).sameElements(PngMagic))
    assert(p(1).getAs[Array[Byte]]("p").take(4).sameElements(JpegMagic))
    // png header = 8 signature + 25 IHDR chunk, then the UTF-8 body
    assert(new String(p.head.getAs[Array[Byte]]("p").drop(33), "UTF-8") == "png doc body")
    assert(new String(p(1).getAs[Array[Byte]]("p").drop(4), "UTF-8") == "jpeg doc body x")
  }

  test("synthesized IHDR is spec-valid: layout, dimensions, and a real CRC-32") {
    val p0 = docs.filter("doc_id = 4").select(pay.as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    assert(new String(p0.slice(12, 16), "US-ASCII") == "IHDR")
    // CRC over chunk type + data (bytes 12..28) must match the stored CRC
    val crc = new java.util.zip.CRC32()
    crc.update(p0, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(p0.slice(29, 33)).getInt
    assert(stored == crc.getValue.toInt, "IHDR CRC must be the real CRC-32")
  }

  test("IHDR parse columns read back the synthesized dimensions") {
    val parsed = docs
      .select(col("doc_id"), pay.as("p"))
      .filter(isPngIhdr(col("p")))
      .select(col("doc_id"), pngWidth(col("p")).as("w"), pngHeight(col("p")).as("h"),
        pngBitDepth(col("p")).as("d"), pngColorType(col("p")).as("c"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("w"), r.getAs[Long]("h"), r.getAs[Long]("d"), r.getAs[Long]("c"))))
      .toMap
    assert(parsed.keySet == Set(0L, 4L, 16L)) // the png-modality docs
    assert(parsed(0L) == ((16L, 16L, 8L, 2L)))
    assert(parsed(4L) == ((80L, 80L, 8L, 2L)))  // 16 * (4 % 16 + 1)
    assert(parsed(16L) == ((16L, 16L, 8L, 2L))) // dim cycles mod 16
  }

  test("the parser reads real javax.imageio-encoded PNG files") {
    // full round-trip through an actual PNG encoder: these payloads are
    // complete valid PNGs (IHDR + IDAT + IEND, all CRCs), not synthesized
    val dims = Seq((1, 1), (17, 5), (640, 480), (2, 1024))
    val blobs = dims.zipWithIndex.map { case ((w, h), i) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x3366cc) // non-trivial pixel so IDAT isn't degenerate
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      (i.toLong, out.toByteArray)
    }.toDF("doc_id", "p")
    val parsed = blobs.filter(isPngIhdr(col("p")))
      .select(col("doc_id"), pngWidth(col("p")).as("w"), pngHeight(col("p")).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("w").toInt, r.getAs[Long]("h").toInt))).toMap
    assert(parsed == dims.zipWithIndex.map { case (wh, i) => i.toLong -> wh }.toMap)
    // and the decode stage reads the same dimensions from the same bytes
    val feats = Multimodal.decode(blobs.select(col("doc_id"), lit("image/png").as("mime"),
        col("p").as("payload")).as[MediaBlob])
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats == parsed.map { case (k, v) => k -> v })
  }

  test("synthesized WAV header is spec-valid: javax.sound.sampled parses it") {
    // doc 2 is the wav-modality doc; its header must be a real RIFF/WAVE
    // PCM header any conforming audio reader accepts
    val p2 = docs.filter("doc_id = 2").select(pay.as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(p2))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val af = fmt.getFormat
    assert(af.getChannels == wavChannelsInt(2))         // 1 + 2 % 2 = 1
    assert(af.getSampleRate.toInt == wavRateInt(2))     // 22050
    assert(af.getSampleSizeInBits == wavBitsInt(2))     // 24
    // declared data size is exactly the UTF-8 body length
    val body = "wav doc body yy".getBytes("UTF-8")
    assert(p2.length == 44 + body.length)
    assert(new String(p2.drop(44), "UTF-8") == "wav doc body yy")
  }

  test("WAV fmt parse columns read back the synthesized geometry") {
    val parsed = docs
      .select(col("doc_id"), pay.as("p"))
      .filter(isWavFmt(col("p")))
      .select(col("doc_id"), wavChannels(col("p")).as("ch"),
        wavSampleRate(col("p")).as("sr"), wavByteRate(col("p")).as("br"),
        wavBlockAlign(col("p")).as("ba"), wavBitsPerSample(col("p")).as("bits"),
        wavDataBytes(col("p")).as("db"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ch"), r.getAs[Long]("sr"), r.getAs[Long]("br"),
          r.getAs[Long]("ba"), r.getAs[Long]("bits"), r.getAs[Long]("db"))))
      .toMap
    assert(parsed.keySet == Set(2L)) // the wav-modality doc
    val ba = wavChannelsInt(2) * wavBitsInt(2) / 8
    assert(parsed(2L) == ((wavChannelsInt(2).toLong, wavRateInt(2).toLong,
      wavRateInt(2).toLong * ba, ba.toLong, wavBitsInt(2).toLong, 15L)))
  }

  test("MIME sniff recognizes each container from its signature") {
    val mimes = docs.select(col("source"), sniffMime(pay).as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mimes == Map("src0" -> "image/png", "src1" -> "image/jpeg",
      "src2" -> "audio/wav", "src3" -> "video/mp4", "src4" -> "image/png",
      "src16" -> "image/png"))
  }

  test("mediaStats: integer-exact per-MIME totals") {
    val stats = mediaStats(docs).collect()
      .map(r => r.getAs[String]("mime") -> r.getAs[Long]("total_bytes")).toMap
    // 3 png docs, 33-byte header each: (12+33) + (9+33) + (12+33) = 132
    assert(stats("image/png") == 132L)
    assert(stats.keySet ==
      Set("image/png", "image/jpeg", "audio/wav", "video/mp4"))
  }

  test("toBlobs: binary schema, no text column leaks downstream") {
    val blobs = toBlobs(docs)
    assert(blobs.schema("payload").dataType == BinaryType)
    assert(blobs.schema.fieldNames.toSeq == Seq("doc_id", "mime", "payload"))
    assert(blobs.count() == 6)
  }

  test("decode: real PNG dims, deterministic features, partitioning preserved") {
    val blobs = toBlobs(docs).repartition(3)
    val feats = Multimodal.decode(blobs)
    assert(feats.rdd.getNumPartitions == 3) // mapPartitions keeps the layout
    val rows = feats.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 16L))
    assert(rows.forall(_.feature.length == FeatureDim))
    assert(rows.forall(r => math.abs(r.feature.map(f => f.toDouble * f).sum - 1.0) < 1e-3))
    // png dims come from the IHDR, not the content fake
    assert(rows(0).width == 16 && rows(0).height == 16)
    assert(rows(4).width == 80 && rows(4).height == 80)
    // same payload bytes -> identical decode
    val a = rows(0); val b = rows(5)
    assert(a.width == b.width && a.height == b.height &&
      a.feature.toSeq == b.feature.toSeq)
    // second run bit-identical
    val again = Multimodal.decode(toBlobs(docs).repartition(3)).collect().sortBy(_.doc_id)
    assert(again.map(_.feature.toSeq).toSeq == rows.map(_.feature.toSeq).toSeq)
  }

  test("decoded features feed the similarity operators (ANN integration)") {
    val feats = Multimodal.decode(toBlobs(docs)).toDF()
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    val top = Similarity.bruteForceTopK(feats.filter("vec_id = 0"), feats, k = 1)
      .collect()
    assert(top.length == 1)
    // doc 16 is byte-identical to doc 0 -> cosine 1.0 is its nearest neighbor
    assert(top.head.getAs[Long]("c_id") == 16L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}
