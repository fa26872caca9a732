package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal plumbing: payload/MIME column expressions, and the stubbed
  * decode stage's schema, partitioning, determinism, and downstream
  * similarity integration.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "png doc body", "en", "src0", 12L),
    (1L, "jpeg doc body x", "en", "src1", 15L),
    (2L, "wav doc body yy", "en", "src2", 15L),
    (3L, "mp4 doc body zzz", "en", "src3", 16L),
    (4L, "png again", "en", "src4", 9L),
    (5L, "png doc body", "en", "src16", 12L) // same text, same modality as src0
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("payload carries real magic bytes and the body verbatim") {
    val p = docs.select(col("doc_id"), payload(col("source"), col("text")).as("p"))
      .orderBy("doc_id").collect()
    assert(p.head.getAs[Array[Byte]]("p").take(8).sameElements(PngMagic))
    assert(p(1).getAs[Array[Byte]]("p").take(4).sameElements(JpegMagic))
    assert(new String(p.head.getAs[Array[Byte]]("p").drop(8), "UTF-8") == "png doc body")
  }

  test("MIME sniff recognizes each container from its signature") {
    val mimes = docs.select(col("source"),
        sniffMime(payload(col("source"), col("text"))).as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mimes == Map("src0" -> "image/png", "src1" -> "image/jpeg",
      "src2" -> "audio/wav", "src3" -> "video/mp4", "src4" -> "image/png",
      "src16" -> "image/png"))
  }

  test("mediaStats: integer-exact per-MIME totals") {
    val stats = mediaStats(docs).collect()
      .map(r => r.getAs[String]("mime") -> r.getAs[Long]("total_bytes")).toMap
    // 3 png docs: (12+8) + (9+8) + (12+8) = 57
    assert(stats("image/png") == 57L)
    assert(stats.keySet ==
      Set("image/png", "image/jpeg", "audio/wav", "video/mp4"))
  }

  test("toBlobs: binary schema, no text column leaks downstream") {
    val blobs = toBlobs(docs)
    assert(blobs.schema("payload").dataType == BinaryType)
    assert(blobs.schema.fieldNames.toSeq == Seq("doc_id", "mime", "payload"))
    assert(blobs.count() == 6)
  }

  test("decodeStub: deterministic metadata + unit-norm features, partitioning preserved") {
    val blobs = toBlobs(docs).repartition(3)
    val feats = decodeStub(blobs)
    assert(feats.rdd.getNumPartitions == 3) // mapPartitions keeps the layout
    val rows = feats.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(rows.forall(_.feature.length == FeatureDim))
    assert(rows.forall(r => math.abs(r.feature.map(f => f.toDouble * f).sum - 1.0) < 1e-3))
    // same payload bytes -> identical decode (golden fake)
    val a = rows(0); val b = rows(5)
    assert(a.width == b.width && a.height == b.height &&
      a.feature.toSeq == b.feature.toSeq)
    // second run bit-identical
    val again = decodeStub(toBlobs(docs).repartition(3)).collect().sortBy(_.doc_id)
    assert(again.map(_.feature.toSeq).toSeq == rows.map(_.feature.toSeq).toSeq)
  }

  test("decoded features feed the similarity operators (ANN integration)") {
    val feats = decodeStub(toBlobs(docs)).toDF()
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    val top = Similarity.bruteForceTopK(feats.filter("vec_id = 0"), feats, k = 1)
      .collect()
    assert(top.length == 1)
    // doc 5 is byte-identical to doc 0 -> cosine 1.0 is its nearest neighbor
    assert(top.head.getAs[Long]("c_id") == 5L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}
