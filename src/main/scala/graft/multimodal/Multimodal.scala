package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * treated as opaque `binary` payloads with typed metadata, plus a
  * deterministic STUB decode/feature-extract stage with the real Spark
  * plumbing (schema, partitioning, batch shape) that a codec-backed
  * implementation would drop into.
  *
  * The synthetic corpus carries no real media, so payloads are
  * materialized from `documents.text` prefixed with genuine container
  * magic bytes (PNG/JPEG/RIFF-WAV/MP4-ftyp) chosen per source — the
  * MIME sniffer then works on real magic signatures, and every derived
  * statistic is integer-exact and DuckDB-checkable.
  */
object Multimodal {

  /** Container magic signatures (public file-format specs). */
  val PngMagic: Array[Byte] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  val JpegMagic: Array[Byte] = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
  val WavMagic: Array[Byte] = Array(0x52, 0x49, 0x46, 0x46).map(_.toByte)
  val Mp4Magic: Array[Byte] = Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70).map(_.toByte)

  /** Deterministic source → modality assignment (source number mod 4). */
  def modality(source: Column): Column = substring(source, 4, 10).cast("int") % 4

  /** Opaque binary payload: modality magic + UTF-8 content. At 100 TB the
    * payload column is real media read straight from parquet/lance; this
    * synthesizer exists only because the test corpus is text.
    */
  def payload(source: Column, text: Column): Column =
    concat(
      when(modality(source) === 0, lit(PngMagic))
        .when(modality(source) === 1, lit(JpegMagic))
        .when(modality(source) === 2, lit(WavMagic))
        .otherwise(lit(Mp4Magic)),
      encode(text, "UTF-8"))

  /** Magic-byte MIME sniff — a pure column expression over the payload
    * prefix (codegen'd; the scan only reads the binary column, and at
    * scale a format with byte-range reads fetches just the header).
    */
  def sniffMime(payload: Column): Column = {
    val h = hex(payload)
    when(substring(h, 1, 8) === "89504E47", "image/png")
      .when(substring(h, 1, 6) === "FFD8FF", "image/jpeg")
      .when(substring(h, 1, 8) === "52494646", "audio/wav")
      .when(substring(h, 9, 8) === "66747970", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Per-MIME payload statistics (the m1 oracle query body): integer-exact
    * counts and byte totals, one shuffle on the sniffed mime.
    */
  def mediaStats(docs: DataFrame): DataFrame = {
    val p = docs.select(col("doc_id"), payload(col("source"), col("text")).as("payload"))
      .withColumn("mime", sniffMime(col("payload")))
    val len = octet_length(col("payload")).cast("long")
    p.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_docs"),
           sum(len).as("total_bytes"),
           min(len).as("min_bytes"),
           max(len).as("max_bytes"))
  }

  // ---- stubbed decode / feature extraction ----------------------------

  /** An opaque media blob (the ingest-side record). */
  final case class MediaBlob(doc_id: Long, mime: String, payload: Array[Byte])

  /** Typed decode output: container metadata + a unit-norm feature
    * vector, ready for the similarity operators (graft.sim).
    */
  final case class MediaFeatures(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_bytes: Long, feature: Array[Float])

  val FeatureDim = 8

  /** STUB — deterministic fake decode. A real implementation would bind an
    * image/audio codec here (the container ships none) and amortize codec
    * init per partition, which is exactly what this mapPartitions shape
    * provides: one iterator pass per partition, no per-row setup, no
    * driver-side collection, schema fixed by the MediaFeatures encoder.
    * The fake is a pure function of the payload bytes so tests are golden.
    */
  def decodeStub(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition "codec init" would happen here
      it.map { b =>
        val body = b.payload.drop(8)
        val h = body.foldLeft(17L)((a, x) => (a * 31 + (x & 0xff)) % 1000003L)
        // fake dimensions derived from content (real codec: parsed header)
        val width = 64 + (h % 512).toInt
        val height = 64 + ((h / 512) % 512).toInt
        // fake embedding: 8 chunk byte-sums, L2-normalized
        val chunks = Array.fill(FeatureDim)(0L)
        var i = 0
        while (i < body.length) { chunks(i % FeatureDim) += (body(i) & 0xff); i += 1 }
        val norm = math.sqrt(chunks.map(c => c.toDouble * c).sum).max(1e-9)
        MediaFeatures(b.doc_id, b.mime, width, height, b.payload.length.toLong,
          chunks.map(c => (c / norm).toFloat))
      }
    }
  }

  /** The full ingest shape: documents → payloads → blobs for decode. */
  def toBlobs(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        payload(col("source"), col("text")).as("payload"))
      .withColumn("mime", sniffMime(col("payload")))
      .select(col("doc_id"), col("mime"), col("payload"))
      .as[MediaBlob]
  }
}
