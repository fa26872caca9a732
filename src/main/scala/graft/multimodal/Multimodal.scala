package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * treated as opaque `binary` payloads with typed metadata, and REAL
  * decodes for every modality — javax.imageio (PNG/JPEG),
  * javax.sound.sampled (WAV), and an ISO/IEC 14496-12 box walker (MP4)
  * over complete valid files inside the mapPartitions decode stage,
  * plus fixed-offset IHDR/fmt column expressions.
  *
  * The synthetic corpus carries no real media, so payloads are
  * materialized per doc: PNG docs get a COMPLETE spec-valid file —
  * signature, IHDR (real CRC-32), one IDAT chunk holding the filter-0
  * scanlines of a deterministic pixel grid in stored-mode zlib, IEND —
  * that `javax.imageio.ImageIO.read` decodes (MultimodalSpec proves it);
  * WAV docs a COMPLETE RIFF/fmt/data file — real little-endian PCM
  * geometry and a data chunk of deterministic [[pixelValue]] bytes —
  * that `javax.sound.sampled.AudioSystem` decodes (MultimodalSpec
  * proves samples round-trip); JPEG docs one of 16 CHECKED-IN complete
  * JFIF files ([[JpegFixtures]], variant = doc_id % 16, + the UTF-8
  * body past the EOI marker) that ImageIO decodes; MP4 docs a COMPLETE
  * minimal-box file — real ftyp/moov/mvhd/trak/tkhd/mdat framing with
  * doc_id-derived fields and [[pixelValue]] content bytes — that
  * [[walkMp4]] parses (+ the body past the last box, where the walk
  * stops exactly as a conforming demuxer does). Every derived statistic
  * is DuckDB-replayable: byte totals by file-geometry arithmetic,
  * IHDR/fmt fields by prefix byte reads, PNG/WAV pixel/sample sums and
  * MP4 box fields + mdat sums by the doc_id formulas, and JPEG decoded
  * statistics by AUTHOR-TIME constants — JPEG is lossy and
  * encoder-dependent, so its decoded pixels are not SQL arithmetic;
  * instead the fixture bytes AND their ImageIO-decoded statistics were
  * captured together when the fixtures were authored
  * (tools/AuthorJpegFixtures.java), and the m7 oracle replays those
  * constants while the Spark side reports the LIVE decode.
  */
object Multimodal {

  /** Container magic signatures (public file-format specs). */
  val PngMagic: Array[Byte] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  val JpegMagic: Array[Byte] = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
  val WavMagic: Array[Byte] = Array(0x52, 0x49, 0x46, 0x46).map(_.toByte)
  val Mp4Magic: Array[Byte] = Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70).map(_.toByte)

  /** Deterministic source → modality assignment (source number mod 4). */
  def modality(source: Column): Column = substring(source, 4, 10).cast("int") % 4

  // ---- PNG IHDR synthesis (real chunk layout, png spec §11.2.2) --------

  /** Square PNG dimension for a doc: 16·(1 + doc_id % 16) ∈ {16..256} —
    * 16 distinct sizes, so the 16 IHDR CRCs are compile-time constants
    * both engines can emit (CRC-32 is not expressible as SQL arithmetic).
    */
  def pngDimInt(i: Int): Int = 16 * (i % 16 + 1)

  /** IHDR length+type: 13-byte data, "IHDR". */
  val IhdrLenType: Array[Byte] =
    Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII")

  /** bit depth 8, color type 2 (truecolor), compression/filter/interlace 0. */
  val IhdrTail: Array[Byte] = Array[Byte](8, 2, 0, 0, 0)

  /** Real CRC-32 over chunk type + data for a square d×d IHDR. */
  def ihdrCrc(d: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(17)
    buf.put("IHDR".getBytes("US-ASCII")).putInt(d).putInt(d).put(IhdrTail)
    val crc = new java.util.zip.CRC32()
    crc.update(buf.array())
    java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
  }

  /** The 16 CRCs, indexed by doc_id % 16. */
  val IhdrCrcs: Seq[Array[Byte]] = (0 until 16).map(i => ihdrCrc(pngDimInt(i)))

  // ---- WAV RIFF/fmt synthesis (canonical 44-byte PCM header) -----------

  /** Per-doc PCM geometry: channels cycle mod 2, sample rate mod 5, bit
    * depth mod 4 — jointly a 20-period cycle of fmt chunks, so the static
    * header block (everything but the two byte-length fields) is one of 20
    * precomputed byte arrays indexable by `doc_id % 20` on both engines.
    */
  val WavRates: Seq[Int] = Seq(8000, 16000, 22050, 44100, 48000)
  val WavBitDepths: Seq[Int] = Seq(8, 16, 24, 32)
  def wavChannelsInt(i: Int): Int = 1 + i % 2
  def wavRateInt(i: Int): Int = WavRates(i % 5)
  def wavBitsInt(i: Int): Int = WavBitDepths(i % 4)

  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le4(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Header bytes 8..39 for `doc_id % 20`: "WAVE", the complete 16-byte
    * PCM fmt chunk (format 1, channels, sample rate, byte rate, block
    * align, bits per sample — all little-endian per the RIFF spec), and
    * the "data" chunk tag. Only the RIFF size (bytes 4-7) and data size
    * (bytes 40-43) depend on the data-chunk length and are encoded per
    * row.
    */
  val WavStaticBlocks: Seq[Array[Byte]] = (0 until 20).map { i =>
    val ch = wavChannelsInt(i); val sr = wavRateInt(i); val bits = wavBitsInt(i)
    val blockAlign = ch * bits / 8
    "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le4(16L) ++ le2(1) ++ le2(ch) ++ le4(sr.toLong) ++
      le4(sr.toLong * blockAlign) ++ le2(blockAlign) ++ le2(bits) ++
      "data".getBytes("US-ASCII")
  }

  /** PCM frame count for a doc: 64 + doc_id % 64 ∈ {64..127} — like the
    * PNG dimension cycle, a small deterministic spread both engines
    * compute from the id alone.
    */
  def wavFrames(docId: Long): Int = 64 + (docId % 64).toInt

  /** A COMPLETE spec-valid RIFF/WAVE PCM file for a doc: the canonical
    * 44-byte header (real little-endian geometry, sizes exact for the
    * data chunk) followed by a REAL data chunk whose byte stream is the
    * [[pixelValue]] formula — the audio twin of [[pngFile]]'s pixel
    * grid. `javax.sound.sampled.AudioSystem` decodes it (MultimodalSpec
    * proves samples round-trip exactly), and every derived statistic —
    * frame counts, per-channel sample sums, chunk byte-sums — is
    * integer-exact and DuckDB-replayable from doc_id. Data byte count
    * `N = frames · blockAlign`; file length `44 + N`.
    */
  def wavFile(docId: Long): Array[Byte] = {
    val i = (docId % 20).toInt
    val blockAlign = wavChannelsInt(i) * wavBitsInt(i) / 8
    val n = wavFrames(docId) * blockAlign
    val data = new Array[Byte](n)
    var p = 0
    while (p < n) { data(p) = pixelValue(docId, p).toByte; p += 1 }
    WavMagic ++ le4(36L + n) ++ WavStaticBlocks(i) ++ le4(n.toLong) ++ data
  }

  // ---- full PNG synthesis (deterministic pixels, real zlib IDAT) -------

  /** Deterministic pixel byte of doc `docId`'s image at 0-based index `p`
    * in the row-major RGB stream (channel-minor: `p = (y*d + x)*3 + c`,
    * channel 0=R 1=G 2=B): an xor mix of three odd-multiplier terms,
    * replayable in DuckDB with plain 64-bit integer arithmetic
    * (`xor(a,b) & 255`). The cross term couples docId and p, so two
    * docs' grids are never a pointwise shift of each other — chunk sums
    * and the features derived from them are genuinely doc-unique (a
    * purely additive mix collapses to identical normalized features,
    * which is why the cross term exists).
    */
  val PixelMulDoc = 2654435761L
  val PixelMulPos = 40503L
  val PixelMulCross = 97L
  def pixelValue(docId: Long, p: Long): Int =
    (((docId * PixelMulDoc) ^ (p * PixelMulPos) ^
      ((docId + p) * PixelMulCross)) & 255L).toInt

  /** Zlib STORED framing (RFC 1950/1951 BTYPE=00): 0x78 0x01 header,
    * <= 65535-byte stored blocks (5-byte LEN/NLEN headers), Adler-32
    * trailer. Every conforming inflater — ImageIO's PNG plugin included —
    * reads stored blocks, and the output length is a pure function of the
    * input length, `6 + 5*ceil(n/65535) + n`, which is what lets the m1
    * oracle verify payload byte totals arithmetically in DuckDB (a
    * compressed stream's length would be opaque to SQL).
    */
  def storedZlib(raw: Array[Byte]): Array[Byte] = {
    require(raw.nonEmpty, "stored framing needs at least one block")
    val nb = (raw.length + 65534) / 65535
    val out = new Array[Byte](6 + 5 * nb + raw.length)
    out(0) = 0x78; out(1) = 0x01
    var src = 0; var dst = 2; var block = 0
    while (block < nb) {
      val len = math.min(65535, raw.length - src)
      out(dst) = if (block == nb - 1) 1 else 0 // BFINAL on the last block
      out(dst + 1) = (len & 0xff).toByte
      out(dst + 2) = ((len >> 8) & 0xff).toByte
      out(dst + 3) = (~len & 0xff).toByte
      out(dst + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(raw, src, out, dst + 5, len)
      src += len; dst += 5 + len; block += 1
    }
    val ad = new java.util.zip.Adler32()
    ad.update(raw, 0, raw.length)
    val a = ad.getValue
    out(dst) = ((a >> 24) & 0xff).toByte
    out(dst + 1) = ((a >> 16) & 0xff).toByte
    out(dst + 2) = ((a >> 8) & 0xff).toByte
    out(dst + 3) = (a & 0xff).toByte
    out
  }

  /** One PNG chunk: big-endian length, type, data, CRC-32(type+data). */
  def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
  }

  /** A COMPLETE valid PNG for a doc: signature; IHDR (d×d truecolor-8,
    * real CRC); ONE IDAT holding the filter-0 scanlines of the
    * [[pixelValue]] grid in stored-mode zlib; IEND. `ImageIO.read`
    * decodes it and returns exactly the formula pixels (MultimodalSpec).
    * File length = `63 + 5*ceil(N/65535) + N` with `N = d*(1+3d)` —
    * the arithmetic the m1 oracle replays.
    */
  def pngFile(docId: Long): Array[Byte] = {
    val d = pngDimInt((docId % 16).toInt)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(d).putInt(d).put(IhdrTail).array()
    val raw = new Array[Byte](d * (1 + 3 * d))
    var y = 0; var i = 0; var p = 0L
    while (y < d) {
      raw(i) = 0; i += 1 // filter type 0 (None) per scanline
      var xc = 0
      while (xc < 3 * d) {
        raw(i) = pixelValue(docId, p).toByte
        i += 1; p += 1; xc += 1
      }
      y += 1
    }
    PngMagic ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", storedZlib(raw)) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  // ---- MP4 minimal-box synthesis (ISO/IEC 14496-12 box layout) ---------
  //
  // Unlike JPEG, MP4 structure needs no author-time pinning: the box
  // tree is pure big-endian framing, so every field the walker reads is
  // replayable as doc_id arithmetic in DuckDB (the m8 oracle does).
  // The file is ftyp(24) + moov(216: mvhd(108) + trak(8 + tkhd(92))) +
  // mdat(8 + n) with deterministic [[pixelValue]] content bytes — a real
  // demuxer parses it (the brand/timescale/duration/track-geometry reads
  // are the ones ffprobe does), it just carries no coded video samples.

  /** Movie timescale (ticks/second), 4 deterministic classes. */
  def mp4TimescaleInt(i: Int): Int = 600 * (1 + i % 4)
  /** Movie + track duration in timescale ticks. */
  def mp4DurationInt(i: Int): Int = 300 + i % 1000
  /** Track presentation width/height (integer part of tkhd's 16.16). */
  def mp4WidthInt(i: Int): Int = 160 + (i % 8) * 16
  def mp4HeightInt(i: Int): Int = 96 + (i % 8) * 16
  /** mdat content byte count. */
  def mp4MdatN(i: Int): Int = 64 + (i % 16) * 8

  private def be4(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** The identity transform matrix both mvhd and tkhd carry (fixed-point
    * 16.16 / 2.30 per the spec): [0x10000 0 0; 0 0x10000 0; 0 0 0x40000000].
    */
  private val Mp4UnityMatrix: Array[Byte] =
    be4(0x10000) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x10000) ++ be4(0) ++
      be4(0) ++ be4(0) ++ be4(0x40000000)

  /** A COMPLETE minimal-box MP4 for a doc: real ftyp/moov/mvhd/trak/tkhd/
    * mdat framing with doc_id-derived fields. Version-0 boxes, creation/
    * modification times 0 (determinism), track_ID 1, next_track_ID 2.
    */
  def mp4File(docId: Long): Array[Byte] = {
    val i = (docId % 16).toInt
    val ftyp = be4(24) ++ fourcc("ftyp") ++ fourcc("isom") ++ be4(0x200) ++
      fourcc("isom") ++ fourcc("mp42")
    val mvhd = be4(108) ++ fourcc("mvhd") ++ be4(0) /* v0 + flags */ ++
      be4(0) ++ be4(0) /* creation, modification */ ++
      be4(mp4TimescaleInt((docId % 4).toInt)) ++
      be4(mp4DurationInt((docId % 1000).toInt)) ++
      be4(0x10000) /* rate 1.0 */ ++
      Array[Byte](1, 0, 0, 0) /* volume 1.0 + reserved */ ++
      Array.fill[Byte](8)(0) /* reserved */ ++
      Mp4UnityMatrix ++ Array.fill[Byte](24)(0) /* pre_defined */ ++
      be4(2) /* next_track_ID */
    val tkhd = be4(92) ++ fourcc("tkhd") ++ be4(7) /* v0 + enabled flags */ ++
      be4(0) ++ be4(0) /* creation, modification */ ++
      be4(1) /* track_ID */ ++ be4(0) /* reserved */ ++
      be4(mp4DurationInt((docId % 1000).toInt)) ++
      Array.fill[Byte](8)(0) /* reserved */ ++
      Array.fill[Byte](8)(0) /* layer, alternate_group, volume, reserved */ ++
      Mp4UnityMatrix ++
      be4(mp4WidthInt((docId % 8).toInt) << 16) ++
      be4(mp4HeightInt((docId % 8).toInt) << 16)
    val trak = be4(100) ++ fourcc("trak") ++ tkhd
    val moov = be4(216) ++ fourcc("moov") ++ mvhd ++ trak
    val n = mp4MdatN(i)
    val mdat = new Array[Byte](8 + n)
    System.arraycopy(be4(8 + n), 0, mdat, 0, 4)
    System.arraycopy(fourcc("mdat"), 0, mdat, 4, 4)
    var p = 0
    while (p < n) { mdat(8 + p) = pixelValue(docId, p).toByte; p += 1 }
    ftyp ++ moov ++ mdat
  }

  /** Payload column for the JPEG modality (pure codegen'd expr — the 16
    * checked-in JFIF files are an `element_at` over an array of binary
    * literals, no per-row codec work): a complete [[JpegFixtures]] file
    * (variant = doc_id % 16) + UTF-8 content.
    */
  private def jpegPayload(docId: Column, text: Column): Column =
    concat(
      element_at(array(JpegFixtures.Bytes.map(lit): _*),
        pmod(docId, lit(16)).cast("int") + 1),
      encode(text, "UTF-8"))

  /** (doc_id, payload) for every doc. PNG and WAV docs carry a COMPLETE
    * valid file ([[pngFile]] / [[wavFile]] + the UTF-8 body as trailing
    * data past IEND / past the declared RIFF size, which conforming
    * readers ignore); JPEG docs a COMPLETE checked-in JFIF file
    * ([[JpegFixtures]] + the body past the EOI marker, which conforming
    * readers also ignore — pinned at authoring time); MP4 are pure
    * column exprs. The branches union map-side — no shuffle, no driver
    * loop. At 100 TB the payload column is real media read straight
    * from parquet; this synthesizer exists only because the test corpus
    * is text.
    */
  def payloads(docs0: DataFrame): DataFrame = {
    // the per-row synthesis below (zlib deflate per PNG, full RIFF/MP4
    // assembly) is compute-dense while the doc scan splits by BYTES — a
    // one-file corpus lands the whole decode on ~4 tasks (measured: the
    // m2/m5 media stages ran 4 tasks with >2 s cpu while 28 cores sat
    // idle). Same conditional spread as the dedup kernels: a no-op on
    // any corpus with enough splits, one small text shuffle otherwise.
    val docs = graft.dedup.Dedup.widen(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    val jpeg = docs.filter(modality(col("source")) === 1)
      .select(col("doc_id"),
        jpegPayload(col("doc_id"), col("text")).as("payload"))
    val png = docs.filter(modality(col("source")) === 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, pngFile(id) ++ text.getBytes("UTF-8")) }
      .toDF("doc_id", "payload")
    val wav = docs.filter(modality(col("source")) === 2)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, wavFile(id) ++ text.getBytes("UTF-8")) }
      .toDF("doc_id", "payload")
    val mp4 = docs.filter(modality(col("source")) === 3)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, mp4File(id) ++ text.getBytes("UTF-8")) }
      .toDF("doc_id", "payload")
    jpeg.unionByName(png).unionByName(wav).unionByName(mp4)
  }

  // ---- PNG IHDR parsing (column expressions over the byte prefix) ------

  /** Big-endian unsigned int from `len` bytes at 1-based `off`. */
  private def beField(payload: Column, off: Int, len: Int): Column =
    conv(hex(substring(payload, off, len)), 16, 10).cast("long")

  /** True iff the payload starts with the PNG signature and an IHDR chunk
    * at the spec offset (bytes 13-16 = "IHDR").
    */
  def isPngIhdr(payload: Column): Column =
    hex(substring(payload, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(payload, 13, 4)) === "49484452"

  /** IHDR fields as columns — width/height at bytes 17/21, depth and
    * color type at 25/26 (null when the payload is not a PNG). These are
    * fixed-offset byte reads, codegen'd, reading only the binary prefix.
    */
  def pngWidth(payload: Column): Column =
    when(isPngIhdr(payload), beField(payload, 17, 4))
  def pngHeight(payload: Column): Column =
    when(isPngIhdr(payload), beField(payload, 21, 4))
  def pngBitDepth(payload: Column): Column =
    when(isPngIhdr(payload), beField(payload, 25, 1))
  def pngColorType(payload: Column): Column =
    when(isPngIhdr(payload), beField(payload, 26, 1))

  // ---- WAV fmt parsing (little-endian fixed-offset byte reads) ---------

  /** Little-endian unsigned int from `len` bytes at 1-based `off` —
    * hex-pair reversal of the slice, codegen'd, prefix-only read.
    */
  private def leField(payload: Column, off: Int, len: Int): Column = {
    val hx = hex(substring(payload, off, len))
    conv(concat((len - 1 to 0 by -1).map(i => substring(hx, 2 * i + 1, 2)): _*),
      16, 10).cast("long")
  }

  /** True iff the payload is a RIFF/WAVE container with a leading fmt
    * chunk (bytes 9-16 = "WAVEfmt "), the canonical WAV layout.
    */
  def isWavFmt(payload: Column): Column =
    hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 8)) === "57415645666D7420"

  /** fmt-chunk fields at their spec offsets (channels at byte 23, sample
    * rate at 25, byte rate at 29, block align at 33, bits per sample at
    * 35, data-chunk size at 41 — all little-endian; null when not a WAV).
    */
  def wavChannels(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 23, 2))
  def wavSampleRate(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 25, 4))
  def wavByteRate(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 29, 4))
  def wavBlockAlign(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 33, 2))
  def wavBitsPerSample(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 35, 2))
  def wavDataBytes(payload: Column): Column =
    when(isWavFmt(payload), leField(payload, 41, 4))

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
    val p = payloads(docs).withColumn("mime", sniffMime(col("payload")))
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

  /** Big-endian int from 4 payload bytes at 0-based offset. */
  private def beInt(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** L2-normalize chunk sums into the feature vector. */
  private def normed(chunks: Array[Long]): Array[Float] = {
    val norm = math.sqrt(chunks.map(c => c.toDouble * c).sum).max(1e-9)
    chunks.map(c => (c / norm).toFloat)
  }

  /** Decode an image payload for REAL: `ImageIO.read` sniffs the
    * container (PNG inflates the IDAT, JPEG runs the JDK's JFIF codec —
    * both built-in readers) and returns the pixel grid; dims from the
    * decoded image, per-channel sums and 8 chunk byte-sums (chunk =
    * stream index mod 8, the shape the m2/m5/m7 oracles replay — from
    * [[pixelValue]] for PNG, from the [[JpegFixtures]] author-time
    * constants for JPEG) from the pixels. None when the bytes are not a
    * decodable image.
    */
  private def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, Array[Long], Array[Long])] =
    try {
      Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val chunks = Array.fill(FeatureDim)(0L)
        val chans = Array.fill(3)(0L)
        var y = 0; var p = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (16 - 8 * c)) & 0xff
              chunks(p % FeatureDim) += v
              chans(c) += v
              p += 1; c += 1
            }
            x += 1
          }
          y += 1
        }
        (w, h, chunks, chans)
      }
    } catch {
      // Broken codecs throw more than IOException (IndexOutOfBounds,
      // IllegalArgument on malformed/foreign bytes) — any undecodable
      // payload must fall back to the IHDR-prefix parse, not kill the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** Decode a WAV payload for REAL: `javax.sound.sampled.AudioSystem`
    * parses the RIFF/fmt geometry and streams the data-chunk bytes
    * (honoring the declared sizes — the UTF-8 trailer past the RIFF size
    * never leaks in). Returns (frames, channels, 8 chunk byte-sums over
    * the PCM data, per-channel SAMPLE sums — 8-bit unsigned, wider
    * depths signed little-endian, the PCM spec's value semantics).
    * None when the bytes are not a decodable WAV.
    */
  private def decodeWav(payload: Array[Byte])
      : Option[(Int, Int, Array[Long], Array[Long])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val bps = fmt.getSampleSizeInBits / 8
        if (ch < 1 || bps < 1 || bps > 8) None
        else {
          val data = in.readAllBytes()
          val frames = data.length / (ch * bps)
          val chunks = Array.fill(FeatureDim)(0L)
          var p = 0
          while (p < data.length) { chunks(p % FeatureDim) += (data(p) & 0xff); p += 1 }
          val chans = Array.fill(ch)(0L)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              val off = (f * ch + c) * bps
              var raw = 0L; var k = 0
              while (k < bps) { raw |= (data(off + k) & 0xffL) << (8 * k); k += 1 }
              val v =
                if (bps == 1) raw // 8-bit PCM is unsigned
                else if ((raw & (1L << (8 * bps - 1))) != 0) raw - (1L << (8 * bps))
                else raw
              chans(c) += v
              c += 1
            }
            f += 1
          }
          Some((frames, ch, chunks, chans))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parsed MP4 box-tree facts: what a real demuxer's metadata pass
    * reads (ISO/IEC 14496-12 big-endian framing).
    */
  final case class Mp4Info(nBoxes: Int, brand: String, timescale: Long,
                           duration: Long, width: Long, height: Long,
                           mdatBytes: Long, mdatSum: Long,
                           mdatChunks: Array[Long])

  /** The box types the spec's to-EOF (`size==0`) and largesize
    * (`size==1`) framings are accepted for: mdat is the actual
    * use case (>4 GB content / final-box-to-EOF), the padding family
    * (free/skip/wide) appears in conforming tool output, moov for
    * belt-and-braces on faststart-remuxed files.
    */
  private val AmbiguousFourccs = Set("mdat", "free", "skip", "wide", "moov")

  /** Decode an MP4 payload for REAL: walk the top-level box sequence
    * (size/type framing, incl. the spec's `size == 1` 64-bit largesize
    * — how real muxers frame a > 4 GB mdat — and `size == 0` = to end
    * of file, legal on the final box), the moov children (mvhd → movie
    * timescale and duration, version 0 AND version 1 layouts — v1 is
    * standard muxer output with 64-bit times), the trak children (tkhd
    * v0/v1 → 16.16 presentation width and height), and the mdat content
    * bytes (count, byte sum, and the 8 chunk byte-sums the feature
    * stage uses; largesize mdat payloads are walked from the extended
    * header). The walk STOPS at the first frame that is not a
    * well-formed box (size in [2, 8) or overrunning the payload) —
    * which is exactly where the UTF-8 body trails the last box, the
    * same conforming-reader behavior the PNG/WAV/JPEG trailers rely on
    * (any 4 printable-ASCII chars read as a size ≥ 0x20202020, far past
    * any payload). The ambiguous size==0 (to-EOF) and size==1
    * (largesize) frames — which a body BEGINNING with NUL bytes would
    * otherwise spoof, even with a printable "type" (the body's own
    * text) — are additionally gated on the known fourccs real muxers
    * use those forms for ([[AmbiguousFourccs]]), so arbitrary foreign
    * payloads can't silently absorb the trailer into mdat/box stats.
    * None when the bytes don't start with a valid ftyp box.
    */
  def walkMp4(p: Array[Byte]): Option[Mp4Info] =
    try {
      var off = 0
      var n = 0
      var brand = ""
      var timescale = -1L; var duration = -1L
      var w = -1L; var h = -1L
      var mdatBytes = -1L; var mdatSum = 0L
      val chunks = Array.fill(FeatureDim)(0L)
      // The ambiguous size==0 (to-EOF) and size==1 (largesize) frames
      // are accepted only for the fourccs real muxers use those forms
      // for. A plain 32-bit size from a printable-ASCII trailer reads
      // ≥ 0x20202020 (past any payload, never 0 or 1) so the overrun
      // check already rejects it, but a body BEGINNING with NUL bytes
      // — `00 00 00 00` + any 4 printable chars — would otherwise
      // parse as a to-EOF box and silently absorb the trailer into
      // n_boxes/mdat stats (so a printable-fourcc check alone is not
      // enough: the spoofed "type" is the body's own printable text).
      // ISO 14496-12 allows size==0 only on the final box — in
      // practice mdat — and largesize exists for >4 GB mdat; the
      // padding family rides along for conforming tools that emit it.
      def ambiguousFormOk(at: Int): Boolean =
        at + 8 <= p.length &&
          AmbiguousFourccs(new String(p, at + 4, 4, "US-ASCII"))
      // (total box size, payload start offset relative to box start);
      // (-1, _) = not a well-formed box at `at` within `limit`
      def box(at: Int, limit: Int): (Long, Int) = {
        val s32 = beInt(p, at).toLong & 0xffffffffL
        val (size, hdr) =
          if (s32 == 0) // to end (final box) — fourcc-gated, see above
            (if (ambiguousFormOk(at)) (limit - at).toLong else -1L, 8)
          else if (s32 == 1 && at + 16 <= limit) // 64-bit largesize
            (if (ambiguousFormOk(at))
              (beInt(p, at + 8).toLong << 32) |
                (beInt(p, at + 12).toLong & 0xffffffffL)
            else -1L, 16)
          else (s32, 8)
        if (size < hdr || at + size > limit) (-1L, hdr) else (size, hdr)
      }
      var ok = true
      while (ok && off + 8 <= p.length) {
        val (size, hdr) = box(off, p.length)
        if (size < 0) ok = false // trailer / malformed
        else {
          n += 1
          new String(p, off + 4, 4, "US-ASCII") match {
            case "ftyp" =>
              brand = new String(p, off + hdr, 4, "US-ASCII")
            case "moov" =>
              var c = off + hdr
              while (c + 8 <= off + size) {
                val (cs, chdr) = box(c, (off + size).toInt)
                if (cs < 0) c = (off + size).toInt
                else {
                  new String(p, c + 4, 4, "US-ASCII") match {
                    case "mvhd" =>
                      if ((p(c + chdr) & 0xff) == 1) {
                        // v1: 64-bit creation/modification, timescale at
                        // +4+8+8, 64-bit duration after it
                        timescale = beInt(p, c + chdr + 20).toLong & 0xffffffffL
                        duration = (beInt(p, c + chdr + 24).toLong << 32) |
                          (beInt(p, c + chdr + 28).toLong & 0xffffffffL)
                      } else { // v0: timescale at +4+4+4, 32-bit duration
                        timescale = beInt(p, c + chdr + 12).toLong & 0xffffffffL
                        duration = beInt(p, c + chdr + 16).toLong & 0xffffffffL
                      }
                    case "trak" =>
                      var t = c + chdr
                      while (t + 8 <= c + cs) {
                        val (ts, thdr) = box(t, (c + cs).toInt)
                        if (ts < 0) t = (c + cs).toInt
                        else {
                          if (new String(p, t + 4, 4, "US-ASCII") == "tkhd") {
                            // width/height are the last 8 bytes of the
                            // fixed-size body: v0 body 84, v1 body 96
                            // (64-bit times + duration add 12)
                            val wOff = t + thdr +
                              (if ((p(t + thdr) & 0xff) == 1) 88 else 76)
                            w = (beInt(p, wOff).toLong & 0xffffffffL) >> 16
                            h = (beInt(p, wOff + 4).toLong & 0xffffffffL) >> 16
                          }
                          t += ts.toInt
                        }
                      }
                    case _ => ()
                  }
                  c += cs.toInt
                }
              }
            case "mdat" =>
              mdatBytes = size - hdr
              var i = off + hdr
              while (i < off + size) {
                val v = (p(i) & 0xff).toLong
                mdatSum += v
                chunks((i - off - hdr) % FeatureDim) += v
                i += 1
              }
            case _ => ()
          }
          off += size.toInt
        }
      }
      if (brand.nonEmpty)
        Some(Mp4Info(n, brand, timescale, duration, w, h, mdatBytes, mdatSum, chunks))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode stage — every modality decodes for REAL now: `javax.imageio`
    * inflates the IDAT / runs the JFIF codec, `javax.sound.sampled`
    * streams the PCM data chunk, and [[walkMp4]] parses the ISO box tree
    * (tkhd presentation dims, mdat content chunk-sums); dimensions and
    * the feature vector derive from the decoded content (MultimodalSpec
    * proves the round-trips; the m2/m5/m6/m8 oracles replay the
    * pixel/sample/box math from doc_id — author-time constants for
    * JPEG's m7). For audio the (width, height) metadata carries the PCM
    * grid's two axes: (frames, channels). The Spark shape is one
    * iterator pass per partition (codec init amortizes here), no per-row
    * setup, no driver-side collection, schema fixed by the MediaFeatures
    * encoder. A payload that fails to decode falls back to the prefix
    * parse for dims and deterministic body chunk-sum features.
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition codec init would happen here
      it.map { b =>
        val real = b.mime match {
          case "image/png" | "image/jpeg" => decodeImage(b.payload)
          case "audio/wav" =>
            decodeWav(b.payload).map { case (frames, ch, chunks, _) =>
              (frames, ch, chunks, Array.empty[Long])
            }
          case "video/mp4" =>
            // full-metadata walks only: a partial walk (ftyp parsed but
            // no tkhd/mdat reached) must take the fallback path like any
            // other failed decode, not ship -1 dims and a zero vector
            walkMp4(b.payload)
              .filter(m => m.width >= 0 && m.height >= 0 && m.mdatBytes >= 0)
              .map(m =>
                (m.width.toInt, m.height.toInt, m.mdatChunks, Array.empty[Long]))
          case _ => None
        }
        real match {
          case Some((w, h, chunks, _)) =>
            MediaFeatures(b.doc_id, b.mime, w, h, b.payload.length.toLong,
              normed(chunks))
          case None =>
            val body = b.payload.drop(8)
            val (width, height) =
              if (b.mime == "image/png" && b.payload.length >= 26 &&
                  new String(b.payload.slice(12, 16), "US-ASCII") == "IHDR")
                (beInt(b.payload, 16), beInt(b.payload, 20)) // header only
              else {
                // deterministic FAKE dimensions — reached only by payloads
                // no decoder accepts (foreign/corrupt bytes)
                val h = body.foldLeft(17L)((a, x) => (a * 31 + (x & 0xff)) % 1000003L)
                (64 + (h % 512).toInt, 64 + ((h / 512) % 512).toInt)
              }
            // fake embedding: 8 chunk byte-sums, L2-normalized
            val chunks = Array.fill(FeatureDim)(0L)
            var i = 0
            while (i < body.length) { chunks(i % FeatureDim) += (body(i) & 0xff); i += 1 }
            MediaFeatures(b.doc_id, b.mime, width, height,
              b.payload.length.toLong, normed(chunks))
        }
      }
    }
  }

  /** Per-image pixel statistics from the REAL decode: dimensions and
    * integer-exact per-channel sums, straight off the `ImageIO`-decoded
    * grid (the m5 oracle recomputes them from [[pixelValue]] in DuckDB —
    * agreement pins the whole synthesize→deflate→inflate→decode loop).
    * Non-PNG and undecodable payloads are dropped.
    */
  /** Shared body of [[pngPixelStats]] / [[jpegPixelStats]]: decode every
    * blob of the given mime for REAL and report dims + integer-exact
    * per-channel sums off the decoded grid. Non-matching and
    * undecodable payloads are dropped.
    */
  private def imagePixelStats(blobs: Dataset[MediaBlob], mime: String): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val img = if (b.mime == mime) decodeImage(b.payload) else None
        img.map { case (w, h, _, chans) =>
          (b.doc_id, w.toLong, h.toLong, chans(0), chans(1), chans(2))
        }
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  def pngPixelStats(blobs: Dataset[MediaBlob]): DataFrame =
    imagePixelStats(blobs, "image/png")

  /** Per-image pixel statistics from the REAL JPEG decode: dimensions
    * and integer-exact per-channel sums, straight off the
    * ImageIO-decoded grid of the checked-in [[JpegFixtures]] file (the
    * m7 oracle replays the AUTHOR-TIME decode constants keyed by
    * doc_id % 16 — agreement pins payload synthesis, the live JFIF
    * decode, and the trailing-body handling in one hash). Non-JPEG and
    * undecodable payloads are dropped.
    */
  def jpegPixelStats(blobs: Dataset[MediaBlob]): DataFrame =
    imagePixelStats(blobs, "image/jpeg")

  /** Per-clip MP4 box statistics from the REAL box walk: top-level box
    * count, ftyp major brand, mvhd timescale/duration, tkhd presentation
    * dims, and mdat content byte count + byte sum — the metadata pass a
    * real demuxer runs (the m8 oracle recomputes every field as doc_id
    * arithmetic in DuckDB; agreement pins the synthesized box framing,
    * the walker's offset math, and the trailing-body stop in one hash).
    * Non-MP4 and unwalkable payloads are dropped — including PARTIAL
    * walks (valid ftyp but no tkhd/mdat reached), the same
    * full-metadata filter [[decode]] applies, so foreign MP4 bytes
    * never ship sentinel -1 rows into the stats table.
    */
  def mp4BoxStats(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val info = (if (b.mime == "video/mp4") walkMp4(b.payload) else None)
          .filter(m => m.width >= 0 && m.height >= 0 && m.mdatBytes >= 0)
        info.map(m => (b.doc_id, m.nBoxes.toLong, m.brand, m.timescale,
          m.duration, m.width, m.height, m.mdatBytes, m.mdatSum))
      }
    }.toDF("doc_id", "n_boxes", "brand", "timescale", "duration",
      "width", "height", "mdat_bytes", "mdat_sum")
  }

  /** Per-clip PCM sample statistics from the REAL decode: frame/channel
    * geometry and integer-exact per-channel sample sums, straight off the
    * `AudioSystem`-streamed data chunk (the m6 oracle recomputes them
    * from [[pixelValue]] in DuckDB — agreement pins the whole
    * synthesize→parse→stream→sample-assemble loop, 8-bit unsigned and
    * wider-depth signed LE semantics included). Non-WAV and undecodable
    * payloads are dropped; clips beyond 2 channels report the first two
    * (the fixture's ceiling — a wider schema is a column-list change).
    */
  def wavSampleStats(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val wav = if (b.mime == "audio/wav") decodeWav(b.payload) else None
        wav.map { case (frames, ch, _, chans) =>
          (b.doc_id, frames.toLong, ch.toLong,
            chans(0), if (ch > 1) chans(1) else 0L)
        }
      }
    }.toDF("doc_id", "n_frames", "channels", "sum_ch0", "sum_ch1")
  }

  /** The full ingest shape: documents → payloads → blobs for decode. */
  def toBlobs(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    payloads(docs)
      .withColumn("mime", sniffMime(col("payload")))
      .select(col("doc_id"), col("mime"), col("payload"))
      .as[MediaBlob]
  }
}
