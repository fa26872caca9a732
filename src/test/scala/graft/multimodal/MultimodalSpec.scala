package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal plumbing: payload synthesis (COMPLETE valid PNGs with real
  * zlib IDAT pixel data + COMPLETE valid WAVs with real PCM data
  * chunks), MIME/IHDR/fmt column parsing, the javax.imageio and
  * javax.sound.sampled round-trips (our files through the JDK's real
  * decoders; ImageIO-encoded files through our parsers), and the decode
  * stage's schema, partitioning, determinism, and downstream similarity
  * integration.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "png doc body", "en", "src0", 12L),
    (1L, "jpeg doc body x", "en", "src1", 15L),
    (2L, "wav doc body yy", "en", "src2", 15L),
    (3L, "mp4 doc body zzz", "en", "src3", 16L),
    (4L, "png again", "en", "src4", 9L),
    // wav geometry coverage: the doc_id cycles pick stereo/16-bit,
    // stereo/32-bit, and mono/8-bit clips (doc 2 is mono/24-bit)
    (5L, "wav stereo 16", "en", "src6", 13L),
    (7L, "wav stereo 32", "en", "src10", 13L),
    (8L, "wav mono 8", "en", "src14", 10L),
    // same text, same modality, same dim class (doc_id mod 16) as doc 0 —
    // but pixels are a function of the FULL doc_id, so the payload must
    // share the header yet differ in content
    (16L, "png doc body", "en", "src16", 12L),
    // jpeg with the same text as doc 1 -> byte-identical payload (the
    // codec-less modalities have no per-doc content synthesis)
    (17L, "jpeg doc body x", "en", "src17", 15L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  /** data-chunk byte count for a wav doc. */
  private def wavN(id: Long): Int = {
    val i = (id % 20).toInt
    wavFrames(id) * (wavChannelsInt(i) * wavBitsInt(i) / 8)
  }

  private def pays = payloads(docs)

  private def pay(id: Long): Array[Byte] =
    pays.filter(col("doc_id") === id).collect().head.getAs[Array[Byte]]("payload")

  test("payload carries real container headers and the body verbatim") {
    val p0 = pay(0L); val p1 = pay(1L)
    assert(p0.take(8).sameElements(PngMagic))
    assert(p1.take(4).sameElements(JpegMagic))
    // png payload = the complete file, then the UTF-8 body as trailing data
    assert(new String(p0.drop(pngFile(0L).length), "UTF-8") == "png doc body")
    // jpeg payload = the complete checked-in JFIF file (variant = id % 16),
    // then the UTF-8 body past the EOI marker
    assert(p1.take(JpegFixtures.Lens(1)).sameElements(JpegFixtures.Bytes(1)))
    assert(new String(p1.drop(JpegFixtures.Lens(1)), "UTF-8") == "jpeg doc body x")
    // mp4 payload = the complete synthesized box file, then the UTF-8
    // body past the last box
    val p3 = pay(3L)
    val f3 = mp4File(3L)
    assert(p3.take(f3.length).sameElements(f3))
    assert(new String(p3.drop(f3.length), "UTF-8") == "mp4 doc body zzz")
  }

  test("MP4 box walker reads back the authored framing; trailing body stops the walk") {
    for (id <- Seq(3L, 7L, 11L, 15L)) {
      val full = mp4File(id) ++ s"trailing body of doc $id".getBytes("UTF-8")
      val info = walkMp4(full)
      assert(info.isDefined, s"doc $id must walk")
      val m = info.get
      assert(m.nBoxes == 3, s"doc $id: body parsed as a box? nBoxes ${m.nBoxes}")
      assert(m.brand == "isom")
      assert(m.timescale == mp4TimescaleInt((id % 4).toInt))
      assert(m.duration == mp4DurationInt((id % 1000).toInt))
      assert((m.width, m.height) ==
        ((mp4WidthInt((id % 8).toInt).toLong, mp4HeightInt((id % 8).toInt).toLong)))
      val n = mp4MdatN((id % 16).toInt)
      assert(m.mdatBytes == n.toLong)
      assert(m.mdatSum == (0 until n).map(p => pixelValue(id, p).toLong).sum)
      val chunks = Array.fill(FeatureDim)(0L)
      for (p <- 0 until n) chunks(p % FeatureDim) += pixelValue(id, p)
      assert(m.mdatChunks.toSeq == chunks.toSeq)
    }
    // non-MP4 bytes don't walk
    assert(walkMp4("not a box structure at all".getBytes("UTF-8")).isEmpty)
    assert(walkMp4(Array.emptyByteArray).isEmpty)
  }

  test("box walker handles v1 mvhd/tkhd, largesize and to-EOF boxes (real muxer shapes)") {
    def be4(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def be8(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def cc(s: String) = s.getBytes("US-ASCII")
    val unity = be4(0x10000) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x10000) ++
      be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000)
    val ftyp = be4(24) ++ cc("ftyp") ++ cc("isom") ++ be4(0x200) ++
      cc("isom") ++ cc("mp42")
    // version-1 mvhd (120 B): 64-bit times, timescale after them, 64-bit duration
    val mvhd = be4(120) ++ cc("mvhd") ++ be4(0x01000000) ++ be8(0) ++ be8(0) ++
      be4(1000) ++ be8(77777L) ++ be4(0x10000) ++ Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](8)(0) ++ unity ++ Array.fill[Byte](24)(0) ++ be4(2)
    // version-1 tkhd (104 B): 64-bit times + 64-bit duration
    val tkhd = be4(104) ++ cc("tkhd") ++ be4(0x01000007) ++ be8(0) ++ be8(0) ++
      be4(1) ++ be4(0) ++ be8(77777L) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](8)(0) ++ unity ++ be4(320 << 16) ++ be4(240 << 16)
    val trak = be4(112) ++ cc("trak") ++ tkhd
    val moov = be4(8 + 120 + 112) ++ cc("moov") ++ mvhd ++ trak
    // largesize mdat: size field 1, 64-bit size after the type (the >4GB framing)
    val n = 32
    val mdat = be4(1) ++ cc("mdat") ++ be8(16L + n) ++
      Array.tabulate(n)(i => (i % 7).toByte)
    val m = walkMp4(ftyp ++ moov ++ mdat ++ "trailing body".getBytes("UTF-8")).get
    assert(m.nBoxes == 3 && m.brand == "isom")
    assert(m.timescale == 1000L && m.duration == 77777L)
    assert((m.width, m.height) == ((320L, 240L)))
    assert(m.mdatBytes == n.toLong)
    assert(m.mdatSum == (0 until n).map(_ % 7).sum.toLong)
    // size == 0: the final box legally extends to end of buffer
    val toEof = be4(0) ++ cc("mdat") ++ Array.tabulate(8)(i => (1 + i).toByte)
    val m2 = walkMp4(ftyp ++ toEof).get
    assert(m2.mdatBytes == 8L && m2.mdatSum == 36L)
  }

  test("NUL-leading trailing bodies cannot spoof to-EOF/largesize boxes (round-10 gate)") {
    val clean = walkMp4(mp4File(3L)).get
    // size==0 spoof: 4 NUL bytes then printable text — pre-gate this
    // parsed as a to-EOF box typed by the body's own first word and
    // absorbed the whole trailer into n_boxes/mdat stats
    val toEofSpoof = mp4File(3L) ++ Array[Byte](0, 0, 0, 0) ++
      "junk text that follows the last box".getBytes("UTF-8")
    val m = walkMp4(toEofSpoof).get
    assert(m.nBoxes == clean.nBoxes && m.mdatBytes == clean.mdatBytes &&
      m.mdatSum == clean.mdatSum, "to-EOF spoof absorbed the trailer")
    // size==1 spoof: 00 00 00 01 then printable text read as largesize
    val largeSpoof = mp4File(3L) ++ Array[Byte](0, 0, 0, 1) ++
      "text pretending to be a largesize box header here".getBytes("UTF-8")
    val m2 = walkMp4(largeSpoof).get
    assert(m2.nBoxes == clean.nBoxes && m2.mdatSum == clean.mdatSum,
      "largesize spoof absorbed the trailer")
    // the legitimate ambiguous forms still walk (mdat to-EOF/largesize
    // are pinned by the v1/largesize test above); an UNKNOWN fourcc on
    // the ambiguous form stops the walk instead of absorbing to EOF
    def be4(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    val ftyp = be4(24) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be4(0x200) ++
      "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII")
    val unknownToEof = ftyp ++ be4(0) ++ "zzzz".getBytes("US-ASCII") ++
      Array.tabulate(8)(i => (1 + i).toByte)
    val m3 = walkMp4(unknownToEof).get
    assert(m3.nBoxes == 1 && m3.mdatBytes == -1L,
      s"unknown-fourcc to-EOF frame must stop the walk, got $m3")
  }

  test("mp4BoxStats drops partial walks (no sentinel -1 rows for foreign MP4 bytes)") {
    import spark.implicits._
    def be4(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    // valid ftyp, no moov/tkhd/mdat ever reached: walkMp4 returns
    // Some(...) with -1 sentinels, but the stats row must NOT ship
    val ftypOnly = be4(24) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be4(0x200) ++
      "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII") ++
      "then unstructured text".getBytes("UTF-8")
    assert(walkMp4(ftypOnly).isDefined, "fixture must be a partial walk")
    assert(walkMp4(ftypOnly).get.mdatBytes == -1L)
    val blobs = Seq(
      Multimodal.MediaBlob(901L, "video/mp4", ftypOnly),
      Multimodal.MediaBlob(902L, "video/mp4",
        mp4File(3L) ++ "body".getBytes("UTF-8"))).toDS()
    val got = mp4BoxStats(blobs).select("doc_id").as[Long].collect().toSet
    assert(got == Set(902L), s"partial walk must be dropped, got $got")
  }

  test("mp4BoxStats over blobs matches the m8 arithmetic") {
    val stats = mp4BoxStats(toBlobs(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_boxes"), r.getAs[String]("brand"),
          r.getAs[Long]("timescale"), r.getAs[Long]("duration"),
          r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("mdat_bytes"), r.getAs[Long]("mdat_sum")))).toMap
    assert(stats.keySet == Set(3L)) // the one mp4-modality doc
    val n = mp4MdatN(3)
    assert(stats(3L) == ((3L, "isom",
      mp4TimescaleInt(3).toLong, mp4DurationInt(3).toLong,
      mp4WidthInt(3).toLong, mp4HeightInt(3).toLong, n.toLong,
      (0 until n).map(p => pixelValue(3L, p).toLong).sum)))
  }

  test("checked-in JPEG fixtures decode to the authored statistics, trailer included") {
    // the LIVE ImageIO decode of payload bytes (JFIF + trailing UTF-8 body)
    // must reproduce the AUTHOR-TIME constants — decoder stability is the
    // premise of the m7 oracle
    val stats = jpegPixelStats(toBlobs(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"))))
      .toMap
    assert(stats.keySet == Set(1L, 17L))
    // exact on the authoring JDK; elsewhere JPEG IDCT output may legally
    // shift each pixel by ±1, so allow ±1-per-pixel per channel (dims are
    // decoder-independent and stay exact) — see JpegFixtures.AuthorJdk
    val onAuthorJdk =
      System.getProperty("java.runtime.version") == JpegFixtures.AuthorJdk
    for (id <- Seq(1L, 17L)) {
      val v = (id % 16).toInt
      val (w, h) = JpegFixtures.Dims(v)
      val (r, g, b) = JpegFixtures.ChanSums(v)
      val (gw, gh, gr, gg, gb) = stats(id)
      assert((gw, gh) == ((w.toLong, h.toLong)), s"doc $id dims")
      if (onAuthorJdk)
        assert((gr, gg, gb) == ((r, g, b)), s"doc $id (authoring JDK: exact)")
      else {
        val tol = w.toLong * h
        for ((got, want, ch) <- Seq((gr, r, "R"), (gg, g, "G"), (gb, b, "B")))
          assert(math.abs(got - want) <= tol,
            s"doc $id channel $ch: $got vs $want exceeds ±1/pixel ($tol)")
      }
    }
  }

  test("JPEG fixture table is internally consistent") {
    assert(JpegFixtures.Bytes.length == 16 && JpegFixtures.Lens.length == 16)
    JpegFixtures.Bytes.zip(JpegFixtures.Lens).foreach { case (bs, l) =>
      assert(bs.length == l)
      assert((bs(0) & 0xff) == 0xff && (bs(1) & 0xff) == 0xd8) // SOI
    }
    // author-time chunk sums are the channel sums re-bucketed: both views
    // total the same pixel mass
    JpegFixtures.ChunkSums.zip(JpegFixtures.ChanSums).foreach { case (ck, (r, g, b)) =>
      assert(ck.sum == r + g + b)
    }
  }

  test("synthesized IHDR is spec-valid: layout, dimensions, and a real CRC-32") {
    val p0 = pay(4L)
    assert(new String(p0.slice(12, 16), "US-ASCII") == "IHDR")
    // CRC over chunk type + data (bytes 12..28) must match the stored CRC
    val crc = new java.util.zip.CRC32()
    crc.update(p0, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(p0.slice(29, 33)).getInt
    assert(stored == crc.getValue.toInt, "IHDR CRC must be the real CRC-32")
  }

  test("pngFile is a complete valid PNG: ImageIO inflates the exact formula grid") {
    for (id <- Seq(0L, 4L, 16L)) {
      // decode the PAYLOAD (file + trailing body) — readers stop at IEND
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pay(id)))
      assert(img != null, s"ImageIO must decode doc $id's payload")
      val d = pngDimInt((id % 16).toInt)
      assert(img.getWidth == d && img.getHeight == d)
      // every decoded pixel equals pixelValue — the IDAT content survives
      // the deflate(stored) -> inflate loop bit-exactly
      var p = 0L
      for (y <- 0 until d; x <- 0 until d) {
        val rgb = img.getRGB(x, y)
        for (c <- 0 until 3) {
          val got = (rgb >> (16 - 8 * c)) & 0xff
          assert(got == pixelValue(id, p), s"doc $id pixel ($x,$y,$c)")
          p += 1
        }
      }
    }
  }

  test("pixel content is doc-unique: same dim class, different grids") {
    val (p0, p16) = (pay(0L), pay(16L))
    // identical 33-byte signature+IHDR prefix (same dim class)...
    assert(p0.take(33).sameElements(p16.take(33)))
    // ...but different IDAT content (pixels depend on the full doc_id)
    assert(!p0.sameElements(p16))
  }

  test("IHDR parse columns read back the synthesized dimensions") {
    val parsed = pays
      .filter(isPngIhdr(col("payload")))
      .select(col("doc_id"), pngWidth(col("payload")).as("w"),
        pngHeight(col("payload")).as("h"),
        pngBitDepth(col("payload")).as("d"), pngColorType(col("payload")).as("c"))
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
    // doc 2 is a wav-modality doc; its header must be a real RIFF/WAVE
    // PCM header any conforming audio reader accepts
    val p2 = pay(2L)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(p2))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val af = fmt.getFormat
    assert(af.getChannels == wavChannelsInt(2))         // 1 + 2 % 2 = 1
    assert(af.getSampleRate.toInt == wavRateInt(2))     // 22050
    assert(af.getSampleSizeInBits == wavBitsInt(2))     // 24
    // file = header + declared PCM data + the UTF-8 body as a trailer
    // past the RIFF size (readers ignore it, like the PNG post-IEND text)
    val n = wavN(2L)
    val body = "wav doc body yy".getBytes("UTF-8")
    assert(p2.length == 44 + n + body.length)
    assert(new String(p2.drop(44 + n), "UTF-8") == "wav doc body yy")
  }

  test("wavFile is a complete valid WAV: AudioSystem streams the exact formula PCM") {
    // all four bit depths and both channel counts across the wav docs
    for (id <- Seq(2L, 5L, 7L, 8L)) {
      val i = (id % 20).toInt
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(pay(id)))
      val af = in.getFormat
      assert(af.getChannels == wavChannelsInt(i), s"doc $id channels")
      assert(af.getSampleSizeInBits == wavBitsInt(i), s"doc $id bits")
      assert(in.getFrameLength == wavFrames(id), s"doc $id frames")
      val data = in.readAllBytes()
      in.close()
      val n = wavN(id)
      assert(data.length == n, s"doc $id data bytes")
      // every streamed byte equals pixelValue — the data chunk survives
      // the real audio parser bit-exactly, trailer excluded
      for (p <- 0 until n)
        assert((data(p) & 0xff) == pixelValue(id, p.toLong), s"doc $id byte $p")
    }
  }

  test("wavSampleStats: streamed per-channel sample sums equal the formula sums") {
    val stats = wavSampleStats(toBlobs(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("channels"),
          r.getAs[Long]("sum_ch0"), r.getAs[Long]("sum_ch1")))).toMap
    assert(stats.keySet == Set(2L, 5L, 7L, 8L))
    for (id <- Seq(2L, 5L, 7L, 8L)) {
      val i = (id % 20).toInt
      val ch = wavChannelsInt(i); val bps = wavBitsInt(i) / 8
      val frames = wavFrames(id)
      val sums = Array.fill(2)(0L)
      for (f <- 0 until frames; c <- 0 until ch) {
        var raw = 0L
        for (k <- 0 until bps)
          raw |= pixelValue(id, ((f * ch + c) * bps + k).toLong).toLong << (8 * k)
        val v =
          if (bps == 1) raw
          else if ((raw & (1L << (8 * bps - 1))) != 0) raw - (1L << (8 * bps))
          else raw
        sums(c) += v
      }
      assert(stats(id) == ((frames.toLong, ch.toLong, sums(0), sums(1))), s"doc $id")
    }
  }

  test("WAV fmt parse columns read back the synthesized geometry") {
    val parsed = pays
      .filter(isWavFmt(col("payload")))
      .select(col("doc_id"), wavChannels(col("payload")).as("ch"),
        wavSampleRate(col("payload")).as("sr"), wavByteRate(col("payload")).as("br"),
        wavBlockAlign(col("payload")).as("ba"), wavBitsPerSample(col("payload")).as("bits"),
        wavDataBytes(col("payload")).as("db"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ch"), r.getAs[Long]("sr"), r.getAs[Long]("br"),
          r.getAs[Long]("ba"), r.getAs[Long]("bits"), r.getAs[Long]("db"))))
      .toMap
    assert(parsed.keySet == Set(2L, 5L, 7L, 8L)) // the wav-modality docs
    for (id <- Seq(2L, 5L, 7L, 8L)) {
      val i = (id % 20).toInt
      val ba = wavChannelsInt(i) * wavBitsInt(i) / 8
      assert(parsed(id) == ((wavChannelsInt(i).toLong, wavRateInt(i).toLong,
        wavRateInt(i).toLong * ba, ba.toLong, wavBitsInt(i).toLong,
        wavN(id).toLong)), s"doc $id")
    }
  }

  test("MIME sniff recognizes each container from its signature") {
    val mimes = pays.select(col("doc_id"), sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mimes == Map(0L -> "image/png", 1L -> "image/jpeg",
      2L -> "audio/wav", 3L -> "video/mp4", 4L -> "image/png",
      5L -> "audio/wav", 7L -> "audio/wav", 8L -> "audio/wav",
      16L -> "image/png", 17L -> "image/jpeg"))
  }

  test("mediaStats: integer-exact per-MIME totals match the file geometry") {
    val stats = mediaStats(docs).collect()
      .map(r => r.getAs[String]("mime") -> r.getAs[Long]("total_bytes")).toMap
    // png payload = full file + body; the expected total is the builder's
    // own geometry (the m1 oracle replays the same sum as arithmetic)
    val pngTotal = Seq((0L, 12), (4L, 9), (16L, 12))
      .map { case (id, bodyLen) => pngFile(id).length + bodyLen }.sum
    assert(stats("image/png") == pngTotal.toLong)
    val wavTotal = Seq((2L, 15), (5L, 13), (7L, 13), (8L, 10))
      .map { case (id, bodyLen) => 44 + wavN(id) + bodyLen }.sum
    assert(stats("audio/wav") == wavTotal.toLong)
    val jpegTotal = Seq((1L, 15), (17L, 15))
      .map { case (id, bodyLen) => JpegFixtures.Lens((id % 16).toInt) + bodyLen }.sum
    assert(stats("image/jpeg") == jpegTotal.toLong)
    // mp4 = ftyp(24) + moov(216) + mdat(8 + n) + body — the m1 oracle's
    // 248 + n arithmetic
    assert(stats("video/mp4") == (248 + mp4MdatN(3) + 16).toLong)
    assert(stats.keySet ==
      Set("image/png", "image/jpeg", "audio/wav", "video/mp4"))
  }

  test("toBlobs: binary schema, no text column leaks downstream") {
    val blobs = toBlobs(docs)
    assert(blobs.schema("payload").dataType == BinaryType)
    assert(blobs.schema.fieldNames.toSeq == Seq("doc_id", "mime", "payload"))
    assert(blobs.count() == 10)
  }

  test("decode: real PNG dims + pixel features, deterministic, partitioning preserved") {
    val blobs = toBlobs(docs).repartition(3)
    val feats = Multimodal.decode(blobs)
    assert(feats.rdd.getNumPartitions == 3) // mapPartitions keeps the layout
    val rows = feats.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 16L, 17L))
    assert(rows.forall(_.feature.length == FeatureDim))
    assert(rows.forall(r => math.abs(r.feature.map(f => f.toDouble * f).sum - 1.0) < 1e-3))
    // png dims come from the DECODED image
    assert(rows(0).width == 16 && rows(0).height == 16)
    assert(rows(4).width == 80 && rows(4).height == 80)
    // wav (width, height) = the DECODED PCM grid's (frames, channels)
    assert(rows(2).width == wavFrames(2L) && rows(2).height == 1)
    assert(rows(5).width == wavFrames(5L) && rows(5).height == 2)
    // jpeg dims come from the DECODED checked-in JFIF file, not a hash
    assert((rows(1).width, rows(1).height) == JpegFixtures.Dims(1))
    // mp4 dims come from the WALKED tkhd box, not a hash
    assert((rows(3).width, rows(3).height) == ((mp4WidthInt(3), mp4HeightInt(3))))
    // png features come from the decoded PIXELS: doc 16 shares doc 0's
    // dims and text but its grid differs -> different features
    val (a, b) = (rows(0), rows(8))
    assert(a.width == b.width && a.height == b.height)
    assert(a.feature.toSeq != b.feature.toSeq)
    // the features ARE the normalized formula chunk sums
    val d = 16
    val chunks = Array.fill(FeatureDim)(0L)
    for (p <- 0L until 3L * d * d) chunks((p % FeatureDim).toInt) += pixelValue(0L, p)
    val norm = math.sqrt(chunks.map(c => c.toDouble * c).sum)
    assert(a.feature.toSeq == chunks.map(c => (c / norm).toFloat).toSeq)
    // second run bit-identical
    val again = Multimodal.decode(toBlobs(docs).repartition(3)).collect().sortBy(_.doc_id)
    assert(again.map(_.feature.toSeq).toSeq == rows.map(_.feature.toSeq).toSeq)
  }

  test("pngPixelStats: decoded channel sums equal the formula sums") {
    val stats = pngPixelStats(toBlobs(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("width"), r.getAs[Long]("sum_r"),
          r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b")))).toMap
    assert(stats.keySet == Set(0L, 4L, 16L))
    for (id <- Seq(0L, 4L, 16L)) {
      val d = pngDimInt((id % 16).toInt)
      val sums = Array.fill(3)(0L)
      for (p <- 0L until 3L * d * d) sums((p % 3).toInt) += pixelValue(id, p)
      assert(stats(id) == ((d.toLong, sums(0), sums(1), sums(2))), s"doc $id")
    }
  }

  test("decoded features feed the similarity operators (ANN integration)") {
    val feats = Multimodal.decode(toBlobs(docs)).toDF()
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"))
    val top = Similarity.bruteForceTopK(feats.filter("vec_id = 1"), feats, k = 1)
      .collect()
    assert(top.length == 1)
    // doc 17 is byte-identical to doc 1 -> cosine 1.0 is its nearest neighbor
    assert(top.head.getAs[Long]("c_id") == 17L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}
