package graft.props

import graft.multimodal.Multimodal
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Randomized foundations of the PNG synthesis path: the stored-mode
  * zlib framing must inflate back to its input for ARBITRARY payloads
  * (including multi-block sizes past 65535 and incompressible bytes),
  * and every doc id's full PNG must decode through ImageIO to exactly
  * the formula pixel grid — not just the fixture ids the specs pick.
  * Pure JVM, no Spark session.
  */
object MultimodalProps extends Properties("graft.multimodal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val genBytes: Gen[Array[Byte]] = for {
    // cross the 65535 stored-block boundary in a few cases
    n <- Gen.frequency(6 -> Gen.choose(1, 4096), 1 -> Gen.choose(65500, 140000))
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  property("storedZlib inflates back to the exact input bytes") =
    forAll(genBytes) { raw =>
      val z = Multimodal.storedZlib(raw)
      // declared framing length is the m1 oracle's arithmetic
      val nb = (raw.length + 65534) / 65535
      val lenOk = z.length == 6 + 5 * nb + raw.length
      val inf = new java.util.zip.Inflater()
      inf.setInput(z)
      val out = new Array[Byte](raw.length + 1)
      val m = inf.inflate(out)
      val done = inf.finished()
      inf.end()
      lenOk && done && m == raw.length &&
        java.util.Arrays.equals(out.take(m), raw)
    }

  property("pngFile decodes via ImageIO to the formula grid for any doc id") =
    forAll(Gen.choose(0L, 1000000L)) { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngFile(id)))
      val d = Multimodal.pngDimInt((id % 16).toInt)
      var ok = img != null && img.getWidth == d && img.getHeight == d
      if (ok) {
        // spot-check a deterministic scatter of pixels (full grids are
        // spec-checked on the fixture ids; 256x256 here would dominate
        // the property run)
        var s = 0
        while (ok && s < 24) {
          val x = ((id + 31L * s) % d).toInt
          val y = ((id * 7L + 13L * s) % d).toInt
          val rgb = img.getRGB(x, y)
          val p0 = (y.toLong * d + x) * 3
          ok = ((rgb >> 16) & 0xff) == Multimodal.pixelValue(id, p0) &&
            ((rgb >> 8) & 0xff) == Multimodal.pixelValue(id, p0 + 1) &&
            (rgb & 0xff) == Multimodal.pixelValue(id, p0 + 2)
          s += 1
        }
      }
      ok
    }

  property("walkMp4 never throws on arbitrary bytes (total parser)") =
    forAll(genBytes) { raw =>
      // the walker fronts the decode stage, where a malformed payload
      // must fall back, never kill the task — Option-total on any input,
      // including bytes that happen to start with plausible box sizes
      Multimodal.walkMp4(raw)
      Multimodal.walkMp4(raw.take(8)) // truncated header
      Multimodal.walkMp4(Multimodal.mp4File(7L).dropRight(3)) // truncated mdat
      true
    }

  property("mp4File walks back to its authored fields for any doc id + trailer") =
    forAll(Gen.choose(0L, 1000000L), Gen.asciiPrintableStr) { (id, trailer) =>
      // any printable-ASCII trailer must stop the walk (its first 4 bytes
      // read as a box size >= 0x20202020, past any payload), never parse
      val full = Multimodal.mp4File(id) ++ trailer.getBytes("US-ASCII")
      Multimodal.walkMp4(full).exists { m =>
        val n = Multimodal.mp4MdatN((id % 16).toInt)
        m.nBoxes == 3 && m.brand == "isom" &&
          m.timescale == Multimodal.mp4TimescaleInt((id % 4).toInt) &&
          m.duration == Multimodal.mp4DurationInt((id % 1000).toInt) &&
          m.width == Multimodal.mp4WidthInt((id % 8).toInt) &&
          m.height == Multimodal.mp4HeightInt((id % 8).toInt) &&
          m.mdatBytes == n &&
          m.mdatSum == (0 until n).map(p => Multimodal.pixelValue(id, p).toLong).sum
      }
    }
}
