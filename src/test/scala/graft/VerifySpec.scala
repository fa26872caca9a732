package graft

import org.scalatest.funsuite.AnyFunSuite

/** The m7 JDK pre-flight: the ONLY runtime-keyed oracle row is JPEG's
  * (author-time IDCT constants), and on a foreign JRE the driver's gate
  * would fail as a bare hash mismatch — Verify.jdkPreflight turns that
  * into a named one-line diagnosis. No Spark needed: the helper is a
  * pure function of the (injectable) runtime-version string.
  */
class VerifySpec extends AnyFunSuite {

  test("matching runtime: silent") {
    assert(Verify.jdkPreflight(graft.multimodal.JpegFixtures.AuthorJdk).isEmpty)
  }

  test("same update, different build/vendor suffix: silent (family match)") {
    // IDCT code is fixed within an update release — a rebuild of the same
    // 17.0.20 must not emit the spurious mismatch warning
    val rebuild = graft.multimodal.JpegFixtures.AuthorJdk.takeWhile(_ != '+') +
      "+8-2-rebuilt-OtherVendor"
    assert(Verify.jdkPreflight(rebuild).isEmpty)
  }

  test("same feature, different update: warns (a real IDCT-relevant bump)") {
    assert(Verify.jdkPreflight("17.0.21+9-1-deb12u1-Debian").isDefined)
  }

  test("foreign runtime: names both JDKs, the affected row, and the re-pin step") {
    val fake = "21.0.99+7-FutureVendor"
    val msg = Verify.jdkPreflight(fake)
    assert(msg.isDefined)
    val m = msg.get
    assert(m.contains(fake), "must name the running JDK")
    assert(m.contains(graft.multimodal.JpegFixtures.AuthorJdk),
      "must name the authoring JDK")
    assert(m.contains("m7_jpeg_pixel_stats"),
      "must name the one affected oracle row")
    assert(m.contains("tools/AuthorJpegFixtures.java"),
      "must name the documented re-pin step")
  }
}
