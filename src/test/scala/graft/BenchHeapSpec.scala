package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench heap pin (round-10): BENCH_r09's only "breach" was heap
  * geometry — the driver's ~89 GiB `-Xmx` inherited by the suite. The
  * re-exec itself is exercised by launching the bench (stderr names the
  * re-exec and the JSON stamps `heap_pinned`); these pin the pure
  * decision helpers it rides on.
  */
class BenchHeapSpec extends AnyFunSuite {

  test("heap spec parsing covers the -Xmx forms") {
    assert(Bench.parseHeapSpec("8g") == 8L << 30)
    assert(Bench.parseHeapSpec("16G") == 16L << 30)
    assert(Bench.parseHeapSpec("512m") == 512L << 20)
    assert(Bench.parseHeapSpec("65536k") == 65536L << 10)
    assert(Bench.parseHeapSpec("1t") == 1L << 40)
    assert(Bench.parseHeapSpec("123456789") == 123456789L)
  }

  test("malformed heap specs fail with a named diagnosis, not a bare parse error") {
    for (bad <- Seq("8gb", "", "g", "eight", "8 g", "-8g"))
      assert(intercept[IllegalArgumentException] {
        Bench.parseHeapSpec(bad)
      }.getMessage.contains("SPARK_GRAFT_BENCH_HEAP"), s"spec '$bad'")
  }

  test("sub-32MiB targets are rejected here, not as an opaque -Xmx0m child crash") {
    // the re-exec renders the pin in whole megabytes, so 512k would
    // truncate to -Xmx0m — the parser owns that diagnosis
    for (tiny <- Seq("512k", "31m", "1024", "16777215"))
      assert(intercept[IllegalArgumentException] {
        Bench.parseHeapSpec(tiny)
      }.getMessage.contains("32 MiB"), s"spec '$tiny'")
    assert(Bench.parseHeapSpec("32m") == 32L << 20) // the floor itself is fine
  }

  test("family band admits GC maxMemory accounting, rejects geometry changes") {
    val g8 = 8L << 30
    // exact and survivor-space-discounted heaps are in-family
    assert(Bench.heapWithinFamily(g8, g8))
    assert(Bench.heapWithinFamily(g8 - (256L << 20), g8))
    // the driver's 89 GiB and a halved heap are not
    assert(!Bench.heapWithinFamily(95563022336L, g8))
    assert(!Bench.heapWithinFamily(4L << 30, g8))
    assert(!Bench.heapWithinFamily(16L << 30, g8))
    // the sf10 tier's own pin accepts 16 g
    assert(Bench.heapWithinFamily(16L << 30, 16L << 30))
  }
}
