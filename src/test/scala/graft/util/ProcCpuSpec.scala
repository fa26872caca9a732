package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Foreign-CPU attribution plumbing (the bench's contention sentinel).
  * The scaling constant is the HOST core count parsed from /proc/stat's
  * `cpuN` rows — not `availableProcessors`, which reports this JVM's
  * cgroup/affinity quota and would underestimate foreign load on a
  * CPU-limited JVM (ADVICE r9). These run on Linux /proc directly; on a
  * platform without it the zero-fallbacks are asserted instead.
  */
class ProcCpuSpec extends AnyFunSuite {

  private val proc = new ProcCpu
  private val hasProc = new java.io.File("/proc/stat").exists()

  test("hostCores counts the cpuN rows, never below the JVM quota") {
    if (hasProc) {
      val expected = scala.io.Source.fromFile("/proc/stat").getLines()
        .count(l => l.matches("cpu\\d+ .*"))
      assert(proc.hostCores == expected)
      // the aggregate `cpu` line spans all host CPUs, so the scaling
      // constant must be at least what this JVM is allowed to use
      assert(proc.hostCores >= Runtime.getRuntime.availableProcessors)
    } else {
      assert(proc.hostCores == Runtime.getRuntime.availableProcessors)
    }
  }

  test("snapshots are monotone and othersCores is bounded by the host") {
    val a = proc.snap()
    // burn a little CPU so Δtotal > 0 even on an idle tick
    var x = 0L; var i = 0
    while (i < 20000000) { x += i; i += 1 }
    Thread.sleep(50)
    val b = proc.snap()
    if (hasProc) {
      assert(b._2 > a._2, s"total jiffies must advance (got ${a._2} -> ${b._2}; x=$x)")
      assert(b._1 >= a._1 && b._3 >= a._3)
    }
    val others = proc.othersCores(a, b)
    assert(others >= 0.0 && others <= proc.hostCores)
  }
}
