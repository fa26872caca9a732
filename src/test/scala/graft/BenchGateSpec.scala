package graft

import org.scalatest.funsuite.AnyFunSuite

/** The recall-floor gate (round-11 verdict #4): a silent recall regression
  * must surface in the artifact's `recall_violations` array instead of
  * just stamping a smaller number. Pure-function tests — no Spark.
  */
class BenchGateSpec extends AnyFunSuite {

  test("a recall regression under its floor surfaces as a violation") {
    // the deliberately-broken case: s16's gated 1.0 silently became 0.6
    val broken = Seq("sf10_s16_recall" -> 0.6, "s3_recall" -> 0.95)
    val v = Bench.recallViolations(broken)
    assert(v.size == 1 && v.head.startsWith("sf10_s16_recall=0.6000<"),
      s"violation must name the row, the reading and the floor: $v")
  }

  test("a crashed recall measurement (-1 sentinel) is a violation, not a pass") {
    val v = Bench.recallViolations(Seq("s7_recall" -> -1.0))
    assert(v.exists(_.startsWith("s7_recall=")))
  }

  test("clean ladder and disabled tiers produce no violations") {
    // every gated row at/above its floor; the sf10 rows ABSENT (tier off)
    val clean = Seq("s3_recall" -> 0.95, "s7_recall" -> 1.0,
      "s11_recall" -> 1.0, "s3c_recall" -> 1.0, "s4c_recall" -> 1.0,
      "ann_auto_recall_uniform" -> 0.95, "ann_auto_recall_clustered" -> 1.0)
    assert(Bench.recallViolations(clean).isEmpty)
    // equality gates tolerate FP formatting of a true 1.0
    assert(Bench.recallViolations(Seq("s4c_recall" -> 0.9999999999)).isEmpty)
  }

  test("the documented resolution trades stay ungated") {
    // s4 on the structureless corpus (honest ceiling 0.6) and the raw
    // quantized rows (the refine tier's reason to exist) must not gate
    val trades = Seq("s4_recall" -> 0.6, "sf10_s14_recall" -> 0.7,
      "sf10_s15_recall" -> 0.03)
    assert(Bench.recallViolations(trades).isEmpty)
  }
}
