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

  // ---- sustained-leg ambient gate + auto-rerun (round-13 verdict #1):
  // BENCH_r12's detect_poll rows were inflated 2.25x/3.8x by a 1.48-core
  // ambient that sailed under the 4.0-core suite gate with `contended`
  // empty. The policy is driven here with synthetic ambient readings.

  private def leg(amb: Double, mean: Double) =
    Seq("x_mean" -> mean, "x_max" -> mean * 2, "x_ambient" -> amb)

  test("a clean sustained run is kept as-is: no rerun, no flag") {
    var runs = 0
    val (rows, reran, dirty) = Bench.rerunOnceIfContaminated(
      Bench.SustainedAmbientGate, "x_ambient",
      () => { runs += 1; leg(amb = 0.1, mean = 0.9) })
    assert(runs == 1 && !reran && !dirty)
    assert(rows.toMap.apply("x_mean") == 0.9)
  }

  test("the r12 contamination shape (1.48 ambient cores) triggers exactly one rerun") {
    // 1.48 cores sailed under the old 4.0-core gate; the sustained gate
    // must catch it, rerun once, and keep the clean second reading
    assert(1.48 > Bench.SustainedAmbientGate && 1.48 < 4.0)
    var runs = 0
    var rerunSeen = -1.0
    val readings = Seq(leg(amb = 1.48, mean = 1.78), leg(amb = 0.0, mean = 0.88))
    val (rows, reran, dirty) = Bench.rerunOnceIfContaminated(
      Bench.SustainedAmbientGate, "x_ambient",
      () => { val r = readings(runs); runs += 1; r },
      onRerun = rerunSeen = _)
    assert(runs == 2 && reran && !dirty)
    assert(rerunSeen == 1.48, "the rerun hook must see the dirty reading")
    assert(rows.toMap.apply("x_mean") == 0.88, "the SECOND (clean) run is what gets stamped")
  }

  test("a box contended across both passes keeps the flag (never a third run)") {
    var runs = 0
    val (rows, reran, dirty) = Bench.rerunOnceIfContaminated(
      Bench.SustainedAmbientGate, "x_ambient",
      () => { runs += 1; leg(amb = 2.0, mean = 3.0) })
    assert(runs == 2 && reran && dirty,
      "still-contaminated after one rerun must surface as contended")
    assert(rows.toMap.apply("x_ambient") == 2.0)
  }

  test("the sustained gate is an order tighter than the suite-wide cores/8 gate") {
    // 32-core host → suite gate 4.0; a ~0.5-core ambient must gate here
    assert(Bench.SustainedAmbientGate <= 0.5 + 1e-9)
    assert(Bench.SustainedAmbientGate > 0.0)
  }
}
