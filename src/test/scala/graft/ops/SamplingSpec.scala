package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Hash sampling must be deterministic, partition-independent, stable
  * under append, statistically near its nominal rate, and shuffle-free
  * where advertised.
  */
class SamplingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val ids = (0L until 5000L).map(i => (i, s"g${i % 7}"))
    .toDF("id", "grp").cache()

  test("splitByHash: total, disjoint, deterministic, partition-independent") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitByHash(ids, $"id", "s1:", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.size == 5000) // every row assigned exactly one split
    val b = Sampling.splitByHash(ids.repartition(13), $"id", "s1:", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // partitioning cannot move a row between splits

    // rates near nominal (md5 is uniform; 5000 draws, ~1.5% tolerance at
    // p≈0.8, wider at 0.1)
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") - 4000) < 150, s"train=${n("train")}")
    assert(math.abs(n("val") - 500) < 80, s"val=${n("val")}")
    assert(math.abs(n("test") - 500) < 80, s"test=${n("test")}")
  }

  test("null ids: null split from splitByHash, dropped by the filters") {
    val withNulls = Seq(Some(1L), Some(2L), None).toDF("id")
    val split = Sampling.splitByHash(withNulls, $"id", "sn:",
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(split.filter($"split".isNull).count() == 1)
    assert(split.filter($"id".isNull && $"split".isNotNull).count() == 0)
    assert(Sampling.sampleFraction(withNulls, $"id", "sn:", 1.0)
      .count() == 2) // the null id cannot be addressed: dropped
  }

  test("splitByHash is stable under append") {
    val splits = Seq("train" -> 0.9, "test" -> 0.1)
    val before = Sampling.splitByHash(ids.filter($"id" < 1000), $"id", "s2:", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val after = Sampling.splitByHash(ids, $"id", "s2:", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    // the original rows keep their assignment when new data arrives
    assert(before.forall { case (id, sp) => after(id) == sp })
  }

  test("different salts give independent samples") {
    val x = Sampling.sampleFraction(ids, $"id", "sa:", 0.5)
      .select("id").as[Long].collect().toSet
    val y = Sampling.sampleFraction(ids, $"id", "sb:", 0.5)
      .select("id").as[Long].collect().toSet
    val overlap = (x & y).size.toDouble
    // independent halves overlap in ~25% of the population
    assert(math.abs(overlap - 1250) < 150, s"overlap=$overlap")
  }

  test("sampleFraction and splitByHash are map-only (no exchange)") {
    val frac = Sampling.sampleFraction(ids, $"id", "s3:", 0.1)
    val split = Sampling.splitByHash(ids, $"id", "s3:", Seq("a" -> 1.0, "b" -> 1.0))
    for (df <- Seq(frac, split)) {
      val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, s"expected map-only plan:\n${df.queryExecution.executedPlan}")
    }
  }

  test("mixtureSample applies per-stratum rates; absent strata drop") {
    val kept = Sampling.mixtureSample(ids, $"grp", $"id", "s5:",
        Map("g0" -> 1.0, "g1" -> 0.3))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept.keySet == Set("g0", "g1")) // g2..g6 dropped
    assert(kept("g0") == ids.filter($"grp" === "g0").count())
    val n1 = ids.filter($"grp" === "g1").count().toDouble
    assert(math.abs(kept("g1") - 0.3 * n1) < 0.08 * n1, s"g1=${kept("g1")}")
    // still map-only
    val plan = Sampling.mixtureSample(ids, $"grp", $"id", "s5:",
      Map("g0" -> 0.5)).queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty)
  }

  test("stratifiedK takes exactly k per stratum, deterministically") {
    val s1 = Sampling.stratifiedK(ids, Seq("grp"), $"id", "s4:", 10)
    val perGrp = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(perGrp.values.forall(_ == 10) && perGrp.size == 7)
    val s2 = Sampling.stratifiedK(ids.repartition(11), Seq("grp"), $"id", "s4:", 10)
      .select("id").as[Long].collect().toSet
    assert(s1.select("id").as[Long].collect().toSet == s2)
  }
}
