package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase prefix sum must equal the naive global running-sum
  * window, for any bucket width and partitioning — and no window in its
  * plan may sort the full input in one task.
  */
class OrderedSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // non-contiguous ids (holes test the bucketing), deterministic sizes
  private lazy val docs = (0 until 2000).map { i =>
    (i.toLong * 3 + (i % 2), (i * 131 % 997 + 1).toLong)
  }.toDF("id", "size").cache()

  private lazy val naive = docs.withColumn("cum",
      sum($"size").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .select("id", "cum").as[(Long, Long)].collect().toMap

  test("prefixSum equals the global running sum at any bucket width") {
    for (width <- Seq(1L, 97L, 1000L, 100000L)) {
      val got = Ordered.prefixSum(docs, "id", $"size", width)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == naive, s"bucket width $width")
    }
    val shuffled = Ordered.prefixSum(docs.repartition(17), "id", $"size", 97L)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(shuffled == naive)
  }

  test("no unpartitioned window runs over the full input") {
    val plan = Ordered.prefixSum(docs, "id", $"size", 97L)
      .queryExecution.executedPlan
    val globals = collectWithSubqueries(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // the only unpartitioned window is the bucket-offset cumulation,
    // whose input is the per-bucket aggregate, never the raw rows
    globals.foreach { w =>
      val leaves = w.collectLeaves().map(_.nodeName).mkString(",")
      assert(
        w.child.exists(_.nodeName.toLowerCase.contains("aggregate")),
        s"global window must read bucket totals, not raw rows:\n$w\n($leaves)")
    }
    assert(globals.size <= 1)
  }

  test("takeBudget keeps exactly the naive cumulative prefix") {
    val naiveKeep = naive.filter(_._2 <= 50000L).keySet
    val got = Ordered.takeBudget(docs, "id", $"size", 50000L, 97L)
      .select("id").as[Long].collect().toSet
    assert(got == naiveKeep)
  }

  test("shuffleOrder: dense deterministic permutation, salt-independent epochs") {
    val n = docs.count()
    val a = Ordered.shuffleOrder(docs, "id", "epochA:", nBuckets = 64)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // dense bijection 0..n-1
    assert(a.values.toSeq.sorted == (0L until n).toSeq)
    // deterministic: a rerun is identical
    val a2 = Ordered.shuffleOrder(docs, "id", "epochA:", nBuckets = 64)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(a2 == a)
    // bucket count must not change the permutation, only the plan
    val a3 = Ordered.shuffleOrder(docs, "id", "epochA:", nBuckets = 7)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(a3 == a)
    // a different salt is a different (still dense) permutation
    val b = Ordered.shuffleOrder(docs, "id", "epochB:", nBuckets = 64)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(b.values.toSeq.sorted == (0L until n).toSeq)
    assert(b != a)
    // and it is really hash order: positions sort like the hash values
    val hashed = docs.select($"id", graft.ops.Sampling.hashUnit($"id", "epochA:").as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
      .map(_._1).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(a == hashed)
  }

  test("shuffleOrder: no unpartitioned window over the full input") {
    val plan = Ordered.shuffleOrder(docs, "id", "epochA:", nBuckets = 64)
      .queryExecution.executedPlan
    val globals = collectWithSubqueries(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    globals.foreach { w =>
      assert(w.child.exists(_.nodeName.toLowerCase.contains("aggregate")),
        s"global window must read per-bucket counts, not raw rows:\n$w")
    }
    assert(globals.size <= 1)
  }

  test("packBySize: packs are contiguous, capacity-consistent, stable") {
    val packed = Ordered.packBySize(docs, "id", $"size", 4096L, 97L)
      .select($"id", $"size", $"cum_size", $"pack")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // pack = where the row STARTS: (cum - size) div capacity
    packed.foreach { case (_, size, cum, pack) =>
      assert(pack == (cum - size) / 4096L)
    }
    // pack ids are non-decreasing in id order and start at 0
    assert(packed.head._4 == 0L)
    assert(packed.sliding(2).forall(w => w(0)._4 <= w(1)._4))
  }
}
