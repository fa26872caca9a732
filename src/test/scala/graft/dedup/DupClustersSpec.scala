package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transitive duplicate clustering: the min-label-propagation fixpoint
  * must equal true connected components (checked against a direct BFS on
  * randomized graphs), converge on chains longer than one sweep's reach,
  * and feed the closure-form keeper dedup.
  */
class DupClustersSpec extends SparkSpec {

  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.dupClusters(pairs.toDF("i", "j")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap

  /** Run `body` with the size-gated local union-find solve disabled, so
    * the distributed sweep loop is what executes (round 14: small pair
    * sets — every spec graph — solve on the driver by default).
    */
  private def forceDistributed[A](body: => A): A = {
    spark.conf.set("spark.graft.cc.localSolveMaxPairs", "0")
    try body finally spark.conf.unset("spark.graft.cc.localSolveMaxPairs")
  }

  /** Reference components by BFS over the undirected pair graph. */
  private def bfsComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seen = scala.collection.mutable.Map[Long, Long]()
    for (start <- adj.keys.toSeq.sorted if !seen.contains(start)) {
      val comp = scala.collection.mutable.Set(start)
      var frontier = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).diff(comp)
        comp ++= frontier
      }
      val label = comp.min
      comp.foreach(n => seen(n) = label)
    }
    seen.toMap
  }

  test("a chain merges to one cluster (needs multiple propagation sweeps)") {
    // 0-1-2-...-9: diameter 9, so one neighbor-min sweep cannot finish it
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = clustersOf(chain)
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("separate components keep separate labels; singletons are omitted") {
    val got = clustersOf(Seq((5L, 3L), (3L, 8L), (20L, 21L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 20L -> 20L, 21L -> 20L))
    assert(!got.contains(99L)) // never-paired docs don't appear
  }

  test("fixpoint equals BFS components on randomized graphs") {
    // deterministic LCG-built graphs of varying density, incl. cycles
    var seed = 42L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 4) {
      val n = 30 + trial * 10
      val pairs = (0 until n).map { _ =>
        val a = nextInt(25).toLong; val b = nextInt(25).toLong
        if (a == b) (a, a + 1) else (a, b)
      }
      // default path (local union-find under the size gate) AND the
      // distributed sweep loop must both equal the BFS reference —
      // the cross-implementation check that pins local == distributed
      assert(clustersOf(pairs) == bfsComponents(pairs), s"trial $trial (local)")
      assert(forceDistributed(clustersOf(pairs)) == bfsComponents(pairs),
        s"trial $trial (distributed)")
    }
  }

  test("dedupByClusters keeps min-id per cluster plus singletons (the closure win)") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "lone"))
      .toDF("doc_id", "text")
    // chain 1~2~3 plus pair 3~4: greedy pairwise keeping would retain 1
    // and 3 (3 dominates 4, 1 dominates 2, but 3 has no lower-id PAIR
    // with 1); the closure keeps ONLY 1 — and the singleton 9 survives
    val kept = Dedup.dedupByClusters(docs,
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("i", "j"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L))
  }

  test("non-convergence inside maxIters fails loudly instead of half-merging") {
    // maxIters bounds the DISTRIBUTED sweep loop; the local solve has no
    // iteration to bound, so pin the behavior on the distributed path
    val chain = (0L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      forceDistributed {
        Dedup.dupClusters(chain.toDF("i", "j"), maxIters = 2).collect()
      }
    }
    assert(e.getMessage.contains("converge"))
  }

  test("reliable-checkpoint mode (one conf) produces identical clusters") {
    // production survivability path: every sweep barrier becomes a
    // DFS-backed checkpoint() instead of executor-local blocks — same
    // fixpoint, same labels
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val base = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.cc.reliableCheckpoint", "true")
    try {
      val rel = forceDistributed {
        Dedup.dupClusters(pairs).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(rel == base)
      // the barriers really went through the reliable path: checkpoint
      // files exist under the configured dir
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally spark.conf.unset("spark.graft.cc.reliableCheckpoint")
  }
}
