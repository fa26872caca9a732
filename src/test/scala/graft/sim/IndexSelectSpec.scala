package graft.sim

import graft.SparkSpec
import graft.queries.SimQueries
import org.apache.spark.sql.functions._

/** The ANN index-selection router: the sampled cluster-mass probe must
  * separate the two gate fixtures cleanly and route each to the index
  * that carries recall there — LSH on the direction-uniform `embeddings`
  * corpus (where IVF's honest ceiling was 0.6 recall), Lloyd-refined IVF
  * on the PlantedClusters corpus (where cells match real density).
  * Fixtures are the driver-generated sf0.001 tables, the same corpora
  * Bench gates `ann_auto_recall_*` on at sf0.1.
  */
class IndexSelectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val uniform = graft.io.Tables.embeddings(spark, dir)
  private lazy val clustered = SimQueries.clustered(spark, dir)

  test("cluster mass separates the fixtures with a wide margin") {
    val u = Similarity.clusterMass(uniform)
    val c = Similarity.clusterMass(clustered)
    // the 0.7 default threshold sits in the gap between these two; a
    // drift of either fixture toward it should fail loudly here first
    assert(u < 0.6, s"uniform corpus measured $u — expected well below 0.7")
    assert(c > 0.85, s"clustered corpus measured $c — expected well above 0.7")
  }

  test("the router picks LSH on the uniform corpus and IVF on the clustered one") {
    assert(Similarity.recommendIndex(uniform)._1 == "lsh")
    assert(Similarity.recommendIndex(clustered)._1 == "ivf")
  }

  test("routed top-k clears 0.9 recall on BOTH corpora") {
    for ((corpus, tag) <- Seq((uniform, "uniform"), (clustered, "clustered"))) {
      val c = corpus.cache()
      val q = c.filter(SimQueries.QueryPred)
      val truth = Similarity.bruteForceTopK(q, c, SimQueries.K)
        .select("q_id", "c_id").cache()
      val nTruth = truth.count().toDouble
      val (_, _, topk) = SimQueries.annAutoTopK(q, c)
      val hits = topk.select("q_id", "c_id")
        .join(truth, Seq("q_id", "c_id"), "left_semi").count()
      assert(hits / nTruth >= 0.9, s"$tag recall ${hits / nTruth}")
      truth.unpersist(); c.unpersist()
    }
  }

  test("the probe is deterministic and corpus-order-independent") {
    val a = Similarity.clusterMass(uniform)
    val b = Similarity.clusterMass(uniform.repartition(7).sortWithinPartitions(desc("vec_id")))
    assert(a == b)
  }
}
