package graft.sim

import graft.SparkSpec
import graft.queries.SimQueries
import org.apache.spark.sql.functions._

/** The persisted IVF index: build→query must reproduce the in-memory
  * refined path exactly, the query plan must do NO assignment sweep, and
  * the partitioned layout must prune the scan to the probed cells.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val corpus = SimQueries.clustered(spark, dir)
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("ivfindex").toString
    Similarity.buildIvfIndex(corpus, SimQueries.ClusterCentPred, SimQueries.Dim, p)
    p
  }

  test("indexed query equals the in-memory refined path row for row") {
    val q = corpus.filter(SimQueries.QueryPred)
    val mem = Similarity.ivfTopKRefined(q, corpus, SimQueries.K,
        SimQueries.ClusterCentPred, SimQueries.NProbe, SimQueries.Dim)
      .collect().map(_.toSeq).toSet
    val idx = Similarity.ivfTopKIndexed(spark, path, q, SimQueries.K,
        SimQueries.NProbe)
      .collect().map(_.toSeq).toSet
    assert(idx == mem)
  }

  test("the stored layout is partitioned by cell and pruned at query time") {
    val cells = new java.io.File(s"$path/assigned").listFiles()
      .filter(_.getName.startsWith("cell=")) // one directory per cell
    assert(cells.length > 1, "assignments must be partitioned by cell")
    val q = corpus.filter(SimQueries.QueryPred)
    val df = Similarity.ivfTopKIndexed(spark, path, q, SimQueries.K, SimQueries.NProbe)
    df.count() // finalize the adaptive plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"probe join must dynamically prune the cell partitions:\n$plan")
  }

  test("query path has no assignment sweep") {
    val q = corpus.filter(SimQueries.QueryPred)
    val plan = Similarity.ivfTopKIndexed(spark, path, q, SimQueries.K,
      SimQueries.NProbe).queryExecution.optimizedPlan.toString
    // build-time assignment is a max_by aggregation over the whole
    // corpus; at query time the stored cells are read back instead —
    // no max_by anywhere in the plan
    assert(!plan.contains("max_by"),
      "query-time plan must read stored assignments, not recompute them")
  }
}
