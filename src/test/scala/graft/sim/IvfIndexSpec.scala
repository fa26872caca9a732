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

  test("filtered search: predicate excludes candidates BEFORE ranking and pushes to the scan") {
    val lab = graft.io.Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val c = corpus.join(lab, "vec_id")
    val p = java.nio.file.Files.createTempDirectory("ivfindexf").toString
    Similarity.buildIvfIndex(c, SimQueries.ClusterCentPred, SimQueries.Dim, p,
      carry = Seq("label"))
    val q = c.filter(SimQueries.QueryPred)
    val filtered = Similarity.ivfTopKIndexed(spark, p, q, SimQueries.K,
      SimQueries.NProbe, candidateFilter = Some(col("label") < 4))
    val rows = filtered.join(lab.withColumnRenamed("vec_id", "c_id"), "c_id").collect()
    assert(rows.nonEmpty)
    // every returned candidate satisfies the predicate — it ran before
    // ranking, not as a post-filter that can under-fill the top-k
    assert(rows.forall(_.getAs[Int]("label") < 4))
    val perQuery = rows.groupBy(_.getAs[Long]("q_id")).values
    assert(perQuery.exists(_.size == SimQueries.K), "top-k stays full under the filter")
    // the predicate reaches the parquet scan over the index
    filtered.count()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(label,4)"),
      s"label predicate must push into the index scan:\n$plan")
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
