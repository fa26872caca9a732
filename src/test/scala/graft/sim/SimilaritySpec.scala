package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic properties of the ANN operators (the oracle rows check
  * engine parity; these check the *search* semantics): an exact duplicate
  * of the query vector is always recovered at rank 1 by every path —
  * identical vectors share every LSH table bucket and every IVF cell, so
  * neither approximation can lose them — and the approximate paths never
  * report a better top-1 than exact brute force.
  */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 16
  private def vec(i: Int): Array[Float] =
    // modulus > corpus size, or the generator itself cycles into
    // accidental exact duplicates (period = modulus in i)
    Array.tabulate(Dim)(d => (((i * 131 + d * 17) % 1009) / 1009.0f) - 0.5f)

  // 200 pseudo-random corpus vectors; vectors 100..104 are exact copies
  // of 0..4 (the planted duplicates the queries must recover)
  private lazy val corpus = (0 until 200).map { i =>
    (i.toLong, if (i >= 100 && i < 105) vec(i - 100) else vec(i))
  }.toDF("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 5)

  private def top1(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("q_id") -> (r.getAs[Long]("c_id"), r.getAs[Double]("cos")))
      .toMap

  test("planted duplicates are recovered at rank 1 by every ANN path") {
    val brute = top1(Similarity.bruteForceTopK(queries, corpus, 3))
    val lsh = top1(Similarity.lshTopKMulti(queries, corpus, 3, Dim,
      planes = 12, tables = 5, probeRadius = 1))
    val ivf = top1(Similarity.ivfTopK(queries, corpus, 3,
      centroidPred = "vec_id % 50 = 0", nprobe = 2))
    (0L until 5L).foreach { q =>
      assert(brute(q)._1 == q + 100, s"brute force missed the duplicate of $q")
      assert(lsh(q)._1 == q + 100, s"LSH missed the duplicate of $q")
      assert(ivf(q)._1 == q + 100, s"IVF missed the duplicate of $q")
      assert(math.abs(brute(q)._2 - 1.0) < 1e-9)
    }
  }

  test("filtered LSH search: predicate excludes candidates BEFORE scoring and pushes to the scan") {
    val labeled = corpus.withColumn("label", col("vec_id") % 8)
    // the planted duplicate of query 3 carries label 103 % 8 = 7 — a
    // label-<4 filter must EXCLUDE it from the results, not rank it
    val filtered = Similarity.lshTopKMulti(
      labeled.filter(col("vec_id") < 5), labeled, 3, Dim,
      planes = 12, tables = 5, probeRadius = 1,
      carry = Seq("label"), candidateFilter = Some(col("label") < 4))
    val rows = filtered
      .join(labeled.select(col("vec_id").as("c_id"), col("label")), "c_id")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("label") < 4),
      "every returned candidate must satisfy the predicate")
    val perQuery = rows.groupBy(_.getAs[Long]("q_id")).view.mapValues(_.toSeq).toMap
    assert(perQuery.values.exists(_.size == 3), "top-k stays full under the filter")
    assert(!perQuery(3L).exists(_.getAs[Long]("c_id") == 103L),
      "the label-7 duplicate must be excluded, not post-filtered")
    // equivalent to LSH over the pre-filtered corpus (filter-then-index)
    val pre = Similarity.lshTopKMulti(
      labeled.filter(col("vec_id") < 5), labeled.filter(col("label") < 4), 3,
      Dim, planes = 12, tables = 5, probeRadius = 1)
      .collect().map(_.toSeq).toSet
    assert(filtered.select("q_id", "c_id", "cos", "rank")
      .collect().map(_.toSeq).toSet == pre)
    // on a stored corpus the predicate reaches the parquet scan
    val p = java.nio.file.Files.createTempDirectory("lshfilt").toString
    labeled.write.parquet(s"$p/corpus")
    val stored = spark.read.parquet(s"$p/corpus")
    val sf = Similarity.lshTopKMulti(stored.filter(col("vec_id") < 5), stored,
      3, Dim, planes = 12, tables = 5, probeRadius = 1,
      carry = Seq("label"), candidateFilter = Some(col("label") < 4))
    sf.count()
    val plan = sf.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(label,4)"),
      s"label predicate must push into the corpus scan:\n$plan")
  }

  test("approximate top-1 never beats exact brute force") {
    val brute = top1(Similarity.bruteForceTopK(queries, corpus, 3))
    val lsh = top1(Similarity.lshTopKMulti(queries, corpus, 3, Dim,
      planes = 12, tables = 2, probeRadius = 0)) // deliberately low recall
    lsh.foreach { case (q, (_, cos)) => assert(cos <= brute(q)._2 + 1e-12) }
  }

  test("ivf assigns every corpus vector exactly one cell (full cover at nprobe = C)") {
    // probing ALL cells must reproduce brute force exactly
    val all = Similarity.ivfTopK(queries, corpus, 3, "vec_id % 50 = 0", nprobe = 4)
    val brute = Similarity.bruteForceTopK(queries, corpus, 3)
    val a = all.select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
    val b = brute.select("q_id", "c_id", "rank").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("probeMasks enumerates exactly the masks within the Hamming radius") {
    // combinatorial generator == brute-force popcount filter (small planes)
    for (planes <- Seq(3, 5, 8); radius <- 0 to 3) {
      val expected = (0L until (1L << planes))
        .filter(m => java.lang.Long.bitCount(m) <= radius).toSet
      val got = Similarity.probeMasks(planes, radius)
      assert(got.toSet == expected, s"planes=$planes radius=$radius")
      assert(got.size == got.toSet.size, "no duplicate masks")
    }
    // no 2^planes scan: wide geometry returns instantly with C(32,<=2) masks
    assert(Similarity.probeMasks(32, 2).size == 1 + 32 + 32 * 31 / 2)
  }

  test("planesFor follows the log2 sizing rule and clamps") {
    assert(Similarity.planesFor(2000, 1) == 11)   // bench geometry
    assert(Similarity.planesFor(2048, 1) == 11)
    assert(Similarity.planesFor(2049, 1) == 12)
    assert(Similarity.planesFor(1L << 40, 1024) == 20) // clamp high
    assert(Similarity.planesFor(1, 1) == 1)            // clamp low
  }

  test("one Lloyd sweep snaps stride-sampled seeds onto planted clusters") {
    val spk = spark
    // 1480 ids -> 40 stride-37 seeds; 37 mod 32 = 5 is coprime to 32, so
    // the first 32 seeds already cover every cluster residue (18 seeds on
    // 32 clusters would instead force merged cells and a mixed mean)
    val ids = spk.range(0, 1480).toDF("vec_id")
    val planted = ids.select(col("vec_id"),
      PlantedClusters.vecCol(col("vec_id")).as("embedding"))
    // seeds at a stride coprime to KC sweep every cluster residue
    val seeds = planted.filter("vec_id % 37 = 0")
      .select(col("vec_id").as("cid"), col("embedding").as("cv0"))
    val refined = Similarity.refineCentroids(planted, seeds, PlantedClusters.Dim)
    // every refined centroid must align with ONE true center (cos > 0.98):
    // a mean over same-cluster members stays near that cluster's center,
    // while a seed left unrefined sits at cos ~0.94 and a mixed-cluster
    // mean would land between centers
    val centers = PlantedClusters.centers.map(_.map(_ / 1024.0).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val refinedVecs = refined.collect().map(r =>
      r.getAs[Seq[Float]]("cv0").map(_.toDouble).toArray)
    assert(refinedVecs.nonEmpty)
    refinedVecs.foreach { rv =>
      val best = centers.map(c => cos(rv, c.toArray)).max
      assert(best > 0.98, s"refined centroid aligned at only cos=$best")
    }
    // and the refined index must recover planted-cluster neighbors:
    // full recall at nprobe=4 on a corpus with 32 clean clusters
    val q = planted.filter("vec_id < 8")
    val truth = Similarity.bruteForceTopK(q, planted, 5).select("q_id", "c_id")
    val got = Similarity.ivfTopKRefined(q, planted, 5, "vec_id % 37 = 0",
        nprobe = 4, dim = PlantedClusters.Dim).select("q_id", "c_id")
    val hits = got.join(truth, Seq("q_id", "c_id"), "left_semi").count()
    assert(hits >= 36, s"clustered recall ${hits / 40.0} < 0.9") // 40 truth rows
  }
}
