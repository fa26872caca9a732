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
}
