package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: the reconstruction-error contract, recall
  * against the exact float ranking on the real fixture corpus, and
  * exact-duplicate recovery (identical vectors quantize identically, so
  * SQ8 can never lose a true duplicate).
  */
class QuantizationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("reconstruction error is bounded by scale/2 per component") {
    val rows = Similarity.withQuantized(emb)
      .select(col("vec_id"), col("embedding"), col("q8"), col("q8_scale"))
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      val q = r.getAs[scala.collection.Seq[Int]]("q8")
      val s = r.getAs[Double]("q8_scale")
      assert(q.forall(x => x >= -127 && x <= 127), "int8 range")
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x.toDouble - qi * s) <= s / 2 + 1e-12,
          s"vec ${r.getAs[Long]("vec_id")}: |$x - $qi*$s| > scale/2")
      }
    }
  }

  test("quantized top-k recall >= 0.9 vs the exact float ranking") {
    val q = emb.filter("vec_id < 8")
    val exact = Similarity.bruteForceTopK(q, emb, 5).select("q_id", "c_id")
    val quant = Similarity.quantizedTopK(q, emb, 5).select("q_id", "c_id")
    val n = exact.count().toDouble
    val hits = quant.join(exact, Seq("q_id", "c_id"), "left_semi").count()
    assert(hits / n >= 0.9, s"recall ${hits / n}")
  }

  test("an exact duplicate still lands at rank 1 with cosine 1.0") {
    val base = emb.limit(20).select(col("vec_id"), col("embedding"))
    val dup = base.filter("vec_id = 3")
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dup)
    val top = Similarity.quantizedTopK(corpus.filter("vec_id = 3"), corpus, 1)
      .collect().head
    assert(top.getAs[Long]("c_id") == 1003L)
    assert(math.abs(top.getAs[Double]("cos") - 1.0) < 1e-12,
      "identical vectors quantize identically -> integer cosine exactly 1")
  }
}
