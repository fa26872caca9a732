package graft.dedup

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions.col

/** Embedding-cosine dedup: greedy lowest-id keeper over LSH candidate
  * pairs. (The LSH geometry itself is oracle-checked via d5/s5; this spec
  * pins the keeper semantics.)
  */
class EmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private def unit(axis: Int): Array[Float] =
    Array.tabulate(Dim)(i => if (i == axis) 1f else 0f)

  // ids 2 and 4 are exact copies of lower ids (same LSH bucket in every
  // table, cos = 1); 5 is independent
  private lazy val vecs = Seq(
    (1L, unit(0), 0), (2L, unit(0), 0),
    (3L, unit(3), 1), (4L, unit(3), 1),
    (5L, unit(6), 2)
  ).toDF("vec_id", "embedding", "label")

  test("drops exact-duplicate vectors, keeps the lowest id of each group") {
    val kept = Dedup.embedDedup(vecs, 0.99, Dim, planes = 4, tables = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("survivors are exactly the ids never dominated in the pair list") {
    val dominated = Similarity
      .cosinePairsLsh(vecs, 0.99, Dim, planes = 4, tables = 3)
      .select("j").as[Long].collect().toSet
    val kept = Dedup.embedDedup(vecs, 0.99, Dim, planes = 4, tables = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L) -- dominated)
    // keeper output preserves the full row (schema minus nothing)
    val cols = Dedup.embedDedup(vecs, 0.99, Dim, 4, 3).columns.toSeq
    assert(cols == Seq("vec_id", "embedding", "label"))
  }
}
