package graft.props

import graft.SparkTestSession
import graft.ops.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Randomized equivalence: every skew rewrite must equal its naive form on
  * arbitrary data — including degenerate shapes a crafted fixture misses
  * (single-row keys, all-duplicate values, s = 1, every key hot).
  *
  * Spark-backed, so the case count is deliberately small (each case runs
  * four equivalence jobs); the crafted-fixture SkewSpec covers the
  * plan-shape assertions.
  */
object SkewProps extends Properties("graft.skew") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  private val genRows: Gen[List[(String, Long, Int)]] = for {
    n <- Gen.choose(1, 120)
    hotShare <- Gen.choose(0, 9) // 0..90% of rows on one key
    rows <- Gen.listOfN(n, for {
      hot <- Gen.choose(0, 9).map(_ < hotShare)
      k <- if (hot) Gen.const("hot") else Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-5, 5)
    } yield (k, v))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }

  private val genS: Gen[Int] = Gen.oneOf(1, 2, 7)

  property("all rewrites equal their naive forms") = forAll(genRows, genS) { (rows, s) =>
    import spark.implicits._
    val df = rows.toDF("k", "id", "v").cache()
    try {
      val order = Seq(col("v").desc, col("id").asc)
      val naiveTop = df.withColumn("rk", row_number().over(
          Window.partitionBy($"k").orderBy(order: _*)))
        .filter($"rk" <= 2).drop("rk")
        .collect().map(_.mkString("|")).toSet
      val saltedTop = Skew.topKPerKey(df, Seq("k"), order, 2, s, $"id")
        .collect().map(_.mkString("|")).toSet

      val dim = Seq(("hot", 1), ("a", 2), ("b", 3)).toDF("k", "tag")
      val naiveJoin = df.join(dim, Seq("k")).select("k", "id", "tag")
        .collect().map(_.mkString("|")).toSet
      val saltedJoin = Skew.saltedJoin(df, dim, Seq("k"), s, $"id")
        .select("k", "id", "tag").collect().map(_.mkString("|")).toSet

      val naiveCnt = df.groupBy("k").agg(count_distinct($"v").as("n"))
        .as[(String, Long)].collect().toMap
      val cnt = Skew.distinctCount(df, Seq("k"), $"v", s, "n")
        .as[(String, Long)].collect().toMap

      val naiveSet = df.groupBy("k").agg(sort_array(collect_set($"v")).as("vs"))
        .as[(String, Seq[Int])].collect().toMap
      val set = Skew.distinctSet(df, Seq("k"), $"v", s, "vs")
        .as[(String, Seq[Int])].collect().toMap

      saltedTop == naiveTop && saltedJoin == naiveJoin &&
        cnt == naiveCnt && set == naiveSet
    } finally { df.unpersist(); () }
  }
}
