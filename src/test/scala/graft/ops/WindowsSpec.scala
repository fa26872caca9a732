package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the order-sensitive operators (SURVEY.md §2.5). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 25.0),
    ("b", 1L, 5.0), ("b", 2L, 5.0)
  ).toDF("k", "t", "v")

  test("delta: per-key lag difference, null on first row") {
    val d = Windows.delta(series, Seq("k"), Seq("t"), "v", "d")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(d.toSeq == Seq(
      ("a", 1L, None), ("a", 2L, Some(20.0)), ("a", 3L, Some(-5.0)),
      ("b", 1L, None), ("b", 2L, Some(0.0))))
  }

  test("slidingMean: trailing k-row mean, partial windows included") {
    val m = Windows.slidingMean(series, Seq("k"), Seq("t"), "v", 2, "m")
      .orderBy("k", "t").collect().map(_.getAs[Double]("m"))
    assert(m.toSeq == Seq(10.0, 20.0, 27.5, 5.0, 5.0))
  }

  test("lastPerKey keeps the max-order row per key") {
    val l = Windows.lastPerKey(series, Seq("k"), Seq("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(l == Map("a" -> 25.0, "b" -> 5.0))
  }

  test("longestStreak: gaps-and-islands longest run over threshold") {
    val runs = Seq(
      ("a", 1L, 200.0), ("a", 2L, 200.0), ("a", 3L, 1.0), ("a", 4L, 200.0),
      ("b", 1L, 1.0)
    ).toDF("k", "t", "v")
    val s = Windows.longestStreak(runs, Seq("k"), Seq("t"), col("v") > 100.0, "len")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("a" -> 2L)) // key b has no qualifying rows → absent
  }

  test("argmax: max measure wins, ties to lowest tiebreak") {
    val t = Seq(("g1", "x", 5.0), ("g1", "a", 5.0), ("g1", "b", 1.0), ("g2", "z", 0.0))
      .toDF("g", "id", "v")
    val top = Rankings.argmax(t, Seq("g"), col("v"), Seq(col("id")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("g1" -> "a", "g2" -> "z"))
  }
}
