package graft.props

import graft.SparkTestSession
import graft.ops.{Sampling, Temporal}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Randomized equivalence for the temporal rewrites and hash sampling —
  * arbitrary interleavings, duplicate timestamps, empty sides, intervals
  * of every length relative to the bin width.
  */
object TemporalProps extends Properties("graft.temporal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  private val genProbe: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      ts <- Gen.choose(0L, 80L)
    } yield (k, ts))
  } yield rows

  private val genRef: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(0, 30) // empty ref side included
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "d")
      ts <- Gen.choose(0L, 80L)
    } yield (k, ts))
  } yield rows

  property("asofJoin equals the naive max-ts-at-or-before lookup") =
    forAll(genProbe, genRef) { (ps, rs) =>
      import spark.implicits._
      val probe = ps.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "ts", "pid")
      val ref = rs.toDF("k", "ts")
        .groupBy("k", "ts").agg(count(lit(1)).cast("string").as("pay"))
      val fast = Temporal.asofJoin(probe, ref, Seq("k"), "ts")
        .select("k", "ts", "pid", "pay")
        .collect().map(_.mkString("|")).toSet
      val naive = probe.as("p")
        .join(ref.as("r"), $"p.k" === $"r.k" && $"p.ts" >= $"r.ts", "left")
        .groupBy($"p.k".as("k"), $"p.ts".as("ts"), $"p.pid".as("pid"))
        .agg(max_by($"r.pay", $"r.ts").as("pay"))
        .collect().map(_.mkString("|")).toSet
      fast == naive
    }

  private val genIntervals: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, for {
      lo <- Gen.choose(0L, 90L)
      len <- Gen.choose(1L, 40L)
    } yield (lo, lo + len))
  } yield rows

  property("rangeJoin equals the naive inequality join at any bin width") =
    forAll(genProbe, genIntervals, Gen.oneOf(1L, 5L, 64L, 1000L)) {
      (ps, ivs, width) =>
        import spark.implicits._
        val pts = ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, t) }
          .toDF("pid", "ts")
        val wins = ivs.zipWithIndex.map { case ((lo, hi), i) =>
          (s"w$i", lo, hi)
        }.toDF("wid", "lo", "hi")
        val fast = Temporal.rangeJoin(pts, "ts", wins, "lo", "hi", width)
          .select("pid", "wid").collect().map(_.mkString("|")).toSet
        val naive = pts.join(wins, $"ts" >= $"lo" && $"ts" < $"hi")
          .select("pid", "wid").collect().map(_.mkString("|")).toSet
        fast == naive
    }

  property("prefixSum equals the sequential scan on random data") =
    forAll(
      Gen.choose(1, 150).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 50L)).map(_.zipWithIndex)),
      Gen.oneOf(1L, 13L, 4096L)) { (sized, width) =>
      import spark.implicits._
      // ids spaced by 3 so buckets have holes; sizes arbitrary incl. 0
      val rows = sized.map { case (sz, i) => (i.toLong * 3, sz) }
      val got = graft.ops.Ordered
        .prefixSum(rows.toDF("id", "size"), "id", col("size"), width)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val want = rows.scanLeft((-1L, 0L)) { case ((_, acc), (id, sz)) =>
        (id, acc + sz)
      }.drop(1).toMap
      got == want
    }

  property("splitByHash partitions every row into exactly one split") =
    forAll(Gen.choose(1, 200), Gen.choose(1, 5)) { (n, nSplits) =>
      import spark.implicits._
      val df = (0 until n).map(_.toLong).toDF("id")
      val splits = (1 to nSplits).map(i => (s"s$i", i.toDouble))
      val out = Sampling.splitByHash(df, col("id"), "p:", splits)
        .groupBy("split").count().collect()
      out.map(_.getLong(1)).sum == n.toLong &&
        out.forall(r => splits.exists(_._1 == r.getString(0)))
    }
}
