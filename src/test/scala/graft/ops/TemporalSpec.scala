package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The temporal rewrites must be row-identical to the naive non-equi
  * forms they replace, and their plans must contain no non-equi join
  * node — that is the entire point of the rewrite.
  */
class TemporalSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  // deterministic pseudo-random fixture: 3 keys, interleaved ref/probe
  // rows, duplicate timestamps included on purpose
  private lazy val probe: DataFrame = (0 until 120).map { i =>
    (s"k${i % 3}", (i * 7 % 50).toLong * 10, i.toLong)
  }.toDF("k", "ts", "pid").cache()

  private lazy val ref: DataFrame = (0 until 40).map { i =>
    (s"k${i % 4}", (i * 13 % 50).toLong * 10, s"v$i")
  }.toDF("k", "ts", "payload")
    // asofJoin requires (keys, ts)-unique refs: keep the max payload
    .groupBy("k", "ts").agg(max("payload").as("payload"))
    .withColumn("ref_ts", col("ts")).cache()

  test("asofJoin equals the naive latest-at-or-before lookup") {
    val naive = probe.as("p")
      .join(ref.as("r"), $"p.k" === $"r.k" && $"p.ts" >= $"r.ts", "left")
      .groupBy($"p.k".as("k"), $"p.ts".as("ts"), $"p.pid".as("pid"))
      .agg(max_by(struct($"r.payload", $"r.ref_ts"), $"r.ts").as("m"))
      .select($"k", $"ts", $"pid", $"m.payload", $"m.ref_ts")
    val fast = Temporal.asofJoin(probe, ref, Seq("k"), "ts")
      .select("k", "ts", "pid", "payload", "ref_ts")
    assert(rows(fast) == rows(naive))
    // k2 probes before the first k2 ref, and every probe of a key with no
    // ref rows, must survive with null payload
    assert(fast.filter($"payload".isNull).count() ==
      naive.filter($"payload".isNull).count())
  }

  test("asofJoin: null keys never match; null payload cells stay atomic") {
    val p = Seq((Some("a"), 10L, 1L), (None, 10L, 2L))
      .toDF("k", "ts", "pid")
    val r = Seq((Some("a"), 1L, Some("x"), "y1"),
        (Some("a"), 5L, None, "y2"),     // later ref with a NULL cell
        (None, 1L, Some("nk"), "nk"))    // null-keyed ref: invisible
      .toDF("k", "ts", "a", "b")
    val got = Temporal.asofJoin(p, r, Seq("k"), "ts")
      .select("pid", "a", "b").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getString(2)))
      .toSet
    // pid 1 gets the ts=5 ref AS A WHOLE (a=null, b=y2) — never the
    // column-wise mix (a=x, b=y2); the null-keyed probe gets no payload
    assert(got == Set((1L, null, "y2"), (2L, null, null)))
  }

  test("asofJoin: inclusive by default, strict excludes the equal-ts ref") {
    val p = Seq(("a", 10L, 1L)).toDF("k", "ts", "pid")
    val r = Seq(("a", 10L, "now"), ("a", 5L, "old")).toDF("k", "ts", "payload")
    val incl = Temporal.asofJoin(p, r, Seq("k"), "ts")
      .select("payload").as[String].collect()
    assert(incl.toSeq == Seq("now"))
    val strict = Temporal.asofJoin(p, r, Seq("k"), "ts", strict = true)
      .select("payload").as[String].collect()
    assert(strict.toSeq == Seq("old"))
  }

  test("asofJoin plans with NO join node at all") {
    val plan = Temporal.asofJoin(probe, ref, Seq("k"), "ts")
      .queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"expected a join-free window plan, got:\n$plan")
  }

  // intervals of mixed lengths (some span several bins), points dense
  // enough that bin collisions without true overlap occur
  private lazy val intervals: DataFrame = (0 until 30).map { i =>
    val start = (i * 17 % 200).toLong
    (s"w$i", s"k${i % 3}", start, start + 1 + (i * 11 % 60))
  }.toDF("wid", "k", "lo", "hi").cache()

  private lazy val points: DataFrame = (0 until 150).map { i =>
    (i.toLong, s"k${i % 3}", (i * 3 % 220).toLong)
  }.toDF("pid", "k", "ts").cache()

  test("rangeJoin (keyed) equals the naive inequality join, exactly once") {
    val naive = points.as("p").join(intervals.as("w"),
        $"p.k" === $"w.k" && $"p.ts" >= $"w.lo" && $"p.ts" < $"w.hi")
      .select($"p.pid", $"w.wid")
    for (binWidth <- Seq(7L, 25L, 300L)) {
      val fast = Temporal.rangeJoin(points, "ts", intervals,
        "lo", "hi", binWidth, keys = Seq("k")).select("pid", "wid")
      assert(fast.count() == naive.count(), s"dup/missing at bin $binWidth")
      assert(rows(fast) == rows(naive), s"mismatch at bin $binWidth")
    }
  }

  test("rangeJoin (global) equals the naive cross range join") {
    val naive = points.as("p").join(intervals.as("w"),
        $"p.ts" >= $"w.lo" && $"p.ts" < $"w.hi")
      .select($"p.pid", $"w.wid", $"w.k".as("wk"))
    val fast = Temporal.rangeJoin(points.drop("k"), "ts", intervals,
        "lo", "hi", 25L)
      .select($"pid", $"wid", $"k".as("wk"))
    assert(rows(fast) == rows(naive))
  }

  test("keyless density guard: silent on sparse inputs, fires in the quadratic regime") {
    // the z2 shape at test/bench scale: far under the absolute floor
    assert(Temporal.keylessDensityDiagnosis(
      points.drop("k"), "ts", intervals, "lo", "hi", 25L).isEmpty)
    // empty sides: never warn
    assert(Temporal.keylessDensityDiagnosis(
      points.drop("k").limit(0), "ts", intervals, "lo", "hi", 25L).isEmpty)
    assert(Temporal.keylessDensityDiagnosis(
      points.drop("k"), "ts", intervals.limit(0), "lo", "hi", 25L).isEmpty)
    // dense: 3000 points × 3000 intervals all inside two bins — the
    // quadratic-OUTPUT regime the century tier excluded z2 over
    // (est ≈ 3000 × 6000 / 2 = 9M matches from 6000 input rows)
    val densePts = spark.range(3000)
      .select(col("id").as("pid"), (col("id") % 50).as("ts"))
    val denseIvs = spark.range(3000)
      .select(col("id").as("wid"), lit(0L).as("lo"), lit(50L).as("hi"))
    val diag = Temporal.keylessDensityDiagnosis(
      densePts, "ts", denseIvs, "lo", "hi", 25L)
    assert(diag.isDefined, "dense fixture must trip the guard")
    assert(diag.get.contains("Partition by a real key"),
      "diagnosis must point at the keyed variant")
    // inverted intervals are invisible to the estimate (they join to
    // nothing), so an all-inverted interval side stays silent
    val inverted = denseIvs.select(col("wid"), col("hi").as("lo"), col("lo").as("hi"))
    assert(Temporal.keylessDensityDiagnosis(
      densePts, "ts", inverted, "lo", "hi", 25L).isEmpty)
  }

  test("rangeJoinStream matches the batch join and drops late rows") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

    // windows open at 0s (u1) and 100s (u2), length 30s
    val wins = Seq(("u1", ts(0), "w1"), ("u2", ts(100), "w2"))
    val pts = Seq(("u1", ts(10), 1L), ("u1", ts(29), 2L), ("u1", ts(30), 3L),
      ("u2", ts(110), 4L), ("u1", ts(110), 5L))

    val wIn = MemoryStream[(String, Timestamp, String)](spark)
    val pIn = MemoryStream[(String, Timestamp, Long)](spark)
    val joined = Temporal.rangeJoinStream(
      pIn.toDF().toDF("k", "pt", "pid"),
      "pt",
      wIn.toDF().toDF("k", "wstart", "wid"),
      "wstart", "30 seconds", "10 seconds", keys = Seq("k"))
    val q = joined.select("pid", "wid").writeStream
      .format("memory").queryName("rjs").outputMode("append").start()
    try {
      wIn.addData(wins: _*)
      pIn.addData(pts: _*)
      q.processAllAvailable()
      val got = spark.table("rjs").as[(Long, String)].collect().toSet
      // pid 3 is at the exclusive end, pid 5 is outside u1's window
      assert(got == Set((1L, "w1"), (2L, "w1"), (4L, "w2")))

      // a point far behind the watermark (now ~110s, delay 10s) is dropped
      pIn.addData(("u1", ts(5), 99L))
      q.processAllAvailable()
      assert(spark.table("rjs").as[(Long, String)].collect().toSet == got)

      // bounded state: march event time far forward in several batches —
      // every buffered row above is now past watermark + window and must
      // have been evicted from the join state
      for (h <- 1 to 4) {
        pIn.addData(("u3", ts(h * 3600L), 1000L + h))
        wIn.addData(("u3", ts(h * 3600L), s"wlate$h"))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4,
        s"join state must evict expired rows, holds $stateRows")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS rjs")
    }
  }

  test("asofStream matches asofJoin in batch and holds state across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // batch parity: run the stateful form over the SAME fixture as the
    // window form (runMachine works on batch Datasets; state starts empty)
    val probeDs = probe.as[(String, Long, Long)]
    val refDs = ref.select("k", "ts", "payload").as[(String, Long, String)]
    val streamed = Temporal.asofStream(probeDs, refDs)(
        _._1, _._1, _._2, _._2)
      .map { case ((k, t, pid), r) => (k, t, pid, r.map(_._3).orNull) }
      .collect().toSet
    val batch = Temporal.asofJoin(probe, ref.drop("ref_ts"), Seq("k"), "ts")
      .select("k", "ts", "pid", "payload")
      .as[(String, Long, Long, String)].collect().toSet
    assert(streamed == batch)

    // cross-batch: a ref in batch 1 enriches a probe in batch 2; a ref
    // arriving after the probe's batch does NOT retro-enrich (documented)
    val pIn = MemoryStream[(String, Long, Long)](spark)
    val rIn = MemoryStream[(String, Long, String)](spark)
    val q = Temporal.asofStream(pIn.toDS(), rIn.toDS())(
        _._1, _._1, _._2, _._2)
      .map { case ((k, _, pid), r) => (k, pid, r.map(_._3).orNull) }
      .writeStream.format("memory").queryName("aos").outputMode("update")
      .start()
    try {
      rIn.addData(("a", 10L, "r1"))
      q.processAllAvailable()
      pIn.addData(("a", 20L, 1L), ("b", 20L, 2L))
      q.processAllAvailable()
      rIn.addData(("b", 5L, "r2")) // too late for probe 2
      pIn.addData(("b", 30L, 3L))  // but in time for probe 3
      q.processAllAvailable()
      val got = spark.table("aos").as[(String, Long, String)]
        .collect().toSet
      assert(got == Set(("a", 1L, "r1"), ("b", 2L, null), ("b", 3L, "r2")))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS aos")
    }
  }

  test("rangeJoin plans as an equi-join: no BNLJ, no cartesian") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Temporal.rangeJoin(points.drop("k"), "ts", intervals,
        "lo", "hi", 25L).queryExecution.executedPlan
      val bad = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }
      assert(bad.isEmpty, s"expected equi-join machinery only, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
