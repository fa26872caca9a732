package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: first-seen passes, exact copies are dropped
  * ACROSS micro-batches (the dedup state survives between polls and
  * across checkpoint restarts like every other keyed state here).
  */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  test("exactStream drops cross-batch exact duplicates, keeps first-seen") {
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.exactStream(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // in-batch dup
      q.processAllAvailable()
      in.addData((4L, "alpha"), (5L, "gamma")) // cross-batch dup + new doc
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      assert(rows.length == 3)
      assert(rows.map(_._2).toSet == Set("alpha", "beta", "gamma"))
      // the survivor comes from batch 1 (in-batch pick is arbitrary; the
      // cross-batch duplicate at doc_id 4 must never surface)
      assert(Set(1L, 3L).contains(rows.filter(_._2 == "alpha").map(_._1).head))
    } finally q.stop()
  }

  test("withSimhash is bit-identical to the aggregation-form signatures") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val viaAgg = Dedup.simhashSignatures(docs)
      .as[(Long, Long)].collect().toMap
    val viaExpr = Dedup.withSimhash(docs).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaAgg)
    assert(viaAgg.values.toSet.size > 1) // sanity: not a constant
  }

  test("nearDupStream flags near-dups across batches, equal to the batch pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark state stores"),
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // exact
      (4L, "the quick brown fox jumps over the lazy cat tonight"), // near
      (5L, "yet another unrelated text on columnar shuffle plans"))
    // batch ground truth: all pairs with simhash Hamming <= 3
    val sigs = Dedup.withSimhash(docs.toDF("doc_id", "text"))
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val expected = (for {
      i <- sigs.keys; j <- sigs.keys if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (j, i, h)).toSet
    assert(expected.exists(_._3 == 0)) // the planted exact dup is in play

    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.nearDupStream(in.toDS().toDF("doc_id", "text"))
      .toDF("dup_id", "of_id", "hamming")
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*) // dups arrive in a LATER batch
      q.processAllAvailable()
      val got = spark.table("neardup")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected, s"got $got want $expected")
    } finally q.stop()
  }

  test("exactStreamWithinWatermark: bounded state, exact dedup inside the window") {
    def ts(s: Long) = new java.sql.Timestamp(1735689600000L + s * 1000)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = Dedup.exactStreamWithinWatermark(
        in.toDS().toDF("doc_id", "ts", "text"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(0), "alpha"), (2L, ts(0), "beta"))
      q.processAllAvailable()
      // duplicate within the watermark window -> suppressed
      in.addData((3L, ts(5), "alpha"))
      q.processAllAvailable()
      assert(spark.table("wm_dedup").count() == 2)

      // march event time across many micro-batches, one fresh doc each:
      // with eviction, state rows stay bounded by the keys still inside
      // the watermark window instead of growing by one per distinct doc
      var maxState = 0L
      for (i <- 1 to 8) {
        in.addData((10L + i, ts(100L * i), s"doc$i"))
        q.processAllAvailable()
        maxState = math.max(maxState,
          q.lastProgress.stateOperators.head.numRowsTotal)
      }
      assert(maxState <= 4,
        s"state grew to $maxState rows — eviction is not happening")

      // the documented re-admission: "alpha"'s fingerprint expired long
      // ago (watermark is ~790s past its sighting), so the duplicate
      // passes — bounded state trades exactness beyond the window
      in.addData((99L, ts(900), "alpha"))
      q.processAllAvailable()
      val alphas = spark.table("wm_dedup").collect()
        .count(_.getAs[String]("text") == "alpha")
      assert(alphas == 2, "an expired-key duplicate must be re-admitted")
    } finally q.stop()
  }

  test("exactStream on a batch frame keeps one row per distinct text") {
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "x")).toDF("doc_id", "text")
    val out = Dedup.exactStream(docs).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("text")).toSet == Set("x", "y"))
  }
}
