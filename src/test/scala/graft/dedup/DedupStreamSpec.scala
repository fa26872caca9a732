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

  test("simhashPairs: token-less docs pair with nothing, and the kernel " +
      "never evaluates inside a Filter (round-13 pushdown guard)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
      (3L, null.asInstanceOf[String]),                             // null text
      (4L, null.asInstanceOf[String]),                             // second null
      (5L, "an entirely different document about spark state stores"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs)
    val rows = pairs.as[(Long, Long, Int)].collect().toSet
    // the near-dup pair is found; the two null-signature docs pair with
    // nothing — not with each other (per-doc sentinels) and not with any
    // real signature
    assert(rows.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // plan pin: the signature kernel must appear ONLY in projections —
    // a Filter evaluating it (the pushed-down isnotnull the optimizer
    // used to infer from the hamming filter / band-join key) re-runs the
    // full tokenize below the widen exchange on the pre-shuffle side
    val phys = pairs.queryExecution.executedPlan.toString
    val filterLines = phys.linesIterator.filter(_.contains("Filter")).toSeq
    assert(filterLines.forall(!_.contains("simhashsigexpr")),
      s"kernel inside a Filter:\n${filterLines.mkString("\n")}")
  }

  test("streaming gates evaluate the signature kernel ONCE per micro-batch " +
      "(evalOnce fence keeps the isNotNull gate above the projection)") {
    def lastPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
      q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
    val in1 = MemoryStream[(Long, String)](spark)
    val q1 = Dedup.nearDupStream(in1.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("once_simhash")
      .outputMode(OutputMode.Update()).start()
    try {
      in1.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
      q1.processAllAvailable()
      val plan = lastPlan(q1)
      assert("simhashsigexpr".r.findAllIn(plan).size == 1,
        s"simhash kernel must run once per trigger:\n$plan")
    } finally q1.stop()
    val in2 = MemoryStream[(Long, String)](spark)
    val q2 = Dedup.minhashNearDupStream(in2.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("once_minhash")
      .outputMode(OutputMode.Update()).start()
    try {
      in2.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
      q2.processAllAvailable()
      val plan = lastPlan(q2)
      assert("minhashsigexpr".r.findAllIn(plan).size == 1,
        s"minhash kernel must run once per trigger:\n$plan")
    } finally q2.stop()
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

  test("withMinhash is bit-identical to the aggregation-form signatures") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val numPerms = 16
    val viaAgg = Dedup.minhashSignatures(docs, k = 3, numPerms)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until numPerms).map(i => r.getAs[Long](s"mh$i"))).toMap
    val viaExpr = Dedup.withMinhash(docs, numPerms = numPerms)
      .select("doc_id", "minhash")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("minhash"))
      .toMap
    // the projection emits NULL where the aggregation form omits the doc
    assert(viaExpr.filter(_._2 != null) == viaAgg)
    assert(viaAgg.values.toSet.size > 1) // sanity: not a constant
  }

  test("minhashNearDupStream candidates match the batch banding across batches") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "an entirely different document about spark state stores"),
      (3L, "the quick brown fox jumps over the lazy dog tonight again"), // exact
      (4L, "the quick brown fox jumps over the lazy cat tonight again"), // near
      (5L, "yet another unrelated text on columnar shuffle plans"))
    val (numPerms, bands, th) = (16, 4, 0.5)
    val r = numPerms / bands
    // batch ground truth: pairs sharing >= 1 band signature (minhashLsh's
    // candidate rule) whose est-Jaccard (matching-component fraction)
    // clears the threshold — emitted as (laterId, earlierId) on ordered
    // arrival
    val sigs = Dedup.withMinhash(docs.toDF("doc_id", "text"), numPerms = numPerms)
      .select("doc_id", "minhash")
      .collect().map(row => row.getAs[Long]("doc_id") -> row.getAs[Seq[Long]]("minhash"))
      .toMap
    val expected = (for {
      i <- sigs.keys; j <- sigs.keys if i < j
      shareBand = (0 until bands).exists(b =>
        sigs(i).slice(b * r, b * r + r) == sigs(j).slice(b * r, b * r + r))
      if shareBand
      est = sigs(i).zip(sigs(j)).count { case (a, b) => a == b }.toDouble / numPerms
      if est >= th
    } yield (j, i, est)).toSet
    assert(expected.exists(_._3 == 1.0)) // the planted exact dup is in play
    assert(expected.exists(e => e._3 < 1.0)) // and a genuinely partial match

    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashNearDupStream(in.toDS().toDF("doc_id", "text"),
        numPerms = numPerms, bands = bands, threshold = th)
      .toDF("dup_id", "of_id", "est")
      .writeStream.format("memory").queryName("mh_neardup")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*) // dups arrive in a LATER batch
      q.processAllAvailable()
      val got = spark.table("mh_neardup")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"got $got want $expected")
    } finally q.stop()
  }

  test("minhashNearDupStream: a replayed registered doc emits NO new verdicts") {
    // the upstream-replay scenario: doc 1 registers; near-dup doc 4 arrives
    // later and is flagged against it; then a stage-1 replay re-delivers
    // doc 1. Matching the replayed doc 1 against the later-registered doc 4
    // would emit (1, 4) — inverting the original verdict and dedup'ing away
    // the cluster's keeper. The gate must emit nothing for a bucket-held id.
    val a = "the quick brown fox jumps over the lazy dog tonight again"
    val near = "the quick brown fox jumps over the lazy cat tonight again"
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashNearDupStream(in.toDS().toDF("doc_id", "text"),
        numPerms = 16, bands = 4, threshold = 0.5)
      .toDF("dup_id", "of_id", "est")
      .writeStream.format("memory").queryName("mh_replay")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((1L, a)); q.processAllAvailable()
      in.addData((4L, near)); q.processAllAvailable()
      val before = spark.table("mh_replay").as[(Long, Long, Double)].collect().toSet
      assert(before.map(p => (p._1, p._2)) == Set((4L, 1L)), s"fixture: $before")
      in.addData((1L, a)) // the replay
      q.processAllAvailable()
      val after = spark.table("mh_replay").as[(Long, Long, Double)].collect().toSet
      assert(after == before, s"replay emitted new verdicts: ${after -- before}")
    } finally q.stop()
  }

  test("minhashNearDupStream: idle timeout bounds the bucket state") {
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashNearDupStream(in.toDS().toDF("doc_id", "text"),
        idleTimeoutMs = Some(1L)) // evict on a subsequent trigger
      .writeStream.format("memory").queryName("mh_evict")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six seven"))
      // processAllAvailable never latches under ProcessingTimeTimeout
      // (shouldRunAnotherBatch stays true for timeout checks), so poll the
      // progress metrics with a deadline instead — StateMachinesSpec's
      // documented pattern
      val deadline = System.nanoTime() + 60L * 1000000000L
      // filter(_.nonEmpty): under suite co-scheduling the first progress
      // events can carry an empty stateOperators array — .head would throw
      def stateRows: Long = Option(q.lastProgress)
        .map(_.stateOperators).filter(_.nonEmpty)
        .map(_.head.numRowsTotal).getOrElse(-1L)
      while (stateRows <= 0 && System.nanoTime() < deadline) Thread.sleep(100)
      val grown = stateRows
      assert(grown > 0, "buckets must be registered as state")
      // the 1 ms timeout has long expired: a later trigger removes the
      // idle buckets and state drains to zero
      while (stateRows > 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(stateRows == 0,
        s"state still holds $stateRows rows — idle eviction is not happening")
    } finally q.stop()
  }

  test("embedNearDupStream matches the batch LSH pairs — candidates AND scores") {
    val dim = 16
    def vec(i: Int): Array[Float] =
      Array.tabulate(dim)(d => (((i * 131 + d * 17) % 1009) / 1009.0f) - 0.5f)
    // 40 vectors; 35-37 are exact copies of 0-2 (cos 1.0 near-dups)
    val rows = (0 until 40).map(i =>
      (i.toLong, if (i >= 35 && i < 38) vec(i - 35) else vec(i)))
    val (planes, tables, th) = (12, 4, 0.95)
    val batch = graft.sim.Similarity
      .cosinePairsLsh(rows.toDF("vec_id", "embedding"), th, dim, planes, tables)
      .collect()
      .map(r => (r.getAs[Long]("j"), r.getAs[Long]("i"), r.getAs[Double]("cos")))
      .toSet // stream emits (later, earlier) on ordered arrival
    assert(batch.nonEmpty && batch.forall(_._3 >= th))

    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = Dedup.embedNearDupStream(in.toDS().toDF("vec_id", "embedding"),
        th, dim, planes, tables)
      .toDF("dup_id", "of_id", "cos")
      .writeStream.format("memory").queryName("emb_neardup")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(rows.take(20): _*)
      q.processAllAvailable()
      in.addData(rows.drop(20): _*) // the copies arrive in a LATER batch
      q.processAllAvailable()
      val got = spark.table("emb_neardup")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == batch, s"got $got want $batch")
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
