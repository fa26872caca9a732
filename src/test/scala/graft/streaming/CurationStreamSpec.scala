package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming curation COMPOSITION: quality → exact-digest →
  * MinHash near-dup as two chained checkpointed queries
  * (CurationStream). Each gate has its own parity spec; this one pins
  * that they compose — the final keeper set equals the batch
  * composition of the same three gate rules on ordered arrival — and
  * that the chain survives a stage-2 restart from its checkpoint with
  * state and output intact, with bounded state in both stateful stages.
  */
class CurationStreamSpec extends SparkSpec {

  import spark.implicits._
  import CurationStream.CurationDoc

  private val (numPerms, bands, th) = (16, 4, 0.5)
  private val r = numPerms / bands
  private val qualityTh = 0.5

  test("chained gates: batch-parity keepers, restart recovery, bounded state") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text")
      .as[CurationDoc].collect().sortBy(_.doc_id).take(150)
    assert(base.length == 150)
    // planted rows exercising each gate: an exact copy (stage-1 digest
    // drop), a near variant (stage-2 flag), a junk doc (quality drop).
    // Donors must themselves clear the quality gate or the planted rows
    // never reach the gate they are meant to exercise.
    val qs = graft.text.Text.qualityMetrics(
      org.apache.spark.sql.functions.col("text")).toMap.apply("quality_score")
    val passIds = base.toSeq.toDF().filter(qs >= qualityTh)
      .select("doc_id").as[Long].collect().toSet
    val donors = base.filter(d => passIds.contains(d.doc_id)).take(2)
    assert(donors.length == 2, "fixture must contain quality-passing docs")
    val nearText = {
      val w = donors(1).text.split(' '); w(w.length / 2) = "zzzz"; w.mkString(" ")
    }
    val planted = Seq(
      CurationDoc(9001L, donors(0).lang, donors(0).n_chars, donors(0).text),
      CurationDoc(9002L, donors(1).lang, nearText.length.toLong, nearText),
      CurationDoc(9003L, "en", 1L, "x"))
    val chunks = Seq(base.slice(0, 60).toSeq, base.slice(60, 150).toSeq, planted)

    val root = Files.createTempDirectory("curation").toString
    val (out1, cp1) = (s"$root/out1", s"$root/cp1")
    val (out2, cp2) = (s"$root/out2", s"$root/cp2")

    def stateRows(q: StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators).filter(_.nonEmpty)
        .map(_.head.numRowsTotal).getOrElse(-1L)

    val in = MemoryStream[CurationDoc](spark)
    val q1 = CurationStream.startQualityExactStage(in.toDS().toDF(), qualityTh, out1, cp1)
    val startStage2 = () => CurationStream.startNearDupStage(
      spark, out1, out2, cp2, k = 3, numPerms = numPerms, bands = bands, threshold = th)
    try {
      // chunk 1 through both stages, then stop stage 2 mid-corpus
      in.addData(chunks(0): _*); q1.processAllAvailable()
      val q2a = startStage2()
      q2a.processAllAvailable()
      q2a.stop()
      val dirs0 = new java.io.File(out2).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet

      // rest of the corpus lands while stage 2 is down
      in.addData(chunks(1): _*); q1.processAllAvailable()
      in.addData(chunks(2): _*); q1.processAllAvailable()

      // stage 2 restarts from its checkpoint and catches up
      val q2b = startStage2()
      q2b.processAllAvailable()

      // restart resumed: pre-stop output dirs intact, new batch ids larger
      val dirs1 = new java.io.File(out2).listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet
      assert(dirs0.subsetOf(dirs1))
      val newIds = (dirs1 -- dirs0).map(_.stripPrefix("batch=").toLong)
      val oldMax = dirs0.map(_.stripPrefix("batch=").toLong).max
      assert(newIds.nonEmpty && newIds.forall(_ > oldMax),
        s"expected post-restart batch ids above $oldMax, got $newIds")

      // ---- batch twin of the same three gate rules -------------------
      // quality + min-id exact: the same gate run in batch mode
      val all = chunks.flatten
      val exact = CurationStream
        .qualityExactGate(all.toDF(), qualityTh)
        .collect().sortBy(_.doc_id)
      assert(exact.length < all.length) // quality + digest gates both bit
      assert(!exact.map(_.doc_id).contains(9001L)) // planted exact copy dropped
      assert(!exact.map(_.doc_id).contains(9003L)) // planted junk dropped

      // greedy ordered MinHash banding rule (flagged docs still register)
      val sigs = Dedup.withMinhash(exact.toSeq.toDF(), numPerms = numPerms)
        .select("doc_id", "minhash").filter("minhash is not null")
        .collect().map(row =>
          row.getAs[Long]("doc_id") -> row.getAs[Seq[Long]]("minhash")).toMap
      val ids = sigs.keys.toSeq.sorted
      val flaggedTwin = (for {
        j <- ids; i <- ids if i < j
        shareBand = (0 until bands).exists(b =>
          sigs(i).slice(b * r, b * r + r) == sigs(j).slice(b * r, b * r + r))
        if shareBand
        est = sigs(i).zip(sigs(j)).count { case (a, b) => a == b }.toDouble / numPerms
        if est >= th
      } yield j).toSet
      assert(flaggedTwin.contains(9002L)) // planted near variant flagged
      val keepersTwin = exact.map(_.doc_id).toSet -- flaggedTwin

      // ---- composed streaming result ---------------------------------
      val got = CurationStream.keepers(spark, out1, out2)
      assert(got.columns.toSet == Set("doc_id", "lang", "n_chars", "text"))
      val gotIds = got.select("doc_id").as[Long].collect().toSet
      assert(gotIds == keepersTwin,
        s"missing=${keepersTwin -- gotIds} extra=${gotIds -- keepersTwin}")

      // ---- bounded state ---------------------------------------------
      // stage 1: one digest row per distinct quality-surviving text
      assert(stateRows(q1) == exact.length)
      // stage 2: one row per occupied (band, band-signature) bucket —
      // and the restarted query's state covers the FULL corpus, proving
      // the checkpoint carried stage-2 state across the restart
      val buckets = (for {
        id <- ids; b <- 0 until bands
      } yield (b, sigs(id).slice(b * r, b * r + r))).toSet
      assert(stateRows(q2b) == buckets.size)
      q2b.stop()
    } finally {
      q1.stop()
      spark.streams.active.foreach(_.stop())
    }
  }

  test("compaction converges the streamed corpus to the batch closure keepers on a bridge") {
    // bridge topology: a (earliest) and c share NOTHING; b arrives LAST and
    // near-dups BOTH (its token set is a's ∪ c's). The greedy at-ingest gate
    // keeps a and c (no earlier match when each arrives) and flags only b;
    // the batch closure clusters {a, b, c} and keeps only min-id a. The
    // compaction pass must land on the closure answer.
    val aTxt = (1 to 15).map(i => s"alpha$i").mkString(" ")
    val cTxt = (1 to 15).map(i => s"gamma$i").mkString(" ")
    val bTxt = aTxt + " " + cTxt
    val docs = Seq(
      CurationDoc(1L, "en", aTxt.length.toLong, aTxt),
      CurationDoc(3L, "en", cTxt.length.toLong, cTxt),
      CurationDoc(5L, "en", bTxt.length.toLong, bTxt))
    // 1-row bands: candidate iff any signature component matches — keeps
    // the bridge's banding hit deterministic at moderate similarity
    val (nP, nB, cth) = (16, 16, 0.3)

    // ---- fixture self-check + batch closure twin ----------------------
    val sigs = Dedup.withMinhash(docs.toDF(), numPerms = nP)
      .select("doc_id", "minhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("minhash")).toMap
    def est(i: Long, j: Long): Double =
      sigs(i).zip(sigs(j)).count { case (x, y) => x == y }.toDouble / nP
    assert(est(1L, 5L) >= cth, s"fixture: a~b must flag (est ${est(1L, 5L)})")
    assert(est(3L, 5L) >= cth, s"fixture: c~b must flag (est ${est(3L, 5L)})")
    assert(est(1L, 3L) < cth, s"fixture: a~c must NOT flag (est ${est(1L, 3L)})")
    // closure twin: union-find over ALL est-qualifying banded pairs
    val ids = docs.map(_.doc_id)
    val edges = for {
      j <- ids; i <- ids if i < j && est(i, j) >= cth
    } yield (i, j)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (i, j) => parent(find(i)) = find(j) }
    val closureTwin = ids.groupBy(find).values.map(_.min).toSet

    // ---- three chained queries, strict arrival order a, c, b ----------
    val root = Files.createTempDirectory("compaction").toString
    val (out1, out2, out3) = (s"$root/out1", s"$root/out2", s"$root/out3")
    val in = MemoryStream[CurationDoc](spark)
    val q1 = CurationStream.startQualityExactStage(in.toDS().toDF(), 0.0, out1, s"$root/cp1")
    val q2 = CurationStream.startNearDupStage(spark, out1, out2, s"$root/cp2",
      k = 3, numPerms = nP, bands = nB, threshold = cth)
    val q3 = CurationStream.startCompactionStage(spark, out1, out2, out3, s"$root/cp3")
    try {
      docs.foreach { d =>
        in.addData(d)
        q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
      }

      // greedy view: a and c both survive (the bridge divergence is real)
      val greedy = CurationStream.keepers(spark, out1, out2)
        .select("doc_id").as[Long].collect().toSet
      assert(greedy == Set(1L, 3L), s"greedy keepers: $greedy")
      assert(greedy != closureTwin, "fixture must actually exercise the bridge gap")

      // compaction epochs: complete snapshots, the LAST one is the closure
      val epochs = new java.io.File(out3).listFiles()
        .map(_.getName).filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toLong)
      assert(epochs.nonEmpty)
      val last = spark.read.parquet(s"$out3/epoch=${epochs.max}")
      assert(last.columns.toSet == Set("doc_id", "lang", "n_chars", "text"))
      val compacted = last.select("doc_id").as[Long].collect().toSet
      assert(compacted == closureTwin, s"compacted $compacted != closure $closureTwin")

      // the direct view agrees with the materialized snapshot
      val direct = CurationStream.compactedKeepers(spark, out1, out2)
        .select("doc_id").as[Long].collect().toSet
      assert(direct == closureTwin)
    } finally {
      q1.stop(); q2.stop(); q3.stop()
      spark.streams.active.foreach(_.stop())
    }
  }
}
