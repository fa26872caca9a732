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

  test("exactStream on a batch frame keeps one row per distinct text") {
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "x")).toDF("doc_id", "text")
    val out = Dedup.exactStream(docs).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("text")).toSet == Set("x", "y"))
  }
}
