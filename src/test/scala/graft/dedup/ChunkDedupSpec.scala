package graft.dedup

import graft.SparkSpec

/** Sub-document (chunk-level) exact dedup: first-occurrence-wins windows,
  * ordered reassembly, whole-repeat disappearance, short tail chunks.
  * (The d8 oracle replays the full rule in DuckDB; this pins the corner
  * semantics on a readable fixture.)
  */
class ChunkDedupSpec extends SparkSpec {

  import spark.implicits._

  test("repeated chunks drop corpus-wide; documents reassemble in order") {
    // k = 2: doc 1 owns chunks "a b" and "c d"; doc 2 repeats "a b"
    // (dropped) and adds "x y" (kept); doc 3 is entirely doc 1's chunks
    // and must disappear; doc 4's tail chunk is shorter than k
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d a b"),
      (4L, "p q r")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, k = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c d", 2L -> "x y", 4L -> "p q r"))
  }

  test("within-document repeats keep only the first occurrence") {
    val docs = Seq((7L, "a b a b c d")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, k = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(7L -> "a b c d"))
  }

  test("whole-document degenerate case equals exact dedup's keeper rule") {
    // chunk width >= doc length: the rule collapses to exact text dedup
    val docs = Seq((1L, "same text"), (5L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, k = 16).collect()
      .map(r => r.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("streaming gate: batch parity in-batch, cross-batch memory, bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)](spark)
    val q = Dedup.chunkDedupStream(in.toDS().toDF("doc_id", "text"), k = 2)
      .toDF("doc_id", "cidx", "chunk")
      .writeStream.format("memory").queryName("chunk_gate")
      .outputMode("update").start()
    try {
      // batch 1: the bridge fixture of the batch spec — same verdicts
      in.addData((1L, "a b c d"), (2L, "a b x y"), (3L, "c d a b"))
      q.processAllAvailable()
      val got1 = spark.table("chunk_gate")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got1 == Set((1L, 0, "a b"), (1L, 1, "c d"), (2L, 1, "x y")))

      // batch 2: chunks seen in batch 1 stay dropped ACROSS batches;
      // fresh chunks pass
      in.addData((9L, "c d p q"))
      q.processAllAvailable()
      val got2 = spark.table("chunk_gate")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got2 == got1 + ((9L, 1, "p q")))

      // bounded state: one entry per DISTINCT chunk ever seen
      val stateRows = Option(q.lastProgress).map(_.stateOperators)
        .filter(_.nonEmpty).map(_.head.numRowsTotal).getOrElse(-1L)
      assert(stateRows == 4L) // "a b", "c d", "x y", "p q" — never the text rows

      // replay idempotence: a re-delivered WINNER re-emits its original
      // rows (same verdicts), a re-delivered LOSER stays dropped — the
      // surviving-row SET never changes under upstream replay
      in.addData((1L, "a b c d"), (3L, "c d a b"))
      q.processAllAvailable()
      val got3 = spark.table("chunk_gate")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got3 == got2, s"replay changed verdicts: ${got3 -- got2}")
    } finally q.stop()
  }

  test("streaming gate rejects doc ids outside the order-packing range") {
    // order packs (doc_id << 21 | cidx): an id >= 2^42 would wrap the
    // packing and a negative id collides with the (-1, -1) sentinel —
    // both must fail LOUDLY at the gate, not corrupt arrival order
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    for (badId <- Seq(1L << 42, -1L)) {
      val in = MemoryStream[(Long, String)](spark)
      val q = Dedup.chunkDedupStream(in.toDS().toDF("doc_id", "text"), k = 2)
        .writeStream.format("noop").outputMode("update").start()
      try {
        in.addData((badId, "a b"))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def messages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
        assert(messages(e).exists(_.contains("order packing")),
          s"id $badId: expected the order-packing guard, got $e")
      } finally q.stop()
    }
  }
}
