package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Session semantics: the ordinal assigner and the native session_window
  * rollup must agree with each other and with hand-computed sessions, and
  * the rollup must run INCREMENTALLY under a watermark — closed sessions
  * emit once the watermark passes their end, which is what bounds state on
  * an unbounded stream.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  // gap 30 s: user a → sessions {0,10}, {100}; user b → {5}
  private val events = Seq(
    ("a", ts(0), 0L), ("a", ts(10), 10L), ("a", ts(100), 100L),
    ("b", ts(5), 5L))

  test("sessionize assigns gap-based ordinals per key") {
    val df = events.toDF("user", "t", "t_ms")
      .withColumn("t_ms", col("t_ms") * 1000000) // seconds → micros
    val got = Sessions.sessionize(df, Seq("user"), "t_ms", 30L * 1000000)
      .select("user", "t_ms", "session_seq").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", 0L, 1L), ("a", 10000000L, 1L),
      ("a", 100000000L, 2L), ("b", 5000000L, 1L)))
  }

  test("sessionStats equals the ordinal rollup, and streams under a watermark") {
    val df = events.toDF("user", "t", "t_ms").drop("t_ms")
    val batch = Sessions.sessionStats(df, Seq("user"), "t", "30 seconds")
      .as[(String, Long, Long, Long)].collect().toSet
    val base = 1700000000000000L // micros
    assert(batch == Set(
      ("a", base, base + 40000000L, 2L),          // [0, 10+30)
      ("a", base + 100000000L, base + 130000000L, 1L),
      ("b", base + 5000000L, base + 35000000L, 1L)))

    // streaming: same expression over a MemoryStream; a late sentinel event
    // advances the watermark past every session end so all close and emit
    val in = MemoryStream[(String, Timestamp)](spark)
    val sessions = Sessions.sessionStats(
      in.toDF().toDF("user", "t").withWatermark("t", "0 seconds"),
      Seq("user"), "t", "30 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    in.addData(events.map(e => (e._1, e._2)): _*)
    q.processAllAvailable()
    in.addData(("sentinel", ts(3600)))
    q.processAllAvailable()
    val streamed = spark.table("sess")
      .as[(String, Long, Long, Long)].collect().toSet
    q.stop()
    spark.sql("DROP VIEW IF EXISTS sess")
    assert(streamed == batch) // sentinel's own session is still open: absent
  }
}
