package graft.collab

import graft.SparkSpec
import graft.streaming.DetectionStream
import org.apache.spark.sql.streaming.OutputMode

import scala.collection.mutable

/** The transport contract behind the collaboration plane, driven through
  * the [[LogTransport]] trait: at-least-once redelivery suppressed by the
  * consumer, checkpointed resume, producer hook publishing. FileLog runs
  * it here; KafkaLog exposes the identical surface (its pure option
  * mapping is pinned below — the connector jar and a broker are absent
  * in this offline container, so its streaming arm cannot start here).
  */
class TransportSpec extends SparkSpec {

  import spark.implicits._

  private def contract(transport: LogTransport): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("transport-ck").toString
    val topo = Seq(("s1", 1L, 1, "10.0.0.5", true), ("s1", 1L, 2, "10.0.0.6", true),
        ("s1", 1L, 3, "10.0.0.4", true))
      .toDF("switch_name", "dpid", "port", "attached", "is_host")

    // producer hook publishes a batch of wire frames
    transport.sink(Seq("10.0.0.5@BOT", "10.0.0.4@CNC").toDF("value"), 0L)

    val seen = mutable.ArrayBuffer[(String, String)]()
    def start() = DetectionStream.mitigations(
        Collab.consume(transport.stream(spark), "vm1"), topo)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized {
          seen ++= b.collect().map(r =>
            (r.getAs[String]("action"), r.getAs[String]("target_ip")))
        }
        ()
      }.start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.synchronized(seen.size) == 2)

    // at-least-once: one frame redelivered, one genuinely new
    transport.sink(Seq("10.0.0.5@BOT", "10.0.0.6@BOT").toDF("value"), 1L)
    val q2 = start() // same checkpoint: position + dedup state restored
    try q2.processAllAvailable() finally q2.stop()

    val all = seen.synchronized(seen.toList)
    assert(all.size == 3, "the redelivered frame must be suppressed")
    assert(all.count(_ == ("RATE_LIMIT", "10.0.0.5")) == 1)
    assert(all.count(_ == ("RATE_LIMIT", "10.0.0.6")) == 1)
    assert(all.count(_ == ("DROP_TELNET", "10.0.0.4")) == 1)

    // the log retains the duplicate at its own offset (honest delivery)
    val frames = transport.read(spark).collect().map(_.getAs[String]("value"))
    assert(frames.count(_ == "10.0.0.5@BOT") == 2)
  }

  test("FileLog satisfies the transport contract (redelivery + restart)") {
    contract(FileLog(java.nio.file.Files.createTempDirectory("transport-log").toString))
  }

  test("KafkaLog maps the contract onto Spark's kafka source/sink options") {
    val k = KafkaLog("broker1:9092,broker2:9092", "alertvm0")
    assert(k.readerOptions("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(k.readerOptions("subscribe") == "alertvm0")
    // resume-from-checkpoint semantics: start earliest, let the query's
    // checkpoint own progress (matching FileLog's file-source behavior)
    assert(k.readerOptions("startingOffsets") == "earliest")
    // at-least-once producer, never at-most-once
    assert(k.writerOptions("kafka.enable.idempotence") == "true")
    assert(k.writerOptions("kafka.acks") == "all")
    assert(k.writerOptions("topic") == "alertvm0")
  }
}
