package graft.streaming

import graft.SparkSpec
import graft.collab.Collab
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable

/** C7 closed in the live stream: an injected CNC alert, consumed through
  * the real wire decode, changes the protocol label of packets in the
  * NEXT micro-batch — `DIPA_Controller.py:123-126, 270` semantics at
  * micro-batch granularity.
  */
class ClassifierLoopSpec extends SparkSpec {

  import spark.implicits._

  test("a consumed CNC alert relabels the next micro-batch's packets") {
    val ref = new ClassifierLoop.ConfigRef
    val alertCk = java.nio.file.Files.createTempDirectory("c7-alert-ck").toString
    val pktCk = java.nio.file.Files.createTempDirectory("c7-pkt-ck").toString

    // alert leg: wire frames -> decode (O9) -> trigger fold
    val wire = MemoryStream[String](spark)
    val alertQ = ClassifierLoop.consumeTriggers(
      Collab.consume(wire.toDF().toDF("value"), "vm1"), ref, alertCk)

    // packet leg: labeled batches buffered per micro-batch
    val out = mutable.ArrayBuffer[(Long, String, String)]() // (batch, key, label)
    val pkts = MemoryStream[(Int, Int, String)](spark)
    val pktQ = ClassifierLoop.classifyLive(
      pkts.toDS().toDF("ip_proto", "dst_port", "pkt"), "vm1", ref, pktCk) {
      (batch: DataFrame, id: Long) =>
        out.synchronized {
          out ++= batch.collect().map(r =>
            (id, r.getAs[String]("pkt"), r.getAs[String]("protocol")))
        }
        ()
    }

    try {
      // batch 0: no trigger — odd-port TCP is plain TCP, web stays web
      pkts.addData((6, 8081, "a"), (6, 80, "b"), (17, 53, "c"))
      pktQ.processAllAvailable()

      // the foreign domain elects a CNC; the alert is consumed between
      // packet batches (the reference consumes on its own thread)
      wire.addData("10.0.0.4@CNC")
      alertQ.processAllAvailable()
      assert(ref.get("vm1").collab.contains("Telnet"))

      // batch 1: the SAME packet shapes — generic TCP is now surveilled
      // as Telnet; explicit-port arms above it are untouched
      pkts.addData((6, 8081, "a2"), (6, 80, "b2"), (17, 53, "c2"))
      pktQ.processAllAvailable()

      // BOT alerts install rules but do not touch the classifier config
      wire.addData("10.0.0.9@BOT")
      alertQ.processAllAvailable()
      assert(ref.get("vm1") == StateMachines.TriggerState(None, Some("Telnet")))
    } finally { pktQ.stop(); alertQ.stop() }

    val byKey = out.synchronized(out.toList).map(t => t._2 -> t._3).toMap
    assert(byKey("a") == "TCP",     "before the alert: odd-port TCP is TCP")
    assert(byKey("a2") == "Telnet", "after the alert: relabeled next batch")
    assert(byKey("b") == "HTTP" && byKey("b2") == "HTTP") // port-80 arm wins first
    assert(byKey("c") == "DNS" && byKey("c2") == "DNS")   // non-TCP untouched
  }
}
