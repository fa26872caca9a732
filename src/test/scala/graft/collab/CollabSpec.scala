package graft.collab

import graft.SparkSpec
import graft.dipa.Codec
import graft.fixtures.Fixtures
import graft.streaming.DetectionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Multi-domain collaboration: wire codec round-trips (with brace noise),
  * the TC2-shaped two-domain exchange, and a file-backed streaming
  * exchange standing in for the Pulsar topics.
  */
class CollabSpec extends SparkSpec {

  import spark.implicits._

  test("wire codec round-trips, tolerating brace noise") {
    val alerts = Seq(
      DetectionStream.DomainAlert("vm0", 3, "10.0.0.5", "BOT"),
      DetectionStream.DomainAlert("vm0", 3, "10.0.0.4", "CNC")).toDS()
    val wire = Collab.encodeAlerts(alerts)
    assert(wire.select("topic").distinct().as[String].collect().toSeq == Seq("alertvm0"))
    val decoded = Collab.consume(wire, "vm1").as[(String, String, String)].collect().toSet
    assert(decoded == Set(("vm1", "10.0.0.5", "BOT"), ("vm1", "10.0.0.4", "CNC")))

    val noisy = Seq("{'10.0.0.5'}@{'BOT'}").toDF("value")
    val d = Codec.decodeAlert(noisy).select("ip", "label").as[(String, String)].head()
    assert(d == ("10.0.0.5", "BOT"))
  }

  test("TC2 exchange: source-domain detections mitigate in the destination") {
    val attack = Fixtures.scenario(Fixtures.ScenarioParams(
      nBenignFlows = 200, nBots = 5, domain = "vm0"))
    val benign = Fixtures.scenario(Fixtures.ScenarioParams(
      nBenignFlows = 200, nBots = 0, attackStartPoll = 99, domain = "vm1"))
    val flows = (attack.flows ++ benign.flows).toDS()

    val out = Collab.exchange(flows, Seq("vm0", "vm1"), attack.topology.toDF())
    val vm1 = out("vm1").collect()
    val rateLimited = vm1.filter(_.getAs[String]("action") == "RATE_LIMIT")
      .map(_.getAs[String]("target_ip")).toSet
    assert(rateLimited == attack.bots.toSet) // collaborative accuracy 1.0
    assert(vm1.exists(r => r.getAs[String]("action") == "DROP_TELNET" &&
      r.getAs[String]("target_ip") == attack.cncIp))
    // the quiet domain publishes no BOT alerts -> no RATE_LIMIT flows back
    val vm0 = out("vm0").collect()
    assert(!vm0.exists(_.getAs[String]("action") == "RATE_LIMIT"))
  }

  test("file-backed streaming exchange (Pulsar-topic analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wire").toString
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft-ck1").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ck2").toString
    val sc = Fixtures.scenario(Fixtures.ScenarioParams(nBenignFlows = 100, nBots = 3))

    // producer side: vm0 detection alerts -> wire text files (S6 analog)
    val in = MemoryStream[graft.model.FlowStat](spark)
    val writeWire: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => batch.select("value").write.mode("append").text(dir)
    val q1 = Collab.encodeAlerts(DetectionStream.alerts(in.toDS()))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt1)
      .foreachBatch(writeWire).start()

    // consumer side: tail the topic directory -> mitigations (S5 analog)
    val wire = spark.readStream.text(dir)
    val q2 = DetectionStream.mitigations(
        Collab.consume(wire, "vm1"), sc.topology.toDF())
      .writeStream.format("memory").queryName("collab_out")
      .outputMode(OutputMode.Append()).start()

    try {
      sc.flows.groupBy(_.poll_id).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        in.addData(rows)
        q1.processAllAvailable()
      }
      q2.processAllAvailable()
      val m = spark.table("collab_out").collect()
      val rateLimited = m.filter(_.getAs[String]("action") == "RATE_LIMIT")
        .map(_.getAs[String]("target_ip")).toSet
      assert(rateLimited == sc.bots.toSet)
      assert(m.exists(_.getAs[String]("action") == "DROP_TELNET"))
    } finally { q1.stop(); q2.stop() }
  }
}
