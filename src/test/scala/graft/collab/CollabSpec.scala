package graft.collab

import graft.SparkSpec
import graft.dipa.Codec
import graft.fixtures.Fixtures
import graft.streaming.DetectionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import scala.jdk.CollectionConverters._

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

  test("commit log: explicit offsets, duplicate redelivery, checkpoint restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-logck").toString
    val topo = Seq(
      ("s1", 1L, 1, "10.0.0.5", true), ("s1", 1L, 2, "10.0.0.6", true),
      ("s1", 1L, 3, "10.0.0.4", true))
      .toDF("switch_name", "dpid", "port", "attached", "is_host")

    // producer: two frames -> one atomic segment at base offset 0
    assert(AlertLog.nextOffset(dir) == 0)
    assert(AlertLog.append(dir, Seq("10.0.0.5@BOT", "10.0.0.4@CNC")) == 0)
    assert(AlertLog.nextOffset(dir) == 2)

    CollabSpec.sink.clear()
    val collect: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (b, _) => CollabSpec.sink.synchronized {
        CollabSpec.sink ++= b.collect()
          .map(r => (r.getAs[String]("action"), r.getAs[String]("target_ip")))
      }
    def start() = DetectionStream.mitigations(
        Collab.consume(AlertLog.stream(spark, dir), "vm1"), topo)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch(collect).start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(CollabSpec.sink.synchronized(CollabSpec.sink.size) == 2)

    // at-least-once producer: the BOT frame is REDELIVERED at a fresh
    // offset (the crashed-before-ack case), plus one genuinely new frame
    assert(AlertLog.append(dir, Seq("10.0.0.5@BOT", "10.0.0.6@BOT")) == 2)
    val q2 = start() // same checkpoint: consumer position + dedup state restored
    try q2.processAllAvailable() finally q2.stop()

    val all = CollabSpec.sink.synchronized(CollabSpec.sink.toList)
    assert(all.size == 3) // duplicate suppressed across the restart
    assert(all.count(_ == ("RATE_LIMIT", "10.0.0.5")) == 1)
    assert(all.count(_ == ("RATE_LIMIT", "10.0.0.6")) == 1)
    assert(all.count(_ == ("DROP_TELNET", "10.0.0.4")) == 1)

    // the log itself is honest about at-least-once: contiguous explicit
    // offsets, with the duplicate visible at its own offset
    val log = AlertLog.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("offset"), r.getAs[String]("value"))).sortBy(_._1)
    assert(log.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(log.count(_._2 == "10.0.0.5@BOT") == 2)
  }

  test("commit log: a producer collision fails loudly instead of losing frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-race").toString
    assert(AlertLog.append(dir, Seq("10.0.0.5@BOT")) == 0)
    assert(AlertLog.append(dir, Seq("10.0.0.6@BOT")) == 1)
    // the check-then-act race: this producer read nextOffset() == 1 before
    // the segment above appeared, and now publishes at the stale base
    val e = intercept[IllegalStateException] {
      AlertLog.publish(dir, 1L, Seq("10.0.0.4@CNC"))
    }
    assert(e.getMessage.contains("collision"))
    // the winner's frames survived untouched, and no temp debris remains
    val log = AlertLog.read(spark, dir).collect().map(_.getAs[String]("value"))
    assert(log.toSet == Set("10.0.0.5@BOT", "10.0.0.6@BOT"))
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try assert(s.iterator().asScala.forall(_.getFileName.toString.endsWith(".seg")))
    finally s.close()
  }

  test("TC2 streaming replay: per-poll exchange over the commit log + C3 pushback") {
    import graft.streaming.StateMachines
    val dir0 = java.nio.file.Files.createTempDirectory("graft-topic0").toString
    val ck1 = java.nio.file.Files.createTempDirectory("graft-tc2a").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft-tc2b").toString
    val attack = Fixtures.scenario(Fixtures.ScenarioParams(
      nBenignFlows = 100, nBots = 4, domain = "vm0"))
    val topo = attack.topology.toDF()

    // vm0 producer: detect on its own polls, publish to its topic (S6)
    val in0 = MemoryStream[graft.model.FlowStat](spark)
    val q0 = Collab.DomainEngine("vm0").publish(in0.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ck1)
      .foreachBatch(AlertLog.sink(dir0)).start()

    // vm1 consumer: subscribe to vm0's topic, install mitigations (S5/C6)
    CollabSpec.tc2Sink.clear()
    val collect: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (b, _) => CollabSpec.tc2Sink.synchronized {
        CollabSpec.tc2Sink ++= b.collect().map(r => (
          r.getAs[String]("action"), r.getAs[String]("target_ip"),
          r.getAs[String]("switch_name")))
      }
    val q1 = Collab.DomainEngine("vm1").mitigate(AlertLog.stream(spark, dir0), topo)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ck2)
      .foreachBatch(collect).start()

    try {
      // one micro-batch per poll on BOTH sides: frames produced by poll N
      // are consumed before poll N+1 — the reference's 2 s cadence
      attack.flows.groupBy(_.poll_id).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        in0.addData(rows)
        q0.processAllAvailable()
        q1.processAllAvailable()
      }
    } finally { q0.stop(); q1.stop() }

    // destination mitigations == the batch exchange on the same flows
    val streamed = CollabSpec.tc2Sink.synchronized(CollabSpec.tc2Sink.toSet)
    val batch = Collab.exchange(attack.flows.toDS(), Seq("vm0", "vm1"), topo)("vm1")
      .collect().map(r => (
        r.getAs[String]("action"), r.getAs[String]("target_ip"),
        r.getAs[String]("switch_name"))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1).contains("RATE_LIMIT"))

    // C3: the attack's victim set is identical every attacking poll, so the
    // sustained-pushback machine fires once the streak passes `sustain`
    val victims = (0 until 8).map { poll =>
      StateMachines.PushbackObs("vm0", poll.toLong,
        if (poll >= 2) Seq("h5", "h6", "h7", "h8") else Nil)
    }
    val inP = MemoryStream[StateMachines.PushbackObs](spark)
    val cmds = scala.collection.mutable.ListBuffer.empty[StateMachines.PushbackCmd]
    val qp = StateMachines.pushback(inP.toDS(), sustain = 3)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch((b: org.apache.spark.sql.Dataset[StateMachines.PushbackCmd], _: Long) =>
        cmds.synchronized { cmds ++= b.collect(); () }).start()
    try {
      victims.foreach { v => inP.addData(v); qp.processAllAvailable() }
    } finally qp.stop()
    val fired = cmds.synchronized(cmds.toList)
    assert(fired.map(_.poll_id) == Seq(5L)) // streak 4 > 3 at the 4th identical poll
    assert(fired.head.victims == Seq("h5", "h6", "h7", "h8"))
  }
}

object CollabSpec {
  val sink: scala.collection.mutable.ListBuffer[(String, String)] =
    scala.collection.mutable.ListBuffer.empty
  val tc2Sink: scala.collection.mutable.ListBuffer[(String, String, String)] =
    scala.collection.mutable.ListBuffer.empty
}
