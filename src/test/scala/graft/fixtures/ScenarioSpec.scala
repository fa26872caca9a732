package graft.fixtures

import graft.SparkSpec
import graft.dipa.Detect
import graft.streaming.DetectionStream
import org.apache.spark.sql.functions._

/** Thesis Table 9 scenario replays (SURVEY.md §5.2): seeded BoNeSi-shaped
  * workloads (benign flows × bots grid), asserting the suspected-bot set
  * equals the injected bot list exactly (source accuracy 1.0 on the clean
  * generator) and that every source-domain alert yields a destination
  * mitigation (collaborative accuracy 1.0, thesis p.63).
  */
class ScenarioSpec extends SparkSpec {

  import spark.implicits._

  private def runScenario(benign: Int, bots: Int): Unit = {
    val sc = Fixtures.scenario(Fixtures.ScenarioParams(nBenignFlows = benign, nBots = bots))
    val flows = sc.flows.toDF()

    val verdicts = Detect.detect(flows).cache()
    val suspected = verdicts.filter(col("is_suspected"))
      .select("ipv4_src").as[String].collect().toSet
    assert(suspected == sc.bots.toSet,
      s"scenario ($benign benign, $bots bots): detected ${suspected.size}")

    val cnc = verdicts.select("cnc_ip").distinct().as[String].collect()
    assert(cnc.toSeq == Seq(sc.cncIp))
    verdicts.unpersist()

    // collaborative accuracy: every BOT alert dispatches a mitigation in
    // the destination domain (RATE_LIMIT per bot, J1 topology left join)
    val alerts = suspected.toSeq.sorted.map(ip => ("vm1", ip, "BOT")) :+ (("vm1", sc.cncIp, "CNC"))
    val m = DetectionStream.mitigations(
      alerts.toDF("domain", "ip", "label"), sc.topology.toDF())
    val byAction = m.groupBy("action").count().as[(String, Long)].collect().toMap
    assert(byAction("RATE_LIMIT") == bots.toLong, s"collab accuracy: $byAction")
    assert(byAction("DROP_TELNET") == 1L)
  }

  for ((benign, bots) <- Fixtures.Table9)
    test(s"Table 9 replay: $benign benign flows, $bots bots -> accuracy 1.0") {
      runScenario(benign, bots)
    }

  test("streaming detection on a scenario matches the injected bot list") {
    val sc = Fixtures.scenario(Fixtures.ScenarioParams(nBenignFlows = 500, nBots = 10))
    val alerts = DetectionStream.alerts(sc.flows.toDS()).collect()
    assert(alerts.filter(_.label == "BOT").map(_.ip).toSet == sc.bots.toSet)
    assert(alerts.count(_.label == "CNC") == 1)
    // each bot alerted exactly once across the 8 polls (E1 flag-once)
    assert(alerts.filter(_.label == "BOT").map(_.ip).distinct.length ==
      alerts.count(_.label == "BOT"))
  }

  test("bot lists are deterministic and distinct") {
    assert(Fixtures.botList(500) == Fixtures.botList(500))
    assert(Fixtures.botList(500).distinct.size == 500)
    assert(Fixtures.scenario(Fixtures.ScenarioParams(100, 5)).flows ==
      Fixtures.scenario(Fixtures.ScenarioParams(100, 5)).flows)
  }

  test("pollGen is row-for-row the scenario, poll by poll") {
    // the lazy per-poll generator feeds the 750k bench tier; it must be
    // the SAME workload as the golden-tested scenario, in the same order
    val p = Fixtures.ScenarioParams(nBenignFlows = 200, nBots = 7)
    val sc = Fixtures.scenario(p)
    val gen = Fixtures.pollGen(p)
    assert(gen.bots == sc.bots && gen.cnc == sc.cncIp)
    val regrouped = (0 until p.nPolls).flatMap(gen.poll)
    assert(regrouped == sc.flows)
    // and each poll() slice is exactly the scenario's rows of that poll_id
    for (i <- 0 until p.nPolls)
      assert(gen.poll(i) == sc.flows.filter(_.poll_id == i),
        s"poll $i slice mismatch")
  }

  test("replica-disjoint domains: per-domain detection is independent") {
    // the 750k tier's premise: ten disjoint-seed domains through ONE
    // streaming query produce exactly each domain's own alert set
    val params = (0 until 3).map(d => Fixtures.ScenarioParams(
      nBenignFlows = 150, nBots = 5, domain = s"vm$d", seed = 42L + d))
    val scs = params.map(Fixtures.scenario)
    val merged = scs.flatMap(_.flows)
      .groupBy(_.poll_id).toSeq.sortBy(_._1).flatMap(_._2)
    val alerts = DetectionStream.alerts(merged.toDS()).collect()
    for ((p, sc) <- params.zip(scs)) {
      val botAlerts = alerts.filter(a => a.domain == p.domain && a.label == "BOT")
      assert(botAlerts.map(_.ip).toSet == sc.bots.toSet,
        s"${p.domain}: bots ${botAlerts.length}")
      assert(alerts.count(a => a.domain == p.domain && a.label == "CNC") == 1)
    }
  }
}
