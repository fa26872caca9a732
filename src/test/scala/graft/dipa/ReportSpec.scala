package graft.dipa

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.PortStat

/** S2 port-stat wiring into the ingress machine and the S12 stat tables. */
class ReportSpec extends SparkSpec {

  import spark.implicits._

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def ps(pollId: Long, port: Int, rxBytes: Long): PortStat =
    PortStat(T0, pollId, "vm0", 1L, port, rxBytes / 100, rxBytes, 0, 0, 0, 0)

  test("portRateObs: Kbit/s from cumulative rx deltas, first poll skipped") {
    // port 1 ramps 1 MB per 2 s poll (4000 kbps); port 2 idles
    val ports = (0 to 3).flatMap(i =>
      Seq(ps(i.toLong, 1, 1000000L * i), ps(i.toLong, 2, 100L * i)))
    val obs = Report.portRateObs(ports.toDS(), intervalS = 2.0).collect()
    assert(obs.forall(_.poll_id >= 1)) // no delta for the first snapshot
    val p1 = obs.filter(_.port == 1).map(_.max_rate).distinct
    assert(p1.toSeq == Seq(4000.0))
  }

  test("ingressFromPortStats: sustained port flood applies ingress once") {
    val ports = (0 to 6).flatMap(i => Seq(ps(i.toLong, 1, 1000000L * i)))
    val cmds = Report.ingressFromPortStats(ports.toDS(), intervalS = 2.0).collect()
    assert(cmds.map(_.action).toSeq == Seq("APPLY"))
    assert(cmds.head.port == 1)
  }

  test("stat tables: W1/W2 report ordering, priority partitioned") {
    val sc = graft.fixtures.Fixtures.scenario(
      graft.fixtures.Fixtures.ScenarioParams(nBenignFlows = 20, nBots = 2))
    val df = sc.flows.toDF()
    val legit = Report.flowTable(df)
    assert(legit.count() > 0)
    val ordered = legit.select("dpid", "in_port").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(ordered.toSeq == ordered.toSeq.sorted) // canonical W1 order held
    assert(Report.droppedTable(df).count() == 0)  // no block rules installed yet
  }
}
