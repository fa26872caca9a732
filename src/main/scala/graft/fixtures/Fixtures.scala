package graft.fixtures

import java.sql.Timestamp

import graft.model.{FlowStat, TopologyEntry}

import scala.util.Random

/** S13 — deterministic workload/fixture generators (SURVEY.md §2.1 S13,
  * FIXTURES.md §§1,6,7,8): BoNeSi-shaped bot lists and seeded
  * benign/attack flow-stat scenarios mirroring the reference's attack
  * emulation (`attackEmulation/scripts/launchAttack.py:10-52`,
  * `attackEmulation/Manual/h3_attack.py:8-13`, bot lists
  * `attackEmulation/bonesi/1bot … 500bots`).
  *
  * Everything is a pure function of the seed, so detection outputs are
  * golden: the thesis Table 9 scenario replays assert the suspected-bot
  * set equals the injected bot list exactly.
  */
object Fixtures {

  /** Thesis Table 9 scenario grid: (benign flows, bots) per scenario
    * (`attackEmulation/README.md:21-33`, thesis p.63).
    */
  val Table9: Seq[(Int, Int)] =
    Seq((500, 1), (5000, 10), (100, 50), (2000, 100), (200, 200), (7500, 500))

  final case class ScenarioParams(
      nBenignFlows: Int,
      nBots: Int,
      attackRatePps: Int = 500, // BoNeSi config: 500 pps at port 23
      nPolls: Int = 8,
      pollIntervalS: Int = 2,   // thesis Table 4 choice
      attackStartPoll: Int = 2,
      domain: String = "vm0",
      nHosts: Int = 8,          // local fat-tree host population
      seed: Long = 42L)

  final case class Scenario(
      flows: Seq[FlowStat],
      bots: Seq[String],
      cncIp: String,
      topology: Seq[TopologyEntry])

  /** BoNeSi-shaped bot list: `n` deterministic public-looking IPs (the
    * reference ships literal random-IP files, e.g. `244.174.48.4`).
    */
  def botList(n: Int, seed: Long = 42L): Seq[String] = {
    val rnd = new Random(seed)
    Iterator.continually(
      s"${rnd.nextInt(223) + 1}.${rnd.nextInt(254) + 1}.${rnd.nextInt(254) + 1}.${rnd.nextInt(254) + 1}")
      .distinct.take(n).toSeq
  }

  /** Local host IPs 10.0.0.1..n (the reference's seeded accumulators,
    * `DIPA_Controller.py:57-60`).
    */
  def hostIps(n: Int): Seq[String] = (1 to n).map(i => s"10.0.0.$i")

  /** Default fat-tree topology dimension (FIXTURES.md §6): hosts packed
    * 2-per-edge-switch starting at s3, mirroring `portMaps`
    * (`DIPA_Controller.py:138-144`).
    */
  def topology(nHosts: Int = 8): Seq[TopologyEntry] =
    hostIps(nHosts).zipWithIndex.map { case (ip, i) =>
      val sw = 3 + (i / 2)
      TopologyEntry(s"s$sw", sw.toLong, i % 2 + 1, ip, is_host = true)
    }

  private def ts(pollId: Long, intervalS: Int): Timestamp =
    new Timestamp(1735689600000L + pollId * intervalS * 1000L) // 2025-01-01 UTC

  /** Per-poll lazy view of a scenario: the seeded flow SPECS (small —
    * one tuple per benign flow, one IP per bot) computed once, each
    * poll's rows generated on demand. `scenario` is `polls.flatMap` of
    * this, so the two forms are row-for-row identical; the lazy form
    * exists for the 100× detection scale tier, where holding every
    * poll of a ~850 k-row-per-poll stream at once (~2.5 GiB of boxed
    * case classes) would distort the very heap geometry the bench pins.
    */
  final class PollGen private[Fixtures] (val p: ScenarioParams) {
    private val hosts = hostIps(p.nHosts)
    val bots: Seq[String] = botList(p.nBots, p.seed + 1)
    val cnc: String = "10.0.0.4"
    private val benignSpec = {
      val rnd = new Random(p.seed)
      (0 until p.nBenignFlows).map { i =>
        val src = hosts(rnd.nextInt(hosts.size))
        val dst = hosts(rnd.nextInt(hosts.size))
        val port = Seq(80, 443, 53, 67, 8080)(rnd.nextInt(5))
        val baseRate = rnd.nextInt(40) + 1
        (i, src, dst, port, baseRate)
      }
    }

    /** All rows of poll `poll` (benign background first, then attack —
      * the order [[scenario]] has always emitted).
      */
    def poll(poll: Int): Seq[FlowStat] = {
      val rows = Seq.newBuilder[FlowStat]
      val t = ts(poll.toLong, p.pollIntervalS)
      // benign background (dpid = stable hash bucket, cumulative counters)
      benignSpec.foreach { case (i, src, dst, port, baseRate) =>
        val pc = baseRate.toLong * p.pollIntervalS * (poll + 1)
        val proto = if (port == 53 || port == 67) 17 else 6
        rows += FlowStat(t, poll.toLong, p.domain, 3L + i % 4, 10, i % 4 + 1,
          None, None, Some(src), Some(dst), Some(proto),
          if (proto == 6) Some(1024 + i % 1000) else None,
          if (proto == 6) Some(port) else None,
          if (proto == 17) Some(port) else None,
          if (proto == 17) Some(port) else None,
          2, pc, pc * 60)
      }
      // attack traffic from attackStartPoll on
      if (poll >= p.attackStartPoll) {
        val k = poll - p.attackStartPoll + 1
        // CNC telnet flood toward the scanned victims
        val cncPc = p.attackRatePps.toLong * p.pollIntervalS * k
        hosts.filter(_ != cnc).take(4).foreach { victim =>
          rows += FlowStat(t, poll.toLong, p.domain, 4L, 10, 1,
            None, None, Some(cnc), Some(victim), Some(6),
            Some(40000), Some(23), None, None, 2, cncPc, cncPc * 60)
        }
        bots.zipWithIndex.foreach { case (bot, bi) =>
          // symmetric 48101 loading flow flags the bot (O3)
          val loadPc = 12L * k
          rows += FlowStat(t, poll.toLong, p.domain, 3L + bi % 4, 10, bi % 4 + 1,
            None, None, Some(bot), Some(cnc), Some(17),
            None, None, Some(48101), Some(48101), 2, loadPc, loadPc * 600)
          // weak telnet probe -> high bias ratio vs the CNC total
          val probePc = (bi % 7 + 1).toLong * k
          rows += FlowStat(t, poll.toLong, p.domain, 3L + bi % 4, 10, bi % 4 + 1,
            None, None, Some(bot), Some(hosts(bi % hosts.size)), Some(6),
            Some(50000 + bi), Some(23), None, None, 2, probePc, probePc * 60)
        }
      }
      rows.result()
    }
  }

  def pollGen(p: ScenarioParams): PollGen = new PollGen(p)

  /** Generate a full scenario: benign background + BoNeSi-shaped attack.
    *
    * Benign traffic: `nBenignFlows` seeded (src, dst, port ∈ {80, 443, 53,
    * 67, 8080}) flows with Poisson-ish cumulative counter increments.
    * Attack traffic from `attackStartPoll` on: the CNC floods telnet scans
    * (tcp_dst 23) at `attackRatePps`; every bot carries a symmetric
    * udp/48101 loading flow (`h3_attack.py:8-13`) plus a weak telnet probe
    * flow — exactly the bias pattern `DIPA_Controller.py:489` scores.
    */
  def scenario(p: ScenarioParams): Scenario = {
    val gen = new PollGen(p)
    val rows = (0 until p.nPolls).flatMap(gen.poll)
    Scenario(rows, gen.bots, gen.cnc, topology(p.nHosts))
  }
}
