package graft.props

import java.sql.Timestamp

import graft.model.FlowStat
import graft.streaming.DetectionStream._
import graft.streaming.StateMachines._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants over the pure detection/state-machine steps
  * (SURVEY.md §5.2): bias scores bounded, suspected ⊆ flagged, alerts
  * at-most-once, lockdown latched once, ingress APPLY/REMOVE alternation,
  * bounded windows, change-only emission — all under arbitrary generated
  * observation sequences (no SparkSession needed: the steps are pure).
  */
object DetectProps extends Properties("graft.detect") {

  private val T0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private val genIp: Gen[String] = Gen.choose(1, 30).map(i => s"10.0.0.$i")

  private def telnet(pollId: Long, src: String, dst: String, pc: Long): FlowStat =
    FlowStat(T0, pollId, "d", 1, 10, 1, None, None, Some(src), Some(dst),
      Some(6), None, Some(23), None, None, 2, pc, pc)

  private def loader(pollId: Long, src: String): FlowStat =
    FlowStat(T0, pollId, "d", 1, 10, 1, None, None, Some(src), Some("10.0.0.99"),
      Some(17), None, None, Some(48101), Some(48101), 2, 1, 1)

  private val genPoll: Gen[Seq[FlowStat]] = for {
    nT <- Gen.choose(0, 8)
    nF <- Gen.choose(0, 4)
    ts <- Gen.listOfN(nT, Gen.zip(genIp, genIp, Gen.choose(1L, 500L)))
    fs <- Gen.listOfN(nF, genIp)
  } yield ts.map { case (s, d, pc) => telnet(0, s, d, pc) } ++ fs.map(loader(0, _))

  private val genPolls: Gen[Seq[Seq[FlowStat]]] = for {
    n <- Gen.choose(1, 6)
    polls <- Gen.listOfN(n, genPoll)
  } yield polls.zipWithIndex.map { case (p, i) =>
    p.map(f => f.copy(poll_id = i.toLong, packet_count = f.packet_count * (i + 1)))
  }

  private def runPolls(polls: Seq[Seq[FlowStat]],
                       cfg: DetectConfig = DetectConfig()): (DomainDetectState, Seq[DomainAlert]) =
    polls.zipWithIndex.foldLeft((DomainDetectState.init, Seq.empty[DomainAlert])) {
      case ((st, acc), (rows, i)) =>
        if (rows.isEmpty) (st, acc)
        else { val (s2, as) = pollStep(cfg)(st, i.toLong, rows); (s2, acc ++ as) }
    }

  property("BOT alerts are at-most-once per ip") = forAll(genPolls) { polls =>
    val bots = runPolls(polls)._2.filter(_.label == "BOT").map(_.ip)
    bots.distinct.length == bots.length
  }

  property("suspected ⊆ flagged when gated") = forAll(genPolls) { polls =>
    val (st, alerts) = runPolls(polls)
    alerts.filter(_.label == "BOT").map(_.ip).toSet.subsetOf(st.flagged)
  }

  property("lockdown broadcast happens at most once") = forAll(genPolls) { polls =>
    runPolls(polls, DetectConfig(nHosts = 2))._2
      .count(a => a.label.matches("[0-9.]+")) <= 1
  }

  property("consecutive CNC alerts always differ") = forAll(genPolls) { polls =>
    val cncs = runPolls(polls)._2.filter(_.label == "CNC").map(_.ip)
    cncs.zip(cncs.drop(1)).forall { case (a, b) => a != b }
  }

  property("alert set is invariant to micro-batch boundaries") =
    forAll(genPolls) { polls =>
      // one poll per step vs all polls replayed through a single fold:
      // the emitted (ip, label) multiset must be identical
      val perPoll = runPolls(polls)._2.map(a => (a.ip, a.label))
      val cfg = DetectConfig()
      var st = DomainDetectState.init
      val merged = polls.zipWithIndex.flatMap { case (rows, i) =>
        if (rows.isEmpty) Nil
        else { val (s2, as) = pollStep(cfg)(st, i.toLong, rows); st = s2; as }
      }.map(a => (a.ip, a.label))
      perPoll == merged
    }

  property("bias scores lie in [0,1]") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000L)) { (t, cncT) =>
      val s = 1.0 - t.toDouble / (t + cncT)
      s >= 0.0 && s <= 1.0
    }

  // ---- state machines --------------------------------------------------

  private val genRates: Gen[List[Double]] =
    Gen.listOf(Gen.oneOf(Gen.choose(0.0, 10.0), Gen.choose(10.0, 100.0),
      Gen.choose(100.0, 10000.0)))

  property("ingress commands strictly alternate APPLY/REMOVE") = forAll(genRates) { rates =>
    val obs = rates.zipWithIndex.map { case (r, i) => PortRateObs("d", 1, 1, i.toLong, r) }
    val cmds = obs.foldLeft((IngressState.init, List.empty[IngressCmd])) {
      case ((st, acc), o) => val (s2, cs) = ingressStep()(st, o); (s2, acc ++ cs)
    }._2.map(_.action)
    cmds.zip(cmds.drop(1)).forall { case (a, b) => a != b } &&
      cmds.headOption.forall(_ == "APPLY")
  }

  property("escalation window never exceeds its bound; BLOCK resets the ladder") =
    forAll(Gen.listOf(Gen.choose(0L, 20L))) { counts =>
      val obs = counts.zipWithIndex.map { case (c, i) => TelnetObs("d", 23, i.toLong, c) }
      val (finalSt, cmds) = obs.foldLeft((EscalationState.init, List.empty[QosCmd])) {
        case ((st, acc), o) =>
          val (s2, cs) = escalationStep()(st, o)
          assert(s2.window.size <= 8)
          (s2, acc ++ cs)
      }
      val levels = cmds.map(_.level)
      Prop(cmds.filter(_.action == "BLOCK").forall(_.level == 4) &&
        levels.zip(levels.drop(1)).forall { case (a, b) => b == a + 1 || b == 1 } &&
        finalSt.escalations < 4)
    }

  property("latch emits exactly once iff any pct crosses the threshold") =
    forAll(Gen.listOf(Gen.choose(0.0, 100.0))) { pcts =>
      val obs = pcts.zipWithIndex.map { case (p, i) => CompromiseObs("d", i.toLong, p) }
      val cmds = obs.foldLeft((LatchState(locked = false), List.empty[LockdownCmd])) {
        case ((st, acc), o) => val (s2, cs) = latchStep()(st, o); (s2, acc ++ cs)
      }._2
      cmds.length == (if (pcts.exists(_ >= 50.0)) 1 else 0)
    }

  property("MAC learning emits only on changes, last write wins") =
    forAll(Gen.listOf(Gen.choose(1, 4))) { ports =>
      val obs = ports.zipWithIndex.map { case (p, i) => MacObs("d", 1, "aa", i.toLong, p) }
      val (st, entries) = obs.foldLeft((MacState(-1), List.empty[MacEntry])) {
        case ((s, acc), o) => val (s2, es) = macStep(s, o); (s2, acc ++ es)
      }
      val emitted = entries.map(_.port)
      emitted.zip(emitted.drop(1)).forall { case (a, b) => a != b } &&
        ports.lastOption.forall(_ == st.port)
    }
}
