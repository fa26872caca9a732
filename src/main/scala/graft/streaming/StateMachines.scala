package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's hysteresis / control state machines (SURVEY.md §2.7
  * C1–C9, §2.6 E5), as PURE per-key step functions wrapped in
  * `flatMapGroupsWithState`.
  *
  * Design: each machine is `step(state, observation) => (state', emissions)`
  * — plain Scala, unit-testable without a SparkSession — and `runMachine`
  * wires any of them into a streaming (or batch) Dataset with one line.
  * State lives in Spark's keyed state store: checkpointed, recovered on
  * restart, partitioned by key across executors. At 1000 executors each
  * (domain, switch, port) key is independent — no driver-side state, no
  * global synchronization, which is exactly how the per-controller dicts of
  * the reference shard by construction.
  *
  * Reference sites: sustained/no-attack counters
  * `ryu/testing/experimental_development/TestCase_2/Controller1.py:106-123,
  * 333-343, 417-443`; escalation `TestCase_7/timeStamp2.py:348-359`;
  * lockdown latch `ryu/src/local_controller/demo3.py:300-313`; triggers
  * `ryu/src/deployed_controller/DIPA_Controller.py:123-126`; MAC learning
  * `DIPA_Controller.py:257-260`; CNC change `demo3.py:284-296` (intended
  * flag-once semantics per SURVEY.md §7.1).
  */
object StateMachines {

  /** Wire a pure step function into a keyed stateful Dataset transform.
    * Rows within a micro-batch are processed in ascending `order` — state
    * machines see a deterministic sequence even though Spark hands the
    * group iterator in arbitrary order. Works identically on batch
    * Datasets (state starts empty every run).
    *
    * `idleTimeoutMs` bounds state size (SURVEY.md §4 state-size control —
    * the flow-TTL/deque-maxlen analog): a key with no input for that long
    * is evicted from the state store on the next trigger. Without it a
    * long-running query accumulates one state entry per key ever seen —
    * fine for fixed port/domain populations, unbounded for ephemeral keys.
    * A timeout-enabled query re-triggers to check timeouts even with no
    * data, so run it on an interval trigger (Sources.pollTrigger) — the
    * default as-fast-as-possible trigger would busy-spin empty batches.
    */
  def runMachine[K: Encoder, I, S: Encoder, O: Encoder](
      ds: Dataset[I], key: I => K, order: I => Long, init: S,
      idleTimeoutMs: Option[Long] = None)(
      step: (S, I) => (S, Seq[O])): Dataset[O] = {
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)
      .flatMapGroupsWithState[S, O](OutputMode.Update, timeoutConf) {
        (_: K, it: Iterator[I], gs: GroupState[S]) =>
          if (gs.hasTimedOut) {
            gs.remove() // idle key: drop its state, emit nothing
            Iterator.empty
          } else {
            // decorate-sort-undecorate, NOT sortBy: sortBy only invokes
            // the key function inside Ordering comparisons, so a 1-row
            // group never evaluates `order` — silently skipping any
            // validation a gate put there (chunkDedupStream's id-range
            // require). Mapping first makes order total over every row.
            val sorted = it.toSeq.map(i => (order(i), i)).sortBy(_._1).map(_._2)
            var st = gs.getOption.getOrElse(init)
            val out = Seq.newBuilder[O]
            sorted.foreach { i =>
              val (s2, os) = step(st, i)
              st = s2
              out ++= os
            }
            gs.update(st)
            idleTimeoutMs.foreach(gs.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  // ---- C1 + C2 + C9: ingress-policy hysteresis ------------------------

  /** Per-(domain, switch, port) observation: the max flow rate seen at the
    * port this poll (A8's all-below-threshold check is `max_rate <= peace`).
    */
  final case class PortRateObs(
      domain: String, dpid: Long, port: Int, poll_id: Long, max_rate: Double)

  /** C1 sustained counter + C2 peace counter + C9 applied bitmap. */
  final case class IngressState(sustained: Int, noAttack: Int, applied: Boolean)
  object IngressState { val init: IngressState = IngressState(0, 0, applied = false) }

  final case class IngressCmd(
      domain: String, dpid: Long, port: Int, poll_id: Long, action: String)

  /** One poll step of the ingress hysteresis (`Controller1.py:333-343,
    * 417-443`): an attacking poll bumps the sustained counter (damped ÷3
    * when it fires, `Controller1.py:421,427`); an all-peaceful poll bumps
    * the no-attack counter; `sustainedCount` attacking polls apply the
    * ingress policy, `peaceCount` peaceful polls remove it. The `applied`
    * bitmap (C9) keeps both side effects idempotent — commands are emitted
    * only on state transitions.
    */
  def ingressStep(attackTh: Double = 100.0, peaceTh: Double = 10.0,
                  sustainedCount: Int = 5, peaceCount: Int = 5)(
      st: IngressState, o: PortRateObs): (IngressState, Seq[IngressCmd]) =
    if (o.max_rate > attackTh) {
      val sustained = st.sustained + 1
      if (sustained >= sustainedCount) {
        val cmds = if (!st.applied)
          Seq(IngressCmd(o.domain, o.dpid, o.port, o.poll_id, "APPLY")) else Nil
        (IngressState(sustained / 3, 0, applied = true), cmds)
      } else (IngressState(sustained, 0, st.applied), Nil)
    } else if (o.max_rate <= peaceTh) {
      val noAttack = st.noAttack + 1
      if (noAttack >= peaceCount) {
        val cmds = if (st.applied)
          Seq(IngressCmd(o.domain, o.dpid, o.port, o.poll_id, "REMOVE")) else Nil
        (IngressState(0, 0, applied = false), cmds)
      } else (st.copy(noAttack = noAttack), Nil)
    } else (st.copy(noAttack = 0), Nil)

  def ingress(obs: Dataset[PortRateObs],
              attackTh: Double = 100.0, peaceTh: Double = 10.0,
              sustainedCount: Int = 5, peaceCount: Int = 5,
              idleTimeoutMs: Option[Long] = None): Dataset[IngressCmd] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (o: PortRateObs) => (o.domain, o.dpid, o.port), (_: PortRateObs).poll_id,
      IngressState.init, idleTimeoutMs)(ingressStep(attackTh, peaceTh, sustainedCount, peaceCount))
  }

  // ---- C3: sustained-pushback counter ---------------------------------

  /** Per-domain observation: this poll's pushback victim set (J7 output). */
  final case class PushbackObs(domain: String, poll_id: Long, victims: Seq[String])

  final case class PushbackState(lastKey: String, streak: Int)
  object PushbackState { val init: PushbackState = PushbackState("", 0) }

  final case class PushbackCmd(domain: String, poll_id: Long, victims: Seq[String])

  /** `Controller1.py:354-363`: an identical non-empty victim set for more
    * than `sustain` consecutive polls triggers a cross-domain pushback,
    * then the streak resets (re-fires every `sustain+1` polls while the
    * set persists — the reference's behavior).
    */
  def pushbackStep(sustain: Int = 5)(
      st: PushbackState, o: PushbackObs): (PushbackState, Seq[PushbackCmd]) = {
    val key = o.victims.sorted.mkString(",")
    if (key.isEmpty) (PushbackState.init, Nil)
    else {
      val streak = if (key == st.lastKey) st.streak + 1 else 1
      if (streak > sustain)
        (PushbackState(key, 0), Seq(PushbackCmd(o.domain, o.poll_id, o.victims.sorted)))
      else (PushbackState(key, streak), Nil)
    }
  }

  def pushback(obs: Dataset[PushbackObs], sustain: Int = 5): Dataset[PushbackCmd] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (_: PushbackObs).domain, (_: PushbackObs).poll_id,
      PushbackState.init)(pushbackStep(sustain))
  }

  // ---- C4 + W4: escalation over a trailing count window ---------------

  /** Per-(domain, port) observation: telnet-flow count this poll. */
  final case class TelnetObs(domain: String, port: Int, poll_id: Long, n_telnet: Long)

  /** W7 bounded retention: the window list never exceeds `windowLen`. */
  final case class EscalationState(window: Seq[Long], escalations: Int)
  object EscalationState { val init: EscalationState = EscalationState(Nil, 0) }

  final case class QosCmd(domain: String, port: Int, poll_id: Long, action: String, level: Int)

  /** `TestCase_7/timeStamp2.py:75, 348-359`: a deque(8) of telnet counts;
    * window mean >= `meanTh` escalates QoS one level per poll; at
    * `blockAt` consecutive escalations the port is hard-blocked (and a
    * `BLOCK@port` broadcast goes out), then the counter resets.
    */
  def escalationStep(windowLen: Int = 8, meanTh: Double = 5.0, blockAt: Int = 4)(
      st: EscalationState, o: TelnetObs): (EscalationState, Seq[QosCmd]) = {
    val window = (st.window :+ o.n_telnet).takeRight(windowLen)
    if (window.sum.toDouble / window.size >= meanTh) {
      val esc = st.escalations + 1
      if (esc >= blockAt)
        (EscalationState(window, 0), Seq(QosCmd(o.domain, o.port, o.poll_id, "BLOCK", esc)))
      else
        (EscalationState(window, esc), Seq(QosCmd(o.domain, o.port, o.poll_id, "RATE_LIMIT", esc)))
    } else (EscalationState(window, st.escalations), Nil)
  }

  def escalation(obs: Dataset[TelnetObs], windowLen: Int = 8, meanTh: Double = 5.0,
                 blockAt: Int = 4): Dataset[QosCmd] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (o: TelnetObs) => (o.domain, o.port), (_: TelnetObs).poll_id,
      EscalationState.init)(escalationStep(windowLen, meanTh, blockAt))
  }

  // ---- C5: lockdown latch ---------------------------------------------

  final case class CompromiseObs(domain: String, poll_id: Long, pct: Double)
  final case class LatchState(locked: Boolean)
  final case class LockdownCmd(domain: String, poll_id: Long, pct: Double)

  /** `demo3.py:300-313` intended semantics (the shipped `==`-for-`=` typo
    * never latches — SURVEY.md §7.1): lock down exactly once when the
    * compromise ratio first reaches `lockdownPct`.
    */
  def latchStep(lockdownPct: Double = 50.0)(
      st: LatchState, o: CompromiseObs): (LatchState, Seq[LockdownCmd]) =
    if (!st.locked && o.pct >= lockdownPct)
      (LatchState(locked = true), Seq(LockdownCmd(o.domain, o.poll_id, o.pct)))
    else (st, Nil)

  def lockdown(obs: Dataset[CompromiseObs], lockdownPct: Double = 50.0): Dataset[LockdownCmd] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (_: CompromiseObs).domain, (_: CompromiseObs).poll_id,
      LatchState(locked = false))(latchStep(lockdownPct))
  }

  // ---- C7: classification feedback triggers ---------------------------

  /** A consumed alert updating the classifier config (`DIPA_Controller.py
    * :123-126, 270`): empty options leave the existing trigger untouched.
    */
  final case class TriggerObs(
      domain: String, seq: Long, proto_trig: Option[String], collab_trig: Option[String])

  final case class TriggerState(proto: Option[String], collab: Option[String])

  /** The current per-domain classifier config — emitted only on change; a
    * micro-batch loop feeds this back into O2 classification as a
    * slowly-changing config dimension (SURVEY.md §7.5.1).
    */
  final case class TriggerConfig(
      domain: String, seq: Long, proto_trig: Option[String], collab_trig: Option[String])

  def triggerStep(st: TriggerState, o: TriggerObs): (TriggerState, Seq[TriggerConfig]) = {
    val next = TriggerState(o.proto_trig.orElse(st.proto), o.collab_trig.orElse(st.collab))
    if (next != st) (next, Seq(TriggerConfig(o.domain, o.seq, next.proto, next.collab)))
    else (next, Nil)
  }

  def triggers(obs: Dataset[TriggerObs]): Dataset[TriggerConfig] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (_: TriggerObs).domain, (_: TriggerObs).seq,
      TriggerState(None, None))(triggerStep)
  }

  // ---- C8: MAC learning (last-write-wins) ------------------------------

  final case class MacObs(domain: String, dpid: Long, mac: String, seq: Long, in_port: Int)
  final case class MacState(port: Int)
  final case class MacEntry(domain: String, dpid: Long, mac: String, seq: Long, port: Int)

  /** `DIPA_Controller.py:257-260`: `mac_to_port[dpid][src] = in_port`.
    * Emits the learned entry when the port first appears or moves.
    */
  def macStep(st: MacState, o: MacObs): (MacState, Seq[MacEntry]) =
    if (st.port == o.in_port) (st, Nil)
    else (MacState(o.in_port), Seq(MacEntry(o.domain, o.dpid, o.mac, o.seq, o.in_port)))

  def macLearning(obs: Dataset[MacObs]): Dataset[MacEntry] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (o: MacObs) => (o.domain, o.dpid, o.mac), (_: MacObs).seq,
      MacState(-1))(macStep)
  }

  // ---- E5: CNC-change detection ----------------------------------------

  final case class CncObs(domain: String, poll_id: Long, cnc_ip: String)
  final case class CncState(cnc: String)
  final case class CncAlert(domain: String, poll_id: Long, cnc_ip: String)

  /** `demo3.py:284-296` (intended flag-once, §7.1): alert only when the
    * elected CNC differs from the previous poll's.
    */
  def cncStep(st: CncState, o: CncObs): (CncState, Seq[CncAlert]) =
    if (o.cnc_ip == st.cnc) (st, Nil)
    else (CncState(o.cnc_ip), Seq(CncAlert(o.domain, o.poll_id, o.cnc_ip)))

  def cncChanges(obs: Dataset[CncObs]): Dataset[CncAlert] = {
    import obs.sparkSession.implicits._
    runMachine(obs, (_: CncObs).domain, (_: CncObs).poll_id, CncState(""))(cncStep)
  }
}
