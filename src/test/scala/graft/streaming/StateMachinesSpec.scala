package graft.streaming

import graft.SparkSpec
import graft.streaming.StateMachines._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Pure-step unit tests for every §2.7/§2.6 state machine, plus streaming
  * wiring checks over MemoryStream micro-batches (state continuity across
  * batches and duplicate-delivery tolerance).
  */
class StateMachinesSpec extends SparkSpec {

  private def drive[S, I, O](init: S, step: (S, I) => (S, Seq[O]), obs: Seq[I]): Seq[O] =
    obs.foldLeft((init, Seq.empty[O])) { case ((st, acc), o) =>
      val (s2, os) = step(st, o)
      (s2, acc ++ os)
    }._2

  private def rateObs(rates: Double*): Seq[PortRateObs] =
    rates.zipWithIndex.map { case (r, i) => PortRateObs("d0", 1L, 1, i.toLong, r) }

  test("C1/C9: ingress applies once after sustained attack polls") {
    val cmds = drive(IngressState.init, ingressStep()(_, _), rateObs(200, 200, 200, 200, 200, 200, 200))
    assert(cmds.map(_.action) == Seq("APPLY")) // idempotent despite 7 attack polls
    assert(cmds.head.poll_id == 4)             // fires on the 5th poll
  }

  test("C1: damping re-arms the sustained counter after it fires") {
    // 5 attacks fire at poll 4 (counter 5 -> damped to 1); 4 more attacks
    // reach 5 again at poll 8 but applied=true suppresses a second APPLY
    val (st, cmds) = rateObs(200, 200, 200, 200, 200, 200, 200, 200, 200)
      .foldLeft((IngressState.init, Seq.empty[IngressCmd])) { case ((s, acc), o) =>
        val (s2, os) = ingressStep()(s, o); (s2, acc ++ os)
      }
    assert(cmds.size == 1 && st.applied)
  }

  test("C2: five peaceful polls remove the applied policy, once") {
    val obs = rateObs(200, 200, 200, 200, 200, /* applied */ 1, 1, 1, 1, 1, 1, 1)
    val cmds = drive(IngressState.init, ingressStep()(_, _), obs)
    assert(cmds.map(_.action) == Seq("APPLY", "REMOVE"))
    assert(cmds(1).poll_id == 9) // 5th peaceful poll
  }

  test("C2: a mid-range rate resets the peace counter but not sustained") {
    val obs = rateObs(200, 200, 200, 200, 200, 1, 1, 50 /* mid resets */, 1, 1, 1, 1, 1)
    val cmds = drive(IngressState.init, ingressStep()(_, _), obs)
    assert(cmds.map(_.action) == Seq("APPLY", "REMOVE"))
    assert(cmds(1).poll_id == 12) // peace restarted after the mid-range poll
  }

  test("C3: identical non-empty pushback set for >5 polls fires, then resets") {
    val vs = Seq("10.0.0.9")
    val obs = (0 until 14).map(i => PushbackObs("d0", i.toLong, vs))
    val cmds = drive(PushbackState.init, pushbackStep()(_, _), obs)
    assert(cmds.map(_.poll_id) == Seq(5, 11)) // streak 6 fires; re-fires 6 polls later
  }

  test("C3: a changed or empty set restarts the streak") {
    val obs = Seq(
      PushbackObs("d0", 0, Seq("a")), PushbackObs("d0", 1, Seq("a")),
      PushbackObs("d0", 2, Seq("b")), // change restarts
      PushbackObs("d0", 3, Seq("b")), PushbackObs("d0", 4, Nil), // empty resets
      PushbackObs("d0", 5, Seq("b")))
    assert(drive(PushbackState.init, pushbackStep()(_, _), obs).isEmpty)
  }

  test("C4/W4: escalation ladder rate-limits then blocks on the 4th level") {
    val obs = (0 until 6).map(i => TelnetObs("d0", 23, i.toLong, 8))
    val cmds = drive(EscalationState.init, escalationStep()(_, _), obs)
    assert(cmds.map(_.action) == Seq("RATE_LIMIT", "RATE_LIMIT", "RATE_LIMIT", "BLOCK",
      "RATE_LIMIT", "RATE_LIMIT"))
    assert(cmds.map(_.level) == Seq(1, 2, 3, 4, 1, 2)) // counter reset after BLOCK
  }

  test("C4/W4: the deque(8) window forgets old polls") {
    // 8 high polls then zeros: the trailing mean dips below 5 once enough
    // zeros displace the high entries, stopping escalation
    val obs = ((0 until 4).map(i => TelnetObs("d0", 23, i.toLong, 40)) ++
      (4 until 12).map(i => TelnetObs("d0", 23, i.toLong, 0)))
    val cmds = drive(EscalationState.init, escalationStep()(_, _), obs)
    // mean stays >= 5 while any 40 remains in the window (40*4/8 = 20),
    // last qualifying poll is poll 10 (window = one 40 + seven 0s = 5.0)
    assert(cmds.last.poll_id == 10 && cmds.size == 11)
  }

  test("C5: lockdown latches exactly once") {
    val obs = Seq(
      CompromiseObs("d0", 0, 25.0), CompromiseObs("d0", 1, 55.0),
      CompromiseObs("d0", 2, 80.0), CompromiseObs("d0", 3, 99.0))
    val cmds = drive(LatchState(locked = false), latchStep()(_, _), obs)
    assert(cmds.map(_.poll_id) == Seq(1) && cmds.head.pct == 55.0)
  }

  test("C7: triggers are last-write-wins and emit only on change") {
    val obs = Seq(
      TriggerObs("d0", 0, Some("6"), None),
      TriggerObs("d0", 1, Some("6"), None),          // no change
      TriggerObs("d0", 2, None, Some("Telnet")),     // proto retained
      TriggerObs("d0", 3, Some("6"), Some("Telnet"))) // no change
    val cmds = drive(TriggerState(None, None), triggerStep, obs)
    assert(cmds.map(_.seq) == Seq(0, 2))
    assert(cmds(1).proto_trig.contains("6") && cmds(1).collab_trig.contains("Telnet"))
  }

  test("C8: MAC learning is last-write-wins, emitting on first sight and moves") {
    val obs = Seq(
      MacObs("d0", 1, "aa:bb", 0, 3), MacObs("d0", 1, "aa:bb", 1, 3),
      MacObs("d0", 1, "aa:bb", 2, 7), MacObs("d0", 1, "aa:bb", 3, 7))
    val cmds = drive(MacState(-1), macStep, obs)
    assert(cmds.map(_.port) == Seq(3, 7))
  }

  test("E5: CNC alert fires only when the elected CNC changes") {
    val obs = Seq(
      CncObs("d0", 0, "10.0.0.4"), CncObs("d0", 1, "10.0.0.4"),
      CncObs("d0", 2, "10.0.0.5"), CncObs("d0", 3, "10.0.0.4"))
    val cmds = drive(CncState(""), cncStep, obs)
    assert(cmds.map(_.cnc_ip) == Seq("10.0.0.4", "10.0.0.5", "10.0.0.4"))
  }

  test("streaming: ingress state persists across micro-batches") {
    import spark.implicits._
    val in = MemoryStream[PortRateObs](spark)
    val q = ingress(in.toDS()).writeStream
      .format("memory").queryName("ingress_out").outputMode(OutputMode.Update()).start()
    try {
      in.addData(rateObs(200, 200, 200))           // 3 attack polls, no fire
      q.processAllAvailable()
      assert(spark.table("ingress_out").count() == 0)
      in.addData(rateObs(200, 200).zipWithIndex.map { case (o, i) => o.copy(poll_id = 3 + i) })
      q.processAllAvailable()                      // polls 3-4 complete the streak
      val rows = spark.table("ingress_out").as[IngressCmd].collect()
      assert(rows.map(_.action).toSeq == Seq("APPLY") && rows.head.poll_id == 4)
    } finally q.stop()
  }

  test("streaming: idle-timeout wiring leaves active-key semantics unchanged") {
    import spark.implicits._
    val in = MemoryStream[PortRateObs](spark)
    // a ProcessingTimeTimeout query re-triggers to check timeouts even with
    // no data, so it MUST run on an interval trigger (the reference's 2 s
    // poll cadence, Sources.pollTrigger) — an as-fast-as-possible trigger
    // would busy-spin empty micro-batches
    val q = ingress(in.toDS(), idleTimeoutMs = Some(3600 * 1000L)).writeStream
      .format("memory").queryName("ingress_ttl_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(rateObs(200, 200, 200, 200, 200))
      // processAllAvailable never latches under ProcessingTimeTimeout
      // (shouldRunAnotherBatch stays true for timeout checks), so poll the
      // sink with a deadline instead
      val deadline = System.nanoTime() + 60L * 1000000000L
      def rows() = spark.table("ingress_ttl_out").as[IngressCmd].collect()
      while (rows().isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(rows().map(_.action).toSeq == Seq("APPLY")) // same firing as NoTimeout
    } finally q.stop()
  }

  test("streaming: batch mode runs the same machines (empty state per run)") {
    import spark.implicits._
    val cmds = escalation(
      (0 until 5).map(i => TelnetObs("d0", 23, i.toLong, 8)).toDS()).collect()
    assert(cmds.map(_.action).toSeq ==
      Seq("RATE_LIMIT", "RATE_LIMIT", "RATE_LIMIT", "BLOCK", "RATE_LIMIT"))
  }
}
