package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Planted-case semantics for the two curation-hygiene operators the
  * oracle rows (t8/t9) exercise only statistically: a pathologically
  * repetitive doc must fail the Gopher-style keep verdict, and a training
  * doc quoting 8 consecutive benchmark words must be decontaminated.
  */
class RepetitionDecontamSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private val clean =
    "the quick brown fox jumps over a lazy dog while seven wizards brew strong coffee near the old stone bridge"

  test("repetitionStats: spam repetition fails keep, varied text passes") {
    val docs = Seq(
      (1L, clean),
      (2L, "buy now " * 40),                  // one bigram is ~all the mass
      (3L, ("word " * 50).trim),              // a single repeated word
      (4L, "a b")                             // shortest bigram-bearing doc
    ).toDF("doc_id", "text")
    val got = Text.repetitionStats(docs)
      .select("doc_id", "dup_word_frac", "top_word_frac", "top_bigram_frac", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got(1L)._4, s"varied text must pass, got ${got(1L)}")
    // "buy now" and "now buy" alternate, so the top bigram holds ~half
    // the mass — still far over the 0.18 threshold
    assert(!got(2L)._4 && got(2L)._3 > 0.5, s"bigram spam must fail, got ${got(2L)}")
    assert(!got(3L)._4 && got(3L)._1 > 0.9, s"word spam must fail, got ${got(3L)}")
    // doc 4: two distinct words, one bigram — top fractions are high but
    // that is the honest small-doc behavior; just pin the numbers
    assert(got(4L) == (0.0, 0.5, 1.0, false))
  }

  test("decontaminate drops quoting docs and the benchmark itself, keeps the rest") {
    val bench = Seq((100L, clean)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, clean),                                         // exact benchmark copy
      (2L, s"prefix words then ${clean.split(' ').take(8).mkString(" ")} and more"),
      (3L, "a completely unrelated training document about distributed query engines"),
      (4L, clean.split(' ').take(7).mkString(" "))         // only a 7-gram: below k
    ).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), s"got $kept")
    // the escape hatch (benchmark-shaped-but-corpus-sized callers) is
    // semantics-identical — only the join strategy choice is released
    val keptNoBc = Dedup.decontaminate(corpus, bench, broadcastBench = false)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNoBc == kept)
  }

  test("decontaminate: the one-pass claim is plan-enforced, not AQE-dependent") {
    // the 100 TB shape: distinct benchmark grams BROADCAST into the
    // corpus-gram semi-join — the corpus side must never shuffle on `sh`.
    // Pinned by an explicit broadcast() hint in `decontaminate` (Catalyst
    // routinely overshoots the size estimate of the exploded+distinct
    // benchmark plan, and an estimate miss would re-shuffle the whole
    // corpus gram stream); this assertion makes the hint load-bearing.
    val bench = Seq((100L, clean)).toDF("doc_id", "text")
    val corpus = Seq((1L, clean), (2L, "unrelated words about query engines"))
      .toDF("doc_id", "text")
    val plan = Dedup.decontaminate(corpus, bench).queryExecution.executedPlan
    val gramJoins = collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.references.exists(_.name == "sh")) => j
    }
    assert(gramJoins.nonEmpty,
      "the gram semi-join must be a broadcast hash join on sh")
    // sh-shuffles are only legal INSIDE the broadcast subtree (the
    // benchmark side's own distinct — O(benchmark), not O(corpus));
    // anywhere else they mean the corpus gram stream is being exchanged
    def shShuffles(p: org.apache.spark.sql.execution.SparkPlan) =
      collectWithSubqueries(p) {
        case e: ShuffleExchangeExec if (e.outputPartitioning match {
          case h: HashPartitioning => h.expressions.exists(
            _.references.exists(_.name == "sh"))
          case _ => false
        }) => e
      }
    val insideBroadcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }.flatMap(b => shShuffles(b.child)).map(_.id).toSet
    val stray = shShuffles(plan).filterNot(e => insideBroadcast.contains(e.id))
    assert(stray.isEmpty,
      s"corpus gram stream must not shuffle on sh, found ${stray.size}: $stray")
  }
}
