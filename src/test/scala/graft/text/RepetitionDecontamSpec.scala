package graft.text

import graft.SparkSpec
import graft.dedup.Dedup

/** Planted-case semantics for the two curation-hygiene operators the
  * oracle rows (t8/t9) exercise only statistically: a pathologically
  * repetitive doc must fail the Gopher-style keep verdict, and a training
  * doc quoting 8 consecutive benchmark words must be decontaminated.
  */
class RepetitionDecontamSpec extends SparkSpec {

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
  }
}
