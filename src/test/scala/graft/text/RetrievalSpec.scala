package graft.text

import graft.SparkSpec
import graft.queries.RetrievalQueries
import org.apache.spark.sql.functions._

/** BM25 + RRF retrieval ([[Lexical]]): tokenizer edges, the fixed-point
  * scorer against hand-computed exact values, ranking semantics on a tiny
  * corpus, fusion semantics, and the persisted postings index (answer
  * parity with the in-memory path + bucket-pruned listing).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(Lexical.letterTokens(col("t")).as("tk"))
      .collect().head.getSeq[String](0)

  test("letterTokens lowercases, splits on non-letter runs, drops empties") {
    assert(toks("Hash, JOIN!! fast") == Seq("hash", "join", "fast"))
    assert(toks("  42 leading; trailing... ") == Seq("leading", "trailing"))
    assert(toks("") == Seq.empty)
    assert(toks("123 456") == Seq.empty)
  }

  test("bm25TermE9 matches the exact rational, floored into 1e-9 units") {
    // tf=2 df=1 dl=4 N=3 S=12:
    //   num = 22*12*2*(2*3-2*1+1) = 2640
    //   den = (10*12*2 + 3*12 + 9*4*3) * (2*1+1) = 384*3 = 1152
    //   score = 2640/1152 = 2.2916_6 -> e9 = 2291666666
    val e9 = Seq((2L, 1L, 4L, 3L, 12L)).toDF("tf", "df", "dl", "n_docs", "s_len")
      .select(Lexical.bm25TermE9(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("s_len")).as("e9"))
      .collect().head.getLong(0)
    assert(e9 == 2291666666L)
    // and the BigDecimal cross-check of the same formula, independent of
    // the column expression's arithmetic
    val exact = (BigDecimal(2640) / BigDecimal(1152) * BigDecimal(1000000000))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact
    assert(e9 == exact)
  }

  private val tiny = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana"),
    (4L, "zebra apple")).toDF("doc_id", "text")

  test("bm25TopK ranks by tf saturation and omits non-matching docs") {
    val r = Lexical.bm25TopK(tiny, Seq(("q", "apple")).toDF("q_id", "qtext"), 10)
      .orderBy("rank").collect()
    // docs 1,2,4 contain apple; doc 3 must be absent
    assert(r.map(_.getLong(1)).toSet == Set(1L, 2L, 4L))
    // doc1 (tf=2, dl=3) outranks doc4 (tf=1, dl=2) outranks doc2 (tf=1,
    // dl=2... doc2 and doc4 tie on (tf, dl) so doc_id breaks the tie
    assert(r.head.getLong(1) == 1L)
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
  }

  test("a rare term dominates a common one (idf separation)") {
    // zebra: df=1; apple: df=3 — a zebra doc with tf=1 must outrank any
    // apple-only doc for the query "apple zebra"
    val r = Lexical.bm25TopK(tiny,
      Seq(("q", "apple zebra")).toDF("q_id", "qtext"), 10)
      .orderBy("rank").collect()
    assert(r.head.getLong(1) == 4L, s"zebra doc first: ${r.mkString(",")}")
  }

  test("absent query terms are ignored; an all-absent query yields no rows") {
    val partial = Lexical.bm25TopK(tiny,
      Seq(("q", "apple warp")).toDF("q_id", "qtext"), 10).collect()
    val only = Lexical.bm25TopK(tiny,
      Seq(("q", "apple")).toDF("q_id", "qtext"), 10).collect()
    assert(partial.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      only.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
    assert(Lexical.bm25TopK(tiny,
      Seq(("q", "warp core")).toDF("q_id", "qtext"), 10).collect().isEmpty)
  }

  test("excludeSelf drops the query document itself") {
    val qd = tiny.filter("doc_id = 1")
      .select(col("doc_id").as("q_id"), col("text").as("qtext"))
    val withSelf = Lexical.bm25TopK(tiny, qd, 10)
    val noSelf = Lexical.bm25TopK(tiny, qd, 10, excludeSelf = true)
    assert(withSelf.filter("doc_id = 1").count() == 1)
    assert(noSelf.filter("doc_id = 1").count() == 0)
    // the non-self rows are identical in both (re-ranked without the gap);
    // note self is NOT guaranteed rank 1 — here doc3's banana tf=3 at
    // idf(banana) > idf(apple) legitimately outscores the self match
    assert(noSelf.select("doc_id").collect().map(_.getLong(0)).toSet ==
      withSelf.filter("doc_id <> 1").select("doc_id").collect()
        .map(_.getLong(0)).toSet)
  }

  test("rrfFuse: exact integer contributions, absent side contributes 0") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("q_id", "doc_id", "rank")
    val r = Lexical.rrfFuse(a, b, 10).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).sortBy(_._3)
    // doc 10: floor(1e9/61)+floor(1e9/62) = 16393442+16129032 = 32522474
    // doc 11: floor(1e9/62) = 16129032 ; doc 12: floor(1e9/61) = 16393442
    assert(r.toSeq == Seq((10L, 32522474L, 1L), (12L, 16393442L, 2L),
      (11L, 16129032L, 3L)))
  }

  test("rrf ties break by doc_id") {
    val a = Seq((1L, 20L, 1L)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 7L, 1L)).toDF("q_id", "doc_id", "rank")
    val r = Lexical.rrfFuse(a, b, 10).collect()
      .map(x => (x.getLong(1), x.getLong(3))).sortBy(_._2)
    // both docs carry one rank-1 contribution -> equal scores, doc 7 first
    assert(r.toSeq == Seq((7L, 1L), (20L, 2L)))
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("persisted postings index answers identically to the in-memory path") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val base = new java.io.File("target/postidx_spec").getAbsolutePath
    Lexical.buildPostingsIndex(docs, base)
    val mem = Lexical.bm25TopK(docs,
      RetrievalQueries.Queries.toDF("q_id", "qtext"), 10)
      .collect().map(_.toSeq).toSet
    val idx = Lexical.bm25TopKIndexed(spark, base, RetrievalQueries.Queries, 10)
      .collect().map(_.toSeq).toSet
    assert(idx == mem)
    assert(idx.nonEmpty)
  }

  test("indexed query lists only the query terms' bucket directories") {
    val base = new java.io.File("target/postidx_spec2").getAbsolutePath
    Lexical.buildPostingsIndex(tiny, base, nBuckets = 16)
    val df = Lexical.bm25TopKIndexed(spark, base, Seq("q" -> "zebra"), 5,
      nBuckets = 16)
    val postFiles = df.inputFiles.filter(_.contains("/post/"))
    val bucketsRead = postFiles
      .map(_.split("/").find(_.startsWith("tb=")).get).distinct
    // one term -> exactly one bucket directory listed, out of the >1 the
    // tiny corpus's 8 distinct terms hash into
    assert(bucketsRead.length == 1, s"read: ${bucketsRead.mkString(",")}")
    val allBuckets = new java.io.File(s"$base/post").listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName)
    assert(allBuckets.length > 1, s"fixture degenerate: ${allBuckets.toSeq}")
  }

  test("append = build: incremental epochs answer identically to one build") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val whole = new java.io.File("target/postidx_whole").getAbsolutePath
    val incr = new java.io.File("target/postidx_incr").getAbsolutePath
    Lexical.buildPostingsIndex(docs, whole)
    Lexical.buildPostingsIndex(docs.filter("doc_id % 3 = 0"), incr)
    Lexical.appendToPostingsIndex(docs.filter("doc_id % 3 = 1"), incr)
    Lexical.appendToPostingsIndex(docs.filter("doc_id % 3 = 2"), incr)
    val a = Lexical.bm25TopKIndexed(spark, whole, RetrievalQueries.Queries, 10)
      .collect().map(_.toSeq).toSet
    val b = Lexical.bm25TopKIndexed(spark, incr, RetrievalQueries.Queries, 10)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // three additive epochs actually exist — the parity above must not be
    // because everything landed in one
    val epochs = new java.io.File(s"$incr/totals").listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).sorted
    assert(epochs.toSeq == Seq("epoch=0", "epoch=1", "epoch=2"))
  }

  test("rebuild at an existing path starts clean (no stale epochs)") {
    val base = new java.io.File("target/postidx_rebuild").getAbsolutePath
    val d1 = Seq((1L, "apple apple")).toDF("doc_id", "text")
    Lexical.buildPostingsIndex(d1, base, nBuckets = 4)
    Lexical.appendToPostingsIndex(
      Seq((2L, "apple banana")).toDF("doc_id", "text"), base, nBuckets = 4)
    // rebuild over a corpus WITHOUT doc 2: its postings and df epoch must
    // not survive
    Lexical.buildPostingsIndex(d1, base, nBuckets = 4)
    val r = Lexical.bm25TopKIndexed(spark, base, Seq("q" -> "banana"), 5,
      nBuckets = 4)
    assert(r.collect().isEmpty)
    val epochs = new java.io.File(s"$base/totals").listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName)
    assert(epochs.toSeq == Seq("epoch=0"))
  }

  test("h1's plan materializes the corpus scan once (exchange reuse)") {
    // the postings and totals lineages share the (doc, term) aggregate's
    // exchange verbatim; AQE must reuse it — a structural drift that
    // splits them costs a full corpus pass at scale
    val df = Lexical.bm25TopK(graft.io.Tables.documents(spark, sfDir),
      RetrievalQueries.Queries.toDF("q_id", "qtext"), 10)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // drive THIS plan so AQE finalizes
    val plan = qe.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalSection).size
    assert(finalSection.contains("ReusedExchange"),
      s"expected a reused exchange in the final plan:\n$finalSection")
    assert(scans == 1, s"expected exactly 1 corpus scan, got $scans")
  }

  test("indexed query over terms absent from the corpus returns empty") {
    val base = new java.io.File("target/postidx_spec3").getAbsolutePath
    Lexical.buildPostingsIndex(tiny, base, nBuckets = 16)
    // "warp" may or may not share a bucket with a stored term; either way
    // the join yields nothing — and an all-miss bucket set short-circuits
    assert(Lexical.bm25TopKIndexed(spark, base, Seq("q" -> "warp"), 5,
      nBuckets = 16).collect().isEmpty)
  }
}
