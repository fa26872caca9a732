package graft.queries

import graft.io.Tables
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table: token statistics,
  * fingerprinting, quality scoring, language ID, token frequency — the
  * text-pipeline capability layer (map-only projections + one word-count
  * shuffle), each with a DuckDB oracle twin.
  *
  * All are map-side-only or single-shuffle plans: at 100 TB the projections
  * (t1/t2) scan once with full column pruning, and t4 is the classic
  * word-count (partial agg before the shuffle).
  */
object TextQueries {

  /** Per-document token stats + rolling-hash fingerprint. Pure projection —
    * no shuffle; at scale this is the cheap first pass over a raw corpus.
    */
  def t1TokenStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = Text.tokens(col("text"))
    d.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      Text.sumTokenLen(toks).cast("long").as("sum_token_len"),
      Text.fingerprint(col("text")).as("fp"))
  }

  /** Per-document quality metrics (length/stopword/token-shape heuristics —
    * the cheap pre-filter before model-based scoring).
    */
  def t2Quality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val metrics = Text.qualityMetrics(col("text")).collect {
      case ("mean_token_len", c) => c.as("mean_token_len")
      case ("stopword_ratio", c) => c.as("stopword_ratio")
      case ("quality_score", c)  => c.as("quality_score")
      case ("n_tokens", c)       => c.cast("long").as("n_tokens")
    }
    d.select(col("doc_id") +: col("n_chars") +: metrics: _*)
  }

  /** Language-ID confusion matrix: predicted vs labelled language counts. */
  def t3LangConfusion(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), Text.langId(Text.tokens(col("text"))).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))

  /** Corpus token frequency, top 20 (deterministic tie-break on the token).
    * Word-count shape: explode → partial agg map-side → one shuffle on the
    * token → global top-k.
    */
  def t4TokenTopK(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(20)

  /** Subword (BPE-ish pre-tokenizer) vs whitespace token counts per doc —
    * the LLM-token-budget proxy. Map-only projection like t1.
    */
  def t5BpeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      Text.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
      Text.tokenCount(col("text")).cast("long").as("n_ws_tokens"))

  /** REAL merges-table BPE token counts (the step past t5's pre-token
    * proxy): letter runs encoded under Text.Merges in learned rank order,
    * other pre-tokens count 1. Still a map-only projection.
    */
  def t6BpeMerges(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      Text.bpeTokenCount(col("text")).cast("long").as("n_pre"),
      Text.bpeMergeTokenCount(col("text")).cast("long").as("n_bpe"))

  /** t7 — BPE merge TRAINING: the first `TrainRounds` rules learned from
    * this corpus (graft.text.BpeTrain — one corpus pass to the word-freq
    * vocab, then vocab-only merge rounds). The oracle replays the entire
    * training loop as a generated CTE chain, so the hash match pins every
    * pair count, every argmax tie-break, and every merge application.
    */
  val TrainRounds = 8

  def t7BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.text.BpeTrain.learn(Tables.documents(s, dir), TrainRounds)
      .zipWithIndex
      .map { case (m, i) => (i + 1L, m.a, m.b, m.cnt) }
      .toDF("rank", "a", "b", "cnt")
  }

  /** t8 — Gopher-family repetition metrics + keep verdict per document
    * (Text.repetitionStats). Catches boilerplate whose t2 quality score
    * looks fine; two key-local gram shuffles.
    */
  def t8Repetition(s: SparkSession, dir: String): DataFrame =
    graft.text.Text.repetitionStats(Tables.documents(s, dir))

  /** t9 — benchmark decontamination (Dedup.decontaminate, 8-gram): drop
    * docs overlapping the pseudo-benchmark slice (doc_id % 97 = 0 — a
    * deterministic ~1% stand-in for a real eval set). Text column
    * excluded from the output so the oracle row stays small.
    */
  val DecontamModulus = 97

  def t9Decontam(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.dedup.Dedup.decontaminate(
        docs, docs.filter(col("doc_id") % DecontamModulus === 0))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** t10 — PII redaction (Text.redactPii): the corpus carries no PII, so
    * the query first SALTS each doc with deterministic synthetic spans —
    * a doc_id-derived email, an IPv4, and (on id-cycles) an SSN and a
    * phone — then scrubs. Both engines build the identical salted text,
    * so the oracle genuinely exercises every pattern, the chain order
    * (email before IP, SSN before phone), and the audit counts. Pure
    * codegen'd projection: no UDF, no shuffle.
    */
  def t10PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, dir)
    val salted = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail-"), (col("doc_id") % 7).cast("string"), lit(".example.com"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
      when(col("doc_id") % 3 === 0, lit(" id 123-45-6789")).otherwise(lit("")),
      when(col("doc_id") % 4 === 0, lit(" call 555-123-4567")).otherwise(lit("")))
    val counts = graft.text.Text.piiCounts(salted)
      .map { case (n, c) => c.cast("long").as(n) }
    docs.select(
      (col("doc_id") +: graft.text.Text.redactPii(salted).as("red") +: counts): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_stats" -> (t1TokenStats _),
    "t2_quality" -> (t2Quality _),
    "t3_lang_confusion" -> (t3LangConfusion _),
    "t4_token_topk" -> (t4TokenTopK _),
    "t5_bpe_tokens" -> (t5BpeTokens _),
    "t6_bpe_merges" -> (t6BpeMerges _),
    "t7_bpe_train" -> (t7BpeTrain _),
    "t8_repetition" -> (t8Repetition _),
    "t9_decontam" -> (t9Decontam _),
    "t10_pii_redact" -> (t10PiiRedact _)
  )

  /** DuckDB lambda twin of Text.tokens. */
  private val toksSql = """regexp_split_to_array(trim(text), '\s+')"""

  /** DuckDB CASE ladder mirroring Text.langId (same marker lists, same
    * priority order, same >=-later tie-break).
    */
  private def langCaseSql: String = {
    val hits = Text.LangMarkers.map { case (lang, words) =>
      lang -> s"len(list_filter(tk, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    }
    val arms = hits.zipWithIndex.map { case ((lang, h), i) =>
      val later = hits.drop(i + 1).map(_._2)
      val cond = (s"$h > 0" +: later.map(o => s"$h >= $o")).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${arms.mkString(" ")} ELSE 'und' END"
  }

  /** Twin of BpeTrain.learn: the word-freq vocab, then `TrainRounds`
    * generated (pair-count argmax, merge apply) CTE stages. The per-stage
    * argmax uses the same (cnt DESC, a ASC, b ASC) tie-break; `replace`
    * is all-occurrences left-to-right in both engines; the outer-paren
    * strip needs DuckDB's 'g' flag (one match per anchor).
    */
  private def t7Sql: String = {
    val pat = Text.BpePattern.replace("'", "''")
    val w0 =
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS freq,
         |    regexp_replace(word, '(.)', '(\\1)', 'g') AS sym
         |  FROM (SELECT ltrim(t, ' ') AS word
         |        FROM (SELECT unnest(regexp_extract_all(text, '$pat')) AS t
         |              FROM documents)
         |        WHERE regexp_matches(t, '^ ?[A-Za-z]+${"$"}'))
         |  GROUP BY word""".stripMargin
    // every stage is MATERIALIZED: DuckDB inlines plain CTEs, and a chain
    // where w_i references w_{i-1} several times (the argmax scalar
    // subqueries) would otherwise expand exponentially — 5^rounds corpus
    // scans blew the open-file limit before this
    val stages = (1 to TrainRounds).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT p[1] AS a, p[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      j -> [syms[j], syms[j + 1]])) AS p
         |    FROM (SELECT freq,
         |            string_split(regexp_replace(sym, '^\\(|\\)${"$"}', '', 'g'), ')(') AS syms
         |          FROM w${i - 1})
         |  ) GROUP BY 1, 2
         |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
         |), w$i AS MATERIALIZED (
         |  SELECT freq, replace(sym,
         |    '(' || (SELECT a FROM p$i) || ')(' || (SELECT b FROM p$i) || ')',
         |    '(' || (SELECT a FROM p$i) || (SELECT b FROM p$i) || ')') AS sym
         |  FROM w${i - 1}
         |)""".stripMargin
    }
    val out = (1 to TrainRounds)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b, cnt FROM p$i")
      .mkString("\n  UNION ALL ")
    s"""WITH w0 AS MATERIALIZED (
       |  $w0
       |),
       |${stages.mkString(",\n")}
       |$out""".stripMargin
  }

  /** Twin of Text.repetitionStats: same per-gram counts, same explicit
    * DOUBLE divisions (DuckDB sum→HUGEINT, hence the casts), same
    * thresholds. Bigram list mirrors Text.shingles at k=2.
    */
  private def t8Sql: String = {
    val (dupMax, topWMax, topBMax) =
      (Text.DupWordMax, Text.TopWordMax, Text.TopBigramMax)
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |), wc AS MATERIALIZED (
       |  SELECT doc_id, w, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2
       |), ws AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
       |         count(*) AS n_distinct, max(cnt) AS top_word
       |  FROM wc GROUP BY 1
       |), bc AS MATERIALIZED (
       |  SELECT doc_id, g, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
       |          ELSE list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' '))
       |          END) AS g FROM t) GROUP BY 1, 2
       |), bs AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams, max(cnt) AS top_bigram
       |  FROM bc GROUP BY 1
       |)
       |SELECT ws.doc_id, ws.n_words,
       |  1 - ws.n_distinct::DOUBLE / ws.n_words::DOUBLE AS dup_word_frac,
       |  ws.top_word::DOUBLE / ws.n_words::DOUBLE AS top_word_frac,
       |  COALESCE(bs.top_bigram::DOUBLE / bs.n_bigrams::DOUBLE, 0.0) AS top_bigram_frac,
       |  ((1 - ws.n_distinct::DOUBLE / ws.n_words::DOUBLE) <= $dupMax
       |   AND ws.top_word::DOUBLE / ws.n_words::DOUBLE <= $topWMax
       |   AND COALESCE(bs.top_bigram::DOUBLE / bs.n_bigrams::DOUBLE, 0.0) <= $topBMax) AS keep
       |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id""".stripMargin
  }

  /** Twin of Dedup.decontaminate at k=8: distinct word 8-grams of the
    * pseudo-benchmark slice semi-join the corpus grams; overlapping docs
    * (benchmark rows included, by self-overlap) are dropped.
    */
  private def t9Sql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |), g AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(tk) < 8 THEN []::VARCHAR[]
       |    ELSE list_transform(range(1, len(tk) - 6), i -> array_to_string(tk[i:i+7], ' '))
       |    END)) AS sh
       |  FROM t
       |), bsh AS MATERIALIZED (
       |  SELECT DISTINCT sh FROM g WHERE doc_id % $DecontamModulus = 0
       |), contam AS MATERIALIZED (
       |  SELECT DISTINCT g.doc_id FROM g JOIN bsh USING (sh)
       |)
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin

  /** t10 twin: the identical salted text, the identical pattern CHAIN
    * (each stage's count measured on the previous stage's output, like
    * `Text.piiCounts`), patterns interpolated from `Text.PiiPatterns`
    * verbatim — the dialect-shared regex subset means Java regex and
    * RE2 agree span-for-span. DuckDB needs the 'g' flag for
    * replace-all (Spark's regexp_replace is always global).
    */
  private def t10Sql: String = {
    val salted =
      """text || ' contact user' || doc_id::VARCHAR || '@mail-' ||
        |      (doc_id % 7)::VARCHAR || '.example.com' || ' from 10.0.' ||
        |      (doc_id % 256)::VARCHAR || '.7' ||
        |      CASE WHEN doc_id % 3 = 0 THEN ' id 123-45-6789' ELSE '' END ||
        |      CASE WHEN doc_id % 4 = 0 THEN ' call 555-123-4567' ELSE '' END""".stripMargin
    val pats = graft.text.Text.PiiPatterns
    val stages = pats.zipWithIndex.map { case ((pat, repl), i) =>
      s"""s${i + 1} AS (
         |  SELECT doc_id, t$i, regexp_replace(t$i, '$pat', '$repl', 'g') AS t${i + 1}
         |  FROM s$i)""".stripMargin
    }
    val countCols = pats.zipWithIndex.map { case ((pat, repl), i) =>
      val name = repl.stripPrefix("<").stripSuffix(">").toLowerCase
      s"  CAST(len(regexp_extract_all(s$i.t$i, '$pat')) AS BIGINT) AS n_$name"
    }
    val joins = pats.indices.map(i => s"s${i + 1}").mkString(
      "s0 JOIN ", " USING (doc_id) JOIN ", " USING (doc_id)")
    s"""WITH s0 AS (
       |  SELECT doc_id, $salted AS t0 FROM documents
       |),
       |${stages.mkString(",\n")}
       |SELECT doc_id, t${pats.size} AS red,
       |${countCols.mkString(",\n")}
       |FROM $joins""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "t7_bpe_train" -> t7Sql,
    "t8_repetition" -> t8Sql,
    "t9_decontam" -> t9Sql,
    "t10_pii_redact" -> t10Sql,
    "t1_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(list_sum(list_transform($toksSql, t -> length(t))) AS BIGINT) AS sum_token_len,
         |  CAST(list_reduce(list_transform(string_split(text, ''), ch -> ascii(ch)::BIGINT),
         |       (acc, c) -> (acc * 31 + c) % 2147483647) AS BIGINT) AS fp
         |FROM documents""".stripMargin,
    "t2_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) AS mean_token_len,
         |    CAST(len(list_filter(tk, t -> t IN ('the','a','of','and','is'))) AS DOUBLE) / len(tk) AS stopword_ratio
         |  FROM (SELECT doc_id, n_chars, $toksSql AS tk FROM documents)
         |)
         |SELECT doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
         |  greatest(least(0.5 * least(n_tokens / 100.0, 1.0)
         |    + 0.3 * least(stopword_ratio * 5, 1.0)
         |    + 0.2 * least(mean_token_len / 8, 1.0), 1.0), 0.0) AS quality_score
         |FROM m""".stripMargin,
    "t3_lang_confusion" ->
      s"""SELECT lang, $langCaseSql AS lang_pred, COUNT(*) AS n_docs
         |FROM (SELECT lang, $toksSql AS tk FROM documents)
         |GROUP BY 1, 2""".stripMargin,
    "t4_token_topk" ->
      s"""SELECT tok, COUNT(*) AS n
         |FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin,
    "t5_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Text.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(len($toksSql) AS BIGINT) AS n_ws_tokens
         |FROM documents""".stripMargin,
    "t6_bpe_merges" -> t6Sql
  )

  /** Twin of Text.bpeMergeTokenCount: the same wrapped-symbol encode as a
    * chain of literal replaces in merge rank order (generated from the
    * shared Text.Merges list), split on the ")(" boundary for the symbol
    * count. regexp_replace's backreference is \\1 in DuckDB (RE2) vs $1
    * in Spark; both wrap each char identically.
    */
  private def t6Sql: String = {
    val pat = Text.BpePattern.replace("'", "''")
    val enc = Text.Merges.foldLeft("regexp_replace(ltrim(t), '(.)', '(\\1)', 'g')") {
      case (acc, (a, b)) => s"replace($acc, '($a)($b)', '($a$b)')"
    }
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_pre,
       |  CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '$pat'),
       |    t -> CASE WHEN regexp_full_match(t, ' ?[A-Za-z]+')
       |      THEN len(string_split($enc, ')('))
       |      ELSE 1 END)), 0) AS BIGINT) AS n_bpe
       |FROM documents""".stripMargin
  }
}
