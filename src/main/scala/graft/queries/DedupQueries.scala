package graft.queries

import graft.dedup.Dedup
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Deduplication queries over the `documents` table: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. The oracle SQL is *generated from the same
  * constants* as the Scala plans (hash coefficients, band layout, bit
  * packing), so the DuckDB twin exercises the full candidate-generation +
  * verification pipeline, not just the final pair list.
  */
object DedupQueries {

  private val K = 3            // shingle size
  private val NumPerms = 16    // minhash permutations
  private val Bands = 4        // LSH bands (r = 4 rows/band)
  private val JaccTh = 0.3     // exact-Jaccard report threshold
  private val LshTh = 0.5      // LSH verify threshold
  private val MaxHamming = 3   // simhash Hamming radius
  private val SimBits = 64     // simhash signature width
  private val DfCap = 1000     // shingle document-frequency cap (skew guard)
  private val ChunkK = 16      // chunk-dedup token-window width

  def d1Exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir))

  def d2JaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), K, JaccTh, DfCap)

  def d3MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(s, dir), K, NumPerms, Bands, LshTh)

  def d4SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), MaxHamming)
      .withColumn("hamming", col("hamming").cast("long"))

  /** d5 — embedding-cosine near-dup dedup over the same LSH geometry as
    * s5 (SimQueries owns those constants; its oracle replays the identical
    * index, so the keeper set is exact).
    */
  def d5EmbedDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.embedDedup(Tables.embeddings(s, dir), SimQueries.PairTh,
        SimQueries.Dim, SimQueries.Planes, SimQueries.NTables)
      .select(col("vec_id"), col("label").cast("long").as("label"))

  /** d6 — the PROJECTION-form MinHash signatures (the map-only path the
    * streaming near-dup gate rides, Dedup.withMinhash): one row per doc
    * with >= 1 shingle, `NumPerms` signature columns. The oracle replays
    * the identical md5-id + LCG-min arithmetic via the aggregation shape,
    * so a hash match pins the higher-order fold against an independent
    * formulation — the streaming gate's signatures are exactly these
    * (DedupStreamSpec additionally pins projection == aggregation in
    * Spark).
    */
  def d6MinhashSigs(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.withMinhash(Tables.documents(s, dir), k = K,
        numPerms = NumPerms)
      .select(col("doc_id"), col("minhash"))
    // evaluation barrier before the null filter AND the 16-column
    // widening: CollapseProject would inline the signature fold into
    // every element_at (higher-order lambdas get no codegen CSE —
    // measured 17x), and the isNotNull filter's alias used to substitute
    // into a pushed-down Filter BELOW the widen exchange, running the
    // kernel once per row on the PRE-shuffle side (one task on a
    // one-file corpus) and again above — measured 4.4 s of the row's
    // 5.2 s at sf0.1. localCheckpoint materializes the (tiny) per-doc
    // signature rows in INTERNAL row format (the old createDataFrame(rdd)
    // barrier paid an external-Row round-trip per row); the filter and
    // the 16 plain array reads then run over materialized rows.
    val once = sig.localCheckpoint(true)
    once.filter(col("minhash").isNotNull)
      .select(col("doc_id") +: (0 until NumPerms).map(i =>
        org.apache.spark.sql.functions.element_at(col("minhash"), i + 1)
          .as(s"mh$i")): _*)
  }

  /** d7 — transitive duplicate clusters: connected components (min
    * reachable id) over the d4 SimHash near-dup pair graph. The Spark
    * side iterates min-label propagation to a fixpoint; the oracle walks
    * the same graph with a recursive CTE — agreement proves the
    * iterative loop computes the true closure, not a partial merge.
    */
  def d7DupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusters(
      Dedup.simhashPairs(Tables.documents(s, dir), MaxHamming))

  /** d8 — sub-document (token-window) exact dedup: repeated 16-token
    * chunks dropped corpus-wide (first occurrence wins), documents
    * reassembled from survivors. The oracle replays the identical
    * chunking, the min-(doc_id, idx) winner rule and the ordered
    * reassembly in DuckDB.
    */
  def d8ChunkDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDedup(Tables.documents(s, dir), ChunkK)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> (d1Exact _),
    "d2_jaccard_pairs" -> (d2JaccardPairs _),
    "d3_minhash_lsh" -> (d3MinhashLsh _),
    "d4_simhash_pairs" -> (d4SimhashPairs _),
    "d5_embed_dedup" -> (d5EmbedDedup _),
    "d6_minhash_sigs" -> (d6MinhashSigs _),
    "d7_dup_clusters" -> (d7DupClusters _),
    "d8_chunk_dedup" -> (d8ChunkDedup _)
  )

  // ---- generated DuckDB twins ----------------------------------------

  /** (doc_id, sh) distinct word-K-shingles — lambda twin of Dedup.docShingles. */
  private def shinglesSql: String =
    s"""SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(tk) < $K THEN []::VARCHAR[]
       |    ELSE list_transform(range(1, len(tk) - ${K - 2}), i -> array_to_string(tk[i:i+${K - 1}], ' '))
       |    END)) AS sh
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)""".stripMargin

  /** Portable map-only string id in [0, P) — twin of Dedup.strId. */
  private def strIdSql(c: String): String =
    s"(('0x' || substring(md5($c), 1, 15))::BIGINT % ${Dedup.P})"

  /** perm_i(id) with the Scala-side LCG constants folded into the text. */
  private def permSql(i: Int, idExpr: String): String =
    s"(${Dedup.hashA(i)} * $idExpr + ${Dedup.hashB(i)}) % ${Dedup.P}"

  private def jaccardTailSql(candGate: String, th: Double): String =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT i, j, CAST(common AS DOUBLE) / (na.n + nb.n - common) AS jc
       |FROM common $candGate
       |JOIN sizes na ON na.doc_id = i
       |JOIN sizes nb ON nb.doc_id = j
       |WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= $th""".stripMargin

  private def lshSql: String = {
    val r = NumPerms / Bands
    val mins = (0 until NumPerms)
      .map(i => s"MIN(${permSql(i, "sid")}) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until r).map(j => s"mh${b * r + j}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS sig FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH s AS (
       |  $shinglesSql
       |), sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM (SELECT doc_id, ${strIdSql("sh")} AS sid FROM s) GROUP BY doc_id
       |), banded AS (
       |  $bandSelects
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |),
       |${jaccardTailSql("JOIN cands USING (i, j)", LshTh)}""".stripMargin
  }

  private def simhashSql: String = simhashSqlFrom("documents")

  /** The d4 pair twin over any (doc_id, text) relation — shared with the
    * d7 closure and the u1 curation pipeline.
    */
  private[queries] def simhashSqlFrom(from: String): String = {
    val sums = (0 until SimBits)
      .map(j => s"SUM(CASE WHEN ${permSql(j, "tid")} % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    // 1L << 63 folds to Long.MinValue — a representable BIGINT literal in
    // both engines; OR-packing (not addition) keeps the sign bit a plain bit
    val packed = (0 until SimBits)
      .map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" | ")
    val blocks = (0 until 4)
      .map(b => s"SELECT doc_id, simhash, $b AS blk, (simhash >> ${16 * b}) & 65535 AS v FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
       |  FROM $from
       |), sums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM (SELECT doc_id, ${strIdSql("tok")} AS tid FROM t) GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $packed AS simhash FROM sums
       |), banded AS (
       |  $blocks
       |)
       |SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    // d8: the identical chunking (16-token windows over the whitespace
    // token stream), first-occurrence winner = min (doc_id, cidx) via
    // row_number, ordered reassembly via string_agg
    "d8_chunk_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), ch AS (
         |  SELECT doc_id, unnest(range(0, (len(tk) + ${ChunkK - 1}) // $ChunkK)) AS cidx, tk
         |  FROM t
         |), chunks AS (
         |  SELECT doc_id, cidx,
         |    array_to_string(tk[cidx * $ChunkK + 1 : cidx * $ChunkK + $ChunkK], ' ') AS chunk
         |  FROM ch
         |), keep AS (
         |  SELECT doc_id, cidx, chunk,
         |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
         |  FROM chunks
         |)
         |SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text
         |FROM keep WHERE rn = 1 GROUP BY doc_id""".stripMargin,
    // d7: connected components over the d4 pair graph. The recursive CTE
    // enumerates every (node, reachable node) pair — set-union semantics
    // terminate it — and MIN over the reachable set is the component
    // label. An independent formulation of the closure the Spark side
    // reaches by fixpoint iteration.
    "d7_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT i, j FROM (
         |${simhashSql.linesIterator.map("    " + _).mkString("\n")}
         |  ) d4
         |), edges AS (
         |  SELECT i AS a, j AS b FROM pairs
         |  UNION ALL
         |  SELECT j AS a, i AS b FROM pairs
         |), reach AS (
         |  SELECT DISTINCT a AS id, a AS label FROM edges
         |  UNION
         |  SELECT e.a AS id, r.label FROM edges e JOIN reach r ON r.id = e.b
         |)
         |SELECT id AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster
         |FROM reach GROUP BY id""".stripMargin,
    // d6: the signature projection replayed through the aggregation
    // shape — same md5 ids, same LCG permutation constants
    "d6_minhash_sigs" -> {
      val mhCols = (0 until NumPerms)
        .map(i => s"  CAST(MIN(${permSql(i, "sid")}) AS BIGINT) AS mh$i")
        .mkString(",\n")
      s"""WITH s AS (
         |  $shinglesSql
         |), ids AS (
         |  SELECT doc_id, ${strIdSql("sh")} AS sid FROM s
         |)
         |SELECT doc_id,
         |$mhCols
         |FROM ids GROUP BY doc_id""".stripMargin
    },
    // d5: survivors = vectors that are never the higher-id side of an
    // above-threshold LSH pair (the s5 pairs SQL verbatim as a subquery)
    "d5_embed_dedup" ->
      s"""SELECT e.vec_id, e.label::BIGINT AS label FROM embeddings e
         |WHERE e.vec_id NOT IN (SELECT j FROM (
         |${SimQueries.lshPairsSql}
         |) dominated)""".stripMargin,
    "d2_jaccard_pairs" ->
      s"""WITH s0 AS (
         |  $shinglesSql
         |), kept AS (
         |  SELECT sh FROM s0 GROUP BY sh HAVING COUNT(*) <= $DfCap
         |), s AS (
         |  SELECT s0.doc_id, s0.sh FROM s0 JOIN kept USING (sh)
         |),
         |${jaccardTailSql("", JaccTh)}""".stripMargin,
    "d3_minhash_lsh" -> lshSql,
    "d4_simhash_pairs" -> simhashSql
  )
}
