package graft.dedup

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. All pure DataFrame transforms.
  *
  * Engine-portability note: the hash family is a linear-congruential
  * permutation over *dictionary ids* (dense_rank of the distinct
  * shingle/token strings) instead of a native string hash — every value is
  * computable identically in DuckDB, which is what makes the LSH candidate
  * sets (not just the verified pairs) oracle-checkable. At 100 TB the
  * dictionary rank (a global sort) would be replaced by `xxhash64(sh)`
  * (map-only, no dictionary) — a one-line swap via `shingleId` — with the
  * rest of the plan unchanged.
  */
object Dedup {

  val P: Long = 2147483647L // 2^31-1, Mersenne prime
  def hashA(i: Int): Long = (1103515245L * (i + 1)) % P
  def hashB(i: Int): Long = (12345L + 7919L * i) % P

  /** Linear-congruential permutation of a dictionary id. */
  def perm(i: Int, id: Column): Column = (lit(hashA(i)) * id + lit(hashB(i))) % P

  /** Exact dedup: group identical texts, keep the lowest doc_id as the
    * survivor. One hash shuffle on the text (production: on xxhash64(text)
    * with a residual equality check — same plan shape).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** (doc_id, shingle) pairs, distinct per document. */
  def docShingles(docs: DataFrame, k: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(Text.shingles(Text.tokens(col(textCol)), k))).as("sh"))

  /** Dictionary id per distinct shingle: dense_rank over the sorted distinct
    * strings. Deterministic and portable (DuckDB computes the same ranks).
    * Scale path: swap for xxhash64 (no global sort) — see class doc.
    */
  def shingleDict(shingles: DataFrame): DataFrame =
    shingles.select(col("sh")).distinct()
      .withColumn("sid", dense_rank().over(Window.orderBy(col("sh"))).cast("long"))

  /** Exact n-gram Jaccard near-dup pairs: block on shared shingles (the
    * inverted-index join — only pairs sharing >= 1 shingle are scored, never
    * the full cross product), count common shingles per pair, Jaccard =
    * common / (|a| + |b| - common). Emits (i, j, jc) with i < j.
    */
  def jaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.3): DataFrame = {
    val s = docShingles(docs, k)
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = s.as("a").join(s.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "i").withColumnRenamed("n", "na"), "i")
      .join(sizes.withColumnRenamed("doc_id", "j").withColumnRenamed("n", "nb"), "j")
      .withColumn("jc",
        col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
      .filter(col("jc") >= threshold)
      .select(col("i"), col("j"), col("jc"))
  }

  /** MinHash signatures: for each doc, `numPerms` minima of the permuted
    * shingle ids. Computed as `numPerms` min-aggregates in ONE groupBy (no
    * row explosion, map-side partial min) — the plan is a single shuffle on
    * doc_id regardless of the permutation count.
    */
  def minhashSignatures(docs: DataFrame, k: Int, numPerms: Int): DataFrame = {
    val s = docShingles(docs, k)
    val dict = shingleDict(s)
    val aggs = (0 until numPerms).map(i => min(perm(i, col("sid"))).as(s"mh$i"))
    s.join(dict, "sh")
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `numPerms/bands` rows; docs sharing any band signature become candidate
    * pairs; candidates are verified with exact Jaccard >= threshold.
    *
    * The band join is the scale path: candidates ~ O(near-dups), not O(n^2).
    * Emits (i, j, jc) with i < j — identical rows to `jaccardPairs` minus
    * LSH false negatives (probability (1-s^r)^b for true similarity s).
    */
  def minhashLsh(docs: DataFrame, k: Int = 3, numPerms: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val r = numPerms / bands
    val sig = minhashSignatures(docs, k, numPerms)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until r).map(j => col(s"mh${b * r + j}")): _*).as("sig"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    // verify candidates with exact Jaccard (inverted-index count again,
    // restricted to candidate pairs via semi join)
    val s = docShingles(docs, k)
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = s.as("sa").join(s.as("sb"),
        col("sa.sh") === col("sb.sh") && col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("i"), col("sb.doc_id").as("j"))
      .agg(count(lit(1)).as("common"))
      .join(cands, Seq("i", "j"), "left_semi")
    common
      .join(sizes.withColumnRenamed("doc_id", "i").withColumnRenamed("n", "na"), "i")
      .join(sizes.withColumnRenamed("doc_id", "j").withColumnRenamed("n", "nb"), "j")
      .withColumn("jc",
        col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")))
      .filter(col("jc") >= threshold)
      .select(col("i"), col("j"), col("jc"))
  }

  /** SimHash (16-bit): per distinct token, each bit's hash contributes +/-1;
    * the signature bit is 1 iff the sum is positive. Computed as 16
    * sum-aggregates in one groupBy, then packed into an int.
    */
  def simhashSignatures(docs: DataFrame, bits: Int = 16): DataFrame = {
    val t = docs.select(col("doc_id"),
      explode(array_distinct(Text.tokens(col("text")))).as("tok"))
    val dict = t.select(col("tok")).distinct()
      .withColumn("tid", dense_rank().over(Window.orderBy(col("tok"))).cast("long"))
    val aggs = (0 until bits).map { j =>
      sum(when(perm(j, col("tid")) % 2 === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = t.join(dict, "tok").groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val packed = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    sums.select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found via
    * block banding: the 16 bits split into 4 blocks of 4; by pigeonhole any
    * pair within Hamming 3 shares at least one identical block, so the
    * banded join is EXACT for maxHamming <= 3 (no false negatives) while
    * avoiding the O(n^2) cross product.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block banding is exact only for hamming <= 3")
    val sig = simhashSignatures(docs)
    val blocks = (0 until 4).map { b =>
      struct(lit(b).as("blk"), (shiftright(col("simhash"), 4 * b) % 16).as("v"))
    }
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array(blocks: _*)).as("bs"))
      .select(col("doc_id"), col("simhash"),
        col("bs.blk").as("blk"), col("bs.v").as("v"))
    banded.as("a").join(banded.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
