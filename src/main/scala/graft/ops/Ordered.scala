package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive whole-table operators without a whole-table task.
  *
  * A global running total (`sum(x) over (order by k)`) plans as a
  * SINGLE-partition window — one task sorts and scans everything, the
  * exact shape the round-1 audit banned from this codebase. The
  * two-phase scan here is the distributed classic: bucket the order key,
  * cumulate WITHIN buckets in parallel, cumulate the (tiny) per-bucket
  * totals once, and add the bucket's offset back — identical output,
  * no stage ever holds more than one bucket in one task.
  *
  * The motivating pipeline use is SEQUENCE PACKING: laying documents
  * out into fixed-capacity training windows by cumulative token count
  * ([[packBySize]]), but any "assign global positions / byte offsets /
  * quota boundaries in key order" problem is the same operator.
  */
object Ordered {

  /** Inclusive prefix sum of `value` in `orderCol` order (both named
    * columns; `orderCol` must be unique non-negative integers, e.g. a
    * row id). `bucketWidth` buckets the order key: each bucket is one
    * task's window, and the bucket-total cumulation handles
    * `rows / bucketWidth` rows — keep that count in the millions at
    * most (e.g. width 1e6 over 1e12 rows). Adds `out` (long).
    */
  def prefixSum(df: DataFrame, orderCol: String, value: Column,
                bucketWidth: Long, out: String = "cum"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = Seq("__bkt", "__local", "__off", "__tot", out)
      .intersect(df.columns)
    require(reserved.isEmpty,
      s"input uses reserved/output column names: $reserved — rename them first")
    // `div` truncates toward zero, which is floor ONLY for non-negative
    // keys — a negative orderCol would silently land in the wrong bucket.
    // The guard rides inside the codegen'd bucket expression: one branch
    // per row, no extra pass, fails fast on the first bad key.
    val bucket = when(col(orderCol) < 0,
        raise_error(lit(s"prefixSum: $orderCol must be non-negative")))
      .otherwise(expr(s"$orderCol div $bucketWidth"))
    val withBucket = df.withColumn("__bkt", bucket)
    val local = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumLocal = withBucket.withColumn("__local", sum(value).over(local))
    // per-bucket totals are rows/bucketWidth rows — the one place a
    // single-partition window is correct, because the frame is tiny
    val offsets = withBucket.groupBy("__bkt")
      .agg(sum(value).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bkt", "__off")
    cumLocal.join(broadcast(offsets), "__bkt")
      .withColumn(out, (col("__local") + col("__off")).cast("long"))
      .drop("__bkt", "__local", "__off")
  }

  /** Deterministic global corpus SHUFFLE for training order: every row
    * gets a dense 0-based `out` position in salted-hash order — the
    * reproducible epoch permutation a data loader re-derives instead of
    * storing (same salt → same order; new salt → an independent
    * permutation for the next epoch; retry/append-stable like all
    * [[graft.ops.Sampling]] hash derivations, and portable — the oracle
    * replays the identical md5 arithmetic).
    *
    * Same two-phase shape as [[prefixSum]], with COUNTS as the summed
    * value: the hash space [0, 2^60) splits into `nBuckets` contiguous
    * ranges (each a parallel rank window), and only the per-bucket
    * counts — `nBuckets` rows — touch the single-partition offset
    * window. Hash ties (15-hex-digit collisions) break on the key, so
    * positions are total and deterministic.
    */
  def shuffleOrder(df: DataFrame, keyCol: String, salt: String,
                   nBuckets: Int = 4096, out: String = "pos"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val reserved = Seq("__h", "__bkt", "__rn", "__n", "__off", out)
      .intersect(df.columns)
    require(reserved.isEmpty,
      s"input uses reserved/output column names: $reserved — rename them first")
    val width = math.max(1L, Sampling.Space / nBuckets)
    val withH = df
      .withColumn("__h", Sampling.hashUnit(col(keyCol), salt))
      .withColumn("__bkt", expr(s"__h div $width"))
    val local = Window.partitionBy(col("__bkt"))
      .orderBy(col("__h"), col(keyCol))
    val ranked = withH.withColumn("__rn", row_number().over(local))
    val offsets = withH.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bkt", "__off")
    ranked.join(broadcast(offsets), "__bkt")
      .withColumn(out, (col("__off") + col("__rn") - 1).cast("long"))
      .drop("__h", "__bkt", "__rn", "__off")
  }

  /** Budget prefix: the rows that fit a total-`size` budget in
    * `orderCol` order (cumulative size ≤ `budget`) — "take the first
    * N billion tokens" as one prefix sum + a filter, no driver loop,
    * no global sort task. Inherits [[prefixSum]]'s contract: `orderCol`
    * must be unique non-negative integers (duplicates make the window
    * tie-order — and thus the budget cut point — nondeterministic).
    */
  def takeBudget(df: DataFrame, orderCol: String, size: Column,
                 budget: Long, bucketWidth: Long): DataFrame =
    prefixSum(df, orderCol, size, bucketWidth, "__cum")
      .filter(col("__cum") <= budget)
      .drop("__cum")

  /** Sequential sequence packing: in `orderCol` order, assign each row
    * (a document of `size` tokens) the zero-based id of the
    * fixed-`capacity` pack in which it STARTS, by cumulative size.
    * Deterministic, partitioning-independent, one prefix sum — no
    * first-fit heuristics, the layout every replayable data loader can
    * re-derive. Rows may straddle pack boundaries (the usual
    * concat-then-chunk training layout); pack fill stats are one
    * groupBy away. Inherits [[prefixSum]]'s contract: `orderCol` must be
    * unique non-negative integers — duplicate keys make the cumulative
    * order (and so every pack assignment) nondeterministic.
    */
  def packBySize(df: DataFrame, orderCol: String, size: Column,
                 capacity: Long, bucketWidth: Long,
                 out: String = "pack"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    prefixSum(df, orderCol, size, bucketWidth, "__cum")
      .withColumn("__start", col("__cum") - size)
      .withColumn(out, expr(s"__start div $capacity"))
      .drop("__start")
      .withColumnRenamed("__cum", "cum_size")
  }
}
