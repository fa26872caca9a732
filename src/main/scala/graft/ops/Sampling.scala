package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline.
  *
  * Everything here derives from a portable hash of a caller-named id
  * column, never from `rand()`:
  *
  *  - the assignment is REPRODUCIBLE: the same row lands in the same
  *    split on any cluster, any partitioning, any Spark version, and in
  *    other engines (the oracle replays the identical md5 arithmetic in
  *    DuckDB SQL);
  *  - it is RETRY-SAFE: a recomputed task re-derives the same assignment,
  *    where a `rand()` sample can duplicate or drop rows under shuffle
  *    retry (same failure mode the [[Skew]] salts avoid);
  *  - it is STABLE UNDER APPEND: new rows join a split without
  *    reshuffling old ones — how you keep yesterday's eval set out of
  *    tomorrow's training run.
  *
  *  [[splitByHash]] and [[sampleFraction]] are map-only projections (no
  *  shuffle, no state — they compose with any scan at any scale);
  *  [[stratifiedK]] is one keyed window (hot strata: cap k, or pre-filter
  *  with [[sampleFraction]] to bound the per-stratum sort).
  *
  * The hash unit is the first 60 bits of `md5(salt || id)` — uniform in
  * [0, 2^60), compared against integer thresholds so no floating-point
  * rounding is involved anywhere. The salt isolates experiments: two
  * splits with different salts are independent samples. md5 is chosen
  * for CROSS-ENGINE portability (the oracle replays it in SQL; any
  * warehouse can re-derive the split); it is ~3× slower per row than
  * `xxhash64` — still far below scan cost, but if a split will only
  * ever be derived inside Spark, swapping [[hashUnit]]'s body to
  * `pmod(xxhash64(...))` is the documented fast path.
  */
object Sampling {

  /** 2^60, the hash-space size. */
  val Space: Long = 1L << 60

  /** Uniform deterministic hash of `id` in [0, 2^60): first 15 hex chars
    * of `md5(salt || id)`. Map-only; identical in DuckDB as
    * `('0x' || substring(md5(salt || id::VARCHAR), 1, 15))::BIGINT`.
    */
  def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Integer hash thresholds for cumulative weights (normalized). */
  def thresholds(weights: Seq[Double]): Seq[Long] = {
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail
      .map(c => (c / total * Space).toLong)
  }

  /** Assign each row to a named split by hash: `splits` are
    * (name, weight) in order, weights need not sum to 1. Adds `out`.
    *
    * A NULL id hashes to NULL and gets a NULL split — visible and
    * filterable, never a silent assignment into one split (the filter
    * forms below drop NULL ids for the same reason: a row that cannot
    * be addressed cannot be reproducibly sampled).
    */
  def splitByHash(df: DataFrame, id: Column, salt: String,
                  splits: Seq[(String, Double)],
                  out: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights")
    val h = hashUnit(id, salt)
    val cuts = thresholds(splits.map(_._2))
    val assign = splits.map(_._1).zip(cuts).dropRight(1)
      .foldRight(when(h.isNotNull, splits.last._1): Column) {
        case ((name, cut), rest) => when(h < cut, name).otherwise(rest)
      }
    df.withColumn(out, assign)
  }

  /** Keep a deterministic `frac` of rows (by id hash). Map-only filter —
    * pushes to the scan like any predicate.
    */
  def sampleFraction(df: DataFrame, id: Column, salt: String,
                     frac: Double): DataFrame = {
    require(frac >= 0 && frac <= 1, "frac in [0,1]")
    df.filter(hashUnit(id, salt) < lit((frac * Space).toLong))
  }

  /** Mixture sampling: keep a different deterministic fraction per
    * value of `stratum` (e.g. up-sample curated sources, down-sample
    * crawl) — the data-mixture knob of a training corpus. Rows whose
    * stratum is absent from `rates` are dropped. Still map-only: the
    * rate lookup is a literal CASE over the (small) rates map, the
    * filter is a hash comparison.
    */
  def mixtureSample(df: DataFrame, stratum: Column, id: Column,
                    salt: String, rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= 1),
      "rates in [0,1]")
    val cut = rates.foldLeft(lit(-1L)) { case (rest, (name, r)) =>
      when(stratum === name, lit((r * Space).toLong)).otherwise(rest)
    }
    df.filter(hashUnit(id, salt) < cut)
  }

  /** Deterministic k-per-stratum sample: the k rows with the lowest id
    * hash in each stratum (ties broken by the id itself, so the result
    * is a total function of the data).
    */
  def stratifiedK(df: DataFrame, strata: Seq[String], id: Column,
                  salt: String, k: Int): DataFrame = {
    require(!df.columns.contains("__rk"),
      "input uses the reserved temp column name __rk — rename it first")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashUnit(id, salt).asc, id.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
