package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling rewrites for hot-key workloads.
  *
  * At 100 TB a handful of keys owning most rows is the norm (the reference's
  * own traffic is exactly this shape: one CNC address dominates the flow
  * table, `ryu/src/deployed_controller/DIPA_Controller.py:479-495`). Spark
  * already covers two skew cases for free — map-side partial aggregation
  * makes algebraic `groupBy` skew-proof, and AQE splits skewed sort-merge
  * join partitions — but three shapes still serialize a hot key into one
  * task, and these operators rewrite them:
  *
  *   - a shuffle JOIN whose build side is too big to broadcast
  *     ([[saltedJoin]]: replicate the dim ×s, salt the fact),
  *   - per-key WINDOW ranking ([[topKPerKey]]: local top-k per salt, then
  *     top-k over the k·s survivors),
  *   - non-algebraic aggregation — collect_set / count(distinct) — where
  *     the reduce value set itself is huge ([[distinctAgg]]: bucket by
  *     VALUE hash so each distinct value lands in exactly one bucket,
  *     making per-bucket results disjoint and exactly mergeable).
  *
  * Every rewrite is row-identical to its naive form (oracle-checked in
  * SkewQueries), and every salt is DETERMINISTIC — derived by hashing a
  * caller-named unique column, never `rand()` — so results are replayable
  * and retry-safe (a recomputed task re-derives the same salt; a `rand()`
  * salt changes lineage under retry, which can drop or duplicate rows in
  * a shuffle-retry on a real cluster).
  */
object Skew {

  /** Deterministic salt in [0, s): spreads one hot key across s reduce
    * slots. `unique` should be (close to) unique per row — a row id, not
    * the hot key itself.
    */
  def salt(s: Int, unique: Column): Column =
    pmod(xxhash64(unique), lit(s.toLong)).cast("int")

  /** Hot-key equi-join without broadcast: replicate `dim` ×s (explode,
    * map-side, no shuffle), salt `fact` rows deterministically, join on
    * keys + salt. The hot fact key now hashes to s different reduce
    * partitions instead of one; the dim pays s× its (small-side) size in
    * shuffle. Use when the dim outgrows the broadcast threshold but is
    * still ≪ fact; inner joins only (each fact row still matches exactly
    * the dim rows it would have).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 s: Int, factUnique: Column): DataFrame = {
    val salted = fact.withColumn("__salt", salt(s, factUnique))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Per-key top-k under key skew. The naive `row_number().over(key)` puts
    * every row of a hot key in ONE task's sort; here each of the s salt
    * slices sorts locally and only the ≤ k·s per-key survivors reach the
    * final per-key ranking. `order` must be a total order (append a unique
    * id as the last sort column) for the result to be deterministic and
    * equal to the unsalted window.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int, s: Int, unique: Column): DataFrame = {
    val local = Window
      .partitionBy((keys.map(col) :+ col("__salt")): _*).orderBy(order: _*)
    val global = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__salt", salt(s, unique))
      .withColumn("__rk", row_number().over(local))
      .filter(col("__rk") <= k)
      .withColumn("__rk", row_number().over(global))
      .filter(col("__rk") <= k)
      .drop("__salt", "__rk")
  }

  /** Exact count(distinct value) per key when one key holds most values:
    * bucket rows by hash(value) — each distinct value falls in exactly one
    * bucket, so the per-(key, bucket) distinct counts partition the key's
    * value set and sum exactly. Both phases are algebraic aggregations
    * (map-side combined); no bucket ever sees more than ~1/s of a hot
    * key's values.
    */
  def distinctCount(df: DataFrame, keys: Seq[String], value: Column,
                    s: Int, out: String): DataFrame =
    df.groupBy((keys.map(col) :+ salt(s, value).as("__b")): _*)
      .agg(count_distinct(value).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).as(out))

  /** Sorted distinct value set per key, same value-hash bucketing: bucket
    * collect_sets are disjoint by construction, so the merge is a plain
    * flatten + sort with no re-deduplication. Bounds any single task's
    * collected state to ~1/s of the hot key's set.
    */
  def distinctSet(df: DataFrame, keys: Seq[String], value: Column,
                  s: Int, out: String): DataFrame =
    df.groupBy((keys.map(col) :+ salt(s, value).as("__b")): _*)
      .agg(collect_set(value).as("__part"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as(out))

  /** Heavy-hitter profile: per-key row count and share of the table, top-n
    * keys first — the measurement that tells you whether (and with what s)
    * the rewrites above are worth applying. One algebraic aggregation plus
    * a 1-row total broadcast.
    */
  def profile(df: DataFrame, keys: Seq[String], topN: Int): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = df.groupBy().agg(count(lit(1)).as("__total"))
    Rankings.topK(
      counts.join(broadcast(total))
        .withColumn("share", col("n") / col("__total")).drop("__total"),
      Seq(col("n").desc) ++ keys.map(col(_).asc), topN)
  }
}
