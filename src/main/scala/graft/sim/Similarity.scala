package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding similarity: exact cosine, brute-force top-k ANN baseline, and
  * an LSH-bucketed approximate variant (the 100 TB scale path).
  *
  * Dot products are a sequential left-to-right double fold over the vector.
  * Per-element float→double conversion and multiplication are exact IEEE
  * operations, and both Spark's `aggregate` and DuckDB's `list_reduce` fold
  * arrays in index order, so the summed double is bit-identical across
  * engines — which is what makes cosine scores (and rank orders)
  * oracle-checkable without any decimal detour.
  */
object Similarity {

  /** Deterministic dot product of two float-array columns, as double. A
    * sequential higher-order fold over a zipped array — no explode, no
    * shuffle; index-ordered so the result is engine-independent. This is
    * the session-less fallback; the query paths below use the codegen'd
    * native expression (graft.functions.DotProduct), which computes the
    * identical left-to-right accumulation inside whole-stage codegen.
    */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Exact L2 norm of a float-array column. */
  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  /** Native dot product bound to `df`'s session (registers the
    * expression, idempotent). Bit-identical to `dotExact`.
    */
  private def nativeDot(df: DataFrame): (Column, Column) => Column = {
    graft.functions.DotProduct.register(df.sparkSession)
    graft.functions.DotProduct(_, _)
  }

  /** Cosine similarity given precomputed norms. */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Brute-force cosine top-k: every query row scored against the whole
    * corpus. Norms are precomputed per side (once per vector, not per pair);
    * the query side is broadcast (queries << corpus), so the corpus is
    * scanned exactly once with no shuffle — the right baseline plan even at
    * cluster scale when the query set fits in memory.
    * Emits (q_id, c_id, cos, rank<=k), rank ties broken by c_id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dot = nativeDot(corpus)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos", cosine(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank"))
  }

  /** Near-duplicate embedding pairs above a cosine threshold, blocked on a
    * key column (e.g. a cluster/label/coarse-quantizer id): only same-block
    * pairs are scored — the IVF idea. Exact within blocks; pairs crossing
    * blocks are the accepted approximation (at scale the blocking key comes
    * from a coarse quantizer, making that loss explicit and tunable).
    */
  def cosinePairsBlocked(vecs: DataFrame, blockCol: String, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the -2.0 null-cosine sentinel in the filter below is row-identical
    // only while the threshold exceeds it (cosine lives in [-1, 1], so any
    // meaningful threshold does; a threshold <= -2 would let null-cosine
    // rows — e.g. zero-norm vectors — pass)
    require(threshold > -2.0,
      s"threshold must be > -2.0 (cosine is in [-1, 1]); got $threshold")
    val dot = nativeDot(vecs)
    val v = vecs.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos",
        cosine(dot(col("a.v"), col("b.v")), col("a.n"), col("b.n")))
      // threshold over a NON-nullable operand (round 13): `cos >= th`
      // makes the optimizer infer isnotnull(cos), which substitutes the
      // norm alias and lands `isnotnull(sqrt(dotproduct(v,v)))` in a
      // Filter on BOTH scan sides — a second full-corpus dot pass per
      // side (the d4 kernel-in-filter disease; plans/r13/s2_*). A null
      // cos (null vector/norm) fails `>= th` either way, so coalescing
      // to a sentinel below every real threshold is row-identical and
      // folds the inferred filter away.
      .filter(coalesce(col("cos"), lit(-2.0d)) >= threshold)
      .select(col("a.id").as("i"), col("b.id").as("j"), col("cos"))
  }

  /** Hyperplane component for (plane, dimension): pseudo-random in
    * [-0.5, 0.5), derived from an LCG of the flat index — shared with the
    * oracle-SQL generator so both engines use bit-identical planes.
    */
  def planeComp(p: Int, d: Int, dim: Int): Double = {
    val h = (1103515245L * (p * dim + d + 1) + 12345L) % 2147483647L
    h.toDouble / 2147483647.0 - 0.5
  }

  /** Random-hyperplane LSH bucket id as an UNROLLED column expression:
    * `planes` sign bits of dot products with the [[planeComp]] hyperplanes.
    * Test-only twin of the codegen'd native expression
    * (graft.functions.LshBucket) — NativeExprSpec pins the native expr
    * against this unrolled form. Every query path uses the native expr:
    * this one builds planes*dim interpreted sub-expressions, which is the
    * shape round 2 flagged as a scale-killer.
    */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val comps = (0 until dim).map(d => planeComp(p, d, dim))
      val dot = (0 until dim).map(d => element_at(vec, d + 1).cast(DoubleType) * lit(comps(d)))
        .reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Plane count for a hyperplane-LSH table sized to its corpus:
    * ceil(log2(corpusSize / targetBucket)) sign bits put the EXPECTED
    * bucket occupancy near `targetBucket` on a direction-uniform corpus
    * (clustered corpora concentrate mass in few buckets — size against the
    * largest expected cluster instead). This is the knob a 100 TB caller
    * must derive, not pin: at fixed planes, bucket occupancy — and with it
    * the candidate count — grows linearly with the corpus. SimQueries
    * derives its bench geometry through this helper; recall is re-measured
    * per-round against the brute-force ground truth (`s3_recall`).
    * Clamped to [1, 20] — beyond 20 planes (10^6 buckets/table) add tables
    * or shard the corpus rather than sharpening one draw.
    */
  def planesFor(corpusSize: Long, targetBucket: Long = 1): Int = {
    require(corpusSize >= 1 && targetBucket >= 1, "sizes must be positive")
    val p = math.ceil(math.log(corpusSize.toDouble / targetBucket) / math.log(2.0)).toInt
    p.max(1).min(20)
  }

  /** All bucket-offset masks within Hamming `radius` of 0, over `planes`
    * bits — the multi-probe sequence (probe the query's own bucket, then
    * every bucket differing in <= radius sign bits). Generated
    * combinatorially (sum of C(planes, r<=radius) masks), never by
    * scanning 2^planes candidates — planes=32 with radius 2 yields 529
    * masks, not a 4-billion-iteration driver spin.
    */
  def probeMasks(planes: Int, radius: Int): Seq[Long] = {
    require(planes >= 1 && planes <= 62, "planes must fit a positive long")
    require(radius >= 0, "radius must be non-negative")
    def combos(from: Int, left: Int, acc: Long): Vector[Long] =
      if (left == 0) Vector(acc)
      else (from to planes - left).toVector
        .flatMap(b => combos(b + 1, left - 1, acc | (1L << b)))
    (0 to radius.min(planes)).flatMap(r => combos(0, r, 0L))
  }

  /** Multi-table, multi-probe hyperplane-LSH top-k — the configuration that
    * survives corpus growth (the single-table form above keeps its whole
    * recall budget in one bucket draw, so its planes cannot rise past
    * ~log2(corpus/bucket) without recall collapsing).
    *
    * `tables` independent hash tables of `planes` sign bits each are cut
    * from ONE wide native bucket expression (planes*tables <= 63 sign bits,
    * one codegen'd pass per vector); a corpus vector is indexed once per
    * table. On the query side, each table bucket is expanded into every
    * bucket within Hamming `probeRadius` (multi-probe: near-misses of a few
    * sign bits are where near neighbors land). Candidates come from an
    * EQUI-join on (table, bucket) — the corpus side is never theta-joined
    * or rescanned per probe: one broadcast hash join while the probe set
    * is small (`hintBroadcast` true, the default), a plain shuffle hash
    * join on (table, bucket) when the caller's query set outgrows
    * broadcast and passes false (see [[lshMultiScored]]).
    *
    * Shapes: corpus side = |C| * tables index rows (map-side explode, no
    * shuffle before the join); probe side = |Q| * tables * |masks| slim
    * (q_id, table, bucket) rows; scoring happens pre-dedup (a codegen'd
    * dot per matched index row) so the only wide shuffle carries
    * (q_id, c_id, cos) for the max-dedup + rank.
    */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
                   planes: Int, tables: Int, probeRadius: Int,
                   hintBroadcast: Boolean = true,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   carry: Seq[String] = Nil,
                   candidateFilter: Option[Column] = None): DataFrame =
    rankTopK(lshMultiScored(queries, corpus, dim, planes, tables, probeRadius,
      hintBroadcast, idCol, vecCol, carry, candidateFilter), k)

  /** The deduped candidate relation behind [[lshTopKMulti]]: one
    * (q_id, c_id, cos) row per scored candidate pair. Exposed so recall
    * gates can also measure the CANDIDATE FRACTION — count / (|Q|·(|C|-1))
    * is the share of the corpus an index actually examined, the honest
    * denominator under any recall number.
    *
    * `hintBroadcast` (default true) hints `broadcast()` on the probe rows
    * and the query vectors — correct while |Q|·tables·|masks| stays
    * driver-small. Spark honors the hint REGARDLESS of size, so a caller
    * with a large query set must pass false, which leaves a plain shuffle
    * hash join on (t, bk) for AQE to plan — same results, no driver OOM.
    *
    * `carry` = metadata columns riding the corpus side of the bucket
    * index; `candidateFilter` = a predicate over them that prunes
    * candidates BEFORE scoring (the filtered-ANN shape on the LSH path,
    * completing `ivfTopKIndexed`'s `candidateFilter` for the corpora the
    * router sends to LSH). Top-k is over qualifying vectors only, and
    * because the filter lands on the corpus relation before the bucket
    * join, Catalyst pushes it into the corpus scan — filtered-out rows
    * are never bucketed, joined, or scored.
    */
  def lshMultiScored(queries: DataFrame, corpus: DataFrame, dim: Int,
                     planes: Int, tables: Int, probeRadius: Int,
                     hintBroadcast: Boolean = true,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     carry: Seq[String] = Nil,
                     candidateFilter: Option[Column] = None): DataFrame = {
    require(planes * tables <= 63, "wide bucket must fit one long")
    val dot = nativeDot(corpus)
    graft.functions.LshBucket.register(corpus.sparkSession, dim, planes * tables)
    val mask = (1L << planes) - 1
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (hintBroadcast) broadcast(df) else df
    def tableBucket(wide: Column, t: Int): Column =
      shiftright(wide, planes * t).bitwiseAND(lit(mask))
    def banded(wide: Column, as: String): Column =
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), tableBucket(wide, t).as(as))): _*))

    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("wide", graft.functions.LshBucket(col("qv")))
    // slim probe rows: (q_id, t, bk) only — vectors rejoin after candidates
    val probes = qv
      .select(col("q_id"), banded(col("wide"), "qb").as("tb"))
      .select(col("q_id"), col("tb.t").as("t"), col("tb.qb").as("qb"))
      .select(col("q_id"), col("t"), col("qb"),
        explode(typedLit(probeMasks(planes, probeRadius))).as("m"))
      .select(col("q_id"), col("t"), col("qb").bitwiseXOR(col("m")).as("bk"))

    val cAll = corpus.select(col(idCol).as("c_id") +: col(vecCol).as("cv") +:
      carry.map(col): _*)
    // filter BEFORE bucketing: excluded vectors never enter the index
    // sweep — and on a stored corpus the predicate reaches the scan
    val c = candidateFilter.fold(cAll)(cAll.filter)
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
      .withColumn("wide", graft.functions.LshBucket(col("cv")))
      .select(col("c_id"), col("cv"), col("cn"), banded(col("wide"), "bk").as("tb"))
      .select(col("c_id"), col("cv"), col("cn"),
        col("tb.t").as("t"), col("tb.bk").as("bk"))

    c.join(maybeBroadcast(probes), Seq("t", "bk"))
      .filter(col("q_id") =!= col("c_id"))
      .join(maybeBroadcast(qv.select(col("q_id"), col("qv"), col("qn"))), Seq("q_id"))
      .withColumn("cos", cosine(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .groupBy(col("q_id"), col("c_id"))
      .agg(max(col("cos")).as("cos")) // a pair can match in several tables
  }

  /** Rank a (q_id, c_id, cos) relation to per-query top-k, ties broken by
    * c_id — the shared tail of every ANN variant (public so a measured
    * scored relation can be ranked without recomputing the index).
    */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank"))
  }

  /** Embedding near-dup PAIRS above a cosine threshold via the same
    * multi-table hyperplane index as `lshTopKMulti` — the self-join form
    * for corpus-wide near-dup sweeps when no blocking key exists
    * (`cosinePairsBlocked` needs one). Candidates are same-(table, bucket)
    * pairs with i < j, scored once per index hit and deduped by max. No
    * probe expansion: near-duplicates (cos ~ 1) agree on almost every
    * sign bit, so they collide in >= 1 of the `tables` tables with high
    * probability — the regime where banding alone carries recall, unlike
    * the weak-similarity top-k setting. One shuffle on (table, bucket),
    * quadratic only within buckets (~corpus/2^planes each at any scale).
    */
  def cosinePairsLsh(vecs: DataFrame, threshold: Double, dim: Int,
                     planes: Int, tables: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planes * tables <= 63, "wide bucket must fit one long")
    val dot = nativeDot(vecs)
    graft.functions.LshBucket.register(vecs.sparkSession, dim, planes * tables)
    val mask = (1L << planes) - 1
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("wide", graft.functions.LshBucket(col("v")))
      .select(col("id"), col("v"), col("n"),
        explode(array((0 until tables).map(t => struct(lit(t).as("t"),
          shiftright(col("wide"), planes * t).bitwiseAND(lit(mask)).as("bk"))): _*)).as("tb"))
      .select(col("id"), col("v"), col("n"),
        col("tb.t").as("t"), col("tb.bk").as("bk"))
    v.as("a").join(v.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .withColumn("pcos",
        cosine(dot(col("a.v"), col("b.v")), col("a.n"), col("b.n")))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(max(col("pcos")).as("cos")) // a pair can collide in several tables
      .filter(col("cos") >= threshold)
  }

  /** IVF-flat ANN: a coarse quantizer of seeded centroids (corpus rows at
    * fixed ids — the sampled-centroid init every IVF build starts from),
    * each corpus vector assigned to its single nearest cell, queries
    * probing their `nprobe` nearest cells. Exact within probed cells; a
    * query touches ~nprobe/C of the corpus.
    *
    * Scale shape: the centroid table is broadcast (C is small by
    * construction), corpus cell assignment is a map-side `max_by`
    * aggregation — no window, no sort — and the candidate join is a
    * broadcast hash join on the cell id. Complements `lshTopKMulti`:
    * IVF wins when the corpus is clustered (cells match density), LSH
    * when it isn't.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroidPred: String, nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKFrom(queries, corpus, k,
      corpus.filter(centroidPred).select(col(idCol).as("cid"), col(vecCol).as("cv0")),
      nprobe, idCol, vecCol)

  /** IVF-flat top-k against an explicit centroid table (cid, cv0) — the
    * entry point once centroids come from [[refineCentroids]] instead of a
    * sampling predicate.
    */
  def ivfTopKFrom(queries: DataFrame, corpus: DataFrame, k: Int,
                  centroids: DataFrame, nprobe: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rankTopK(ivfScoredFrom(queries, corpus, centroids, nprobe, idCol, vecCol), k)

  /** The scored candidate relation behind [[ivfTopKFrom]] — one
    * (q_id, c_id, cos) row per (query, corpus vector in a probed cell)
    * pair. Exposed, like [[lshMultiScored]], so recall gates can log the
    * candidate fraction alongside the recall they report.
    */
  def ivfScoredFrom(queries: DataFrame, corpus: DataFrame,
                    centroids: DataFrame, nprobe: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dot = nativeDot(corpus)
    val cents = broadcast(centroids
      .select(col("cid"), col("cv0"))
      .withColumn("cn0", sqrt(dot(col("cv0"), col("cv0")))))

    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))

    // argmax centroid per corpus vector: max cosine, min-cid tie-break —
    // a partial-aggregating max_by, not a window (no per-key sort at scale)
    val cCell = c.crossJoin(cents)
      .withColumn("ccos", cosine(dot(col("v"), col("cv0")), col("n"), col("cn0")))
      .groupBy(col("c_id"))
      .agg(first(col("v")).as("v"), first(col("n")).as("n"),
        max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cell"))

    val wq = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cid").asc)
    val qCells = q.crossJoin(cents)
      .withColumn("ccos", cosine(dot(col("v"), col("cv0")), col("n"), col("cn0")))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("q_id"), col("cid").as("cell"))

    cCell.join(broadcast(qCells), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .join(broadcast(q.select(col("q_id"), col("v").as("qv"), col("n").as("qn"))), Seq("q_id"))
      .withColumn("cos", cosine(dot(col("qv"), col("v")), col("qn"), col("n")))
      .select(col("q_id"), col("c_id"), col("cos"))
  }

  /** Build and PERSIST an IVF index: Lloyd-refined centroids plus every
    * corpus vector's cell assignment, written as parquet with the
    * assignments PARTITIONED BY CELL (each cell's files live under a
    * GENERATION subdirectory — see [[compactIvfIndex]] for why). This is
    * the build-once/query-many
    * split every ANN service runs: build pays the same sweeps as
    * [[ivfTopKRefined]] exactly once; each later query set probes its
    * `nprobe` cells and — because cells are parquet partitions — the scan
    * PRUNES to those cells' files (dynamic partition pruning off the
    * broadcast probe join; IvfIndexSpec asserts it in the plan). At
    * 100 TB a query touches nprobe/C of the index FILES, not just
    * nprobe/C of the rows.
    *
    * `trainFraction` < 1 trains the coarse quantizer on a DETERMINISTIC
    * hash sample of the corpus (seeds AND Lloyd sweeps see only the
    * sample; the final assignment sweep always sees every vector — each
    * vector must land in a cell). This is how a production vector store
    * sizes quantizer training: cell centroids are density estimates, and
    * a ~10% sample estimates density at ~10% of the dominant build cost
    * (the refine sweep is corpus × centroids). The sample is
    * [[graft.ops.Sampling.hashUnit]]-addressed — reproducible across
    * clusters, partitionings and engines (the `s12_ivf_sampled` oracle
    * replays the identical md5 cut in DuckDB), retry-safe, and stable
    * under append. At `trainFraction = 1` the build is bit-identical to
    * the untrained-parameter form (the s8 oracle row).
    *
    * `storage = "int8"` stores the SQ8-quantized payload instead of the
    * float vectors (the FAISS `IVF…,SQ8` pairing): centroids, seeding,
    * Lloyd sweeps and cell assignment are all computed on the exact
    * floats, but what lands in the cell files is the `q8` int array +
    * `q8_scale` + integer norm — ~4× less index resident set at 100 TB,
    * and candidate scoring at query time becomes integer-only
    * ([[ivfTopKIndexed]] dispatches on the stored schema). The
    * quantization is `floor(x/s + 0.5)` — deterministic and
    * engine-portable, so the quantized index is still exact-oracle
    * checkable (`s14_ivf_q8_indexed`).
    */
  def buildIvfIndex(corpus: DataFrame, centroidPred: String, dim: Int,
                    path: String, refineIters: Int = 1, gridScale: Int = 1024,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    carry: Seq[String] = Nil,
                    trainFraction: Double = 1.0,
                    trainSalt: String = "ivf-train",
                    storage: String = "float32",
                    pqM: Int = 8, pqK: Int = 16,
                    pqSeedSalt: String = "pq-seed"): Unit = {
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction must be in (0, 1], got $trainFraction")
    require(Storages(storage),
      s"storage must be one of ${Storages.mkString("/")}, got $storage")
    requireCarryNames(carry)
    val dot = nativeDot(corpus)
    val train =
      if (trainFraction >= 1.0) corpus
      else graft.ops.Sampling.sampleFraction(corpus, col(idCol), trainSalt,
        trainFraction)
    var cents = train.filter(centroidPred)
      .select(col(idCol).as("cid"), col(vecCol).as("cv0"))
    for (_ <- 0 until refineIters)
      cents = refineCentroids(train, cents, dim, gridScale, idCol, vecCol)
    // materialize the refinement ONCE (eager local checkpoint of the tiny
    // centroid relation), write the store from the materialized rows, and
    // hand the same rows to the assignment sweep below — round 13: the
    // sweep previously re-READ the just-written parquet (listing + schema
    // inference + scan job per build), pure fixed cost the build pays at
    // every scale since the rows are already driver-adjacent and
    // broadcast-bound either way. Blocks are released after the sweep.
    val centsCk = cents.localCheckpoint(true)
    centsCk.write.mode("overwrite").parquet(s"$path/centroids")
    // PQ codebooks train on the SAME sample as the coarse quantizer and
    // are persisted beside the centroids — appends and queries read the
    // stored codebooks, never retrain (codes stay valid under append).
    // Same round-13 discipline: train once into a checkpoint, write the
    // store from it, encode against the identical rows in memory instead
    // of re-reading + re-deriving (pqM, w) from the files just written.
    val cbCk: Option[(DataFrame, Int, Int)] =
      if (storage != "pq") None
      else {
        val cb = trainPqCodebooks(train, dim, pqM, pqK, refineIters, gridScale,
          idCol, vecCol, pqSeedSalt).localCheckpoint(true)
        cb.write.mode("overwrite").parquet(s"$path/pq_codebooks")
        // the named empty-train failure used to surface via
        // readPqCodebooks when the encode pass re-read the store; the
        // build encodes from memory now, so the check moves here
        if (cb.isEmpty) throw new IllegalStateException(
          s"$path/pq_codebooks is empty — the quantizer trained on zero " +
            "rows (empty train corpus?); rebuild over a non-empty corpus")
        Some((cb, pqM, dim / pqM))
      }
    // a REBUILD at the same path (the drift-rebuild lifecycle
    // appendToIvfIndex anticipates) must not inherit the previous
    // index's tombstones: `tombstones/` lives beside `assigned/`, so the
    // Overwrite above clears the rows but would leave a live non-empty
    // epoch silently masking ids legitimately present in the NEW corpus
    // until some compaction retired it. A rebuild starts life
    // delete-free, like a fresh build.
    locally {
      val fs = hadoopFs(corpus.sparkSession, new org.apache.hadoop.fs.Path(path))
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
      // the applied-curation watermark is per-INDEX-LIFE too: the new
      // corpus has had nothing applied to it yet
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_meta"), true)
    }
    // record the stored form durably BEFORE any data lands: appends
    // dispatch on this manifest, never on data files deletes can empty
    writeStorageManifest(corpus.sparkSession, path, storage)
    assignIntoIndex(corpus, path, SaveMode.Overwrite, idCol, vecCol, carry,
      storage = storage, centroids = Some(centsCk), pqCodebooks = cbCk)
    releaseCheckpointBlocks(centsCk)
    cbCk.foreach { case (cb, _, _) => releaseCheckpointBlocks(cb) }
  }

  /** Free the executor blocks behind an eager `localCheckpoint` once its
    * consumer has run — `Dataset.unpersist` is a CacheManager no-op on
    * checkpoint blocks (they belong to the backing RDD), and a build loop
    * should not wait for the ContextCleaner's weak-reference sweep.
    */
  private def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** The stored candidate-payload forms a persisted index supports. */
  val Storages: Set[String] = Set("float32", "int8", "pq")

  /** Persist the index's stored form as a durable one-line manifest
    * (`path/_meta/storage`, written whole to a dot-temp then renamed —
    * the `_gens` publish pattern, object-store friendly). The manifest —
    * not the data files — is what [[appendToIvfIndex]] dispatches on:
    * schema inference from `assigned/` breaks the moment every live
    * generation of a quantized index is EMPTY (all rows tombstoned and
    * reclaimed, a state the delete lifecycle makes reachable), and a
    * fallback-to-float32 append would silently corrupt the schema-based
    * scoring dispatch of a pq/int8 index.
    */
  private def writeStorageManifest(spark: org.apache.spark.sql.SparkSession,
                                   path: String, storage: String): Unit =
    writeMetaFile(spark, path, "storage", storage)

  /** The stored form recorded at build time — None for a pre-manifest
    * index (legacy layouts fall back to schema inference).
    */
  private[sim] def readStorageManifest(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[String] =
    readMetaFile(spark, path, "storage").map { s =>
      require(Storages(s),
        s"$path/_meta/storage holds '$s', not one of ${Storages.mkString("/")}")
      s
    }

  /** Whole-file-then-rename publish of a tiny `path/_meta/<name>` record
    * (the `_gens` pattern: the file appears atomically or not at all).
    */
  private def writeMetaFile(spark: org.apache.spark.sql.SparkSession,
                            path: String, name: String, content: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_meta")
    val fs = hadoopFs(spark, dir)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dir, name)
    fs.delete(dst, false)
    fs.rename(tmp, dst)
  }

  private def readMetaFile(spark: org.apache.spark.sql.SparkSession,
                           path: String, name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta/$name")
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(s)
    }
  }

  /** Column names the cell-partitioned layout reserves for its own payload,
    * partitioning and query plumbing. `carry` metadata may not collide with
    * them: the stored-form dispatch is by schema (a float32 index with a
    * carry column named `codes` would silently take the PQ scoring branch
    * at query time), and the query join aliases would shadow a carry named
    * `q_id`/`cos` — so the collision fails at BUILD time, by name.
    */
  val ReservedIndexCols: Set[String] = Set(
    "c_id", "v", "n", "cell", "g", "__g", "__pqb", "codes", "rn", "q8",
    "q8_scale", "qn", "cid", "cv0", "cn0", "ccos", "q_id", "cos", "qv",
    "qa", "qan", "qtab", "num", "crn", "rank")

  private def requireCarryNames(carry: Seq[String]): Unit = {
    val clash = carry.filter(ReservedIndexCols)
    require(clash.isEmpty,
      s"carry column(s) ${clash.mkString(", ")} collide with the index " +
        s"layout's reserved payload/partition columns " +
        s"(${ReservedIndexCols.toSeq.sorted.mkString(", ")}) — rename them " +
        "before building/appending")
  }

  /** Incrementally admit NEW vectors into a persisted [[buildIvfIndex]]
    * index: assign ONLY the delta against the STORED centroids (the same
    * broadcast-assign sweep the build runs, restricted to the delta) and
    * APPEND the result to the cell-partitioned layout — existing files
    * are never touched, new rows land as new files inside their cell's
    * partition directory, and query-time pruning keeps working because
    * the layout is unchanged. This is what makes a growing corpus
    * affordable: the per-batch cost is |delta| × C broadcast scores, not
    * a full rebuild.
    *
    * Because the centroids are FIXED, each vector's cell is a pure
    * function of the vector — so build-on-a-subset + append-the-rest is
    * row-for-row identical to one assignment sweep over the whole corpus
    * against the same centroids (IvfIndexSpec proves it, and the
    * `s10_ivf_append` oracle replays refine-over-initial + assign-all in
    * DuckDB). The trade every IVF service accepts: appended vectors do
    * not move the centroids, so after enough drift the cells stop
    * matching corpus density and a rebuild re-refines — rebuild
    * threshold policy stays with the caller.
    */
  def appendToIvfIndex(delta: DataFrame, path: String,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       carry: Seq[String] = Nil,
                       storage: Option[String] = None,
                       cachedCentroids: Option[DataFrame] = None): Unit = {
    requireCarryNames(carry)
    // the stored form follows the EXISTING index (an append can never
    // silently mix storage forms): the build-time manifest is the
    // authority — unlike the data files, it survives a fully-reclaimed
    // index (every live generation emptied by deletes), where schema
    // inference would fall back to float32 and silently corrupt a
    // quantized index's scoring dispatch. Schema inference remains only
    // as the pre-manifest legacy path; the explicit override only
    // matters when neither exists yet.
    val stored = storage match {
      case Some(s) =>
        require(Storages(s),
          s"storage must be one of ${Storages.mkString("/")}, got $s")
        s
      case None =>
        readStorageManifest(delta.sparkSession, path).getOrElse {
          try {
            val cols = delta.sparkSession.read.parquet(s"$path/assigned").columns
            if (cols.contains("codes")) "pq"
            else if (cols.contains("q8")) "int8"
            else "float32"
          } catch {
            case _: org.apache.spark.sql.AnalysisException => "float32"
          }
        }
    }
    assignIntoIndex(delta, path, SaveMode.Append, idCol, vecCol, carry,
      storage = stored, centroids = cachedCentroids)
  }

  /** Streaming form of [[appendToIvfIndex]]: every micro-batch of
    * arriving vectors is assigned against the stored centroids and
    * appended. `foreachBatch` reuses the batch path verbatim, so the
    * streamed index is row-for-row the batch index of the same rows
    * (IvfIndexSpec pins it); exactly-once lands on the caller's
    * checkpoint + the idempotent cell layout (replayed batches re-append —
    * at-least-once, as the alert log's sink contract).
    *
    * Per-batch floor amortization (round-13): the centroids (and a pq
    * index's codebooks) are IMMUTABLE for the stream's lifetime —
    * compaction never moves them, and a rebuild is excluded by the
    * single-writer contract while the stream runs — so they are cached
    * ONCE here and every micro-batch broadcasts from memory instead of
    * re-scanning the stored parquet, and the stored-form manifest is
    * resolved once instead of per batch. Caches are released when the
    * query terminates (listener below). What remains of the floor is the
    * partitioned write itself — and the century pair
    * (`sf10_s10_stream_*` at 1 vs 4 files/trigger) measured that it is
    * NOT constant: successive appends commit into cell dirs holding
    * progressively more small files, so per-trigger cost grows with
    * accumulated appends. Hence `compactEvery = Some(n)`: the stream —
    * which IS the index's single maintenance writer — runs
    * [[compactIvfIndex]] after every n-th committed batch, bounding
    * per-cell live files at the source with the reader-safe generation
    * swap (concurrent queries never break). Idempotent under batch
    * replay: a replayed append re-lands its rows and the re-run
    * compaction converges to the same one-file-per-cell state.
    */
  def appendToIvfIndexStream(vectors: DataFrame, path: String,
                             checkpoint: String,
                             idCol: String = "vec_id", vecCol: String = "embedding",
                             carry: Seq[String] = Nil,
                             compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    compactEvery.foreach(n => require(n >= 1,
      s"compactEvery must be >= 1 batch, got $n"))
    requireCarryNames(carry)
    val spark = vectors.sparkSession
    val cents = spark.read.parquet(s"$path/centroids").cache()
    cents.count() // materialize before the first trigger
    // resolve the stored form ONCE (manifest; legacy pre-manifest
    // layouts fall back to schema inference exactly as appendToIvfIndex)
    val storedForm = readStorageManifest(spark, path).getOrElse {
      try {
        val cols = spark.read.parquet(s"$path/assigned").columns
        if (cols.contains("codes")) "pq"
        else if (cols.contains("q8")) "int8"
        else "float32"
      } catch {
        case _: org.apache.spark.sql.AnalysisException => "float32"
      }
    }
    val cachedCb = if (storedForm == "pq") {
      val (raw, pqM, w) = readPqCodebooks(spark, path)
      val c = raw.cache(); c.count()
      Some((c, pqM, w))
    } else None
    val q = vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assignIntoIndex(batch, path, SaveMode.Append, idCol, vecCol, carry,
          storage = storedForm, centroids = Some(cents),
          pqCodebooks = cachedCb)
        compactEvery.foreach { n =>
          if ((batchId + 1) % n == 0) compactIvfIndex(spark, path)
        }
      }
      .start()
    val qid = q.id
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == qid) {
          cents.unpersist()
          cachedCb.foreach(_._1.unpersist())
          spark.streams.removeListener(this)
        }
    })
    q
  }

  /** The shared assignment sweep: score `vecs` against the index's stored
    * centroids (broadcast), pick each vector's argmax cell, write into the
    * cell-partitioned layout under `mode`. With `quantize` the stored
    * payload is the SQ8 form ([[withQuantized]]: `q8` int array +
    * `q8_scale`) plus the integer norm `qn` INSTEAD of the float vector —
    * assignment still scores the float vector (centroids stay float;
    * they are the small side), only the per-vector storage shrinks.
    */
  private def assignIntoIndex(vecs: DataFrame, path: String, mode: SaveMode,
                              idCol: String, vecCol: String,
                              carry: Seq[String],
                              storage: String = "float32",
                              centroids: Option[DataFrame] = None,
                              pqCodebooks: Option[(DataFrame, Int, Int)] = None)
      : Unit = {
    val spark = vecs.sparkSession
    // read (don't recompute) the centroids: build reuses its just-written
    // refinement, append sees exactly what the build stored. A caller
    // holding the stream-lifetime cache passes it in so each micro-batch
    // collects from memory instead of re-scanning the parquet store.
    // Round 14: the assignment is MAP-ONLY — the centroid table (tiny by
    // construction; it was broadcast whole before) rides inside the
    // native [[graft.functions.ArgTopCells]] kernel, so the per-vector
    // argmax costs no crossJoin row blowup and, crucially, no groupBy
    // EXCHANGE of the whole corpus: the build's only remaining shuffle is
    // the cell-clustered write below. Ranking semantics are the previous
    // max_by(cid, struct(ccos, -cid)) verbatim (see the kernel's scaladoc;
    // the s6/s8/... oracle rows replay them in DuckDB).
    val cents = collectCentEntries(
      centroids.getOrElse(spark.read.parquet(s"$path/centroids")))
    // `carry` = metadata columns stored alongside each vector — what
    // makes FILTERED search answerable from the index alone
    val base = vecs.select(col(idCol).as("c_id") +: col(vecCol).as("v") +:
      carry.map(col): _*)
    val outCols = Seq(col("c_id"), col("v"), col("n")) ++
      carry.map(col) :+ col("cell")
    val assigned =
      if (cents.isEmpty)
        // no centroids, no assignable rows — the empty frame the old
        // crossJoin shape produced, same schema
        base.withColumn("n", lit(0.0d)).withColumn("cell", lit(0L))
          .limit(0).select(outCols: _*)
      else {
        graft.functions.ArgTopCells.register(spark, cents, 1)
        base.withColumn("__ac", graft.functions.ArgTopCells(col("v")))
          .withColumn("n", col("__ac").getField("n"))
          .withColumn("cell", element_at(col("__ac").getField("cells"), 1))
          .select(outCols: _*)
      }
    val stored = storage match {
      case "float32" => assigned
      case "int8" =>
        val dotI = nativeDotInt(assigned)
        withQuantized(assigned, "v", "q8")
          .withColumn("qn", sqrt(dotI(col("q8"), col("q8")).cast(DoubleType)))
          .drop("v", "n")
      case "pq" =>
        // encode against the STORED codebooks (appends reuse the build's
        // training, the same contract as the fixed coarse centroids):
        // per (vector, sub) argmin-L2 entry, packed into one codes array
        // (sub order) plus the reconstruction norm `rn` — precomputable
        // exactly because subspaces are disjoint coordinates, so
        // |x̂|² = Σ_sub |codebook[sub][code]|². Round 14: the codebooks
        // are literal-sized, so the whole encode is a map-only projection
        // FUSED onto the assign sweep's output ([[pqBestEntries]]) — the
        // previous shape re-scanned the input, exploded it ×pqM, blew it
        // up ×pqK through a broadcast join, shuffled it twice ((pid, sub)
        // argmin + per-pid pack) and joined it back onto `assigned`; all
        // of that folds into per-row expressions with identical math
        // (same native L2 fold, same (d2, cid) tie-break, same sub-order
        // left fold for rn — parity-pinned by the s15/s16 oracle rows).
        val cbDf = pqCodebooks.map(_._1).getOrElse(readPqCodebooks(spark, path)._1)
        val (entries, _, w) = collectPqEntries(cbDf)
        graft.functions.PqEncode.register(spark, entries, w)
        // one shared `__pqb` struct column: codes and rn both read it, and
        // CollapseProject does not inline a non-cheap alias referenced
        // twice — the kernel runs once per row, not once per consumer
        assigned
          .withColumn("__pqb", graft.functions.PqEncode(col("v")))
          .withColumn("codes", col("__pqb").getField("codes"))
          .withColumn("rn", col("__pqb").getField("rn"))
          .drop("__pqb", "v", "n")
    }
    // stamp each row's GENERATION: new rows always land in their cell's
    // LIVE generation dir (compaction bumps it — see [[compactIvfIndex]]);
    // a build starts every cell at g=0, an append resolves the current
    // summary so appended files join the generation readers resolve
    val assignedRoot = s"$path/assigned"
    val genStamped = mode match {
      case SaveMode.Overwrite => stored.withColumn("g", lit(0L))
      case _ =>
        val (_, gens) = readGenSummary(
          hadoopFs(spark, new org.apache.hadoop.fs.Path(assignedRoot)),
          assignedRoot)
        if (gens.isEmpty) stored.withColumn("g", lit(0L))
        else {
          val genDf = broadcast(
            spark.createDataFrame(gens.toSeq).toDF("cell", "__g"))
          stored.join(genDf, Seq("cell"), "left")
            .withColumn("g", coalesce(col("__g"), lit(0L))).drop("__g")
        }
    }
    genStamped
      // cluster by cell BEFORE the partitioned write: the groupBy output
      // is hashed on c_id, so without this every write task holds rows of
      // ~every cell and opens one parquet writer per cell — file count
      // (and writer-buffer memory) scales with writers × cells. After the
      // repartition each cell's rows land in one task: file count is
      // O(cells), independent of write parallelism — the shape a 1000-
      // executor build needs. The partition COUNT is pinned to the
      // session's shuffle width (round 13): a bare repartition(col) is
      // REPARTITION_BY_COL, which AQE freely coalesces — measured down to
      // ONE task, serializing every cell's parquet writer open/close
      // (1.55 s of a 1.67 s write at sf0.1, 0.56 s cpu). With the count
      // pinned the cells spread across min(cells, shuffle width) writer
      // tasks; hashing by cell keeps file count O(cells) either way.
      .repartition(spark.sessionState.conf.numShufflePartitions, col("cell"))
      .write.mode(mode).partitionBy("cell", "g").parquet(assignedRoot)
  }

  // ---- generation + tombstone bookkeeping of the persisted layout ------

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
                       p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Newest committed generation summary under `assigned/_gens`:
    * (version, cell → live generation). Cells absent from the map — never
    * compacted — live at generation 0, so a fresh index needs no summary
    * at all. Summary files are written whole to a dot-temp and RENAMED in,
    * so the newest listed version is always complete; the `_` prefix keeps
    * the dir invisible to Spark's partition discovery.
    */
  private def readGenSummary(fs: org.apache.hadoop.fs.FileSystem,
                             assignedRoot: String): (Long, Map[Long, Long]) = {
    val gens = new org.apache.hadoop.fs.Path(s"$assignedRoot/_gens")
    if (!fs.exists(gens)) return (0L, Map.empty)
    val vers = fs.listStatus(gens).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.stripPrefix("v").toLong)
    if (vers.isEmpty) return (0L, Map.empty)
    val ver = vers.max
    val in = fs.open(new org.apache.hadoop.fs.Path(gens, s"v$ver"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    (ver, txt.split("\n").iterator.filter(_.nonEmpty).map { l =>
      val Array(c, g) = l.split(" "); c.toLong -> g.toLong
    }.toMap)
  }

  private def writeGenSummary(fs: org.apache.hadoop.fs.FileSystem,
                              assignedRoot: String, ver: Long,
                              m: Map[Long, Long]): Unit = {
    val gens = new org.apache.hadoop.fs.Path(s"$assignedRoot/_gens")
    fs.mkdirs(gens)
    val tmp = new org.apache.hadoop.fs.Path(gens, s".v$ver.tmp")
    val out = fs.create(tmp, true)
    try out.write(m.toSeq.sorted.map { case (c, g) => s"$c $g" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(gens, s"v$ver"))
  }

  /** The cell ids present on disk (one root listing). */
  private def cellsOnDisk(fs: org.apache.hadoop.fs.FileSystem,
                          assignedRoot: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(assignedRoot)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=").toLong).toSeq.sorted
  }

  /** The LIVE generation directories for `cells` (every on-disk cell when
    * None), as explicit paths the scan is constructed over.
    */
  private def liveAssignedDirs(spark: org.apache.spark.sql.SparkSession,
                               path: String,
                               cells: Option[Seq[Long]]): Seq[String] = {
    val assignedRoot = s"$path/assigned"
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(assignedRoot))
    val onDisk = cellsOnDisk(fs, assignedRoot)
    val (_, gens) = readGenSummary(fs, assignedRoot)
    val sel = cells.fold(onDisk)(cs => cs.filter(onDisk.toSet))
    sel.map(c => s"$assignedRoot/cell=$c/g=${gens.getOrElse(c, 0L)}")
  }

  /** The LIVE rows of a persisted index — the one read path every consumer
    * (query, compaction, parity checks) must use: resolves each cell's
    * live generation from the newest summary and constructs the scan over
    * exactly those generation directories. A raw recursive read of
    * `path/assigned` is WRONG once any compaction has run: superseded
    * generations are retained one compaction cycle for lagging readers
    * (keep = 2) and a recursive read would double-count their rows.
    * Tombstoned rows ([[deleteFromIvfIndex]]) are NOT filtered here — this
    * is the physical row set; query paths anti-join the live tombstone
    * epoch on top.
    */
  def readIvfAssigned(spark: org.apache.spark.sql.SparkSession, path: String,
                      cells: Option[Seq[Long]] = None): DataFrame = {
    val dirs = liveAssignedDirs(spark, path, cells)
    require(dirs.nonEmpty, s"$path/assigned holds no cell directories")
    spark.read.option("basePath", s"$path/assigned")
      .parquet(dirs: _*)
      .drop("g")
      .withColumn("cell", col("cell").cast("long"))
  }

  /** Committed tombstone epoch ids under `path/tombstones`, ascending —
    * the `_SUCCESS`-marker definition shared by readers, the delete
    * writer and the epoch pruner (the CurationStream epoch discipline).
    */
  private def committedTombEpochs(fs: org.apache.hadoop.fs.FileSystem,
                                  path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(p, s"$d/_SUCCESS")))
      .map(_.stripPrefix("epoch=").toLong).sorted.toSeq
  }

  /** The live tombstone id set — the newest committed epoch, a
    * single-column (`c_id`) frame — or None when the index has never had
    * a delete. Each epoch is SELF-CONTAINED (the full current tombstone
    * set, not a delta), so readers resolve exactly one epoch dir and
    * retiring the set is writing an empty newer epoch — never deleting
    * files a lagging reader may hold.
    */
  private def readTombstones(spark: org.apache.spark.sql.SparkSession,
                             path: String): Option[DataFrame] =
    readTombstonesSized(spark, path).map(_._1)

  /** The live tombstone epoch plus its on-disk parquet bytes — the size
    * the query-path broadcast decision is made on (one listing of the
    * epoch dir; no Spark job, and the set was written by
    * [[deleteFromIvfIndex]] as one coalesced file so the listing is a
    * handful of statuses).
    */
  private def readTombstonesSized(spark: org.apache.spark.sql.SparkSession,
                                  path: String): Option[(DataFrame, Long)] = {
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val epochs = committedTombEpochs(fs, path)
    if (epochs.isEmpty) None
    else {
      val dir = s"$path/tombstones/epoch=${epochs.max}"
      val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
      Some((spark.read.parquet(dir), bytes))
    }
  }

  /** Above this many on-disk bytes, the live tombstone set stops being
    * broadcast into the query path's anti-join and joins plain
    * (shuffle-eligible). The contract bounds the live set by deletes
    * since the last compaction, but nothing ENFORCES it — a mass
    * re-curation with no intervening compaction grows the epoch
    * unboundedly, and an explicit `broadcast()` hint strips Spark's own
    * auto-size protection, so the failure mode at 100 TB would be a
    * driver/executor OOM inside a QUERY (never acceptable; a slow query
    * is). 64 MiB of raw parquet ids is far beyond any sane
    * delete-between-compactions volume yet comfortably inside driver
    * broadcast class — above it the query degrades gracefully to a
    * shuffled anti-join and the operator keeps answering while the
    * operator's fix (run [[compactIvfIndex]]) is one call away.
    * Session conf `graft.index.tombstoneBroadcastMaxBytes` moves the
    * threshold (and lets the spec pin the fallback plan shape without
    * materializing 64 MiB of ids).
    */
  val TombstoneBroadcastMaxBytes: Long = 64L << 20

  private def tombstoneBroadcastMax(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.index.tombstoneBroadcastMaxBytes")
      .map(_.toLong).getOrElse(TombstoneBroadcastMaxBytes)

  private def pruneTombEpochs(spark: org.apache.spark.sql.SparkSession,
                              path: String, keep: Int): Unit = {
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    committedTombEpochs(fs, path).dropRight(keep).foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones/epoch=$id"), true))
  }

  /** DELETE vectors from a persisted index — the way OUT of the store
    * that [[buildIvfIndex]]/[[appendToIvfIndex]] are the way into. Writes
    * a new TOMBSTONE EPOCH (the previous live set plus `ids`, one tiny
    * self-contained parquet — O(live tombstones), the index files are
    * untouched): [[ivfTopKIndexed]]/[[ivfTopKReranked]] anti-join the
    * live epoch on the cell-pruned read, so deleted vectors stop being
    * retrievable IMMEDIATELY, and the next [[compactIvfIndex]] physically
    * reclaims them (rewrites exactly the cells holding tombstoned rows,
    * then retires the applied set as an empty newer epoch, keep = 2).
    *
    * This is the dedup-consistency path a 100 TB deployment hits daily:
    * curation drop verdicts arrive AFTER embedding/indexing, and a corpus
    * whose dropped documents remain retrievable from its ANN index is
    * incoherent — see [[deleteCurationDropsFromIvfIndex]] for the
    * one-call composition from a curation drop epoch. Reference tie-in:
    * mitigation's remove side (`ryu/src/deployed_controller/
    * Controller1.py:434-443`) — state must leave as cheaply as it
    * arrived. Returns the epoch id covering the request — a newly
    * written one, or the existing live epoch when every requested id is
    * already tombstoned (the no-op skip; see the hygiene note in the
    * body). Writer coordination: serialize
    * deletes and compactions (single maintenance writer, the standard
    * table-format contract); readers need no coordination.
    *
    * Semantics note (pinned by IvfLifecycleProps): a tombstone masks the
    * ID, not a row version. Appending a row under an id whose tombstone
    * is LIVE leaves the new row masked — and reclaimed at the next
    * compaction; after the compaction retires the applied set, the id is
    * insertable again (a delete is not a forever-ban). A pipeline that
    * re-embeds dropped-then-revised documents must therefore append the
    * revision AFTER the compaction that applies the drop, or version its
    * id space — the same id-reuse discipline every tombstone-based store
    * asks for.
    */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, ids: DataFrame,
                         idCol: String = "vec_id"): Long = {
    val add = ids.select(col(idCol).as("c_id")).distinct()
    val prev = readTombstones(spark, path)
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val cur = committedTombEpochs(fs, path).lastOption
    // WRITE-AMPLIFICATION HYGIENE: each epoch is self-contained
    // (previous ∪ new), so a high-frequency caller re-submitting
    // already-live ids — the per-epoch curation hook replaying its drop
    // set is the common case — would rewrite the full set for nothing.
    // When `ids ∖ live = ∅` the live epoch already IS the requested
    // state: skip the write and return its id. Cadence contract for
    // frequent deleters: self-contained epochs cost O(live set) per
    // WRITE, so compaction (which retires the applied set) should run at
    // least once per O(tens) of delete calls — see
    // [[deleteCurationDropsFromIvfIndex]] for the hook's own delta
    // discipline, which keeps the live set delta-sized between
    // compactions.
    val isNoOp = cur.isDefined &&
      prev.fold(false)(p => add.join(p, Seq("c_id"), "left_anti").isEmpty)
    if (isNoOp) return cur.get
    val full = prev.fold(add)(p => p.unionByName(add).distinct())
    val next = cur.getOrElse(-1L) + 1L
    // one file: the tombstone set is delete-volume sized, not corpus sized
    full.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/tombstones/epoch=$next")
    pruneTombEpochs(spark, path, keep = 2)
    next
  }

  /** Wire a curation COMPACTION EPOCH's dropped-id set
    * ([[graft.streaming.CurationStream.startCompactionStage]]'s
    * `epoch=<id>` artifact) into a persisted index as tombstones — the
    * one-call composition closing the dedup→index consistency gap. Reads
    * the newest committed curation epoch (same `_SUCCESS` rule as
    * `compactedView`); a no-op (returns None) when no epoch is committed
    * yet, or when the newest epoch was already applied to this index.
    *
    * DELTA DISCIPLINE (the convergence contract): curation epochs are
    * CUMULATIVE — each holds the full historical drop set — while the
    * index's live tombstone epoch must stay bounded by deletes since the
    * index's last compaction (it is anti-joined, preferably broadcast,
    * into every query). Naively tombstoning each epoch's full set would
    * re-add ids the index's compaction already reclaimed and retired, so
    * the live set would grow to O(all drops ever) and never converge.
    * Instead this call (a) skips entirely when the newest curation epoch
    * id is at or below the `_meta/curation_applied` watermark the
    * previous application recorded (the per-trigger replay fast path —
    * no scan at all); (b) otherwise applies only the NEW drops: the set
    * difference against the last-applied epoch's artifact when it is
    * still on disk (drop-set-sized, no index scan), falling back — when
    * retention pruned that artifact — to the ids still PHYSICALLY
    * present in the index (one column-pruned id scan; reclaimed drops
    * are absent by definition). Either way the live tombstone set stays
    * delta-sized between index compactions. Crash between the tombstone
    * write and the watermark publish replays as (b) whose residual is
    * already live — [[deleteFromIvfIndex]]'s no-op skip absorbs it.
    *
    * Id discipline (the composition's half of [[deleteFromIvfIndex]]'s
    * id-reuse note): a drop is applied ONCE — re-appending a dropped
    * document's embedding under the same id later is retrievable again
    * (the watermark never re-applies old drops). A pipeline that revises
    * dropped documents must version its id space or re-drop through a
    * new curation epoch — the same discipline the delete API documents.
    */
  def deleteCurationDropsFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                                      indexPath: String, epochDir: String,
                                      dropIdCol: String = "doc_id"): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(epochDir)
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) return None
    val epochs = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(p, s"$d/_SUCCESS")))
      .map(_.stripPrefix("epoch=").toLong)
    if (epochs.isEmpty) return None
    val newest = epochs.max
    val applied = readMetaFile(spark, indexPath, "curation_applied").map(_.toLong)
    if (applied.exists(_ >= newest)) return None
    val drops = spark.read.parquet(s"$epochDir/epoch=$newest")
      .select(col(dropIdCol)).distinct()
    val priorDir = applied.map(a => s"$epochDir/epoch=$a")
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/_SUCCESS")))
    val delta = priorDir match {
      case Some(d) =>
        // cheap path: cumulative epochs make "new since last applied" a
        // plain set difference of two drop-set-sized artifacts
        drops.join(spark.read.parquet(d).select(col(dropIdCol)).distinct(),
          Seq(dropIdCol), "left_anti")
      case None =>
        // retention pruned the applied artifact (or nothing was ever
        // applied): keep only drops still physically present — an id the
        // index's compaction reclaimed cannot need masking again
        try drops.join(
            readIvfAssigned(spark, indexPath)
              .select(col("c_id").as(dropIdCol)).distinct(),
            Seq(dropIdCol), "left_semi")
        catch {
          // a fully-reclaimed index holds no rows — nothing to mask
          case _: org.apache.spark.sql.AnalysisException => drops.limit(0)
        }
    }
    val r = deleteFromIvfIndex(spark, indexPath, delta, dropIdCol)
    // watermark AFTER the tombstone state covers `newest` — the crash
    // window replays idempotently (see scaladoc)
    writeMetaFile(spark, indexPath, "curation_applied", newest.toString)
    Some(r)
  }

  /** Compact the small files a persisted index accumulates under
    * [[appendToIvfIndex]]/[[appendToIvfIndexStream]] and physically
    * reclaim tombstoned rows ([[deleteFromIvfIndex]]): every append lands
    * its delta as NEW files inside each touched cell's live generation
    * (that is what makes the append cheap and idempotent), so a
    * daily-append deployment drifts toward many tiny files per cell — and
    * at 100 TB the per-file open/footer cost starts to rival the row scan
    * itself. Rewrites ONLY (a) the cells holding more than
    * `maxFilesPerCell` data files and (b) the cells holding tombstoned
    * rows, one output file per rewritten cell; untouched cells' files are
    * never read or replaced. Returns the rewritten cell ids.
    *
    * CONCURRENT READERS ARE SAFE — the round-11 "run compaction when the
    * affected cells are quiescent" caveat is retired the way
    * `CurationStream.pruneEpochs` retired its race, by generations
    * instead of in-place swaps. Each cell's files live under a
    * generation subdir (`cell=N/g=K`); readers resolve the live
    * generation from the newest `_gens` summary. Compaction writes the
    * rewritten cells to staging, renames each in as the NEW generation
    * `g=K+1` (live files are never moved or deleted by the swap),
    * publishes the summary, and only then prunes generations superseded
    * TWICE (keep = 2) — so a reader that resolved its plan any time
    * after the previous compaction keeps every file it holds through
    * one full compaction cycle (IvfIndexSpec pins it with an
    * interleaved reader). Crash safety follows from the same shape: the
    * staging dir only ever holds COPIES, so a crashed run's leftovers
    * are garbage (deleted on the next entry), and a renamed-but-never-
    * published `g=K+1` dir is invisible to readers and replaced on
    * re-run. The COMMIT POINT is the summary publish, not the dir
    * renames — readers never resolve a generation the summary does not
    * advertise — so the design carries to object stores where rename is
    * copy-not-atomic: the renames just have to COMPLETE before the
    * summary lands, and the summary file itself appears atomically
    * (written whole, then renamed/PUT). WRITERS still serialize: one
    * build/append/delete/compact at a time (the standard single-writer
    * table-format contract); appends land in the live generation the
    * summary advertises.
    *
    * Tombstone application order (the reader contract's other half):
    * readers resolve tombstones BEFORE the generation summary, and this
    * writer publishes the summary BEFORE retiring the applied tombstone
    * set (as an empty newer epoch, keep = 2) — so every interleaving
    * reads consistently: an old tombstone set masks old generations, and
    * an empty one is only visible once the clean generations are too.
    *
    * Pure layout maintenance plus deletes: the surviving row set, schema
    * and query answers are unchanged (IvfIndexSpec pins parity;
    * `s13_ivf_compacted` pins build→append→compact→query to the s10
    * twin, `s17_ivf_deleted` pins the delete lifecycle at both read
    * points).
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      maxFilesPerCell: Int = 1): Seq[Long] = {
    require(maxFilesPerCell >= 1, s"maxFilesPerCell >= 1, got $maxFilesPerCell")
    val assignedRoot = s"$path/assigned"
    val root = new org.apache.hadoop.fs.Path(assignedRoot)
    val fs = hadoopFs(spark, root)
    val staging = new org.apache.hadoop.fs.Path(s"$path/assigned_compacting")
    // staging only ever holds copies (live generations are never moved),
    // so a crashed run's leftover is garbage by construction
    fs.delete(staging, true)
    if (!fs.exists(root)) return Nil
    val (ver, gens) = readGenSummary(fs, assignedRoot)
    def gen(c: Long): Long = gens.getOrElse(c, 0L)
    val onDisk = cellsOnDisk(fs, assignedRoot)
    if (onDisk.isEmpty) return Nil
    def dataFiles(p: org.apache.hadoop.fs.Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val fileTargets = onDisk.filter(c =>
      dataFiles(new org.apache.hadoop.fs.Path(s"$assignedRoot/cell=$c/g=${gen(c)}")) >
        maxFilesPerCell)
    // only a NON-EMPTY live tombstone set drives work; the empty epoch a
    // previous retirement wrote is already the retired state
    val tombs = readTombstones(spark, path).filter(!_.isEmpty)
    val tombTargets: Seq[Long] = tombs.fold(Seq.empty[Long]) { t =>
      // one column-pruned pass over (c_id, cell) of the live layout: the
      // tombstone store holds ids, not cells, so the dead rows' cells are
      // looked up once here — maintenance-pass cost, never query cost
      try readIvfAssigned(spark, path).select(col("c_id"), col("cell"))
        .join(t, Seq("c_id"))
        .select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSeq
      catch {
        // a fully-reclaimed index (every live generation empty, so no
        // file to infer a schema from) holds no rows — no cell can hold
        // a tombstoned row; the retirement below still applies the set
        case _: org.apache.spark.sql.AnalysisException => Seq.empty[Long]
      }
    }
    val targets = (fileTargets ++ tombTargets).distinct.sorted
    if (targets.nonEmpty) {
      val nextGen = targets.map(c => c -> (gen(c) + 1L)).toMap
      val live = readIvfAssigned(spark, path, Some(targets))
      val cleaned = tombs.fold(live)(t => live.join(t, Seq("c_id"), "left_anti"))
      val genDf = broadcast(
        spark.createDataFrame(nextGen.toSeq).toDF("cell", "__g"))
      cleaned.join(genDf, Seq("cell"))
        .withColumn("g", col("__g")).drop("__g")
        // pinned count for the same reason as assignIntoIndex's write:
        // REPARTITION_BY_COL lets AQE coalesce the writers to one task
        .repartition(spark.sessionState.conf.numShufflePartitions, col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell", "g")
        .parquet(staging.toString)
      targets.foreach { c =>
        val n = nextGen(c)
        val src = new org.apache.hadoop.fs.Path(s"$staging/cell=$c/g=$n")
        val dst = new org.apache.hadoop.fs.Path(s"$assignedRoot/cell=$c/g=$n")
        // dst can pre-exist only from a crashed run that never published
        // its summary — no reader can hold it, replacing it is safe
        fs.delete(dst, true)
        if (fs.exists(src)) fs.rename(src, dst)
        // every surviving row tombstoned: the new live generation is EMPTY
        else fs.mkdirs(dst)
      }
      writeGenSummary(fs, assignedRoot, ver + 1, gens ++ nextGen)
      // prune generations superseded twice (keep = 2): g=K stays for
      // lagging readers; anything at or below K-1 has now survived a full
      // compaction cycle unreferenced
      targets.foreach { c =>
        val cd = new org.apache.hadoop.fs.Path(s"$assignedRoot/cell=$c")
        fs.listStatus(cd).map(_.getPath)
          .filter(_.getName.startsWith("g="))
          .filter(_.getName.stripPrefix("g=").toLong <= nextGen(c) - 2)
          .foreach(fs.delete(_, true))
      }
      fs.delete(staging, true)
    }
    // retire the applied tombstone set AFTER the summary is visible (the
    // reader-ordering contract above): the retired state is an empty
    // NEWER epoch — files a lagging reader resolved are never deleted
    tombs.foreach { t =>
      val next = committedTombEpochs(fs, path).lastOption.getOrElse(-1L) + 1L
      t.limit(0).coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/tombstones/epoch=$next")
      pruneTombEpochs(spark, path, keep = 2)
    }
    targets
  }

  /** Above this many distinct probed cells, [[ivfTopKIndexed]] stops
    * subsetting to the probed cells and reads every live cell directory —
    * the probe set is no longer selective enough for a per-cell path list
    * to beat the full layout.
    */
  val MaxPrunedIndexPaths = 4096

  /** Query a persisted [[buildIvfIndex]] index: probe cells against the
    * (small, broadcast) centroid table, then score ONLY the stored
    * vectors of probed cells. No assignment sweep at query time — the
    * defining win of a persisted index.
    *
    * The probed-cell set is resolved FIRST (one tiny queries×centroids
    * job, bounded by queries × nprobe) and the scan is constructed over
    * exactly those `cell=<id>` directories — so file LISTING is
    * O(probed cells), not O(all cells). Dynamic partition pruning alone
    * is not enough at index scale: it prunes which partitions are READ,
    * but the file index still lists every cell directory up front — at
    * the sf10 century tier (~30 k cells, `ClusterCentPred` seeds scale
    * with the corpus) that listing dominated the whole query
    * (`sf10_s8_query` 20.9 s for an 8-query lookup), and on an object
    * store it is 30 k LIST calls before any work. Reading only the
    * probed posting lists is what a vector store does. Probed cells with
    * no stored vectors are dropped against ONE top-level directory
    * listing (they contribute zero candidates either way); query sets
    * probing more than `maxPrunedPaths` distinct cells fall back to
    * reading every live cell directory instead.
    *
    * The scan reads each probed cell's LIVE GENERATION (newest `_gens`
    * summary — see [[compactIvfIndex]] for the reader-safe swap
    * contract) and anti-joins the live TOMBSTONE epoch
    * ([[deleteFromIvfIndex]]), so concurrent compaction never breaks a
    * resolved plan and deleted vectors are unretrievable before any
    * physical rewrite.
    *
    * `probeWidenTarget = Some(m)` turns on selectivity-aware probe
    * widening for FILTERED search: the qualifying density is estimated
    * over the base probe set and `nprobe` is widened until the expected
    * qualifying candidates per query reach `m × k` (see the inline
    * note) — the automatic form of the measured nprobe×4 remedy for
    * high-selectivity filters.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nprobe: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     candidateFilter: Option[Column] = None,
                     maxPrunedPaths: Int = MaxPrunedIndexPaths,
                     probeWidenTarget: Option[Int] = None): DataFrame = {
    val dot = nativeDot(queries)
    import scala.jdk.CollectionConverters._
    // the centroid relation is broadcast-class BY CONTRACT (it was shipped
    // whole into every probe sweep), so collect it ONCE into kernel
    // entries — round 14: the indexed query's fixed cost was 10 sub-200 ms
    // jobs + ~0.9 s of driver gaps per call (OptProbe), dominated by store
    // re-scans inside broadcast builds and the probe's window exchange
    val centEntries = collectCentEntries(spark.read.parquet(s"$path/centroids"))
    // the probe resolution, parameterized so the filtered path can widen
    // it: per-query top-p cells plus the eagerly-collected distinct cell
    // set the pruned scan is constructed over (intersected downstream
    // with the cells that actually exist on disk — an empty cell has no
    // directory; reading it would fail, skipping it is semantically
    // identical)
    def probeAt(p: Int): (DataFrame, DataFrame, Array[Long]) = {
      // MAP-ONLY probe (round 14): the top-p cell ranking runs inside the
      // native ArgTopCells kernel against the collected centroids — the
      // previous crossJoin + row_number window cost a per-query exchange
      // and a multi-stage job per probe resolution. One single-stage
      // collect returns (q_id, cell, v, n); the ranking semantics are the
      // window's (ccos DESC, cid ASC) verbatim.
      graft.functions.ArgTopCells.register(spark, centEntries, p)
      val plan = queries.select(col(idCol).as("q_id"), col(vecCol).as("v"))
        .withColumn("__tc", graft.functions.ArgTopCells(col("v")))
        .select(col("q_id"), col("v"),
          col("__tc").getField("n").as("n"),
          explode(col("__tc").getField("cells")).as("cell"))
      // ONE executed job per probe resolution: the (q_id, cell) rows are
      // |Q| × p — driver-bounded by the same contract that broadcasts
      // them into the candidate join below — so collect them once, WITH
      // the query vector and its norm (computed by the same fold the join
      // side used to recompute), and serve every downstream consumer from
      // local relations: the distinct probed-cell set, the (q_id, cell)
      // join side, and the query-vector join side. Round 13 collected
      // only (q_id, cell) and left the vector side as a plan, so each
      // branch's broadcast build re-scanned the queries source — one full
      // extra scan job per broadcast per call.
      val rows = plan.collect()
      val sch = plan.schema
      val (qi, ci, vi, ni) = (sch.fieldIndex("q_id"), sch.fieldIndex("cell"),
        sch.fieldIndex("v"), sch.fieldIndex("n"))
      val qc = spark.createDataFrame(
        rows.map(r => org.apache.spark.sql.Row(r.get(qi), r.get(ci)))
          .toList.asJava,
        org.apache.spark.sql.types.StructType(Seq(sch(qi), sch(ci))))
      // one row per query id (probe rows repeat per probed cell; a caller
      // passing duplicate query ids gets one representative row — the
      // previous shape produced interleaved per-duplicate garbage anyway)
      val seen = scala.collection.mutable.HashSet[Any]()
      val qLoc = spark.createDataFrame(
        rows.iterator.filter(r => seen.add(r.get(qi)))
          .map(r => org.apache.spark.sql.Row(r.get(qi), r.get(vi), r.get(ni)))
          .toList.asJava,
        org.apache.spark.sql.types.StructType(Seq(sch(qi), sch(vi), sch(ni))))
      (qc, qLoc, rows.map(_.getLong(ci)).distinct.sorted)
    }
    val (qCells0, qLoc0, probed0) = probeAt(nprobe)
    val assignedRoot = s"$path/assigned"
    // SELECTIVITY-AWARE PROBE WIDENING (opt-in): a highly selective
    // candidateFilter thins qualifying vectors per probed cell — at
    // 0.004 selectivity the century tier measured recall 0.75 at the
    // base nprobe and 1.0 at 4× — so instead of leaving the widening to
    // operator folklore, estimate the qualifying density over the BASE
    // probe set (one filter-pushed, column-pruned count over cells the
    // query reads anyway) and widen until the EXPECTED qualifying
    // candidates per query reach `probeWidenTarget × k`. Capped by the
    // cells on disk; a probe set past `maxPrunedPaths` falls back to the
    // full-layout read below, which is the widest read there is.
    val effNprobe = (candidateFilter, probeWidenTarget) match {
      case (Some(f), Some(m)) if probed0.nonEmpty =>
        require(m >= 1, s"probeWidenTarget must be >= 1, got $m")
        val dirs0 = liveAssignedDirs(spark, path, Some(probed0.toIndexedSeq))
        val qual: Double =
          if (dirs0.isEmpty) 0.0
          else try {
            spark.read.option("basePath", assignedRoot).parquet(dirs0: _*)
              .filter(f).count().toDouble
          } catch { // every probed live generation empty: nothing qualifies
            case _: org.apache.spark.sql.AnalysisException => 0.0
          }
        val cap = cellsOnDisk(
          hadoopFs(spark, new org.apache.hadoop.fs.Path(assignedRoot)),
          assignedRoot).length.max(nprobe)
        if (qual <= 0) cap // only a full sweep can honor the filter
        else {
          val perCellQual = qual / probed0.length
          math.ceil(m.toDouble * k / perCellQual).toInt.max(nprobe).min(cap)
        }
      case _ => nprobe
    }
    val (qCells, qLoc, probed) =
      if (effNprobe > nprobe) probeAt(effNprobe) else (qCells0, qLoc0, probed0)
    // tombstones BEFORE the generation summary — compactIvfIndex publishes
    // the rewritten generations first and retires tombstones second, so
    // this order keeps every interleaving consistent (an old tombstone
    // set masks old generations; an empty one proves the clean
    // generations are already visible)
    val tombsSized = readTombstonesSized(spark, path)
    def emptyTopK: DataFrame = rankTopK(
      queries.select(col(idCol).as("q_id"), col(idCol).as("c_id"),
        lit(0.0d).as("cos")).limit(0), k)
    val prune = probed.nonEmpty && probed.length <= maxPrunedPaths
    // live GENERATION dirs only: superseded generations stay on disk one
    // compaction cycle for lagging readers, so the scan must be
    // constructed over exactly the summary's live dirs, never a
    // recursive listing (which would double-read retained generations)
    val dirs = liveAssignedDirs(spark, path,
      if (prune) Some(probed.toIndexedSeq) else None)
    if (dirs.isEmpty)
      // nothing stored under any probed cell: zero candidates, typed
      // empty — schema derived from the caller's idCol type, so the
      // empty and populated paths union/join identically (round-11
      // ADVICE: the old spark.range form hardcoded LongType ids)
      return emptyTopK
    val assignedRead =
      try spark.read.option("basePath", assignedRoot).parquet(dirs: _*)
      catch {
        // every selected live generation dir is empty (all rows of the
        // probed cells tombstoned + reclaimed): no files, no schema —
        // semantically zero candidates
        case _: org.apache.spark.sql.AnalysisException => return emptyTopK
      }
    val assigned0 = assignedRead
      .drop("g")
      .withColumn("cell", col("cell").cast("long")) // partition col inference
    // deleted-but-not-yet-reclaimed rows: anti-join the live tombstone
    // epoch so a delete is effective IMMEDIATELY, before any rewrite.
    // Broadcast only while the set is broadcast-class by MEASURED size
    // ([[TombstoneBroadcastMaxBytes]]) — the contract bounds it by
    // deletes since the last compaction, but an unguarded broadcast()
    // hint would turn a contract violation into a query-time OOM; the
    // plain anti-join keeps the query correct (and merely slower) until
    // the next compaction retires the set
    val assignedLive = tombsSized.fold(assigned0) { case (t, bytes) =>
      if (bytes <= tombstoneBroadcastMax(spark))
        assigned0.join(broadcast(t), Seq("c_id"), "left_anti")
      else assigned0.join(t, Seq("c_id"), "left_anti")
    }
    // FILTERED search: the predicate lands on the already-cell-pruned
    // scan over `carry` metadata (parquet predicate pushdown composes
    // with the partition pruning) — candidates are filtered BEFORE
    // scoring, so top-k is over the qualifying vectors only
    val assigned = candidateFilter.fold(assignedLive)(assignedLive.filter)
    // dispatch on the STORED schema: an `int8` index holds q8 + integer
    // norms instead of float vectors (s7 integer-only scoring, queries
    // quantized on the fly, per-vector scales cancel); a `pq` index holds
    // codes + reconstruction norms and scores by ADC — per-query lookup
    // tables t[sub][cid] = q_sub · codebook[sub][cid], broadcast with the
    // queries, so each candidate costs pqM map lookups instead of a
    // dim-wide dot. Probing above always uses exact floats against the
    // float centroids either way.
    // every query-side relation below derives from the LOCAL probe rows
    // (qLoc), never from the distributed queries plan — the expressions
    // are unchanged, so values are bit-identical, but the broadcast
    // builds stop re-scanning the queries source once per branch
    val scored =
      if (assigned0.columns.contains("codes")) {
        val (cbRaw, pqM, w) = readPqCodebooks(spark, path)
        val qtab = qLoc.crossJoin(broadcast(cbRaw))
          .withColumn("t", dot(slice(col("v"), col("sub") * w + 1, lit(w)), col("cv")))
          .groupBy(col("q_id"))
          .agg(first(col("n")).as("qn"),
            map_from_entries(collect_list(struct(
              (col("sub").cast("long") * PqKeySpace + col("cid").cast("long")).as("k"),
              col("t").as("v")))).as("qtab"))
        assigned.join(broadcast(qCells), Seq("cell"))
          .filter(col("q_id") =!= col("c_id"))
          .join(broadcast(qtab), Seq("q_id"))
          .withColumn("num", aggregate(
            zip_with(col("codes"), sequence(lit(0), lit(pqM - 1)), (c, s) =>
              element_at(col("qtab"), s.cast("long") * PqKeySpace + c.cast("long"))),
            lit(0.0d), (a, x) => a + x))
          .withColumn("cos", col("num") / (col("qn") * col("rn")))
          .select(col("q_id"), col("c_id"), col("cos"))
      } else if (assigned0.columns.contains("q8")) {
        val dotI = nativeDotInt(queries)
        val qq = withQuantized(qLoc.select(col("q_id"), col("v")), "v", "qa")
          .withColumn("qan", sqrt(dotI(col("qa"), col("qa")).cast(DoubleType)))
          .select(col("q_id"), col("qa"), col("qan"))
        assigned.join(broadcast(qCells), Seq("cell"))
          .filter(col("q_id") =!= col("c_id"))
          .join(broadcast(qq), Seq("q_id"))
          .withColumn("cos",
            dotI(col("qa"), col("q8")).cast(DoubleType) / (col("qan") * col("qn")))
          .select(col("q_id"), col("c_id"), col("cos"))
      } else
        assigned.join(broadcast(qCells), Seq("cell"))
          .filter(col("q_id") =!= col("c_id"))
          .join(broadcast(qLoc.select(col("q_id"), col("v").as("qv"), col("n").as("qn"))),
            Seq("q_id"))
          .withColumn("cos", cosine(dot(col("qv"), col("v")), col("qn"), col("n")))
          .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** Two-tier retrieval over a persisted index: the (small, quantized)
    * index generates `rerankR` candidates per query, then EXACTLY
    * re-scores only those candidates against the caller's source-of-truth
    * corpus — the refine stage every production vector store pairs with a
    * quantized scan (a quantized payload trades within-neighborhood
    * resolution for bytes: at 34k-member clusters the true top-5's cosine
    * gaps are ~1e-5, below what int8 — let alone PQ codes — can resolve,
    * so the index's job is candidate GENERATION and the exact refine
    * restores the final order). Works over any stored form
    * ([[ivfTopKIndexed]] dispatches); the win is I/O: the candidate scan
    * reads the 0.18×-bytes PQ index, and the exact pass touches
    * queries × rerankR corpus rows instead of every probed vector.
    *
    * The candidate set is broadcast into ONE corpus scan (no corpus
    * shuffle). At warehouse scale, lay the corpus out clustered by id so
    * the id-join prunes row groups instead of reading every vector —
    * same contract as any id-addressed fetch.
    */
  def ivfTopKReranked(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, corpus: DataFrame, k: Int,
                      nprobe: Int, rerankR: Int = 64,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      candidateFilter: Option[Column] = None,
                      maxPrunedPaths: Int = MaxPrunedIndexPaths,
                      probeWidenTarget: Option[Int] = None): DataFrame = {
    require(rerankR >= k, s"rerankR $rerankR must be >= k $k")
    val cand = ivfTopKIndexed(spark, path, queries, rerankR, nprobe,
        idCol, vecCol, candidateFilter, maxPrunedPaths, probeWidenTarget)
      .select(col("q_id"), col("c_id"))
    val dot = nativeDot(corpus)
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = c.join(broadcast(cand), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos", cosine(dot(col("qv"), col("cv")), col("qn"), col("cn")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** One Lloyd refinement step: assign every corpus vector to its nearest
    * (max-cosine) current centroid, then replace each nonempty cell's
    * centroid with the componentwise mean of its members. The assignment is
    * the same broadcast-centroids + map-side `max_by` aggregation as the
    * query path; the mean is computed as `dim` LONG sum-aggregates in ONE
    * groupBy (map-side partial sums, one shuffle on the cell id) over
    * components scaled by `gridScale` — so the aggregation is
    * order-independent: exact when components are multiples of
    * 1/gridScale (the [[PlantedClusters]] fixture — which is what makes
    * the refined index oracle-checkable in DuckDB), and a deterministic
    * grid-quantized mean otherwise (for a coarse quantizer, determinism
    * across 1000-executor reruns is worth more than the last float ulp).
    * Cells that attract no vectors disappear — standard k-means behavior.
    */
  def refineCentroids(corpus: DataFrame, centroids: DataFrame, dim: Int,
                      gridScale: Int = 1024,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // round 14: map-only assignment via the [[graft.functions.ArgTopCells]]
    // kernel (same max_by(cid, struct(ccos, -cid)) ranking — see
    // assignIntoIndex) — the Lloyd step's per-vector argmax no longer pays
    // a crossJoin + full-corpus groupBy exchange; the one shuffle left is
    // the (cell) mean aggregate below, with map-side partial sums
    val cents = collectCentEntries(centroids.select(col("cid"), col("cv0")))
    if (cents.isEmpty)
      // no centroids: the empty (cid, cv0) frame the crossJoin produced
      return centroids.select(col("cid"), col("cv0")).limit(0)
    graft.functions.ArgTopCells.register(corpus.sparkSession, cents, 1)
    val assigned = corpus
      .select(col(vecCol).as("v"))
      .withColumn("cell", element_at(
        graft.functions.ArgTopCells(col("v")).getField("cells"), 1))
    val sums = (0 until dim).map(d =>
      sum((element_at(col("v"), d + 1) * gridScale).cast("long")).as(s"s$d"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), sums: _*)
      .select(col("cell").as("cid"),
        array((0 until dim).map(d =>
          (col(s"s$d").cast(DoubleType) / (col("cnt") * lit(gridScale.toDouble)))
            .cast("float")): _*).as("cv0"))
  }

  /** Per-vector symmetric int8 scalar quantization: `scale` = max|v_i|/127
    * and `q_i = floor(v_i/scale + 0.5)` ∈ [-127, 127] — the standard SQ8
    * embedding compression. At 100 TB this is the difference between a
    * 4-byte-float and a 1-byte corpus resident set (4× less scan, shuffle
    * and cache per vector; reconstruction error ≤ scale/2 per component).
    * `floor(x + 0.5)` instead of `round` because the two engines disagree
    * on round-half semantics while `floor` is bit-identical IEEE — the
    * whole quantization is DuckDB-replayable. Adds `out` (int array) and
    * `out_scale`.
    */
  def withQuantized(vecs: DataFrame, vecCol: String = "embedding",
                    out: String = "q8"): DataFrame = {
    val v = col(vecCol)
    val maxAbs = aggregate(v, lit(0.0d),
      (m, x) => greatest(m, abs(x.cast(DoubleType))))
    vecs.withColumn(s"${out}_scale", greatest(maxAbs, lit(1e-30d)) / 127.0d)
      .withColumn(out, transform(v,
        x => floor(x.cast(DoubleType) / col(s"${out}_scale") + 0.5d).cast("int")))
  }

  /** Integer dot product of two int-array columns as a higher-order fold
    * (exact — no FP order sensitivity at all, unlike the float path).
    * Session-less fallback and the parity twin NativeExprSpec pins the
    * codegen'd [[graft.functions.IntDotProduct]] against; the query path
    * uses the native expression.
    */
  def dotIntExact(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("long") * y)), lit(0L),
      (acc, x) => acc + x)

  /** Native integer dot bound to `df`'s session (registers, idempotent). */
  private def nativeDotInt(df: DataFrame): (Column, Column) => Column = {
    graft.functions.IntDotProduct.register(df.sparkSession)
    graft.functions.IntDotProduct(_, _)
  }

  // ---- product quantization (the `pq` stored form) ---------------------

  /** Key packing for the per-query ADC lookup map: `sub * PqKeySpace +
    * cid`. Codebook entry ids are seed RANKS (0 until pqK), so 2^20
    * bounds any realistic codebook.
    */
  private val PqKeySpace = 1L << 20

  /** Read a pq index's stored codebooks and derive (pqM, w) from them —
    * with a NAMED failure when the store is missing or empty (an empty
    * training corpus, a torn write, or a float/int8 index asked to encode
    * pq), instead of an opaque NPE off a null aggregate.
    */
  private def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                              path: String): (DataFrame, Int, Int) = {
    val cbRaw =
      try spark.read.parquet(s"$path/pq_codebooks")
      catch {
        case e: org.apache.spark.sql.AnalysisException => throw new IllegalStateException(
          s"$path holds no pq_codebooks — it was not built with storage=\"pq\" " +
            "(or the codebook write was torn); rebuild with buildIvfIndex(storage = \"pq\")", e)
      }
    // the codebooks are pqM × pqK tiny rows and every consumer broadcasts
    // them — collect once into a local relation (round 14: the previous
    // shape paid one (pqM, w) aggregate job plus a store re-scan inside
    // each consumer's broadcast build) and derive (pqM, w) from the rows
    val rows = cbRaw.collect()
    if (rows.isEmpty)
      throw new IllegalStateException(
        s"$path/pq_codebooks is empty — the quantizer trained on zero rows " +
          "(empty train corpus?); rebuild over a non-empty corpus")
    import scala.jdk.CollectionConverters._
    val si = cbRaw.schema.fieldIndex("sub")
    val ci = cbRaw.schema.fieldIndex("cv")
    val local = spark.createDataFrame(rows.toList.asJava, cbRaw.schema)
    (local, rows.map(_.getInt(si)).max + 1,
      rows.map(_.getAs[scala.collection.Seq[Float]](ci).size).max)
  }

  /** Driver-side twin of [[graft.functions.DotProductExpr]]'s fold:
    * left-to-right double accumulation over index-paired float products —
    * used to stamp codebook literals (`cn2`) with values bit-identical to
    * what the distributed expression computed before the round-14 fuse.
    */
  private def dotFoldLocal(a: scala.collection.Seq[Float],
                           b: scala.collection.Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Collect a (cid, cv0) centroid relation into (cid, cv0, cn0) entries
    * sorted ascending by cid — the referenced-object form the map-only
    * assignment/probe kernel ([[graft.functions.ArgTopCells]]) rides on.
    * The centroid table is broadcast-class BY CONSTRUCTION (it was
    * broadcast whole into every sweep), so the collect adds no driver
    * load; cn0 uses the same left fold the expression form computed.
    */
  private def collectCentEntries(cents: DataFrame)
      : IndexedSeq[(Long, Array[Float], Double)] =
    cents.select(col("cid"), col("cv0")).collect().map { r =>
      val cv = r.getAs[scala.collection.Seq[Float]](1).toArray
      (r.getLong(0), cv, math.sqrt(dotFoldLocal(cv, cv)))
    }.sortBy(_._1).toIndexedSeq

  /** Collect a (sub, cid, cv) codebook relation into per-sub entry lists
    * `(cid, cv, cn2)` sorted by cid, plus (pqM, w). The codebooks are
    * pqM × pqK tiny rows and BROADCAST-bound by construction, so the
    * collect adds no driver load the broadcast build did not already pay;
    * what it buys is literal codebook arrays the assignment/encode passes
    * fold into map-only expressions (no explode, no ×pqK join blowup, no
    * per-vector shuffle — round 14, guide §1.2 step 1 / §2.4).
    */
  private def collectPqEntries(cb: DataFrame)
      : (IndexedSeq[IndexedSeq[(Int, Array[Float], Double)]], Int, Int) = {
    val rows = cb.select(col("sub"), col("cid"), col("cv")).collect()
    require(rows.nonEmpty, "pq codebook relation is empty")
    val bySub = rows.groupBy(_.getInt(0))
    val pqM = bySub.keySet.max + 1
    require(bySub.keySet == (0 until pqM).toSet,
      s"pq codebook is missing a subspace: have subs ${bySub.keySet.toSeq.sorted}")
    val entries = (0 until pqM).map { s =>
      bySub(s).map { r =>
        val cv = r.getAs[scala.collection.Seq[Float]](2).toArray
        (r.getInt(1), cv, dotFoldLocal(cv, cv))
      }.sortBy(_._1).toIndexedSeq
    }
    (entries, pqM, entries.iterator.flatten.map(_._2.length).max)
  }


  /** Exact left-fold squared L2 distance between two float arrays:
    * `(a_k − b_k)²` accumulated in index order as doubles — the same
    * cross-engine-deterministic fold discipline as the dot product (the
    * oracle replays it verbatim), used for PQ codebook assignment where
    * subvector MAGNITUDE matters (a per-subspace cosine would quantize
    * direction only and reconstruct the wrong lengths). Session-less
    * fallback; the build paths use the codegen'd
    * [[graft.functions.L2Sq]] native expression (bit-identical —
    * NativeExprSpec pins it), because training and encoding evaluate
    * |corpus| × pqM × pqK of these folds per sweep.
    */
  def l2sqExact(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0d), (acc, d) => acc + d)

  /** Native squared-L2 bound to `df`'s session (registers, idempotent). */
  private def nativeL2Sq(df: DataFrame): (Column, Column) => Column = {
    graft.functions.L2Sq.register(df.sparkSession)
    graft.functions.L2Sq(_, _)
  }

  /** Train per-subspace PQ codebooks: split `dim` into `pqM` disjoint
    * subspaces of width `dim/pqM`, seed each subspace's codebook from
    * the `pqK` train vectors with the smallest (md5-hash, id) — the
    * same engine-portable hash as [[graft.ops.Sampling.hashUnit]], so
    * the oracle replays the identical seed ranks — then run
    * `refineIters` Lloyd steps per subspace with the grid-exact LONG-sum
    * means of [[refineCentroids]] (order-independent, DuckDB-replayable).
    * Returns (sub, cid, cv); cid is the seed rank (a codebook entry that
    * loses every training point to a twin entry with a smaller rank
    * drops out — deterministic on both engines).
    *
    * Scale shape: one broadcast of pqM×pqK tiny entries per Lloyd step,
    * one exchange on (vector, sub); the seed pick is a distributed
    * TakeOrdered of pqK rows. Training cost is |train| × pqM × pqK
    * broadcast-local scores — the sampled-train lever (`trainFraction`)
    * applies to it exactly as to the coarse quantizer.
    */
  def trainPqCodebooks(train: DataFrame, dim: Int, pqM: Int = 8, pqK: Int = 16,
                       refineIters: Int = 1, gridScale: Int = 1024,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       seedSalt: String = "pq-seed"): DataFrame = {
    require(pqM >= 1 && dim % pqM == 0,
      s"dim $dim must split into pqM $pqM equal subspaces")
    require(pqK >= 1 && pqK < PqKeySpace,
      s"pqK must be in [1, $PqKeySpace), got $pqK")
    val w = dim / pqM
    val h = graft.ops.Sampling.hashUnit(col("pid"), seedSalt)
    // seed pick: collect the pqK seed VECTORS in (hh, id) order — one
    // TakeOrdered job over pqK × dim floats, driver-trivial — and slice
    // them into per-sub entries locally; cid = seed rank, exactly the
    // row_number() − 1 the previous shape computed. Round 14: the seed
    // codebook (and every refined one) is pqM × pqK broadcast-bound rows,
    // so holding it as driver entries lets each Lloyd step run as ONE
    // map-only assignment expression + ONE (sub, cid) aggregate instead
    // of a ×pqK broadcast-join blowup followed by a full (pid, sub)
    // shuffle and a second aggregate (guide §1.2 step 1 / §2.4).
    val seedRows = train.select(col(idCol).as("pid"), col(vecCol).as("v"))
      .withColumn("hh", h).orderBy(col("hh"), col("pid")).limit(pqK)
      .select(col("v")).collect()
    if (seedRows.isEmpty)
      throw new IllegalStateException(
        "pq codebooks cannot train: the quantizer trained on zero rows " +
          "(empty train corpus?); rebuild over a non-empty corpus")
    var entries: IndexedSeq[IndexedSeq[(Int, Array[Float], Double)]] =
      (0 until pqM).map { s =>
        seedRows.toIndexedSeq.zipWithIndex.map { case (r, rank) =>
          val cv = r.getAs[scala.collection.Seq[Float]](0)
            .slice(s * w, s * w + w).toArray
          (rank, cv, dotFoldLocal(cv, cv))
        }
      }
    def entriesDf(es: IndexedSeq[IndexedSeq[(Int, Array[Float], Double)]]): DataFrame = {
      import train.sparkSession.implicits._
      es.zipWithIndex.flatMap { case (sub, s) =>
        sub.map { case (cid, cv, _) => (s, cid, cv.toSeq) }
      }.toDF("sub", "cid", "cv")
    }
    var cb: DataFrame = entriesDf(entries)
    for (_ <- 0 until refineIters) {
      cb = refinePqCodebooks(train, entries, pqM, w, gridScale, vecCol)
      entries = collectPqEntries(cb)._1
      cb = entriesDf(entries) // local relation: downstream consumers broadcast it
    }
    cb
  }

  /** One per-subspace Lloyd step: assign every train subvector to its
    * argmin-L2 entry (ties to the smaller cid), replace each nonempty
    * entry with the grid-exact componentwise mean of its members — the
    * [[refineCentroids]] discipline applied per (sub, cid). The
    * assignment is a map-only [[pqBestEntries]] expression against the
    * literal current codebook; the only shuffle is the (sub, cid) mean
    * aggregate (map-side partial sums).
    */
  private def refinePqCodebooks(train: DataFrame,
                                entries: IndexedSeq[IndexedSeq[(Int, Array[Float], Double)]],
                                pqM: Int, w: Int, gridScale: Int,
                                vecCol: String): DataFrame = {
    graft.functions.PqEncode.register(train.sparkSession, entries, w)
    val assigned = train
      .withColumn("__pqc", graft.functions.PqEncode(col(vecCol)))
      .select(explode(array((0 until pqM).map(s =>
        struct(lit(s).as("sub"),
          element_at(col("__pqc").getField("codes"), s + 1).as("cid"),
          slice(col(vecCol), s * w + 1, w).as("sv"))): _*)).as("sx"))
      .select(col("sx.sub").as("sub"), col("sx.cid").as("cid"), col("sx.sv").as("sv"))
    val sums = (0 until w).map(j =>
      sum((element_at(col("sv"), j + 1) * gridScale).cast("long")).as(s"s$j"))
    assigned.groupBy(col("sub"), col("cid"))
      .agg(count(lit(1)).as("cnt"), sums: _*)
      .select(col("sub"), col("cid"),
        array((0 until w).map(j =>
          (col(s"s$j").cast(DoubleType) / (col("cnt") * lit(gridScale.toDouble)))
            .cast("float")): _*).as("cv"))
  }

  /** Brute-force top-k over int8-QUANTIZED vectors. Cosine over the
    * reconstructed vectors collapses to pure integer arithmetic — the
    * per-vector scales cancel:
    * `cos(q̂a, q̂b) = Σ qa·qb / (sqrt(Σ qa²)·sqrt(Σ qb²))` —
    * so candidate scoring reads 1-byte-class data and multiplies ints;
    * exact floats never leave storage. Same plan shape as
    * [[bruteForceTopK]] (queries broadcast, one corpus scan); recall vs
    * the exact float ranking is the bench gate (`s7_recall`).
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dot = nativeDotInt(corpus)
    val q = withQuantized(queries.select(col(idCol).as("q_id"), col(vecCol)), vecCol)
      .select(col("q_id"), col("q8").as("qa"))
      .withColumn("qn", sqrt(dot(col("qa"), col("qa")).cast(DoubleType)))
    val c = withQuantized(corpus.select(col(idCol).as("c_id"), col(vecCol)), vecCol)
      .select(col("c_id"), col("q8").as("qb"))
      .withColumn("cn", sqrt(dot(col("qb"), col("qb")).cast(DoubleType)))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos",
        dot(col("qa"), col("qb")).cast(DoubleType) / (col("qn") * col("cn")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** Sampled cluster-mass probe: the mean nearest-neighbor cosine within a
    * deterministic ~`sampleN`-vector sample of the corpus. On a corpus
    * with cluster structure a sample this size lands several vectors per
    * big cluster, so most sampled vectors find a close sampled neighbor
    * (PlantedClusters measures ≈ 0.94); on a direction-uniform corpus the
    * sampled nearest neighbor is a near-random direction (the bench
    * `embeddings` corpus measures ≈ 0.5 at 64 dims). That separation is
    * what [[recommendIndex]] thresholds.
    *
    * Cost shape, 100 TB view: one corpus count (metadata-cheap on
    * parquet), one map-only hash filter, then an O(sampleN²) broadcast
    * self-join over ONLY the sample — corpus-size-independent work after
    * the scan. The sample is content-addressed (md5 of the id, as the
    * [[graft.ops.Sampling]] splits), so the probe is retry-safe and
    * repeatable across runs and engines.
    */
  def clusterMass(corpus: DataFrame, sampleN: Int = 256,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    require(sampleN >= 2, "need at least two sampled vectors")
    val total = corpus.count()
    if (total < 2) return 0.0
    val frac = math.min(1.0, sampleN.toDouble / total)
    val cut = (frac * graft.ops.Sampling.Space).toLong
    val dot = nativeDot(corpus)
    val s = corpus
      .filter(graft.ops.Sampling.hashUnit(col(idCol), "graft-cluster-mass") < cut)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    s.as("a").join(broadcast(s.as("b")), col("a.id") =!= col("b.id"))
      .withColumn("cos", cosine(dot(col("a.v"), col("b.v")), col("a.n"), col("b.n")))
      .groupBy(col("a.id"))
      .agg(max(col("cos")).as("nn"))
      // decimal-exact mean: a double avg would drift with partition order,
      // and a routing probe must not flip decisions across reruns
      .agg(graft.util.Exact.davg(col("nn"), graft.util.Exact.Micro))
      .collect().headOption
      // a hash sample can land < 2 vectors on a tiny corpus: no pairs, no
      // mean — report zero mass (routes to LSH, the safe default)
      .filter(!_.isNullAt(0)).map(_.getDouble(0)).getOrElse(0.0)
  }

  /** Index selection for the ANN paths: measure [[clusterMass]] and route
    * — at-or-above `threshold` the corpus has cluster structure an IVF
    * coarse quantizer can match ("ivf"); below it, cells cannot beat
    * direction-uniform buckets and multi-probe LSH is the right index
    * ("lsh"). The default threshold is the midpoint of the two gate
    * fixtures' measured masses (embeddings ≈ 0.5 uniform, PlantedClusters
    * ≈ 0.94 clustered — IndexSelectSpec pins both routes), which is
    * exactly the judgment a user could previously get wrong: pointing IVF
    * at a structureless corpus silently costs ~0.3 recall
    * (`s4_recall` 0.6 vs LSH 0.95 on the same corpus).
    *
    * Returns the choice and the measured mass (for logging/monitoring).
    * This is an offline planning decision — one driver-side double, like
    * choosing a join strategy — not a per-query code path.
    */
  def recommendIndex(corpus: DataFrame, sampleN: Int = 256,
                     threshold: Double = 0.7,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : (String, Double) = {
    val mass = clusterMass(corpus, sampleN, idCol, vecCol)
    (if (mass >= threshold) "ivf" else "lsh", mass)
  }

  /** IVF-flat with Lloyd-refined centroids: seed cells from `centroidPred`
    * (a sampling predicate — the init every IVF build starts from), run
    * `refineIters` refinement sweeps, then query as [[ivfTopKFrom]]. Each
    * sweep is one corpus pass (broadcast centroids, two shuffles); one
    * sweep is usually enough to snap sampled seeds onto cluster structure
    * when the corpus has any — see PlantedClusters for the gate fixture.
    */
  def ivfTopKRefined(queries: DataFrame, corpus: DataFrame, k: Int,
                     centroidPred: String, nprobe: Int, dim: Int,
                     refineIters: Int = 1, gridScale: Int = 1024,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rankTopK(ivfRefinedScored(queries, corpus, centroidPred, nprobe, dim,
      refineIters, gridScale, idCol, vecCol), k)

  /** Scored relation behind [[ivfTopKRefined]] (for recall + candidate-
    * fraction measurement).
    */
  def ivfRefinedScored(queries: DataFrame, corpus: DataFrame,
                       centroidPred: String, nprobe: Int, dim: Int,
                       refineIters: Int = 1, gridScale: Int = 1024,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var cents = corpus.filter(centroidPred)
      .select(col(idCol).as("cid"), col(vecCol).as("cv0"))
    for (_ <- 0 until refineIters)
      cents = refineCentroids(corpus, cents, dim, gridScale, idCol, vecCol)
    ivfScoredFrom(queries, corpus, cents, nprobe, idCol, vecCol)
  }
}
