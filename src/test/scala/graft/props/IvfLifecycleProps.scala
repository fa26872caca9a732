package graft.props

import graft.SparkTestSession
import graft.sim.{PlantedClusters, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** CHAOS property for the persisted-index lifecycle (the round-11 ask,
  * applied the way CurationStreamSpec's 50-case epoch property retired the
  * pruneEpochs race): arbitrary interleavings of APPEND / DELETE /
  * COMPACT, with a full visibility read after every op and a LAGGING
  * reader resolved at a random point and collected at the end.
  *
  * The model mirrors the delete lifecycle exactly: `present` is the
  * physical row set, `liveTombs` the un-retired tombstone set, and the
  * VISIBLE set is `present − liveTombs`. A delete tombstones its ids
  * (present or not — a tombstone for an absent id is harmless and masks
  * a later append of that id until retirement); a compaction reclaims
  * `present ∩ liveTombs` and RETIRES the set — after which the id is
  * appendable again (a delete is not a forever-ban; this property's
  * first shrunk counterexample was the MODEL getting that wrong, not
  * the engine).
  *
  * Invariants pinned, per interleaving:
  *  - after every op, the index's visible id set equals the model's
  *    `present − liveTombs` (deletes mask IMMEDIATELY, before any
  *    rewrite; compaction changes answers never);
  *  - a lagging plan resolved mid-sequence answers EXACTLY its
  *    resolve-time model for as long as at most ONE compaction has run
  *    since it resolved — that is the keep = 2 guarantee, and inside
  *    that window an exception is a FAILURE of this property (round-12
  *    ADVICE: tolerating any Throwable unconditionally would let a
  *    regression that breaks lagging readers after a single compaction
  *    pass); beyond one full cycle, exact-or-loud is the contract —
  *    never a silently partial or resurrected answer;
  *  - after a final compaction, the PHYSICAL row set equals the model
  *    too (tombstoned rows reclaimed, nothing else lost).
  *
  * Spark-backed, so the case count is small; the deterministic
  * IvfIndexSpec tests cover the targeted single-interleaving pins.
  */
object IvfLifecycleProps extends Properties("graft.ivf.lifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  private val Dim = 64
  private val AllIds: Seq[Long] = 0L until 48L
  private val InitIds: Seq[Long] = AllIds.filter(_ % 2 == 0)
  private val NProbe = 8 // >= centroid count: every cell probed

  private sealed trait Op
  private case class Append(seed: Int) extends Op
  private case class Delete(seed: Int) extends Op
  private case object Compact extends Op
  private case object ResolveLagging extends Op

  private val genOps: Gen[List[Op]] = for {
    n <- Gen.choose(3, 6)
    ops <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0, 1 << 20).map(Append),
      3 -> Gen.choose(0, 1 << 20).map(Delete),
      2 -> Gen.const(Compact),
      1 -> Gen.const(ResolveLagging)))
  } yield ops

  /** Deterministic subset pick: roughly a third of `from`, seeded. */
  private def pick(from: Seq[Long], seed: Int): Seq[Long] =
    from.filter(id => ((id * 2654435761L + seed) & 0x7fffffffL) % 3 == 0)

  private def vectors(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("vec_id")
      .select(col("vec_id"), PlantedClusters.vecCol(col("vec_id")).as("embedding"))
  }

  /** One off-corpus probe vector; k and nprobe sized so EVERY visible
    * corpus row comes back — the full visibility read.
    */
  private def visible(path: String): Set[Long] =
    Similarity.ivfTopKIndexed(spark, path, vectors(Seq(999999L)),
        k = 1000, nprobe = NProbe)
      .select("c_id").collect().map(_.getLong(0)).toSet

  property("any append/delete/compact interleaving keeps reads exact; lagging readers never lie") =
    forAll(genOps) { ops =>
      val path = java.nio.file.Files.createTempDirectory("ivfchaos").toString
      Similarity.buildIvfIndex(vectors(InitIds), "vec_id % 8 = 0", Dim, path)
      var present = InitIds.toSet // physical rows
      var liveTombs = Set.empty[Long] // un-retired tombstones
      var everTouched = InitIds.toSet // never re-append an id
      def modelVisible: Set[Long] = present -- liveTombs
      // (resolved plan, its resolve-time expected set)
      var lagging: Option[(org.apache.spark.sql.DataFrame, Set[Long])] = None
      // compactions that ran since the lagging plan resolved — the
      // keep = 2 contract promises exact answers through ONE full cycle
      var compactsSinceResolve = 0
      var ok = true
      ops.foreach { op =>
        op match {
          case Append(seed) =>
            val ids = pick((AllIds.toSet -- everTouched).toSeq.sorted, seed)
            if (ids.nonEmpty) {
              Similarity.appendToIvfIndex(vectors(ids), path)
              present ++= ids
              everTouched ++= ids
            }
          case Delete(seed) =>
            // may include absent and already-tombstoned ids — both must
            // be harmless tombstones (an absent id's tombstone masks a
            // later append of it until retirement)
            val ids = pick(AllIds, seed)
            if (ids.nonEmpty) {
              Similarity.deleteFromIvfIndex(spark, path, vectors(ids).select("vec_id"))
              liveTombs ++= ids
            }
          case Compact =>
            Similarity.compactIvfIndex(spark, path)
            // reclaim + retire: tombstoned rows leave, the set retires
            present --= liveTombs
            liveTombs = Set.empty
            compactsSinceResolve += 1
          case ResolveLagging =>
            val df = Similarity.ivfTopKIndexed(spark, path,
              vectors(Seq(999999L)), k = 1000, nprobe = NProbe)
            df.inputFiles // force file-list resolution NOW
            lagging = Some((df, modelVisible))
            compactsSinceResolve = 0
        }
        ok = ok && visible(path) == modelVisible
      }
      // the lagging reader, collected under whatever elapsed since its
      // resolve: INSIDE the keep = 2 window (at most one compaction) the
      // answer must be exact and an exception is a property failure;
      // past one full cycle, exact-or-loud — never silently partial or
      // resurrected
      val laggingOk = lagging.forall { case (df, expected) =>
        try df.select("c_id").collect().map(_.getLong(0)).toSet == expected
        catch { case _: Throwable => compactsSinceResolve > 1 }
      }
      // final reclaim: physical rows == model (unless nothing is left —
      // an all-deleted index reads as typed-empty, checked via visible)
      Similarity.compactIvfIndex(spark, path)
      present --= liveTombs
      liveTombs = Set.empty
      val physicalOk =
        if (present.isEmpty) visible(path).isEmpty
        else Similarity.readIvfAssigned(spark, path)
          .select("c_id").collect().map(_.getLong(0)).toSet == present
      ok && laggingOk && physicalOk && visible(path) == present
    }
}
