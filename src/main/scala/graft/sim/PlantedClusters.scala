package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Planted-mixture embedding fixture: KC seeded cluster centers + per-point
  * noise, derived deterministically IN-ENGINE from a vector id. Gives the
  * ANN indexes a corpus with real cluster structure to exploit — the
  * near-uniform `embeddings` table can make NO cell-based index look good
  * (its true neighbors sit at cos 0.33-0.45, near-random directions), so
  * recall numbers measured on it under-inform. Recall gates for IVF run on
  * this fixture; the uniform corpus stays as the adversarial case.
  *
  * Everything lives on the 1/[[Grid]] grid: each component is
  * (center + noise)/1024 with integer center ∈ [-512, 512) and integer
  * noise ∈ [-128, 128), both from the shared LCG. Consequences:
  *  - components are exact in FLOAT (≤10 mantissa bits), identical in
  *    Spark and DuckDB, so the fixture needs no parquet file — both
  *    engines derive it from `vec_id` alone;
  *  - component sums scale to exact BIGINTs (×1024), which is what makes
  *    the Lloyd centroid means in [[Similarity.refineCentroids]] order-
  *    independent and therefore oracle-checkable (see that scaladoc);
  *  - within-cluster cosine ≈ 0.94 (center var 1/12/dim vs noise var
  *    1/192/dim), cross-cluster ≈ 0 — true top-k neighbors share the
  *    cluster, so recall against the brute-force ground truth measures
  *    what an index is supposed to find.
  */
object PlantedClusters {

  val KC = 32
  val Dim = 64
  val Grid = 1024

  /** Disjoint LCG stream for noise: center stream uses flat indexes
    * < KC*Dim, noise starts at this salt. The LCG argument is
    * mod-P-reduced BEFORE the multiply, so products stay inside 62 bits
    * for ANY long id (the unreduced form overflowed at the sf10 century
    * probe's ~10^9 ids); for arguments below P the reduction is a no-op,
    * so every oracle- and bench-scale vector is bit-identical to the
    * pre-reduction form.
    */
  val NoiseSalt = 1048576L

  private val P = 2147483647L
  private def lcg(x: Long): Long = (1103515245L * x + 12345L) % P

  /** KC x Dim center components, ints in [-512, 512) — compile-time
    * constants shared verbatim with the DuckDB twin.
    */
  val centers: Seq[Seq[Long]] =
    (0 until KC).map(cl => (0 until Dim).map(d => lcg(cl.toLong * Dim + d + 1) % 1024 - 512))

  /** The planted vector for an id column, as array<float>:
    * component d = (center[id % KC][d] + noise(id, d)) / Grid with
    * noise(id, d) = lcg(id*Dim + d + 1 + NoiseSalt) % 256 - 128.
    */
  def vecCol(id: Column): Column = {
    // select the center row ONCE and zip it with the noise array — inlining
    // the 32x64 center literal into each of the 64 components instead
    // multiplies the generated code by Dim and stalls codegen
    val row = element_at(typedLit(centers), ((id % KC) + 1).cast("int"))
    val noise = array((0 until Dim).map { d =>
      (lit(1103515245L) * ((id * Dim + lit(d + 1) + NoiseSalt) % P)
        + lit(12345L)) % P % 256 - 128
    }: _*)
    zip_with(row, noise, (c, n) => ((c + n) / lit(Grid.toDouble)).cast(FloatType))
  }

  /** DuckDB twin of [[vecCol]] for an id expression (same centers, same
    * LCG, same grid — bit-identical FLOAT components).
    */
  def sqlVec(idExpr: String): String = {
    val cents = centers.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""list_transform(range(1, ${Dim + 1}), k ->
       |    ((($cents)[(($idExpr) % $KC) + 1][k]
       |      + ((1103515245 * ((($idExpr) * $Dim + k + $NoiseSalt) % $P) + 12345) % $P) % 256 - 128)
       |     / $Grid.0)::FLOAT)""".stripMargin
  }
}
