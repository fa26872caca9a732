package graft.fixtures

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Probe-data integrity for the scale tiers — the linear-output claims
  * the sf1/sf10 bench rows rest on: replica-disjoint token vocabularies
  * (no cross-replica near-dup pairs), norm/cosine-preserving vector
  * transforms (rotation; reversal+rotation past one 64-cycle so r and
  * r+64 stay distinct), and marker-based idempotent generation.
  */
class ScaleProbeSpec extends SparkSpec {

  import spark.implicits._

  test("replicas preserve vector norms and stay distinct past one rotation cycle") {
    val root = Files.createTempDirectory("probe").toString
    val src = s"$root/src"
    // 8 deterministic 64-dim vectors, none palindromic
    val vecs = (0L until 8L).map { i =>
      (i, (0 until 64).map(d => ((i * 31 + d * 7 + 1) % 13).toFloat / 13f).toArray, i % 4)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.parquet(s"$src/embeddings.parquet")
    (0L until 8L).map(i => (i, s"tok${i}a tok${i}b tok${i}c tok${i}d", "en", s"src$i", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$src/documents.parquet")

    val out = s"$root/out"
    // 70 replicas: crosses the 64-rotation cycle so the reversal tier engages
    ScaleProbe.ensure(spark, src, out, replicas = 70, withEvents = false)

    val emb = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    assert(emb.size == 8 * 70)
    def norm(v: Array[Float]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    for (i <- 0L until 8L; r <- Seq(0, 1, 63, 64, 69)) {
      val rep = emb(i + r * ScaleProbe.IdStride)
      assert(rep.length == 64)
      assert(math.abs(norm(rep) - norm(emb(i))) < 1e-5, s"norm drift at replica $r")
    }
    // replica 0 is verbatim; r and r+64 share the rotation offset but the
    // r+64 tier is reversed first — must differ for non-palindromic vectors
    for (i <- 0L until 8L) {
      assert(emb(i + 0 * ScaleProbe.IdStride).toSeq == emb(i).toSeq)
      assert(emb(i + 64 * ScaleProbe.IdStride).toSeq != emb(i).toSeq,
        s"replica 64 of vec $i collapsed onto replica 0")
      assert(emb(i + 65 * ScaleProbe.IdStride).toSeq != emb(i + 1 * ScaleProbe.IdStride).toSeq,
        s"replica 65 of vec $i collapsed onto replica 1")
    }

    // token vocabularies are replica-disjoint: suffixed tokens never
    // collide across replicas, so near-dup structure replicates instead
    // of cross-linking
    val toks = spark.read.parquet(s"$out/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"),
        (col("doc_id") / ScaleProbe.IdStride).cast("int").as("r"))
    val crossReplica = toks.groupBy("tok").agg(countDistinct("r").as("nr"))
      .filter(col("nr") > 1).count()
    assert(crossReplica == 0L)

    // idempotence: a second ensure with the same (src, replicas) is a no-op
    val mtime = Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$out/_PROBE_SRC"))
    ScaleProbe.ensure(spark, src, out, replicas = 70, withEvents = false)
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$out/_PROBE_SRC")) == mtime)
  }
}
