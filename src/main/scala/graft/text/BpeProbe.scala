package graft.text

/** Throwaway diagnostic: accepted-batch-size trajectory of
  * [[BpeTrain.learnBatched]] (mode `batched`) vs the epoch-synchronized
  * [[BpeTrain.learnEpoch]] (mode `epoch`) as merge count grows —
  * evidence for where each mode's batching win materializes
  * (PLANS.md known-costs). Usage: BpeProbe [sfDir] [merges] [mode] [batch].
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = if (args.length > 1) args(1).toInt else 512
    val mode = if (args.length > 2) args(2) else "batched"
    val batch = if (args.length > 3) args(3).toInt else 64
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "bpe-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val (rules, stats) = mode match {
      case "epoch" => BpeTrain.learnEpochStats(docs, merges, batch = batch)
      case _       => BpeTrain.learnBatchedStats(docs, merges, maxBatch = batch)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"mode=$mode merges=${rules.length} rounds=${stats.rounds} " +
      f"meanBatch=${stats.meanBatch}%.2f wall=$dt%.1f s")
    spark.stop()
  }
}
