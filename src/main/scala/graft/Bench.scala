package graft

import graft.dipa.Detect
import graft.fixtures.Fixtures
import graft.streaming.DetectionStream
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query at the configured SF, plus
  * the BASELINE.md headline — one 7500-flow poll snapshot through the full
  * detection pipeline (target ≪ 2 s, thesis §6.2.3 poll budget).
  *
  * Failures are recorded per query in the emitted JSON (never swallowed as
  * a fake fast time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    import spark.implicits._

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        errors += name -> e.toString.takeWhile(_ != '\n').take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup: JVM/codegen/session init otherwise lands on whichever
    // query the map yields first, distorting its number
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // clearCache between queries: dedup persists its shingle frame; without
    // the clear, a later query touching the same plan would read a cache the
    // earlier query paid for, making per-query times order-dependent
    val queryTimes = SparkEntry.queries.map { case (name, fn) =>
      val t = timed(name) { fn(spark, sfDir).count(); () }
      spark.catalog.clearCache()
      t
    }

    // untimed: ANN recall vs the s1 exact ground truth — the scale gate for
    // the multi-probe LSH geometry (target >= 0.9 at the bench sf); the IVF
    // number is reported for transparency (on this near-uniform corpus IVF
    // cells can't concentrate true neighbors, so its recall is the honest
    // cost of probing nprobe/C of the corpus)
    val recall = Seq("s3_recall" -> "s3_lsh_topk", "s4_recall" -> "s4_ivf_topk")
      .map { case (metric, query) =>
        try {
          val s1 = SparkEntry.queries("s1_ann_topk")(spark, sfDir).select("q_id", "c_id")
          val a = SparkEntry.queries(query)(spark, sfDir).select("q_id", "c_id")
          val r = a.join(s1, Seq("q_id", "c_id"), "left_semi").count().toDouble / s1.count()
          spark.catalog.clearCache()
          metric -> r
        } catch { case e: Throwable =>
          errors += metric -> e.toString.takeWhile(_ != '\n').take(200)
          metric -> -1.0
        }
      }

    // BASELINE.md headline: full detection over a 7500-benign-flow,
    // 500-bot poll history (fixture generation + caching excluded)
    val sc = Fixtures.scenario(Fixtures.ScenarioParams(nBenignFlows = 7500, nBots = 500))
    val flows = sc.flows.toDF().cache()
    flows.count() // materialize outside the timed section
    val detectTimes = Seq(
      timed("detect_7500_batch") { Detect.detect(flows).count(); () },
      timed("detect_7500_stream") {
        DetectionStream.alerts(flows.as[graft.model.FlowStat]).count(); ()
      })

    // sustained micro-batch run: one poll per trigger through the live
    // streaming query; the per-poll mean must stay under the 2 s poll
    // budget for the pipeline to keep up (BASELINE.md §Targets)
    val polls = sc.flows.groupBy(_.poll_id).toSeq.sortBy(_._1).map(_._2)

    // warm the streaming plan (state-store init, codegen, shuffle setup) on a
    // throwaway query over the first poll: the thesis's no-backlog condition
    // is "every poll under 2 s", so the timed max must not be the one-time
    // plan/codegen cost the first trigger would otherwise pay
    locally {
      val warm = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
        graft.model.FlowStat](spark)
      val wq = DetectionStream.alerts(warm.toDS()).writeStream
        .format("noop").outputMode("update").start()
      warm.addData(polls.head)
      wq.processAllAvailable()
      wq.stop()
    }

    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      graft.model.FlowStat](spark)
    val q = DetectionStream.alerts(stream.toDS()).writeStream
      .format("noop").outputMode("update").start()
    val perPoll = polls.map { rows =>
      val t0 = System.nanoTime()
      stream.addData(rows)
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    q.stop()
    val sustained = Seq(
      "detect_poll_mean" -> perPoll.sum / perPoll.size,
      "detect_poll_max" -> perPoll.max)

    // sf1 scale-cliff probe: the dedup/sim suite once at 10x the bench SF
    // (generated on first run into target/sf1 — replica-disjoint vocab so
    // output grows linearly; see ScaleProbe). A query whose sf1 time blows
    // past ~15x its sf0.1 time has a scale bug the 100x cluster would hit.
    val sf1Times: Seq[(String, Double)] =
      if (sys.env.get("SPARK_GRAFT_SF1").contains("0")) Nil
      else try {
        val sf1Dir = new java.io.File("target/sf1").getAbsolutePath
        graft.fixtures.ScaleProbe.ensure(spark, sfDir, sf1Dir)
        Seq("d1_exact_dedup", "d2_jaccard_pairs", "d3_minhash_lsh",
            "d4_simhash_pairs", "s1_ann_topk", "s2_cosine_pairs_blocked",
            "s3_lsh_topk", "s4_ivf_topk", "s5_lsh_pairs").map { name =>
          val t = timed("sf1_" + name) {
            SparkEntry.queries(name)(spark, sf1Dir).count(); ()
          }
          spark.catalog.clearCache()
          t
        }
      } catch { case e: Throwable =>
        errors += "sf1_probe" -> e.toString.takeWhile(_ != '\n').take(200)
        Nil
      }

    val results = queryTimes.toSeq ++ recall ++ detectTimes ++ sustained ++ sf1Times
    def jq(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString(",\"errors\":{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
