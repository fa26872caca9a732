package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dipa.Classify
import graft.streaming.StateMachines.{TriggerObs, TriggerState}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** C7 closed in the LIVE stream (SURVEY.md §7.5.1): consumed collaboration
  * alerts update a per-domain classifier config, and packets in SUBSEQUENT
  * micro-batches are classified under the refreshed config — the
  * reference's `self.protoTrig`/`self.collabTrig` controller state
  * (`ryu/src/deployed_controller/DIPA_Controller.py:123-126` init, `:270`
  * read on every packet-in) re-expressed for a micro-batch engine.
  *
  * Spark streams are DAGs, not cycles, so the feedback edge lives OUTSIDE
  * the plan: a driver-held config ref. The alert leg folds
  * `StateMachines.triggerStep` into the ref once per micro-batch
  * (`foreachBatch` runs on the driver); the packet leg builds each
  * micro-batch's classification plan with the trigger literals read at
  * batch start. Loop latency is exactly one micro-batch — an alert
  * consumed while batch N is in flight relabels traffic from batch N+1
  * on, which is the reference's poll-granular behavior. The C7 state
  * machine itself (`StateMachines.triggers` + the `c7_trigger_fold`
  * oracle row) stays the checkpointed source of truth for replays; this
  * object is the live wiring.
  */
object ClassifierLoop {

  /** Driver-held per-domain trigger state. Both `foreachBatch` callbacks
    * execute on the driver, so one AtomicReference is the entire
    * synchronization story — nothing is shipped to executors except the
    * literals baked into each batch's plan.
    */
  final class ConfigRef {
    private val ref = new AtomicReference(Map.empty[String, TriggerState])
    def get(domain: String): TriggerState =
      ref.get.getOrElse(domain, TriggerState(None, None))
    private[streaming] def fold(obs: Seq[TriggerObs]): Unit = {
      ref.updateAndGet { m =>
        obs.sortBy(_.seq).foldLeft(m) { (acc, o) =>
          val st = acc.getOrElse(o.domain, TriggerState(None, None))
          acc.updated(o.domain, StateMachines.triggerStep(st, o)._1)
        }
      }
      ()
    }
  }

  /** Alert leg: fold decoded foreign alerts (domain, ip, label) into the
    * config. A CNC election or a lockdown-percentage broadcast focuses
    * subsequent classification on telnet (the reference's CNC/lockdown
    * arms are telnet blocks, `DIPA_Controller.py:399-415`); BOT alerts
    * install rules but do not touch the classifier. The collect is on the
    * alert plane — tiny frames, same single-writer rationale as
    * `AlertLog.sink`, never the data plane. The `.distinct()` bounds the
    * driver transfer by (domain, label) cardinality instead of alert
    * volume: within one batch every duplicate row folds the identical
    * TriggerObs (same batchId seq), and `triggerStep` is idempotent on a
    * repeated observation, so dropping duplicates is semantics-free.
    */
  def consumeTriggers(alerts: DataFrame, ref: ConfigRef,
                      checkpoint: String): StreamingQuery =
    alerts.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val obs = batch.select("domain", "label").distinct().collect().toSeq.flatMap { r =>
          val label = r.getAs[String]("label")
          // null-safe: a malformed foreign alert with no label must be
          // ignored, not NPE the query (which would silently freeze the
          // classifier config)
          val telnetFocus = label != null &&
            (label == "CNC" || label.toDoubleOption.isDefined)
          if (telnetFocus)
            Some(TriggerObs(r.getAs[String]("domain"), batchId,
              proto_trig = None, collab_trig = Some("Telnet")))
          else None
        }
        if (obs.nonEmpty) ref.fold(obs)
      }
      .start()

  /** Packet leg: label each micro-batch under the config read at batch
    * start. `out` receives the labeled batch (tests buffer it; production
    * feeds `FlowInstall.flowRules`). The `when`-ladder literals change
    * between batches, never within one — each batch is one deterministic
    * codegen'd plan.
    */
  def classifyLive(packets: DataFrame, domain: String, ref: ConfigRef,
                   checkpoint: String)(out: (DataFrame, Long) => Unit): StreamingQuery =
    packets.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val cfg = ref.get(domain)
        out(batch.withColumn("protocol",
          Classify.protocol(col("ip_proto"), col("dst_port"), cfg.proto, cfg.collab)),
          batchId)
      }
      .start()
}
