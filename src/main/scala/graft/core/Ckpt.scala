package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.SparkPlan

/** The engine's only localCheckpoint entry point.
  *
  * `df.ckpt(...)` behaves exactly like `df.localCheckpoint(...)` — a
  * lineage cut that materializes once and is shared by every consumer —
  * with one addition: when `recording` is on (PlanAuditSpec only), the
  * PRE-checkpoint physical plan is captured into a buffer before the cut.
  *
  * Why: a checkpoint truncates the audited plan at a LogicalRDD boundary,
  * so a query that checkpoints an intermediate frame would otherwise be
  * INVISIBLE to the scale audit (no-cartesian / BNLJ-registry /
  * dimension-shuffle checks) for everything upstream of the cut — the
  * audit would pass not because the plan is clean but because it cannot
  * see it. With recording on, the audit walks every captured segment too,
  * so "every BNLJ must register its bound" holds across checkpoints.
  *
  * Production cost when `recording` is false (always, outside the audit):
  * one volatile read. The captured plan is `executedPlan`, which
  * localCheckpoint plans anyway — recording adds no planning work.
  */
object Ckpt {

  @volatile var recording: Boolean = false

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]()

  /** Remove and return every (call-site, plan) captured since last drain. */
  def drain(): Seq[(String, SparkPlan)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, SparkPlan)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toSeq
  }

  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    def ckpt(eager: Boolean = true): Dataset[T] = {
      if (recording) {
        // call-site tag: first stack frame outside this wrapper
        val site = Thread.currentThread.getStackTrace
          .find(f => f.getClassName.startsWith("graft") &&
            !f.getClassName.contains("core.Ckpt"))
          .map(f => s"${f.getFileName}:${f.getLineNumber}")
          .getOrElse("unknown")
        buf.add(site -> ds.queryExecution.executedPlan)
      }
      ds.localCheckpoint(eager)
    }
  }
}
