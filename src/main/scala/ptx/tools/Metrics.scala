package ptx.tools

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability surface: a QueryExecutionListener that records per-query
  * physical-plan metrics (output rows, scan/shuffle activity) so plan
  * regressions — a lost pushdown, an unexpected exchange — can be asserted
  * programmatically, not just eyeballed in explain output.
  *
  * Scale note: listeners run on the driver on query completion; recording
  * is O(plan size), never touches executor data paths.
  */
class MetricsListener extends QueryExecutionListener {
  /** `plan` is the recorded execution's executedPlan object — listener
    * delivery is ASYNC on a shared bus, so a consumer that installs a
    * fresh listener can still receive a LAGGING event from an earlier
    * query; matching `plan eq df.queryExecution.executedPlan` attributes
    * a snapshot to the exact execution measured (r19 — the plan-budget
    * spec read a neighbor's exchange count through that race). */
  case class QueryMetrics(name: String, durationNs: Long, numExchanges: Int,
                          numScans: Int, outputRows: Option[Long],
                          plan: AnyRef)

  private val recorded = mutable.ArrayBuffer.empty[QueryMetrics]

  def snapshot: Seq[QueryMetrics] = recorded.synchronized(recorded.toSeq)
  def clear(): Unit = recorded.synchronized(recorded.clear())

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    // AdaptiveSparkPlanExec hides its subtree from TreeNode.collect, but its
    // rendered tree (with the final adaptive plan) includes every node —
    // count node lines, which is stable across plan wrappers.
    // AQE renders "== Final Plan ==" followed by "== Initial Plan ==";
    // count only the final plan or every node would be counted twice
    val full = qe.executedPlan.toString
    val rendered = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    val lines = rendered.linesIterator.toSeq
    val exchanges = lines.count(l => l.contains("Exchange") && !l.contains("ReusedExchange"))
    val scans = lines.count(_.contains("Scan "))
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    recorded.synchronized {
      recorded += QueryMetrics(funcName, durationNs, exchanges, scans, rows,
        qe.executedPlan)
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
}

object Metrics {
  /** Installs and returns a listener on the session. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
