package ptx

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent driver-job submission for INDEPENDENT sink writes (r12,
  * VERDICT r11 #3): a foreachBatch body that runs its per-gate audit
  * writes sequentially pays one driver-job latency PER WRITE even though
  * the jobs touch disjoint outputs and share no lineage beyond the cached
  * batch. Spark's scheduler overlaps concurrently-submitted jobs across
  * the executor pool (FIFO within it), so at micro-batch sizes — where
  * fixed per-job cost dominates data cost — the batch's wall time drops
  * from sum(jobs) toward max(jobs).
  *
  * Failure contract: every job is awaited and the FIRST failure rethrows
  * on the caller's thread, so a foreachBatch retry still sees the batch
  * fail loudly (the sinks are batch-scoped overwrites — a half-written
  * concurrent sibling is replaced on replay, the same idempotency the
  * sequential form relied on). Only use for jobs with no ordering
  * dependency; anything reading another job's output must stay after the
  * `par` call.
  */
object Jobs {
  def par(jobs: (() => Unit)*): Unit = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val started = jobs.map(j => Future(j()))
    // await ALL (not failing fast) so no job is still writing when the
    // caller proceeds to reads or to the next batch; then rethrow the
    // first failure
    val outcomes = started.map(f => Await.ready(f, Duration.Inf).value.get)
    outcomes.collectFirst { case scala.util.Failure(e) => throw e }
  }
}
