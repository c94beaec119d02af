package ptx

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped guard for operator-internal caches.
  *
  * Some operators (`llm_dedup_near`, `llm_dedup_minhash_lsh`,
  * `llm_dedup_simhash`) persist an intermediate frame because several
  * consumers prune different columns, which defeats exchange reuse. The
  * operator cannot unpersist it itself — the returned frame is lazy and the
  * cache must live until the CALLER materializes it. Left alone, each
  * invocation would leak one cached frame for the session lifetime
  * (ADVICE r1). So instead of calling `.persist` directly, operators `pin`
  * the frame here and the caller releases once the action is done:
  * `release(spark)` drops only that session's pins (safe for concurrent
  * library users sharing a JVM — ADVICE r2), `releaseAll()` drops every
  * session's (the single-session harness shorthand used by Verify/Bench).
  * Unpersist of a frame mid-use is safe in Spark (it just recomputes), so a
  * missed or early release can cost time, never correctness.
  */
object Caching {
  private val pinned = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()
  private val checkpointed = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release,
    * keyed by its owning session. */
  def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(df)
    df
  }

  /** Eagerly localCheckpoint `df` (materialize once + re-root the logical
    * plan) and register the materialized RDD blocks for release with this
    * session's pins. Unlike `pin`, a released checkpoint CANNOT be
    * recomputed — localCheckpoint truncates lineage — so callers must be
    * done with every frame derived from it before release (the harness
    * contract: release only after the query's action completes; a fresh
    * operator invocation rebuilds from scratch). Without this hook the
    * checkpoint blocks outlive releaseAll() until a GC triggers the
    * ContextCleaner, skewing later queries' timed runs. */
  def checkpoint(df: DataFrame): DataFrame =
    registerCheckpoint(df.localCheckpoint(true), df.sparkSession)

  /** LAZY variant of [[checkpoint]]: re-root the plan now, materialize on
    * the caller's NEXT action over the returned frame. For loops that need
    * both the materialization and a scalar probe of the same round (e.g.
    * clusterPairs' changed-label count): `checkpointLazy(df)` followed by
    * one aggregating action materializes the blocks AND answers the probe
    * in a single Spark job, where the eager form pays one job to
    * materialize and a second to probe — and the loop's cost is sequential
    * DRIVER-JOB latency, not data (VERDICT r10 #1). Registered for release
    * exactly like the eager form; the same cannot-recompute-after-free
    * contract applies once materialized. */
  def checkpointLazy(df: DataFrame): DataFrame =
    registerCheckpoint(df.localCheckpoint(false), df.sparkSession)

  private def registerCheckpoint(cp: DataFrame,
                                 session: SparkSession): DataFrame = {
    val rdds = cp.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val q = checkpointed.computeIfAbsent(session,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.rdd.RDD[_]]())
    rdds.foreach(q.add)
    cp
  }

  /** Eagerly unpersist ONE checkpointed frame's materialized blocks, now,
    * and drop them from the session registry. For iterative operators
    * (clusterPairs' label propagation) where round r-1's blocks are dead
    * the moment round r is materialized: without this, up to
    * MaxPropagationRounds node-sized RDDs stay pinned until releaseAll —
    * O(rounds × nodes) executor storage held for nothing at the 100 TB
    * design point (ADVICE r4). Caller contract: nothing downstream may
    * re-read `df` after free (checkpoint blocks cannot be recomputed). */
  def free(df: DataFrame): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val q = checkpointed.get(df.sparkSession)
    rdds.foreach { r =>
      if (q != null) q.remove(r)
      r.unpersist(blocking = false)
    }
  }

  /** Unpersist every frame pinned by `session` (non-blocking — the
    * streaming gates release per micro-batch and must not stall on block
    * removal). */
  def release(session: SparkSession): Unit = {
    drain(pinned.remove(session), blocking = false)
    drainRdds(checkpointed.remove(session), blocking = false)
  }

  /** Unpersist every pinned frame across all sessions and clear the
    * registry. Harness use (one session per JVM); library users sharing a
    * JVM should prefer `release(session)`.
    *
    * BLOCKING (r18, bench-protocol fix): the harness calls this BETWEEN
    * timed runs, and a non-blocking unpersist leaves block removal to an
    * async block-manager thread that can land INSIDE the next timed run —
    * the r18 baseline sweep showed 2-3× median-over-min inflation on the
    * cache-heavy llm_dedup_* block that never reproduces in isolation
    * (llm_dedup_minhash_lsh 2.70 s sweep median vs 0.79 s isolated, same
    * code). Blocking moves that eviction work into the untimed gap, where
    * the harness's GC tick already lives. */
  def releaseAll(): Unit = {
    val it = pinned.keys()
    while (it.hasMoreElements) drain(pinned.remove(it.nextElement()), blocking = true)
    val it2 = checkpointed.keys()
    while (it2.hasMoreElements) drainRdds(checkpointed.remove(it2.nextElement()), blocking = true)
  }

  private def drain(q: java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]],
                    blocking: Boolean): Unit =
    if (q != null) {
      var df = q.poll()
      while (df != null) {
        df.unpersist(blocking)
        df = q.poll()
      }
    }

  private def drainRdds(
      q: java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]],
      blocking: Boolean): Unit =
    if (q != null) {
      var rdd = q.poll()
      while (rdd != null) {
        rdd.unpersist(blocking)
        rdd = q.poll()
      }
    }
}
