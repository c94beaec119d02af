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

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release,
    * keyed by its owning session. */
  def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(df)
    df
  }

  /** Unpersist every frame pinned by `session` (non-blocking). */
  def release(session: SparkSession): Unit = drain(pinned.remove(session))

  /** Unpersist every pinned frame across all sessions and clear the
    * registry. Harness use (one session per JVM); library users sharing a
    * JVM should prefer `release(session)`. */
  def releaseAll(): Unit = {
    val it = pinned.keys()
    while (it.hasMoreElements) drain(pinned.remove(it.nextElement()))
  }

  private def drain(q: java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]): Unit =
    if (q != null) {
      var df = q.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = q.poll()
      }
    }
}
