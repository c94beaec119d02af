package ptx

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Session-lifetime guard for operator-internal caches.
  *
  * Some operators (`llm_dedup_near`, `llm_dedup_minhash_lsh`,
  * `llm_dedup_simhash`) persist an intermediate frame because several
  * consumers prune different columns, which defeats exchange reuse. The
  * operator cannot unpersist it itself — the returned frame is lazy and the
  * cache must live until the CALLER materializes it. Left alone, each
  * invocation would leak one cached frame for the session lifetime
  * (ADVICE r1). So instead of calling `.persist` directly, operators `pin`
  * the frame here and the harness (Verify/Bench/MicroBench — or any
  * library user) calls `releaseAll()` once the action is done. Unpersist
  * of a frame mid-use is safe in Spark (it just recomputes), so a missed
  * or early release can cost time, never correctness.
  */
object Caching {
  private val pinned = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release. */
  def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.add(df)
    df
  }

  /** Unpersist every pinned frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = {
    var df = pinned.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = pinned.poll()
    }
  }
}
