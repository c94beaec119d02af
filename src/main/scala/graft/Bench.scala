package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark driver: times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Output contract (BENCH_r01/r02 showed the driver tail-captures stdout and
  * truncated the single ~4 KB JSON line, losing the `{"metric":...` prefix —
  * both rounds parsed=null):
  *   - line 1: full JSON incl. the complete per-query map (human/debug);
  *   - `bench_queries.json` (cwd, or $SPARK_GRAFT_BENCH_OUT): same full JSON;
  *   - LAST line: short parseable JSON — total + the 12 BASELINE.md subset
  *     queries only (~600 B, survives any tail capture).
  *
  * Method (BASELINE.md §Method + round-2 advice): queries run in sorted-key
  * order; each query gets one untimed warm run (absorbs codegen/classload
  * that single-run timing charged to whichever query ran first) and one
  * timed run; operator-pinned caches are released BETWEEN runs and AFTER
  * the timing capture, so the timed run does full work and unpersist
  * bookkeeping is not in the measured time.
  *
  * Runs force FULL materialization (`queryExecution.toRdd.count()`, every
  * output column evaluated) to match BASELINE.md's collect()-based method.
  * A plain `df.count()` lets Catalyst prune output-only work — window
  * columns that don't change the row count, left-join branches against
  * aggregate-unique keys (llm_dedup_spans measured 0.19 s under count()
  * vs 5.4 s fully materialized at sf0.1) — and would grade the pruned
  * plan, not the operator.
  */
object Bench {
  /** BASELINE.md's 12-query graded subset (§Results). */
  private val BaselineSubset = Seq(
    "agg_pricing_summary", "join_star_q5", "topk_global", "agg_count_distinct",
    "win_topk_per_group", "win_running_sum", "pt_sessionize", "pt_tumbling_1h",
    "llm_dedup_exact", "llm_wordcount", "llm_knn_cosine", "set_except")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.ts is TIMESTAMP_NTZ in the current fixture and the loader
      // casts it to TIMESTAMP — pin UTC (as Verify does) so that cast is
      // machine-timezone-independent and epoch math matches the oracle
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Session-accumulation guards (r6): this JVM runs ~300 query
      // executions back-to-back. Broadcast blocks and shuffle files are
      // only reaped by ContextCleaner when a DRIVER GC collects their
      // weak references — and a large, mostly-idle heap may never GC on
      // its own, so the block manager silently fills with dead broadcasts
      // (BENCH_r05 showed up-to-15× late-run inflation on the grading
      // machine that isolated re-timing could not reproduce). Two layers:
      // Spark's own periodic GC as a floor, plus an explicit System.gc()
      // between queries (below) so cleanup never lands inside a timed run.
      .config("spark.cleaner.periodicGC.interval", "30s")
      // the SQL status store tracks every execution even with the UI off;
      // keep its live-entity footprint flat across 300 executions
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one JVM warm-up query before any timing, matching BASELINE.md's method
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    var sinceGc = 0
    // full materialization — see the Method note above
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try run(fn(spark, sfDir)) catch { case _: Throwable => () } // warm
      ptx.Caching.releaseAll() // timed run must redo the cached work too
      // every 10 queries: force a driver GC so ContextCleaner reaps the
      // dead broadcasts/shuffles the last ~20 executions accumulated, and
      // give its async thread a beat to drain — OUTSIDE the timed region,
      // so the reclaim cost is never charged to a query
      sinceGc += 1
      if (sinceGc >= 10) {
        sinceGc = 0
        System.gc()
        Thread.sleep(200)
      }
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      ptx.Caching.releaseAll()
      name -> (if (ok) dt else -1.0)
    }
    // Locale.ROOT: a comma-decimal default locale would render 30,123 and
    // break every JSON consumer of this output
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qjson(results)},"sf":"$sfDir"}"""
    println(full)
    // 3-run MEDIAN for the graded 12-query subset (r13, VERDICT r12 #3):
    // the single-run method let one contention artifact read as a 38%
    // regression in r12. The sweep above contributes run 1; two more
    // timed runs per subset query (same releaseAll + full-materialization
    // discipline) give a per-query median that a one-off scheduler stall
    // cannot move. The full 217-query map stays single-run — tripling the
    // whole sweep would triple bench wall for queries nobody grades.
    val firstRun = results.toMap
    val subsetMedian = BaselineSubset.sorted.map { name =>
      val fn = SparkEntry.queries(name)
      val more = (1 to 2).map { _ =>
        ptx.Caching.releaseAll()
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        if (ok) dt else -1.0
      }
      val good = (more :+ firstRun.getOrElse(name, -1.0)).filter(_ >= 0).sorted
      val med =
        if (good.isEmpty) -1.0
        else good(good.size / 2)
      name -> med
    }
    val subsetTotal = subsetMedian.map(_._2).filter(_ >= 0).sum
    // the full per-query dump (committed per round as
    // docs/bench_r<N>_queries.json so regressions stay diffable) carries
    // the subset medians alongside the single-run map
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json")
    val fullWithMedian =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qjson(results)},"baseline_subset_total":${fmt(subsetTotal)},"subset_method":"median_of_3","subset_median":${qjson(subsetMedian)},"sf":"$sfDir"}"""
    try Files.writeString(Paths.get(outFile), fullWithMedian + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","baseline_subset_total":${fmt(subsetTotal)},"subset_method":"median_of_3","queries":${qjson(subsetMedian)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
