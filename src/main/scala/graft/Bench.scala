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
  * Method (BASELINE.md §Method + round-2 advice + r13 verdict #1): queries
  * run in sorted-key order; each query gets one untimed warm run (absorbs
  * codegen/classload that single-run timing charged to whichever query ran
  * first) and THREE timed runs ($SPARK_GRAFT_BENCH_RUNS to override) whose
  * median is the reported figure and whose min is dumped alongside;
  * operator-pinned caches are released BETWEEN runs and AFTER each timing
  * capture, so every timed run does full work and unpersist bookkeeping is
  * not in the measured time. Single-run per-query numbers at ±30% noise
  * made 3 of r13's 5 biggest apparent regressions phantom — the median map
  * is the regression instrument.
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

  /** Median that is fair for even sizes (ADVICE r13: `good(n/2)` on an
    * even-sized survivor set picked the upper-middle — a pessimistic bias
    * silently labeled median_of_3 when one run failed). Odd → middle;
    * even → mean of the two middles; empty → -1. */
  private def median(sorted: Seq[Double]): Double =
    if (sorted.isEmpty) -1.0
    else if (sorted.size % 2 == 1) sorted(sorted.size / 2)
    else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ≥3 timed runs PER QUERY (r14, VERDICT r13 #1): the single-run
    // 224-query map at ±30% noise made 3 of r13's 5 biggest apparent
    // regressions phantom (pt_gap_fill dumped 1.83 s, warm re-time
    // 0.90 s). Medianizing the full map — not just the graded subset —
    // turns docs/bench_r<N>_queries.json into a usable regression diff.
    val runsPerQuery = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
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
    def gcTick(): Unit = {
      // EVERY query (r18, tightened from 5 — the r16 comment's rationale,
      // finished): the GC is what hands dead broadcasts/shuffles to
      // ContextCleaner, and the cleaner then drains ASYNCHRONOUSLY —
      // contending with the next timed runs on BlockManager locks. At the
      // 5-query cadence, five queries' debris (~50-70 jobs of shuffles and
      // broadcasts) drained INSIDE whichever query followed the tick: the
      // r18 session-2 sweep showed pin-heavy queries at 3-7× their own
      // same-sweep minimum (llm_containment_prefix median 7.4 s vs min
      // 0.95 s; isolated runs flat at 1.1-1.2 s) while queries landing
      // elsewhere mod 5 stayed flat. Per-query ticks keep each drain small
      // enough to finish in the untimed gap; the sleep gives the cleaner
      // thread its beat. Cost: ~250 ms × #queries of UNTIMED wall.
      sinceGc += 1
      if (sinceGc >= 1) {
        sinceGc = 0
        System.gc()
        Thread.sleep(250)
      }
    }
    // Repeats are BACK-TO-BACK per query (warm run, then the timed
    // runs), NOT round-robin passes over the registry. Passes were
    // tried and MEASURED WORSE in r17 (VERDICT r16 #6 follow-up): with
    // 242 queries cycling through Spark's fixed 100-entry whole-stage
    // codegen cache, every pass-separated run re-pays full Janino
    // compilation that immediate repeats amortize — the same HEAD read
    // 230.8 s by passes vs ~148 s back-to-back at cpus=32 (+55%, pure
    // protocol artifact). Back-to-back repeats measure the steady-state
    // plan; the residual sub-second divergence the driver's runs show
    // against committed dumps is machine-transient load, not protocol
    // (see the README bench-protocol note).
    // name -> (median, min, survivor count) over `runsPerQuery` timed runs
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try run(fn(spark, sfDir)) catch { case _: Throwable => () } // warm
      ptx.Caching.releaseAll() // timed runs must redo the cached work too
      gcTick()
      val times = (1 to runsPerQuery).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        if (ok) Some(dt) else None
      }.sorted
      name -> ((median(times), if (times.isEmpty) -1.0 else times.head, times.size))
    }
    // Locale.ROOT: a comma-decimal default locale would render 30,123 and
    // break every JSON consumer of this output
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val medians = results.map { case (k, (med, _, _)) => k -> med }
    val mins = results.map { case (k, (_, mn, _)) => k -> mn }
    // a query whose survivor count fell below runsPerQuery had a failed
    // run — name it rather than silently degrading the median's label
    val degraded = results.collect { case (k, (_, _, n)) if n < runsPerQuery => k }
    val methodLabel = s"median_of_$runsPerQuery"
    val total = medians.map(_._2).filter(_ >= 0).sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","method":"$methodLabel","queries":${qjson(medians)},"sf":"$sfDir"}"""
    println(full)
    // the graded 12-query subset reads its medians straight off the full
    // sweep (r14: the whole map is median-of-3 now, so the r13 subset-only
    // re-run pass is gone — same discipline, one code path)
    val medianMap = medians.toMap
    val subsetMedian = BaselineSubset.sorted.map(n => n -> medianMap.getOrElse(n, -1.0))
    val subsetTotal = subsetMedian.map(_._2).filter(_ >= 0).sum
    // the full per-query dump (committed per round as
    // docs/bench_r<N>_queries.json so regressions stay diffable) carries
    // per-query median AND min — min separates plan cost from noise
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json")
    val degradedJson = degraded.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullWithMedian =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","method":"$methodLabel","runs":$runsPerQuery,"degraded":$degradedJson,"queries":${qjson(medians)},"queries_min":${qjson(mins)},"baseline_subset_total":${fmt(subsetTotal)},"subset_method":"$methodLabel","subset_median":${qjson(subsetMedian)},"sf":"$sfDir"}"""
    try Files.writeString(Paths.get(outFile), fullWithMedian + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","baseline_subset_total":${fmt(subsetTotal)},"subset_method":"$methodLabel","queries":${qjson(subsetMedian)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
