package ptx.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the r18 in-sweep inflation hunt: replicate graft.Bench's
  * exact per-query loop (warm run, releaseAll, gcTick-every-5, 3 timed runs
  * with blocking releaseAll between) over a NAME RANGE of the registry, and
  * print every individual run time — the full bench shows med ≫ min on
  * blocks of queries (llm_containment 2.7 s sweep median vs 0.75 s
  * isolated) and the medians hide which run inflates.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain ptx.tools.BenchSlice <fromName> <toName>"
  * Optional env: SPARK_GRAFT_SLICE_GC=none|5|1  (gcTick cadence, default 5)
  */
object BenchSlice {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val from = args.lift(0).getOrElse("")
    val to = args.lift(1).getOrElse("￿")
    val gcMode = sys.env.getOrElse("SPARK_GRAFT_SLICE_GC", "5")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    var sinceGc = 0
    // r19 (ADVICE r18): tolerate a malformed SPARK_GRAFT_SLICE_GC — fall
    // back to the default cadence instead of a NumberFormatException
    val gcEvery = gcMode.toIntOption.getOrElse {
      if (gcMode != "none")
        System.err.println(s"[slice] bad SPARK_GRAFT_SLICE_GC '$gcMode', using 5")
      5
    }
    def gcTick(): Unit = if (gcMode != "none") {
      sinceGc += 1
      if (sinceGc >= gcEvery) {
        sinceGc = 0
        System.gc()
        Thread.sleep(150)
      }
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n >= from && n <= to)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      ptx.Caching.releaseAll()
      gcTick()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir)) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        dt
      }
      println(f"[slice] $name%-34s ${times.map(t => f"$t%6.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
