package ptx.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally timed runs)
  * of declared queries.
  *   sbt "runMain ptx.tools.Explain <sfDir> <query> [query...]"
  *   sbt "runMain ptx.tools.Explain <sfDir> --time <query> [query...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // --time counts rows (the graft.Bench methodology); --timefull forces
    // every output column via the final plan's RDD, so column pruning
    // under count() cannot skip expensive projections/joins — use it to
    // sanity-check that a count-based figure isn't measuring a pruned plan
    val time = args.contains("--time")
    val timeFull = args.contains("--timefull")
    val names = args.drop(1).filterNot(a => a == "--time" || a == "--timefull")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up the JVM/codegen so --time measures steady state — on the
    // FIRST requested query, not a fixed one: probe dirs may carry only
    // the tables that query reads (e.g. a documents-only skew corpus)
    if (time || timeFull) names.headOption.foreach { n =>
      try ptx.QueryRegistry.all(n)(spark, sfDir).queryExecution.toRdd.count()
      finally ptx.Caching.releaseAll()
    }
    names.foreach { n =>
      val df = ptx.QueryRegistry.all(n)(spark, sfDir)
      if (time || timeFull) {
        val t0 = System.nanoTime()
        val cnt = if (timeFull) df.queryExecution.toRdd.count() else df.count()
        val tag = if (timeFull) "timefull" else "time"
        println(f"[$tag] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      } else {
        println(s"===== $n =====")
        df.explain("formatted")
      }
      ptx.Caching.releaseAll()
    }
    spark.stop()
  }
}
