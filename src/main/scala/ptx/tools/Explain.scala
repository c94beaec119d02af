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
    val time = args.contains("--time")
    val names = args.drop(1).filterNot(_ == "--time")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up the JVM/codegen so --time measures steady state
    if (time) ptx.QueryRegistry.all("scan_filter_pushdown")(spark, sfDir).count()
    names.foreach { n =>
      val df = ptx.QueryRegistry.all(n)(spark, sfDir)
      if (time) {
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      } else {
        println(s"===== $n =====")
        df.explain("formatted")
      }
    }
    spark.stop()
  }
}
