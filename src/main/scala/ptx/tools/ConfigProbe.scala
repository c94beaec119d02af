package ptx.tools

import org.apache.spark.sql.SparkSession

/** Dev experiment harness for the optimization rounds: time queries under a
  * session-config variation, bench-grade (warm + 3 timed toRdd.count runs).
  *   SPARK_GRAFT_CONF="spark.x=1;spark.y=2" \
  *     sbt "runMain ptx.tools.ConfigProbe q1 q2 ..."
  */
object ConfigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").toSeq.filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[conf] ${extra.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    val names = if (args.nonEmpty) args.toSeq else ptx.QueryRegistry.all.keys.toSeq.sorted
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = ptx.QueryRegistry.all(name)
      try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
      ptx.Caching.releaseAll()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        dt
      }.sorted
      println(f"[cp] $name%-34s med=${times(1)}%6.3f min=${times.head}%6.3f")
    }
    spark.stop()
  }
}
