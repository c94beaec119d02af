package ptx.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-task launch overhead in this environment — times empty-task
  * jobs of 1/8/32/128/320 tasks (median of 5, warm). */
object TaskOverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    Seq(1, 8, 32, 128, 320).foreach { n =>
      (1 to 3).foreach(_ => sc.parallelize(1 to n, n).count())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        sc.parallelize(1 to n, n).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[toh] tasks=$n%4d med=${ts(2)}%7.4f min=${ts.head}%7.4f perTask=${ts(2) / n * 1000}%6.2f ms")
    }
    spark.stop()
  }
}
