package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: what does one tiny shuffle stage cost end-to-end on this
  * machine? Times chains of k = 1, 2, 4, 8 dependent exchanges over a
  * 1000-row frame (warm, median of 5). The slope is the per-stage driver
  * overhead the multi-stage DAG queries pay; the intercept is the per-query
  * floor. */
object StageOverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def chain(k: Int) = {
      var df = spark.range(1000).select(col("id"), (col("id") % 97).as("k"))
      (1 to k).foreach { i =>
        df = df.groupBy((col("k") + i).as("k")).agg(count(lit(1)).as("n"))
          .select(col("k"), col("n").as("id")).select(col("id"), col("k"))
      }
      df
    }
    Seq(1, 2, 4, 8).foreach { k =>
      (1 to 2).foreach(_ => chain(k).queryExecution.toRdd.count()) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        chain(k).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[soh] exchanges=$k%2d med=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }
    spark.stop()
  }
}
