package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): where does the learned-cell BUILD's wall go as the
  * corpus grows — the adaptive-k rule (VERDICT r15 #1) holds the DEDUP
  * tail corpus-linear, so the kmeans build itself becomes the biggest
  * term at 10×. Times, per corpus: the adaptiveK count, each Lloyd
  * round (assign+update materialized by the localCheckpoint), and the
  * final assignment materialization.
  *
  *   sbt "runMain ptx.tools.KmeansProbe /root/testdata/sf0.1 /tmp/probe10x"
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/probe10x")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ptx.functions.VectorOps.register(spark)
    dirs.foreach { d =>
      val e = ptx.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      def round(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[kmeans-probe] $d $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // warm the scan
      e.queryExecution.toRdd.count()
      var n = 0L
      round("count") { n = e.count() }
      val k = ptx.sources.VectorIndex.adaptiveK(n)
      println(s"[kmeans-probe] $d n=$n k=$k")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
      var cent = e.orderBy(col("vec_id")).limit(k)
        .select((row_number().over(w) - 1).as("label"),
          col("embedding").as("centroid"))
      (1 to 3).foreach { i =>
        round(s"lloyd-$i") {
          val asg = ptx.sources.VectorIndex.assign(e, cent)
            .select(col("vec_id"), col("label"))
          cent = ptx.ops.LlmScale.ivfCentroids(e.join(asg, "vec_id"))
            .localCheckpoint()
        }
      }
      round("final-assign") {
        ptx.sources.VectorIndex.assign(e, cent).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
