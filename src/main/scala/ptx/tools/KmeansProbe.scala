package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): wall cost of the SHIPPED learned-cell build —
  * `VectorIndex.kmeansAdaptive` (corpus-adaptive k, sample-trained Lloyd
  * rounds, one full-corpus assignment), exactly what the declared
  * queries and the streaming reshard execute — per corpus: the adaptiveK
  * count, the build+assignment materialization, and the resulting
  * (k, sampled?) shape. Re-pointed here after the r16 restructure; the
  * first version timed the superseded inline-assign/localCheckpoint
  * loop, which no production path runs anymore.
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
      e.queryExecution.toRdd.count() // warm the scan
      def timed[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[kmeans-probe] $d $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val n = timed("count")(e.count())
      val k = ptx.sources.VectorIndex.adaptiveK(n)
      println(s"[kmeans-probe] $d n=$n k=$k sampled=${n > k.toLong * 64}")
      // the shipped build, twice: cold (codegen/classload) then warm —
      // the warm figure is the one the declared queries pay
      (1 to 2).foreach { rep =>
        timed(s"kmeansAdaptive+assign (rep $rep)") {
          val (cent, asg) =
            ptx.sources.VectorIndex.kmeansAdaptiveN(e, n, iters = 3)
          cent.queryExecution.toRdd.count()
          asg.queryExecution.toRdd.count()
        }
      }
    }
    spark.stop()
  }
}
