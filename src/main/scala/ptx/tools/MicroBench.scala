package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmarks for expression/codegen investigations. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ptx.functions.VectorOps.register(spark)
    val e = ptx.Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("vec1"), col("embedding").as("p"))
    val b = e.select(col("vec_id").as("vec2"), col("embedding").as("c"))

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    // warmup
    a.crossJoin(broadcast(b)).filter(col("vec1") < col("vec2")).count()

    time("pairs only (a<b count)") {
      a.crossJoin(broadcast(b)).filter(col("vec1") < col("vec2")).count()
    }
    time("agg sum(cosine) over all a<b pairs (cosine in project, codegen)") {
      a.crossJoin(broadcast(b)).filter(col("vec1") < col("vec2"))
        .agg(sum(expr("cosine_sim(p, c)"))).collect()(0)
    }
    time("cosine inside join condition (current dedup_embed shape)") {
      a.crossJoin(broadcast(b))
        .filter(col("vec1") < col("vec2") && expr("cosine_sim(p, c)") >= 0.45)
        .count()
    }
    spark.stop()
  }
}
