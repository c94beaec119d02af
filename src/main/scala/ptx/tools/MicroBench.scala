package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmarks for expression/codegen investigations.
  * Current subject (r10): the shingle stream's share of the dedup family —
  * the HOF concat_ws-per-shingle construction vs the GramHashes kernel.
  * (Previous subject, kept in git history: fn_math's output-sort share.)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ptx.functions.TextGrams.register(spark)

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      println(f"[mb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = ptx.Tables.documents(spark, sfDir)
    // the PRE-r10 string formulation, inlined here so the comparison
    // stays runnable after TextShingles itself moved to the kernel
    val stringShingleExpr =
      """CASE WHEN size(w) >= 3 THEN
        |  transform(sequence(1, size(w) - 2),
        |    i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
        |ELSE array() END""".stripMargin
    def stringStream = docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(stringShingleExpr))).as("shingle"))

    // warmup
    ptx.functions.TextShingles.shingles(docs).queryExecution.toRdd.count()

    time("shingle stream, HOF concat_ws strings (pre-r10 formulation)")(
      stringStream)
    time("shingle stream, HOF strings + xxhash64 (pre-r10 minhash/prefix input)")(
      stringStream.select(col("doc_id"), xxhash64(col("shingle")).as("h")))
    time("shingle stream, GramHashes(w, 3) hashed (current TextShingles)")(
      ptx.functions.TextShingles.shingles(docs))
    spark.stop()
  }
}
