package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmarks for expression/codegen investigations.
  * Current subject (r10): where fn_math's 2.1 s goes — the 14-column
  * projection itself, or the 7-key global output sort.
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

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      println(f"[mb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val l = ptx.Tables.lineitem(spark, sfDir)
    def proj = l.select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * col("l_discount")).as("disc_amt"),
      abs(col("l_quantity") - 25.0).as("dev"),
      ceil(col("l_discount") * 100).as("disc_pct_ceil"),
      floor(col("l_tax") * 100).as("tax_pct_floor"),
      round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
      round(log(col("l_extendedprice")), 6).as("ln_price"),
      round(log10(col("l_extendedprice")), 6).as("log10_price"),
      round(pow(col("l_quantity"), 2.0), 2).as("qty_sq"),
      (col("l_linenumber") % 3).as("ln_mod"),
      signum(col("l_discount") - 0.05).as("disc_sign"),
      greatest(col("l_quantity"), lit(10.0)).as("qty_hi"),
      least(col("l_quantity"), lit(10.0)).as("qty_lo"))

    // warmup
    proj.queryExecution.toRdd.count()

    time("projection only (no sort)")(proj)
    time("projection + 2-key sort")(
      proj.orderBy(col("l_orderkey"), col("l_linenumber")))
    time("projection + 7-key sort (declared)")(
      proj.orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_price"),
        col("qty_hi"), col("qty_lo"), col("disc_pct_ceil"), col("tax_pct_floor")))
    spark.stop()
  }
}
