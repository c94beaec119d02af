package ptx.tools
import org.apache.spark.sql.SparkSession
object Hot {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ptx.QueryRegistry.all("scan_filter_pushdown")(spark, sfDir).count() // jvm warm
    for (name <- Seq("llm_dedup_near", "llm_dedup_minhash_lsh", "llm_dedup_simhash")) {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        ptx.QueryRegistry.all(name)(spark, sfDir).count()
        ptx.Caching.releaseAll()
        println(f"[hot] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
