package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures the [[ptx.sources.ContainIndex]] amortization claim
  * behind docs/SCALE.md — the [[DedupIndexProbe]] shape at the containment
  * grain. The inline `llm_containment_prefix` query re-shingles and
  * re-df-ranks the whole corpus per run; the index probe shingles only the
  * shard and streams index scans against the broadcast shard side.
  *
  *   sbt "runMain ptx.tools.ContainIndexProbe <sfDir>"
  */
object ContainIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeIt(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[contain-index-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      ptx.Caching.releaseAll()
    }

    val docs = ptx.Tables.documents(spark, dir).select("doc_id", "text")
    docs.queryExecution.toRdd.count() // warm-up

    timeIt("inline full-corpus query (re-shingle everything)") {
      ptx.QueryRegistry.all("llm_containment_prefix")(spark, dir)
        .queryExecution.toRdd.count()
    }
    for (pct <- Seq(10, 1)) {
      val mod = 100 / pct
      val base = docs.filter(col("doc_id") % mod =!= 0)
      val shard = docs.filter(col("doc_id") % mod === 0)
      val idx = java.nio.file.Files.createTempDirectory(s"containidx$pct").toString
      timeIt(s"index build over ${100 - pct}% base (paid once)") {
        ptx.sources.ContainIndex.write(base, idx); 0L
      }
      timeIt(s"probe of a $pct% shard (paid per admission)") {
        ptx.sources.ContainIndex.probe(spark, idx, shard)
          .queryExecution.toRdd.count()
      }
      timeIt(s"micro-batch probe of the $pct% shard") {
        ptx.sources.ContainIndex.probe(spark, idx, shard, microBatch = true)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
