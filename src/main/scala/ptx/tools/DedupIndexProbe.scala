package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures the [[ptx.sources.DedupIndex]] amortization claim
  * behind docs/SCALE.md — admitting a shard against a persisted signature
  * index must cost ~linear in the SHARD, while the inline
  * `llm_dedup_minhash_lsh` query re-signs the whole corpus per run.
  *
  * Splits the corpus at `dir` into a base and a shard (10% and 1%
  * variants), then times with full materialization (`toRdd.count`, the
  * graft.Bench method) after a warm-up:
  *
  *   - inline: the declared full-corpus query — what a re-sign-everything
  *     admission would pay per shard;
  *   - build: `DedupIndex.write` of the base — paid ONCE;
  *   - probe: `DedupIndex.probe` of the shard — paid per admission.
  *
  *   sbt "runMain ptx.tools.DedupIndexProbe <sfDir>"
  */
object DedupIndexProbe {
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
      println(f"[dedup-index-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      ptx.Caching.releaseAll()
    }

    val docs = ptx.Tables.documents(spark, dir).select("doc_id", "text")
    // warm-up: JVM + codegen + the documents scan
    docs.queryExecution.toRdd.count()

    timeIt("inline full-corpus query (re-sign everything)") {
      ptx.QueryRegistry.all("llm_dedup_minhash_lsh")(spark, dir)
        .queryExecution.toRdd.count()
    }
    for (pct <- Seq(10, 1)) {
      val mod = 100 / pct
      val base = docs.filter(col("doc_id") % mod =!= 0)
      val shard = docs.filter(col("doc_id") % mod === 0)
      val idx = java.nio.file.Files.createTempDirectory(s"dedupidx$pct").toString
      timeIt(s"index build over ${100 - pct}% base (paid once)") {
        ptx.sources.DedupIndex.write(base, idx); 0L
      }
      timeIt(s"probe of a $pct% shard (paid per admission)") {
        ptx.sources.DedupIndex.probe(spark, idx, shard)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
