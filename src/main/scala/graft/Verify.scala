package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Each query runs under a wall-time cap (SPARK_GRAFT_VERIFY_TIMEOUT_SEC,
  * default 300 s) so one pathological plan cannot starve the rest of the
  * dump: on timeout the query's job group is cancelled, the miss is logged,
  * and the loop moves on — the driver then records that one query as
  * missing instead of the whole round timing out.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev pre-flight
    // of a few queries without dumping all ~120; the driver passes 2 args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // a typo'd filter would otherwise run ZERO queries and read as a
    // green pre-flight — fail loudly instead
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query names in filter: ${unknown.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SEC", "300").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // daemon threads: a query stuck in NON-interruptible driver-side work
    // (analysis loop, datasource listing) must not block JVM exit
    val daemonFactory = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "verify-query"); t.setDaemon(true); t
      }
    }
    var pool = Executors.newSingleThreadExecutor(daemonFactory)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val task = pool.submit(new Runnable {
        override def run(): Unit = {
          // job group set on the executing thread so a timeout can cancel
          // exactly this query's jobs
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try task.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          task.cancel(true) // interrupt driver-side work too, not just jobs
          // the old thread may be stuck in non-interruptible code and would
          // otherwise occupy the single-thread pool, silently starving and
          // "timing out" every remaining query — replace the executor
          pool.shutdownNow()
          pool = Executors.newSingleThreadExecutor(daemonFactory)
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s, cancelled")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally ptx.Caching.releaseAll() // drop operator-pinned caches
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
