package ptx.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries by name (dev tool, parameterized like
  * graft.Bench): `runMain ptx.tools.QueryTime q1 q2 ...` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored. Each query runs twice
  * (cold incl. codegen, then warm) — the warm figure is the one comparable
  * to graft.Bench's timed run.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else ptx.QueryRegistry.all.keys.toSeq.sorted
    names.foreach { name =>
      val fn = ptx.QueryRegistry.all(name)
      val l = ptx.tools.Metrics.install(spark)
      // keep the warm run's frame so the explain path prints ITS plan
      // instead of re-invoking fn — for the driver-side iterative queries
      // (llm_dedup_cluster*) rebuilding the frame re-runs the whole
      // propagation loop (~4-7 s of real Spark jobs) just to explain the
      // final projection (ADVICE r4)
      var lastDf: org.apache.spark.sql.DataFrame = null
      // SPARK_GRAFT_FULLMAT=1 → graft.Bench's materialization (toRdd.count:
      // every output column evaluated, sorts paid); default df.count() lets
      // Catalyst prune output-only work and can read much faster than the
      // bench line for output-heavy queries
      val fullMat = sys.env.contains("SPARK_GRAFT_FULLMAT")
      val reps = sys.env.get("SPARK_GRAFT_QT_REPS").map(_.toInt).getOrElse(2)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        lastDf = fn(spark, sfDir)
        if (fullMat) lastDf.queryExecution.toRdd.count() else lastDf.count()
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        dt
      }
      val deadline = System.nanoTime() + 5_000_000_000L
      while (l.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val ex = if (l.snapshot.isEmpty) -1 else l.snapshot.map(_.numExchanges).max
      spark.listenerManager.unregister(l)
      // 'warm=-' when reps == 1, so the line stays unambiguous for
      // downstream parsing (ADVICE r11: an empty value read as a blank)
      val warm = if (reps <= 1) "-"
        else times.drop(1).map(t => f"$t%.2f").mkString(",")
      println(f"[qt] $name cold=${times(0)}%.2f warm=$warm exchanges=$ex (cpus=$cpus)")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        lastDf.explain("formatted")
    }
    spark.stop()
  }
}
