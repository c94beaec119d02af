package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker

/** Dev probe for the optimization rounds: where does per-invocation DRIVER
  * plan-compile time go for a registered query? Prints the Catalyst phase
  * breakdown (analysis / optimization / planning) from QueryPlanningTracker
  * plus the top rules by wall time, and times table loading separately —
  * `Tables.t` re-reads the parquet footer and re-lists the directory on
  * every call, which is also charged to every invocation.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain ptx.tools.PlanCost q8_market_share ..."
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q8_market_share")
    // warm: classloading, codegen caches
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = ptx.QueryRegistry.all(name)
      try fn(spark, sfDir).queryExecution.executedPlan catch { case _: Throwable => () }
      // table-load (DataFrame construction) vs plan phases, median of 3
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t1) / 1e6
        (tBuild, tPlan, df)
      }
      val (tBuild, tPlan, df) = reps.sortBy(r => r._1 + r._2).apply(1)
      val tracker = df.queryExecution.tracker
      val phases = tracker.phases.map { case (k, v) =>
        f"$k=${v.durationMs}%dms"
      }.mkString(" ")
      println(f"[plancost] $name%-30s build=$tBuild%7.1fms plan=$tPlan%7.1fms  $phases")
      tracker.rules.toSeq.sortBy(-_._2.totalTimeNs).take(8).foreach { case (rule, m) =>
        println(f"[plancost]    ${m.totalTimeNs / 1e6}%8.2fms  inv=${m.numInvocations}%4d eff=${m.numEffectiveInvocations}%4d  ${rule.split('.').last}")
      }
    }
    spark.stop()
  }
}
