package ptx.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiler for the optimization rounds: per registered query, bench-grade
  * warm timings (toRdd.count, the graft.Bench action) PLUS the scheduler-side
  * counters the stage-shape work needs — #jobs, #stages, #tasks, and summed
  * task time — so "this change removed a stage/job round-trip" is measurable,
  * not eyeballed. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain ptx.tools.Profile q1 q2 ..."
  */
object Profile {
  private class Counters extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0) }
  }

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
    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)
    val names = if (args.nonEmpty) args.toSeq else ptx.QueryRegistry.all.keys.toSeq.sorted
    // JVM warm-up, as graft.Bench does
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = ptx.QueryRegistry.all(name)
      // warm run (codegen/classload), not measured
      try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
      ptx.Caching.releaseAll()
      System.gc()
      Thread.sleep(250)
      val reps = sys.env.get("SPARK_GRAFT_PROFILE_REPS").map(_.toInt).getOrElse(3)
      val times = (1 to reps).map { i =>
        if (i == reps) { // count scheduler activity on the last rep only
          // let async listener events from prior reps drain first
          Thread.sleep(200)
          counters.reset()
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        ptx.Caching.releaseAll()
        // r19: graft.Bench's per-query GC tick, at the rep grain — without
        // it the ContextCleaner drains prior reps' checkpoint/shuffle
        // debris INSIDE later timed reps and the checkpoint-heavy queries
        // read escalating phantoms (the r18 sweep-phantom class, seen here
        // as plan=24.9s outliers on llm_dedup_cluster_sizes)
        System.gc()
        Thread.sleep(250)
        dt
      }
      Thread.sleep(200) // let async listener events drain
      val med = times.sorted.apply(times.size / 2)
      // driver-side compile cost (analysis + optimization + physical
      // planning), paid once per invocation before any job runs
      val tp0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.executedPlan
      val planS = (System.nanoTime() - tp0) / 1e9
      println(f"[prof] $name%-34s med=$med%6.3f min=${times.min}%6.3f " +
        f"plan=$planS%6.3f jobs=${counters.jobs.get}%3d stages=${counters.stages.get}%3d " +
        f"tasks=${counters.tasks.get}%5d taskTime=${counters.taskTimeMs.get / 1000.0}%7.2fs")
    }
    spark.stop()
  }
}
