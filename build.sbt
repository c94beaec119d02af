ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "powertrainstreamingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output must reach stdout verbatim: sbt's default logged
// strategy prefixes every line with "[info] ", which breaks harnesses
// that json.loads the Bench/Verify output line.
run / outputStrategy := Some(StdoutOutput)
// ...and the trailing "[success] Total time" banner would otherwise be
// the last line of `sbt runMain` output, shadowing that JSON line.
showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // -Xms pinned to -Xmx (r18): the bench harness calls System.gc()
  // between queries, and an unpinned G1 heap UNCOMMITS back to the OS on
  // every full GC (gc logs showed the 24g max shrunk to 544M-1.4G
  // committed) — each subsequent query then re-grows the heap under
  // allocation pressure, paying hundreds of young/concurrent GCs inside
  // timed runs (12 s of pauses in one 30 s window; pin-heavy queries ran
  // 3-27× their isolated time). A pinned heap makes the forced full GCs
  // cheap and the steady state flat.
  // default raised 8g → 16g (r18): local[32] runs 32 concurrent tasks in
  // this one JVM (guide §5 sizes memory to concurrent task state); the
  // declared sandbox/grading environment is 128 GiB. Overridable via
  // SPARK_DRIVER_MEM for smaller hosts.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ // dev hook: extra forked-JVM flags (e.g. -Xlog:gc) without editing here
  // r19 (ADVICE r18): trim + drop empties so an empty/multi-space value
  // cannot inject a blank JVM argument that fails the forked launch
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
