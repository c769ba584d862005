ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metofficespark"
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
// Default driver heap: a local[N] session runs ALL N task slots inside
// the one driver JVM, so executor-memory sizing rules apply to it
// (spark.memory.fraction 0.6 of the heap is shared execution+storage
// across N concurrent tasks). The old 8g default left ~150 MB of
// execution memory per task at 32 cores — measured on the full
// 139-query sf0.1 bench as spill+GC inflation of the
// localCheckpoint-heavy dedup/index families (2-4x vs the same query
// in a short run). Measured heap curve, same protocol (quiet box,
// fresh cache, full registry, sf0.1): 8g = 190.1 s, 16g = 134.1 s,
// 24g = 149.2 s — 16g is the basin; past it G1's bigger regions/
// floating garbage cost more than the extra execution memory buys,
// the same shape the sf10 Verify legs hit at 64g (verify skill
// gotcha). Derive the default from machine RAM (quarter of MemTotal)
// clamped to [8g, 16g]. SPARK_DRIVER_MEM still overrides (the Verify
// scale legs pin their own budgets).
def defaultHeapGb: Long = {
  val memTotalKb =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong
      }.getOrElse(0L)
      finally src.close()
    } catch { case _: Exception => 0L }
  if (memTotalKb <= 0) 8L else math.max(8L, math.min(16L, memTotalKb / (4L * 1024 * 1024)))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
