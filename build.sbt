ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamstp3_isspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession; streaming suites mutate session-scoped
// state (MemoryStream, query names) — run them sequentially.
Test / parallelExecution := false
run / fork := true
// Forward the forked process's stdout verbatim (no `[info]` prefix) so the
// driver can parse graft.Bench's single JSON line from the sbt output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g: local[32] shares one heap across all 32 task threads plus the
  // localCheckpoint block store; 8g was workable but leaves little
  // headroom once per-query scratch blocks stack up mid-run
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 74 queries × whole-stage codegen emits thousands of generated classes
  // in one JVM; the JDK-17 default 240m code cache fills mid-run, HotSpot
  // stops JIT-compiling, and alphabetically-late queries run partly
  // interpreted (text_ngram_freq measured 0.56 s isolated vs 2.2 s at the
  // tail of a full bench pass). Spark's own launcher scripts raise this
  // for the same reason.
  "-XX:ReservedCodeCacheSize=768m",
)
