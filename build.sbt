ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "npmmirrorspark"
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
// Forked process writes straight to stdout — no "[info] " logger prefix
// on the bench JSON line, and no sbt-logger throughput ceiling.
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
  // 53 queries x 2 bench passes generate a lot of codegen classes; the
  // default 240m code cache can fill and silently fall back to the
  // interpreter (20-50x slowdown)
  "-XX:ReservedCodeCacheSize=1g",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: 2×53 query executions in one JVM accumulate enough
  // old-gen (status store, codegen classes, checkpoint blocks) that 8g
  // spends the tail of a bench run in full GC — r01 showed a monotone
  // 1×→90× slowdown through the alphabetical run order at 8g
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// ad-hoc diagnostics for forked runs (e.g. GRAFT_JVM_EXTRA="-Xlog:gc")
javaOptions ++= sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
