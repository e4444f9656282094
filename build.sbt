ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cometspark"
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
// Pass the forked app's stdout/stderr through UNDECORATED instead of
// sbt's default LoggedOutput, which prefixes every stdout line with
// "[info] " (and stderr with "[error] "). The bench prints ONE machine-
// readable JSON line that downstream tooling parses from captured
// stdout; the "[info] " decoration means no line in the capture starts
// with '{', so a line-oriented JSON parser finds nothing — that parse
// has failed in every round to date (BENCH_r*.json all carry
// "parsed": null while the JSON itself is present and valid in the
// tail). StdoutOutput also routes the forked process's stderr (Spark's
// INFO/WARN chatter) to the real stderr instead of folding it into
// stdout as "[error] " lines, which keeps the captured stdout tail for
// the lines that matter.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
