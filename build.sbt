ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gcpetlspark"
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
// Pass forked-run output through unprefixed: sbt's default logger wraps
// every stdout line in "[info] ", which breaks line-oriented parsers of
// Bench's one-line JSON (the driver's BENCH parse saw "[info] {...}" and
// recorded parsed=null in rounds 4-5).
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
  // 8g measured FASTER than 48g for this workload: the explosive
  // shared-shingle merge join runs 10-15x slower on a 48g heap (G1 lets
  // per-task sort/agg state grow huge before spilling; small heap keeps
  // collections short and spills streaming). Measured A/B at sf0.1.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc:file=$f").toSeq
