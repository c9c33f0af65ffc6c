ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fluvioduckspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The container locale is POSIX (file.encoding=US-ASCII): force scalac
// to read sources as UTF-8 so non-ASCII string literals (the round-13
// multilingual oracle fixtures) are parsed byte-exact, not mangled.
scalacOptions ++= Seq("-encoding", "UTF-8")
Test / fork := true
run / fork := true
// forked-run output goes to stdout VERBATIM — no "[info] " logger prefix.
// The bench/verify drivers parse the emitted one-line JSON from captured
// output; sbt's default logger prefix made every line unparseable
// (BENCH_r04.json: parsed=null).
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
  // local[32] with default 8g GC-thrashes on the wider queries; the box
  // has 128 GiB — give the single-JVM "cluster" a realistic share.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // a 60-query suite generates thousands of whole-stage-codegen classes;
  // the default 240m code cache fills, HotSpot stops JIT-compiling, and
  // everything afterwards runs interpreted (one source of the measured
  // suite-position slowdowns)
  "-XX:ReservedCodeCacheSize=1g",
)
