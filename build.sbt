ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "otusclickhousespark"
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
// Forked runs default to LoggedOutput, which prefixes every stdout line
// with "[info] " — that breaks any consumer that json.loads()es the
// Bench JSON line. StdoutOutput passes the child's stdout through raw.
outputStrategy := Some(StdoutOutput)
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
  // local[32] with an 8g ceiling GC-thrashed the bench tail (same query
  // subset: 78s at 8g -> 14s at 24g); the box has 128 GiB, so give the
  // single-JVM "cluster" a real executor-sized heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~170 codegen-heavy plans in one JVM can fill the default 240m code
  // cache mid-board; the JVM then SILENTLY disables the JIT compiler,
  // which is the "tightly slow" bench mode observed on late-alphabet
  // queries (6.6x swings between runs of identical code). A real
  // executor-sized cache keeps every pass in the compiled regime.
  "-XX:ReservedCodeCacheSize=1g",
  // static SQL conf, so it must be set before any SparkSession exists:
  // 100 cached codegen classes cannot hold one bench board / test run,
  // forcing Janino recompiles + fresh JIT on every revisit of a plan
  "-Dspark.sql.codegen.cache.maxEntries=4096",
)

// one shared SparkSession across suites
Test / parallelExecution := false
