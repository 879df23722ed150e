ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "genetics_spark_colocspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 48g matches the BASELINE.md bench protocol (local[32], 48g driver);
  // at 8g the 32-thread shuffles + cached frames run GC-bound.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // With local[32] on a 32-vCPU host the JVM's default 32 parallel GC
  // threads + JIT compiler threads compete with the executor pool and
  // convoy: measured 3-10x wall-clock blowups with CPU time inflating
  // 117s -> 1472s on identical work. Capping service threads restores
  // flat 4-5s runs. (A production cluster sizes executor cores below
  // host vCPUs for the same reason.)
  // NOTE: do not cap CICompilerCount — a 4-thread C2 queue lags the
  // class flood from wide wholestage-codegen plans and leaves their hot
  // loops interpreted (measured 2x on the widest bench query).
  "-XX:ParallelGCThreads=8", "-XX:ConcGCThreads=2",
  // 50+ codegen-heavy queries in one JVM overflow the default 240m
  // code cache; once full the JIT disables and late queries run
  // interpreted (3-4x slower than the same query in a fresh JVM)
  "-XX:ReservedCodeCacheSize=1g",
)

// Bench JSON contract (r17): the driver invokes `sbt "runMain graft.Bench"`
// and reads a ~2000-char stdout tail, expecting the bench's one-line JSON
// as a parseable line. sbt's default LoggedOutput strategy prefixes every
// forked-run stdout line with "[info] " and appends its own
// "[success] Total time: ..." line after the run — so the JSON line has
// never parsed (BENCH_r*.json "parsed": null every round). StdoutOutput
// passes the forked JVM's stdout through verbatim (stderr likewise), and
// showSuccess=false drops the trailing [success] line, leaving the bench
// JSON as the final, unprefixed line of the sbt process's stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task —
// exclude it from the unused-key lint so the warning doesn't precede
// every run
Global / excludeLintKeys += showSuccess
