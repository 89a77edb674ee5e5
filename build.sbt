ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xarraybeamspark"
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
  // Heap PINNED at 8 GiB, Xms = Xmx, G1 (the JDK 17 default, stated
  // explicitly): bench numbers are only comparable at a FIXED heap.
  // Measured (round 13, identical code + protocol, sf0.1 local[32]):
  // the 181-query suite totals 96.7 s at 8 GiB but 130.1 s at 96 GiB —
  // a broad ~1.35x uplift with ~10 queries >2x their baseline and
  // old-gen GC time growing 45 s -> 75 s. That heap-regime effect is
  // exactly the round-12 driver-bench inflation (its log shows a
  // ~96 GiB heap via SPARK_DRIVER_MEM); honoring an env-supplied heap
  // here silently invalidated every recorded number, so the bench/test
  // fork no longer follows SPARK_DRIVER_MEM. Use SPARK_GRAFT_HEAP to
  // override deliberately — and re-record BASELINE.md if you do.
  s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_HEAP", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_HEAP", "8g")}",
  "-XX:+UseG1GC",
  // 170 oracle queries × whole-stage codegen overflow the JDK default
  // 240 MB JIT code cache mid-suite; once it fills, C2 stops compiling
  // and late-suite queries run partially interpreted (measured: the
  // same query ~1.5x slower in-suite than isolated). Size it so the
  // whole suite stays compiled.
  "-XX:ReservedCodeCacheSize=768m",
)
