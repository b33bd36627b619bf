ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "highvolumemarketdatapipelinespark"
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
// Pass the forked runMain JVM's stdout through UNWRAPPED (no [info]
// prefix) so the bench's final compact-JSON line is machine-parseable
// by the driver (BENCH_r07..r09 all read "parsed": null because sbt
// re-logged every child line as "[info] ..."). showSuccess=false also
// drops the trailing "[success] Total time" line, making the child's
// own last println the last stdout line of the whole sbt invocation.
Compile / run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// HiveCatalogSpec needs a session whose catalog implementation is fixed
// to hive at creation; everything else shares TestSession's in-memory
// catalog — so the hive suite gets its own forked JVM.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val fork = ForkOptions().withRunJVMOptions(opts)
  val (hive, rest) = (Test / definedTests).value.partition(_.name.contains("HiveCatalog"))
  Seq(
    Tests.Group("hive-metastore", hive, Tests.SubProcess(fork)),
    Tests.Group("main", rest, Tests.SubProcess(fork)),
  ).filter(_.tests.nonEmpty)
}
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
  // 24g default: the 160-query bench at local[32] GC-thrashed at 8g
  // (183 s -> 115 s total just from the heap bump, measured round 8);
  // the host has 128 GiB, and the forked Verify/Bench JVM is the only
  // Spark JVM alive during a run
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
