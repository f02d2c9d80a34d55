ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kolbigdatarealtimeanalyticsspark"
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
// Forward the forked runMain's stdout verbatim instead of routing it
// through sbt's logger: the logger prefixes every line with "[info] ",
// which breaks machine parsing of Bench's one-line JSON contract (the
// driver's BENCH parser reported parsed:null through round 9).
run / outputStrategy := Some(StdoutOutput)
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
  // Hadoop's RawLocalFileSystem shells out to chmod per created file
  // (no native-hadoop lib here); JDK 17's default posix_spawn helper is
  // fragile in this container (fails with "Failed to exec spawn helper").
  // Plain fork is reliable but COPIES THE BIG JVM per spawn — measured
  // 15x on q138's 265-partition write (114 s vs 7.4 s standalone; the
  // r11 in-suite bench read 163 s). vfork is both reliable (no spawn
  // helper exec) and O(1) in heap size.
  "-Djdk.lang.Process.launchMechanism=vfork",
)
