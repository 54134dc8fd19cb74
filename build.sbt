ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceparadigmspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK-17 G1 GCLocker starvation under concurrent compressed block
  // I/O: tasks inside JNI critical sections (codec reads of
  // disk-persisted/shuffle blocks) pin GC while sibling tasks
  // allocate; G1 retries an allocation only 2× before throwing a
  // spurious OutOfMemoryError ("Retried waiting for GCLocker too
  // often allocating 15 words" with a near-empty heap — observed on
  // the 1000×-decade closure run, round 13). Raising the retry count
  // is the standard public mitigation until GCLocker's JDK-21 removal;
  // each retry waits out a GC cycle, so a high count trades a rare
  // stall for never throwing the spurious OOM. The flag is DIAGNOSTIC
  // in JDK 17 — without the unlock the JVM refuses to start (and an
  // sbt server that predates this line masks that until the first
  // fresh `sbt` run, which is exactly how it was caught).
) ++ {
  // GCLocker (and this flag) are REMOVED in newer JDKs — an
  // unconditional append would make forked JVMs refuse to start on
  // JDK 22+ with an unrecognized-option error (ADVICE r13). Gate on
  // the running JVM's spec version; forked JVMs inherit sbt's java.
  val spec = sys.props.getOrElse("java.specification.version", "17")
  val major = spec.stripPrefix("1.").takeWhile(_.isDigit)
  if (major.nonEmpty && major.toInt < 21)
    Seq("-XX:+UnlockDiagnosticVMOptions",
      "-XX:GCLockerRetryAllocationCount=512")
  else Seq.empty
}
