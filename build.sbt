ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "travelpulsesparkstreamtourismanalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Kafka end-to-end path (opt-in: sbt -Dgraft.kafka=1 ...). The connector is
// NOT in /opt/spark/jars and this sandbox has no network, so resolution
// fails here by construction (docs/KAFKA.md records the attempt log and the
// pinned deploy recipe); on a networked machine the same flag pulls the
// exact connector matching the bundled Spark and KafkaE2ESpec un-cancels.
libraryDependencies ++= (if (sys.props.contains("graft.kafka")) Seq(
  "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2",
  "org.apache.kafka" % "kafka-clients" % "3.9.1" % Test,
) else Seq())
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, UNPREFIXED: sbt's default
// LoggedOutput wraps every forked line as "[info] ...", which defeats any
// caller that parses the process's final JSON line (Bench's record summary
// arrived as "[info] {...}" for three rounds running). StdoutOutput passes
// the child's stdout through verbatim.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // r17: a full sf100 bench run died with a spurious "Java heap space"
  // OOM at 64 g — G1's GCLocker starvation ("Retried waiting for GCLocker
  // too often allocating 7 words"): the default retry count is 2, and
  // heavy JNI-critical traffic (parquet/lz4) can exhaust it while the
  // heap is mostly free. Raising the retry bound removes the spurious
  // kill without touching real-OOM behavior.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=8",
)
