ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stock_market_big_data_projectspark"
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
  // Partition-discovery listing threshold (spark default 32): below it the
  // driver lists directories itself; above it Spark launches a listing JOB
  // with one task per directory. The default is sized for object stores
  // (~10ms+ per LIST RPC); on the local filesystem a driver listing of a
  // few hundred dirs is microseconds while the 256-task listing job costs
  // ~0.4s — and the stored-index queries (bucket=N layouts) pay it on
  // every read. Parameterized for cluster runs (set 32 for S3/HDFS).
  "-Dspark.sql.sources.parallelPartitionDiscovery.threshold=" +
    sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "4096"),
)
