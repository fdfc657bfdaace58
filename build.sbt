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

// ── Parallel test groups (r17, VERDICT item 3) ──
// The ScalaTest suite is ~1300 s of body time spread flat across 45
// suites; a single forked JVM runs them serially (~25-32 min wall) and
// r16 shipped tests_ok:false on the driver's test-budget kill. The
// suites are independent — each JVM builds its own SparkSession
// (local[4], its own temp warehouse) and all scratch state lives in
// per-process temp dirs — so they split across SPARK_GRAFT_TEST_FORKS
// forked JVMs (default 6 ≈ 24 cores at local[4] each, ~48 GiB heap
// ceiling on this 128 GiB box; ~5 min wall). Longest-processing-time
// bin packing over the measured per-suite seconds below keeps the
// groups balanced; unknown/new suites default to 10 s.
val testForks = sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "6").toInt
val suiteWeights: Map[String, Int] = Map(
  "AnalysisSpec" -> 89, "AnnSpec" -> 136, "BehaviorSpec" -> 10,
  "BpeSpec" -> 23, "BreadthSpec" -> 10, "CheckpointSpec" -> 22,
  "CompactionSpec" -> 18, "CuratePipelineSpec" -> 35, "CurateSpec" -> 23,
  "DedupSpec" -> 25, "ExpressionSpec" -> 2, "ExtensionsSpec" -> 2,
  "ForecastSpec" -> 19, "FormatsSpec" -> 6, "GrangerSpec" -> 4,
  "GraphAnnSpec" -> 120, "GraphSpec" -> 98, "IndicatorsSpec" -> 88,
  "LayoutSpec" -> 3, "LinkSpec" -> 2, "MaintenanceSpec" -> 65,
  "MixSpec" -> 7, "OpsSpec" -> 4, "PipelineSpec" -> 7,
  "PlanLintSpec" -> 1, "PqIndexSpec" -> 17, "PropertySpec" -> 53,
  "RetrievalSpec" -> 15, "ScaleSpec" -> 58, "SessionizeSpec" -> 9,
  "SnapshotIsolationSpec" -> 44, "StreamingAnnSpec" -> 16,
  "StreamingDedupSpec" -> 41, "StreamingGraphAnnSpec" -> 27,
  "StreamingLexSpec" -> 48, "StreamingLmSpec" -> 7,
  "StreamingMergeSpec" -> 3, "StreamingNgramsSpec" -> 2,
  "StreamingPipelineSpec" -> 14, "StreamingPqSpec" -> 9,
  "StreamingSketchSpec" -> 8, "StreamingSpec" -> 10,
  "TextSignalsSpec" -> 15, "TombstoneSpec" -> 126, "TweetTextSpec" -> 1)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def weight(t: TestDefinition): Int =
    suiteWeights.getOrElse(t.name.split('.').last, 10)
  val load = Array.fill(testForks)(0L)
  val groups = Array.fill(testForks)(Vector.newBuilder[TestDefinition])
  tests.sortBy(t => (-weight(t), t.name)).foreach { t =>
    val i = load.indexOf(load.min)
    groups(i) += t
    load(i) += weight(t)
  }
  groups.toSeq.zipWithIndex.flatMap { case (g, i) =>
    val sel = g.result()
    if (sel.isEmpty) None
    else Some(Tests.Group(s"graft-tests-$i", sel,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))))
  }
}
// sbt's default restrictions cap forked test groups at 1 — lift it to
// the fork count (and keep an overall task ceiling at the core count)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, testForks))
