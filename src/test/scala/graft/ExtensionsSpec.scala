package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-installation surface: `spark.sql.extensions=graft.GraftExtensions`
  * makes the native functions available from pure SQL in a fresh session,
  * and the runtime Bloom-filter join filter prunes the probe side of a
  * selective join when enabled — the at-scale configuration for
  * fact-to-filtered-dim joins too big to broadcast. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs native functions into a new session") {
    spark.range(1).count() // force the shared fixture context to exist
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the test SparkContext; `spark.sql.extensions` is read from
      // the SparkContext conf at context creation, so in-JVM we exercise
      // the same class through the builder's withExtensions hook
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        """SELECT round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
          |       graft_simhash(array(1L, 3L, 3L)) AS h""".stripMargin).head()
      assert(r.getDouble(0) == 1.0)
      assert(r.getLong(1) == 3L) // majority bits of {1,3,3} = 0b11
      // the series-scan family installs too (pure-SQL surface): EMA over
      // [1, 3] at alpha=0.5 → [1.0, 0.5*1 + 0.5*3 = 2.0]
      val e = s2.sql(
        "SELECT graft_ema_scan(array(1.0D, 3.0D), 0.5, 0.5) AS s").head()
      assert(e.getSeq[Double](0) == Seq(1.0, 2.0))
      val g = s2.sql(
        "SELECT graft_cusum_scan(array(2.0D, 0.0D), 1.0D) AS s").head()
      val cs = g.getSeq[org.apache.spark.sql.Row](0)
      assert(cs.map(_.getDouble(0)) == Seq(1.0, 0.0)) // u: max(0, ·)
      assert(cs.map(_.getDouble(1)) == Seq(0.0, -1.0)) // d: min(0, ·)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test tables are tiny; drop the size floors so injection triggers
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
      spark.range(100000).select(col("id").as("fk"),
        (col("id") % 1000).as("v")).write.parquet(s"$dir/fact")
      spark.range(10000).select(col("id").as("pk"),
        (col("id") % 50).as("cat")).write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 7)
      val joined = fact.join(dim, col("fk") === col("pk"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom"), plan.take(2000))
      assert(joined.count() == 200) // 10000/50 dim survivors × 1 fact row each
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
