package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + domain fixtures (FIXTURES.md §B: 4 symbols × 240 hourly
  * snapshots, seed 42, injected duplicates/nulls — mirroring the reference's
  * source schemas, SURVEY.md §1.4). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLongKey, "true")
      // wall-clock GC floor off: the compaction specs fold/recluster in
      // rapid fire and assert the generation-counting reaps — the floor
      // (default 30 min) gets its own arm with a temporary conf.set
      .config("spark.graft.gcGraceMinutes", "0")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
