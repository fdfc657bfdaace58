package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** flatMapGroupsWithState sessionization: sessions split on the inactivity
  * gap and close as the watermark advances (SURVEY.md §5.5 streaming tests). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2025-08-01 00:00:00").getTime + s * 1000L)

  test("sessions split on gap and close via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(input.toDS(), gapSeconds = 30L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // session 1: events at 0s,10s; gap >30s; session 2: 60s,65s
    input.addData(
      Sessionize.Event("u1", t(0), 1.0), Sessionize.Event("u1", t(10), 2.0),
      Sessionize.Event("u1", t(60), 3.0), Sessionize.Event("u1", t(65), 4.0))
    q.processAllAvailable()
    // advance watermark far past session 2's end + gap
    input.addData(Sessionize.Event("u2", t(300), 9.0))
    q.processAllAvailable()
    input.addData(Sessionize.Event("u2", t(600), 9.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions").as[Sessionize.Session].collect()
      .filter(_.key == "u1").sortBy(_.start.getTime)
    assert(got.length == 2)
    assert(got(0).n_events == 2 && got(0).sum_value == 3.0 &&
      got(0).start == t(0) && got(0).end == t(10))
    assert(got(1).n_events == 2 && got(1).sum_value == 7.0 &&
      got(1).start == t(60) && got(1).end == t(65))
  }

  test("file-source sessionize stream equals the oracle-checked q45 " +
       "batch sessions, row for row") {
    // the real driver fixture through a genuine file stream (the q136
    // pattern applied to STATEFUL sessionization): drain with AvailableNow
    // into a parquet sink, flush pending sessions by advancing the global
    // watermark with a far-future sentinel, then set-compare against the
    // exact frame the q45 DuckDB oracle hash-checks
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_q45").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val chk = s"$dir/chk"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("user_id").cast("string").as("key"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("value"))
    events.write.parquet(in)
    def drain(): Unit = {
      val q = Sessionize.sessions(
          spark.readStream.schema(events.schema).parquet(in)
            .as[Sessionize.Event],
          gapSeconds = 1800L)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    // sentinel: one far-future event pushes the watermark past every
    // pending session's end + gap, so EventTimeTimeout closes them all
    Seq(Sessionize.Event("_flush",
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
      .toDS().write.mode("append").parquet(in)
    drain()
    import org.apache.spark.sql.functions.{col, round}
    val got = spark.read.parquet(out).filter(col("key") =!= "_flush")
      .select(col("key"), col("start"), col("end"), col("n_events"),
        round(col("sum_value"), 6).as("sv"))
    val want = graft.queries.AnalyticsQueries
      .queries("q45_session_window")(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string").as("key"),
        col("session_start").as("start"), col("session_end").as("end"),
        col("n_events"), round(col("sum_value"), 6).as("sv"))
    val n = want.count()
    assert(n > 0 && got.count() == n)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("a late event within the gap extends the session backward") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(input.toDS(), gapSeconds = 30L)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData(Sessionize.Event("u1", t(30), 1.0))
    q.processAllAvailable()
    // late event 5s BEFORE the session start (inside the 10s watermark, so
    // it reaches the operator) → merges and moves the session start back
    input.addData(Sessionize.Event("u1", t(25), 2.0))
    q.processAllAvailable()
    input.addData(Sessionize.Event("u2", t(500), 9.0)) // advance watermark
    q.processAllAvailable()
    input.addData(Sessionize.Event("u2", t(900), 9.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_late").as[Sessionize.Session].collect()
      .filter(_.key == "u1")
    assert(got.length == 1)
    assert(got(0).start == t(25) && got(0).end == t(30) &&
      got(0).n_events == 2 && got(0).sum_value == 3.0)
  }
}
