package graft

import graft.analytics.Behavior
import java.sql.Timestamp

/** Hand fixtures for the behavioral pair (q117/q118): funnel strict
  * ordering and cohort retention counts. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")

  test("funnel: strict step ordering — early clicks don't count") {
    val events = Seq(
      // u1 completes in order: view@1 click@2 purchase@3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 clicks BEFORE the first view → stuck at stage 1
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // u3 never views → stage 0 despite purchase
      (3L, ts(1), "purchase"),
      // u4 view@1, click@2, but purchase@2 is NOT after click → stage 2
      (4L, ts(1), "view"), (4L, ts(2), "click"), (4L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").select("user_id", "stage").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 3), (2L, 1), (3L, 0), (4L, 2)))
  }

  test("retention: cohort day-offset counts") {
    def day(d: Int) = Timestamp.valueOf(f"2025-01-${d}%02d 12:00:00")
    val events = Seq(
      (1L, day(1)), (1L, day(1)), (1L, day(3)), // cohort d1, active d0 + d2
      (2L, day(1)),                             // cohort d1, active d0
      (3L, day(3))                              // cohort d3, active d0
    ).toDF("user_id", "ts")
    val got = Behavior.retention(events, "user_id", "ts")
      .orderBy("cohort", "day_n")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2025-01-01", 0, 2L), ("2025-01-01", 2, 1L),
      ("2025-01-03", 0, 1L)))
  }
}
