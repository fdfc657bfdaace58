package graft.ops

import org.apache.spark.sql.SparkSession

/** Label the Spark jobs submitted inside `body` (guide §1.5: when a
  * program runs many queries, label them so the UI — and DebugJobs — is
  * readable). Job descriptions are thread-local, so concurrent
  * maintenance campaigns ([[Par]]) label their own jobs correctly; the
  * previous description is restored on exit so nested labels compose
  * (innermost wins while it runs). Purely observability — no effect on
  * plans or results. */
object Jobs {
  def labeled[A](spark: SparkSession, desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
