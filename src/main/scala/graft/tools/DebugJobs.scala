package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch debug main: run ONE SparkEntry query and print every Spark job
  * it submits (id, wall seconds, first-stage name) plus the gaps BETWEEN
  * jobs (driver-side work: filesystem ops, planning, fixture copies).
  * Args: sfDir query. Guide §1: measure first — this is the per-job
  * breakdown the Spark UI would give, printed to stdout. */
object DebugJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    case class J(id: Int, t0: Long, var t1: Long = 0L, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.headOption.map(_.name)).getOrElse("")
        jobs.put(e.jobId, J(e.jobId, e.time, desc = d.take(110)))
        order.add(e.jobId): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
    })

    names.foreach { name =>
      // warmup run: builds memoized fixtures, warms codegen — the profiled
      // run below is what Bench's min-of-2 actually measures
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      var prevEnd = 0L
      order.asScala.toSeq.foreach { id =>
        val j = jobs.get(id)
        val dur = (j.t1 - j.t0) / 1e3
        val gap = if (prevEnd > 0) (j.t0 - prevEnd) / 1e3 else 0.0
        prevEnd = math.max(prevEnd, j.t1)
        println(f"JOB ${j.id}%4d ${dur}%8.3f s  (gap ${gap}%7.3f s)  ${j.desc}")
      }
      println(f"TOTAL $name $total%8.3f s, ${order.size} jobs")
    }
    spark.stop()
  }
}
