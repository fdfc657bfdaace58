package graft.ops

import java.util.concurrent.{Callable, ExecutionException, Executors, ThreadFactory}

/** Run INDEPENDENT Spark actions concurrently from the driver — the
  * guide-§2.6 pattern ("overlap independent jobs"): Spark's scheduler
  * happily runs several jobs at once inside one application; actions are
  * only sequential because driver code calls them sequentially. The
  * per-family maintenance campaigns ([[graft.streaming.Takedown]],
  * [[graft.streaming.Maintenance]]) are exactly this shape — five index
  * families on five DISJOINT roots, each a chain of small jobs plus
  * driver-side filesystem work; running them on a small pool overlaps
  * both the jobs and the FS gaps, locally and on a cluster (tail
  * back-fill).
  *
  * Safety contract of every call site: the thunks must touch disjoint
  * on-disk roots (each family action serializes on its own root's write
  * lease as always) and share no mutable driver state. Results come back
  * in input order; the first failure propagates as its original
  * exception. Job descriptions/groups are thread-local in Spark, so
  * per-thunk labels stay correct. */
object Par {

  private val factory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  }

  /** Map `f` over `items` on a bounded pool (one slot per item, at most
    * `maxThreads`). Single-item (or empty) input short-circuits to a
    * plain map — no pool, no thread hop. */
  def map[A, B](items: Seq[A], maxThreads: Int = 8)(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0) return items.map(f)
    // active-session is thread-local; re-bind the caller's one in workers
    // so session-dependent paths (implicits, conf reads) see it
    val sess = org.apache.spark.sql.SparkSession.getActiveSession
    val pool = Executors.newFixedThreadPool(
      math.min(items.size, maxThreads), factory)
    try {
      val futures = items.map { a =>
        pool.submit(new Callable[B] {
          def call(): B = {
            sess.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
            f(a)
          }
        })
      }
      futures.map { fu =>
        try fu.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
