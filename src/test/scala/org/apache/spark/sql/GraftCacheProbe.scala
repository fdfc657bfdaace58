package org.apache.spark.sql

/** Test-only probe: number of entries the session's CacheManager holds.
  * The CacheManager keeps persisted DataFrame plans STRONGLY until an
  * explicit unpersist/clearCache (the ContextCleaner only frees block data
  * of GC'd RDDs, never CacheManager entries), so "entry count returned to
  * baseline" is the precise, deterministic no-leak assertion for operators
  * that persist internal frames. */
object GraftCacheProbe {
  def cachedEntryCount(spark: SparkSession): Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[_]].size
  }
}
