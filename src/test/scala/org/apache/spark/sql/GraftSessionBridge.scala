package org.apache.spark.sql

/** `SparkSession.sharedState` (and the CacheManager on it) is
  * `private[sql]` in Spark 4 — this shim re-exports the one probe graft
  * needs: whether any `Dataset.cache()` entry is still registered. Used
  * by CacheHygieneSpec to pin the operator contract that every
  * multi-pass operator (the iterative graph family, the dedup pair
  * detectors) releases the caches it takes before returning — a
  * CacheManager entry is never reclaimed automatically, so a leaked one
  * holds executor memory for the life of the session, while the
  * `localCheckpoint` blocks the operators keep instead are
  * ContextCleaner-managed (freed when the frame is GC'd).
  */
object GraftSessionBridge {
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
