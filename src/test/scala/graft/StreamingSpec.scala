package graft

import graft.analytics.Events
import graft.core.Catalog
import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream equivalence: the streaming hourly aggregate over the same
  * files must produce exactly the batch result (complete output mode).
  */
class StreamingSpec extends AnyFunSuite with SharedSpark {

  test("streaming hourly aggregate == batch hourly aggregate") {
    // the file-stream source requires a directory; stage the single
    // events.parquet file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runToCompletion(spark, dir.toString)
      .selectExpr("hour", "event_type", "n_events", "total_value")
    val batch = Events.hourly(Catalog(spark, sf).events)
      .selectExpr("hour", "event_type", "n_events", "total_value")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming per-doc token stats == batch t1 projection") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val streamed = graft.streaming.DocStream.runStatsToCompletion(spark, dir.toString)
    val batch = graft.ext.TextStats.tokenCounts(Catalog(spark, sf).documents)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming digest dedup keeps one row per distinct content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val streamed = graft.streaming.DocStream.runDedupToCompletion(spark, dir.toString)
    val docs = Catalog(spark, sf).documents
    val distinctContents = docs.select(org.apache.spark.sql.functions.md5(
      org.apache.spark.sql.functions.col("text").cast("binary"))).distinct().count()
    assert(streamed.count() == distinctContents)
    // every surviving row is a real document row
    assert(streamed.drop("digest").exceptAll(docs).isEmpty)
  }
}
