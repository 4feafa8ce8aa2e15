package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Zero-input streams: a pipeline started on a source that never
  * produces a batch (a quiet topic, an empty landing directory) must
  * complete `processAllAvailable` gracefully with zero output rows and
  * a clean stop — no state-function invocation, no watermark NPE.
  * The streaming twin of EmptyInputSpec.
  */
class EmptyStreamSpec extends AnyFunSuite with SharedSpark {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def run(name: String, mode: String,
                  out: org.apache.spark.sql.DataFrame): Long = {
    spark.catalog.dropTempView(name)
    val q = out.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      spark.table(name).count()
    } finally q.stop()
  }

  test("zero-input event streams emit nothing and stop cleanly") {
    def events = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
      .toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    assert(run("empty_hourly", "append",
      streaming.EventStream.hourlyAgg(events)) == 0L)
    assert(run("empty_totals", "update",
      streaming.EventStream.runningUserTotals(events)) == 0L)
    assert(run("empty_sessions", "append",
      streaming.EventStream.statefulSessions(events)) == 0L)
  }

  test("zero-input doc streams emit nothing and stop cleanly") {
    def docs = MemoryStream[(Long, String, java.sql.Timestamp)]
      .toDF().toDF("doc_id", "text", "ts")
    assert(run("empty_stats", "append",
      streaming.DocStream.tokenStats(docs.select(col("doc_id"), col("text")))) == 0L)
    assert(run("empty_dedup", "append",
      streaming.DocStream.dedupWithinWatermark(docs, "ts", "10 minutes")) == 0L)
  }
}
