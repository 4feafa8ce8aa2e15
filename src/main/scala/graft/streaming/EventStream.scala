package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table.
  *
  * The reference has no streaming at all (SURVEY §2.11); this is the
  * north-star extension. The streaming aggregates are defined to match
  * the batch semantics in [[graft.analytics.Events]] exactly, so the
  * batch oracle doubles as the streaming correctness contract (tested by
  * running the stream to completion over the same files).
  *
  * Scale: watermark + tumbling window keeps state bounded (one state row
  * per open (window, event_type)); `maxFilesPerTrigger` paces backfill.
  */
object EventStream {

  /** Schema of the events source as it arrives post nanos->long read
    * (see [[graft.core.Catalog.events]]).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),   // nanos since epoch (legacy read)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming read of an events directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling 1-hour window aggregate with a 2-hour watermark — the
    * streaming twin of `Events.hourly`.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"), col("total_value"))

  /** Arbitrary stateful streaming (`mapGroupsWithState`): per-user running
    * totals maintained across micro-batches — the engine's
    * `KeyValueGroupedDataset` custom-state surface (north-star §2.11).
    */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          (user, n, v)
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Run the hourly aggregate over a static directory to completion via
    * the in-memory sink; returns the result table. Used by tests to prove
    * batch/stream equivalence.
    */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String = "graft_stream"): DataFrame = {
    val q: StreamingQuery = hourlyAgg(readStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
