package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the `documents` corpus — the streaming face
  * of the LLM-pipeline text operators (no reference counterpart; §2.11
  * north-star, same contract style as [[EventStream]]: the batch
  * operator IS the streaming correctness oracle).
  *
  * A training-data pipeline at 100 TB ingests continuously; the two
  * shapes that matter are (a) stateless per-document scoring, which
  * streams trivially because [[graft.ext.TextStats]] is a narrow
  * projection, and (b) stateful exact dedup, which becomes streaming
  * `dropDuplicates` on the content digest — one state row per distinct
  * digest, the digest (16 bytes) never the text.
  */
object DocStream {

  /** Schema of the documents source (TESTDATA layout). */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based streaming read of a documents directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Stateless per-doc token stats: the IDENTICAL
    * [[graft.ext.TextStats.tokenCounts]] projection, so the hash-gated
    * batch query (`t1_token_counts`) doubles as the streaming contract.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    graft.ext.TextStats.tokenCounts(docs)

  /** Streaming exact dedup: first arrival per content digest survives.
    * State is one row per distinct digest. Here the synthetic corpus has
    * no event time, so state is unbounded; a production ingest bounds it
    * with an arrival-time watermark + `dropDuplicatesWithinWatermark`
    * (dedup-within-horizon semantics).
    */
  def dedupByDigest(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text").cast("binary")))
      .dropDuplicates("digest")

  private def runToCompletion(df: DataFrame, queryName: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(queryName)
  }

  /** Run [[tokenStats]] / [[dedupByDigest]] over a static directory to
    * completion via the in-memory sink (test harness, as in
    * [[EventStream.runToCompletion]]).
    */
  def runStatsToCompletion(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(tokenStats(readStream(spark, dir)), "graft_doc_stats")

  def runDedupToCompletion(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(dedupByDigest(readStream(spark, dir)), "graft_doc_dedup")
}
