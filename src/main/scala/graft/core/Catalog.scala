package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over a scale-factor directory of parquet files
  * (`/root/testdata/sf*` layout, see TESTDATA.md).
  *
  * The reference loads every table through a single helper with schema
  * inference (`src/main/java/com/retail/ingestion/DataLoader.java:9-11`);
  * here parquet carries its own schema so the catalog is a thin path
  * mapper. CSV ingestion with *declared* schemas (the engine's fix for the
  * reference's inferSchema double-scan anti-pattern, SURVEY §4) lives in
  * [[graft.sources.CsvIo]].
  */
final case class Catalog(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events.ts` has shipped under several parquet footer encodings across
    * driver runtimes (TIMESTAMP_NTZ micros today; TIMESTAMP(NANOS) read as
    * LongType under the legacy flag before). All arrival shapes normalize
    * to ONE canonical `TimestampType` here — see [[EventTime.normalizeTs]],
    * the single ingestion code path shared with the streaming source
    * ([[graft.streaming.EventStream.readStream]]).
    */
  def events: DataFrame = EventTime.normalizeTs(table("events"))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
