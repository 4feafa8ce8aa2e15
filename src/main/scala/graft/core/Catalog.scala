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

  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[GraftSession]]) so
    * it arrives as nanos-since-epoch LongType, converted here to a proper
    * microsecond timestamp (integer DIV — no double round-trip, which
    * would lose precision above 2^53 ns).
    */
  def events: DataFrame = {
    val raw = table("events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
