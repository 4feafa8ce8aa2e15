package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source/sink with *declared* schemas.
  *
  * The reference reads every CSV with `inferSchema=true`
  * (`src/main/java/com/retail/ingestion/DataLoader.java:9-11`), which
  * costs a full extra pass over the data before any query runs — at 100 TB
  * that is a 100 TB pre-scan. The engine declares schemas up front
  * (SURVEY §1 mapping) and keeps inference as an explicit opt-in.
  * [S1, S2, S8]
  */
object CsvIo {

  /** Declared schema for the `customer` table (TESTDATA.md layout). */
  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** Declared schema for the `nation` table (TESTDATA.md layout). */
  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** Round-trip-faithful CSV options, shared by both directions. The
    * defaults LOSE information (found by the r13 hostile probe):
    * the writer trims whitespace-only values to "" (univocity
    * ignore*WhiteSpace defaults true on WRITE), and NULL and "" both
    * serialize to an empty field, collapsing distinct group keys on
    * read-back. An explicit NULL token plus disabled trimming makes
    * write∘read the identity on any string value.
    */
  private[sources] val faithful: Map[String, String] = Map(
    "header" -> "true",
    "nullValue" -> "\\N",
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(faithful).schema(schema).csv(path)

  /** Opt-in inference, reference-parity behavior. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.options(faithful).option("inferSchema", "true").csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(faithful).csv(path)

  /** Single-file CSV report (reference: `coalesce(1)` at
    * `scripts/basket-analysis/top_products_by_count.py:21`) — only for
    * report-sized outputs; a single part-file is a deliberate
    * anti-parallelism choice. [S6]
    */
  def writeSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").options(faithful).csv(path)
}
