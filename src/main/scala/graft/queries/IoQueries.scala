package graft.queries

import graft.core.Catalog
import graft.functions.Exact._
import graft.sources.CsvIo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink operator coverage (SURVEY §2.1): CSV round-trip with a
  * *declared* schema proves the CSV read path (S1/S8) produces results
  * identical to the parquet path — the oracle reads the original parquet.
  */
object IoQueries {

  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    CsvIo.write(Catalog(s, d).customer, s"$tmp/customer_csv")
    CsvIo.read(s, s"$tmp/customer_csv", CsvIo.customerSchema)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q20_csv_roundtrip" -> (
      (csvRoundtrip _),
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
