package graft.queries

import graft.analytics.Etl
import graft.core.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The composed-ETL outputs as gated queries: each of the four tables the
  * reference pipeline materializes, rebuilt from the shared clean base
  * and hash-checked against a DuckDB twin of the whole composition
  * (base CTE + output query). The write path (partitioned sinks,
  * conditional partitionBy) is exercised by EtlSpec via [[Etl.run]].
  */
object EtlQueries {

  private def base(s: SparkSession, d: String): DataFrame = {
    val cat = Catalog(s, d)
    Etl.cleanBase(cat.lineitem, cat.orders)
  }

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(

    // distinct (basket, product) transaction table
    "q31_etl_transactions" -> (
      ((s: SparkSession, d: String) => Etl.transactions(base(s, d))),
      Some(s"""WITH ${Etl.baseOracle}
              |SELECT DISTINCT basket_id, product_id FROM base
              |WHERE basket_id IS NOT NULL AND product_id IS NOT NULL""".stripMargin)),

    // weekly demand per (store, product) with conditional week_no derivation
    "q32_etl_weekly" -> (
      ((s: SparkSession, d: String) => Etl.weeklyDemand(base(s, d))),
      Some(s"""WITH ${Etl.baseOracle}
              |SELECT store_id, product_id,
              |  CAST(CEIL(day / 7.0) AS BIGINT) AS week_no,
              |  CAST(CAST(SUM(CAST(floor(CASE WHEN net_sales IS NULL OR isnan(net_sales) OR abs(net_sales) > 900000000000000.0 THEN NULL ELSE net_sales END * 10000) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / 10000 AS total_net_sales,
              |  SUM(quantity) AS total_quantity,
              |  CAST(CAST(SUM(CAST(floor(${graft.functions.Exact.sqlQGuard("unit_price")} * 10000) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / (10000 * COUNT(unit_price)) AS avg_unit_price,
              |  CAST(CAST(SUM(CAST(CASE WHEN discount_rate IS NULL OR isnan(discount_rate) OR abs(discount_rate) > 99999999999999.9 THEN NULL ELSE discount_rate END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) / COUNT(discount_rate) AS avg_discount_rate,
              |  MAX(is_discounted) AS is_discounted
              |FROM base
              |GROUP BY 1, 2, 3""".stripMargin)),

    // customer RFM + UNKNOWN-filled demographics
    "q33_etl_customer" -> (
      ((s: SparkSession, d: String) => Etl.customerProfile(base(s, d), Catalog(s, d).customer)),
      Some(s"""WITH ${Etl.baseOracle},
              |m AS (SELECT max(day) AS gmax FROM base)
              |SELECT b.household_key,
              |  CAST(count(DISTINCT b.basket_id) AS BIGINT) AS frequency,
              |  CAST(CAST(SUM(CAST(floor(CASE WHEN b.net_sales IS NULL OR isnan(b.net_sales) OR abs(b.net_sales) > 900000000000000.0 THEN NULL ELSE b.net_sales END * 10000) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / 10000 AS monetary,
              |  (SELECT gmax FROM m) - max(b.day) AS recency,
              |  coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
              |  coalesce(c.c_name, 'UNKNOWN') AS c_name
              |FROM base b LEFT JOIN customer c ON b.household_key = c.c_custkey
              |GROUP BY b.household_key, c.c_mktsegment, c.c_name""".stripMargin)),

    // wide per-line item table with part attributes
    "q34_etl_item" -> (
      ((s: SparkSession, d: String) => Etl.itemTable(base(s, d), Catalog(s, d).part)),
      Some(s"""WITH ${Etl.baseOracle}
              |SELECT b.household_key, b.basket_id, b.day, b.product_id, b.quantity,
              |  b.net_sales, b.store_id, b.unit_price, b.discount_rate, b.is_discounted,
              |  p.p_brand, p.p_type
              |FROM base b JOIN part p ON b.product_id = p.p_partkey""".stripMargin)),

    // ingest-time column hygiene gated end to end [P4, P5]:
    // reference-style "Spaced Caps" headers normalized to
    // lower_snake_case, a fully-null legacy column dropped by the
    // single-pass null scan, and a PARTIALLY-null column that must
    // survive the drop. The gate bites on column names: a missed
    // rename or an undropped/overdropped column is a schema mismatch.
    "q44_clean_columns" -> (
      ((s: SparkSession, d: String) => {
        import graft.transform.Cleaning
        import org.apache.spark.sql.functions._
        val messy = Catalog(s, d).customer.select(
          col("c_custkey").as("C CustKey"),
          col("c_name").as("C Name"),
          col("c_acctbal").as("C AcctBal"),
          when(pmod(col("c_custkey"), lit(10)) === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("Mkt Segment"),
          lit(null).cast("string").as("Legacy Code"))
        Cleaning.dropAllNullColumns(Cleaning.normalizeNames(messy))
      }),
      Some("""SELECT c_custkey, c_name, c_acctbal,
             |  CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_mktsegment END AS mkt_segment
             |FROM customer""".stripMargin))
  )
}
