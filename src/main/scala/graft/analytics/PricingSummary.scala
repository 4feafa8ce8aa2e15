package graft.analytics

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-measure hash aggregation over the fact table — the engine's
  * analog of the reference's weekly-demand rollup
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:164-173`:
  * `groupBy(store,product,week).agg(sum, avg, max)` with max-as-boolean-OR
  * flags), re-expressed over `lineitem`.
  *
  * Scale: a single hash aggregate with map-side partial aggregation — the
  * shuffle carries one row per group, not per input row. Grouping keys are
  * low-cardinality (flag x status), so at 100 TB the reduce side is tiny;
  * all cost is the scan, which prunes to exactly the 7 referenced columns.
  */
object PricingSummary {

  /** TPC-H Q1-shaped summary: per (returnflag, linestatus) totals. */
  def apply(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // product rounded back to scale 4 per row before the exact sum:
        // a scale-8 sum can exceed 2^53 quanta at large SF, where the
        // decimal->double conversion is no longer engine-identical.
        // dsumD keeps the saturating clamp in the DECIMAL domain — the
        // double-literal clamp in dsum would coerce the exact product
        qsumD(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Oracle SQL (DuckDB) computing the identical result bit-for-bit. */
  val oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) OR abs(l_quantity) > 99999999999999.9 THEN NULL ELSE l_quantity END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(floor(CASE WHEN CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4))) IS NULL OR abs(CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4)))) > CAST(900000000000000.0 AS DECIMAL(38,8)) THEN NULL ELSE CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4))) END * 10000) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / 10000 AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) OR abs(l_quantity) > 99999999999999.9 THEN NULL ELSE l_quantity END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(CAST(SUM(CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
