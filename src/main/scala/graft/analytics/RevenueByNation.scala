package graft.analytics

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-way star join + aggregate — engine analog of the reference's
  * fact x dimension joins
  * (`src/main/java/com/retail/ml/SegmentationFeatureEngineering.java:33-35`:
  * tx ⋈ product ⋈ demographics then per-key aggregate [J1, J2, A6]),
  * shaped as revenue by supplier nation within a region.
  *
  * Scale: the fact table joins three *dimension* tables — all broadcast
  * (supplier at TPC-H scale is 10^-4 of lineitem; nation/region are tiny),
  * so the only shuffle in the whole plan is the final partial/final hash
  * aggregate on a 25-key space. The region filter is applied to the
  * dimension *before* the join, so broadcast rows are pre-pruned.
  */
object RevenueByNation {

  def apply(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
            region: DataFrame, regionName: String = "ASIA"): DataFrame = {
    val dims = supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(
        // per-row scale-4 rounding before the sum: see PricingSummary note
        qsumD(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  def oracle(regionName: String): String =
    s"""SELECT n_name,
       |  CAST(CAST(SUM(CAST(floor(CASE WHEN CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4))) IS NULL OR abs(CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4)))) > CAST(900000000000000.0 AS DECIMAL(38,8)) THEN NULL ELSE CAST(CASE WHEN l_extendedprice IS NULL OR isnan(l_extendedprice) OR abs(l_extendedprice) > 99999999999999.9 THEN NULL ELSE l_extendedprice END AS DECIMAL(19,4)) * (CAST(1 AS DECIMAL(19,4)) - CAST(CASE WHEN l_discount IS NULL OR isnan(l_discount) OR abs(l_discount) > 99999999999999.9 THEN NULL ELSE l_discount END AS DECIMAL(19,4))) END * 10000) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / 10000 AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$regionName'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name ASC""".stripMargin
}
