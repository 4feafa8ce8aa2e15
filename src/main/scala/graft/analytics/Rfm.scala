package graft.analytics

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) per customer.
  *
  * Engine analog of the reference's RFM aggregate
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:178-187`:
  * `groupBy(household_key).agg(max(day), countDistinct(basket_id),
  * sum(net_sales))`, recency = global max(day) − last_day, where the global
  * max is pulled to the driver with `first()` [A4]).
  *
  * Scale notes: `countDistinct` is exact here for oracle parity; at 100 TB
  * the documented variant is `approx_count_distinct` (SURVEY §7 known hard
  * part 6). The global max is a one-row aggregate joined back via a
  * broadcast cross-join — no driver round-trip, no shuffle of the big side.
  */
object Rfm {

  def apply(orders: DataFrame): DataFrame = {
    val maxDay = orders.agg(max(col("o_orderdate")).as("global_max_date"))
    orders
      .groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order_date"),
        countDistinct(col("o_orderkey")).as("frequency"),
        dsum(col("o_totalprice")).as("monetary")
      )
      .crossJoin(broadcast(maxDay))
      .withColumn("recency_days", datediff(col("global_max_date"), col("last_order_date")))
      .drop("global_max_date")
  }

  val oracle: String =
    """WITH m AS (SELECT max(o_orderdate) AS global_max_date FROM orders)
      |SELECT o_custkey,
      |  max(o_orderdate) AS last_order_date,
      |  count(DISTINCT o_orderkey) AS frequency,
      |  CAST(CAST(SUM(CAST(CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) OR abs(o_totalprice) > 99999999999999.9 THEN NULL ELSE o_totalprice END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS monetary,
      |  datediff('day', CAST(max(o_orderdate) AS DATE), CAST((SELECT global_max_date FROM m) AS DATE)) AS recency_days
      |FROM orders
      |GROUP BY o_custkey""".stripMargin
}
