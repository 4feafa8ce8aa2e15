package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-event-per-group ranking via `row_number()` — the reference's only
  * window function
  * (`src/main/java/com/retail/ml/ChurnPrediction.java:82-87`:
  * `row_number() OVER (PARTITION BY household_key, PRODUCT_ID ORDER BY day
  * ASC)` then `is_first_purchase = (row_num == 1)`).
  *
  * The reference's ordering is ambiguous on day ties; the engine appends a
  * unique key to the ordering so results are deterministic on any cluster
  * layout (SURVEY §7 hard part 4). One shuffle on the partition keys; the
  * window is rank-only (no frame), so it streams per partition without
  * buffering.
  */
object FirstPurchase {

  /** First order per customer: (o_custkey, o_orderkey, o_orderdate). */
  def apply(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
  }

  val oracle: String =
    """SELECT o_custkey, o_orderkey, o_orderdate FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn = 1""".stripMargin
}
