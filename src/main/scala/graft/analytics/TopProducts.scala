package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-K products by transaction count — engine analog of
  * `scripts/basket-analysis/top_products_by_count.py:17-24`
  * (`groupBy(PRODUCT_ID, product_name).agg(count(lit(1))).orderBy(desc)
  * .limit(topN)`), with a unique tie-break key appended so the K-th place
  * is deterministic (the reference's bare sort-by-count is not).
  *
  * Catalyst plans sort+limit as TakeOrderedAndProject: each partition
  * keeps its local top K and only K rows per partition reach the driver —
  * no global sort, safe at any scale. The dimension join happens *after*
  * the aggregate on the already-tiny top-K set, and broadcasts.
  */
object TopProducts {

  def apply(lineitem: DataFrame, part: DataFrame, k: Int = 25): DataFrame =
    lineitem
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("tx_count"))
      .orderBy(col("tx_count").desc, col("l_partkey").asc)
      .limit(k)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("partkey"), col("p_name").as("part_name"), col("tx_count"))
      .orderBy(col("tx_count").desc, col("partkey").asc)

  def oracle(k: Int): String =
    s"""SELECT t.l_partkey AS partkey, p.p_name AS part_name, t.tx_count
       |FROM (
       |  SELECT l_partkey, count(*) AS tx_count FROM lineitem
       |  GROUP BY l_partkey ORDER BY tx_count DESC, l_partkey ASC LIMIT $k) t
       |JOIN part p ON t.l_partkey = p.p_partkey
       |ORDER BY t.tx_count DESC, partkey ASC""".stripMargin
}
