package graft.queries

import graft.core.Catalog
import graft.functions.Exact._
import graft.sources.Bucketing
import graft.transform.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-layout operators as gated queries: the salted skew join and the
  * bucketed fact-fact join. Both are *semantics-preserving* rewrites of a
  * plain inner equi-join, so both share the plain-join DuckDB oracle —
  * the correctness gate proves the rewrite changes the plan, never the
  * answer (the plan shapes themselves are pinned in PlanSpec /
  * BucketingSpec).
  */
object ScaleQueries {

  private val plainJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) OR abs(l_quantity) > 99999999999999.9 THEN NULL ELSE l_quantity END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Salted inner join (hot-key defense, [[SkewJoin.innerSalted]]) then
    * aggregate — must be row-identical to the unsalted join.
    */
  private def skewJoin(s: SparkSession, d: String): DataFrame = {
    val c = Catalog(s, d)
    val probe = c.lineitem.select(col("l_orderkey"), col("l_quantity"))
    val build = c.orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    SkewJoin.innerSalted(probe, build, "l_orderkey", saltBuckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
  }

  /** Bucketed fact-fact join: pay the shuffle once at write time
    * ([[Bucketing.writeBucketed]]), then join the two bucketed tables on
    * their bucket keys and aggregate. The write IS part of the measured
    * query — the point at 100 TB is that the layout cost is paid once
    * while every subsequent join on the key plans exchange-free
    * (BucketingSpec pins that plan with broadcast disabled).
    */
  private def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val c = Catalog(s, d)
    Bucketing.writeBucketed(
      c.lineitem.select("l_orderkey", "l_quantity"), "graft_q38_li", 8, "l_orderkey")
    Bucketing.writeBucketed(
      c.orders.select("o_orderkey", "o_orderpriority"), "graft_q38_ord", 8, "o_orderkey")
    Bucketing.bucketedJoin(s, "graft_q38_li", "graft_q38_ord", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
  }

  /** q59: deterministic dense global row index (1-based) over the
    * seeded shuffle order — the scale-safe `zipWithIndex`. Spark's own
    * options both fail the contract: `monotonically_increasing_id` is
    * neither dense nor stable across partitioning, and
    * `row_number() OVER (ORDER BY …)` funnels the corpus through one
    * task. [[graft.transform.Cumulative]]'s two-level prefix sum gives
    * the exact dense rank with every window partition-local; the order
    * key is the c5/c6 seeded-md5 convention, so the index IS the
    * position a trainer reads the doc at.
    */
  private def globalIndex(s: SparkSession, d: String): DataFrame =
    graft.transform.Cumulative.runningTotals(
      Catalog(s, d).documents
        .select(col("doc_id"),
          md5(concat(lit("graft-r9"), lit(":"), col("doc_id").cast("string"))
            .cast("binary")).as("order_key"))
        .withColumn("_one", lit(1L)),
      "order_key",
      graft.transform.Cumulative.hexPrefixBucket(col("order_key"), 2),
      Seq("_one" -> "idx"))
      .drop("_one")
      .orderBy(col("idx"))

  private val globalIndexOracle: String =
    """SELECT doc_id, md5('graft-r9:' || doc_id) AS order_key,
      |  CAST(row_number() OVER (ORDER BY md5('graft-r9:' || doc_id)) AS BIGINT) AS idx
      |FROM documents ORDER BY idx""".stripMargin

  /** q61: equal-frequency (decile) binning of a numeric column — the
    * standard feature-discretization op, done VALUE-based so ties land
    * in one bin deterministically (`ntile` splits ties by physical row
    * order and can never hash-gate). A value's bin is
    * `floor(10 * (c_v - 1) / N)` from its inclusive ECDF count `c_v`,
    * computed on the distinct-value frame through
    * [[graft.transform.Cumulative]] (no single-task global window),
    * then joined back to the rows. The distinct frame is the only
    * thing that moves through the prefix-sum machinery; the fact table
    * is touched by one aggregation and one join.
    */
  private def quantileBins(s: SparkSession, d: String): DataFrame = {
    val orders = Catalog(s, d).orders
    // deciles rank KNOWN prices: a NULL group would sit at opposite ends
    // of the two engines' cumulative windows (Spark NULLS FIRST, DuckDB
    // NULLS LAST) and shift every decile by its count; the final
    // equi-join drops null rows anyway
    val g = orders.filter(col("o_totalprice").isNotNull)
      .groupBy(col("o_totalprice").as("v"))
      .agg(count(lit(1)).as("n_v"))
    val bounds = g.agg(min(col("v")).as("_v0"), max(col("v")).as("_v1"))
    val bucket = floor((col("v") - col("_v0")) * lit(32.0d) /
      (col("_v1") - col("_v0") + lit(1.0d))).cast("int")
    // materialize: the prefix-sum input is a corpus-wide groupBy whose
    // output is tiny (distinct prices) — checkpointing it is near-free
    // and the agg evaluates once instead of twice (r17 A/B,
    // bench_records/r17_cumulative_ab.json)
    val cum = graft.transform.Cumulative.runningTotals(
      g.crossJoin(broadcast(bounds)), "v", bucket, Seq("n_v" -> "c_v"),
      materialize = true)
      .drop("_v0", "_v1")
    val total = g.agg(sum(col("n_v")).as("n_total"))
    val binned = cum.crossJoin(broadcast(total))
      .select(col("v"),
        floor(lit(10L) * (col("c_v") - lit(1L)) / col("n_total")).as("decile"))
    orders.select(col("o_orderkey"), col("o_totalprice").as("v"))
      .join(binned, Seq("v"))
      .select(col("o_orderkey"), col("v").as("o_totalprice"), col("decile"))
  }

  private val quantileBinsOracle: String =
    """WITH g AS (
      |  SELECT o_totalprice AS v, count(*) AS n_v FROM orders
      |  WHERE o_totalprice IS NOT NULL GROUP BY 1),
      |c AS (
      |  SELECT v, CAST(sum(n_v) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_v
      |  FROM g),
      |b AS (
      |  SELECT v,
      |    CAST(floor(10 * (c_v - 1) / (SELECT CAST(sum(n_v) AS BIGINT) FROM g))
      |      AS BIGINT) AS decile
      |  FROM c)
      |SELECT o_orderkey, o_totalprice, decile
      |FROM orders JOIN b ON o_totalprice = v""".stripMargin

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q37_skew_join" -> (skewJoin _, Some(plainJoinOracle)),
    "q38_bucketed_join" -> (bucketedJoin _, Some(plainJoinOracle)),
    "q59_global_index" -> (globalIndex _, Some(globalIndexOracle)),
    "q61_quantile_bins" -> (quantileBins _, Some(quantileBinsOracle))
  )
}
