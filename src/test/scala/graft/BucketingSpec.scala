package graft

import graft.core.Catalog
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SharedSpark {

  test("bucketed fact-fact equi-join plans with no exchange on either side") {
    val c = Catalog(spark, sf)
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    Bucketing.writeBucketed(
      c.lineitem.select("l_orderkey", "l_quantity"), "graft_li_bucketed", 8, "l_orderkey")
    Bucketing.writeBucketed(
      c.orders.select("o_orderkey", "o_totalprice"), "graft_ord_bucketed", 8, "o_orderkey")
    // disable broadcast so the join would otherwise be a shuffled
    // sort-merge — the bucket layout must be what removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(
        spark, "graft_li_bucketed", "graft_ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // same result as the plain (shuffling) join
      val expected = c.lineitem.join(c.orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
      // bucket pruning: an equality filter on the bucket key scans one
      // bucket, not the table (auto-bucketed-scan turns the layout off
      // for plans that don't need the distribution — disable it so the
      // scan stays bucketed and prunable)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val pruned = spark.table("graft_ord_bucketed").filter(col("o_orderkey") === 42L)
          .queryExecution.executedPlan.toString
        assert(pruned.contains("SelectedBucketsCount: 1 out of 8"),
          s"no bucket pruning:\n$pruned")
      } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
