package graft

import graft.ext.Triangles
import org.apache.spark.sql.functions._

/** Dev-only probe for the r12-verdict item: can a DISTRIBUTED pre-prune
  * cut the semi-join closure form's unpruned wedge shuffle past the
  * 10^8-edge Bloom-literal cap? Candidate = the broadcast-variable
  * Bloom (built distributively, shipped by torrent broadcast outside
  * the plan, UDF-evaluated map-side) in front of the same shuffled-hash
  * closing join. Measures, within ONE session at 1x (~2.4M) and 10x
  * (~24M) oriented edges, cheap-before-heavy with per-measurement
  * hygiene (the probe-ordering lesson):
  *
  *   semijoin   — plain shuffled-hash closure (the shipped >10^8 form)
  *   bcastbloom — broadcast-bloom pre-prune + shuffled-hash verify
  *   literal    — the plan-literal Bloom (the shipped <=10^8 form)
  *
  * Ship the prune only if bcastbloom beats semijoin >= 1.3x at 10x;
  * otherwise record the negative result in SCALING.md and close.
  * Row counts are printed for the identity check.
  *
  * Run: `sbt "Test/runMain graft.ProbeClosurePrune"`; paste the JSON
  * line into bench_records/.
  */
object ProbeClosurePrune {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("closureprune", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scale").toString

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges1x = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val e1xPath = s"$tmp/edges1x.parquet"
    edges1x.write.mode("overwrite").parquet(e1xPath)
    val replicas = spark.range(0, 10).select(col("id").as("replica"))
    val e10xPath = s"$tmp/edges10x.parquet"
    spark.read.parquet(e1xPath).crossJoin(broadcast(replicas))
      .select((col("src") + col("replica") * 10000000L).as("src"),
        (col("dst") + col("replica") * 10000000L).as("dst"))
      .write.mode("overwrite").parquet(e10xPath)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-26s ${sec}%8.3f s  rows=$rows  load=$load%.1f")
      results += s"${name}_sec" -> math.rint(sec * 1000) / 1000
      results += s"${name}_rows" -> rows
      results += s"${name}_load" -> math.rint(load * 10) / 10
    }

    for ((tag, path) <- Seq("1x" -> e1xPath, "10x" -> e10xPath)) {
      val edges = spark.read.parquet(path)
      results += s"${tag}_edges" -> edges.count()
      time(s"semijoin_$tag") { Triangles.perNodeSemiJoinClosure(edges).count() }
      time(s"bcastbloom_$tag") { Triangles.perNodeBroadcastBloomClosure(edges).count() }
      time(s"literal_$tag") { Triangles.perNode(edges).count() }
    }

    val json = results.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("CLOSUREPRUNE_JSON " + json)
    spark.stop()
  }
}
