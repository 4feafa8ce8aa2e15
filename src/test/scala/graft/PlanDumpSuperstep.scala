package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write the g4-shaped superstep vote plan under the unsorted vs sorted
  * adjacency cache to plan-evidence files — the r20 sorted-cache change
  * cannot be seen in the registry queries' returned-frame plans (they
  * end in a checkpoint + orderBy), so this dumps the per-iteration join
  * itself. Usage: Test/runMain graft.PlanDumpSuperstep <outDir> [sfDir]
  */
object PlanDumpSuperstep {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("plan-superstep", 32)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    def edges: DataFrame = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    def dump(tag: String, sorted: Boolean): Unit = {
      val base = edges.select(col("src"), col("dst")).repartition(col("src"))
      val adj = (if (sorted) base.sortWithinPartitions(col("src")) else base).cache()
      adj.count()
      val nodes = adj.select(col("src").as("node"))
        .union(adj.select(col("dst").as("node"))).distinct()
      val labels = nodes.select(col("node"), col("node").as("label")).localCheckpoint(true)
      val votes = adj.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("votes"))
      val plan = votes.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val header = s"== g4 superstep vote plan, adjacency cache ${if (sorted) "SORTED by src (after)" else "unsorted (before)"}; sf=$sf ==\n"
      Files.write(Paths.get(outDir, s"g4_superstep_$tag.txt"),
        (header + plan).getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote g4_superstep_$tag.txt")
      adj.unpersist()
    }
    dump("before", sorted = false)
    dump("after", sorted = true)
    spark.stop()
  }
}
