package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop probe: what join strategy does each graph superstep get, and
  * what do the sorted-cache / broadcast-small-side variants buy?
  *
  * The iterative operators (PageRank / LabelPropagation / BfsHops) join a
  * cached multi-million-row adjacency to a ~|nodes|-row checkpointed
  * frame every round; a LogicalRDD has no stats, so the planner cannot
  * pick broadcast on its own.
  */
object ProbeIterJoin {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-iterjoin", 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    li.count()
    def edges: DataFrame = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))

    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-34s min ${ts.map(_._1).min}%.2f s  (${ts.map(t => f"${t._1}%.2f").mkString(", ")})  n=${ts.head._2}")
    }

    // --- one g4-shaped superstep chain, three adjacency treatments ---
    def lpRun(adjBuild: DataFrame => DataFrame, bcastLabels: Boolean): Long = {
      val adj = adjBuild(edges.select(col("src"), col("dst"))).cache()
      try {
        val nodes = adj.select(col("src").as("node"))
          .union(adj.select(col("dst").as("node"))).distinct()
        var labels = nodes.select(col("node"), col("node").as("label"))
        for (_ <- 1 to 3) {
          val lab = if (bcastLabels) broadcast(labels.withColumnRenamed("node", "src"))
                    else labels.withColumnRenamed("node", "src")
          val votes = adj.join(lab, Seq("src"))
            .groupBy(col("dst"), col("label"))
            .agg(count(lit(1)).as("votes"))
          val picked = votes
            .groupBy(col("dst"))
            .agg(max(struct(col("votes"), (-col("label")).as("neg"))).as("m"))
            .select(col("dst").as("node"), (-col("m.neg")).as("new_label"))
          labels = labels
            .join(picked, Seq("node"), "left")
            .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
            .localCheckpoint(true)
        }
        labels.count()
      } finally adj.unpersist()
    }

    // show the superstep join strategy under the current build
    {
      val adj = edges.select(col("src"), col("dst")).repartition(col("src")).cache()
      adj.count()
      val nodes = adj.select(col("src").as("node"))
        .union(adj.select(col("dst").as("node"))).distinct()
      val labels = nodes.select(col("node"), col("node").as("label")).localCheckpoint(true)
      val votes = adj.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("votes"))
      println("[probe] === current superstep plan (g4 shape) ===")
      votes.explain("formatted")
      adj.unpersist()
    }

    timed("g4 current (repart)")(lpRun(_.repartition(col("src")), bcastLabels = false))
    timed("g4 sorted cache")(lpRun(
      _.repartition(col("src")).sortWithinPartitions(col("src")), bcastLabels = false))
    timed("g4 bcast labels")(lpRun(_.repartition(col("src")), bcastLabels = true))
    timed("g4 bcast+nosort-nopart")(lpRun(df => df, bcastLabels = true))
    spark.stop()
  }
}
