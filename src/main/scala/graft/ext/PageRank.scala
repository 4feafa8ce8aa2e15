package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: the iterative-graph-compute pattern (the same
  * shape as label propagation, belief propagation, embedding power
  * iteration) expressed as a deterministic, engine-replayable chain of
  * relational passes.
  *
  * Floating-point PageRank can never hash-gate across engines — the
  * per-node sums are order-dependent doubles, and damping multiplies
  * rounding into every iteration. This one runs entirely on the
  * integer grid: ranks are BIGINT micro-units (`scale` = 10^12 of
  * total mass 1.0), every division is INTEGER division (`DIV` /
  * DuckDB `//`, exact floor for the non-negative domain), so each
  * iteration is bit-identical in any engine and the oracle replays the
  * whole fixed-point as a generated CTE chain. Mass lost to floors and
  * dangling nodes is the documented price of exactness — rank ORDER is
  * what the operator ships, and the floor error (≤ outdeg quanta per
  * node per pass, at scale 10^12) is ~9 orders of magnitude below the
  * teleport floor every node receives.
  *
  * Shape at scale: edges carry (src, dst, outdeg) co-partitioned once
  * by src and cached — the per-iteration work is one shuffle of the
  * (node, rank) frame to the edge partitioning, one partial+final sum
  * by dst, and one left join back to the node set; the edge frame
  * itself never re-shuffles. 5 iterations = 5 such passes — the
  * classic bulk-synchronous schedule (at 1000 executors you'd also
  * checkpoint ranks every few rounds to truncate lineage, as
  * [[DedupClusters]] does for its propagation loop).
  */
object PageRank {

  /** @param edges directed multigraph as (src, dst) BIGINT columns;
    *              parallel edges weight the transition like repeated
    *              observations (kept, not deduped)
    * @return (node, rank) — top `topK` by rank in micro-units of
    *         `scale`, ties broken by node id
    */
  def ranks(edges: DataFrame, iterations: Int = 5, topK: Int = 100,
            scale: Long = 1000000000000L): DataFrame = {
    val spark = edges.sparkSession
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, Seq("src"))
      .repartition(col("src"))
      .cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .cache()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))

    var rank = nodes.crossJoin(broadcast(n))
      .selectExpr("node", s"${scale}L DIV n_nodes AS rank")
    for (_ <- 1 to iterations) {
      val inSum = withDeg
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst", "rank DIV outdeg AS contrib")
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_sum"))
      rank = nodes
        .join(inSum.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(n))
        .selectExpr("node",
          s"(${scale}L * 15) DIV (100 * n_nodes) + (85 * coalesce(in_sum, 0L)) DIV 100 AS rank")
    }
    rank.orderBy(col("rank").desc, col("node").asc).limit(topK)
  }

  /** DuckDB twin of [[ranks]] over an `edges(src, dst)` CTE named
    * `edges` that the caller prepends: the fixed-point unrolled as a
    * generated r0..rN chain, integer arithmetic throughout (`//` is
    * DuckDB's floor division; sums cast back to BIGINT to stop the
    * HUGEINT widening DuckDB applies to sum(BIGINT)).
    */
  def ranksSqlTail(iterations: Int = 5, topK: Int = 100,
                   scale: Long = 1000000000000L): String = {
    val base =
      s"""deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |nn AS (SELECT count(*) AS n_nodes FROM nodes),
         |r0 AS (SELECT node, $scale // n_nodes AS rank FROM nodes, nn)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    ($scale * 15) // (100 * nn.n_nodes)
         |      + (85 * coalesce(s.in_sum, 0)) // 100 AS rank
         |  FROM nodes n CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS in_sum
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON s.dst = n.node)""".stripMargin
    }
    (Seq(base) ++ iters).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iterations ORDER BY rank DESC, node ASC LIMIT $topK"
  }
}
