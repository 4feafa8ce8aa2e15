package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe (dev-loop only): the shared co-purchase edge build behind
  * g1–g5.
  *
  * A = the declared lineitem self-join on l_orderkey (current form).
  * B = groupBy(l_orderkey) + collect_list + per-row pair generation —
  *     one shuffle of (orderkey, partkey) instead of a join, and for the
  *     UNDIRECTED-SIMPLE consumer (triangles) the i<j combination form
  *     emits each unordered pair once pre-distinct (half the rows).
  *
  * Checks multiset/set equality of the two forms, then times each
  * (min-of-2 after a warm scan).
  */
object ProbeEdgeBuild {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-edges", 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    li.count() // warm

    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-28s min ${ts.map(_._1).min}%.2f s  (runs ${ts.map(t => f"${t._1}%.2f").mkString(", ")})  n=${ts.head._2}")
    }

    // A: current directed multigraph via self-join
    def edgesA: DataFrame = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))

    // B: directed multigraph via one groupBy + pair generation
    def edgesB: DataFrame = li
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> transform(filter(ps, y -> y != x), y -> struct(x AS src, y AS dst))))"
      )).as("p"))
      .select(col("p.src"), col("p.dst"))

    // simple undirected set from each
    def und(e: DataFrame): DataFrame = e
      .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
      .where(col("u") =!= col("v"))
      .distinct()

    // B': undirected-simple DIRECT — per-order sorted distinct parts,
    // i<j combinations, then global distinct
    def undB: DataFrame = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
      )).as("p"))
      .select(col("p.u"), col("p.v"))
      .distinct()

    // equivalence: directed multiset A == B
    val cntA = edgesA.groupBy("src", "dst").count()
    val cntB = edgesB.groupBy("src", "dst").count()
    val diff1 = cntA.join(cntB, Seq("src", "dst"), "full")
      .filter(cntA("count") =!= cntB("count") ||
        cntA("count").isNull || cntB("count").isNull).count()
    println(s"[probe] directed multiset diff A vs B: $diff1 (must be 0)")
    // equivalence: und(A) == undB as sets
    val dA = und(edgesA); val dB = undB
    val diff2 = dA.except(dB).count() + dB.except(dA).count()
    println(s"[probe] und set diff: $diff2 (must be 0)")

    timed("A edges count")(edgesA.count())
    timed("B edges count")(edgesB.count())
    timed("A und distinct")(und(edgesA).count())
    timed("B und direct")(undB.count())
    spark.stop()
  }
}
