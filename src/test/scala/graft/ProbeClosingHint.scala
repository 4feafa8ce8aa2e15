package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.functions._

/** Dev-loop probe: interleaved A/B of the literal-bloom closing join
  * strategy (sort-merge vs shuffle_hash) on the g2-shaped wedge stream.
  */
object ProbeClosingHint {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-closinghint", 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    li.count()
    val und = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
      )).as("p")).select(col("p.u"), col("p.v")).distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .cache()
    val m = oriented.count()
    val bf = graft.ext.Triangles.closureBloom(oriented, m)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val x = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
    val y = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
    val wedgeKeys = x.join(y, Seq("src"))
      .where(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("src"), col("a"), col("b"))
    val mightContain = {
      import org.apache.spark.sql.GraftColumnBridge._
      column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        expression(lit(bos.toByteArray)), expression(expr("xxhash64(a, b)"))))
    }
    val closing = oriented.select(col("src").as("a"), col("dst").as("b"))
    def run(hint: Boolean): Double = {
      System.gc()
      val c = if (hint) closing.hint("shuffle_hash") else closing
      val t0 = System.nanoTime()
      wedgeKeys.where(mightContain).join(c, Seq("a", "b"))
        .select(explode(array(col("src"), col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles")).count()
      (System.nanoTime() - t0) / 1e9
    }
    val rs = (1 to 3).map(_ => (run(false), run(true)))
    println(f"[probe] closing SMJ min ${rs.map(_._1).min}%.2f s (${rs.map(t => f"${t._1}%.2f").mkString(", ")})")
    println(f"[probe] closing SHJ min ${rs.map(_._2).min}%.2f s (${rs.map(t => f"${t._2}%.2f").mkString(", ")})")
    spark.stop()
  }
}
