package graft

import graft.core.Catalog
import graft.ext.{MinHashDedup, NgramJaccard}
import graft.functions.{HashedNgrams, MinHashSignature}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native shingle expressions against their relational twins — the
  * HOF/aggregate formulations stay in the codebase as the executable
  * specification (and the DuckDB oracles replay them verbatim).
  */
class ShingleHashesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("HashedNgrams == sort_array(transform(charNgrams, md5 prefix)) on real docs") {
    val docs = Catalog(spark, sf).documents.limit(100)
      .union(Seq((9001L, "abc", "en", "t", 3L), (9002L, "", "en", "t", 0L),
        (9003L, "abcde", "en", "t", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val cmp = docs.select(
      HashedNgrams.of(col("text"), 5).as("native"),
      sort_array(NgramJaccard.hashedNgrams(col("text"), 5)).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    assert(cmp.count() > 100)
  }

  test("MinHashSignature == the explode + 64-min aggregate formulation") {
    val docs = Catalog(spark, sf).documents.limit(100)
    val withAB = docs
      .select(col("doc_id"), explode(NgramJaccard.charNgrams(col("text"), 5)).as("shingle"))
      .withColumn("m", md5(col("shingle").cast("binary")))
      .withColumn("a", conv(substring(col("m"), 1, 12), 16, 10).cast("long") % MinHashDedup.P)
      .withColumn("b", conv(substring(col("m"), 13, 12), 16, 10).cast("long") % MinHashDedup.P)
    val aggs = (0 until MinHashDedup.numHashes)
      .map(j => min((col("a") + lit(j.toLong) * col("b")) % MinHashDedup.P).as(s"s_$j"))
    val viaAgg = withAB.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinHashDedup.numHashes).map(j => col(s"s_$j")): _*).as("sig"))
    val native = docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        MinHashSignature.of(col("text"), 5, MinHashDedup.numHashes, MinHashDedup.P).as("sig"))
    assert(native.count() == viaAgg.count())
    assert(native.join(viaAgg.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count() == 0)
  }

  test("short/empty texts: empty gram array and empty signature") {
    val df = Seq((1L, ""), (2L, "abcd"), (3L, "abcde")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      size(HashedNgrams.of(col("text"), 5)).as("ng"),
      size(MinHashSignature.of(col("text"), 5, 64, MinHashDedup.P)).as("ns"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == ((0, 0)) && out(2L) == ((0, 0)))
    assert(out(3L) == ((1, 64)))
  }
}
