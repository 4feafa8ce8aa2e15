package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every native kernel compiles under whole-stage codegen — executable,
  * not asserted (r18).
  *
  * r17's headline defect was exactly this failure mode staying invisible:
  * a janino compile failure silently downgrades the projection to
  * interpreted eval, everything stays hash-green, and the 10× cost shows
  * up only at corpus scale. The IVF/PQ specs pin their own kernels at
  * production geometry; this spec closes the sweep for the REST of the
  * native-expression surface (`graft.functions`) in one place — each
  * kernel evaluated at its production call-site arguments over an
  * RDD-backed leaf (a LocalRelation would constant-fold into the
  * interpreted path and prove nothing) with
  * `spark.sql.codegen.fallback=false`, so a compile failure THROWS
  * instead of downgrading. A kernel added to `functions/` without a
  * line here is the gap this spec exists to make visible in review.
  */
class CodegenCompileSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("every text/hash/vector kernel compiles under codegen.fallback=false") {
    val docs = (0L until 8L).map(i =>
      (i, s"the quick brown fox $i jumps über die faule Hund 一二三 " * 3))
      .toDF("doc_id", "text").localCheckpoint(true)
    val vecs = (0L until 8L).map(i =>
      (i, Array.tabulate(64)(d => (math.sin(i * 31.0 + d) / 2).toFloat)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val pairs = (0L until 8L).map(i =>
      (Array.tabulate(6)(j => i * 7 + j * 3), Array.tabulate(6)(j => i * 5 + j * 4)))
      .toDF("a", "b").localCheckpoint(true)

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // production call-site arguments: MinHashDedup.P, TextStats's
      // patterns, AnnLsh's band/bit geometry, SpanDedup's window/stride
      val nText = docs.select(
        graft.functions.RegexCounts.of(col("text"), Seq("\\S+", "[^A-Za-z0-9 ]")).as("rc"),
        graft.functions.BpeTokenCount.of(col("text")).as("bpe"),
        graft.functions.SimHashFingerprint.of(col("text")).as("sh"),
        graft.functions.HashedNgrams.of(col("text"), 5).as("grams"),
        graft.functions.MinHashSignature.of(col("text"), 5, 64, 999999999989L).as("sig"),
        graft.functions.WordGramHashesExpr.of(col("text"), 3).as("wg"),
        graft.functions.WindowRollingHashes.of(col("text"), 64, 16).as("wrh"),
        graft.functions.RollingHash(col("text")).as("rh_str"),
        graft.functions.RollingHash(col("text").cast("binary")).as("rh"))
        .where(col("rc").isNotNull && col("bpe").isNotNull && col("sh").isNotNull &&
          col("grams").isNotNull && col("sig").isNotNull && col("wg").isNotNull &&
          col("wrh").isNotNull && col("rh").isNotNull && col("rh_str") === col("rh"))
        .count()
      assert(nText == 8)

      val nVec = vecs.select(
        graft.functions.QuantizedDot.of(col("embedding"), col("embedding")).as("qd"),
        graft.functions.SignLshCodes.of(col("embedding"), 8, 16, 64).as("lsh"))
        .where(col("qd").isNotNull && col("lsh").isNotNull)
        .count()
      assert(nVec == 8)

      val nPairs = pairs.select(
        graft.functions.SortedIntersectCount.ofSorted(
          graft.functions.SortedIntersectCount.sortedArr(col("a")),
          graft.functions.SortedIntersectCount.sortedArr(col("b"))).as("ic"))
        .where(col("ic") >= 0)
        .count()
      assert(nPairs == 8)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
