package graft

import org.apache.spark.sql.{AnalysisException, Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Type-contract audit of every native kernel in `graft.functions`
  * (r18 verdict item 2).
  *
  * RollingHash accepted any child type at analysis and blew up one user
  * column away from production — a janino compile error on the codegen
  * path and a ClassCastException interpreted (fixed r18). This spec
  * generalizes that lesson into an executable contract for the whole
  * kernel surface, two laws per kernel:
  *
  *  1. A wrong-typed child is rejected AT ANALYSIS with a named error —
  *     the kernel's own `checkInputDataTypes` message, carrying its
  *     prettyName — never a janino failure or a task-side
  *     ClassCastException. (Analysis errors cost nothing at 100 TB;
  *     task-side type crashes cost a dead job at hour three.)
  *  2. The natural ADJACENT type — the one a real caller feeds by
  *     accident — either works with exact parity to the canonical type
  *     or is rejected the same named way:
  *     - array<double> where array<float> is canonical: every vector
  *       kernel must accept it and produce BIT-IDENTICAL results on
  *       exact float widenings (production embeddings arrive as either);
  *     - binary where string is canonical: text kernels reject by name
  *       (RollingHash, the one kernel with a real binary lane, must
  *       instead match its string fold on identical bytes);
  *     - array<int> where array<bigint> is canonical: rejected by name.
  *
  * A kernel added to `functions/` without a row here is the gap this
  * spec makes visible in review, same convention as CodegenCompileSpec.
  */
class KernelTypeContractSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private lazy val docs: DataFrame = (0L until 6L).map(i =>
    (i, s"the quick brown fox $i jumps über die faule Hund 一二三", i.toInt))
    .toDF("doc_id", "text", "num").localCheckpoint(true)

  private lazy val vecs: DataFrame = (0L until 6L).map(i =>
    (i, Array.tabulate(64)(d => (math.sin(i * 31.0 + d) / 2).toFloat),
      Array.tabulate(6)(j => i * 7 + j * 3)))
    .toDF("vec_id", "embedding", "longs").localCheckpoint(true)

  /** Assert `mk(badCol)` dies at ANALYSIS with the kernel's own message. */
  private def rejectedByName(df: DataFrame, bad: Column, name: String)(
      mk: Column => Column): Unit = {
    val e = intercept[AnalysisException](df.select(mk(bad)))
    assert(e.getMessage.contains(name),
      s"$name: analysis error must carry the kernel name, got: ${e.getMessage.take(300)}")
    assert(e.getMessage.contains("requires"),
      s"$name: analysis error must state the required type, got: ${e.getMessage.take(300)}")
  }

  test("text kernels: wrong types and binary are rejected at analysis by name") {
    import graft.functions._
    val cases: Seq[(String, Column => Column)] = Seq(
      "regex_counts" -> (c => RegexCounts.of(c, Seq("\\S+"))),
      "bpe_token_count" -> (c => BpeTokenCount.of(c)),
      "simhash64" -> (c => SimHashFingerprint.of(c)),
      "hashed_ngrams" -> (c => HashedNgrams.of(c, 5)),
      "minhash_signature" -> (c => MinHashSignature.of(c, 5, 16, 999999999989L)),
      "word_gram_hashes" -> (c => WordGramHashesExpr.of(c, 3)),
      "window_rolling_hashes" -> (c => WindowRollingHashes.of(c, 64, 16)))
    for ((name, mk) <- cases) {
      // plainly wrong: an int column
      rejectedByName(docs, col("num"), name)(mk)
      // adjacent: binary — the exact lane RollingHash crashed on. These
      // kernels tokenize/shingle CHARACTERS, so bytes are rejected by
      // name at analysis, not decoded by accident
      rejectedByName(docs, col("text").cast("binary"), name)(mk)
      // and the canonical type actually runs (the contract is a gate,
      // not a wall)
      assert(docs.select(mk(col("text"))).collect().length == 6, name)
    }
  }

  test("rolling_hash: binary lane matches the string fold; wrong types rejected by name") {
    import graft.functions.RollingHash
    rejectedByName(docs, col("num"), "rolling_hash")(c => RollingHash(c))
    rejectedByName(docs, array(lit(1L)), "rolling_hash")(c => RollingHash(c))
    // adjacent-type parity: the UTF-8 bytes of a string fold to the
    // same hash through the binary lane (the r18 fix, kept pinned here
    // with the rest of the audit)
    val n = docs.select(RollingHash(col("text")).as("s"),
      RollingHash(col("text").cast("binary")).as("b"))
      .where(col("s") === col("b")).count()
    assert(n == 6)
  }

  test("vector kernels: array<double> is exact parity with array<float>; wrong arrays rejected by name") {
    import graft.functions._
    val centsQ = Array.tabulate(4)(c => Array.tabulate(64)(d => (c * 64 + d) * 1000L))
    val cb = Array.tabulate(8, 4)((m, j) =>
      Array.tabulate(8)(i => (math.sin(m * 131.0 + j * 17 + i) / 2).toFloat))
    val cases: Seq[(String, Column => Column)] = Seq(
      "quantized_dot" -> (c => QuantizedDot.of(c, c)),
      "sign_lsh_codes" -> (c => SignLshCodes.of(c, 8, 16, 64)),
      "ivf_nearest_cell" -> (c => IvfNearestCell.of(c, centsQ)),
      "ivf_top_cells" -> (c => IvfTopCells.of(c, centsQ, 2)),
      "pq_codes" -> (c => PqCodes.of(c, cb)),
      "pq_distance_table" -> (c => PqDistanceTable.of(c, cb)))
    for ((name, mk) <- cases) {
      // plainly wrong: a scalar, and an array of the WRONG element type
      rejectedByName(vecs, col("vec_id"), name)(mk)
      rejectedByName(vecs, col("longs"), name)(mk)
      // adjacent: float→double is an exact widening, so the double lane
      // must produce bit-identical rows — production embeddings arrive
      // as either type depending on the writer
      val f = vecs.select(col("vec_id"), mk(col("embedding")).as("out"))
        .orderBy("vec_id").collect().map(_.toString)
      val d = vecs.select(col("vec_id"),
        mk(col("embedding").cast("array<double>")).as("out"))
        .orderBy("vec_id").collect().map(_.toString)
      assert(f.sameElements(d), s"$name: double lane diverged from float lane")
    }
    // mixed float/double children on the binary kernel: same parity law
    val mixed = vecs.select(
      QuantizedDot.of(col("embedding"), col("embedding")).as("ff"),
      QuantizedDot.of(col("embedding"),
        col("embedding").cast("array<double>")).as("fd"))
      .where(col("ff") === col("fd")).count()
    assert(mixed == 6)
  }

  test("sorted_intersect_count: array<int> rejected by name; array<bigint> runs") {
    import graft.functions.SortedIntersectCount
    val ints = vecs.select(col("longs").cast("array<int>").as("li"), col("longs"))
    val e = intercept[AnalysisException](ints.select(
      SortedIntersectCount.ofSorted(col("li"), col("li"))))
    assert(e.getMessage.contains("sorted_intersect_count") &&
      e.getMessage.contains("requires"), e.getMessage.take(300))
    val n = vecs.select(SortedIntersectCount.ofSorted(
      SortedIntersectCount.sortedArr(col("longs")),
      SortedIntersectCount.sortedArr(col("longs"))).as("ic"))
      .where(col("ic") === 6).count()
    assert(n == 6)
  }
}
