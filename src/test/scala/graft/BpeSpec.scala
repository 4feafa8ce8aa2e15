package graft

import graft.core.Catalog
import graft.ext.TextStats
import graft.functions.{BpeTokenCount, BpeTokenize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match tokenizer: the native expression against a
  * from-scratch Scala reference, hand-traced segmentations, and the
  * packing integration.
  */
class BpeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Straight-line reference: longest startsWith match at each cursor. */
  private def referenceCount(text: String): Long = {
    var pos = 0
    var n = 0L
    while (pos < text.length) {
      val rest = text.substring(pos)
      val m = BpeTokenize.vocab.filter(t => t.length > 1 && rest.startsWith(t))
      pos += (if (m.isEmpty) 1 else m.map(_.length).max)
      n += 1
    }
    n
  }

  test("hand-traced segmentations and edges") {
    // 'join'(4) ' hash'(5) ' '(1) 'jo'(2) 'hash'(4)
    assert(BpeTokenize.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("join hash johash")) == 5L)
    // pure fallback: one token per char
    assert(BpeTokenize.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("zzz")) == 3L)
    assert(BpeTokenize.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
    assert(BpeTokenize.vocab.size >= 50 && BpeTokenize.vocab.size <= 200)
  }

  test("native expression == straight-line reference on real docs") {
    val rows = Catalog(spark, sf).documents.limit(200)
      .select(col("doc_id"), col("text"), BpeTokenCount.of(col("text")).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == referenceCount(r.getAs[String]("text")),
        s"mismatch on doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("BPE counts dominate whitespace counts (the under-budgeting t9 fixes)") {
    val cmp = TextStats.bpeTokenCounts(Catalog(spark, sf).documents)
    // every doc: >= (spaces fold into space-prefixed merges, OOV splits)
    assert(cmp.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() == 0)
    // and strictly more overall, else the refinement is vacuous
    val sums = cmp.agg(sum("n_ws_tokens").as("ws"), sum("n_bpe_tokens").as("bpe")).head()
    assert(sums.getLong(1) > sums.getLong(0))
  }

  test("packSequencesBy(BpeTokenCount) respects the budget invariant per bin") {
    val packed = TextStats.packSequencesBy(
      Catalog(spark, sf).documents, 500, 16, BpeTokenCount.of(col("text")))
    // bin/bin_offset are consistent: offset < budget, and a doc's bin is
    // exactly cum_before div budget (re-derivable from its own columns)
    assert(packed.filter(col("bin_offset") >= 500 || col("bin") < 0).count() == 0)
    assert(packed.count() == Catalog(spark, sf).documents.count())
  }
}
