package graft

import org.scalatest.funsuite.AnyFunSuite

/** NULL text rows must not crash the dedup/similarity family. The
  * catalog contract keeps documents.text non-null (CatalogSchemaSpec),
  * but a library caller's frame can carry nulls — the operators must
  * treat a NULL document as contentless (no grams, no fingerprint, no
  * pairs) rather than NPE mid-stage.
  *
  * Each case runs on a 3-doc frame where docs 1 and 3 are near-dups and
  * doc 2 is NULL, and asserts the null row neither crashes the plan nor
  * pairs with anything.
  */
class NullTextSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, null.asInstanceOf[String]),
    (3L, "the quick brown fox jumps over the lazy dogs again and again today"))
    .toDF("doc_id", "text")

  private def pairsOf(df: org.apache.spark.sql.DataFrame,
                      a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash pair detection skips the NULL doc and still finds the near-dup") {
    val got = pairsOf(ext.MinHashDedup.verifiedPairs(docs), "doc_a", "doc_b")
    assert(got == Set((1L, 3L)), s"got $got")
  }

  test("SimHash pair detection skips the NULL doc and still finds the near-dup") {
    val got = pairsOf(ext.SimHash.pairs(docs), "doc_a", "doc_b")
    assert(got == Set((1L, 3L)), s"got $got")
  }

  test("containment join skips the NULL doc and still finds the near-dup") {
    // containment is directional: both directions clear 50% here
    val got = pairsOf(ext.ContainmentJoin.pairs(docs, thresholdPct = 50), "doc_a", "doc_b")
    assert(got == Set((1L, 3L), (3L, 1L)), s"got $got")
  }

  test("span dedup skips the NULL doc and still finds the shared span") {
    val got = pairsOf(ext.SpanDedup.spanPairs(docs, window = 8, stride = 4), "doc_a", "doc_b")
    assert(got == Set((1L, 3L)), s"got $got")
  }

  test("decontamination never flags against a NULL benchmark doc") {
    // corpus doc 1 shares grams with benchmark doc 3; the NULL
    // benchmark row contributes no grams
    val corpus = docs.filter($"doc_id" === 1L)
    val bench = docs.filter($"doc_id" =!= 1L)
    val flags = ext.Decontaminate.flags(corpus, bench)
    assert(flags.count() == 1L)
  }

  test("exact dedup keeps NULL-text docs as their own group") {
    assert(ext.ExactDedup.dedup(docs).count() == 3L)
  }
}
